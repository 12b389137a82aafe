"""Text analysis, dedup, similarity, multimodal stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from xdata_igraph_ray.stages import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


def docs_ds():
    return rd.read_parquet(f"{SF}/documents.parquet")


def test_token_stats_matches_python():
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["Hello, world 42!", ""]})
    )
    out = text.token_stats(ds).to_pandas().sort_values("doc_id")
    assert list(out["n_words"]) == [3, 0]  # Hello world 42
    assert list(out["n_chars"]) == [16, 0]
    assert out["n_tokens"][0] > 3  # punctuation tokens counted


def test_byte_kernels_match_python_re():
    # the byte-level LUT/cumsum kernels must agree with a per-row
    # regex reference on hostile inputs: unicode, shared-buffer run
    # boundaries, empties, nulls, underscores, case
    import re

    from xdata_igraph_ray.stages.text import _STOP_EN, TOKEN_RE

    texts = [
        "", "the", "THE tHe the.", "xthe they a A aS as", "th",
        "e start", "ümlaut the\tend", "the_of", "a b" * 3000,
        "42 naïve 9x9", " \t\n ", "of", None, "endswiththe",
        "e", "the", "ab",  # adjacent docs whose runs touch in the buffer
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, type=pa.string()),
    }))
    got = text.token_stats(ds).to_pandas().sort_values("doc_id")
    qgot = text.quality_scores(ds).to_pandas().sort_values("doc_id")
    clean = ["" if t is None else t for t in texts]
    assert list(got["n_chars"]) == [len(t) for t in clean]
    assert list(got["n_words"]) == [len(TOKEN_RE.findall(t)) for t in clean]
    # n_tokens pins RE2 semantics: ascii-\s, one match per symbol cp
    re2ish = [
        len(re.findall(r"[A-Za-z]+", t)) + sum(c.isdigit() and c.isascii() for c in t)
        + sum(1 for c in t if not (c.isascii() and (c.isalnum() or c in "\t\n\f\r ")))
        for t in clean
    ]
    assert list(got["n_tokens"]) == re2ish
    for t, sr, ml in zip(clean, qgot["stop_ratio"], qgot["mean_word_len"]):
        ws = TOKEN_RE.findall(t)
        stop = sum(1 for w in ws if w.lower() in _STOP_EN)
        assert sr == stop / max(len(ws), 1), t
        want_ml = float(np.mean([len(w) for w in ws])) if ws else 0.0
        assert ml == want_ml, t
    # fingerprint: vectorized Horner/XOR equals the per-row spec,
    # including the pathological single long token
    from xdata_igraph_ray.stages.text import _FP_MOD

    fgot = text.fingerprint(ds).to_pandas().sort_values("doc_id")

    def ref_fp(t):
        acc = 0
        for i, tk in enumerate(TOKEN_RE.findall(t), 1):
            h = 0
            for ch in tk:
                h = (h * 131 + ord(ch)) % _FP_MOD
            acc ^= h * i
        return acc

    assert list(fgot["fp"]) == [ref_fp(t) for t in clean]


def test_quality_and_langid_and_fingerprint():
    ds = docs_ds()
    q = text.quality_scores(ds).to_pandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()
    lang = text.detect_language(ds.limit(50)).to_pandas()
    assert set(lang["lang_pred"]).issubset({"en", "de", "fr", "und"})
    fp = text.fingerprint(ds.limit(20)).to_pandas()
    fp2 = text.fingerprint(ds.limit(20)).to_pandas()
    assert (fp.sort_values("doc_id")["fp"].to_numpy()
            == fp2.sort_values("doc_id")["fp"].to_numpy()).all()


def dup_docs():
    texts = [
        "the quick brown fox jumps over the lazy dog " * 5,
        "the quick brown fox jumps over the lazy dog " * 5,          # exact dup of 0
        "the quick brown fox jumped over the lazy dog " * 5,         # near dup
        "completely different content about ray data pipelines " * 5,
        "another unrelated document discussing arrow tables " * 5,
    ]
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


def test_exact_dedup():
    out = dedup.exact_duplicates(dup_docs(), P=2).to_pandas().sort_values("doc_id")
    assert list(out["rep_id"]) == [0, 0, 2, 3, 4]
    kept = dedup.dedup_exact(dup_docs(), P=2).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2, 3, 4]


def test_minhash_lsh_finds_near_dups():
    pairs = dedup.minhash_lsh_pairs(dup_docs(), threshold=0.5, P=2).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any({3, 4} & set(p) for p in got)
    clusters = dedup.dedup_clusters(
        rd.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
    ).to_pandas()
    lut = clusters.set_index("doc_id")["cluster"]
    assert lut[0] == lut[1] == lut[2]


def test_simhash_pairs():
    pairs = dedup.simhash_pairs(dup_docs(), max_hamming=6, P=2).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got
    assert (0, 3) not in got


def test_ngram_jaccard():
    assert dedup.ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
    assert dedup.ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0


def test_embedding_near_dup_and_knn():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((50, 16))
    # rows 0,1 nearly identical; row 2 equal to 0 with tiny noise
    base[1] = base[0] + 0.001 * rng.standard_normal(16)
    base[2] = base[0] + 0.002 * rng.standard_normal(16)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(50, dtype=np.int64),
                "embedding": pa.array(
                    [r.tolist() for r in base], pa.list_(pa.float32())
                ),
            }
        )
    )
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.99, P=2).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got and (0, 2) in got

    res = similarity.knn_brute(emb, base[[0]], k=3).to_pandas()
    assert set(res["vec_id"]) == {0, 1, 2}
    # ivf with full probe ≈ exact for this size
    res2 = similarity.knn_ivf(
        emb, base[[0]], k=3, n_clusters=4, nprobe=4
    ).to_pandas()
    assert 0 in set(res2["vec_id"])


def test_knn_ivf_auto_defaults_planted_recall():
    # planted nearest neighbors recovered at two corpus sizes with the
    # auto ~sqrt(N) n_clusters default (no explicit n_clusters)
    rng = np.random.default_rng(3)
    for n in (400, 3000):
        dim = 16
        base = rng.standard_normal((n, dim))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        # plant: queries = tiny perturbations of rows 0..9
        qidx = np.arange(10)
        q = base[qidx] + rng.standard_normal((10, dim)) * 0.01
        emb = rd.from_arrow(pa.table({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(base)),
        }))
        res = similarity.knn_ivf(emb, q, k=5, nprobe=8, seed=1).to_pandas()
        hits = 0
        for qi in range(10):
            got = set(res[res["query_id"] == qi]["vec_id"])
            hits += int(qidx[qi] in got)
        # planted vector sits at cosine ~0.9999 — probing 8 of ~sqrt(N)
        # lists must recover nearly all of them
        assert hits >= 9, (n, hits)


def test_knn_on_testdata_embeddings():
    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    q = np.stack(emb.take(2, batch_format=None) if False else
                 [r["embedding"] for r in emb.take(2)])
    res = similarity.knn_brute(emb, q, k=5).to_pandas()
    # the query vectors are their own nearest neighbors
    top = res.sort_values(["query_id", "cosine"], ascending=[True, False]) \
             .groupby("query_id").head(1)
    assert list(top["vec_id"]) == [0, 1]


def test_multimodal_plumbing():
    media = rd.from_arrow(multimodal.synth_media(100))
    feats = multimodal.extract_features(media).to_pandas()
    assert len(feats) == 100
    assert len(feats["feature"][0]) == multimodal.FEATURE_DIM
    # determinism
    feats2 = multimodal.extract_features(rd.from_arrow(multimodal.synth_media(100))).to_pandas()
    a = np.stack(feats.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(feats2.sort_values("media_id")["feature"].to_numpy())
    assert np.allclose(a, b)
    frames = multimodal.sample_frames(media).to_pandas()
    assert (frames.groupby("media_id").size() >= 1).all()
    with pytest.raises(Exception):
        multimodal.extract_features(
            media, extractor=multimodal.RealCodecStage
        ).materialize()


def test_multimodal_real_codecs():
    """PPM/WAV/raw-video round trips + real decode->feature pipeline."""
    import numpy as np

    from xdata_igraph_ray.stages import multimodal as mm

    rng = np.random.default_rng(0)
    px = rng.integers(0, 255, (12, 9, 3)).astype(np.uint8)
    assert (mm.decode_ppm(mm.encode_ppm(px)) == px).all()
    x = 0.4 * np.sin(np.linspace(0, 40, 800))
    y, rate = mm.decode_wav(mm.encode_wav(x))
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1e-3)
    frames = [rng.integers(0, 255, (4, 4, 3)).astype(np.uint8)
              for _ in range(3)]
    back = mm.decode_rawvideo_frames(mm.encode_rawvideo(frames))
    assert len(back) == 3
    assert (mm.decode_ppm(back[1]) == frames[1]).all()

    media = rd.from_arrow(mm.synth_media_real(60, seed=3))
    feats = mm.decode_and_featurize(media, concurrency=2).to_pandas()
    assert len(feats) == 60
    assert feats["feature"].map(len).eq(mm.FEATURE_DIM).all()
    # image features carry real pixel statistics (nonzero means)
    img = feats[feats["kind"] == "image"]
    assert (np.stack(img["feature"].to_numpy())[:, :3] > 0).all()

    # real frame sampling fan-out
    vids = rd.from_arrow(mm.synth_media_real(60, seed=3)).filter(
        expr="kind == 'video'"
    )
    fr = rd.from_arrow(mm.synth_media_real(60, seed=3))
    sampled = vids.map_batches(
        mm.RealFrameSampler, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 2),
    ).to_pandas()
    assert len(sampled) >= vids.count() * 2  # >= 2 frames per video
    assert sampled["frame"].map(lambda b: bytes(b)[:2]).eq(b"P6").all()


def test_pii_scrub_planted():
    import ray.data as rd
    from xdata_igraph_ray.stages.text import pii_scrub

    docs = rd.from_items([
        {"doc_id": 0, "text": "mail bob.smith+x@sub.example.co.uk now"},
        {"doc_id": 1, "text": "call +1-555-0100 or visit 192.168.1.254 ok"},
        {"doc_id": 2, "text": "clean text with no identifiers at all"},
        {"doc_id": 3, "text": "two a@b.io c@d.net mails and 10.0.0.1"},
    ])
    df = pii_scrub(docs).to_pandas().sort_values("doc_id")
    assert df["n_emails"].tolist() == [1, 0, 0, 2]
    assert df["n_phones"].tolist() == [0, 1, 0, 0]
    assert df["n_ips"].tolist() == [0, 1, 0, 1]
    assert df["text_clean"].iloc[0] == "mail <EMAIL> now"
    assert df["text_clean"].iloc[1] == "call <PHONE> or visit <IP> ok"
    assert df["text_clean"].iloc[3] == "two <EMAIL> <EMAIL> mails and <IP>"


def test_repetition_stats_handcrafted():
    import ray.data as rd
    from xdata_igraph_ray.stages.text import repetition_stats

    docs = rd.from_items([
        {"doc_id": 0, "text": "a a a a"},           # 1 word repeated
        {"doc_id": 1, "text": "a b c d"},           # all distinct
        {"doc_id": 2, "text": "x y x y x y"},       # bigrams repeat
    ])
    df = repetition_stats(docs).to_pandas().sort_values("doc_id")
    assert df["n_words"].tolist() == [4, 4, 6]
    assert df["distinct_ratio"].tolist() == [0.25, 1.0, round(2 / 6, 6)]
    assert df["top_word_frac"].tolist() == [1.0, 0.25, 0.5]
    # doc0: bigrams aa,aa,aa -> 1 distinct of 3 -> dup 2/3
    # doc2: xy,yx,xy,yx,xy -> 2 distinct of 5 -> dup 3/5
    assert df["dup_2gram_frac"].tolist() == [
        round(2 / 3, 6), 0.0, round(3 / 5, 6)
    ]


def test_unigram_logprob():
    import math

    import pyarrow as pa
    import ray.data as rd

    from xdata_igraph_ray.stages.text import unigram_logprob

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["the cat", "the the DOG", "", "cat!"],
    }))
    df = unigram_logprob(docs, P=3).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # corpus: the x3, cat x2, dog x1 -> N=6, V=3, denom=9
    lp = {"the": math.log(4 / 9), "cat": math.log(3 / 9),
          "dog": math.log(2 / 9)}
    exp = {
        1: (2, (lp["the"] + lp["cat"]) / 2),
        2: (3, (2 * lp["the"] + lp["dog"]) / 3),
        4: (1, lp["cat"]),
    }
    assert df["doc_id"].tolist() == [1, 2, 4]  # empty doc dropped
    for r in df.itertuples():
        n, a = exp[int(r.doc_id)]
        assert int(r.n_tok) == n
        assert abs(float(r.avg_logprob) - a) < 1e-9
