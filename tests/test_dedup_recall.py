"""Round-2 dedup hardening: banded embedding LSH recall, hot-bucket
salvage connectivity, SWAR popcount."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.stages import dedup


def _planted_embeddings(n=300, dim=32, n_dups=40, seed=5):
    """Base vectors + planted near-duplicates at cosine ~0.95-0.999."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup_src = rng.choice(n, n_dups, replace=False)
    # per-dup noise scale — cosines land in ~[0.95, 0.999]
    scale = rng.uniform(0.01, 0.055, (n_dups, 1))
    dups = base[dup_src] + rng.standard_normal((n_dups, dim)) * scale
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.vstack([base, dups])
    ids = np.arange(len(vecs))
    return ids, vecs


def _brute_pairs(ids, vecs, threshold):
    sim = vecs @ vecs.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = sim[iu, ju] >= threshold
    return set(zip(ids[iu[keep]], ids[ju[keep]]))


def test_embedding_near_dup_recall():
    ids, vecs = _planted_embeddings()
    truth = _brute_pairs(ids, vecs, 0.95)
    assert len(truth) >= 20  # the fixture actually plants near-dups
    emb = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    }))
    got = dedup.embedding_near_dup_pairs(emb, threshold=0.95, P=2).to_pandas()
    found = set(zip(got["a"], got["b"]))
    assert found <= truth  # cosine-verified: exact precision
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9"


def test_hot_bucket_salvage_connectivity():
    """600 identical docs in one band bucket (cap 200): pair output is
    sub-split, but the WCC clustering must still produce ONE cluster —
    zero silent candidate loss at the cluster level."""
    n = 600
    docs = rd.from_arrow(pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["the same exact document text repeated verbatim"] * n,
    }))
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9, P=2).materialize()
    df = pairs.to_pandas()
    assert len(df) < n * (n - 1) // 2  # hot bucket was NOT fully expanded
    clusters = dedup.dedup_clusters(pairs, P=2).to_pandas()
    covered = clusters[clusters["doc_id"].isin(range(n))]
    assert covered["cluster"].nunique() == 1
    assert len(covered) == n


def test_salvage_pairs_small_passthrough():
    ids = np.arange(10, dtype=np.int64)
    a, b = dedup._salvage_pairs(ids, cap=200, what="test")
    assert len(a) == 45


def test_popcount():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    np.testing.assert_array_equal(
        dedup._popcount64(x), [0, 1, 2, 64, 1]
    )


def test_minhash_vectorized_matches_single():
    texts = ["hello world document", "another text entirely", ""]
    a, b = dedup._minhash_params(64, 42)
    sigs = dedup._minhash_signatures(texts, a, b, 5)
    m = dedup.MinHasher(num_hashes=64, seed=42)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(sigs[i], m.signature(t))


def test_dedup_exact_payload_stays_put():
    """dedup_exact keeps full rows and min doc_id per text, with only
    ids shuffling (pandas oracle)."""
    texts = ["a", "b", "a", "c", "b", "a"]
    docs = rd.from_arrow(pa.table({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": texts,
        "payload": [f"p{i}" for i in range(6)],
    }))
    out = dedup.dedup_exact(docs, P=2).to_pandas().sort_values("doc_id")
    want = (
        pd.DataFrame({"doc_id": range(6), "text": texts})
        .groupby("text")["doc_id"].min().sort_values()
    )
    assert list(out["doc_id"]) == list(want)
    assert list(out["payload"]) == [f"p{i}" for i in want]


# ---------------------------------------------------------------------------
# exact n-gram Jaccard join (prefix-filter all-pairs)


def _word_salad_docs(n=120, seed=11, n_dups=15):
    """Seeded word-salad docs + planted near-dups (a few words edited)
    so the >=0.5-Jaccard truth set is non-trivial at several sizes."""
    rng = np.random.default_rng(seed)
    vocab = np.array(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon".split()
    )
    texts = [
        " ".join(rng.choice(vocab, rng.integers(30, 60)))
        for _ in range(n)
    ]
    for d in range(n_dups):
        src = int(rng.integers(0, n))
        words = texts[src].split()
        for _ in range(int(rng.integers(0, 3))):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        texts.append(" ".join(words))
    return pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})


def _brute_jaccard(df, p, q, k=5):
    sets = {
        r.doc_id: set(np.unique(dedup._char_shingles(r.text, k)).tolist())
        for r in df.itertuples()
    }
    ids = sorted(sets)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if q * inter >= p * union:
                rows.append((a, b, inter / union))
    return sorted(rows)


def test_ngram_jaccard_pairs_exact_vs_brute():
    df = _word_salad_docs()
    docs = rd.from_pandas(df)
    for p, q in ((1, 2), (4, 5)):
        got = (
            dedup.ngram_jaccard_pairs(docs, threshold=(p, q), P=4)
            .to_pandas()
            .sort_values(["a", "b"])
        )
        want = _brute_jaccard(df, p, q)
        assert len(want) > 0  # fixture plants matches at both cuts
        assert sorted(map(tuple, got.to_numpy().tolist())) == want


def test_ngram_jaccard_pairs_empty_and_validation():
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [0, 1], "text": ["aaaa bbbb", "cccc dddd"]})
    )
    out = dedup.ngram_jaccard_pairs(docs, threshold=(9, 10), P=2)
    # schema survives even with zero rows (to_pandas drops columns on
    # an all-empty Dataset — a Ray quirk, so assert on the schema)
    assert out.schema().names == ["a", "b", "jaccard"]
    assert out.count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.ngram_jaccard_pairs(docs, threshold=(3, 2))


def test_ngram_jaccard_identical_docs():
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [7, 9, 11], "text": ["same text here"] * 2 + ["other"]}
        )
    )
    out = dedup.ngram_jaccard_pairs(docs, threshold=(1, 1), P=2).to_pandas()
    assert out.to_numpy().tolist() == [[7, 9, 1.0]]
