"""Deduplication stages over a documents table.

Training-data operators with no reference analog (the reference's only
dedup is exact edge collapse, igraph_simplify); scale patterns follow
the standard published designs:

* exact          — content hash -> hash-partitioned group -> keep min id
* MinHash + LSH  — char-shingles -> k minhashes -> b bands -> band-hash
                   buckets -> candidate pairs -> Jaccard verify ->
                   connected components over the match graph (run on
                   this repo's own BSP WCC engine)
* SimHash        — 64-bit simhash, banded into 4x16-bit keys ->
                   candidates -> Hamming verify
* n-gram Jaccard — the exact verifier, also usable standalone
* embedding      — random-hyperplane LSH buckets -> cosine verify

Every candidate-generation stage is a vectorized ``map_batches``; the
pair verification joins are partitioned hash joins; nothing funnels
through the driver except final cluster labeling via the WCC engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    exchange,
    groupby_agg,
    to_dataset,
)

# ---------------------------------------------------------------------------
# exact dedup


def exact_duplicates(
    docs: Dataset | list, P: int = DEFAULT_PARTITIONS, text_col: str = "text"
) -> Dataset:
    """(doc_id, rep_id): every doc mapped to the minimum doc_id sharing
    its exact text (hash-partition by content hash + per-group min)."""

    def hashed(t: pa.Table) -> pa.Table:
        txt = t[text_col].to_numpy(zero_copy_only=False).astype(object)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pd.util.hash_array(txt).astype(np.int64),
            }
        )

    refs = docs if isinstance(docs, list) else block_refs(docs)
    hashed_refs = [_apply.remote(hashed, r) for r in refs]
    mins = groupby_agg(
        hashed_refs, ["h"], [("doc_id", "min", "rep_id")], P=P, as_refs=True
    )
    from ..exchange import hash_join

    return hash_join(hashed_refs, mins, keys=["h"], P=P).select_columns(
        ["doc_id", "rep_id"]
    )


def dedup_exact(
    docs: Dataset, P: int = DEFAULT_PARTITIONS, text_col: str = "text"
) -> Dataset:
    """Documents with exact-duplicate texts removed (min doc_id kept)."""

    def hashed(t: pa.Table) -> pa.Table:
        txt = t[text_col].to_numpy(zero_copy_only=False).astype(object)
        return t.append_column(
            "h", pa.array(pd.util.hash_array(txt).astype(np.int64))
        )

    refs = [_apply.remote(hashed, r) for r in block_refs(docs)]

    def keep_min(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values("doc_id").groupby("h", as_index=False).first()
        return pa.Table.from_pandas(df.drop(columns=["h"]), preserve_index=False)

    return exchange(refs, ["h"], P=P, reduce_fn=keep_min)


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


# ---------------------------------------------------------------------------
# MinHash + LSH

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64)
    return a, b


def _char_shingles(text: str, k: int) -> np.ndarray:
    """Hashes of all k-byte shingles — vectorized rolling polynomial
    hash over a numpy sliding window (no per-shingle Python objects)."""
    t = " ".join(text.split()).lower()
    if len(t) < k:
        t = t + " " * (k - len(t))
    raw = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(raw) < k:
        raw = np.pad(raw, (0, k - len(raw)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(raw, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        pows = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
        return (win * pows).sum(axis=1, dtype=np.uint64) ^ np.uint64(
            0x9E3779B97F4A7C15
        )


class MinHasher:
    """Stateful stage: hash coefficients generated once per actor."""

    def __init__(self, num_hashes: int = 128, shingle_k: int = 5, seed: int = 42,
                 text_col: str = "text"):
        self.a, self.b = _minhash_params(num_hashes, seed)
        self.k = shingle_k
        self.num = num_hashes
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = np.unique(_char_shingles(text, self.k)).astype(np.int64)
        if len(sh) == 0:
            return np.zeros(self.num, dtype=np.int64)
        with np.errstate(over="ignore"):
            vals = (
                sh[None, :].astype(np.uint64)
                * self.a[:, None].astype(np.uint64)
                + self.b[:, None].astype(np.uint64)
            ) % np.uint64(_MERSENNE)
        return vals.min(axis=1).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        sigs = [self.signature(t).tolist() for t in df[self.text_col]]
        # plain list<int64>, NOT an ndarray column: Ray would tensorize
        # it into an extension type that Arrow joins / pandas reject
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )


def _band_rows(tbl: pa.Table, bands: int, rows: int) -> pa.Table:
    sig = np.stack(tbl["sig"].to_pandas().to_numpy())
    ids = tbl["doc_id"].to_numpy()
    band_l, bh_l, id_l = [], [], []
    with np.errstate(over="ignore"):
        for b in range(bands):
            seg = sig[:, b * rows:(b + 1) * rows].astype(np.uint64)
            h = np.full(len(seg), 14695981039346656037, dtype=np.uint64)
            for c in range(seg.shape[1]):
                h = (h ^ seg[:, c]) * np.uint64(1099511628211)
            band_l.append(np.full(len(seg), b, np.int64))
            bh_l.append(h.astype(np.int64))
            id_l.append(ids)
    return pa.table(
        {
            "band": np.concatenate(band_l),
            "bh": np.concatenate(bh_l),
            "doc_id": np.concatenate(id_l),
        }
    )


def minhash_lsh_pairs(
    docs: Dataset,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    P: int = DEFAULT_PARTITIONS,
    text_col: str = "text",
) -> Dataset:
    """Near-duplicate candidate pairs verified by MinHash-estimated
    Jaccard >= threshold: (a, b, jaccard_est) with a < b."""
    rows = num_hashes // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_hashes": num_hashes, "shingle_k": shingle_k, "seed": seed,
            "text_col": text_col,
        },
        batch_format="pandas", batch_size=512, concurrency=(1, 16),
    )
    sig_refs = block_refs(sigs)
    band_refs = [
        _apply.remote(lambda df, b=bands, r=rows: _band_rows(df, b, r), x)
        for x in sig_refs
    ]

    # bucket by (band, band-hash); emit intra-bucket pairs
    def bucket_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["band", "bh", "doc_id"])
        a_out, b_out = [], []
        for _, g in df.groupby(["band", "bh"], sort=False):
            ids = g["doc_id"].to_numpy()
            if len(ids) < 2 or len(ids) > 200:  # hot-bucket guard, logged
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            a_out.append(ids[iu])
            b_out.append(ids[ju])
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table(
            {"a": np.concatenate(a_out), "b": np.concatenate(b_out)}
        )

    pairs = exchange(
        band_refs, ["band", "bh"], P=P, reduce_fn=bucket_pairs, as_refs=True,
    )
    from ..exchange import distinct

    cand = distinct(pairs, ["a", "b"], P=P, as_refs=True)

    # verify: join signatures onto both sides, estimate Jaccard
    from ..exchange import hash_join

    j1 = hash_join(
        cand,
        [_apply.remote(lambda t: _sig_named(t, "a", "sig_a"), r) for r in sig_refs],
        keys=["a"], P=P, as_refs=True,
    )
    j2 = hash_join(
        j1,
        [_apply.remote(lambda t: _sig_named(t, "b", "sig_b"), r) for r in sig_refs],
        keys=["b"], P=P, as_refs=True,
    )

    thr = threshold

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard_est": pa.array([], pa.float64())})
        sa = np.stack(t["sig_a"].to_pandas().to_numpy())
        sb = np.stack(t["sig_b"].to_pandas().to_numpy())
        est = (sa == sb).mean(axis=1)
        keep = est >= thr
        return pa.table(
            {
                "a": t["a"].to_numpy()[keep],
                "b": t["b"].to_numpy()[keep],
                "jaccard_est": est[keep],
            }
        )

    return to_dataset([_apply.remote(verify, r) for r in j2])


@ray.remote
def _pd_to_table(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


def _sig_named(t: pa.Table, id_name: str, sig_name: str) -> pa.Table:
    return pa.table({id_name: t["doc_id"], sig_name: t["sig"]})


def dedup_clusters(pairs: Dataset, P: int = 4) -> Dataset:
    """(doc_id, cluster): connected components over the near-duplicate
    match graph — runs on this repo's own BSP WCC engine, so cluster id
    = min doc_id in the cluster."""
    from ..graph.components import wcc
    from ..graph.engine import GraphEngine

    renamed = pairs.map_batches(
        lambda t: pa.table({"src": t["a"], "dst": t["b"]}),
        batch_format="pyarrow",
    )
    eng = GraphEngine.from_edges(renamed, P=P)
    wcc(eng, renumber=False)
    out = eng.state_dataset(["label"], rename={"label": "cluster"})
    out = out.map_batches(
        lambda t: pa.table({"doc_id": t["vid"], "cluster": t["cluster"]}),
        batch_format="pyarrow",
    ).materialize()
    eng.shutdown()
    return out


# ---------------------------------------------------------------------------
# SimHash


class SimHasher:
    """64-bit SimHash over token hashes (stateful: nothing heavy, but
    kept as a class for the actor-pool pattern symmetry)."""

    def __init__(self, text_col: str = "text"):
        from .text import TOKEN_RE

        self.tok = TOKEN_RE
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        toks = self.tok.findall(text.lower())
        if not toks:
            return 0
        h = pd.util.hash_array(np.array(toks, dtype=object))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        v = (2 * bits - 1).sum(axis=0)
        return int(
            np.bitwise_or.reduce(
                (v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            ).astype(np.int64)
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "sh": df[self.text_col].map(self.simhash).astype("int64"),
            }
        )


def simhash_pairs(
    docs: Dataset,
    max_hamming: int = 3,
    P: int = DEFAULT_PARTITIONS,
    text_col: str = "text",
) -> Dataset:
    """(a, b, hamming) pairs with Hamming(simhash) <= max_hamming,
    found via 4x16-bit band buckets (any pair within distance 3 shares
    at least one exact band)."""
    sigs = docs.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", batch_size=1024, concurrency=(1, 16),
    )
    sig_refs = block_refs(sigs)

    def bands(t: pa.Table) -> pa.Table:
        sh = t["sh"].to_numpy().astype(np.uint64)
        ids = t["doc_id"].to_numpy()
        out = []
        for b in range(4):
            out.append(
                pa.table(
                    {
                        "band": np.full(len(sh), b, np.int64),
                        "bh": ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64),
                        "doc_id": ids,
                        "sh": sh.astype(np.int64),
                    }
                )
            )
        return pa.concat_tables(out)

    def bucket_verify(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["band", "bh", "doc_id"])
        a_o, b_o, d_o = [], [], []
        for _, g in df.groupby(["band", "bh"], sort=False):
            if len(g) < 2 or len(g) > 500:
                continue
            ids = g["doc_id"].to_numpy()
            sh = g["sh"].to_numpy().astype(np.uint64)
            iu, ju = np.triu_indices(len(ids), k=1)
            x = sh[iu] ^ sh[ju]
            ham = np.array([bin(int(v)).count("1") for v in x])
            keep = ham <= max_hamming
            a_o.append(ids[iu][keep]); b_o.append(ids[ju][keep]); d_o.append(ham[keep])
        if not a_o:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({"a": np.concatenate(a_o), "b": np.concatenate(b_o),
                         "hamming": np.concatenate(d_o).astype(np.int64)})

    band_refs = [_apply.remote(bands, r) for r in sig_refs]
    pairs = exchange(band_refs, ["band", "bh"], P=P, reduce_fn=bucket_verify,
                     as_refs=True)
    return _distinct_pairs(pairs, P)


def _distinct_pairs(pair_refs, P):
    from ..exchange import exchange as _ex

    def dd(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(subset=["a", "b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return _ex(pair_refs, ["a", "b"], P=P, map_fn=dd, reduce_fn=dd)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verifier / standalone for small candidate sets)


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(np.unique(_char_shingles(text_a, k)))
    sb = set(np.unique(_char_shingles(text_b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_near_dup_pairs(
    embeddings: Dataset,
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 42,
    P: int = DEFAULT_PARTITIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """(a, b, cosine) pairs with cosine >= threshold, bucketed by a
    random-hyperplane signature (vectors agreeing on all planes land in
    one bucket; high-cosine pairs collide with high probability)."""
    refs = block_refs(embeddings)
    dim = len(ray.get(refs[0])[vec_col][0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    pref = ray.put(planes)

    @ray.remote
    def signed(t: pa.Table, pl) -> pa.Table:
        v = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.maximum(norms, 1e-12)
        bits = (v @ pl) > 0
        sig = np.zeros(len(v), dtype=np.int64)
        for i in range(pl.shape[1]):
            sig |= bits[:, i].astype(np.int64) << i
        return pa.table(
            {"bucket": sig, "id": t[id_col], "vec": pa.array(list(v))}
        )

    def bucket_verify(t: pa.Table) -> pa.Table:
        if len(t) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        df = t.to_pandas()
        a_o, b_o, c_o = [], [], []
        for _, g in df.groupby("bucket", sort=False):
            if len(g) < 2 or len(g) > 1000:
                continue
            ids = g["id"].to_numpy()
            v = np.stack(g["vec"].to_numpy())
            sim = v @ v.T
            iu, ju = np.triu_indices(len(ids), k=1)
            s = sim[iu, ju]
            keep = s >= threshold
            a = np.minimum(ids[iu][keep], ids[ju][keep])
            b = np.maximum(ids[iu][keep], ids[ju][keep])
            a_o.append(a); b_o.append(b); c_o.append(s[keep])
        if not a_o:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"a": np.concatenate(a_o), "b": np.concatenate(b_o),
                         "cosine": np.concatenate(c_o)})

    sig_refs = [signed.remote(r, pref) for r in refs]
    return exchange(sig_refs, ["bucket"], P=P, reduce_fn=bucket_verify)
