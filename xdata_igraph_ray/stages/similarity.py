"""Similarity search over an embedding column (list<float>).

* :func:`knn_brute` — exact cosine top-k: the query matrix is put in
  the object store ONCE (``ray.put``) and read zero-copy by every
  batch task (broadcast, no shuffle); each batch computes a numpy
  matmul and emits its local top-k, which a tiny final merge reduces.
* :func:`knn_ivf` — the scale path: coarse k-means centroids (fitted
  on a driver-side sample, broadcast), vectors bucketed by nearest
  centroid; queries probe only the ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import block_refs, exchange, to_dataset


def _matrix(tbl: pa.Table, vec_col: str) -> np.ndarray:
    return np.stack(tbl[vec_col].to_pandas().to_numpy()).astype(np.float64)


def _normalized(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_brute(
    embeddings: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """(query_id, vec_id, cosine) — exact top-k per query row."""
    qn = _normalized(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qn)

    @ray.remote
    def partial_topk(tbl: pa.Table, q) -> tuple:
        v = _normalized(_matrix(tbl, vec_col))
        ids = tbl[id_col].to_numpy()
        sim = q @ v.T  # (nq, batch)
        kk = min(k, sim.shape[1])
        top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        return ids[top], np.take_along_axis(sim, top, axis=1)

    parts = ray.get([partial_topk.remote(r, qref) for r in block_refs(embeddings)])
    all_ids = np.concatenate([p[0] for p in parts], axis=1)
    all_sims = np.concatenate([p[1] for p in parts], axis=1)
    nq = all_ids.shape[0]
    rows_q, rows_i, rows_s = [], [], []
    order = np.argsort(-all_sims, axis=1, kind="stable")
    for qi in range(nq):
        sel = order[qi, :k]
        rows_q.append(np.full(len(sel), qi, np.int64))
        rows_i.append(all_ids[qi, sel])
        rows_s.append(all_sims[qi, sel])
    return pa.table(
        {
            "query_id": np.concatenate(rows_q),
            "vec_id": np.concatenate(rows_i),
            "cosine": np.concatenate(rows_s),
        }
    )


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int, seed: int):
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), n_clusters, replace=False)]
    for _ in range(iters):
        d = sample @ cent.T
        assign = d.argmax(axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def knn_ivf(
    embeddings: Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int | None = None,
    nprobe: int = 4,
    seed: int = 42,
    sample_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: IVF coarse quantizer, ``nprobe`` probed lists.

    Centroids are fitted on a sampled subset driver-side (tiny), then
    broadcast; the bucketed search runs as an exchange keyed by
    centroid id, each partition scanning only its inverted lists.

    Scale defaults: when ``n_clusters`` is None it auto-sizes to
    ~sqrt(N) (min 16) — the standard IVF balance point where each of
    sqrt(N) lists holds ~sqrt(N) vectors, so probing ``nprobe`` lists
    scans ~nprobe*sqrt(N) instead of N; ``sample_size`` follows as
    ~40x n_clusters (k-means fitting needs tens of points per
    centroid).  Recall/latency trade: expected recall rises roughly
    with nprobe/n_clusters — raise ``nprobe`` for recall, raise
    ``n_clusters`` for throughput at the same nprobe.  At 10^9 vectors
    the auto default gives ~31623 lists; pass explicit values when the
    corpus size is known upfront to skip the count pass."""
    qn = _normalized(np.asarray(queries, dtype=np.float64))
    if n_clusters is None:
        n_total = embeddings.count()
        n_clusters = max(16, int(math.isqrt(max(n_total, 0))))
    if sample_size is None:
        sample_size = max(4096, 40 * n_clusters)
    sample = _normalized(
        _matrix(
            embeddings.limit(sample_size).take_batch(
                sample_size, batch_format="pyarrow"
            ),
            vec_col,
        )
    )
    cent = _kmeans(sample, min(n_clusters, len(sample)), 10, seed)
    cref = ray.put(cent)
    qref = ray.put(qn)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probed_lists = ray.put(probe)

    @ray.remote
    def bucketed(tbl: pa.Table, c) -> pa.Table:
        v = _normalized(_matrix(tbl, vec_col))
        assign = (v @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {"bucket": assign, "id": tbl[id_col], "vec": pa.array(list(v))}
        )

    def search(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        q = ray.get(qref)
        probes = ray.get(probed_lists)
        buckets = t["bucket"].to_numpy()
        ids = t["id"].to_numpy()
        v = np.stack(t["vec"].to_pandas().to_numpy())
        out_q, out_i, out_s = [], [], []
        present = np.unique(buckets)
        for b in present:
            qm = np.flatnonzero((probes == b).any(axis=1))
            if len(qm) == 0:
                continue
            vm = buckets == b
            sim = q[qm] @ v[vm].T
            kk = min(k, sim.shape[1])
            top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(qm, kk))
            out_i.append(ids[vm][top].ravel())
            out_s.append(np.take_along_axis(sim, top, axis=1).ravel())
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_id": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_i),
                         "cosine": np.concatenate(out_s)})

    bucketed_refs = [bucketed.remote(r, cref) for r in block_refs(embeddings)]
    partials = exchange(bucketed_refs, ["bucket"], P=8, reduce_fn=search)
    df = partials.to_pandas()
    if len(df) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    df = (
        df.sort_values(["query_id", "cosine"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
