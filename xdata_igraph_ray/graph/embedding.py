"""Spectral embedding — the xdata fork's flagship addition (reference
src/embedding.c:807 igraph_adjacency_spectral_embedding, :998
igraph_laplacian_spectral_embedding, :1054 igraph_dim_select).

Distributed design: block subspace iteration over the BSP engine.
The n x d iterate lives sharded in actor state; each round is one
matrix-message exchange (Y = A X, the same wire as PageRank but d
columns wide) followed by a distributed QR (per-shard Gram partials ->
driver d x d Cholesky -> broadcast R^{-1}).  The driver never holds
more than d x d numbers.  After T rounds a Rayleigh-Ritz projection
rotates X into eigenvector coordinates and scales by |lambda|^{1/2} —
ASE's U S^{1/2} (the reference computes the same via ARPACK; pinned
divergence: subspace iteration, same subspace at convergence).

LSE here embeds the degree-normalized adjacency D^{-1/2} A D^{-1/2}
(the symmetric-normalized Laplacian's eigenpairs shifted by 1 — same
eigenvectors; divergence from the reference's D_tau options is
pinned and documented).

``dim_select`` is the Zhu–Ghodsi profile-likelihood elbow on the
returned spectrum, matching igraph_dim_select's method
(src/embedding.c:1054).
"""

from __future__ import annotations

import numpy as np
import ray
from ray.data import Dataset

from .engine import GraphEngine


def _edge_cols(edges):
    """(src, dst) numpy columns from a pyarrow Table or Dataset."""
    import pyarrow as pa

    if isinstance(edges, pa.Table):
        return edges["src"].to_numpy(), edges["dst"].to_numpy()
    tbl = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    return tbl["src"].to_numpy(), tbl["dst"].to_numpy()


def _spectral(
    engine: GraphEngine,
    d: int,
    normalized: bool,
    weighted: bool,
    iters: int,
    seed: int,
    oversample: int = 6,
):
    shards = engine.shards
    q_dim = min(d + oversample, max(engine.n - 1, 1))
    ray.get([
        s.emb_init.remote(q_dim, seed, normalized) for s in shards
    ])
    for it in range(iters):
        outs = engine.scatter("emb_scatter", weighted)
        grams = ray.get([
            shards[qq].emb_gather.remote(*engine.pieces(outs, qq))
            for qq in range(engine.P)
        ])
        G = np.sum(grams, axis=0)
        # distributed QR: Y = Q R with R from the Gram's Cholesky
        # (jitter guards rank deficiency on tiny/disconnected graphs)
        R = np.linalg.cholesky(
            G + np.eye(q_dim) * (1e-12 * max(np.trace(G), 1.0))
        ).T
        rinv = ray.put(np.linalg.inv(R))
        ray.get([s.emb_orthonormalize.remote(rinv) for s in shards])
    # one more multiply for Rayleigh-Ritz: B = X^T A X
    outs = engine.scatter("emb_scatter", weighted)
    ray.get([
        shards[q].emb_gather.remote(*engine.pieces(outs, q))
        for q in range(engine.P)
    ])
    B = np.sum(ray.get([s.emb_rayleigh.remote() for s in shards]), axis=0)
    B = (B + B.T) / 2
    lam, W = np.linalg.eigh(B)
    order = np.argsort(-np.abs(lam))[:d]  # drop the oversample buffer
    lam, W = lam[order], W[:, order]
    scale = np.sqrt(np.abs(lam))
    ray.get([
        s.emb_finalize.remote(ray.put(W), ray.put(scale)) for s in shards
    ])
    import ray.data as rd

    table = rd.from_arrow_refs(
        [s.emb_table.remote() for s in shards]
    )
    return table, lam


def adjacency_spectral_embedding(
    engine: GraphEngine,
    d: int = 8,
    weighted: bool = False,
    iters: int = 30,
    seed: int = 42,
) -> tuple[Dataset, np.ndarray]:
    """(embedding Dataset (vid, x: list<double>), eigenvalues) — ASE
    U |S|^{1/2} of the adjacency (engine must hold the SYMMETRIC
    support, i.e. both arcs per undirected edge)."""
    return _spectral(engine, d, False, weighted, iters, seed)


def laplacian_spectral_embedding(
    engine: GraphEngine,
    d: int = 8,
    weighted: bool = False,
    iters: int = 30,
    seed: int = 42,
) -> tuple[Dataset, np.ndarray]:
    """LSE over the degree-normalized adjacency D^{-1/2} A D^{-1/2}."""
    return _spectral(engine, d, True, weighted, iters, seed)


def dim_select(values: np.ndarray) -> int:
    """Zhu–Ghodsi profile-likelihood elbow (igraph_dim_select,
    src/embedding.c:1054): split the sorted spectrum at the d
    maximizing the two-normal profile log-likelihood; returns the
    1-based dimension count."""
    v = np.sort(np.abs(np.asarray(values, dtype=np.float64)))[::-1]
    n = len(v)
    best_d, best_ll = 1, -np.inf
    for q in range(1, n):
        a, b = v[:q], v[q:]
        mu1, mu2 = a.mean(), b.mean()
        pooled = (
            ((a - mu1) ** 2).sum() + ((b - mu2) ** 2).sum()
        ) / max(n - 2, 1)
        sd = np.sqrt(pooled) if pooled > 0 else 1e-12
        ll = (
            -0.5 * (((a - mu1) / sd) ** 2).sum()
            - 0.5 * (((b - mu2) / sd) ** 2).sum()
            - n * np.log(sd)
        )
        if ll > best_ll:
            best_ll, best_d = ll, q
    return best_d


def _select_eigen(vals: np.ndarray, vecs: np.ndarray, which: str,
                  howmany: int):
    """igraph_eigen_which_t position selector (igraph_eigen.h:50-62):
    LM/SM by |lambda|, LA/SA by algebraic value, BE = both ends, ALL,
    INTERVAL [vl, vu), SELECT il..iu (1-based in ascending order)."""
    order_alg = np.argsort(vals, kind="stable")          # ascending
    if which == "lm":
        idx = np.argsort(-np.abs(vals), kind="stable")[:howmany]
    elif which == "sm":
        idx = np.argsort(np.abs(vals), kind="stable")[:howmany]
    elif which == "la":
        idx = order_alg[::-1][:howmany]
    elif which == "sa":
        idx = order_alg[:howmany]
    elif which == "be":
        lo = (howmany + 1) // 2
        hi = howmany - lo
        idx = np.concatenate([order_alg[:lo],
                              order_alg[::-1][:hi]])
    elif which == "all":
        idx = order_alg[::-1]
    else:
        raise ValueError(f"unsupported which: {which}")
    return vals[idx], vecs[:, idx]


def eigen_matrix_symmetric(A, which: str = "lm", howmany: int = 1):
    """igraph_eigen_matrix_symmetric (src/eigen.c / igraph_eigen.h:74)
    — dense symmetric eigenpairs with the reference's which-position
    selectors.  numpy.linalg.eigh replaces LAPACK/ARPACK (same
    answers; the algorithm enum is a performance switch only)."""
    A = np.asarray(A, np.float64)
    vals, vecs = np.linalg.eigh(A)
    return _select_eigen(vals, vecs, which, howmany)


def eigen_adjacency(edges, n: int, which: str = "lm", howmany: int = 1,
                    weights=None):
    """igraph_eigen_adjacency (igraph_eigen.h:96): eigenpairs of the
    (symmetrized) adjacency matrix."""
    src, dst = _edge_cols(edges)
    A = np.zeros((n, n))
    w = np.ones(len(src)) if weights is None else np.asarray(weights)
    np.add.at(A, (src, dst), w)
    np.add.at(A, (dst, src), w)
    # collapse double-counted loops: diagonal got 2w per loop
    A[np.diag_indices(n)] /= 2.0
    return eigen_matrix_symmetric(A, which, howmany)


def eigen_laplacian(edges, n: int, which: str = "lm", howmany: int = 1,
                    normalized: bool = False):
    """igraph_eigen_laplacian (igraph_eigen.h:106): eigenpairs of the
    (optionally symmetric-normalized) graph Laplacian."""
    src, dst = _edge_cols(edges)
    A = np.zeros((n, n))
    np.add.at(A, (src, dst), 1.0)
    np.add.at(A, (dst, src), 1.0)
    A[np.diag_indices(n)] = 0.0
    deg = A.sum(axis=1)
    L = np.diag(deg) - A
    if normalized:
        with np.errstate(divide="ignore"):
            dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
        L = L * dinv[:, None] * dinv[None, :]
    return eigen_matrix_symmetric(L, which, howmany)
