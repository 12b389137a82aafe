"""Spectral embedding vs dense numpy eigendecomposition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph.embedding import (
    adjacency_spectral_embedding,
    dim_select,
    laplacian_spectral_embedding,
)
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.generators import sbm

from .oracles import gnm_edges


def _sym_engine(src, dst, n, P=3):
    s = np.concatenate((src, dst))
    d = np.concatenate((dst, src))
    t = pa.table({"src": s.astype(np.int64), "dst": d.astype(np.int64)})
    return GraphEngine.from_edges(t, n=n, P=P), s, d


def _dense_adj(src, dst, n):
    A = np.zeros((n, n))
    np.add.at(A, (src, dst), 1.0)
    return A


def test_ase_matches_dense_eig():
    n = 120
    src, dst = gnm_edges(n, 500, seed=17)
    pairs = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(src, dst) if a != b}
    es = np.array([p[0] for p in pairs])
    ed = np.array([p[1] for p in pairs])
    eng, s_all, d_all = _sym_engine(es, ed, n)
    d = 6
    emb, lam = adjacency_spectral_embedding(eng, d=d, iters=80, seed=1)
    A = _dense_adj(s_all, d_all, n)
    w, V = np.linalg.eigh(A)
    order = np.argsort(-np.abs(w))
    w_top = w[order[:d]]
    np.testing.assert_allclose(np.abs(lam), np.abs(w_top), rtol=1e-6)
    # X X^T must reproduce the truncated low-rank signature
    df = emb.to_pandas().sort_values("vid")
    X = np.stack(df["x"].to_numpy())
    want = (V[:, order[:d]] * w_top) @ V[:, order[:d]].T
    # X has signless scaling (|lam|^(1/2)); compare via X S_sign X^T
    sign = np.sign(lam)
    got = (X * sign) @ X.T
    np.testing.assert_allclose(got, want, atol=1e-4)
    eng.shutdown()


def test_lse_eigenvalues():
    n = 100
    src, dst = gnm_edges(n, 420, seed=23)
    pairs = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(src, dst) if a != b}
    es = np.array([p[0] for p in pairs])
    ed = np.array([p[1] for p in pairs])
    eng, s_all, d_all = _sym_engine(es, ed, n)
    emb, lam = laplacian_spectral_embedding(eng, d=4, iters=80, seed=2)
    A = _dense_adj(s_all, d_all, n)
    deg = A.sum(axis=1)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    N = A * dinv[:, None] * dinv[None, :]
    w = np.linalg.eigvalsh(N)
    order = np.argsort(-np.abs(w))
    np.testing.assert_allclose(
        np.abs(lam), np.abs(w[order[:4]]), rtol=1e-5
    )
    assert abs(lam[0] - 1.0) < 1e-6  # top normalized-adjacency eigenvalue
    eng.shutdown()


def test_ase_separates_sbm_blocks():
    t = sbm([60, 60], p_in=0.3, p_out=0.02, seed=4)
    s, d = t["src"].to_numpy(), t["dst"].to_numpy()
    eng, _, _ = _sym_engine(s, d, 120)
    emb, lam = adjacency_spectral_embedding(eng, d=2, iters=60, seed=3)
    df = emb.to_pandas().sort_values("vid")
    X = np.stack(df["x"].to_numpy())
    # second coordinate separates the planted blocks
    side = X[:, 1] > np.median(X[:, 1])
    agree = max((side[:60].sum() + (~side[60:]).sum()),
                ((~side[:60]).sum() + side[60:].sum()))
    assert agree >= 110  # near-perfect block recovery
    eng.shutdown()


def test_dim_select_elbow():
    vals = np.array([9.8, 9.5, 9.1, 1.2, 1.1, 1.0, 0.9, 0.8])
    assert dim_select(vals) == 3
    assert dim_select(np.array([5.0, 0.1, 0.1, 0.1])) == 1


def test_eigen_facade_selectors():
    import numpy as np
    from xdata_igraph_ray.graph.embedding import (eigen_adjacency,
                                                  eigen_laplacian,
                                                  eigen_matrix_symmetric)
    from xdata_igraph_ray.graph.generators import ring

    A = np.array([[2.0, 1.0], [1.0, -3.0]])
    vals_lm, _ = eigen_matrix_symmetric(A, "lm", 1)
    vals_la, _ = eigen_matrix_symmetric(A, "la", 1)
    vals_sa, _ = eigen_matrix_symmetric(A, "sa", 1)
    assert abs(vals_lm[0]) >= abs(vals_la[0])
    assert vals_la[0] > 0 > vals_sa[0]
    vals_be, _ = eigen_matrix_symmetric(A, "be", 2)
    assert set(np.round(vals_be, 9)) == set(
        np.round(np.linalg.eigvalsh(A), 9))

    # C6 adjacency: top eigenvalue 2 with constant eigenvector
    edges = ring(6, directed=False)
    vals, vecs = eigen_adjacency(edges, 6, "la", 1)
    assert np.isclose(vals[0], 2.0)
    assert np.allclose(np.abs(vecs[:, 0]), np.abs(vecs[0, 0]))

    # Laplacian: smallest eigenvalue 0; normalized spectrum in [0, 2]
    vals, _ = eigen_laplacian(edges, 6, "sa", 1)
    assert np.isclose(vals[0], 0.0, atol=1e-9)
    vals, _ = eigen_laplacian(edges, 6, "all", 6, normalized=True)
    assert vals.min() >= -1e-9 and vals.max() <= 2.0 + 1e-9
