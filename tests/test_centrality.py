"""Eigenvector centrality and HITS vs numpy power-iteration oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph.centrality import eigenvector_centrality, hits
from xdata_igraph_ray.graph.engine import GraphEngine

from .oracles import gnm_edges


def dense_adj(src, dst, n):
    A = np.zeros((n, n))
    for a, b in zip(src, dst):
        A[a, b] += 1.0
    return A


def test_eigenvector_undirected():
    src, dst = gnm_edges(150, 900, seed=13)
    # symmetrize
    s = np.concatenate((src, dst))
    d = np.concatenate((dst, src))
    n = 150
    eng = GraphEngine.from_edges(pa.table({"src": s, "dst": d}), n=n, P=3)
    eigenvector_centrality(eng, tol=1e-13)
    got = eng.state_arrays("ev")
    A = dense_adj(s, d, n)
    x = np.ones(n)
    for _ in range(5000):
        x2 = A.T @ x
        x2 /= x2.max()
        if np.abs(x2 - x).max() < 1e-14:
            x = x2
            break
        x = x2
    np.testing.assert_allclose(got, x, atol=1e-8)
    eng.shutdown()


def test_hits_hubs_authorities():
    # bipartite-ish: hubs 0,1 point to authorities 2,3,4
    src = [0, 0, 0, 1, 1, 5]
    dst = [2, 3, 4, 2, 3, 2]
    n = 6
    eng = GraphEngine.from_edges(pa.table(
        {"src": np.array(src, np.int64), "dst": np.array(dst, np.int64)}
    ), n=n, P=2)
    hits(eng, tol=1e-13)
    hub = eng.state_arrays("hub")
    auth = eng.state_arrays("auth")
    A = dense_adj(src, dst, n)
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(5000):
        a2 = A.T @ h
        a2 /= a2.max()
        h2 = A @ a2
        h2 /= h2.max()
        if np.abs(h2 - h).max() < 1e-14:
            h, a = h2, a2
            break
        h, a = h2, a2
    np.testing.assert_allclose(hub, h, atol=1e-8)
    np.testing.assert_allclose(auth, a, atol=1e-8)
    assert hub[0] == 1.0          # strongest hub
    assert auth.argmax() == 2     # most-pointed-at authority
    eng.shutdown()
