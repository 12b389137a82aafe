"""Force/annealing layouts (graph/layout_force.py) vs reference
semantics (layout_gem.c, layout_dh.c, layout.c graphopt/lgl/merge,
layout_kk.c 3d, drl_layout.cpp)."""

import numpy as np
import pytest

from xdata_igraph_ray.graph import layout_force as LF
from xdata_igraph_ray.graph.generators import _table, ring


def _ring(n):
    return ring(n, directed=False), n


def _two_cliques(k=5):
    src, dst = [], []
    for a in range(k):
        for b in range(a + 1, k):
            src += [a, k + a]
            dst += [b, k + b]
    src.append(0)
    dst.append(k)
    return _table(src, dst), 2 * k


def _adjacent_closer(P, edges, n) -> bool:
    s = edges["src"].to_numpy()
    d = edges["dst"].to_numpy()
    elen = np.sqrt(((P[s] - P[d]) ** 2).sum(axis=1)).mean()
    rng = np.random.default_rng(0)
    a = rng.integers(0, n, 400)
    b = rng.integers(0, n, 400)
    keep = a != b
    alen = np.sqrt(((P[a[keep]] - P[b[keep]]) ** 2).sum(axis=1)).mean()
    return elen < alen


def test_gem_runs_and_contracts_edges():
    edges, n = _ring(16)
    P = LF.layout_gem(edges, n, seed=3)
    assert P.shape == (n, 2) and np.isfinite(P).all()
    assert _adjacent_closer(P, edges, n)
    P2 = LF.layout_gem(edges, n, seed=3)
    assert np.allclose(P, P2)        # deterministic per seed


def test_davidson_harel_ring_untangles():
    edges, n = _ring(10)
    P = LF.layout_davidson_harel(edges, n, maxiter=8, seed=5)
    assert P.shape == (n, 2) and np.isfinite(P).all()
    # a relaxed ring should have near-zero crossings
    s = edges["src"].to_numpy(); d = edges["dst"].to_numpy()
    crossings = 0
    for i in range(len(s)):
        for j in range(i + 1, len(s)):
            a, b, c, e = int(s[i]), int(d[i]), int(s[j]), int(d[j])
            if len({a, b, c, e}) < 4:
                continue
            crossings += LF._seg_intersect(P[a], P[b], P[c], P[e])
    assert crossings <= 1
    assert _adjacent_closer(P, edges, n)


def test_graphopt_separates_and_is_deterministic():
    edges, n = _two_cliques(4)
    P = LF.layout_graphopt(edges, n, niter=200, seed=7)
    assert P.shape == (n, 2) and np.isfinite(P).all()
    assert np.allclose(P, LF.layout_graphopt(edges, n, niter=200, seed=7))
    # charges repel: no two vertices collapse
    diff = P[:, None, :] - P[None, :, :]
    dist = np.sqrt((diff ** 2).sum(axis=2))
    np.fill_diagonal(dist, np.inf)
    assert dist.min() > 1e-3


def test_lgl_layers_and_edge_contraction():
    edges, n = _ring(24)
    P = LF.layout_lgl(edges, n, maxit=60, root=0, seed=9)
    assert P.shape == (n, 2) and np.isfinite(P).all()
    assert _adjacent_closer(P, edges, n)


def test_lgl_disconnected_far_ring():
    # two disjoint edges: unreachable part placed far outside
    edges = _table([0, 2], [1, 3])
    P = LF.layout_lgl(edges, 4, maxit=20, root=0, seed=1)
    assert np.isfinite(P).all()
    d01 = np.hypot(*(P[0] - P[1]))
    dfar = min(np.hypot(*(P[0] - P[2])), np.hypot(*(P[0] - P[3])))
    assert dfar > d01


def test_kk3d_reduces_stress_on_ring():
    from xdata_igraph_ray.graph.layout import kk_stress, layout_sphere
    edges, n = _ring(14)
    P = LF.layout_kamada_kawai_3d(edges, n, maxiter=2000)
    assert P.shape == (n, 3) and np.isfinite(P).all()
    s0 = kk_stress(layout_sphere(n), edges, n)
    s1 = kk_stress(P, edges, n)
    assert s1 < s0
    # ring edge lengths should be nearly uniform at the optimum
    s = edges["src"].to_numpy(); d = edges["dst"].to_numpy()
    elen = np.sqrt(((P[s] - P[d]) ** 2).sum(axis=1))
    assert elen.std() / elen.mean() < 0.2


def test_drl_separates_cliques():
    edges, n = _two_cliques(5)
    P = LF.layout_drl(edges, n, seed=11)
    assert P.shape == (n, 2) and np.isfinite(P).all()
    c1 = P[:5].mean(axis=0)
    c2 = P[5:].mean(axis=0)
    intra = max(np.sqrt(((P[:5] - c1) ** 2).sum(axis=1)).mean(),
                np.sqrt(((P[5:] - c2) ** 2).sum(axis=1)).mean())
    inter = np.hypot(*(c1 - c2))
    assert inter > intra


def test_drl_3d_separates_cliques_and_is_deterministic():
    edges, n = _two_cliques(5)
    P = LF.layout_drl_3d(edges, n, seed=11)
    Q = LF.layout_drl_3d(edges, n, seed=11)
    assert P.shape == (n, 3) and np.isfinite(P).all()
    assert np.array_equal(P, Q)
    c1 = P[:5].mean(axis=0)
    c2 = P[5:].mean(axis=0)
    intra = max(np.sqrt(((P[:5] - c1) ** 2).sum(axis=1)).mean(),
                np.sqrt(((P[5:] - c2) ** 2).sum(axis=1)).mean())
    inter = np.linalg.norm(c1 - c2)
    assert inter > intra


def test_merge_dla_no_overlap():
    rng = np.random.default_rng(2)
    l1 = rng.uniform(-1, 1, (20, 2))
    l2 = rng.uniform(-1, 1, (10, 2))
    l3 = rng.uniform(-1, 1, (5, 2))
    out = LF.layout_merge_dla([l1, l2, l3], seed=4)
    assert out.shape == (35, 2) and np.isfinite(out).all()
    # component bounding discs stay essentially disjoint
    c1, c2, c3 = out[:20].mean(0), out[20:30].mean(0), out[30:].mean(0)
    r = [20 ** 0.75, 10 ** 0.75, 5 ** 0.75]
    assert np.hypot(*(c1 - c2)) > 0.5 * (r[0] + r[1])
    assert np.hypot(*(c1 - c3)) > 0.5 * (r[0] + r[2])


def test_merge_dla_deterministic():
    l1 = np.zeros((3, 2))
    l2 = np.ones((3, 2))
    a = LF.layout_merge_dla([l1, l2], seed=8)
    b = LF.layout_merge_dla([l1, l2], seed=8)
    assert np.allclose(a, b)
