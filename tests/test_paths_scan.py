"""Shortest-path extraction, scan statistics, girth — vs networkx /
brute-force oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from xdata_igraph_ray.graph import scan
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.metrics import local_scan_1
from xdata_igraph_ray.graph.paths import get_shortest_paths, girth, sssp

from .oracles import gnm_edges


def _engine(src, dst, n, P=3):
    t = pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64)})
    return GraphEngine.from_edges(t, n=n, P=P)


def _ds(src, dst):
    return rd.from_arrow(pa.table({"src": np.asarray(src, np.int64),
                                   "dst": np.asarray(dst, np.int64)}))


def test_get_shortest_paths_gnm():
    n, m = 150, 700
    src, dst = gnm_edges(n, m, seed=27)
    eng = _engine(src, dst, n)
    d = sssp(eng, [0], mode="out")
    targets = list(range(0, n, 7))
    paths = get_shortest_paths(eng, 0, targets, mode="out")
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for t, p in zip(targets, paths):
        if d[t] < 0:
            assert p == []
            continue
        assert p[0] == 0 and p[-1] == t
        assert len(p) == d[t] + 1  # a SHORTEST path
        for a, b in zip(p, p[1:]):
            assert (a, b) in edge_set
    eng.shutdown()


def test_get_shortest_paths_deterministic_parent():
    # two shortest paths 0->1->3 and 0->2->3: min-vid parent => via 1
    eng = _engine([0, 0, 1, 2], [1, 2, 3, 3], 4, P=2)
    (p,) = get_shortest_paths(eng, 0, [3])
    assert p == [0, 1, 3]
    eng.shutdown()


def test_scan0_and_them():
    out = scan.local_scan_0(_ds([0, 0, 1], [1, 2, 2]), n=4, P=2)
    s = out.to_pandas().set_index("vid")["scan0"]
    assert list(s[[0, 1, 2, 3]]) == [2, 2, 2, 0]


def test_scan1_them_equals_scan1_on_same_graph():
    n, m = 80, 320
    src, dst = gnm_edges(n, m, seed=31)
    pairs = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(src, dst) if a != b}
    es = np.array([p[0] for p in pairs])
    ed = np.array([p[1] for p in pairs])
    want = (
        local_scan_1(_ds(es, ed), n=n, P=2)
        .to_pandas().set_index("vid")["scan1"]
    )
    got = (
        scan.local_scan_1_ecount_them(_ds(es, ed), _ds(es, ed), n=n, P=2)
        .to_pandas().set_index("vid")["scan1_them"]
    )
    for v in range(n):
        assert got[v] == want[v], v


def test_scan_k_matches_brute():
    n, m = 70, 260
    src, dst = gnm_edges(n, m, seed=13)
    eng = _engine(src, dst, n)
    for k in (1, 2):
        got = scan.local_scan_k_ecount(eng, k=k, wave=32)
        # brute force: BFS out-neighborhoods + edge containment
        import networkx as nx

        g = nx.MultiDiGraph()
        g.add_nodes_from(range(n))
        g.add_edges_from(zip(src.tolist(), dst.tolist()))
        for v in range(n):
            lengths = nx.single_source_shortest_path_length(g, v, cutoff=k)
            nb = set(lengths)
            want = sum(1 for a, b in zip(src, dst) if a in nb and b in nb)
            assert got[v] == want, (v, k)
    eng.shutdown()


def test_scan1_approximate_subset():
    n, m = 60, 200
    src, dst = gnm_edges(n, m, seed=3)
    eng = _engine(src, dst, n)
    exact = scan.local_scan_k_ecount(eng, k=1, wave=32)
    approx = scan.local_scan_1_ecount_approximate(eng, sample=20, seed=1)
    mask = ~np.isnan(approx)
    assert mask.sum() == 20
    np.testing.assert_allclose(approx[mask], exact[mask])
    eng.shutdown()


def test_girth_cases():
    import networkx as nx

    # 5-cycle: girth 5
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    assert girth(_ds([a for a, _ in c5], [b for _, b in c5]), n=5, P=2) == 5
    # tree: no cycle
    assert girth(_ds([0, 0, 1], [1, 2, 3]), n=4, P=2) == float("inf")
    # 4-cycle plus chord -> girth 3
    src = [0, 1, 2, 3, 0]
    dst = [1, 2, 3, 0, 2]
    assert girth(_ds(src, dst), n=4, P=2) == 3
    # random graphs vs networkx.girth
    for seed in (5, 11):
        s, d = gnm_edges(40, 90, seed=seed)
        g = nx.Graph()
        g.add_nodes_from(range(40))
        g.add_edges_from(
            (int(a), int(b)) for a, b in zip(s, d) if a != b
        )
        want = nx.girth(g)
        got = girth(_ds(s, d), n=40, P=2, wave=16)
        assert got == want, (seed, got, want)


def test_scan_k_them_matches_brute():
    """Cross-engine THEM scan-k: co-partitioned engines, masks from
    US, edge counting in THEM (igraph_local_scan_k_ecount_them,
    src/scan.c:831)."""
    rng = np.random.default_rng(3)
    n = 60
    us_s = rng.integers(0, n, 300)
    us_d = rng.integers(0, n, 300)
    th_s = rng.integers(0, n, 250)
    th_d = rng.integers(0, n, 250)
    us = GraphEngine.from_edges(
        pa.table({"src": us_s, "dst": us_d}), n=n, P=4
    )
    them = GraphEngine.from_edges(
        pa.table({"src": th_s, "dst": th_d}), n=n, P=4, bounds=us.bounds
    )
    adj = [[] for _ in range(n)]
    for s, d in zip(us_s, us_d):
        adj[s].append(d)
    for k in (1, 2, 3):
        got = scan.local_scan_k_ecount_them(us, them, k=k, wave=32)
        want = np.zeros(n)
        for v in range(n):
            dist = {v}
            frontier = [v]
            for _ in range(k):
                nxt = [
                    w for u in frontier for w in adj[u] if w not in dist
                ]
                dist.update(nxt)
                frontier = nxt
            want[v] = sum(
                1 for s, d in zip(th_s, th_d) if s in dist and d in dist
            )
        assert np.array_equal(got, want)
    us.shutdown()
    them.shutdown()


def test_scan_k_them_requires_copartition():
    t = pa.table({"src": np.array([0, 1]), "dst": np.array([1, 2])})
    us = GraphEngine.from_edges(t, n=3, P=2)
    other = GraphEngine.from_edges(t, n=3, P=1)
    with pytest.raises(ValueError):
        scan.local_scan_k_ecount_them(us, other, 2)
    with pytest.raises(ValueError):
        them = GraphEngine.from_edges(t, n=3, P=2, bounds=us.bounds)
        scan.local_scan_k_ecount_them(us, them, 0)
    us.shutdown()


def test_scan1_eigen_approximation():
    """Formula replication + convergence: with nearly the full
    spectrum the eigen formula approaches deg + triangles = exact
    scan_1 on a simple undirected graph."""
    rng = np.random.default_rng(9)
    n = 24
    iu = np.triu_indices(n, k=1)
    keep = rng.random(len(iu[0])) < 0.25
    a, b = iu[0][keep], iu[1][keep]
    # undirected single-arc convention (same as eigen_adjacency)
    t = pa.table({"src": a.astype(np.int64), "dst": b.astype(np.int64)})
    got = scan.local_scan_1_ecount_approximate_eigen(t, n, noevals=n - 1)
    # independent exact formula: deg + per-vertex triangle count
    A = np.zeros((n, n))
    A[a, b] = 1.0
    A[b, a] = 1.0
    exact = A.sum(1) + 0.5 * np.diag(A @ A @ A)
    # one eigenvalue missing -> error bounded by 0.5*|lambda_min|^3
    vals = np.linalg.eigvalsh(A)
    bound = 0.5 * float(np.min(np.abs(vals))) ** 3 + 1e-9
    assert np.max(np.abs(got - exact)) <= bound
    with pytest.raises(ValueError):
        scan.local_scan_1_ecount_approximate_eigen(t, n, noevals=0)
    with pytest.raises(ValueError):
        scan.local_scan_1_ecount_approximate_eigen(t, n, noevals=n)
