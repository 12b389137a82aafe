"""Weighted SSSP + Brandes betweenness + closeness vs independent
oracles (networkx / direct formula)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph.centrality import betweenness, closeness
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.paths import sssp, sssp_weighted

from .oracles import gnm_edges


def _weighted_engine(src, dst, w, n, P=3):
    t = pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64),
                  "weight": np.asarray(w, np.float64)})
    return GraphEngine.from_edges(t, n=n, P=P, weighted=True)


def _engine(src, dst, n, P=3):
    t = pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64)})
    return GraphEngine.from_edges(t, n=n, P=P)


def test_wsssp_vs_networkx_gnm():
    import networkx as nx

    rng = np.random.default_rng(21)
    n, m = 200, 1200
    src, dst = gnm_edges(n, m, seed=21)
    w = rng.uniform(0.5, 10.0, m)
    g = nx.MultiDiGraph()
    g.add_nodes_from(range(n))
    g.add_weighted_edges_from(zip(src.tolist(), dst.tolist(), w.tolist()))
    want = nx.single_source_dijkstra_path_length(g, 0)
    eng = _weighted_engine(src, dst, w, n)
    d = sssp_weighted(eng, [0], mode="out")
    eng.shutdown()
    for v in range(n):
        if v in want:
            assert abs(d[v] - want[v]) < 1e-9, v
        else:
            assert np.isinf(d[v]), v


def test_wsssp_modes_and_multisource():
    # chain 0-w->1-w->2 with a heavy shortcut
    src = [0, 1, 0, 3]
    dst = [1, 2, 2, 0]
    w = [1.0, 1.0, 5.0, 2.0]
    eng = _weighted_engine(src, dst, w, 4, P=2)
    d = sssp_weighted(eng, [0], mode="out")
    np.testing.assert_allclose(d[:3], [0, 1, 2])
    assert np.isinf(d[3])
    d_in = sssp_weighted(eng, [2], mode="in")
    np.testing.assert_allclose(d_in[:3], [2, 1, 0])
    d_all = sssp_weighted(eng, [3], mode="all")
    np.testing.assert_allclose(d_all, [2, 3, 4, 0])
    # multi-source
    d_ms = sssp_weighted(eng, [0, 3], mode="out")
    np.testing.assert_allclose(d_ms, [0, 1, 2, 0])
    eng.shutdown()


def test_wsssp_negative_weights():
    # negative edge but no negative cycle — Bellman-Ford territory
    src = [0, 0, 1, 2]
    dst = [1, 2, 3, 3]
    w = [4.0, 2.0, -3.0, 1.0]
    eng = _weighted_engine(src, dst, w, 4, P=2)
    d = sssp_weighted(eng, [0])
    np.testing.assert_allclose(d, [0, 4, 2, 1])
    eng.shutdown()


def test_betweenness_vs_networkx():
    import networkx as nx

    n, m = 120, 600
    src, dst = gnm_edges(n, m, seed=33)
    # simplified directed graph (multi-edges multiply path counts)
    pairs = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    want = nx.betweenness_centrality(g, normalized=False)
    es, ed = np.array([p[0] for p in pairs]), np.array([p[1] for p in pairs])
    eng = _engine(es, ed, n)
    got = betweenness(eng, wave=32)
    eng.shutdown()
    for v in range(n):
        assert abs(got[v] - want[v]) < 1e-8, (v, got[v], want[v])


def test_betweenness_star_exact():
    # star: center 0 <-> leaves; directed both ways
    leaves = list(range(1, 8))
    src = [0] * 7 + leaves
    dst = leaves + [0] * 7
    eng = _engine(src, dst, 8, P=2)
    got = betweenness(eng, wave=8)
    eng.shutdown()
    # center lies on every leaf->leaf shortest path: 7*6 ordered pairs
    assert got[0] == pytest.approx(42.0)
    np.testing.assert_allclose(got[1:], 0.0)


def test_closeness_igraph_formula():
    n, m = 100, 400
    src, dst = gnm_edges(n, m, seed=44)
    eng = _engine(src, dst, n)
    got = closeness(eng, wave=40)
    # independent oracle: per-source BFS + igraph's unreachable rule
    for s in [0, 3, 57, 99]:
        d = sssp(eng, [s], mode="out")
        reach = (d >= 0).sum()
        total = d[d >= 0].sum() + n * (n - reach)
        assert got[s] == pytest.approx(1.0 / total), s
    gotn = closeness(eng, sources=[0], normalized=True)
    d = sssp(eng, [0], mode="out")
    total = d[d >= 0].sum() + n * (n - (d >= 0).sum())
    assert gotn[0] == pytest.approx((n - 1.0) / total)
    eng.shutdown()


def test_closeness_modes_vs_networkx():
    """mode='in'/'all' (union-CSR BFS) vs networkx per-source BFS."""
    import networkx as nx

    n, m = 80, 300
    src, dst = gnm_edges(n, m, seed=9)
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src, dst))
    eng = _engine(src, dst, n, P=3)
    got_in = closeness(eng, wave=40, mode="in")
    got_all = closeness(eng, wave=40, mode="all")
    gr = g.reverse()
    gu = g.to_undirected()
    for s in [0, 5, 41, 79]:
        for got, gg in ((got_in, gr), (got_all, gu)):
            d = nx.single_source_shortest_path_length(gg, s)
            total = sum(d.values()) + n * (n - len(d))
            assert got[s] == pytest.approx(1.0 / total), s
    # eccentricity mode='all' on the undirected view
    from xdata_igraph_ray.graph.centrality import eccentricity

    ecc = eccentricity(eng, sources=[0, 7, 33], mode="all")
    for i, s in enumerate([0, 7, 33]):
        d = nx.single_source_shortest_path_length(gu, s)
        assert ecc[i] == max(d.values()), s
    eng.shutdown()


def test_betweenness_sampled_sources():
    n, m = 80, 400
    src, dst = gnm_edges(n, m, seed=7)
    pairs = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    es, ed = np.array([p[0] for p in pairs]), np.array([p[1] for p in pairs])
    eng = _engine(es, ed, n)
    full = betweenness(eng)
    sub = betweenness(eng, sources=np.arange(0, n, 2))
    eng.shutdown()
    # sampled run is a partial sum of per-source dependencies
    assert (sub <= full + 1e-9).all()
    assert sub.sum() > 0


def test_edge_betweenness_vs_networkx():
    import networkx as nx
    from xdata_igraph_ray.graph.centrality import edge_betweenness

    n, m = 90, 420
    src, dst = gnm_edges(n, m, seed=41)
    pairs = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    want = nx.edge_betweenness_centrality(g, normalized=False)
    es = np.array([p[0] for p in pairs])
    ed = np.array([p[1] for p in pairs])
    eng = _engine(es, ed, n)
    df = edge_betweenness(eng, wave=32).to_pandas()
    eng.shutdown()
    got = {(int(r["src"]), int(r["dst"])): r["eb"] for _, r in df.iterrows()}
    assert set(got) == pairs
    for e in pairs:
        assert got[e] == pytest.approx(want[e], abs=1e-8), e


def test_eccentricity_radius():
    import networkx as nx
    from xdata_igraph_ray.graph.centrality import eccentricity, radius

    n, m = 80, 500
    src, dst = gnm_edges(n, m, seed=51)
    eng = _engine(src, dst, n)
    ecc = eccentricity(eng, wave=32)
    g = nx.MultiDiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    for v in range(n):
        lengths = nx.single_source_shortest_path_length(g, v)
        assert ecc[v] == max(lengths.values()), v
    assert radius(eng) == ecc.min()
    eng.shutdown()


def test_harmonic_centrality_vs_networkx():
    import networkx as nx

    from xdata_igraph_ray.graph import generators
    from xdata_igraph_ray.graph.centrality import harmonic_centrality
    from xdata_igraph_ray.graph.engine import GraphEngine

    t = generators.erdos_renyi_gnm(60, 240, directed=True, seed=8)
    eng = GraphEngine.from_edges(t, n=60, P=3)
    try:
        h = harmonic_centrality(eng, normalized=False, wave=30)
    finally:
        eng.shutdown()
    g = nx.DiGraph(list(zip(t["src"].to_numpy(), t["dst"].to_numpy())))
    g.add_nodes_from(range(60))
    # networkx harmonic_centrality sums 1/d over INCOMING paths; use
    # the reversed graph to get the out-mode value
    want = nx.harmonic_centrality(g.reverse())
    got = {v: h[v] for v in range(60)}
    for v in range(60):
        assert abs(got[v] - want[v]) < 1e-9, v


def test_weighted_closeness_eccentricity_vs_networkx():
    import networkx as nx
    import pyarrow as pa

    from xdata_igraph_ray.graph.centrality import (
        closeness_weighted, diameter_weighted, eccentricity_weighted,
    )
    from xdata_igraph_ray.graph.engine import GraphEngine

    rng = np.random.default_rng(12)
    n, m = 40, 200
    pairs = set()
    while len(pairs) < m:
        u, v = rng.integers(0, n, size=2)
        if u != v:
            pairs.add((int(u), int(v)))
    edges = sorted(pairs)
    w = rng.integers(1, 9, size=len(edges)).astype(float)
    t = pa.table({"src": np.array([e[0] for e in edges], dtype=np.int64),
                  "dst": np.array([e[1] for e in edges], dtype=np.int64),
                  "weight": w})
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    for (u, v), ww in zip(edges, w):
        g.add_edge(u, v, weight=ww)
    dist = dict(nx.all_pairs_dijkstra_path_length(g))
    eng = GraphEngine.from_edges(t, n=n, P=3, weighted=True)
    try:
        c = closeness_weighted(eng, wave=16)
        e = eccentricity_weighted(eng, wave=16)
        dia = diameter_weighted(eng, wave=16)
    finally:
        eng.shutdown()
    for s in range(n):
        ds = dist[s]
        reach = len(ds)
        total = sum(ds.values()) + n * (n - reach)
        assert abs(c[s] - 1.0 / total) < 1e-12, s
        assert abs(e[s] - max(ds.values())) < 1e-12, s
    want_dia = max(max(d.values()) for d in dist.values())
    assert abs(dia - want_dia) < 1e-12


def test_weighted_betweenness_vs_networkx():
    import networkx as nx

    rng = np.random.default_rng(55)
    n, m = 60, 300
    pairs = set()
    while len(pairs) < m:
        u, v = rng.integers(0, n, size=2)
        if u != v:
            pairs.add((int(u), int(v)))
    edges = sorted(pairs)
    w = rng.integers(1, 7, size=len(edges)).astype(float)
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    for (u, v), ww in zip(edges, w):
        g.add_edge(u, v, weight=ww)
    want = nx.betweenness_centrality(g, weight="weight", normalized=False)
    from xdata_igraph_ray.graph.centrality import betweenness_weighted

    eng = _weighted_engine(
        [e[0] for e in edges], [e[1] for e in edges], w, n, P=3
    )
    try:
        got = betweenness_weighted(eng, wave=16)
    finally:
        eng.shutdown()
    for v in range(n):
        assert abs(got[v] - want[v]) < 1e-8, (v, got[v], want[v])


def test_weighted_betweenness_sampled_sources():
    rng = np.random.default_rng(9)
    n, m = 40, 160
    pairs = set()
    while len(pairs) < m:
        u, v = rng.integers(0, n, size=2)
        if u != v:
            pairs.add((int(u), int(v)))
    edges = sorted(pairs)
    w = rng.integers(1, 5, size=len(edges)).astype(float)
    from xdata_igraph_ray.graph.centrality import betweenness_weighted

    eng = _weighted_engine(
        [e[0] for e in edges], [e[1] for e in edges], w, n, P=2
    )
    try:
        full = betweenness_weighted(eng, wave=16)
        sub = betweenness_weighted(eng, sources=np.arange(0, n, 2), wave=16)
    finally:
        eng.shutdown()
    assert (sub <= full + 1e-9).all()
    assert sub.sum() > 0


def test_weighted_harmonic_vs_networkx():
    import networkx as nx

    rng = np.random.default_rng(77)
    n, m = 50, 250
    pairs = set()
    while len(pairs) < m:
        u, v = rng.integers(0, n, size=2)
        if u != v:
            pairs.add((int(u), int(v)))
    edges = sorted(pairs)
    w = rng.integers(1, 9, size=len(edges)).astype(float)
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    for (u, v), ww in zip(edges, w):
        g.add_edge(u, v, weight=ww)
    # networkx harmonic sums over INCOMING paths; reverse for out-mode
    want = nx.harmonic_centrality(g.reverse(), distance="weight")
    from xdata_igraph_ray.graph.centrality import harmonic_weighted

    eng = _weighted_engine(
        [e[0] for e in edges], [e[1] for e in edges], w, n, P=3
    )
    try:
        got = harmonic_weighted(eng, normalized=False, wave=16)
    finally:
        eng.shutdown()
    for v in range(n):
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
