"""BFS/sssp, diameter, average path length, coreness, personalized
pagerank vs networkx / numpy oracles."""

from __future__ import annotations

import numpy as np
import networkx as nx
import pyarrow as pa

from xdata_igraph_ray.graph.cores import coreness
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.pagerank import pagerank
from xdata_igraph_ray.graph.paths import (
    average_path_length,
    pseudo_diameter,
    sssp,
)

from .oracles import gnm_edges


def build(src, dst, n, P=3):
    return GraphEngine.from_edges(
        pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64)}), n=n, P=P
    )


def test_sssp_directed():
    src, dst = gnm_edges(200, 800, seed=3)
    eng = build(src, dst, 200)
    d = sssp(eng, [0], mode="out")
    g = nx.DiGraph()
    g.add_nodes_from(range(200))
    g.add_edges_from(zip(src, dst))
    want = nx.single_source_shortest_path_length(g, 0)
    for v in range(200):
        assert d[v] == want.get(v, -1)
    eng.shutdown()


def test_sssp_multi_source_and_all_mode():
    src = [0, 1, 2, 5]
    dst = [1, 2, 3, 6]
    eng = build(src, dst, 8, P=2)
    d = sssp(eng, [0, 5], mode="all")
    assert list(d) == [0, 1, 2, 3, -1, 0, 1, -1]
    eng.shutdown()


def test_pseudo_diameter_path_graph():
    n = 30
    eng = build(np.arange(n - 1), np.arange(1, n), n, P=2)
    assert pseudo_diameter(eng, mode="all") == n - 1
    eng.shutdown()


def test_average_path_length():
    src, dst = gnm_edges(60, 300, seed=9)
    eng = build(src, dst, 60, P=2)
    got = average_path_length(eng, directed=True)
    g = nx.DiGraph()
    g.add_nodes_from(range(60))
    g.add_edges_from(zip(src, dst))
    tot, cnt = 0, 0
    for s, lengths in nx.all_pairs_shortest_path_length(g):
        for t, l in lengths.items():
            if t != s:
                tot += l
                cnt += 1
    assert abs(got - tot / cnt) < 1e-12
    eng.shutdown()


def test_coreness_vs_networkx():
    src, dst = gnm_edges(300, 1500, seed=17)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedupe to a simple undirected graph for networkx parity
    pairs = set(map(tuple, np.sort(np.stack([src, dst], 1), axis=1)))
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    eng = build(a, b, 300, P=3)
    coreness(eng)
    got = eng.state_arrays("core")
    g = nx.Graph()
    g.add_nodes_from(range(300))
    g.add_edges_from(pairs)
    want = nx.core_number(g)
    assert all(got[v] == want[v] for v in range(300))
    eng.shutdown()


def test_personalized_pagerank():
    src, dst = gnm_edges(100, 500, seed=4)
    n = 100
    reset = np.zeros(n)
    reset[7] = 0.7
    reset[13] = 0.3
    eng = build(src, dst, n, P=3)
    pagerank(eng, tol=1e-12, reset=reset)
    got = eng.state_arrays("pr")
    # numpy oracle with igraph semantics + reset
    denom = np.bincount(src, minlength=n).astype(float)
    p = np.full(n, 1.0 / n)
    for _ in range(2000):
        dang = denom == 0
        sumfrom = p[dang].sum() + 0.15 * p[~dang].sum()
        tmp = np.where(dang, 0.0, p / np.where(dang, 1, denom))
        contrib = np.bincount(dst, weights=tmp[src], minlength=n)
        new = 0.85 * contrib + sumfrom * reset
        if np.abs(new - p).sum() < 1e-15:
            p = new
            break
        p = new
    np.testing.assert_allclose(got, p / p.sum(), atol=1e-9)
    eng.shutdown()


def test_topological_layers_and_is_dag():
    from xdata_igraph_ray.graph.paths import is_dag, topological_layers

    # DAG: 0->1->3, 0->2->3
    eng = build([0, 1, 0, 2], [1, 3, 2, 3], 4, P=2)
    layers, ok = topological_layers(eng)
    assert ok
    assert list(layers) == [0, 1, 1, 2]
    eng.shutdown()
    # cycle
    eng2 = build([0, 1, 2], [1, 2, 0], 3, P=2)
    assert not is_dag(eng2)
    eng2.shutdown()
