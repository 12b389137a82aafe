"""Minimum spanning forest (Boruvka) vs networkx Kruskal."""

from __future__ import annotations

import numpy as np
import networkx as nx
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.mst import minimum_spanning_tree

from .oracles import gnm_edges


def _ds(src, dst, w=None):
    cols = {
        "src": np.asarray(src, np.int64),
        "dst": np.asarray(dst, np.int64),
    }
    if w is not None:
        cols["weight"] = np.asarray(w, np.float64)
    return rd.from_arrow(pa.table(cols))


def _nx_forest_weight(src, dst, w, n):
    g = nx.Graph()
    g.add_nodes_from(range(n))
    for s, d, ww in zip(src, dst, w):
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        if not g.has_edge(a, b) or g[a][b]["weight"] > ww:
            g.add_edge(a, b, weight=ww)
    f = nx.minimum_spanning_tree(g, algorithm="kruskal")
    return (
        f.number_of_edges(),
        sum(d["weight"] for _, _, d in f.edges(data=True)),
    )


def test_mst_distinct_weights_exact_edges():
    n, m = 50, 180
    src, dst = gnm_edges(n, m, seed=5)
    rng = np.random.default_rng(9)
    w = rng.permutation(m).astype(np.float64) + 1.0  # distinct weights

    got = minimum_spanning_tree(_ds(src, dst, w), n, P=3).to_pandas()
    # distinct weights => unique MSF; compare exact edge sets
    g = nx.Graph()
    g.add_nodes_from(range(n))
    for s, d, ww in zip(src, dst, w):
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        if not g.has_edge(a, b) or g[a][b]["weight"] > ww:
            g.add_edge(a, b, weight=ww)
    exp = {
        (min(a, b), max(a, b))
        for a, b in nx.minimum_spanning_tree(g).edges()
    }
    assert {(int(r.a), int(r.b)) for r in got.itertuples()} == exp


def test_mst_ties_and_multi_edges_weight_equal():
    n, m = 60, 300
    src, dst = gnm_edges(n, m, seed=12)
    rng = np.random.default_rng(3)
    w = rng.integers(1, 6, m).astype(np.float64)  # heavy ties
    # inject multi-edges with different weights and loops
    src = np.concatenate((src, src[:10], [4, 4]))
    dst = np.concatenate((dst, dst[:10], [4, 9]))
    w = np.concatenate((w, w[:10] + 0.5, [0.1, 2.0]))

    got = minimum_spanning_tree(_ds(src, dst, w), n, P=4).to_pandas()
    n_exp, w_exp = _nx_forest_weight(src, dst, w, n)
    assert len(got) == n_exp
    assert np.isclose(got["w"].sum(), w_exp)
    # forest: acyclic check via networkx
    g = nx.Graph()
    g.add_edges_from((int(r.a), int(r.b)) for r in got.itertuples())
    assert nx.is_forest(g)


def test_mst_unweighted_disconnected_forest():
    # two components: path 0-1-2-3 and triangle 5-6-7; vertex 4 isolated
    src = [0, 1, 2, 5, 6, 7]
    dst = [1, 2, 3, 6, 7, 5]
    got = minimum_spanning_tree(_ds(src, dst), 8, P=2).to_pandas()
    assert len(got) == 5  # 3 + 2 edges
    assert np.allclose(got["w"], 1.0)


def test_mst_empty():
    got = minimum_spanning_tree(_ds([], []), 5, P=2).to_pandas()
    assert len(got) == 0
