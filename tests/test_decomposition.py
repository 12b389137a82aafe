"""MCS + chordality vs networkx and structural invariants."""

from __future__ import annotations

import numpy as np
import networkx as nx
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.decomposition import (
    is_chordal,
    maximum_cardinality_search,
)


def _ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([p[0] for p in pairs], np.int64),
                "dst": np.array([p[1] for p in pairs], np.int64),
            }
        )
    )


def _adj(n, pairs):
    adj = [set() for _ in range(n)]
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def test_mcs_properties():
    # path graph: MCS order = visits stay connected
    adj = _adj(5, [(0, 1), (1, 2), (2, 3), (3, 4)])
    alpha, alpham1 = maximum_cardinality_search(adj)
    assert sorted(alpha.tolist()) == list(range(5))
    assert all(alpha[alpham1[i]] == i for i in range(5))
    # first chosen (rank n-1) is vertex 0 (all sizes 0, min id)
    assert alpham1[4] == 0
    # every later vertex (in reverse-rank processing) had the max
    # count of already-numbered neighbors at its turn
    numbered: set = set()
    size = np.zeros(5, np.int64)
    for i in range(4, -1, -1):
        v = int(alpham1[i])
        cand = [u for u in range(5) if u not in numbered]
        assert size[v] == max(size[c] for c in cand)
        numbered.add(v)
        for w in adj[v]:
            if w not in numbered:
                size[w] += 1


def test_chordal_known_graphs():
    # trees and cliques are chordal; C4/C5 are not
    tree = _adj(6, [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)])
    assert is_chordal(tree)[0]
    k5 = _adj(5, [(a, b) for a in range(5) for b in range(a + 1, 5)])
    assert is_chordal(k5)[0]
    c4 = _adj(4, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ok, _ = is_chordal(c4)
    assert not ok
    c5 = _adj(5, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    assert not is_chordal(c5)[0]


def test_chordal_vs_networkx_and_fill_in():
    rng = np.random.default_rng(21)
    for trial in range(8):
        n = 12
        pairs = [
            (a, b) for a in range(n) for b in range(a + 1, n)
            if rng.random() < 0.3
        ]
        adj = _adj(n, pairs)
        g = nx.Graph(pairs)
        g.add_nodes_from(range(n))
        ok, _ = is_chordal(adj)
        assert ok == nx.is_chordal(g), trial
        # fill-in closure: G + fill_in is chordal
        ok2, fills = is_chordal(adj, fill_in=True)
        g2 = nx.Graph(pairs)
        g2.add_nodes_from(range(n))
        g2.add_edges_from(fills)
        assert nx.is_chordal(g2), trial


def test_dataset_entry(ray_session):
    alpha, _ = maximum_cardinality_search(
        _ds([(0, 1), (1, 2), (1, 0)]), n=3, P=2
    )
    assert sorted(alpha.tolist()) == [0, 1, 2]
    assert is_chordal(_ds([(0, 1), (1, 2), (2, 0)]), n=3, P=2)[0]
