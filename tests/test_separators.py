"""Separators + cohesive blocking vs the reference's own example
fixtures (examples/simple/cohesive_blocks.{c,out},
igraph_minimum_size_separators.{c,out}) and brute force."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.separators import (
    all_minimal_st_separators,
    cohesive_blocks,
    collapse_support,
    is_minimal_separator,
    is_separator,
    minimum_size_separators,
    _vertex_connectivity_small,
)


def _adj(n, pairs):
    adj = [set() for _ in range(n)]
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([p[0] for p in pairs], np.int64),
                "dst": np.array([p[1] for p in pairs], np.int64),
            }
        )
    )


MOODY_WHITE = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
    (1, 2), (1, 3), (1, 4), (1, 6),
    (2, 3), (2, 5), (2, 6),
    (3, 4), (3, 5), (3, 6),
    (4, 5), (4, 6), (4, 20),
    (5, 6),
    (6, 7), (6, 10), (6, 13), (6, 18),
    (7, 8), (7, 10), (7, 13),
    (8, 9),
    (9, 11), (9, 12),
    (10, 11), (10, 13),
    (11, 15),
    (12, 15),
    (13, 14),
    (14, 15),
    (16, 17), (16, 18), (16, 19),
    (17, 19), (17, 20),
    (18, 19), (18, 21), (18, 22),
    (19, 20),
    (20, 21), (20, 22),
    (21, 22),
]


def test_minimum_size_separators_reference_examples():
    # star K_{1,6}: single articulation point 0
    adj = _adj(7, [(i, 0) for i in range(1, 7)])
    assert minimum_size_separators(adj) == [(0,)]
    # two hubs 3,4 over leaves 0,1,2: reference output "3 4"
    adj = _adj(5, [(0, 3), (1, 3), (2, 3), (0, 4), (1, 4), (2, 4)])
    got = {tuple(s) for s in minimum_size_separators(adj)}
    assert got == {(3, 4)}
    # 10-vertex two-hub graph with a 2-path: reference output "2 3"
    adj = _adj(10, [(0, 2), (0, 3), (1, 2), (1, 3), (5, 2), (5, 3),
                    (6, 2), (6, 3), (7, 2), (7, 3), (8, 2), (8, 3),
                    (9, 2), (9, 3), (2, 4), (4, 3)])
    got = {tuple(s) for s in minimum_size_separators(adj)}
    assert got == {(2, 3)}
    # same shape, hubs first: reference output "2 3" "1 2"? actual:
    # vertices 2,3,4 connect to 0 and 1 -> k=2
    adj = _adj(5, [(2, 0), (3, 0), (4, 0), (2, 1), (3, 1), (4, 1)])
    got = {tuple(s) for s in minimum_size_separators(adj)}
    # brute force: all 2-subsets that separate
    want = {
        s for s in combinations(range(5), 2) if is_separator(adj, s)
    }
    assert got == want
    # K4: all 3-subsets
    adj = _adj(4, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    got = {tuple(s) for s in minimum_size_separators(adj)}
    assert got == {(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)}


def test_minimum_size_separators_brute():
    rng = np.random.default_rng(3)
    for trial in range(6):
        n = 9
        pairs = [
            (a, b) for a in range(n) for b in range(a + 1, n)
            if rng.random() < 0.45
        ]
        adj = _adj(n, pairs)
        k = _vertex_connectivity_small(adj)
        if k == 0:
            continue
        got = {tuple(s) for s in minimum_size_separators(adj)}
        want = {
            s for s in combinations(range(n), k)
            if is_separator(adj, s)
        }
        assert got == want, (trial, k)


def test_all_minimal_st_separators_brute():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 8
        pairs = [
            (a, b) for a in range(n) for b in range(a + 1, n)
            if rng.random() < 0.4
        ]
        adj = _adj(n, pairs)
        got = {tuple(s) for s in all_minimal_st_separators(adj)}
        want = set()
        for r in range(1, n - 1):
            for s in combinations(range(n), r):
                if is_minimal_separator(adj, s):
                    want.add(s)
        assert got == want, trial


def test_cohesive_blocks_moody_white():
    blocks, coh, parents, tree = cohesive_blocks(
        _ds(MOODY_WHITE), n=23, P=3
    )
    assert [sorted(b) for b in blocks] == [
        list(range(23)),
        [0, 1, 2, 3, 4, 5, 6, 16, 17, 18, 19, 20, 21, 22],
        [6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [0, 1, 2, 3, 4, 5, 6],
        [6, 7, 10, 13],
    ]
    assert coh == [1, 2, 2, 5, 3]
    assert parents == [-1, 0, 0, 1, 2]
    assert sorted(tree) == [(0, 1), (0, 2), (1, 3), (2, 4)]


def test_cohesive_blocks_tricky_and_camp():
    # "tricky" graph: separators themselves form a block (excluded)
    pairs = [
        (0, 1), (0, 4), (0, 5), (1, 2), (1, 4), (1, 5), (1, 6),
        (2, 3), (2, 5), (2, 6), (2, 7), (3, 6), (3, 7), (4, 5),
        (5, 6), (6, 7),
    ]
    blocks, coh, parents, _ = cohesive_blocks(_ds(pairs), n=8, P=2)
    assert [sorted(b) for b in blocks] == [
        list(range(8)), [0, 1, 4, 5], [2, 3, 6, 7], [1, 2, 5, 6],
    ]
    assert coh == [2, 3, 3, 3]
    assert parents == [-1, 0, 0, 0]
    # science camp graph
    camp = [
        (0, 1), (0, 2), (0, 3),
        (1, 2), (1, 3), (1, 16), (1, 17),
        (2, 3),
        (3, 17),
        (4, 5), (4, 6), (4, 7), (4, 8),
        (5, 6), (5, 7),
        (6, 7), (6, 8),
        (7, 8), (7, 16),
        (8, 9), (8, 10),
        (9, 11), (9, 12), (9, 13), (9, 14),
        (10, 11), (10, 12), (10, 13),
        (11, 14),
        (12, 13), (12, 14), (12, 15),
        (15, 16), (15, 17),
        (16, 17),
    ]
    blocks, coh, parents, _ = cohesive_blocks(_ds(camp), n=18, P=2)
    assert [sorted(b) for b in blocks] == [
        list(range(18)),
        [0, 1, 2, 3],
        [4, 5, 6, 7, 8],
        [9, 10, 11, 12, 13, 14],
    ]
    assert coh == [2, 3, 3, 3]
    assert parents == [-1, 0, 0, 0]


def test_collapse_support_and_predicates():
    adj = collapse_support(_ds([(0, 1), (1, 0), (1, 2), (2, 2)]), 4, P=2)
    assert adj[0] == {1} and adj[1] == {0, 2} and adj[3] == set()
    assert is_separator(adj, {1})
    assert is_minimal_separator(adj, {1})
    assert not is_minimal_separator(adj, {0, 1})


def test_all_st_cuts_reference_examples():
    from xdata_igraph_ray.graph.separators import all_st_cuts

    def canon(cuts, parts):
        return sorted(
            (tuple(p), tuple(c)) for c, p in zip(cuts, parts)
        )

    # example 1 (igraph_all_st_cuts.out section 1)
    arcs = [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (1, 5), (5, 4)]
    cuts, parts = all_st_cuts(arcs, 6, 0, 4)
    assert canon(cuts, parts) == sorted([
        ((0,), (0,)),
        ((0, 1), (1, 2, 5)),
        ((0, 1, 5), (1, 2, 6)),
        ((0, 1, 3), (1, 4, 5)),
        ((0, 1, 3, 5), (1, 4, 6)),
        ((0, 1, 2), (2, 3, 5)),
        ((0, 1, 2, 5), (2, 3, 6)),
        ((0, 1, 2, 3), (3, 4, 5)),
        ((0, 1, 2, 3, 5), (3, 4, 6)),
    ])
    # example 2
    cuts, parts = all_st_cuts([(0, 2), (1, 2)], 3, 1, 2)
    assert canon(cuts, parts) == [((1,), (1,))]
    # example 3 (cycle back-arc)
    arcs = [(0, 1), (1, 2), (2, 3), (3, 4), (3, 1)]
    cuts, parts = all_st_cuts(arcs, 5, 0, 4)
    assert canon(cuts, parts) == sorted([
        ((0,), (0,)),
        ((0, 1), (1,)),
        ((0, 1, 2), (2,)),
        ((0, 1, 2, 3), (3,)),
    ])
    # example 4 (diamond with parallel middle paths)
    arcs = [(0, 1), (0, 2), (1, 3), (2, 3),
            (1, 4), (1, 5), (1, 6),
            (4, 2), (5, 2), (6, 2)]
    cuts, parts = all_st_cuts(arcs, 7, 0, 3)
    assert len(cuts) == 11
    got = canon(cuts, parts)
    assert ((0,), (0, 1)) in got
    assert ((0, 1, 2, 4, 5, 6), (2, 3)) in got
    # minimality: dropping any one edge of a cut un-cuts it
    import networkx as nx

    g = nx.DiGraph(arcs)
    for cut in cuts:
        for e in cut:
            g2 = nx.DiGraph(
                [a for i, a in enumerate(arcs)
                 if i not in set(cut) - {e}]
            )
            g2.add_nodes_from(range(7))
            assert nx.has_path(g2, 0, 3)


def test_all_st_mincuts_reference_fixtures():
    """Exact match against the reference's own
    examples/simple/igraph_all_st_mincuts.out (partition/cut sets,
    order-insensitive)."""
    from xdata_igraph_ray.graph.separators import all_st_mincuts

    def run(arcs, n, s, t):
        value, cuts = all_st_mincuts(arcs, n, s, t)
        return value, {(frozenset(p), frozenset(c)) for p, c in cuts}

    # case 1: path 0->4
    v, got = run([(0, 1), (1, 2), (2, 3), (3, 4)], 5, 0, 4)
    assert v == 1
    assert got == {
        (frozenset({0}), frozenset({0})),
        (frozenset({0, 1}), frozenset({1})),
        (frozenset({0, 1, 2}), frozenset({2})),
        (frozenset({0, 1, 2, 3}), frozenset({3})),
    }
    # case 2: diamond + tail, t=5
    arcs = [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    v, got = run(arcs, 6, 0, 5)
    assert v == 1
    assert got == {
        (frozenset({0}), frozenset({0})),
        (frozenset({0, 1, 2, 3, 4}), frozenset({5})),
    }
    # case 3: same graph, t=4 (only one min cut)
    v, got = run(arcs, 6, 0, 4)
    assert v == 1
    assert got == {(frozenset({0}), frozenset({0}))}
    # case 4: wide parallel middle, value 2
    arcs = [(0, 1), (0, 2), (1, 3), (2, 3),
            (1, 4), (4, 2), (1, 5), (5, 2), (1, 6), (6, 2),
            (1, 7), (7, 2), (1, 8), (8, 2)]
    v, got = run(arcs, 9, 0, 3)
    assert v == 2
    assert got == {
        (frozenset({0}), frozenset({0, 1})),
        (frozenset({0, 2}), frozenset({0, 3})),
        (frozenset({0, 1, 2, 4, 5, 6, 7, 8}), frozenset({2, 3})),
    }
    # weighted: capacities change the min cut
    v, cuts = all_st_mincuts([(0, 1), (1, 2)], 3, 0, 2,
                             capacity=[5.0, 1.0])
    assert v == 1.0
    assert [(sorted(p), c) for p, c in cuts] == [([0, 1], [1])]
