"""Maximal cliques vs networkx.find_cliques."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.cliques import (
    clique_number,
    count_maximal_cliques,
    maximal_cliques,
)

from .oracles import gnm_edges


def _ds(src, dst):
    return rd.from_arrow(pa.table({"src": np.asarray(src, np.int64),
                                   "dst": np.asarray(dst, np.int64)}))


def _nx_cliques(src, dst, n):
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(
        (int(a), int(b)) for a, b in zip(src, dst) if a != b
    )
    return {tuple(sorted(c)) for c in nx.find_cliques(g)}


def test_cliques_handcrafted():
    # K4 {0,1,2,3} plus triangle {3,4,5} plus pendant 5-6
    src = [0, 0, 0, 1, 1, 2, 3, 3, 4, 5]
    dst = [1, 2, 3, 2, 3, 3, 4, 5, 5, 6]
    got = {
        tuple(c) for c in
        maximal_cliques(_ds(src, dst), P=2).to_pandas()["clique"]
    }
    assert got == {(0, 1, 2, 3), (3, 4, 5), (5, 6)}
    assert clique_number(_ds(src, dst), P=2) == 4


def test_cliques_gnm_vs_networkx():
    for seed in (2, 19):
        src, dst = gnm_edges(60, 350, seed=seed)
        want = _nx_cliques(src, dst, 60)
        got = {
            tuple(c) for c in
            maximal_cliques(_ds(src, dst), P=3).to_pandas()["clique"]
        }
        assert got == want, seed
        assert count_maximal_cliques(_ds(src, dst), P=3) == len(want)


def test_all_cliques_and_largest(ray_session):
    import ray.data as rd

    import networkx as nx

    from xdata_igraph_ray.graph.cliques import cliques, largest_cliques

    rng = np.random.default_rng(21)
    n = 12
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.45]
    arcs = pairs + [(b, a) for a, b in pairs]
    t = pa.table({"src": np.array([a for a, _ in arcs], np.int64),
                  "dst": np.array([b for _, b in arcs], np.int64)})
    got = cliques(t, min_size=2, n=n)
    g = nx.Graph(pairs)
    g.add_nodes_from(range(n))
    want = sorted(sorted(c) for c in nx.enumerate_all_cliques(g)
                  if len(c) >= 2)
    assert got == want
    # min/max filters
    got3 = cliques(t, min_size=3, max_size=3, n=n)
    assert got3 == sorted(s for s in want if len(s) == 3)
    # size-1 cliques: every vertex
    assert [c for c in cliques(t, n=n) if len(c) == 1] == \
        [[v] for v in range(n)]
    # largest_cliques vs networkx
    lg = largest_cliques(rd.from_arrow(t), P=2)
    maxk = max(len(c) for c in nx.find_cliques(g))
    want_lg = sorted(sorted(c) for c in nx.find_cliques(g)
                     if len(c) == maxk)
    assert lg == want_lg


def test_independent_sets(ray_session):
    import networkx as nx

    from xdata_igraph_ray.graph.cliques import (
        independence_number,
        independent_vertex_sets,
        largest_independent_vertex_sets,
        maximal_independent_vertex_sets,
    )

    rng = np.random.default_rng(22)
    n = 11
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.4]
    arcs = pairs + [(b, a) for a, b in pairs]
    t = pa.table({"src": np.array([a for a, _ in arcs], np.int64),
                  "dst": np.array([b for _, b in arcs], np.int64)})
    g = nx.Graph(pairs)
    g.add_nodes_from(range(n))
    comp = nx.complement(g)
    want_maximal = sorted(sorted(c) for c in nx.find_cliques(comp))
    assert maximal_independent_vertex_sets(t, n=n) == want_maximal
    alpha = max(len(c) for c in want_maximal)
    assert independence_number(t, n=n) == alpha
    assert largest_independent_vertex_sets(t, n=n) == \
        [s for s in want_maximal if len(s) == alpha]
    want_all = sorted(sorted(c) for c in nx.enumerate_all_cliques(comp)
                      if len(c) >= 2)
    assert independent_vertex_sets(t, min_size=2, n=n) == want_all
    # every independent set really is independent
    eset = set(pairs)
    for s in want_all:
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                assert (s[i], s[j]) not in eset


def test_maximal_cliques_subset_and_neighborhood(ray_session):
    import ray
    import ray.data as rd

    from xdata_igraph_ray.graph.cliques import maximal_cliques
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.paths import (
        get_shortest_path,
        neighborhood,
        neighborhood_size,
    )

    rng = np.random.default_rng(23)
    n = 12
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.4]
    arcs = pairs + [(b, a) for a, b in pairs]
    t = pa.table({"src": np.array([a for a, _ in arcs], np.int64),
                  "dst": np.array([b for _, b in arcs], np.int64)})
    ds = rd.from_arrow(t)
    all_cl = {tuple(sorted(c["clique"]))
              for c in maximal_cliques(ds, P=2).take_all()}
    # union over singleton-rooted runs == full enumeration;
    # each clique appears under exactly one root
    seen = []
    for v in range(n):
        for c in maximal_cliques(ds, P=2, roots={v}).take_all():
            seen.append(tuple(sorted(c["clique"])))
    assert sorted(seen) == sorted(all_cl)

    eng = GraphEngine.from_edges(ds, n=n, P=2)
    try:
        import networkx as nx

        g = nx.Graph(pairs)
        g.add_nodes_from(range(n))
        nb = neighborhood(eng, [0, 5], order=2)
        for seed, got in zip((0, 5), nb):
            want = sorted(nx.single_source_shortest_path_length(
                g, seed, cutoff=2))
            assert got.tolist() == want, seed
        sizes = neighborhood_size(eng, [0, 5], order=2)
        assert sizes.tolist() == [len(x) for x in nb]
        p = get_shortest_path(eng, 0, 5)
        if p:
            assert p[0] == 0 and p[-1] == 5
            assert len(p) - 1 == nx.shortest_path_length(g, 0, 5)
    finally:
        eng.shutdown()
