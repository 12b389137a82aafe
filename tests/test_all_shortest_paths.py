"""get_all_shortest_paths vs networkx.all_shortest_paths
(igraph_get_all_shortest_paths, src/structural_properties.c:1232)."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from xdata_igraph_ray.graph import generators
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.paths import get_all_shortest_paths


@pytest.mark.parametrize("seed", [0, 1])
def test_all_shortest_paths_vs_networkx(seed):
    t = generators.erdos_renyi_gnm(60, 240, directed=True, seed=seed)
    g = nx.DiGraph()
    g.add_nodes_from(range(60))
    g.add_edges_from(zip(t["src"].to_numpy(), t["dst"].to_numpy()))
    eng = GraphEngine.from_edges(t, n=60, P=3)
    try:
        targets = list(range(0, 60, 7))
        got = get_all_shortest_paths(eng, 0, targets, mode="out")
    finally:
        eng.shutdown()
    for tg in targets:
        try:
            want = sorted(map(tuple, nx.all_shortest_paths(g, 0, tg)))
        except nx.NetworkXNoPath:
            want = []
        assert sorted(map(tuple, got[tg])) == want, tg


def test_all_shortest_paths_modes_and_self():
    # diamond: 0->1->3, 0->2->3 (two equal paths)
    import pyarrow as pa

    t = pa.table({"src": np.array([0, 0, 1, 2], dtype=np.int64),
                  "dst": np.array([1, 2, 3, 3], dtype=np.int64)})
    eng = GraphEngine.from_edges(t, n=4, P=2)
    try:
        got = get_all_shortest_paths(eng, 0, [3, 0], mode="out")
        rev = get_all_shortest_paths(eng, 3, [0], mode="in")
    finally:
        eng.shutdown()
    assert sorted(map(tuple, got[3])) == [(0, 1, 3), (0, 2, 3)]
    assert got[0] == [[0]]
    assert sorted(map(tuple, rev[0])) == [(3, 1, 0), (3, 2, 0)]


def test_all_shortest_paths_cap():
    # ladder of diamonds: path count doubles per stage
    import pyarrow as pa

    src, dst = [], []
    for k in range(12):
        a = 3 * k
        src += [a, a, a + 1, a + 2]
        dst += [a + 1, a + 2, a + 3, a + 3]
    t = pa.table({"src": np.array(src, dtype=np.int64),
                  "dst": np.array(dst, dtype=np.int64)})
    eng = GraphEngine.from_edges(t, n=3 * 12 + 1, P=2)
    try:
        with pytest.raises(ValueError):
            get_all_shortest_paths(eng, 0, [36], max_paths=100)
        # the cap bounds TOTAL constructed paths (incl. memoized
        # intermediate prefixes, ~2x the final count on this ladder)
        all_p = get_all_shortest_paths(eng, 0, [36], max_paths=30_000)
    finally:
        eng.shutdown()
    assert len(all_p[36]) == 2 ** 12


def test_get_all_simple_paths_vs_networkx():
    import numpy as np
    import networkx as nx
    import pyarrow as pa
    import ray.data as rd

    from xdata_igraph_ray.graph.paths import get_all_simple_paths

    rng = np.random.default_rng(19)
    for trial in range(4):
        n = 10
        arcs = list(
            {
                (int(rng.integers(0, n)), int(rng.integers(0, n)))
                for _ in range(28)
            }
        )
        ds = rd.from_arrow(pa.table({
            "src": np.array([a[0] for a in arcs], np.int64),
            "dst": np.array([a[1] for a in arcs], np.int64),
        }))
        got = get_all_simple_paths(ds, n, 0, [n - 1, n - 2], P=2)
        g = nx.DiGraph([a for a in arcs if a[0] != a[1]])
        g.add_nodes_from(range(n))
        want = sorted(
            list(p)
            for t in (n - 1, n - 2)
            for p in nx.all_simple_paths(g, 0, t)
        )
        # networkx excludes the trivial [source] path; ours includes
        # it only when source is a target (not the case here)
        assert sorted(got) == want, trial
        # cutoff agreement
        got_c = get_all_simple_paths(ds, n, 0, [n - 1], cutoff=3, P=2)
        want_c = sorted(
            list(p) for p in nx.all_simple_paths(g, 0, n - 1, cutoff=3)
        )
        assert sorted(got_c) == want_c, trial
