"""Thin API completions: disjoint-path/connectivity aliases, residual
graphs, cutoff (estimate) centrality variants, avglocal transitivity,
permute_vertices, sort_vertex_ids_by_degree, personalized_pagerank_vs,
BFS visitor outputs."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd


def _t(pairs):
    return pa.table({
        "src": np.array([a for a, _ in pairs], np.int64),
        "dst": np.array([b for _, b in pairs], np.int64),
    })


def test_disjoint_paths_and_residuals(ray_session):
    from xdata_igraph_ray.graph.flow import (
        adhesion,
        cohesion,
        edge_disjoint_paths,
        flow_network,
        residual_graph,
        reverse_residual_graph,
        vertex_disjoint_paths,
    )

    # two vertex-disjoint 0->5 paths + a direct edge
    pairs = [(0, 1), (1, 5), (0, 2), (2, 5), (0, 5)]
    n = 6
    eng = flow_network([ray.put(_t(pairs))], n=n, P=2, weighted=False)
    try:
        assert edge_disjoint_paths(eng, 0, 5) == 3
        with pytest.raises(ValueError):
            edge_disjoint_paths(eng, 2, 2)
    finally:
        eng.shutdown()
    # adjacent s,t: remove the direct edge (2 paths) + 1
    assert vertex_disjoint_paths([ray.put(_t(pairs))], n, 0, 5, P=2) == 3
    # non-adjacent
    assert vertex_disjoint_paths(
        [ray.put(_t([(0, 1), (1, 5), (0, 2), (2, 5)]))], n, 0, 5, P=2
    ) == 2
    # undirected 4-cycle (both arcs): adhesion 2, cohesion 2
    ring = [(i, (i + 1) % 4) for i in range(4)]
    arcs = ring + [(b, a) for a, b in ring]
    assert adhesion(_t(arcs), 4, P=2) == 2
    assert cohesion(_t(arcs), 4, P=2) == 2

    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    cap = np.array([2.0, 1.0, 2.0])
    flow = np.array([1.0, 1.0, 0.0])
    res = residual_graph(src, dst, cap, flow)
    # arc 1 is saturated -> dropped; capacities are ORIGINAL (ref rule)
    assert res["src"].to_numpy().tolist() == [0, 2]
    assert res["capacity"].to_numpy().tolist() == [2.0, 2.0]
    rev = reverse_residual_graph(src, dst, flow, cap)
    got = set(zip(rev["src"].to_numpy().tolist(),
                  rev["dst"].to_numpy().tolist()))
    # flow>0: (0,1),(1,2); flow<cap: (1,0),(3,2)
    assert got == {(0, 1), (1, 2), (1, 0), (3, 2)}


def test_cutoff_estimates(ray_session):
    from xdata_igraph_ray.graph.centrality import betweenness, closeness
    from xdata_igraph_ray.graph.engine import GraphEngine

    rng = np.random.default_rng(31)
    n = 40
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.08]
    arcs = pairs + [(b, a) for a, b in pairs]
    eng = GraphEngine.from_edges(rd.from_arrow(_t(arcs)), n=n, P=2)
    g = nx.Graph(pairs)
    g.add_nodes_from(range(n))
    try:
        for cutoff in (2, 3):
            got = betweenness(eng, cutoff=cutoff)
            # networkx: restrict Brandes to paths of length <= cutoff
            want = np.zeros(n)
            for s in range(n):
                # brute-force: count shortest paths <= cutoff through v
                sp = dict(nx.single_source_shortest_path_length(
                    g, s, cutoff=cutoff))
                for t in sp:
                    if t == s:
                        continue
                    paths = [p for p in nx.all_shortest_paths(g, s, t)]
                    if len(paths[0]) - 1 > cutoff:
                        continue
                    for p in paths:
                        for v in p[1:-1]:
                            want[v] += 1.0 / len(paths)
            # both sides count ordered (s,t) pairs here
            assert np.allclose(got, want, atol=1e-9), cutoff
            gotc = closeness(eng, mode="out", cutoff=cutoff)
            wantc = np.empty(n)
            for s in range(n):
                sp = dict(nx.single_source_shortest_path_length(
                    g, s, cutoff=cutoff))
                reach = len(sp)
                dsum = sum(sp.values())
                wantc[s] = 1.0 / (dsum + n * (n - reach))
            assert np.allclose(gotc, wantc, atol=1e-12), cutoff
        # exact (None) matches negative cutoff
        assert np.allclose(betweenness(eng, cutoff=-1),
                           betweenness(eng))
    finally:
        eng.shutdown()


def test_avglocal_permute_sort(ray_session):
    from xdata_igraph_ray.graph.ops import (
        permute_vertices,
        sort_vertex_ids_by_degree,
    )
    from xdata_igraph_ray.graph.triangles import transitivity_avglocal

    rng = np.random.default_rng(32)
    n = 30
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.2]
    arcs = pairs + [(b, a) for a, b in pairs]
    g = nx.Graph(pairs)
    g.add_nodes_from(range(n))
    got = transitivity_avglocal(rd.from_arrow(_t(arcs)), n, P=2)
    vals = [v for nd, v in nx.clustering(g).items()
            if g.degree(nd) >= 2]
    assert got == pytest.approx(sum(vals) / len(vals), rel=1e-12)

    perm = np.roll(np.arange(n), 3)
    out = permute_vertices(rd.from_arrow(_t(arcs)), perm).to_pandas()
    want = {(int(perm[a]), int(perm[b])) for a, b in arcs}
    assert set(zip(out["src"], out["dst"])) == want

    order = sort_vertex_ids_by_degree(rd.from_arrow(_t(arcs)), n,
                                      mode="out", order="desc", P=2)
    degs = np.zeros(n, dtype=int)
    for a, _ in arcs:
        degs[a] += 1
    d = degs[order]
    assert (np.diff(d) <= 0).all()
    # ties broken by ascending vid
    for i in range(len(order) - 1):
        if d[i] == d[i + 1]:
            assert order[i] < order[i + 1]


def test_personalized_vs_and_bfs(ray_session):
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.pagerank import (
        pagerank,
        personalized_pagerank_vs,
    )
    from xdata_igraph_ray.graph.paths import bfs

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0)]
    n = 5
    eng = GraphEngine.from_edges(rd.from_arrow(_t(pairs)), n=n, P=2)
    try:
        personalized_pagerank_vs(eng, [0, 2], tol=1e-12)
        got = eng.state_arrays("pr")
        reset = np.zeros(n)
        reset[[0, 2]] = 0.5
        pagerank(eng, reset=reset, tol=1e-12)
        want = eng.state_arrays("pr")
        assert np.allclose(got, want, atol=1e-12)
        with pytest.raises(ValueError, match="empty"):
            personalized_pagerank_vs(eng, [])

        r = bfs(eng, 0, mode="out")
        assert r["dist"].tolist() == [0, 1, 2, 2, -1]
        assert r["order"].tolist() == [0, 1, 2, 3]
        assert r["rank"].tolist() == [0, 1, 2, 3, -1]
        assert r["parents"][0] == -1 and r["parents"][4] == -1
        assert r["parents"][1] == 0
        assert r["parents"][2] == 1 and r["parents"][3] == 1
        r_all = bfs(eng, 4, mode="all")
        assert (r_all["dist"] >= 0).all()
    finally:
        eng.shutdown()


def test_johnson_distances(ray_session):
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.paths import shortest_paths_johnson

    # weighted digraph with a negative edge, no negative cycle
    arcs = [(0, 1, 2.0), (1, 2, -1.0), (0, 2, 3.0), (2, 3, 2.0),
            (3, 1, 1.0), (1, 3, 4.0)]
    n = 4
    t = pa.table({
        "src": np.array([a for a, _, _ in arcs], np.int64),
        "dst": np.array([b for _, b, _ in arcs], np.int64),
        "weight": np.array([w for _, _, w in arcs], np.float64),
    })
    eng = GraphEngine.from_edges(rd.from_arrow(t), n=n, P=2,
                                 weighted=True)
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    for a, b, w in arcs:
        g.add_edge(a, b, weight=w)
    try:
        D = shortest_paths_johnson(eng)
        want = dict(nx.johnson(g, weight="weight"))
        for s in range(n):
            for v in range(n):
                if v in want[s]:
                    wd = nx.path_weight(g, want[s][v], "weight")
                    assert D[s, v] == pytest.approx(wd, abs=1e-12), (s, v)
                else:
                    assert np.isinf(D[s, v]), (s, v)
        # subset of sources
        D2 = shortest_paths_johnson(eng, sources=[2, 0])
        assert np.allclose(D2[0], D[2]) and np.allclose(D2[1], D[0])
    finally:
        eng.shutdown()


def test_get_eid_family():
    import numpy as np
    import pyarrow as pa
    import pytest
    from xdata_igraph_ray.graph import ops

    t = pa.table({"src": np.array([0, 1, 1, 2, 1], np.int64),
                  "dst": np.array([1, 2, 2, 0, 0], np.int64)})
    assert ops.get_eid(t, 1, 2) == 1          # smallest parallel id
    assert ops.get_eid(t, 2, 1, error=False) == -1
    assert ops.get_eid(t, 2, 1, directed=False) == 1
    assert ops.get_eids(t, [(0, 1), (1, 2), (2, 0)]).tolist() == [0, 1, 3]
    assert ops.get_eids_multi(t, [(1, 2), (1, 2)]).tolist() == [1, 2]
    with pytest.raises(ValueError):
        ops.get_eids_multi(t, [(1, 2), (1, 2), (1, 2)])
    with pytest.raises(ValueError):
        ops.get_eid(t, 2, 1)
    assert ops.get_eids_path(t, [0, 1, 2, 0]).tolist() == [0, 1, 3]


def test_get_eids_huge_vertex_ids():
    # ids >= 2^31 (and dst >= 2^32) used to overflow/collide in the
    # packed scalar key; the void-view key must stay exact.
    import numpy as np
    import pyarrow as pa
    from xdata_igraph_ray.graph import ops

    big = 1 << 62
    t = pa.table({
        "src": np.array([big, big, 7, 0], np.int64),
        "dst": np.array([big + 1, 3, big + 1, 1 << 33], np.int64),
    })
    q = [(big, big + 1), (big, 3), (7, big + 1), (0, 1 << 33)]
    assert ops.get_eids(t, q).tolist() == [0, 1, 2, 3]
    # a colliding-under-2^32-packing pair that does NOT exist
    assert ops.get_eids(t, [(big, big)], error=False).tolist() == [-1]


def test_mutation_wrappers():
    import numpy as np
    import pyarrow as pa
    from xdata_igraph_ray.graph import ops

    t = pa.table({"src": np.array([0, 1, 2, 3], np.int64),
                  "dst": np.array([1, 2, 3, 0], np.int64)})
    out, idx = ops.delete_vertices(t, 4, [1])
    # ring minus vertex 1: edges 2-3 and 3-0 survive, renumbered
    assert idx.tolist() == [1, 0, 2, 3]
    assert sorted(zip(out["src"].to_numpy(), out["dst"].to_numpy())) \
        == [(1, 2), (2, 0)]
    t2 = ops.delete_edges(t, [0, 2])
    assert t2.num_rows == 2
    assert t2["src"].to_numpy().tolist() == [1, 3]
    t3 = ops.add_edges(t, [0], [2])
    assert t3.num_rows == 5
    assert (int(t3["src"][4].as_py()), int(t3["dst"][4].as_py())) == (0, 2)
