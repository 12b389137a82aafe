"""Max-flow / min-cut / connectivity / bipartite vs networkx.

Conformance targets: igraph_maxflow (reference src/flow.c:470),
igraph_st_mincut (:1509), igraph_st_edge_connectivity (:1733),
igraph_st_vertex_connectivity (:1797), igraph_is_bipartite
(src/bipartite.c:1045), igraph_maximum_bipartite_matching
(src/matching.c:197).
"""

from __future__ import annotations

import numpy as np
import networkx as nx
import pyarrow as pa
import pytest
import ray

from xdata_igraph_ray.graph import flow
from xdata_igraph_ray.graph.engine import GraphEngine


def _edges_table(edges, caps=None):
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    cols = {"src": src, "dst": dst}
    if caps is not None:
        cols["weight"] = np.asarray(caps, dtype=np.float64)
    return pa.table(cols)


def _nx_digraph(edges, caps, n):
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    for (u, v), c in zip(edges, caps):
        g.add_edge(u, v, capacity=c)
    return g


def _random_flow_case(seed, n=24, m=90, unit=False):
    rng = np.random.default_rng(seed)
    pairs = set()
    while len(pairs) < m:
        u, v = rng.integers(0, n, size=2)
        if u != v:
            pairs.add((int(u), int(v)))
    edges = sorted(pairs)
    caps = (
        np.ones(len(edges))
        if unit else rng.integers(1, 10, size=len(edges)).astype(float)
    )
    return edges, caps


def _check_flow_valid(flow_tbl, edges, caps, s, t, value, n):
    """Capacity + conservation + value checks on the returned flows."""
    f = {(a, b): 0.0 for a, b in edges}
    for r in flow_tbl.to_pylist():
        f[(r["src"], r["dst"])] = r["flow"]
    cap = dict(zip(edges, caps))
    for e_, fv in f.items():
        assert -1e-9 <= fv <= cap[e_] + 1e-9
    net = np.zeros(n)
    for (a, b), fv in f.items():
        net[a] -= fv
        net[b] += fv
    assert abs(net[t] - value) < 1e-6
    assert abs(net[s] + value) < 1e-6
    inner = np.delete(net, [s, t])
    assert np.abs(inner).max() < 1e-6


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_maxflow_random_vs_networkx(seed):
    edges, caps = _random_flow_case(seed)
    n = 24
    s, t = 0, n - 1
    g = _nx_digraph(edges, caps, n)
    want, _ = nx.maximum_flow(g, s, t)
    eng = flow.flow_network(_edges_table(edges, caps), n=n, P=3)
    try:
        r = flow.maxflow(eng, s, t)
    finally:
        eng.shutdown()
    assert abs(r["value"] - want) < 1e-6
    flow_tbl = pa.concat_tables(ray.get(r["flow"].to_arrow_refs()))
    _check_flow_valid(flow_tbl, edges, caps, s, t, r["value"], n)
    # the cut certifies optimality: capacity == value, s-side holds s
    p1 = set(r["partition1"].to_pandas()["vid"].tolist())
    assert s in p1
    assert t not in p1
    cut_cap = sum(r["cut"]["capacity"].to_pylist())
    assert abs(cut_cap - want) < 1e-6


def test_maxflow_classic_diamond():
    # CLRS-style example with a known value
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4), (3, 2), (3, 5),
             (4, 3), (4, 5)]
    caps = [16, 13, 10, 12, 14, 9, 20, 7, 4]
    eng = flow.flow_network(_edges_table(edges, caps), n=6, P=2)
    try:
        r = flow.maxflow(eng, 0, 5)
    finally:
        eng.shutdown()
    assert abs(r["value"] - 23.0) < 1e-9


def test_maxflow_disconnected_zero():
    edges = [(0, 1), (2, 3)]
    eng = flow.flow_network(_edges_table(edges, [5.0, 5.0]), n=4, P=2)
    try:
        r = flow.maxflow(eng, 0, 3)
    finally:
        eng.shutdown()
    assert r["value"] == 0.0
    assert len(r["cut"]) == 0


@pytest.mark.parametrize("seed", [10, 11])
def test_st_edge_connectivity_vs_networkx(seed):
    edges, caps = _random_flow_case(seed, n=16, m=60, unit=True)
    n, s, t = 16, 0, 15
    g = _nx_digraph(edges, caps, n)
    want = nx.edge_connectivity(g, s, t)
    eng = flow.flow_network(_edges_table(edges), n=n, P=3, weighted=False)
    try:
        got = flow.st_edge_connectivity(eng, s, t)
    finally:
        eng.shutdown()
    assert got == want


def test_global_edge_connectivity_vs_networkx():
    edges, caps = _random_flow_case(5, n=10, m=40, unit=True)
    g = _nx_digraph(edges, caps, 10)
    want = nx.edge_connectivity(g)
    got = flow.edge_connectivity(_edges_table(edges), n=10, P=2)
    assert got == want


def test_st_vertex_connectivity_vs_networkx():
    edges, _ = _random_flow_case(7, n=12, m=50, unit=True)
    g = _nx_digraph(edges, np.ones(len(edges)), 12)
    # pick a non-adjacent pair
    s, t = 0, 11
    assert not g.has_edge(s, t)
    want = nx.node_connectivity(g, s, t)
    got = flow.st_vertex_connectivity(
        _edges_table(edges), n=12, s=s, t=t, P=2
    )
    assert got == want


def test_is_bipartite_cases():
    # even cycle: bipartite; odd cycle: not
    even = [(i, (i + 1) % 6) for i in range(6)]
    odd = [(i, (i + 1) % 5) for i in range(5)]
    assert flow.is_bipartite(_edges_table(even), n=6, P=2)
    assert not flow.is_bipartite(_edges_table(odd), n=5, P=2)
    # disconnected: bipartite component + odd component -> not bipartite
    mixed = even + [(6 + a, 6 + b) for a, b in odd]
    assert not flow.is_bipartite(_edges_table(mixed), n=11, P=2)


def test_bipartite_types_sides():
    edges = [(0, 3), (1, 3), (1, 4), (2, 4)]
    r = flow.bipartite_types(_edges_table(edges), n=5, P=2)
    assert r["is_bipartite"]
    ty = r["types"]
    for u, v in edges:
        assert ty[u] != ty[v]


@pytest.mark.parametrize("seed", [20, 21])
def test_bipartite_matching_vs_networkx(seed):
    rng = np.random.default_rng(seed)
    L, R = 8, 9
    n = L + R
    types = np.array([0] * L + [1] * R, dtype=np.int8)
    pairs = set()
    for _ in range(30):
        u = int(rng.integers(0, L))
        v = int(L + rng.integers(0, R))
        pairs.add((u, v))
    edges = sorted(pairs)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    want = len(nx.bipartite.hopcroft_karp_matching(g, range(L))) // 2
    r = flow.bipartite_matching(_edges_table(edges), n=n, types=types, P=2)
    assert r["size"] == want
    # pairs form a matching over real edges
    es = set(edges)
    seen_l, seen_r = set(), set()
    for row in r["pairs"].to_pylist():
        a, b = row["left"], row["right"]
        assert (a, b) in es
        assert a not in seen_l and b not in seen_r
        seen_l.add(a)
        seen_r.add(b)
    assert len(seen_l) == r["size"]


def test_global_mincut_vs_networkx():
    from xdata_igraph_ray.graph.flow import mincut

    edges, caps = _random_flow_case(9, n=9, m=30)
    g = _nx_digraph(edges, caps, 9)
    # networkx global directed weighted min cut: min over rooted pairs
    want = min(
        min(nx.minimum_cut_value(g, 0, v), nx.minimum_cut_value(g, v, 0))
        for v in range(1, 9)
    )
    r = mincut(_edges_table(edges, caps), n=9, P=2)
    assert abs(r["value"] - want) < 1e-6
    cut_cap = sum(r["cut"]["capacity"].to_pylist())
    assert abs(cut_cap - want) < 1e-6


def test_gomory_hu_vs_networkx():
    rng = np.random.default_rng(31)
    n, m = 10, 22
    pairs = set()
    while len(pairs) < m:
        u, v = sorted(rng.integers(0, n, size=2).tolist())
        if u != v:
            pairs.add((u, v))
    edges = sorted(pairs)
    caps = rng.integers(1, 9, size=len(edges)).astype(float)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    for (u, v), c in zip(edges, caps):
        g.add_edge(u, v, capacity=c)
    tree = flow.gomory_hu(_edges_table(edges, caps), n=n, P=2)
    # adjacency of our tree with min-edge path query
    import collections
    adj = collections.defaultdict(list)
    for r in tree.to_pylist():
        adj[r["u"]].append((r["v"], r["flow"]))
        adj[r["v"]].append((r["u"], r["flow"]))

    def tree_mincut(a, b):
        best = {a: float("inf")}
        stack = [a]
        while stack:
            x = stack.pop()
            for y, f in adj[x]:
                nb = min(best[x], f)
                if y not in best or nb > best[y]:
                    best[y] = nb
                    stack.append(y)
        return best[b]

    want_tree = nx.gomory_hu_tree(g)

    def nx_mincut(a, b):
        path = nx.shortest_path(want_tree, a, b)
        return min(
            want_tree[u][v]["weight"] for u, v in zip(path, path[1:])
        )

    for a in range(0, n, 3):
        for b in range(a + 1, n, 2):
            assert abs(tree_mincut(a, b) - nx_mincut(a, b)) < 1e-6, (a, b)


def test_maxflow_per_dest_refs_wire_mode_equal():
    """The fused 3-barrier round (mf_push_gather_relabel via
    engine.gather_scatter) must produce identical flow values and flow
    tables in BOTH wire layouts — per-destination refs is what a
    multi-node cluster uses."""
    rng = np.random.default_rng(77)
    n, m = 60, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    caps = rng.integers(1, 9, m).astype(float)
    t = _edges_table(list(zip(src, dst)), caps)
    results = []
    for pdr in (False, True):
        eng = flow.flow_network([ray.put(t)], n=n, P=3,
                                min_shard_vertices=0)
        eng.per_dest_refs = pdr
        r = flow.maxflow(eng, 0, n - 1, with_flow=True, with_cut=True)
        ftab = (r["flow"].to_pandas().sort_values(["src", "dst"])
                .reset_index(drop=True))
        results.append((r["value"], ftab,
                        float(sum(r["cut"]["capacity"].to_pylist()))))
        eng.shutdown()
    (v0, f0, c0), (v1, f1, c1) = results
    assert v0 == v1 == c0 == c1
    assert f0.equals(f1)
