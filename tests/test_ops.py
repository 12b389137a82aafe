"""Relational graph operators vs hand-computed / pandas oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph import ops


def ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)})
    )


def pairs(dataset):
    df = dataset.to_pandas()
    if len(df) == 0:
        return set()
    return set(zip(df["src"], df["dst"]))


G1 = ([0, 0, 1, 2], [1, 2, 2, 0])
G2 = ([0, 1, 3], [1, 0, 2])


def test_union_intersection_difference():
    assert pairs(ops.edge_union(ds(*G1), ds(*G2), P=2)) == {
        (0, 1), (0, 2), (1, 2), (2, 0), (1, 0), (3, 2)
    }
    assert pairs(ops.edge_intersection(ds(*G1), ds(*G2), P=2)) == {(0, 1)}
    assert pairs(ops.edge_difference(ds(*G1), ds(*G2), P=2)) == {
        (0, 2), (1, 2), (2, 0)
    }


def test_disjoint_union():
    out = pairs(ops.disjoint_union(ds(*G1), ds(*G2), n1=3, P=2))
    assert out == {(0, 1), (0, 2), (1, 2), (2, 0), (3, 4), (4, 3), (6, 5)}


def test_compose():
    # g1: 0->1 ; g2: 1->5  => 0->5
    out = pairs(ops.compose(ds([0, 2], [1, 1]), ds([1], [5]), P=2))
    assert out == {(0, 5), (2, 5)}


def test_conversions():
    assert pairs(ops.to_undirected(ds([1, 0, 2], [0, 1, 2]), P=2)) == {
        (0, 1), (2, 2)
    }
    assert pairs(ops.to_directed_mutual(ds([0], [1]))) == {(0, 1), (1, 0)}
    assert pairs(ops.reverse(ds([0, 1], [1, 2]))) == {(1, 0), (2, 1)}


def test_induced_subgraph():
    e = ds([0, 1, 2, 3], [1, 2, 3, 0])
    assert pairs(ops.induced_subgraph(e, [0, 1, 2])) == {(0, 1), (1, 2)}
    rel = ops.induced_subgraph(e, [1, 3], relabel=True)
    assert pairs(rel) == set()
    rel2 = ops.induced_subgraph(e, [2, 3], relabel=True)
    assert pairs(rel2) == {(0, 1)}


def test_contract_and_multiplicity():
    e = ds([0, 1, 2, 3], [1, 0, 3, 2])
    mapping = np.array([0, 0, 1, 1])
    out = pairs(ops.contract_vertices(e, mapping, P=2))
    assert out == set()  # contracted edges become loops, simplified away
    cm = ops.count_multiple(ds([0, 0, 1], [1, 1, 2]), P=2).to_pandas()
    cm = cm.sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(cm["count"]) == [2, 1]


def test_predicates_scalars():
    assert ops.is_simple(ds([0, 1], [1, 2]), P=2)
    assert not ops.is_simple(ds([0, 0], [1, 1]), P=2)
    assert not ops.is_simple(ds([0], [0]), P=2)
    assert ops.edge_count(ds(*G1)) == 4
    assert abs(ops.density(ds(*G1), n=3) - 4 / 6) < 1e-12
    # reciprocity: edges 0->1,1->0,1->2 => 2 of 3 reciprocal
    assert abs(ops.reciprocity(ds([0, 1, 1], [1, 0, 2]), P=2) - 2 / 3) < 1e-12


def test_linegraph():
    # path 0->1->2: edges e0=(0,1), e1=(1,2); L: e0->e1 only
    out = pairs(ops.linegraph(ds([0, 1], [1, 2]), P=2))
    assert out == {(0, 1)}
    # triangle: 3 edges, each feeding the next
    out2 = pairs(ops.linegraph(ds([0, 1, 2], [1, 2, 0]), P=2))
    assert len(out2) == 3


def test_complementer_small():
    import numpy as np
    import pyarrow as pa

    from xdata_igraph_ray.graph.ops import complementer

    t = pa.table({"src": np.array([0, 1, 2], dtype=np.int64),
                  "dst": np.array([1, 2, 0], dtype=np.int64)})
    df = complementer(t, n=4, P=2).to_pandas()
    got = set(zip(df["src"], df["dst"]))
    alln = {(a, b) for a in range(4) for b in range(4) if a != b}
    assert got == alln - {(0, 1), (1, 2), (2, 0)}
    # loops=True adds missing self-loops
    df2 = complementer(t, n=4, loops=True, P=2).to_pandas()
    assert len(df2) == len(df) + 4
    import pytest as _pt

    with _pt.raises(ValueError):
        complementer(t, n=10**9)


def test_dfs_visitor_vs_networkx():
    import networkx as nx
    import numpy as np

    from xdata_igraph_ray.graph import generators
    from xdata_igraph_ray.graph.paths import dfs

    t = generators.erdos_renyi_gnm(40, 120, directed=True, seed=6)
    r = dfs(t, n=40, root=0)
    order, parent = r["order"], r["parent"]
    # every vertex appears exactly once
    assert sorted(order.tolist()) == list(range(40))
    es = set(zip(t["src"].to_numpy(), t["dst"].to_numpy()))
    # parent edges are real edges; parents precede children in order
    pos = np.empty(40, dtype=np.int64)
    pos[order] = np.arange(40)
    for v in range(40):
        if parent[v] >= 0:
            assert (parent[v], v) in es
            assert pos[parent[v]] < pos[v]
    # tie-break = ascending dst: matches networkx dfs_preorder from 0
    g = nx.DiGraph()
    g.add_nodes_from(range(40))
    for a, b in sorted(es):
        g.add_edge(a, b)
    want = list(nx.dfs_preorder_nodes(g, source=0))
    assert order[:len(want)].tolist() == want


def test_are_connected_and_unfold_tree():
    import numpy as np
    import networkx as nx
    import pyarrow as pa
    import ray.data as rd

    from xdata_igraph_ray.graph.ops import are_connected, unfold_tree

    arcs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 1)]
    ds = rd.from_arrow(pa.table({
        "src": np.array([a[0] for a in arcs], np.int64),
        "dst": np.array([a[1] for a in arcs], np.int64),
    }))
    assert are_connected(ds, 0, 1)
    assert not are_connected(ds, 1, 0)

    tree, vidx = unfold_tree(ds, 4, roots=[0], mode="out")
    ts = tree["src"].to_numpy()
    td = tree["dst"].to_numpy()
    # every original edge appears once, projected through vertex_index
    proj = sorted((int(vidx[a]), int(vidx[b])) for a, b in zip(ts, td))
    assert proj == sorted(arcs)
    # the unfolded reachable part is a forest on the undirected view
    g = nx.Graph()
    g.add_nodes_from(range(len(vidx)))
    g.add_edges_from(zip(ts.tolist(), td.tolist()))
    assert nx.is_forest(nx.Graph(list(zip(ts.tolist(), td.tolist()))))
    # copies map to original seen vertices
    assert all(0 <= vidx[i] < 4 for i in range(4, len(vidx)))
    # vertex count grew by (edges - tree-edges-of-reachable) copies
    assert len(vidx) == 4 + (len(arcs) - 3)
