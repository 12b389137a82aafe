"""Dominator tree (vs the reference's own dominator_tree.out and
networkx) + distributed transitive closure (vs networkx)."""

from __future__ import annotations

import numpy as np
import networkx as nx
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.dominators import dominator_tree
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.paths import transitive_closure

from .oracles import gnm_edges


def _ds(arcs):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([a[0] for a in arcs], np.int64),
                "dst": np.array([a[1] for a in arcs], np.int64),
            }
        )
    )


TARJAN = [
    (0, 1), (0, 7), (0, 10),
    (1, 2), (1, 5),
    (2, 3),
    (3, 4),
    (4, 3), (4, 0),
    (5, 3), (5, 6),
    (6, 3),
    (7, 8), (7, 10), (7, 11),
    (8, 9),
    (9, 4), (9, 8),
    (10, 11),
    (11, 12),
    (12, 9),
]


def test_dominator_tree_reference_example():
    idom, leftout = dominator_tree(_ds(TARJAN), 13, root=0, P=2)
    # examples/simple/dominator_tree.out line 1
    assert idom.tolist() == [-1, 0, 1, 0, 0, 1, 5, 0, 0, 0, 0, 0, 11]
    assert leftout == []


def test_dominator_tree_unreachable_and_networkx():
    arcs = [(0, 1), (1, 2), (0, 2), (2, 3), (5, 6)]
    idom, leftout = dominator_tree(_ds(arcs), 7, root=0, P=2)
    assert leftout == [4, 5, 6]
    assert idom[4] == -2 and idom[5] == -2 and idom[6] == -2
    g = nx.DiGraph(arcs)
    want = nx.immediate_dominators(g, 0)
    for v, d in want.items():
        if v == 0:
            assert idom[0] == -1
        else:
            assert idom[v] == d, v
    # random digraphs vs networkx
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = 30
        src, dst = gnm_edges(n, 70, seed=trial + 50)
        arcs = list(zip(src.tolist(), dst.tolist()))
        idom, leftout = dominator_tree(_ds(arcs), n, root=0, P=3)
        g = nx.DiGraph(arcs)
        g.add_nodes_from(range(n))
        want = nx.immediate_dominators(g, 0)
        for v in range(n):
            if v == 0:
                assert idom[0] == -1
            elif v in want:
                assert idom[v] == want[v], (trial, v)
            else:
                assert idom[v] == -2 and v in leftout


def test_transitive_closure_vs_networkx(ray_session):
    src, dst = gnm_edges(40, 80, seed=4)
    arcs = list(zip(src.tolist(), dst.tolist()))
    eng = GraphEngine.from_edges(_ds(arcs), n=40, P=3)
    got = transitive_closure(eng, wave=16).to_pandas()
    eng.shutdown()
    pairs = {(int(r.src), int(r.dst)) for r in got.itertuples()}
    g = nx.DiGraph(arcs)
    g.add_nodes_from(range(40))
    want = {
        (u, v)
        for u in range(40)
        for v in nx.descendants(g, u)
        if u != v
    }
    assert pairs == want
