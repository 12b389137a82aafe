"""Tarjan-Vishkin biconnectivity vs networkx (DFS lowpoint oracle)."""

from __future__ import annotations

import numpy as np
import networkx as nx
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.biconnectivity import biconnected

from .oracles import gnm_edges


def _ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.asarray(src, np.int64),
                "dst": np.asarray(dst, np.int64),
            }
        )
    )


def _check(src, dst, n, P):
    eb, artic, br = biconnected(_ds(src, dst), n, P=P)
    eb = eb.to_pandas()
    adf = artic.to_pandas()
    got_ap = set(adf["vid"].tolist()) if len(adf) else set()
    bdf = br.to_pandas()
    got_br = (
        {(int(r.a), int(r.b)) for r in bdf.itertuples()}
        if len(bdf) else set()
    )

    g = nx.Graph()
    g.add_nodes_from(range(n))
    for s, d in zip(src, dst):
        if s != d:
            g.add_edge(min(s, d), max(s, d))

    exp_ap = set(nx.articulation_points(g))
    # igraph multigraph semantics: a parallel pair is a 2-edge block,
    # neither copy is a bridge — drop support pairs with multiplicity>1
    from collections import Counter

    mult = Counter(
        (min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d
    )
    exp_br = {
        (min(a, b), max(a, b))
        for a, b in nx.bridges(g)
        if mult[(min(a, b), max(a, b))] == 1
    }
    exp_blocks = {
        frozenset((min(a, b), max(a, b)) for a, b in comp)
        for comp in nx.biconnected_component_edges(g)
    }
    got_blocks = {
        frozenset(zip(grp["a"], grp["b"]))
        for _, grp in eb.groupby("block")
    }
    assert len(eb) == g.number_of_edges()
    assert got_ap == exp_ap
    assert got_br == exp_br
    assert got_blocks == exp_blocks


def test_small_structures():
    # path + triangle + bowtie + pendant, two components
    src = [0, 1, 2, 3, 3, 4, 6, 7, 8, 6, 10, 11, 10]
    dst = [1, 2, 3, 4, 5, 5, 7, 8, 6, 9, 11, 12, 12]
    _check(src, dst, 13, P=3)


def test_gnm_random():
    for seed, n, m in ((3, 40, 60), (5, 60, 70), (9, 80, 200)):
        src, dst = gnm_edges(n, m, seed=seed)
        # add loops + multi-edges: must be ignored / collapsed
        src = np.concatenate((src, src[:7], [2]))
        dst = np.concatenate((dst, dst[:7], [2]))
        _check(src, dst, n, P=4)


def test_single_edge_and_cycle():
    _check([0], [1], 3, P=2)          # one bridge, isolated vertex
    _check([0, 1, 2, 3], [1, 2, 3, 0], 4, P=2)  # 4-cycle: one block
