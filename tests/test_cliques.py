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
