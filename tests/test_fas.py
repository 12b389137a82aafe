"""Feedback arc set: Eades greedy + exact subset-DP vs brute force."""

from __future__ import annotations

from itertools import permutations

import numpy as np
import networkx as nx
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.fas import (
    feedback_arc_set_eades,
    feedback_arc_set_exact,
)


def _ds(arcs):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([a[0] for a in arcs], np.int64),
                "dst": np.array([a[1] for a in arcs], np.int64),
            }
        )
    )


def _is_dag_after_removal(arcs, fas, n):
    rest = [a for a in arcs if a not in set(fas)]
    g = nx.DiGraph(rest)
    g.add_nodes_from(range(n))
    return nx.is_directed_acyclic_graph(g)


def test_eades_dag_no_feedback():
    arcs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    fas, ordv = feedback_arc_set_eades(_ds(arcs), 4, P=2)
    assert fas == []
    assert all(ordv[u] < ordv[v] for u, v in arcs)


def test_eades_cycle_and_loops():
    arcs = [(0, 1), (1, 2), (2, 0), (3, 3)]
    fas, _ = feedback_arc_set_eades(_ds(arcs), 4, P=2)
    assert (3, 3) in fas  # self-loops always feedback arcs
    assert _is_dag_after_removal(arcs, fas, 4)
    assert len(fas) == 2  # one cycle arc + the loop


def test_eades_random_valid():
    rng = np.random.default_rng(17)
    for trial in range(5):
        n = 15
        arcs = list(
            {
                (int(rng.integers(0, n)), int(rng.integers(0, n)))
                for _ in range(50)
            }
        )
        fas, _ = feedback_arc_set_eades(_ds(arcs), n, P=3)
        assert _is_dag_after_removal(arcs, fas, n), trial


def test_exact_matches_brute_force():
    rng = np.random.default_rng(23)
    for trial in range(4):
        n = 7
        arcs = list(
            {
                (int(rng.integers(0, n)), int(rng.integers(0, n)))
                for _ in range(16)
            }
        )
        nonloop = [a for a in arcs if a[0] != a[1]]
        nloops = len(arcs) - len(nonloop)
        fas, _ = feedback_arc_set_exact(_ds(arcs), n, P=2)
        assert _is_dag_after_removal(arcs, fas, n), trial
        # brute force: min violations over all orderings
        best = min(
            sum(1 for u, v in nonloop if perm.index(u) > perm.index(v))
            for perm in permutations(range(n))
        )
        assert len(fas) == best + nloops, trial
        # exact never worse than the greedy
        greedy, _ = feedback_arc_set_eades(_ds(arcs), n, P=2)
        assert len(fas) <= len(greedy)
