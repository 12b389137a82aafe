"""Convergence degree vs the reference's own example output
(examples/simple/igraph_convergence_degree.{c,out})."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.paths import convergence_degree


def _ds(arcs):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([a[0] for a in arcs], np.int64),
                "dst": np.array([a[1] for a in arcs], np.int64),
            }
        )
    )


def test_convergence_degree_reference_examples():
    # undirected 7-vertex example; expected per-edge values from the
    # reference's .out, keyed by canonical endpoint pair
    arcs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
            (3, 4), (4, 5), (4, 6), (5, 6)]
    want = dict(zip(arcs, [0.0, 0.0, 0.6, 0.0, 0.6, 0.6,
                           0.1429, 0.6667, 0.6667, 0.0]))
    t = convergence_degree(_ds(arcs), 7, directed=False, P=2)
    got = {
        (int(a), int(b)): float(c)
        for a, b, c in zip(t["src"].to_numpy(), t["dst"].to_numpy(),
                           t["cd"].to_numpy())
    }
    assert set(got) == set(want)
    for e, w in want.items():
        assert abs(got[e] - w) < 5e-4, e

    # directed 6-vertex example
    arcs2 = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 5)]
    want2 = dict(zip(arcs2, [-1 / 3, -1 / 3, -1 / 3, -1 / 3, 2 / 3]))
    t2 = convergence_degree(_ds(arcs2), 6, directed=True, P=2)
    got2 = {
        (int(a), int(b)): float(c)
        for a, b, c in zip(t2["src"].to_numpy(), t2["dst"].to_numpy(),
                           t2["cd"].to_numpy())
    }
    assert set(got2) == set(want2)
    for e, w in want2.items():
        assert abs(got2[e] - w) < 1e-9, e
