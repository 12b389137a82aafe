"""PageRank correctness vs the reference-semantics oracle
(FIXTURES.md fixtures g_tiny_pr, g_dangling, g_multi_loop, g_gnm,
g_ba)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.pagerank import pagerank

from .oracles import gnm_edges, pagerank_ref


def run_pr(src, dst, n, P=3, weights=None, **kw):
    cols = {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
    if weights is not None:
        cols["weight"] = np.asarray(weights, float)
    eng = GraphEngine.from_edges(
        pa.table(cols), n=n, P=P, weighted=weights is not None
    )
    info = pagerank(eng, tol=1e-12, weighted=weights is not None, **kw)
    got = eng.state_arrays("pr")
    return got, info, eng


def test_tiny_pr_reference_graph():
    # the 4-vertex graph of examples/simple/igraph_pagerank.c:53-60
    src = [0, 1, 2, 3, 0]
    dst = [1, 2, 0, 2, 2]
    got, info, _ = run_pr(src, dst, 4)
    want = pagerank_ref(src, dst, 4)
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-12


def test_dangling_mass_teleports():
    # chain 0->1->2->...->5, plus sinks 6..9 receiving from 0
    src = [0, 1, 2, 3, 4, 0, 0, 0, 0]
    dst = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    got, info, _ = run_pr(src, dst, 10)
    want = pagerank_ref(src, dst, 10)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_self_loops_and_multi_edges_kept():
    src = [0, 0, 0, 1, 1, 2, 2, 2]
    dst = [1, 1, 0, 2, 2, 0, 0, 2]
    got, info, _ = run_pr(src, dst, 3)
    want = pagerank_ref(src, dst, 3)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_gnm_multi_shard_matches():
    src, dst = gnm_edges(2000, 20000, seed=42)
    got, info, _ = run_pr(src, dst, 2000, P=5)
    want = pagerank_ref(src, dst, 2000)
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert info["iterations"] < 200


def test_weighted_negative_dropped():
    src = [0, 0, 1, 2, 2]
    dst = [1, 2, 2, 0, 1]
    w = [2.0, 1.0, -3.0, 0.5, 0.0]
    got, info, _ = run_pr(src, dst, 3, weights=w)
    want = pagerank_ref(src, dst, 3, weights=w)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_isolated_vertices():
    src = [0, 1]
    dst = [1, 0]
    got, info, _ = run_pr(src, dst, 5)
    want = pagerank_ref(src, dst, 5)
    np.testing.assert_allclose(got, want, atol=1e-9)
