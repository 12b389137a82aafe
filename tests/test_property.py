"""Property-based conformance: on arbitrary small graphs the engine
must match the reference-semantics oracles (strengthens the golden
tests of SURVEY.md §5 — the reference has no property tests at all)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xdata_igraph_ray.graph.components import scc, wcc
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.pagerank import pagerank
from xdata_igraph_ray.graph.triangles import triangles

from .oracles import pagerank_ref, scc_ref, triangles_ref, wcc_ref

graphs = st.integers(5, 40).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=0, max_size=3 * n,
        ),
    )
)

SET = settings(
    max_examples=15, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


def build(n, edges, P=2):
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    eng = GraphEngine.from_edges(
        pa.table({"src": src, "dst": dst}), n=n, P=P
    )
    return eng, src, dst


@given(graphs)
@SET
def test_pagerank_matches_oracle(g):
    n, edges = g
    eng, src, dst = build(n, edges)
    pagerank(eng, tol=1e-13)
    got = eng.state_arrays("pr")
    want = pagerank_ref(src, dst, n)
    eng.shutdown()
    np.testing.assert_allclose(got, want, atol=1e-8)


@given(graphs)
@SET
def test_components_match_oracle(g):
    n, edges = g
    eng, src, dst = build(n, edges)
    wcc(eng)
    got_w = eng.state_arrays("label")
    scc(eng)
    got_s = eng.state_arrays("scc")
    eng.shutdown()
    assert (got_w == wcc_ref(src, dst, n)).all()
    assert (got_s == scc_ref(src, dst, n)).all()


@given(graphs)
@SET
def test_triangles_match_oracle(g):
    n, edges = g
    import ray.data as rd

    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    total, per_v = triangles(
        rd.from_arrow(pa.table({"src": src, "dst": dst})), n, P=2
    )
    want = triangles_ref(src, dst, n)
    got = per_v.to_pandas().sort_values("vid")["count"].to_numpy()
    assert (got == want).all()
    assert total == want.sum() // 3
