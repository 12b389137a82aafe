"""Engine wire-layout and renumbering invariants.

* per_dest_refs mode (num_returns=P superstep messages — the
  multi-node layout) must produce byte-identical results to the
  single-object default on every algorithm family.
* distributed renumbering must agree with a driver-side numpy oracle.
* _route must reject out-of-range endpoints instead of dropping edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from xdata_igraph_ray.graph.components import scc, wcc
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.lpa import label_propagation
from xdata_igraph_ray.graph.pagerank import pagerank

from .oracles import gnm_edges


def _engine(src, dst, n, P=3, **kw):
    t = pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64)})
    return GraphEngine.from_edges(t, n=n, P=P, **kw)


def _run_all(eng):
    out = {}
    pagerank(eng, tol=0.0, max_iter=15)
    out["pr"] = eng.state_arrays("pr").copy()
    wcc(eng)
    out["wcc"] = eng.state_arrays("label").copy()
    scc(eng)
    out["scc"] = eng.state_arrays("scc").copy()
    label_propagation(eng, mode="in")
    out["lpa"] = eng.state_arrays("label").copy()
    return out


def test_per_dest_refs_identical():
    src, dst = gnm_edges(300, 1500, seed=7)
    e1 = _engine(src, dst, 300, P=3)
    a = _run_all(e1)
    e1.shutdown()
    e2 = _engine(src, dst, 300, P=3, per_dest_refs=True)
    assert e2.per_dest_refs
    b = _run_all(e2)
    e2.shutdown()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_distributed_renumber_matches_numpy():
    rng = np.random.default_rng(11)
    n = 400
    eng = _engine([0], [1], n, P=4)
    # arbitrary labels drawn from the vid space (as WCC/SCC produce)
    labels = rng.integers(0, n, n)
    for q, s in enumerate(eng.shards):
        lo, hi = eng.bounds[q], eng.bounds[q + 1]
        ray.get(s.set_state.remote(label=labels[lo:hi]))
    k = eng.renumber_labels("label")
    got = eng.state_arrays("label")
    uniq = np.unique(labels)
    want = np.searchsorted(uniq, labels)
    np.testing.assert_array_equal(got, want)
    assert k == len(uniq)
    eng.shutdown()


def test_distributed_first_appearance_renumber():
    rng = np.random.default_rng(13)
    n = 350
    eng = _engine([0], [1], n, P=3)
    labels = rng.integers(0, n, n)
    for q, s in enumerate(eng.shards):
        lo, hi = eng.bounds[q], eng.bounds[q + 1]
        ray.get(s.set_state.remote(label=labels[lo:hi]))
    k = eng.renumber_labels_first_appearance("label")
    got = eng.state_arrays("label")
    # oracle: rank labels by their first appearance in vid order
    first = {}
    for v, l in enumerate(labels):
        first.setdefault(l, v)
    order = sorted(first, key=first.get)
    mapping = {l: i for i, l in enumerate(order)}
    want = np.array([mapping[l] for l in labels])
    np.testing.assert_array_equal(got, want)
    assert k == len(mapping)
    eng.shutdown()


def test_route_rejects_out_of_range():
    with pytest.raises(Exception, match="out of range"):
        _engine([0, 5], [1, 99], n=10, P=2)


def test_narrow_engine_identical():
    """narrow=True (int32 CSR arrays) must be bit-identical to the
    int64 engine for the north-rule kernels."""
    from xdata_igraph_ray.graph.components import wcc as wcc_fn
    from xdata_igraph_ray.graph.lpa import label_propagation
    from xdata_igraph_ray.graph.pagerank import pagerank
    from xdata_igraph_ray.sources.synth import generate_edges

    edges = generate_edges(20_000, seed=5)
    out = {}
    for narrow in (False, True):
        eng = GraphEngine.from_edges(edges, n=20_000, P=3, narrow=narrow)
        pagerank(eng, tol=1e-8)
        pr = eng.state_arrays("pr")
        wcc_fn(eng)
        w = eng.state_arrays("label")
        label_propagation(eng, max_iter=80)
        lab = eng.state_arrays("label")
        out[narrow] = (pr, w, lab)
        eng.shutdown()
    np.testing.assert_array_equal(out[False][0], out[True][0])
    np.testing.assert_array_equal(out[False][1], out[True][1])
    np.testing.assert_array_equal(out[False][2], out[True][2])


def test_safe_take_list_gather(monkeypatch):
    """exchange._safe_take must route big-child list columns through
    the numpy gather (pyarrow >4 GiB wraparound workaround) and
    produce exactly what a plain take produces below the limit."""
    from xdata_igraph_ray import exchange as ex

    rng = np.random.default_rng(3)
    n = 5000
    lens = rng.integers(1, 40, n)
    tot = int(lens.sum())
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    vals = np.repeat(np.arange(n, dtype=np.int64) * 100, lens) + (
        np.arange(tot) - np.repeat(starts, lens))
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    import pyarrow as pa
    arr = pa.ListArray.from_arrays(pa.array(offs),
                                   pa.array(vals, pa.int64()))
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "set": arr})
    order = rng.permutation(n)
    want = t.take(pa.array(order))
    # force the numpy-gather path with a tiny limit
    monkeypatch.setattr(ex, "_TAKE_CHILD_LIMIT", 1024)
    got = ex._safe_take(t, order)
    assert got["k"].to_pylist() == want["k"].to_pylist()
    assert got["set"].to_pylist() == want["set"].to_pylist()
    # chunked + sliced input too
    t2 = pa.concat_tables([t.slice(100, 2000), t.slice(0, 100),
                           t.slice(2100, 2900)])
    order2 = rng.permutation(len(t2))
    got2 = ex._safe_take(t2, order2)
    want2 = t2.combine_chunks().take(pa.array(order2))
    assert got2["set"].to_pylist() == want2["set"].to_pylist()
