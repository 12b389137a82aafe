"""LPA (SBM planted partitions + dominance invariant) and triangle
counting (exact vs networkx; fixtures g_sbm, g_ws of FIXTURES.md)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.lpa import label_propagation
from xdata_igraph_ray.graph.triangles import (
    transitivity_global,
    transitivity_local,
    triangles,
)

from .oracles import gnm_edges, triangles_ref


def sbm_edges(blocks=4, per=60, p_in=0.25, p_out=0.002, seed=5):
    """Symmetric planted-partition graph (both edge directions stored)."""
    rng = np.random.default_rng(seed)
    n = blocks * per
    membership = np.repeat(np.arange(blocks), per)
    srcs, dsts = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if membership[i] == membership[j] else p_out
            if rng.random() < p:
                srcs += [i, j]
                dsts += [j, i]
    return np.array(srcs), np.array(dsts), n, membership


def test_lpa_sbm_recovers_planted_partition():
    src, dst, n, want = sbm_edges()
    eng = GraphEngine.from_edges(
        pa.table({"src": src, "dst": dst}), n=n, P=3
    )
    info = label_propagation(eng, mode="in")  # symmetric edges: in == all
    got = eng.state_arrays("label")
    # exact partition match (labels are canonical on both sides)
    want_canon = np.unique(want, return_inverse=True)[1]
    assert (got == want_canon).all()
    assert info["communities"] == 4
    eng.shutdown()


def test_lpa_dominance_invariant():
    """On arbitrary graphs the fixpoint must satisfy igraph's stop
    criterion (src/community.c:2302-2306): every vertex's label is
    dominant among its in-neighbors."""
    src, dst = gnm_edges(300, 1800, seed=9)
    n = 300
    eng = GraphEngine.from_edges(pa.table({"src": src, "dst": dst}), n=n, P=3)
    label_propagation(eng, mode="in", renumber=False, max_iter=300)
    lab = eng.state_arrays("label")
    for v in range(n):
        nbrs = src[dst == v]
        if len(nbrs) == 0:
            continue
        counts = {}
        for u in nbrs:
            counts[lab[u]] = counts.get(lab[u], 0) + 1
        assert counts.get(lab[v], 0) == max(counts.values())
    eng.shutdown()


def test_lpa_fixed_labels_held():
    src = np.array([0, 1, 1, 2])
    dst = np.array([1, 0, 2, 1])
    eng = GraphEngine.from_edges(
        pa.table({"src": src, "dst": dst}), n=3, P=2
    )
    initial = np.array([7, 7, 9])
    fixed = np.array([True, False, True])
    label_propagation(
        eng, mode="in", initial=initial, fixed=fixed, renumber=False
    )
    lab = eng.state_arrays("label")
    assert lab[0] == 7 and lab[2] == 9
    eng.shutdown()


def two_triangle_graph():
    #  0-1-2 triangle + 2-3 bridge + 3-4-5 triangle
    src = [0, 1, 2, 2, 3, 4, 3]
    dst = [1, 2, 0, 3, 4, 5, 5]
    return np.array(src), np.array(dst), 6


def test_triangles_handmade():
    src, dst, n = two_triangle_graph()
    total, per_v = triangles(rd.from_arrow(pa.table({"src": src, "dst": dst})), n, P=3)
    assert total == 2
    got = per_v.to_pandas().sort_values("vid")["count"].to_numpy()
    assert list(got) == [1, 1, 1, 1, 1, 1]


def test_triangles_gnm_vs_networkx():
    src, dst = gnm_edges(400, 4000, seed=21)
    n = 400
    total, per_v = triangles(rd.from_arrow(pa.table({"src": src, "dst": dst})), n, P=4)
    want = triangles_ref(src, dst, n)
    got = per_v.to_pandas().sort_values("vid")["count"].to_numpy()
    assert (got == want).all()
    assert total == want.sum() // 3


def test_triangles_multi_edges_loops_ignored():
    src = np.array([0, 0, 1, 2, 2, 0])
    dst = np.array([1, 1, 2, 0, 2, 0])
    total, per_v = triangles(rd.from_arrow(pa.table({"src": src, "dst": dst})), 3, P=2)
    assert total == 1
    assert list(per_v.to_pandas().sort_values("vid")["count"]) == [1, 1, 1]


def test_transitivity():
    src, dst, n = two_triangle_graph()
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    import networkx as nx

    g = nx.Graph(zip(src.tolist(), dst.tolist()))
    want_global = nx.transitivity(g)
    got = transitivity_global(ds, n, P=2)
    assert abs(got - want_global) < 1e-12
    lt = transitivity_local(ds, n, P=2).to_pandas().sort_values("vid")
    want_local = nx.clustering(g)
    for vid, val in zip(lt["vid"], lt["transitivity"]):
        assert abs(val - want_local[vid]) < 1e-12


def test_lpa_hub_histogram_path_matches_full_regather():
    """Vertices with gathered degree >= hub_deg keep an incremental
    (label -> weight) histogram instead of re-gathering their full
    in-edge list each superstep (engine.py _lpa_build_hists).
    Unweighted sums are +-1.0 exact in float64, so forcing EVERY vertex
    through the hub path must be bit-identical to the default path —
    on a skewed graph with a planted mega-hub and in both modes.
    hub_deg is passed as a parameter (not env) because already-running
    Ray workers do not see driver-side env changes."""
    rng = np.random.default_rng(77)
    n = 400
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    # planted hub: half the vertices link to vertex 7
    extra = np.arange(0, n, 2)
    src = np.concatenate((src, extra))
    dst = np.concatenate((dst, np.full(len(extra), 7)))
    t = pa.table({"src": src, "dst": dst})
    for mode in ("in", "all"):
        labs = {}
        for thr in (2, 999999999):
            eng = GraphEngine.from_edges(t, n=n, P=3)
            label_propagation(eng, mode=mode, renumber=False,
                              max_iter=200, hub_deg=thr)
            labs[thr] = eng.state_arrays("label")
            eng.shutdown()
        assert (labs[2] == labs[999999999]).all(), mode


def test_lpa_subscription_filter_matches_broadcast():
    """The subscription-filtered scatter (engine.py lpa2_scatter) sends
    each destination exactly the (vid, label) pairs its _patch_cache
    keeps — the broadcast's searchsorted misses carry no information —
    so trajectories must be bit-identical, including the hub-histogram
    path and both modes.  subfilter flows as a parameter, not env,
    because running Ray workers do not see driver env changes."""
    rng = np.random.default_rng(101)
    n = 500
    src = rng.integers(0, n, 6000)
    dst = rng.integers(0, n, 6000)
    extra = np.arange(0, n, 2)  # planted hub to exercise histograms
    src = np.concatenate((src, extra))
    dst = np.concatenate((dst, np.full(len(extra), 11)))
    t = pa.table({"src": src, "dst": dst})
    for mode in ("in", "all"):
        labs = {}
        for sub in (True, False):
            eng = GraphEngine.from_edges(t, n=n, P=4)
            label_propagation(eng, mode=mode, renumber=False,
                              max_iter=200, hub_deg=8, subfilter=sub)
            labs[sub] = eng.state_arrays("label")
            eng.shutdown()
        assert (labs[True] == labs[False]).all(), mode


def test_lpa_prefill_matches_republish():
    """With initial=None every vertex's label is its vid, so lpa2_init
    pre-fills the neighbor-label caches directly from the CSR arrays
    and skips round 0's O(E) publish+patch (engine.py lpa2_init
    prefill).  All vertices start pending, so round-0 decisions still
    happen — the trajectory must be bit-identical to an explicit
    initial=arange republish (which takes the non-prefill path)."""
    rng = np.random.default_rng(202)
    n = 450
    src = rng.integers(0, n, 5000)
    dst = rng.integers(0, n, 5000)
    extra = np.arange(1, n, 2)
    src = np.concatenate((src, extra))
    dst = np.concatenate((dst, np.full(len(extra), 3)))
    t = pa.table({"src": src, "dst": dst})
    for mode in ("in", "all"):
        labs = {}
        for init in (None, np.arange(n, dtype=np.int64)):
            eng = GraphEngine.from_edges(t, n=n, P=4)
            info = label_propagation(eng, mode=mode, initial=init,
                                     renumber=False, max_iter=200,
                                     hub_deg=8)
            labs[init is None] = (eng.state_arrays("label"),
                                  info["iterations"])
            eng.shutdown()
        assert labs[True][1] == labs[False][1], mode
        assert (labs[True][0] == labs[False][0]).all(), mode
