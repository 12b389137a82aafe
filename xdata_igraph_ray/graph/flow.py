"""Max-flow / min-cut / connectivity / bipartite operators.

Reference surface (all driven by one distributed push-relabel kernel,
``GraphShard.mf_*`` in engine.py):

* :func:`maxflow` — igraph_maxflow (src/flow.c:470-1092): flow value,
  per-edge flows, and the s-side min-cut partition.  The reference's
  sequential push-relabel becomes alternating pure-push / pure-relabel
  BSP supersteps (a shared height snapshot per push round keeps replica
  flow copies consistent; see engine.py for the invariant argument).
* :func:`st_mincut` — igraph_st_mincut (src/flow.c:1509): value,
  partition, cut edges.
* :func:`st_edge_connectivity` — igraph_st_edge_connectivity
  (src/flow.c:1733): unit-capacity maxflow.
* :func:`st_vertex_connectivity` — igraph_st_vertex_connectivity
  (src/flow.c:1797): vertex-splitting reduction, then unit maxflow.
* :func:`edge_connectivity` / :func:`vertex_connectivity` — global
  variants (src/flow.c:1762,1930): min over n-1 rooted cuts
  (documented small-n scope, exactly the reference's loop).
* :func:`is_bipartite` / :func:`bipartite_types` — igraph_is_bipartite
  (src/bipartite.c:1045): the BFS 2-coloring is re-expressed as ONE
  distributed WCC over the doubled graph {v0,v1}: each edge (u,v)
  becomes (u0,v1),(u1,v0); the graph is bipartite iff no v has v0,v1
  in the same component.  Fully reuses the engine's WCC.
* :func:`bipartite_matching` — igraph_maximum_bipartite_matching
  (src/matching.c:197): unit-capacity flow network s->L->R->t; the
  integral flow on L->R arcs is the matching.

The kernel requires a SIMPLE directed graph (parallel edges collapse
by capacity sum — use :func:`flow_network`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .engine import GraphEngine
from .build import simplify
from ..exchange import block_refs, to_dataset

INF64 = np.iinfo(np.int64).max


def _refs_of(edges) -> list:
    if isinstance(edges, pa.Table):
        return [ray.put(edges)]
    if isinstance(edges, list):
        return edges
    return block_refs(edges)


def flow_network(
    edges, n: int | None = None, P: int = 8, weighted: bool = True,
    min_shard_vertices: int = 12_500,
) -> GraphEngine:
    """Build a flow engine: collapse parallel edges (capacities sum),
    drop self-loops — the preprocessing igraph_maxflow assumes
    (src/flow.c:519 requires a simple directed capacity graph).

    Push-relabel is ROUND-dominated: every superstep pays a fixed
    per-shard RPC fan-out, so over-sharding a small-vertex network
    slows it almost linearly (measured on the 100k-vertex layered
    bench: P=16 49 s vs P=8 17.8 s for the identical flow).  When
    ``n`` is known, P is capped so each shard holds at least
    ``min_shard_vertices`` vertices; pass ``min_shard_vertices=0``
    to disable."""
    if n is not None and min_shard_vertices > 0:
        P = max(2, min(P, max(1, n // min_shard_vertices)))
    edges = _refs_of(edges)
    ds = simplify(edges, remove_loops=True, remove_multiple=True,
                  weighted=weighted, P=P)
    return GraphEngine.from_edges(ds, n=n, P=P, weighted=weighted)


def _resbfs(engine: GraphEngine, seeds, direction: str) -> None:
    shards = engine.shards
    ray.get([
        s.mf_resbfs_init.remote(np.atleast_1d(np.asarray(seeds, np.int64)))
        for s in shards
    ])
    # stop-check every 8 levels instead of every level: the frontier is
    # monotone (once a level changes nothing, no later level can), so
    # overshoot levels are exact no-ops — and with the frontier-indexed
    # scatter they cost ~nothing, while the per-level ray.get was a
    # driver stall x BFS depth (~51 on the layered bench network)
    while True:
        level_refs = []
        for _ in range(8):
            outs = engine.scatter("mf_resbfs_scatter", direction)
            level_refs.append([
                shards[q].mf_resbfs_gather.remote(*engine.pieces(outs, q))
                for q in range(engine.P)
            ])
        # per-level sums (gathers grouped per level): the frontier is
        # monotone, so the first all-zero level proves convergence —
        # break there instead of launching another full 8-level batch
        done = False
        for refs in level_refs:
            if sum(s["changed"] for s in ray.get(refs)) == 0:
                done = True
                break
        if done:
            break


def _sync_heights(engine: GraphEngine) -> None:
    outs = engine.scatter("mf_broadcast_heights")
    ray.get([
        engine.shards[q].mf_heights_gather.remote(*engine.pieces(outs, q))
        for q in range(engine.P)
    ])


def _global_relabel_p1(engine: GraphEngine, t: int) -> None:
    _resbfs(engine, [t], "to")
    ray.get([s.mf_apply_global_relabel.remote() for s in engine.shards])
    _sync_heights(engine)


def _stats(engine: GraphEngine) -> tuple[int, float]:
    st = ray.get([s.mf_stats.remote() for s in engine.shards])
    return sum(x["active"] for x in st), sum(x["t_excess"] for x in st)


def _run_phase(engine: GraphEngine, s: int, t: int, phase: int,
               global_relabel_every: int, cap: int) -> None:
    shards = engine.shards
    rounds = 0
    while True:
        # 3-barrier round (was 5): push scatter -> fused push-gather +
        # relabel-scatter -> fused heights-gather + stats.  Pushes and
        # relabels are identical to the unfused sequence (the relabel
        # reads post-push state either way).  On one node the rounds
        # are numpy-compute-bound (~65 ms/round at ANY P on the 50x2000
        # bench network — the active wave is O(active x deg) work), so
        # the local gain is small; on a multi-node cluster each barrier
        # is a network round-trip, and 88-round networks pay 2 fewer
        # RTTs per round.
        outs = engine.scatter("mf_push_scatter")
        routs = engine.gather_scatter("mf_push_gather_relabel", outs)
        stats = ray.get([
            shards[q].mf_heights_gather_stats.remote(
                *engine.pieces(routs, q))
            for q in range(engine.P)
        ])
        rounds += 1
        active = sum(x["active"] for x in stats)
        if active == 0:
            return
        if rounds % global_relabel_every == 0:
            if phase == 1:
                _global_relabel_p1(engine, t)
            else:
                # phase-2 refresh: monotone max(h, n + dist_s) — the
                # exact return distance is a valid labeling
                _resbfs(engine, [s], "to")
                ray.get([
                    sh.mf_apply_phase2_relabel.remote()
                    for sh in engine.shards
                ])
                _sync_heights(engine)
        if rounds > cap:
            raise RuntimeError(f"maxflow: phase {phase} did not settle")


def maxflow(
    engine: GraphEngine,
    s: int,
    t: int,
    with_flow: bool = True,
    with_cut: bool = True,
    global_relabel_every: int = 16,
) -> dict:
    """Returns {"value", "flow" (Dataset src/dst/flow, optional),
    "partition1" (Dataset of s-side vids, optional), "cut" (Table of
    saturated crossing edges, optional)}.  Engine must come from
    :func:`flow_network` (simple graph, weights = capacities;
    unweighted engine = unit capacities)."""
    if not (0 <= s < engine.n and 0 <= t < engine.n) or s == t:
        raise ValueError("maxflow: bad s/t")
    shards = engine.shards
    ray.get([sh.mf_init.remote(s, t) for sh in shards])
    # initial heights = residual distance to t (zero flow: plain BFS)
    _global_relabel_p1(engine, t)
    # preflow: saturate s's out-arcs
    outs = engine.scatter("mf_saturate_source")
    ray.get([
        shards[q].mf_push_gather.remote(*engine.pieces(outs, q))
        for q in range(engine.P)
    ])
    cap = 8 * engine.n * engine.n + 64
    _run_phase(engine, s, t, 1, global_relabel_every, cap)
    _, value = _stats(engine)

    out: dict = {"value": float(value)}
    if with_cut:
        # min-cut from a max PREFLOW: S-side = complement of the
        # t-reaching residual set (src/flow.c:1007 does the same
        # backward residual BFS).  "Reachable from s" would overshoot:
        # frozen excess trapped beyond the cut keeps those crossing
        # arcs saturated-but-not-on-the-min-cut.
        _resbfs(engine, [t], "to")
        # S-side vids as a (lazy) Dataset of per-shard tables — no
        # O(n) driver concat; small-graph callers (Gomory-Hu, tests)
        # materialize explicitly
        out["partition1"] = rd.from_arrow_refs(
            [sh.mf_sside_table.remote() for sh in shards]
        )
        routs = engine.scatter("mf_broadcast_reach")
        cut_tbls = ray.get([
            shards[q].mf_cut_table.remote(*engine.pieces(routs, q))
            for q in range(engine.P)
        ])
        out["cut"] = pa.concat_tables(cut_tbls)
    if with_flow:
        # phase 2: drain leftover excess back to s for exact per-edge
        # flows (skipped when the preflow is already a flow)
        leftover = sum(
            x["frozen_excess"] for x in ray.get(
                [sh.mf_stats.remote() for sh in shards]
            )
        )
        if leftover > 1e-9:
            _resbfs(engine, [s], "to")
            ray.get([sh.mf_set_phase2.remote() for sh in shards])
            _sync_heights(engine)
            _run_phase(engine, s, t, 2, global_relabel_every, cap)
        out["flow"] = rd.from_arrow_refs(
            [sh.mf_flow_table.remote() for sh in shards]
        )
    ray.get([sh.mf_free.remote() for sh in shards])
    return out


def st_mincut(engine: GraphEngine, s: int, t: int) -> dict:
    r = maxflow(engine, s, t, with_flow=False, with_cut=True)
    return {"value": r["value"], "partition1": r["partition1"],
            "cut": r["cut"]}


def st_edge_connectivity(engine: GraphEngine, s: int, t: int) -> int:
    """Engine must be UNWEIGHTED (unit capacities)."""
    if engine.weighted:
        raise ValueError("st_edge_connectivity: build an unweighted engine")
    return int(round(maxflow(engine, s, t, with_flow=False,
                             with_cut=False)["value"]))


def edge_connectivity(edges, n: int, P: int = 8) -> int:
    """Global edge connectivity (igraph_edge_connectivity,
    src/flow.c:1762): min over maxflow(0, v) and maxflow(v, 0) — the
    reference's own n-1 rooted-cut loop.  O(n) maxflows: small-n scope
    (each individual flow is distributed)."""
    eng = flow_network(edges, n=n, P=P, weighted=False)
    try:
        best = None
        for v in range(1, n):
            for (a, b) in ((0, v), (v, 0)):
                val = st_edge_connectivity(eng, a, b)
                if best is None or val < best:
                    best = val
                if best == 0:
                    return 0
        return int(best if best is not None else 0)
    finally:
        eng.shutdown()


def mincut(edges, n: int, P: int = 8) -> dict:
    """Global minimum (weighted) cut of a directed capacity graph
    (igraph_mincut, src/flow.c:1615: min over the n-1 rooted st-cuts
    in both orientations).  Each st-flow is distributed; the O(n) loop
    bounds this to small-n scope like the reference's own algorithm."""
    eng = flow_network(edges, n=n, P=P, weighted=True)
    try:
        best = None
        for v in range(1, n):
            for (a, b) in ((0, v), (v, 0)):
                r = maxflow(eng, a, b, with_flow=False, with_cut=True)
                if best is None or r["value"] < best["value"]:
                    best = r
                if best["value"] == 0:
                    return best
        return best if best is not None else {"value": 0.0}
    finally:
        eng.shutdown()


def _split_edges(tbl: pa.Table, big: float) -> pa.Table:
    """Vertex-splitting gadget (igraph_st_vertex_connectivity,
    src/flow.c:1797): v -> v_in=2v, v_out=2v+1; internal arc cap 1,
    original arcs u_out -> v_in cap `big`."""
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    return pa.table({
        "src": 2 * src + 1, "dst": 2 * dst,
        "weight": np.full(len(src), big),
    })


def st_vertex_connectivity(
    edges, n: int, s: int, t: int, P: int = 8,
) -> int:
    """Minimum vertices to delete to disconnect s from t (s,t
    non-adjacent, directed semantics).  Gadget graph has 2n vertices."""
    refs = _refs_of(edges)
    big = float(n + 1)
    split = [_project_split.remote(r, big) for r in refs]
    internal = pa.table({
        "src": 2 * np.arange(n, dtype=np.int64),
        "dst": 2 * np.arange(n, dtype=np.int64) + 1,
        "weight": np.ones(n),
    })
    eng = flow_network(split + [ray.put(internal)], n=2 * n, P=P,
                       weighted=True)
    try:
        val = maxflow(eng, 2 * s + 1, 2 * t, with_flow=False,
                      with_cut=False)["value"]
        return int(round(val))
    finally:
        eng.shutdown()


def vertex_connectivity(edges, n: int, P: int = 8) -> int:
    """Global vertex connectivity (igraph_vertex_connectivity,
    src/flow.c:1930, Even's algorithm shape): min st-connectivity over
    non-adjacent pairs involving a fixed root and its non-neighbors,
    plus pairs among the root's neighbors.  Small-n scope."""
    refs = _refs_of(edges)
    tbls = ray.get([_fetch_tbl.remote(r) for r in refs])
    e = pa.concat_tables([t for t in tbls if len(t)])
    src = e["src"].to_numpy()
    dst = e["dst"].to_numpy()
    adj = set(zip(src.tolist(), dst.tolist()))
    best = None
    for v in range(1, n):
        for (a, b) in ((0, v), (v, 0)):
            if (a, b) in adj:
                continue
            val = st_vertex_connectivity(refs, n, a, b, P=P)
            if best is None or val < best:
                best = val
            if best == 0:
                return 0
    nbrs = sorted({int(d) for s_, d in adj if s_ == 0} |
                  {int(s_) for s_, d in adj if d == 0})
    for i, a in enumerate(nbrs):
        for b in nbrs[i + 1:]:
            for (x, y) in ((a, b), (b, a)):
                if (x, y) in adj:
                    continue
                val = st_vertex_connectivity(refs, n, x, y, P=P)
                if best is None or val < best:
                    best = val
    if best is None:
        best = n - 1  # complete graph: no non-adjacent pair exists
    return int(best)


@ray.remote
def _project_split(tbl: pa.Table, big: float) -> pa.Table:
    return _split_edges(tbl, big)


@ray.remote
def _fetch_tbl(tbl: pa.Table) -> pa.Table:
    return tbl


# -- bipartite ---------------------------------------------------------------


def _double_edges(tbl: pa.Table) -> pa.Table:
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    return pa.table({
        "src": np.concatenate((2 * src, 2 * dst)),
        "dst": np.concatenate((2 * dst + 1, 2 * src + 1)),
    })


def bipartite_types(edges, n: int, P: int = 8) -> dict:
    """{"is_bipartite": bool, "types": np.ndarray side per vertex
    (valid when bipartite)}.  One WCC over the doubled graph {v0,v1}:
    bipartite iff every v has v0, v1 in different components; v's side
    = which of its component's two shadow components holds v0."""
    from . import components

    refs = _refs_of(edges)
    doubled = [_project_double.remote(r) for r in refs]
    eng = GraphEngine.from_edges(doubled, n=2 * n, P=P, weighted=False)
    try:
        components.wcc(eng, renumber=False)
        lab = eng.state_arrays("label").reshape(n, 2)
    finally:
        eng.shutdown()
    ok = bool((lab[:, 0] != lab[:, 1]).all())
    # side 0 = the shadow component with the smaller label
    types = (lab[:, 0] > lab[:, 1]).astype(np.int8)
    return {"is_bipartite": ok, "types": types}


@ray.remote
def _project_double(tbl: pa.Table) -> pa.Table:
    return _double_edges(tbl)


def is_bipartite(edges, n: int, P: int = 8) -> bool:
    return bipartite_types(edges, n, P=P)["is_bipartite"]


def bipartite_matching(
    edges, n: int, types: np.ndarray, P: int = 8,
) -> dict:
    """Maximum bipartite matching via unit-capacity flow
    (igraph_maximum_bipartite_matching, src/matching.c:197 uses
    push-relabel for the weighted case — same reduction).  `types`:
    0/1 side per vertex; edges are taken side-0 -> side-1.
    Returns {"size", "pairs" (Table left/right)}."""
    refs = _refs_of(edges)
    s, t = n, n + 1
    ty = ray.put(np.ascontiguousarray(types))
    oriented = [_project_orient.remote(r, ty) for r in refs]
    left = np.flatnonzero(types == 0).astype(np.int64)
    right = np.flatnonzero(types == 1).astype(np.int64)
    ends = pa.table({
        "src": np.concatenate((np.full(len(left), s, dtype=np.int64), right)),
        "dst": np.concatenate((left, np.full(len(right), t, dtype=np.int64))),
    })
    eng = flow_network(oriented + [ray.put(ends)], n=n + 2, P=P,
                       weighted=False)
    try:
        r = maxflow(eng, s, t, with_flow=True, with_cut=False)
        flow_tbl = pa.concat_tables(ray.get(r["flow"].to_arrow_refs()))
    finally:
        eng.shutdown()
    fs = flow_tbl["src"].to_numpy()
    fd = flow_tbl["dst"].to_numpy()
    m = (fs != s) & (fd != t) & (flow_tbl["flow"].to_numpy() > 0.5)
    pairs = pa.table({"left": fs[m], "right": fd[m]})
    return {"size": int(round(r["value"])), "pairs": pairs}


@ray.remote
def _project_orient(tbl: pa.Table, types: np.ndarray) -> pa.Table:
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    flip = types[src] == 1
    return pa.table({
        "src": np.where(flip, dst, src),
        "dst": np.where(flip, src, dst),
    })


def gomory_hu(edges, n: int, P: int = 8) -> pa.Table:
    """Gomory-Hu cut tree of an UNDIRECTED capacity graph
    (igraph_gomory_hu_tree, src/flow.c:2389) by Gusfield's algorithm:
    n-1 max-flows against the evolving parent vector, no vertex
    contraction needed.  Input arcs are symmetrized (cap(u,v)+cap(v,u)
    summed both ways).  Returns (u, v, flow): the tree's n-1 edges;
    min-cut(a,b) = min flow on the unique a-b tree path."""
    refs = _refs_of(edges)
    sym = [_project_sym.remote(r) for r in refs]
    eng = flow_network(sym, n=n, P=P, weighted=True)
    try:
        parent = np.zeros(n, dtype=np.int64)
        fl = np.zeros(n)
        for i in range(1, n):
            r = maxflow(eng, i, int(parent[i]), with_flow=False,
                        with_cut=True)
            fl[i] = r["value"]
            sside = np.zeros(n, dtype=bool)
            sside[r["partition1"].to_pandas()["vid"].to_numpy()] = True
            move = (parent == parent[i]) & sside
            move[: i + 1] = False
            parent[move] = i
        return pa.table({
            "u": np.arange(1, n, dtype=np.int64),
            "v": parent[1:],
            "flow": fl[1:],
        })
    finally:
        eng.shutdown()


@ray.remote
def _project_sym(tbl: pa.Table) -> pa.Table:
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    w = (tbl["weight"].to_numpy() if "weight" in tbl.column_names
         else np.ones(len(src)))
    return pa.table({
        "src": np.concatenate((src, dst)),
        "dst": np.concatenate((dst, src)),
        "weight": np.concatenate((w, w)),
    })


def edge_disjoint_paths(engine: GraphEngine, s: int, t: int) -> int:
    """Maximum edge-disjoint s-t paths = unit-capacity max flow =
    st edge connectivity (igraph_edge_disjoint_paths,
    src/flow.c:2178-2200)."""
    if s == t:
        raise ValueError("not implemented for source == target")
    return st_edge_connectivity(engine, s, t)


def vertex_disjoint_paths(edges, n: int, s: int, t: int,
                          P: int = 8) -> int:
    """Maximum vertex-disjoint s-t paths
    (igraph_vertex_disjoint_paths, src/flow.c:2228-2305): if s-t arcs
    exist they are removed and 1 added to the connectivity of the
    remainder — the reference's rule; simple-graph pinning."""
    if s == t:
        raise ValueError("not implemented for source == target")
    refs = _refs_of(edges)

    @ray.remote
    def drop_st(tbl: pa.Table):
        import pyarrow.compute as pc

        m = pc.and_(pc.equal(tbl["src"], s), pc.equal(tbl["dst"], t))
        return tbl.filter(pc.invert(m))

    @ray.remote
    def count_st(tbl: pa.Table) -> int:
        import pyarrow.compute as pc

        return int(pc.sum(pc.and_(
            pc.equal(tbl["src"], s), pc.equal(tbl["dst"], t)
        ).cast(pa.int64())).as_py() or 0)

    removed = sum(ray.get([count_st.remote(r) for r in refs]))
    kept = [drop_st.remote(r) for r in refs]
    base = st_vertex_connectivity(kept, n, s, t, P=P)
    return base + (1 if removed else 0)


def adhesion(edges, n: int, P: int = 8) -> int:
    """Global edge connectivity (igraph_adhesion, src/flow.c)."""
    return edge_connectivity(edges, n, P=P)


def cohesion(edges, n: int, P: int = 8) -> int:
    """Global vertex connectivity (igraph_cohesion, src/flow.c)."""
    return vertex_connectivity(edges, n, P=P)


def residual_graph(src, dst, capacity, flow) -> pa.Table:
    """Residual graph of a flow (igraph_residual_graph,
    src/st-cuts.c:106-173): one arc per input arc with
    capacity - flow > 0.  NOTE the emitted capacity column is the
    ORIGINAL capacity, exactly as the reference stores it (the
    enumeration machinery only uses saturation binarily)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    capacity = np.asarray(capacity, dtype=np.float64)
    flow = np.asarray(flow, dtype=np.float64)
    keep = capacity - flow > 0
    return pa.table({
        "src": src[keep], "dst": dst[keep],
        "capacity": capacity[keep],
    })


def reverse_residual_graph(src, dst, flow, capacity=None) -> pa.Table:
    """Reverse residual graph (igraph_reverse_residual_graph,
    src/st-cuts.c:175-240): arc (u,v) where flow > 0, arc (v,u)
    where flow < capacity (unit capacities when None)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    flow = np.asarray(flow, dtype=np.float64)
    cap = (np.ones(len(src)) if capacity is None
           else np.asarray(capacity, dtype=np.float64))
    f_pos = flow > 0
    f_free = flow < cap
    return pa.table({
        "src": np.concatenate([src[f_pos], dst[f_free]]),
        "dst": np.concatenate([dst[f_pos], src[f_free]]),
    })


def maxflow_value(engine: GraphEngine, s: int, t: int) -> float:
    """igraph_maxflow_value (src/flow.c:1387)."""
    return float(maxflow(engine, s, t)["value"])


def st_mincut_value(engine: GraphEngine, s: int, t: int) -> float:
    """igraph_st_mincut_value (src/flow.c:1760) — max-flow duality."""
    return float(st_mincut(engine, s, t)["value"])


def mincut_value(edges, n: int, P: int = 8) -> float:
    """igraph_mincut_value (src/flow.c:1615)."""
    return float(mincut(edges, n, P=P)["value"])
