"""Multilevel (Louvain) community detection — reference
igraph_community_multilevel (src/community.c:2361+).

The reference sweeps vertices sequentially; the distributed variant
runs synchronous local-moving rounds (every vertex proposes its best
modularity-gain move; hash-parity damping breaks swap cycles —
Grappolo's trick), then contracts communities into a weighted
supergraph and recurses.  Each move round is three O(P)-ref
exchanges: Sigma_tot rebuild, neighbor-community messages, owner
Sigma lookups.  The driver sees only scalars and d-level mapping
Datasets.

Graph representation: symmetric arc list — every undirected edge
{a, b} appears as two arcs of weight w; a self-loop as ONE arc of
weight 2w (so arc strength == modularity degree k_i and contraction
composes: collapsing {a, b} inside one community turns its two arcs
into a single (c, c) arc of weight 2w automatically)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import block_refs, groupby_agg, hash_join, to_dataset
from .engine import GraphEngine


@ray.remote
def _symmetrize(t: pa.Table) -> pa.Table:
    s = t["src"].to_numpy()
    d = t["dst"].to_numpy()
    w = (
        t["weight"].to_numpy().astype(np.float64)
        if "weight" in t.column_names else np.ones(len(t))
    )
    loops = s == d
    ns = np.concatenate((s[~loops], d[~loops], s[loops]))
    nd = np.concatenate((d[~loops], s[~loops], s[loops]))
    nw = np.concatenate((w[~loops], w[~loops], 2 * w[loops]))
    return pa.table({"src": ns, "dst": nd, "weight": nw})


def _local_move(
    engine: GraphEngine, m_total: float, max_rounds: int,
    sync_rounds: int = 0, min_moves: int = 0,
    min_gain_frac: float = 1e-4, delta: str = "auto",
) -> tuple[int, bool]:
    """Synchronous local-moving rounds, hash-parity damped EVERY
    round (half the would-be movers move).  Undamped rounds are
    destructive: applying 100% of the simultaneous wishes crashes
    true modularity (measured -0.24/-0.26 dips after each formerly
    "full" 4th round on the 12.7M-edge bench graph, with the next 3
    damped rounds spent repairing), because simultaneous moves
    invalidate each other's gains.

    Stops: ``min_moves`` — stop once a round's PRE-damping would-move
    count is at most this (the true-fixpoint signal; matching the
    reference's epsilon stop, src/community.c:2430); 0 = exact
    fixpoint.  ``min_gain_frac`` — stop once the TRUE modularity
    improvement across a 4-round window drops below this, measured
    from per-round piggybacked scalars (internal arc weight + sum of
    Sigma_tot^2; exact up to the assignment-invariant loop term, no
    extra exchange).  Per-move gain sums are useless as a signal —
    they claimed dQ 0.1-0.6 per round on a graph whose final Q is
    0.06 — and on power-law graphs the would-move count plateaus at
    20-40% of vertices shuffling between equal-modularity
    assignments, so without the Q-window stop every level burns the
    whole round budget at O(E) a round.  The contraction levels above
    clean up the 4th-decimal tail anyway.

    ``sync_rounds``: force the first K rounds undamped (kept for
    callers pinning legacy trajectories; default 0).

    ``delta``: "auto" runs incremental delta rounds (persistent
    candidate sums patched by moved-vertex messages instead of the
    O(E) scatter + rebuild every round) whenever every shard reports
    them exact — integer-valued positive weights, which unweighted
    input satisfies at every contraction level; "off" forces the
    legacy rebuild; "force" is for equality tests.  Both paths are
    bit-identical when delta rounds are exact
    (test_louvain_delta_matches_rebuild)."""
    shards = engine.shards
    use_delta = all(ray.get([s.lou_init.remote(delta) for s in shards]))
    moved_any = 0
    w_arc = 2.0 * m_total
    q_ref: float | None = None
    prof = os.environ.get("XDATA_LOU_PROFILE")
    if prof:
        import time as _time
    for rnd in range(max_rounds):
        if prof:
            t_rnd = _time.perf_counter()
        # every round is hash-parity damped (profiled: an undamped
        # "full" round applies 100%% of the simultaneous wishes and
        # CRASHES true modularity — measured -0.24/-0.26 dips after
        # each full round on the bench graph, with the next 3 damped
        # rounds spent repairing); convergence is decided from the
        # pre-damping would-move count instead
        full = rnd < sync_rounds
        sig_parts = [s.lou_sigma_split.remote() for s in shards]
        # NOT ray.get'd here: actor tasks run in submission order per
        # shard, so collect is guaranteed to precede answer on every
        # owner; blocking the driver on the sigma exchange before
        # submitting the scatter/candidates chain idled the actors for
        # the exchange's round-trip each round.  sigsq is only needed
        # after lou_move.
        sig_stats_f = [
            shards[q].lou_sigma_collect.remote(*sig_parts)
            for q in range(engine.P)
        ]
        if use_delta:
            outs = engine.scatter("lou_delta_scatter")
            queries = [
                shards[q].lou_delta_candidates.remote(
                    *engine.pieces(outs, q))
                for q in range(engine.P)
            ]
        else:
            outs = engine.scatter("lou_scatter")
            queries = [
                shards[q].lou_candidates.remote(*engine.pieces(outs, q))
                for q in range(engine.P)
            ]
        answers = [
            shards[q].lou_sigma_answer.remote(*queries)
            for q in range(engine.P)
        ]
        res = ray.get([
            shards[q].lou_move.remote(
                m_total, None if full else rnd, *answers
            )
            for q in range(engine.P)
        ])
        sigsq = sum(s[1] for s in ray.get(sig_stats_f))
        moves = sum(r[0] for r in res)
        would = sum(r[1] for r in res)
        moved_any += moves
        if prof:
            print(f"[lou-prof]   round={rnd} "
                  f"{_time.perf_counter() - t_rnd:.2f}s moves={moves} "
                  f"would={would}", flush=True)
        # exact round-START modularity (up to the assignment-invariant
        # loop term) from piggybacked scalars — no extra exchange
        q_start = (
            sum(r[2] for r in res) / w_arc - sigsq / (w_arc * w_arc)
        )
        if would <= min_moves:
            break
        if rnd % 4 == 3:
            if q_ref is not None and q_start - q_ref < min_gain_frac:
                break
            q_ref = q_start
    if os.environ.get("XDATA_LOU_SHPROF"):
        dumps = ray.get([s.lou_prof_dump.remote() for s in shards])
        keys = sorted({k for d in dumps for k in d})
        agg = {k: (max(d.get(k, 0.0) for d in dumps),
                   sum(d.get(k, 0.0) for d in dumps)) for k in keys}
        print("[lou-shprof] " + "  ".join(
            f"{k}=max{mx:.2f}/sum{sm:.1f}" for k, (mx, sm) in agg.items()
        ), flush=True)
    return moved_any, use_delta


def _cache_contract(engine: GraphEngine, k: int, P: int):
    """Contract through the delta path's resident per-arc neighbor-
    community caches: one tiny old-label->dense-rank exchange (distinct
    cached labels only), then each shard emits its rv arcs as partial
    (comm_src, comm_dst, w) sums — the O(E) arc table never moves,
    unlike _contract's two hash joins.  Output identical to _contract
    for integer weights (test_louvain_cache_contract)."""
    shards = engine.shards
    offsets = engine._renumber_offsets
    qouts = [s.lou_cache_uniq_split.remote() for s in shards]
    answers = [
        shards[q].lou_cache_rank_answer.remote(int(offsets[q]), *qouts)
        for q in range(engine.P)
    ]
    parts = [
        shards[q].lou_contract_emit.remote(k, *answers)
        for q in range(engine.P)
    ]
    out = groupby_agg(
        parts, ["src", "dst"], [("weight", "sum", "weight")], P=P,
        as_refs=True,
    )
    # the emitting actors die at shutdown(); make sure their outputs
    # exist in the object store first (completed actor-task results
    # outlive the actor)
    ray.wait(parts, num_returns=len(parts), fetch_local=False)
    return out


def _contract(edges_refs, mapping: Dataset, P: int):
    """Arcs through the (vid, comm) mapping (two joins) + grouped
    weight sums — scale path, no driver-side mapping array."""
    mrefs = block_refs(mapping)
    m_src = [
        _rename_map.remote(r, "src", "csrc") for r in mrefs
    ]
    m_dst = [
        _rename_map.remote(r, "dst", "cdst") for r in mrefs
    ]
    j1 = hash_join(edges_refs, m_src, keys=["src"], P=P, as_refs=True)
    j2 = hash_join(j1, m_dst, keys=["dst"], P=P, as_refs=True)
    proj = [
        _project_contract.remote(r) for r in j2
    ]
    return groupby_agg(
        proj, ["src", "dst"], [("weight", "sum", "weight")], P=P,
        as_refs=True,
    )


@ray.remote
def _rename_map(t: pa.Table, key: str, out: str) -> pa.Table:
    return pa.table({key: t["vid"], out: t["comm"]})


@ray.remote
def _project_contract(t: pa.Table) -> pa.Table:
    return pa.table(
        {"src": t["csrc"], "dst": t["cdst"], "weight": t["weight"]}
    )


# per-run message-byte accounting for the most recent louvain() call
# (local-move rounds across all levels); read by bench.py
LAST_RUN_STATS: dict = {}


def louvain(
    edges: Dataset | list,
    n: int,
    P: int = 8,
    max_levels: int = 10,
    max_rounds: int = 24,
    min_gain_frac: float = 1e-4,
    delta: str | None = None,
) -> tuple[Dataset, int]:
    """(membership Dataset (vid, comm), community count).  Communities
    renumbered 0..k-1 by ascending min member vid.  ``delta``
    ("auto"/"off"/"force", default env XDATA_LOU_DELTA or "auto")
    selects the incremental local-move rounds — see _local_move."""
    if delta is None:
        delta = os.environ.get("XDATA_LOU_DELTA", "auto")
    prof = os.environ.get("XDATA_LOU_PROFILE")
    t_mark = [__import__("time").perf_counter()]

    def _tick(label: str, level: int) -> None:
        if not prof:
            return
        now = __import__("time").perf_counter()
        print(f"[lou-prof] level={level} {label}: "
              f"{now - t_mark[0]:.2f}s", flush=True)
        t_mark[0] = now

    LAST_RUN_STATS.clear()
    LAST_RUN_STATS["recv_bytes"] = 0
    refs = edges if isinstance(edges, list) else block_refs(edges)
    # level 0 builds straight from the DIRECTED refs via symmetrizing
    # route tasks — the doubled arc table is never materialized; arcs
    # holds symmetric refs only from level 1 on (contraction output),
    # or lazily if the level-0 join-contract fallback needs it
    arcs: list | None = None
    mapping: Dataset | None = None  # original vid -> current comm
    n_cur = n
    for level in range(max_levels):
        # contracted supergraphs shrink fast; scale the shard count
        # down with them (each shard actor costs ~0.2 s to spawn and a
        # 6k-vertex level doesn't amortize 8 of them)
        P_lvl = max(2, min(P, n_cur // 4000)) if n_cur < 4000 * P else P
        # collapse_multi: duplicate (u, v) arcs aggregate into summed
        # weights at CSR build — exact for modularity (k_i, Sigma,
        # candidate sums are weight sums; integer weights keep float
        # adds exact) and it shrinks a web hub's resident arc list by
        # its duplicate factor, de-straggling the shard that owns it
        if arcs is None:
            eng = GraphEngine.from_edges(refs, n=n_cur, P=P_lvl,
                                         weighted=True, symmetrize=True,
                                         collapse_multi=True)
        else:
            eng = GraphEngine.from_edges(arcs, n=n_cur, P=P_lvl,
                                         weighted=True, symmetric=True,
                                         collapse_multi=True)
        _tick("engine build", level)
        # total und weight = sum of arc strengths / 2
        strengths = ray.get([
            s.degree_table.remote() for s in eng.shards
        ])
        m_total = sum(
            float(np.sum(t["out_strength"].to_numpy())) for t in strengths
        ) / 2.0
        _, use_delta = _local_move(
            eng, m_total, max_rounds, min_moves=n_cur // 200,
            min_gain_frac=min_gain_frac, delta=delta)
        # local-move message-byte accounting (scatter + sigma + query
        # traffic; contraction exchanges not included) — bench reads
        # LAST_RUN_STATS for the bytes/iter attribution table
        LAST_RUN_STATS["recv_bytes"] += sum(
            d.get("recv_bytes", 0) for d in
            ray.get([s.lou_prof_dump.remote() for s in eng.shards])
        )
        _tick("local move", level)
        if use_delta:
            # the final round's movers were never published — bring the
            # arc caches current before they feed the contraction
            outs = eng.scatter("lou_delta_scatter")
            ray.get([
                eng.shards[q].lou_cache_flush.remote(*eng.pieces(outs, q))
                for q in range(eng.P)
            ])
        k = eng.renumber_labels("comm")
        lvl_map = eng.state_dataset(["comm"]).materialize()
        new_arcs = None
        if use_delta and k < n_cur - max(1, n_cur // 1000):
            # shard-local contraction through the resident arc caches
            # (no O(E) joins); only when another level will consume it
            new_arcs = _cache_contract(eng, k, P)
        eng.shutdown()
        _tick("renumber+map", level)
        if mapping is None:
            mapping = lvl_map
        else:
            joined = hash_join(
                block_refs(mapping),
                [_rename_lvl.remote(r) for r in block_refs(lvl_map)],
                keys=["comm"], right_keys=["prev"], P=P, as_refs=True,
            )
            mapping = to_dataset([
                _project_mapping.remote(r) for r in joined
            ]).materialize()
            _tick("mapping join", level)
        # a level that merged <0.1% of vertices has converged — more
        # levels would each pay an engine build to move a handful
        if k >= n_cur - max(1, n_cur // 1000):
            n_cur = k
            break
        if new_arcs is not None:
            arcs = new_arcs
        else:
            if arcs is None:  # join-contract fallback at level 0
                arcs = [_symmetrize.remote(r) for r in refs]
            arcs = _contract(arcs, lvl_map, P)
        _tick("contract", level)
        n_cur = k
    return mapping, n_cur


@ray.remote
def _rename_lvl(t: pa.Table) -> pa.Table:
    return pa.table({"prev": t["vid"], "new_comm": t["comm"]})


@ray.remote
def _project_mapping(t: pa.Table) -> pa.Table:
    return pa.table({"vid": t["vid"], "comm": t["new_comm"]})


# -- leading eigenvector (Newman spectral splits) -----------------------------


def _lec_matvec(engine: GraphEngine):
    """lec_y <- A . lec_x over the symmetrized weighted arcs."""
    outs = engine.scatter("mv_scatter", "lec_x", "fwd", True)
    ray.get([
        s.mv_gather.remote("lec_y", *engine.pieces(outs, q))
        for q, s in enumerate(engine.shards)
    ])


def _lec_try_split(
    engine: GraphEngine, c: int, new_id: int, two_m: float,
    tol: float, max_iter: int, min_gain: float = 0.0,
) -> float | None:
    """Power-iterate the shifted restricted modularity matrix of
    community ``c``; if the leading eigenvalue is positive and the
    sign split is nontrivial, commit it and return the eigenvalue."""
    shards = engine.shards
    stats = ray.get([s.lec_group_stats.remote(c) for s in shards])
    n_g = sum(s[0] for s in stats)
    Kg = sum(s[1] for s in stats)
    if n_g < 2:
        return None
    ray.get([s.lec_set_ones.remote(c) for s in shards])
    _lec_matvec(engine)
    sigma = max(ray.get([
        s.lec_rowsum.remote(c, Kg, two_m) for s in shards
    ]))
    if sigma <= 0:
        return None
    ss = 0.0
    for attempt in range(8):
        parts = ray.get([
            s.lec_x_init.remote(c, 7 + new_id + 1031 * attempt)
            for s in shards
        ])
        mean = sum(p[0] for p in parts) / max(sum(p[1] for p in parts), 1)
        ss = sum(ray.get([
            s.lec_x_center.remote(c, mean) for s in shards
        ]))
        if ss > 0.0:
            break
    if ss <= 0.0:
        return None  # all +-1 draws identical across members
    kx = sum(ray.get([
        s.lec_scale_x.remote(1.0 / np.sqrt(ss)) for s in shards
    ]))
    lam_shifted = 0.0
    for it in range(max_iter):
        outs = engine.scatter("mv_scatter", "lec_x", "fwd", True)
        upd = ray.get([
            s.lec_gather_update.remote(
                c, kx, sigma, two_m, *engine.pieces(outs, q)
            )
            for q, s in enumerate(shards)
        ])
        xy = sum(u[0] for u in upd)
        yy = sum(u[1] for u in upd)
        if yy <= 0.0:
            return None  # x annihilated: no positive direction
        norm = np.sqrt(yy)
        kx = sum(ray.get([
            s.lec_y_to_x.remote(1.0 / norm) for s in shards
        ]))
        lam_shifted = xy
        resid2 = max(yy - xy * xy, 0.0)
        if np.sqrt(resid2) <= tol * max(1.0, abs(xy)):
            break
        if (min_gain > 0.0 and it >= 25
                and lam_shifted - sigma < min_gain * sigma):
            return None  # rayleigh stuck near sigma: no useful split
    lam = lam_shifted - sigma
    if lam <= 1e-7 * sigma:
        return None  # no positive eigenvalue: community is final
    probes = [
        p for p in ray.get([
            s.lec_orient_probe.remote(c) for s in shards
        ]) if p is not None
    ]
    if probes and min(probes)[1] < 0:
        ray.get([s.lec_negate.remote() for s in shards])
    counts = ray.get([s.lec_split_counts.remote(c) for s in shards])
    if sum(cn[0] for cn in counts) == 0 or sum(cn[1] for cn in counts) == 0:
        return None
    ray.get([s.lec_split.remote(c, new_id) for s in shards])
    return lam


def leading_eigenvector(
    edges: Dataset | list,
    n: int,
    P: int = 8,
    steps: int | None = None,
    tol: float = 1e-10,
    max_iter: int = 500,
    min_gain: float = 0.0,
) -> tuple[Dataset, int]:
    """Newman leading-eigenvector community detection — reference
    igraph_community_leading_eigenvector (src/community.c, ARPACK
    leading eigenpair of the restricted modularity matrix B^(g); here
    a shifted power iteration on the BSP shards, same fixed point).

    Repeatedly pops a community off a FIFO queue and splits it by the
    sign of the leading eigenvector of B^(g) while the leading
    eigenvalue is positive (up to ``steps`` splits, default n-1 =
    until no community is splittable).  Pinned divergences from the
    reference: power iteration instead of ARPACK (deterministic
    splitmix64 start vector, sign pinned at the minimum member vid),
    and a split is skipped when every member lands on one side.

    Returns (membership Dataset (vid, comm), community count);
    community ids renumbered by first appearance in vertex-id order
    (same rule as igraph LPA renumbering)."""
    if isinstance(edges, pa.Table):
        refs = [ray.put(edges)]
    elif isinstance(edges, list):
        refs = edges
    else:
        refs = block_refs(edges)
    arcs = [_symmetrize.remote(r) for r in refs]
    eng = GraphEngine.from_edges(arcs, n=n, P=P, weighted=True)
    try:
        shards = eng.shards
        ray.get([s.lec_init.remote() for s in shards])
        stats = ray.get([s.lec_group_stats.remote(0) for s in shards])
        two_m = sum(s[1] for s in stats)
        if steps is None:
            steps = max(n - 1, 1)
        if two_m <= 0:  # empty graph: n singleton communities
            k = eng.renumber_labels_first_appearance("lec_comm")
            return (
                eng.state_dataset(
                    ["lec_comm"], rename={"lec_comm": "comm"}
                ).materialize(),
                k if k else n,
            )
        queue = [0]
        next_id = 1
        splits = 0
        while queue and splits < steps:
            c = queue.pop(0)
            lam = _lec_try_split(eng, c, next_id, two_m, tol, max_iter,
                                 min_gain)
            if lam is None:
                continue
            queue.extend((c, next_id))
            next_id += 1
            splits += 1
        ray.get([s.lec_free.remote() for s in shards])
        k = eng.renumber_labels_first_appearance("lec_comm")
        mem = eng.state_dataset(
            ["lec_comm"], rename={"lec_comm": "comm"}
        ).materialize()
        return mem, k
    finally:
        eng.shutdown()


# -- small-graph driver kernels: Girvan-Newman + CNM fastgreedy ---------------
#
# The reference's own complexity notes scope these to small graphs
# (edge-betweenness community is O(|V||E|^2), src/community.c; CNM
# fastgreedy is a sequential heap algorithm, src/fast_community.c) —
# like the DFS visitor they run driver-side on a collapsed undirected
# edge list; use louvain/leading_eigenvector/lpa for web-scale graphs.


def _collapse_undirected(edges, n):
    """Driver-side (u, v, w) dict of the undirected simple support
    (parallel edges sum weights, loops dropped — igraph community
    functions ignore loops in the null model)."""
    if isinstance(edges, pa.Table):
        tables = [edges]
    elif isinstance(edges, list):
        tables = ray.get(edges)
    else:
        tables = ray.get(block_refs(edges))
    w = {}
    for t in tables:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        ww = (t["weight"].to_numpy().astype(np.float64)
              if "weight" in t.column_names else np.ones(len(t)))
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        for a, b, x in zip(lo[keep].tolist(), hi[keep].tolist(),
                           ww[keep].tolist()):
            w[(a, b)] = w.get((a, b), 0.0) + x
    return w


def _modularity_of(membership, und_w, two_m):
    """Newman Q on the collapsed undirected support."""
    if two_m <= 0:
        return 0.0
    deg = {}
    intra = 0.0
    for (a, b), x in und_w.items():
        deg[a] = deg.get(a, 0.0) + x
        deg[b] = deg.get(b, 0.0) + x
        if membership[a] == membership[b]:
            intra += x
    dc = {}
    for v, dv in deg.items():
        c = membership[v]
        dc[c] = dc.get(c, 0.0) + dv
    return (2.0 * intra / two_m) - sum(
        (d / two_m) ** 2 for d in dc.values()
    )


def _components_of(n, adj):
    comp = np.full(n, -1, dtype=np.int64)
    c = 0
    for s in range(n):
        if comp[s] >= 0:
            continue
        stack = [s]
        comp[s] = c
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if comp[v] < 0:
                    comp[v] = c
                    stack.append(v)
        c += 1
    return comp, c


def _edge_betweenness_small(n, adj):
    """Unweighted undirected Brandes edge betweenness (each pair
    counted once; per-source BFS)."""
    from collections import deque

    eb = {}
    for s in range(n):
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        preds = {s: []}
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    preds[v] = []
                    sigma[v] = 0.0
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = {u: 0.0 for u in order}
        for u in reversed(order):
            for p in preds[u]:
                share = sigma[p] / sigma[u] * (1.0 + delta[u])
                key = (p, u) if p < u else (u, p)
                eb[key] = eb.get(key, 0.0) + share
                delta[p] += share
        # undirected: every pair counted from both endpoints -> halve
    return {k: v / 2.0 for k, v in eb.items()}


def community_edge_betweenness(
    edges: Dataset | list | pa.Table, n: int,
) -> tuple[np.ndarray, int, float]:
    """Girvan-Newman — reference igraph_community_edge_betweenness
    (src/community.c, O(|V||E|^2) per its own docs): repeatedly remove
    the max-edge-betweenness edge (tie: lexicographic min) from the
    undirected simple support, recomputing betweenness after every
    removal; return the membership with maximum modularity over the
    removal sequence (modularity measured on the ORIGINAL weighted
    support, igraph semantics).

    Driver-side small-graph kernel (like the DFS visitor).  Returns
    (membership, n_communities, modularity)."""
    und_w = _collapse_undirected(edges, n)
    two_m = 2.0 * sum(und_w.values())
    adj = [set() for _ in range(n)]
    for (a, b) in und_w:
        adj[a].add(b)
        adj[b].add(a)
    best_mem, best_k = _components_of(n, adj)
    best_q = _modularity_of(best_mem, und_w, two_m)
    live = set(und_w)
    while live:
        eb = _edge_betweenness_small(n, adj)
        (a, b) = min(eb, key=lambda k: (-eb[k], k))
        adj[a].discard(b)
        adj[b].discard(a)
        live.discard((a, b))
        mem, k = _components_of(n, adj)
        q = _modularity_of(mem, und_w, two_m)
        if q > best_q + 1e-12:
            best_q, best_mem, best_k = q, mem, k
    # renumber by first appearance in vertex-id order
    remap = {}
    out = np.empty(n, dtype=np.int64)
    for i, c in enumerate(best_mem):
        out[i] = remap.setdefault(int(c), len(remap))
    return out, len(remap), best_q


def community_fastgreedy(
    edges: Dataset | list | pa.Table, n: int,
) -> tuple[np.ndarray, int, float]:
    """CNM greedy modularity agglomeration — reference
    igraph_community_fastgreedy (src/fast_community.c): start from
    singletons, repeatedly merge the community pair with the largest
    modularity gain dQ = 2*(e_ij - a_i*a_j) (tie: lexicographic min
    pair), cut the dendrogram at maximum modularity.

    Driver-side small-graph kernel (sequential heap algorithm in the
    reference too).  Returns (membership, n_communities,
    modularity)."""
    import heapq

    und_w = _collapse_undirected(edges, n)
    m2 = 2.0 * sum(und_w.values())
    if m2 <= 0:
        return np.arange(n, dtype=np.int64), n, 0.0
    # community state: e[ci][cj] = fraction of edge weight between
    # (x2/m2 normalized so dq formula is the standard CNM one)
    e = {i: {} for i in range(n)}
    a = np.zeros(n)
    for (u, v), x in und_w.items():
        e[u][v] = e[u].get(v, 0.0) + x / m2
        e[v][u] = e[v].get(u, 0.0) + x / m2
        a[u] += x / m2
        a[v] += x / m2
    alive = np.ones(n, dtype=bool)
    parent = np.arange(n, dtype=np.int64)  # union-find for output
    heap = []
    for i in e:
        for j, eij in e[i].items():
            if i < j:
                heapq.heappush(
                    heap, (-(2.0 * (eij - a[i] * a[j])), i, j)
                )
    # modularity of the singleton partition: sum(e_ii) - sum(a_i^2);
    # no loops => e_ii = 0
    q = -sum(float(ai) ** 2 for ai in a)
    best_q = q
    merges = []
    cur_q = q
    while heap:
        negdq, i, j = heapq.heappop(heap)
        if not (alive[i] and alive[j]):
            continue
        eij = e[i].get(j, 0.0)
        dq = 2.0 * (eij - a[i] * a[j])
        if -negdq != dq:
            continue  # stale entry — reinsertion happened on merge
        cur_q += dq
        # merge j into i (i < j by construction of pushes below)
        ti, tj = (i, j) if i < j else (j, i)
        alive[tj] = False
        parent[tj] = ti
        for kk, val in e[tj].items():
            if kk == ti or not alive[kk]:
                continue
            e[ti][kk] = e[ti].get(kk, 0.0) + val
            e[kk][ti] = e[ti][kk]
            e[kk].pop(tj, None)
        e[ti].pop(tj, None)
        a[ti] += a[tj]
        merges.append((ti, tj, cur_q))
        if cur_q > best_q + 1e-12:
            best_q = cur_q
        for kk, val in e[ti].items():
            if alive[kk]:
                lo2, hi2 = (ti, kk) if ti < kk else (kk, ti)
                heapq.heappush(
                    heap,
                    (-(2.0 * (val - a[lo2] * a[hi2])), lo2, hi2),
                )
    # replay merges up to the max-modularity prefix (possibly none:
    # singletons can be the optimum)
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cut = -1
    bq = q
    for ii, (_, _, qq) in enumerate(merges):
        if qq > bq + 1e-12:
            bq = qq
            cut = ii
    for ti, tj, _ in merges[:cut + 1]:
        parent[find(tj)] = find(ti)
    mem = np.array([find(v) for v in range(n)], dtype=np.int64)
    remap = {}
    out = np.empty(n, dtype=np.int64)
    for i, c in enumerate(mem):
        out[i] = remap.setdefault(int(c), len(remap))
    return out, len(remap), best_q


def community_walktrap(
    edges: Dataset | list | pa.Table, n: int, steps: int = 4,
) -> tuple[np.ndarray, int, float]:
    """Walktrap — reference igraph_community_walktrap
    (src/walktrap.cpp:73-135; Pons-Latapy, arXiv:physics/0512106).

    t-step random-walk probability rows define the vertex metric
    r2(i,j) = sum_k (Pt[i,k] - Pt[j,k])^2 / d(k); communities start as
    singletons and ADJACENT pairs agglomerate by minimum Ward
    variance increase dsigma(C1,C2) = s1*s2 / ((s1+s2)*n) * r2(C1,C2)
    (walktrap_communities.cpp), with the Lance-Williams update for
    merged neighbors; the dendrogram is cut at maximum modularity
    (same output contract as the reference's membership vector).
    Isolated vertices carry a weight-1 self-loop (walktrap.cpp:88-90
    documents this reference-added semantic).

    Deterministic tie-break: equal dsigma resolves to the smallest
    (cid1, cid2) pair.  Driver-side small-graph kernel (the
    reference's is the original sequential C++; dense P^t is O(n^2)
    memory) — use louvain/lpa/leading_eigenvector at web scale.

    Returns (membership, n_communities, modularity)."""
    import heapq

    und_w = _collapse_undirected(edges, n)
    two_m = 2.0 * sum(und_w.values())
    A = np.zeros((n, n))
    for (a, b), x in und_w.items():
        A[a, b] += x
        A[b, a] += x
    deg = A.sum(axis=1)
    iso = deg == 0.0
    A[iso, iso] = 1.0  # reference: isolated vertex = weight-1 loop
    deg = A.sum(axis=1)
    P = A / deg[:, None]
    Pt = np.linalg.matrix_power(P, steps)
    inv_d = 1.0 / deg

    # community state ------------------------------------------------
    size = {v: 1 for v in range(n)}
    vec = {v: Pt[v] for v in range(n)}          # P^t_{C.}
    degsum = {v: float(deg[v]) for v in range(n)}
    e = {v: {} for v in range(n)}               # inter-community w
    for (a, b), x in und_w.items():
        e[a][b] = e[a].get(b, 0.0) + x
        e[b][a] = e[b].get(a, 0.0) + x

    def dsigma(c1, c2):
        d2 = float(((vec[c1] - vec[c2]) ** 2 * inv_d).sum())
        s1, s2 = size[c1], size[c2]
        return s1 * s2 / ((s1 + s2) * float(n)) * d2

    cur = {}                                     # current valid dsigma
    heap = []
    for c1 in e:
        for c2 in e[c1]:
            if c1 < c2:
                ds = dsigma(c1, c2)
                cur[(c1, c2)] = ds
                heapq.heappush(heap, (ds, c1, c2))

    # modularity tracking (loops excluded, igraph null model)
    if two_m > 0:
        q = -sum((degsum[v] / two_m) ** 2 for v in range(n))
    else:
        q = 0.0
    best_q, merges, cur_q = q, [], q
    alive = np.ones(n, dtype=bool)

    while heap:
        ds, c1, c2 = heapq.heappop(heap)
        if not (alive[c1] and alive[c2]):
            continue
        if cur.get((c1, c2)) != ds:
            continue  # stale
        # merge c2 into c1 (c1 < c2 by construction)
        s1, s2 = size[c1], size[c2]
        w12 = e[c1].get(c2, 0.0)
        if two_m > 0:
            cur_q += 2.0 * w12 / two_m - 2.0 * (
                degsum[c1] * degsum[c2]
            ) / (two_m * two_m)
        vec[c1] = (s1 * vec[c1] + s2 * vec[c2]) / (s1 + s2)
        old_ds = {}
        for c, x in list(e[c2].items()):
            if c == c1 or not alive[c]:
                continue
            old_ds[c] = (cur.get((min(c1, c), max(c1, c))),
                         cur.get((min(c2, c), max(c2, c))))
            e[c1][c] = e[c1].get(c, 0.0) + x
            e[c][c1] = e[c1][c]
            e[c].pop(c2, None)
            cur.pop((min(c2, c), max(c2, c)), None)
        e[c1].pop(c2, None)
        cur.pop((c1, c2), None)
        alive[c2] = False
        size[c1] = s1 + s2
        degsum[c1] += degsum[c2]
        merges.append((c1, c2, cur_q))
        if cur_q > best_q + 1e-12:
            best_q = cur_q
        # refresh dsigma for c1's live neighbors
        for c in e[c1]:
            if not alive[c]:
                continue
            d1, d2 = old_ds.get(c, (cur.get((min(c1, c),
                                             max(c1, c))), None))
            sc = size[c]
            if d1 is not None and d2 is not None:
                # Lance-Williams (both were neighbors)
                nds = ((s1 + sc) * d1 + (s2 + sc) * d2 - sc * ds) / (
                    s1 + s2 + sc
                )
            else:
                nds = dsigma(c1, c)
            key = (min(c1, c), max(c1, c))
            cur[key] = nds
            heapq.heappush(heap, (nds, key[0], key[1]))

    # cut dendrogram at max modularity ------------------------------
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cut, bq = -1, q
    for ii, (_, _, qq) in enumerate(merges):
        if qq > bq + 1e-12:
            bq, cut = qq, ii
    for ti, tj, _ in merges[:cut + 1]:
        parent[find(tj)] = find(ti)
    mem = np.array([find(v) for v in range(n)], dtype=np.int64)
    remap = {}
    out = np.empty(n, dtype=np.int64)
    for i, c in enumerate(mem):
        out[i] = remap.setdefault(int(c), len(remap))
    return out, len(remap), max(best_q, q)


# -- infomap (map equation) ---------------------------------------------------


def _plogp(x: float) -> float:
    return x * np.log2(x) if x > 0.0 else 0.0


def _infomap_sweep(adj, p, two_m):
    """One level of greedy map-equation minimization: sequential
    vertex sweeps in id order (deterministic stand-in for the
    reference's RNG-ordered sweeps), each vertex moving to the
    neighboring module (or a fresh one) that most decreases the
    two-level codelength; repeat until a full sweep makes no move.
    `adj` = list of {nbr: weight} (loop-free), `p` = visit rates.
    Returns (membership ndarray, n_modules)."""
    nn = len(p)
    mem = np.arange(nn, dtype=np.int64)
    sext = np.array([sum(d.values()) for d in adj])
    mod_p = p.astype(np.float64).copy()
    mod_cut = sext.copy().astype(np.float64)
    count = [1] * nn
    q_tot = float(mod_cut.sum()) / two_m

    def terms(q, pp):
        return _plogp(q + pp) - 2.0 * _plogp(q)

    moved = True
    while moved:
        moved = False
        for v in range(nn):
            a = int(mem[v])
            k_vm = {}
            for u, w in adj[v].items():
                k_vm[int(mem[u])] = k_vm.get(int(mem[u]), 0.0) + w
            cut_a2 = mod_cut[a] - sext[v] + 2.0 * k_vm.get(a, 0.0)
            p_a2 = mod_p[a] - p[v]
            qa, qa2 = mod_cut[a] / two_m, cut_a2 / two_m
            base_a = terms(qa2, p_a2) - terms(qa, mod_p[a])
            # candidate target modules: neighbors' + one fresh module
            cands = sorted(c for c in k_vm if c != a)
            if count[a] > 1:
                fresh = next(
                    (i for i in range(nn) if count[i] == 0), None
                )
                if fresh is not None:
                    cands.append(fresh)
            best, best_dl = a, -1e-12
            for b in cands:
                k_vb = k_vm.get(b, 0.0)
                cut_b2 = mod_cut[b] + sext[v] - 2.0 * k_vb
                qb, qb2 = mod_cut[b] / two_m, cut_b2 / two_m
                q_tot2 = q_tot + (qa2 - qa) + (qb2 - qb)
                dl = (
                    _plogp(q_tot2) - _plogp(q_tot)
                    + base_a
                    + terms(qb2, mod_p[b] + p[v])
                    - terms(qb, mod_p[b])
                )
                if dl < best_dl - 1e-15:
                    best, best_dl = b, dl
            if best != a:
                b = best
                k_vb = k_vm.get(b, 0.0)
                q_tot += (cut_a2 - mod_cut[a]) / two_m
                mod_cut[a] = cut_a2
                mod_p[a] = p_a2
                nc = mod_cut[b] + sext[v] - 2.0 * k_vb
                q_tot += (nc - mod_cut[b]) / two_m
                mod_cut[b] = nc
                mod_p[b] += p[v]
                mem[v] = b
                count[a] -= 1
                count[b] += 1
                moved = True
    _, inv = np.unique(mem, return_inverse=True)
    return inv.astype(np.int64), int(inv.max()) + 1 if nn else 0


def community_infomap(
    edges: Dataset | list | pa.Table, n: int,
) -> tuple[np.ndarray, int, float]:
    """Two-level map-equation partition — reference
    igraph_community_infomap (src/infomap.cc:42-231,
    src/infomap_Greedy.cc; Rosvall-Bergstrom PNAS 105(4) 2008).

    Pinned divergence (like pagerank power-iteration vs PRPACK): the
    reference runs nb_trials stochastic greedy trials with RNG vertex
    orders and keeps the best; this kernel is the deterministic
    variant — undirected flow p_v = s_v / 2m, id-ordered greedy
    sweeps minimizing L(M) = plogp(q_tot) - 2*sum plogp(q_m)
    + sum plogp(q_m + p_m) - sum plogp(p_v) (the standard two-level
    implementation form), with Louvain-style module contraction
    between sweep rounds.  Loops are dropped (they never change which
    module minimizes L).  Driver-side small-graph kernel.

    Returns (membership, n_communities, codelength_bits)."""
    und_w = _collapse_undirected(edges, n)
    two_m = 2.0 * sum(und_w.values())
    node_term = 0.0
    if two_m <= 0:
        return np.arange(n, dtype=np.int64), n, 0.0
    adj = [dict() for _ in range(n)]
    strength = np.zeros(n)
    for (a, b), x in und_w.items():
        adj[a][b] = adj[a].get(b, 0.0) + x
        adj[b][a] = adj[b].get(a, 0.0) + x
        strength[a] += x
        strength[b] += x
    p = strength / two_m
    node_term = -sum(_plogp(x) for x in p)

    cur_adj, cur_p = adj, p
    vmap = np.arange(n, dtype=np.int64)
    while True:
        mem, k = _infomap_sweep(cur_adj, cur_p, two_m)
        if k == len(cur_p):
            break
        vmap = mem[vmap]
        new_adj = [dict() for _ in range(k)]
        new_p = np.zeros(k)
        for u, d in enumerate(cur_adj):
            mu = int(mem[u])
            new_p[mu] += cur_p[u]
            for vtx, w in d.items():
                mv = int(mem[vtx])
                if mu != mv:
                    new_adj[mu][mv] = new_adj[mu].get(mv, 0.0) + w
        cur_adj, cur_p = new_adj, new_p

    # final codelength from the node-level partition
    kfin = len(cur_p)
    mod_p = np.zeros(kfin)
    mod_cut = np.zeros(kfin)
    for v in range(n):
        mod_p[vmap[v]] += p[v]
    for (a, b), x in und_w.items():
        if vmap[a] != vmap[b]:
            mod_cut[vmap[a]] += x
            mod_cut[vmap[b]] += x
    q = mod_cut / two_m
    L = (
        _plogp(float(q.sum()))
        - 2.0 * sum(_plogp(x) for x in q)
        + sum(_plogp(a + b) for a, b in zip(q, mod_p))
        + node_term
    )
    # renumber by first appearance in vertex-id order
    remap = {}
    out = np.empty(n, dtype=np.int64)
    for i, c in enumerate(vmap.tolist()):
        out[i] = remap.setdefault(int(c), len(remap))
    return out, len(remap), float(L)


def community_optimal_modularity(
    edges: Dataset | list | pa.Table, n: int,
) -> tuple[np.ndarray, int, float]:
    """Exact maximum-modularity partition — reference
    igraph_community_optimal_modularity (src/optimal_modularity.c:46-
    270, GLPK integer program; the reference itself warns it is only
    feasible for small graphs).  This kernel replaces the ILP with an
    exact partition DP over vertex subsets: best[S] = max over blocks
    T with lowest-bit(S) in T of Q(T) + best[S \\ T] — O(3^n) block
    splits, guarded to n <= 16.  Q is additive over communities
    (Q(T) = 2*intra(T)/2m - (deg(T)/2m)^2 on the collapsed undirected
    support, loops dropped like the other community kernels).

    Returns (membership, n_communities, modularity)."""
    if n > 16:
        raise ValueError(
            "community_optimal_modularity is exact and exponential; "
            f"n={n} > 16 (reference's GLPK ILP has the same "
            "small-graph scope) — use louvain/fastgreedy instead"
        )
    und_w = _collapse_undirected(edges, n)
    two_m = 2.0 * sum(und_w.values())
    if two_m <= 0:
        return np.arange(n, dtype=np.int64), n, 0.0
    full = 1 << n
    # cross[v][mask] = total weight between v and the mask's vertices
    wmat = np.zeros((n, n))
    for (a, b), x in und_w.items():
        wmat[a, b] += x
        wmat[b, a] += x
    cross = np.zeros((n, full))
    for v in range(n):
        arr = np.zeros(full)
        for u in range(n):
            if wmat[v, u]:
                arr[1 << u] = wmat[v, u]
        for b in range(n):
            bit = 1 << b
            idx = np.arange(full)
            has = (idx & bit).astype(bool)
            arr[has] += arr[idx[has] ^ bit]
        cross[v] = arr
    deg = wmat.sum(axis=1)
    degsum = np.zeros(full)
    intra = np.zeros(full)
    low = np.zeros(full, dtype=np.int64)
    for mask in range(1, full):
        v = (mask & -mask).bit_length() - 1
        low[mask] = v
        rest = mask ^ (1 << v)
        degsum[mask] = degsum[rest] + deg[v]
        intra[mask] = intra[rest] + cross[v][rest]
    q1 = 2.0 * intra / two_m - (degsum / two_m) ** 2
    best = np.full(full, -np.inf)
    choice = np.zeros(full, dtype=np.int64)
    best[0] = 0.0
    for mask in range(1, full):
        lb = 1 << int(low[mask])
        sub = mask
        bm, bc, bpc = -np.inf, 0, 0
        while sub:
            if sub & lb:
                cand = q1[sub] + best[mask ^ sub]
                pc = bin(sub).count("1")
                # tie-break toward smaller blocks: zero-degree
                # vertices stay singletons instead of being absorbed
                if cand > bm or (cand == bm and pc < bpc):
                    bm, bc, bpc = cand, sub, pc
            sub = (sub - 1) & mask
        best[mask] = bm
        choice[mask] = bc
    mem = np.empty(n, dtype=np.int64)
    mask, cid = full - 1, 0
    while mask:
        blk = int(choice[mask])
        for v in range(n):
            if blk & (1 << v):
                mem[v] = cid
        cid += 1
        mask ^= blk
    remap = {}
    out = np.empty(n, dtype=np.int64)
    for i, c in enumerate(mem.tolist()):
        out[i] = remap.setdefault(int(c), len(remap))
    return out, len(remap), float(best[full - 1])


def _reindex(m: np.ndarray) -> np.ndarray:
    _, inv = np.unique(np.asarray(m, np.int64), return_inverse=True)
    return inv


def _confusion(c1: np.ndarray, c2: np.ndarray):
    k2 = int(c2.max()) + 1
    key = c1.astype(np.int64) * k2 + c2
    uk, cnt = np.unique(key, return_counts=True)
    return uk // k2, uk % k2, cnt.astype(np.float64)


def split_join_distance(
    comm1: np.ndarray, comm2: np.ndarray,
) -> tuple[int, int]:
    """igraph_split_join_distance (src/community.c:3177, van Dongen
    2000): d(a->b) = n - sum_i max_j n(i,j); returns both
    directions."""
    c1, c2 = _reindex(comm1), _reindex(comm2)
    n = len(c1)
    ri, ci, cnt = _confusion(c1, c2)
    d12 = n - sum(
        int(cnt[ri == i].max()) for i in range(int(c1.max()) + 1)
    )
    d21 = n - sum(
        int(cnt[ci == j].max()) for j in range(int(c2.max()) + 1)
    )
    return d12, d21


def compare_communities(
    comm1: np.ndarray, comm2: np.ndarray, method: str = "vi",
) -> float:
    """igraph_compare_communities (src/community.c:3062): vi (Meila),
    nmi (Danon), split-join (summed both directions), rand,
    adjusted_rand — exact replay of the reference formulas over the
    sparse confusion matrix."""
    c1, c2 = _reindex(comm1), _reindex(comm2)
    n = float(len(c1))
    if method == "split-join":
        d12, d21 = split_join_distance(c1, c2)
        return float(d12 + d21)
    ri, ci, cnt = _confusion(c1, c2)
    if method in ("vi", "nmi"):
        p1 = np.bincount(c1) / n
        p2 = np.bincount(c2) / n
        h1 = float(-(p1 * np.log(p1, where=p1 > 0,
                                 out=np.zeros_like(p1))).sum())
        h2 = float(-(p2 * np.log(p2, where=p2 > 0,
                                 out=np.zeros_like(p2))).sum())
        p = cnt / n
        mut = float(
            (p * (np.log(p) - np.log(p1[ri]) - np.log(p2[ci]))).sum()
        )
        if method == "vi":
            return h1 + h2 - 2.0 * mut
        return 1.0 if h1 == 0 and h2 == 0 else 2.0 * mut / (h1 + h2)
    if method in ("rand", "adjusted_rand"):
        if n < 2:
            raise ValueError("rand indices need at least two vertices")
        r = float(((cnt / n) * (cnt - 1.0) / (n - 1.0)).sum())
        rs = np.bincount(ri, weights=cnt)
        cs = np.bincount(ci, weights=cnt)
        f1 = float(((rs / n) * (rs - 1.0) / (n - 1.0)).sum())
        f2 = float(((cs / n) * (cs - 1.0) / (n - 1.0)).sum())
        rand = 1.0 + 2.0 * r - f1 - f2
        if method == "rand":
            return rand
        expected = f1 * f2 + (1.0 - f1) * (1.0 - f2)
        return (rand - expected) / (1.0 - expected)
    raise ValueError(f"unknown method {method!r}")


# -- dendrogram / membership helpers -----------------------------------------


def community_to_membership(merges, nodes: int, steps: int):
    """(membership, csize) after ``steps`` rows of a merge matrix
    (igraph_community_to_membership, src/community.c:60-135 —
    mirrored exactly: components numbered by reverse merge-row
    discovery, then singletons in vertex order)."""
    merges = np.asarray(merges, dtype=np.int64).reshape(-1, 2)
    if steps > len(merges):
        raise ValueError("steps too big or merges matrix too short")
    membership = np.zeros(nodes, dtype=np.int64)
    csize = np.zeros(nodes - steps, dtype=np.int64)
    tmp = np.zeros(steps, dtype=np.int64)
    found = 0
    for i in range(steps - 1, -1, -1):
        c1, c2 = int(merges[i, 0]), int(merges[i, 1])
        if tmp[i] == 0:
            found += 1
            tmp[i] = found
        for c in (c1, c2):
            if c < nodes:
                cid = tmp[i] - 1
                membership[c] = cid + 1
                csize[cid] += 1
            else:
                tmp[c - nodes] = tmp[i]
    for v in range(nodes):
        t = membership[v]
        if t != 0:
            membership[v] = t - 1
        else:
            csize[found] += 1
            membership[v] = found
            found += 1
    return membership, csize


def reindex_membership(membership):
    """(new membership 0..k-1, new_to_old) — new ids assigned by
    ASCENDING old community id (igraph_reindex_membership,
    src/community.c:1008)."""
    membership = np.asarray(membership, dtype=np.int64)
    if len(membership) == 0:
        return membership.copy(), np.empty(0, dtype=np.int64)
    new_to_old = np.unique(membership)
    remap = {int(o): i for i, o in enumerate(new_to_old)}
    return (np.array([remap[int(m)] for m in membership],
                     dtype=np.int64), new_to_old)


def eb_get_merges(edges_removed, n: int, n_components: int = 1):
    """(merges matrix, bridges) from an edge-betweenness REMOVAL
    order, processed in reverse as agglomerations
    (igraph_community_eb_get_merges, src/community.c:140-210 —
    pointer-chase union with merge ids n+step; bridges are the
    1-based removal indices that merged two components).
    ``edges_removed``: (u, v) pairs in removal order."""
    ptr = np.zeros(2 * n - 1, dtype=np.int64)
    merges = []
    bridges = []
    midx = 0
    for i in range(len(edges_removed) - 1, -1, -1):
        u, v = edges_removed[i]

        def find(x: int) -> int:
            idx = x + 1
            while ptr[idx - 1] != 0:
                idx = ptr[idx - 1]
            return idx - 1

        c1, c2 = find(int(u)), find(int(v))
        if c1 != c2:
            merges.append((c1, c2))
            bridges.append(i + 1)
            ptr[c1] = n + midx + 1
            ptr[c2] = n + midx + 1
            ptr[int(u)] = n + midx + 1
            ptr[int(v)] = n + midx + 1
            midx += 1
    want = n - n_components
    if midx != want:
        raise ValueError(
            f"eb_get_merges: removal order produced {midx} merges, "
            f"expected {want} for {n_components} component(s)")
    return (np.asarray(merges, dtype=np.int64).reshape(-1, 2),
            np.asarray(bridges, dtype=np.int64))


# -- spinglass (Reichardt-Bornholdt Potts annealing) -------------------------


def spinglass(
    edges, n: int, spins: int = 25, gamma: float = 1.0,
    starttemp: float = 1.0, stoptemp: float = 0.01,
    coolfact: float = 0.99, sweeps: int = 50, seed: int = 42,
    P: int = 8,
) -> dict:
    """Reichardt-Bornholdt spinglass community detection
    (igraph_community_spinglass, src/clustertool.cpp:188-352 +
    src/pottsmodel_2.cpp:765-900, the 'config' / Newman-modularity
    update rule): sequential heat-bath sweeps over a Potts model with
    ``spins`` states, energy difference for moving v from spin r to s

        dE = w(v, r) - w(v, s) + gamma * (d_v / 2m)
                         * (D_s - (D_r - d_v))

    (w(v, x) = weight to neighbors in spin x, D_x = total degree in
    spin x — pottsmodel_2.cpp:846-848), annealed from ``starttemp``
    by ``coolfact`` per round until ``stoptemp`` or <1% acceptance.
    PINNED DIVERGENCES: seeded numpy RNG replaces igraph's stream
    (results are deterministic per seed, unlike the reference), and
    the starting temperature is ``starttemp`` directly instead of
    FindStartTemp's acceptance probe.  Driver small-graph kernel like
    the reference's own sequential implementation.

    Returns {"membership" (renumbered by first appearance),
    "modularity", "temperature", "runs"}."""
    from .separators import collapse_support

    adj_sets = collapse_support(edges, n, P=P)
    adj = [np.fromiter(sorted(s), dtype=np.int64, count=len(s))
           for s in adj_sets]
    deg = np.array([len(a) for a in adj], dtype=np.float64)
    two_m = float(deg.sum())
    if two_m == 0:
        return {"membership": np.zeros(n, dtype=np.int64),
                "modularity": 0.0, "temperature": stoptemp, "runs": 0}
    rng = np.random.default_rng(seed)
    q = int(spins)
    sigma = rng.integers(0, q, size=n)
    color_field = np.bincount(sigma, weights=deg, minlength=q)

    kT = float(starttemp)
    runs = 0
    acc_target = (1.0 - 1.0 / q) * 0.01
    while kT / stoptemp > 1.0:
        runs += 1
        kT *= coolfact
        beta = 1.0 / kT
        accepted = 0
        total = 0
        for _ in range(sweeps):
            order = rng.integers(0, n, size=n)  # the reference draws
            # a random vertex per step, not a permutation
            for v in order.tolist():
                old = int(sigma[v])
                nbr_w = np.bincount(sigma[adj[v]], minlength=q) \
                    .astype(np.float64)
                h = color_field - (color_field[old] - deg[v])
                w = nbr_w[old] - nbr_w + gamma * (deg[v] / two_m) * h
                w[old] = 0.0
                w -= w.min()
                p = np.exp(-beta * w)
                new = int(rng.choice(q, p=p / p.sum()))
                total += 1
                if new != old:
                    accepted += 1
                    sigma[v] = new
                    color_field[old] -= deg[v]
                    color_field[new] += deg[v]
        if total and accepted / total < acc_target:
            break

    # renumber by first appearance in vertex order (engine precedent)
    remap: dict[int, int] = {}
    membership = np.empty(n, dtype=np.int64)
    for v in range(n):
        s = int(sigma[v])
        if s not in remap:
            remap[s] = len(remap)
        membership[v] = remap[s]
    # modularity of the result on the collapsed support
    mod = 0.0
    for v in range(n):
        mod += (membership[adj[v]] == membership[v]).sum()
    mod /= two_m
    for c in range(len(remap)):
        dc = float(deg[membership == c].sum())
        mod -= (dc / two_m) ** 2
    return {"membership": membership, "modularity": float(mod),
            "temperature": kT, "runs": runs}


def spinglass_single(
    edges, n: int, vertex: int, spins: int = 25, gamma: float = 1.0,
    P: int = 8, max_steps: int | None = None,
) -> dict:
    """Community of a single vertex without clustering the whole graph
    (igraph_community_spinglass_single, src/clustertool.cpp:427 ->
    PottsModel::FindCommunityFromStart, src/pottsmodel_2.cpp:918-1170).

    Deterministic greedy affinity growth — the reference's RNG_BEGIN
    wrapper is vestigial; FindCommunityFromStart draws no random
    numbers.  Start from {vertex} + N(vertex); each step scans the
    frontier (``to_do``) for the best ADD (delta = aff_r - aff_s <= 0,
    ties to the LAST scanned candidate — the reference's ``<=``) and
    the community for a strictly better REMOVE (delta < best add),
    where for node weight d, community degree-mass Ks and rest Kr:

        add:    aff_r = kir - g/T*(Kr-d)*d,  aff_s = kis - g/T*Ks*d
        remove: aff_r = kir - g/T*Kr*d,      aff_s = kis - g/T*(Ks-d)*d

    (kis/kir = weight to community/rest, T = total degree sum = 2W,
    pottsmodel_2.cpp:1031-1036, 1073-1077 — the ``config`` null model;
    the ``update_rule`` argument is validated but unused by the
    reference's kernel, mirrored here.)  Stops when neither an add nor
    a remove improves; returns cohesion = inner - g/T*Ks^2/2 and
    adhesion = outer - g/T*Ks*Kr with inner/outer truncated to int
    exactly like the C's igraph_integer_t stores.

    PINNED DIVERGENCES (documented, result-identical on untied
    affinities): runs on the collapsed simple support — the undirected
    edge weight is the per-orientation weight sum, max'd across the
    two orientations (so the engine's symmetric arc lists and
    one-sided edge lists both yield the logical weight; parallel
    same-direction rows sum), self-loops dropped (the reference pushes
    duplicate list entries and double-counts Ks on multigraphs — a
    bookkeeping bug we do not mirror); list tie-break order is
    vertex-id-sorted adjacency instead of edge-insertion order.  Like
    the reference's own sequential kernel this is a driver-side
    local-region scan — the one distributed pass is the support
    collapse.

    Returns {"community" (vids, discovery order), "size", "cohesion",
    "adhesion", "inner_links", "outer_links"}."""
    if spins < 2 or spins > 500:
        raise ValueError("Invalid number of spins")  # clustertool.cpp:448
    if gamma < 0.0:
        raise ValueError("Invalid gamma value")
    if not (0 <= vertex < n):
        raise ValueError("Invalid vertex id")
    if isinstance(edges, pa.Table):
        tables = [edges]
    elif isinstance(edges, list):
        tables = ray.get(edges)
    else:
        tables = ray.get(block_refs(edges))
    dirw: dict[tuple[int, int], float] = {}
    for t in tables:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        ww = (t["weight"].to_numpy().astype(np.float64)
              if "weight" in t.column_names else np.ones(len(t)))
        keep = s != d
        for a, b, x in zip(s[keep].tolist(), d[keep].tolist(),
                           ww[keep].tolist()):
            dirw[(a, b)] = dirw.get((a, b), 0.0) + x
    w: dict[tuple[int, int], float] = {}
    for (a, b), x in dirw.items():
        key = (a, b) if a < b else (b, a)
        w[key] = max(w.get(key, 0.0), x)
    adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for (a, b), x in w.items():
        adj[a].append((b, float(x)))
        adj[b].append((a, float(x)))
    for lst in adj:
        lst.sort()
    deg = np.zeros(n, dtype=np.float64)
    for v in range(n):
        deg[v] = sum(x for _, x in adj[v])
    T = float(deg.sum())
    if n <= 1 or T == 0.0:
        if n > 1:  # isolated vertices -> unconnected, like the C
            raise ValueError("Cannot work with unconnected graph")
        return {"community": np.array([vertex], dtype=np.int64),
                "size": 1, "cohesion": 0.0, "adhesion": 0.0,
                "inner_links": 0, "outer_links": 0}
    # weak-connectivity gate (clustertool.cpp:470-474)
    seen = np.zeros(n, dtype=bool)
    stack = [0]
    seen[0] = True
    while stack:
        u = stack.pop()
        for nb, _ in adj[u]:
            if not seen[nb]:
                seen[nb] = True
                stack.append(nb)
    if not seen.all():
        raise ValueError("Cannot work with unconnected graph")

    NONE, COMM, TODO = 0, 1, 2
    marker = np.zeros(n, dtype=np.int8)
    community: list[int] = [vertex]
    marker[vertex] = COMM
    Ks = float(deg[vertex])
    Kr = T - Ks
    for nb, _ in adj[vertex]:
        community.append(nb)
        marker[nb] = COMM
        Ks += deg[nb]
        Kr -= deg[nb]
    to_do: list[int] = []
    for node in community:
        for nb, _ in adj[node]:
            if marker[nb] != COMM and marker[nb] != TODO:
                to_do.append(nb)
                marker[nb] = TODO

    def _ks(node: int) -> tuple[float, float]:
        kis = kir = 0.0
        for nb, x in adj[node]:
            if marker[nb] == COMM:
                kis += x
            else:
                kir += x
        return kis, kir

    inner = outer = 0.0
    add = remove = True
    steps = 0
    cap = max_steps if max_steps is not None else 100 * n + 10_000
    while add or remove:
        steps += 1
        if steps > cap:
            raise RuntimeError(
                f"spinglass_single: no fixed point after {cap} "
                f"add/remove steps (oscillating affinities) — the "
                f"reference loops forever here; raise max_steps to "
                f"push further")
        max_delta = 0.0
        best = -1
        add = False
        for node in to_do:
            d = float(deg[node])
            kis, kir = _ks(node)
            aff_r = kir - gamma / T * (Kr - d) * d
            aff_s = kis - gamma / T * Ks * d
            if aff_r - aff_s <= max_delta:
                max_delta = aff_r - aff_s
                best = node
                add = True
        inner = outer = 0.0
        remove = False
        for node in community:
            d = float(deg[node])
            kis, kir = _ks(node)
            inner += kis
            outer += kir
            aff_r = kir - gamma / T * Kr * d
            aff_s = kis - gamma / T * (Ks - d) * d
            if aff_s - aff_r < max_delta:
                max_delta = aff_s - aff_r
                best = node
                remove = True
                add = False
        inner *= 0.5
        if add:
            community.append(best)
            marker[best] = COMM
            to_do.remove(best)
            Ks += deg[best]
            Kr -= deg[best]
            for nb, _ in adj[best]:
                if marker[nb] != COMM and marker[nb] != TODO:
                    to_do.append(nb)
                    marker[nb] = TODO
        if remove:
            community.remove(best)
            marker[best] = TODO
            Ks -= deg[best]
            Kr += deg[best]
            to_do.append(best)
    return {
        "community": np.array(community, dtype=np.int64),
        "size": len(community),
        "cohesion": float(inner - gamma / T * Ks * Ks * 0.5),
        "adhesion": float(outer - gamma / T * Ks * Kr),
        "inner_links": int(inner),
        "outer_links": int(outer),
    }


def spinglass_negative(
    edges, n: int, spins: int = 25, gamma: float = 1.0,
    gamma_minus: float = 1.0, starttemp: float = 1.0,
    stoptemp: float = 0.01, coolfact: float = 0.99,
    sweeps: int = 50, seed: int = 42,
) -> dict:
    """Spinglass community detection with negative links
    (igraph_i_community_spinglass_negative, src/clustertool.cpp:536 ->
    PottsModelN, src/pottsmodel_2.cpp:1589-2030; Traag & Bruggeman
    2009): heat-bath sweeps where a positive edge rewards and a
    negative edge penalizes co-membership.  Per candidate spin s, the
    gain over the current spin ``old`` of vertex v is

        (nbr[s] - exp[s]) - (nbr[old] - exp[old]),
        nbr[s] = signed weight of v's links into spin s,
        exp[s] = gamma * d+_v/m+ * D+_s - gamma_minus * d-_v/m- * D-_s

    (pottsmodel_2.cpp:1901-1931; for the old spin the community
    totals exclude v itself), annealed from ``starttemp`` by
    ``coolfact`` until ``stoptemp`` or acceptance < (1-1/q)*0.001.
    Undirected only (the reference's directed branch doubles the
    expectation terms; web link graphs are symmetrized upstream).

    PINNED DIVERGENCES (same as :func:`spinglass`): seeded numpy RNG
    replaces igraph's stream and the start temperature is
    ``starttemp`` directly instead of FindStartTemp's 95%-acceptance
    probe; parallel edges are pre-summed and loops dropped
    (_collapse_undirected — all heat-bath quantities are linear in w,
    so summing is exact; the reference ignores loops in the null
    model too).

    Returns {"membership" (first-appearance renumbering),
    "modularity" (signed: 2Q/(m+ + m-), WriteClusters
    pottsmodel_2.cpp:2196-2285), "temperature", "runs"}."""
    und_w = _collapse_undirected(edges, n)
    adj_v: list[list[int]] = [[] for _ in range(n)]
    adj_w: list[list[float]] = [[] for _ in range(n)]
    dpos = np.zeros(n)
    dneg = np.zeros(n)
    for (a, b), x in und_w.items():
        adj_v[a].append(b)
        adj_w[a].append(x)
        adj_v[b].append(a)
        adj_w[b].append(x)
        if x > 0:
            dpos[a] += x
            dpos[b] += x
        else:
            dneg[a] -= x
            dneg[b] -= x
    adj = [np.array(v, dtype=np.int64) for v in adj_v]
    adjw = [np.array(w, dtype=np.float64) for w in adj_w]
    m_p = float(dpos.sum())   # = 2 * total positive weight
    m_n = float(dneg.sum())
    if m_p + m_n == 0:
        return {"membership": np.zeros(n, dtype=np.int64),
                "modularity": 0.0, "temperature": stoptemp, "runs": 0}
    # HeatBathLookup clamps both totals away from zero
    # (pottsmodel_2.cpp:1843-1847)
    m_pt = m_p if m_p >= 0.001 else 1.0
    m_nt = m_n if m_n >= 0.001 else 1.0

    rng = np.random.default_rng(seed)
    q = int(spins)
    sigma = rng.integers(0, q, size=n)
    Dpos = np.bincount(sigma, weights=dpos, minlength=q)
    Dneg = np.bincount(sigma, weights=dneg, minlength=q)

    kT = float(starttemp)
    runs = 0
    acc_stop = (1.0 - 1.0 / q) * 0.001
    while kT / stoptemp > 1.0:
        runs += 1
        kT *= coolfact
        beta = 1.0 / kT
        changes = 0
        for _ in range(sweeps):
            for v in rng.integers(0, n, size=n).tolist():
                old = int(sigma[v])
                nbr = np.zeros(q)
                np.add.at(nbr, sigma[adj[v]], adjw[v])
                kp = gamma * dpos[v] / m_pt
                kn = gamma_minus * dneg[v] / m_nt
                exp_s = kp * Dpos - kn * Dneg
                exp_old = (kp * (Dpos[old] - dpos[v])
                           - kn * (Dneg[old] - dneg[v]))
                w = (nbr - exp_s) - (nbr[old] - exp_old)
                w[old] = 0.0
                mx = max(float(w.max()), 0.0)   # maxweight starts at 0
                p = np.exp(beta * (w - mx))
                new = int(rng.choice(q, p=p / p.sum()))
                if new != old:
                    changes += 1
                    sigma[v] = new
                    Dpos[old] -= dpos[v]
                    Dpos[new] += dpos[v]
                    Dneg[old] -= dneg[v]
                    Dneg[new] += dneg[v]
        if changes / (n * sweeps) < acc_stop:
            break

    remap: dict[int, int] = {}
    membership = np.empty(n, dtype=np.int64)
    for v in range(n):
        s = int(sigma[v])
        if s not in remap:
            remap[s] = len(remap)
        membership[v] = remap[s]

    # signed modularity: Q = sum_c [ (w+_cc - w-_cc)
    #   - (D+_c^2/(2 m+) - D-_c^2/(2 m-)) ], result 2Q/(m+ + m-)
    nc = len(remap)
    ipos = np.zeros(nc)
    ineg = np.zeros(nc)
    for (a, b), x in und_w.items():
        if membership[a] == membership[b]:
            if x > 0:
                ipos[membership[a]] += x
            else:
                ineg[membership[a]] -= x
    Cpos = np.bincount(membership, weights=dpos, minlength=nc)
    Cneg = np.bincount(membership, weights=dneg, minlength=nc)
    Q = float(
        (ipos - ineg).sum()
        - (Cpos ** 2).sum() / (2 * m_p if m_p else 1.0)
        + (Cneg ** 2).sum() / (2 * m_n if m_n else 1.0)
    )
    return {"membership": membership,
            "modularity": 2.0 * Q / (m_p + m_n),
            "temperature": kT, "runs": runs}
