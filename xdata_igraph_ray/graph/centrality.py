"""Spectral centralities on the matvec harness (reference
igraph_eigenvector_centrality src/centrality.c:543, hub/authority
scores — Kleinberg HITS — src/centrality.c:840,886; the reference
solves with ARPACK, we power-iterate to ``tol``, same fixed point up
to scaling).

Conventions match igraph: eigenvector centrality of v sums the
centrality of its IN-neighbors (directed; undirected graphs should be
symmetrized first); multi-edges count multiply; result scaled so
max = 1 (igraph scale=True default).  HITS: authority = A^T hub,
hub = A authority, each normalized per iteration.
"""

from __future__ import annotations

import numpy as np
import ray

from .engine import GraphEngine


def _matvec(engine: GraphEngine, in_key: str, out_key: str,
            direction: str, weighted: bool) -> dict:
    outs = engine.scatter("mv_scatter", in_key, direction, weighted)
    stats = ray.get([
        s.mv_gather.remote(out_key, *engine.pieces(outs, q))
        for q, s in enumerate(engine.shards)
    ])
    return {
        "max": max(s["max"] for s in stats),
        "sum": sum(s["sum"] for s in stats),
    }


def eigenvector_centrality(
    engine: GraphEngine,
    weighted: bool = False,
    tol: float = 1e-10,
    max_iter: int = 1000,
) -> dict:
    """Scores in state ``ev`` (max-normalized)."""
    ray.get([
        s.set_state.remote(ev=(np.float64, 1.0)) for s in engine.shards
    ])
    it = 0
    delta = float("inf")
    while it < max_iter and delta > tol:
        agg = _matvec(engine, "ev", "ev", "fwd", weighted)
        denom = agg["max"]
        if denom == 0:
            break  # no edges: uniform centrality
        deltas = ray.get([
            s.mv_scale_delta.remote("ev", "_ev_prev", denom)
            for s in engine.shards
        ])
        delta = max(deltas)
        it += 1
    return {"iterations": it, "delta": delta}


def _ms_waves(engine: GraphEngine, sources, wave: int):
    src = np.asarray(sources, dtype=np.int64)
    for i in range(0, len(src), wave):
        yield src[i:i + wave]


def _ms_forward(engine: GraphEngine, wave_sources,
                max_level: int | None = None,
                direction: str = "fwd") -> int:
    """Level-synchronous multi-source BFS with path counting; returns
    the deepest assigned level (bounded by ``max_level``).
    ``direction``: "fwd" (out-edges), "rev" (in-edges), "und"
    (undirected view — lazily-built union CSR on the shards)."""
    shards = engine.shards
    ray.get([s.ms_init.remote(wave_sources) for s in shards])
    # stop-check every 4 levels: the frontier is monotone (a level that
    # assigns nothing leaves every later level empty), so overshoot
    # levels are exact no-ops and the backward pass tolerates them
    # (empty masks); the per-level ray.get was a driver stall x BFS
    # depth (43 levels on the power-law bench graph)
    level = 0
    while max_level is None or level < max_level:
        batch = []
        for _ in range(4):
            if max_level is not None and level + len(batch) >= max_level:
                break
            outs = engine.scatter(
                "ms_fwd_scatter", level + len(batch), direction)
            batch.append([
                shards[q].ms_fwd_gather.remote(
                    level + len(batch), *engine.pieces(outs, q),
                    direction=direction,
                )
                for q in range(engine.P)
            ])
        if not batch:
            break
        per_level = [sum(ray.get(refs)) for refs in batch]
        done = False
        for newly in per_level:
            if newly == 0:
                done = True
                break
            level += 1
        if done:
            break
    return level


_MODE_DIR = {"out": "fwd", "in": "rev", "all": "und"}


def betweenness(
    engine: GraphEngine,
    sources=None,
    wave: int = 64,
    cutoff: int | None = None,
) -> np.ndarray:
    """Vertex betweenness (Brandes, reference igraph_betweenness
    src/centrality.c:1569): multi-source batched BFS waves — forward
    sigma counting, then per-level backward dependency accumulation.
    ``sources=None`` runs every vertex (exact); a sampled source list
    gives a sampled approximation.  ``cutoff`` bounds the considered
    path LENGTH — igraph_betweenness_estimate's exact semantics
    (src/centrality.c:1792; None or negative = no bound).  Directed
    out-paths; run on the simplified graph (multi-edges would
    multiply path counts)."""
    if cutoff is not None and cutoff < 0:
        cutoff = None
    shards = engine.shards
    ray.get([s.set_state.remote(bc=(np.float64, 0.0)) for s in shards])
    if sources is None:
        sources = np.arange(engine.n)
    for ws in _ms_waves(engine, sources, wave):
        maxlevel = _ms_forward(engine, ws, max_level=cutoff)
        # the whole backward sweep is one submitted DAG: per-actor
        # submission order serializes scatter(lev) -> gather(lev) ->
        # scatter(lev-1) on every shard, and cross-shard deps ride the
        # refs — the driver needs nothing per level, so the per-level
        # ray.get was a pure stall (43 levels x RTT on the bench graph)
        gathers = []
        for lev in range(maxlevel, 0, -1):
            outs = engine.scatter("ms_bwd_scatter", lev)
            gathers += [
                shards[q].ms_bwd_gather.remote(lev, *engine.pieces(outs, q))
                for q in range(engine.P)
            ]
        ray.get(gathers)  # one barrier for the whole sweep (surfaces errors)
        ray.get([s.ms_accumulate_bc.remote() for s in shards])
    ray.get([s.ms_free.remote() for s in shards])
    return engine.state_arrays("bc")


def edge_betweenness(
    engine: GraphEngine,
    sources=None,
    wave: int = 64,
    cutoff: int | None = None,
) -> "ray.data.Dataset":
    """(src, dst, eb) Dataset — igraph_edge_betweenness
    (src/centrality.c:2210), Brandes edge dependencies: after each
    wave's backward pass every shard accumulates its in-edges'
    sigma_u (1+delta_v)/sigma_v terms (one extra exchange shipping the
    remote sources' dist/sigma rows).  Per-wave transient is
    edges-per-shard x wave doubles — lower ``wave`` for huge graphs.
    Run on the simplified graph."""
    if cutoff is not None and cutoff < 0:
        cutoff = None
    shards = engine.shards
    ray.get([s.eb_reset.remote() for s in shards])
    if sources is None:
        sources = np.arange(engine.n)
    for ws in _ms_waves(engine, sources, wave):
        maxlevel = _ms_forward(engine, ws, max_level=cutoff)
        # one submitted DAG per sweep — see betweenness()
        gathers = []
        for lev in range(maxlevel, 0, -1):
            outs = engine.scatter("ms_bwd_scatter", lev)
            gathers += [
                shards[q].ms_bwd_gather.remote(lev, *engine.pieces(outs, q))
                for q in range(engine.P)
            ]
        ray.get(gathers)  # one barrier for the whole sweep
        ship = engine.scatter("ms_eb_src_ship")
        ray.get([
            shards[q].ms_eb_accumulate.remote(*engine.pieces(ship, q))
            for q in range(engine.P)
        ])
    ray.get([s.ms_free.remote() for s in shards])
    import ray.data as rd

    return rd.from_arrow_refs([s.eb_table.remote() for s in shards])


def eccentricity(
    engine: GraphEngine, sources=None, wave: int = 128,
    mode: str = "out",
) -> np.ndarray:
    """Max finite distance from each source (igraph_eccentricity,
    src/structural_properties.c).  ``mode``: "out" (default here),
    "in", or "all" (igraph's default — undirected view via the
    shards' lazily-built union CSR)."""
    shards = engine.shards
    if sources is None:
        sources = np.arange(engine.n)
    out = np.empty(len(np.asarray(sources)), dtype=np.int64)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _ms_forward(engine, ws, direction=_MODE_DIR[mode])
        parts = ray.get([s.ms_ecc_stats.remote() for s in shards])
        out[pos:pos + len(ws)] = np.max(parts, axis=0)
        pos += len(ws)
    ray.get([s.ms_free.remote() for s in shards])
    return out


def radius(engine: GraphEngine, wave: int = 128,
           mode: str = "out") -> int:
    """min eccentricity (igraph_radius)."""
    return int(eccentricity(engine, wave=wave, mode=mode).min())


def closeness(
    engine: GraphEngine,
    sources=None,
    mode: str = "out",
    normalized: bool = False,
    wave: int = 64,
    cutoff: int | None = None,
) -> np.ndarray:
    """Closeness centrality (reference igraph_closeness
    src/centrality.c:2473,2660): per source s,
    sum = Σ d(s, u) over reached u + n * (n - reached);
    closeness = 1/sum (normalized: (n-1)/sum) — unreachable vertices
    count as distance n, exactly the reference's rule
    (src/centrality.c:2733-2736).  Returns one value per requested
    source (default: all vertices).  ``mode``: "out" follows
    out-edges, "in" in-edges, "all" the undirected view (all three
    reference modes, src/centrality.c:2473).  ``cutoff`` bounds the
    considered path length (igraph_closeness_estimate,
    src/centrality.c:2660: vertices beyond the cutoff count as
    unreachable; None or negative = exact)."""
    if mode not in _MODE_DIR:
        raise ValueError(f"closeness: unknown mode {mode!r}")
    if cutoff is not None and cutoff < 0:
        cutoff = None
    direction = _MODE_DIR[mode]
    shards = engine.shards
    n = engine.n
    if sources is None:
        sources = np.arange(n)
    out = np.empty(len(np.asarray(sources)), dtype=np.float64)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _ms_forward(engine, ws, direction=direction, max_level=cutoff)
        stats = ray.get([s.ms_closeness_stats.remote() for s in shards])
        reach = np.sum([st[0] for st in stats], axis=0)
        dsum = np.sum([st[1] for st in stats], axis=0)
        total = dsum + float(n) * (n - reach)
        with np.errstate(divide="ignore"):
            c = (n - 1.0) / total if normalized else 1.0 / total
        out[pos:pos + len(ws)] = c
        pos += len(ws)
    ray.get([s.ms_free.remote() for s in shards])
    return out


def _wms_run(engine: GraphEngine, wave_sources, max_rounds=None):
    shards = engine.shards
    ray.get([s.wms_init.remote(wave_sources) for s in shards])
    cap = max_rounds if max_rounds is not None else engine.n + 1
    rounds = 0
    while True:
        outs = engine.scatter("wms_scatter")
        changed = sum(ray.get([
            shards[q].wms_gather.remote(*engine.pieces(outs, q))
            for q in range(engine.P)
        ]))
        if changed == 0:
            return
        rounds += 1
        if rounds > cap:
            raise RuntimeError("weighted distances: negative cycle?")


def closeness_weighted(
    engine: GraphEngine,
    sources=None,
    normalized: bool = False,
    wave: int = 32,
) -> np.ndarray:
    """Weighted closeness (igraph_closeness with weights,
    src/centrality.c:2473: one Dijkstra per source becomes S
    Bellman-Ford columns per wave).  Same unreachable-counts-as-n
    rule as the unweighted variant above.  Requires weighted=True
    engine with positive weights."""
    shards = engine.shards
    n = engine.n
    if sources is None:
        sources = np.arange(n)
    out = np.empty(len(np.asarray(sources)), dtype=np.float64)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _wms_run(engine, ws)
        stats = ray.get([s.wms_stats.remote() for s in shards])
        reach = np.sum([st[0] for st in stats], axis=0)
        dsum = np.sum([st[1] for st in stats], axis=0)
        total = dsum + float(n) * (n - reach)
        with np.errstate(divide="ignore"):
            c = (n - 1.0) / total if normalized else 1.0 / total
        out[pos:pos + len(ws)] = c
        pos += len(ws)
    ray.get([s.wms_free.remote() for s in shards])
    return out


def eccentricity_weighted(
    engine: GraphEngine, sources=None, wave: int = 32,
) -> np.ndarray:
    """Weighted eccentricity: max finite weighted distance per source
    (igraph_eccentricity with weights)."""
    shards = engine.shards
    if sources is None:
        sources = np.arange(engine.n)
    out = np.empty(len(np.asarray(sources)), dtype=np.float64)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _wms_run(engine, ws)
        stats = ray.get([s.wms_stats.remote() for s in shards])
        dmax = np.max([st[2] for st in stats], axis=0)
        out[pos:pos + len(ws)] = dmax
        pos += len(ws)
    ray.get([s.wms_free.remote() for s in shards])
    return out


def betweenness_weighted(
    engine: GraphEngine, sources=None, wave: int = 32,
) -> np.ndarray:
    """Weighted Brandes betweenness (igraph_betweenness with weights,
    src/centrality.c:1569): per wave, Bellman-Ford matrix distances,
    then sigma forward / delta backward over the implicit
    shortest-path DAG via incremental message rounds.  Directed,
    endpoints excluded; pass every vertex as sources for the exact
    value, a sample for the _estimate variant.  Integer-ish weights
    recommended (DAG membership uses exact float equality, the same
    rule as networkx/igraph)."""
    shards = engine.shards
    if sources is None:
        sources = np.arange(engine.n)

    def _rounds(scatter, gather):
        while True:
            outs = engine.scatter(scatter)
            changed = sum(ray.get([
                getattr(shards[q], gather).remote(*engine.pieces(outs, q))
                for q in range(engine.P)
            ]))
            if changed == 0:
                return

    for ws in _ms_waves(engine, sources, wave):
        _wms_run(engine, ws)
        ray.get([s.wbc_sigma_init.remote() for s in shards])
        _rounds("wbc_sigma_scatter", "wbc_sigma_gather")
        ray.get([s.wbc_delta_init.remote() for s in shards])
        _rounds("wbc_delta_scatter", "wbc_delta_gather")
        ray.get([s.wbc_accumulate.remote() for s in shards])
    out = np.concatenate(
        ray.get([s.wbc_result.remote() for s in shards])
    )
    ray.get([s.wms_free.remote() for s in shards])
    return out


def harmonic_weighted(
    engine: GraphEngine, sources=None, normalized: bool = True,
    wave: int = 32,
) -> np.ndarray:
    """Weighted harmonic centrality: sum of 1/d(s,u) over reachable
    u != s (igraph_harmonic_centrality with weights)."""
    shards = engine.shards
    n = engine.n
    if sources is None:
        sources = np.arange(n)
    out = np.empty(len(np.asarray(sources)), dtype=np.float64)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _wms_run(engine, ws)
        h = np.sum(
            ray.get([s.wms_harmonic_stats.remote() for s in shards]), axis=0
        )
        out[pos:pos + len(ws)] = h / (n - 1.0) if normalized else h
        pos += len(ws)
    ray.get([s.wms_free.remote() for s in shards])
    return out


def diameter_weighted(engine: GraphEngine, wave: int = 32) -> float:
    """Exact weighted diameter: max finite weighted distance over all
    source waves (igraph_diameter_dijkstra,
    src/structural_properties.c:6013)."""
    return float(np.max(eccentricity_weighted(engine, wave=wave)))


def harmonic_centrality(
    engine: GraphEngine,
    sources=None,
    normalized: bool = True,
    wave: int = 64,
    mode: str = "out",
) -> np.ndarray:
    """Harmonic centrality (igraph_harmonic_centrality,
    src/centrality.c:2940): H(s) = sum over reachable u != s of
    1/d(s,u); unreachable pairs contribute 0 (no n-penalty — the
    point of the harmonic variant).  normalized divides by n-1.
    Same multi-source BFS waves and out/in/all modes as closeness."""
    shards = engine.shards
    n = engine.n
    if sources is None:
        sources = np.arange(n)
    out = np.empty(len(np.asarray(sources)), dtype=np.float64)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _ms_forward(engine, ws, direction=_MODE_DIR[mode])
        stats = ray.get([s.ms_harmonic_stats.remote() for s in shards])
        h = np.sum(stats, axis=0)
        out[pos:pos + len(ws)] = h / (n - 1.0) if normalized else h
        pos += len(ws)
    ray.get([s.ms_free.remote() for s in shards])
    return out


def hits(
    engine: GraphEngine,
    weighted: bool = False,
    tol: float = 1e-10,
    max_iter: int = 1000,
) -> dict:
    """Hub scores in state ``hub``, authorities in ``auth``
    (each max-normalized, igraph scale=True)."""
    ray.get([
        s.set_state.remote(hub=(np.float64, 1.0), auth=(np.float64, 1.0))
        for s in engine.shards
    ])
    it = 0
    delta = float("inf")
    while it < max_iter and delta > tol:
        a = _matvec(engine, "hub", "auth", "fwd", weighted)
        if a["max"]:
            ray.get([
                s.mv_scale_delta.remote("auth", "_a_prev", a["max"])
                for s in engine.shards
            ])
        h = _matvec(engine, "auth", "hub", "rev", weighted)
        if h["max"] == 0:
            break
        deltas = ray.get([
            s.mv_scale_delta.remote("hub", "_h_prev", h["max"])
            for s in engine.shards
        ])
        delta = max(deltas)
        it += 1
    return {"iterations": it, "delta": delta}


def hub_score(engine: GraphEngine, weighted: bool = False,
              tol: float = 1e-10, max_iter: int = 1000):
    """igraph_hub_score (src/centrality.c:840): the hub vector of
    :func:`hits`, exported as a Dataset (vid, hub)."""
    hits(engine, weighted=weighted, tol=tol, max_iter=max_iter)
    return engine.state_dataset(["hub"])


def authority_score(engine: GraphEngine, weighted: bool = False,
                    tol: float = 1e-10, max_iter: int = 1000):
    """igraph_authority_score (src/centrality.c:886)."""
    hits(engine, weighted=weighted, tol=tol, max_iter=max_iter)
    return engine.state_dataset(["auth"])
