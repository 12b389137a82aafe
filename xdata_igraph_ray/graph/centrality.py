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
