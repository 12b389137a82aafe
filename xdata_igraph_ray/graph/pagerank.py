"""PageRank over the BSP shard engine.

Semantics are pinned to the reference's defining matvec
(src/centrality.c:894-973):

    new[v]  = d * sum_{u->v} p[u] / outdeg[u]  +  sumfrom * reset[v]
    sumfrom = sum_{dangling} p[u] + (1-d) * sum_{non-dangling} p[u]

(uniform reset[v] = 1/n unless personalized).  Dangling vertices send
their whole mass to teleport; the update is mass-preserving, so no
per-iteration renormalization is needed (one final normalize guards
float drift, matching src/centrality.c:1516-1519).  Multi-edges and
self-loops are kept, per PRPACK's conversion
(src/prpack/prpack_igraph_graph.cpp:69-71).  Weighted: contribution is
w * p[u] / out_strength[u]; weights <= 0 are dropped at ingest, per
prpack_igraph_graph.cpp:55-59.

Each superstep: shard-local scatter (p/outdeg repeated along fwd CSR,
bincount-combined per destination shard — hub out-degree splitting
composes because contributions are sums) -> object-store all-to-all ->
gather (sum + teleport).  The driver sees only scalars.  Convergence:
L1 and Linf of the score delta below ``tol`` (PRPACK iterates on the
1-norm, src/prpack/prpack_solver.cpp:346-393).
"""

from __future__ import annotations

import time

import numpy as np
import ray

from .engine import GraphEngine


def pagerank(
    engine: GraphEngine,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    weighted: bool = False,
    reset=None,
    ckpt_root: str | None = None,
    ckpt_every: int = 10,
    resume: bool = False,
) -> dict:
    """Run to convergence; returns run metrics.  Scores live in shard
    state ``pr`` — export with ``engine.state_dataset(["pr"],
    rename={"pr": "score"})``."""
    P = engine.P
    shards = engine.shards
    start_iter = 0
    resumed = False
    if resume and ckpt_root:
        last = GraphEngine.latest_checkpoint(ckpt_root, "pagerank")
        if last is not None:
            engine.restore(ckpt_root, "pagerank", last, ["pr"])
            start_iter = last + 1
            resumed = True
    if reset is not None:
        reset = np.asarray(reset, dtype=np.float64)
        reset = ray.put(reset / reset.sum())
    partials = ray.get([
        s.pr_init.remote(damping, weighted, resumed, reset) for s in shards
    ])
    sumfrom = sum(partials)

    lineage = {
        "algo": "pagerank", "damping": damping, "tol": tol,
        "weighted": weighted, "n": engine.n, "edges": engine.edge_count,
    }
    it = start_iter
    linf = l1 = float("inf")
    recv_bytes = 0
    t0 = time.time()
    while it < max_iter and (linf > tol or l1 > tol):
        t_it = time.time()
        outs = engine.scatter("pr_scatter")
        stats = ray.get([
            shards[q].pr_gather.remote(sumfrom, *engine.pieces(outs, q))
            for q in range(P)
        ])
        linf = max(s["linf"] for s in stats)
        l1 = sum(s["l1"] for s in stats)
        sumfrom = sum(s["sumfrom"] for s in stats)
        recv_bytes += sum(s["bytes"] for s in stats)
        if ckpt_root and (it % ckpt_every == 0 or (linf <= tol and l1 <= tol)):
            rows = [
                {"part": q, "iter": it, "msgs": stats[q]["msgs"],
                 "bytes": stats[q]["bytes"],
                 "wall_s": time.time() - t_it, "delta": stats[q]["l1"]}
                for q in range(P)
            ]
            engine.checkpoint(ckpt_root, "pagerank", it, ["pr"], rows, lineage)
        it += 1

    total = sum(ray.get([s.pr_sum.remote() for s in shards]))
    ray.get([s.pr_normalize.remote(total) for s in shards])
    wall = time.time() - t0
    iters = it - start_iter
    return {
        "iterations": iters,
        "linf": linf,
        "l1": l1,
        "wall_s": wall,
        "edges_per_sec": engine.edge_count * iters / wall if wall > 0 else 0.0,
        # message bytes pulled across all shards over the whole run —
        # the measured numerator of the bandwidth-bound analysis in
        # BASELINE.md §6 (divide by iterations for bytes/superstep)
        "recv_bytes": int(recv_bytes),
    }


def personalized_pagerank_vs(
    engine, vids, damping: float = 0.85, tol: float = 1e-6,
    max_iter: int = 200, weighted: bool = False, **kw,
) -> dict:
    """Personalized PageRank with the reset distribution uniform over
    a vertex SET (igraph_personalized_pagerank_vs,
    src/centrality.c:1192-1230 — builds exactly this indicator reset
    vector and delegates)."""
    vids = np.atleast_1d(np.asarray(vids, dtype=np.int64))
    if len(vids) == 0:
        raise ValueError("empty reset vertex set")
    reset = np.zeros(engine.n, dtype=np.float64)
    reset[vids] = 1.0
    return pagerank(engine, damping=damping, tol=tol,
                    max_iter=max_iter, weighted=weighted,
                    reset=reset, **kw)


def pagerank_old(
    engine: GraphEngine,
    niter: int = 1000,
    eps: float = 0.001,
    damping: float = 0.85,
    old: bool = False,
) -> dict:
    """The deprecated 0.5-era power method (igraph_pagerank_old,
    src/structural_properties.c:1364-1540), kept for API parity:

        new[v] = d * sum_{u->v} p[u]/outdeg'[u] + (1-d)/n

    with outdeg' = out-degree EXCLUDING loops, zeros clamped to 1 —
    dangling mass LEAKS (the documented deprecation reason); each
    iteration renormalizes by the global sum.  ``old=True`` restores
    the even older additive (1-d) form with no normalization.  Stops
    when the Linf delta drops below ``eps`` or after ``niter``
    iterations, exactly the reference's loop condition.  Directed
    semantics; for the reference's undirected mode build the engine on
    the symmetrized edge table (both arcs kept, as igraph's ALL-mode
    adjacency enumerates).

    Scores land in shard state ``prold`` — export with
    ``engine.state_dataset(["prold"], rename={"prold": "score"})``.
    """
    if niter <= 0:
        raise ValueError("Invalid iteration count")
    if eps <= 0:
        raise ValueError("Invalid epsilon value")
    if not 0 < damping < 1:
        raise ValueError("Invalid damping factor")
    P, shards = engine.P, engine.shards
    ray.get([s.prold_init.remote(damping, old) for s in shards])
    it, maxdiff = 0, float("inf")
    t0 = time.time()
    while it < niter and maxdiff >= eps:
        outs = engine.scatter("prold_scatter")
        sums = ray.get([
            shards[q].prold_gather.remote(*engine.pieces(outs, q))
            for q in range(P)
        ])
        maxdiff = max(ray.get([
            s.prold_commit.remote(sum(sums)) for s in shards
        ]))
        it += 1
    return {"iterations": it, "linf": maxdiff, "wall_s": time.time() - t0}
