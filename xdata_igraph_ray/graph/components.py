"""Weakly / strongly connected components on the BSP shard engine.

WCC (reference igraph_clusters_weak, src/components.c:88-161): the
reference BFS-labels components in increasing-vertex-id order, so a
component's id is the rank of its minimum vertex id.  Distributed
min-label propagation converges to label = min vid per component;
renumbering labels by ascending value then reproduces igraph's
numbering exactly.  Messages flow along both edge directions; only
vertices whose label changed re-scatter (frontier), so late supersteps
are sparse.

SCC (reference igraph_clusters_strong, src/components.c:163-273,
Kosaraju): DFS finish order is inherently sequential, so we use the
standard distributed FW-BW-Trim coloring scheme instead and compare
after canonical renumbering (component label = min vid in the
component, components numbered by ascending min vid; igraph's raw SCC
numbering is DFS-order-defined and not portable — SURVEY.md §5):

  repeat until all assigned:
    trim     — unassigned vertices with no unassigned in- or
               out-neighbors are singleton SCCs (kills DAG chains)
    color    — forward min-vid propagation in the unassigned subgraph
    backward — from each color root r (color[r] == r), propagate
               reachability backwards within the color class; reached
               vertices form SCC(r), labeled r (provably the SCC's
               min vid)
"""

from __future__ import annotations

import time

import ray

from .engine import GraphEngine


def wcc(
    engine: GraphEngine,
    max_iter: int = 10_000,
    ckpt_root: str | None = None,
    ckpt_every: int = 10,
    resume: bool = False,
    renumber: bool = True,
) -> dict:
    """Min-label propagation to fixpoint; labels in state ``label``."""
    P, shards = engine.P, engine.shards
    start_iter = 0
    if resume and ckpt_root:
        last = GraphEngine.latest_checkpoint(ckpt_root, "wcc")
        if last is not None:
            engine.restore(ckpt_root, "wcc", last, ["label", "changed"])
            start_iter = last + 1
    if start_iter == 0:
        ray.get([s.cc_init.remote() for s in shards])

    lineage = {"algo": "wcc", "n": engine.n, "edges": engine.edge_count}
    it, changed = start_iter, -1
    t0 = time.time()
    while it < max_iter and changed != 0:
        t_it = time.time()
        outs = engine.scatter("cc_scatter", ("fwd", "rev"))
        stats = ray.get([
            shards[q].cc_gather.remote(*engine.pieces(outs, q))
            for q in range(P)
        ])
        changed = sum(s["changed"] for s in stats)
        if ckpt_root and (it % ckpt_every == 0 or changed == 0):
            rows = [
                {"part": q, "iter": it, "msgs": 0, "bytes": 0,
                 "wall_s": time.time() - t_it,
                 "delta": float(stats[q]["changed"])}
                for q in range(P)
            ]
            engine.checkpoint(
                ckpt_root, "wcc", it, ["label", "changed"], rows, lineage
            )
        it += 1
    ncomp = engine.renumber_labels("label") if renumber else None
    return {
        "iterations": it - start_iter,
        "components": ncomp,
        "wall_s": time.time() - t0,
    }


def _sparse_round(engine, scatter, gather, *scatter_args) -> int:
    shards, P = engine.shards, engine.P
    outs = engine.scatter(scatter, *scatter_args)
    stats = ray.get([
        getattr(shards[q], gather).remote(*engine.pieces(outs, q))
        for q in range(P)
    ])
    return sum(s["changed"] for s in stats)


def scc(
    engine: GraphEngine, max_rounds: int = 10_000, renumber: bool = True,
    ckpt_root: str | None = None, ckpt_every: int = 1,
    resume: bool = False,
) -> dict:
    """FW-BW-Trim coloring SCC; labels in state ``scc``.  Checkpoints
    the assignment array between peel rounds (pagerank/wcc pattern):
    ``scc`` is the only durable state — per-round coloring is rebuilt
    from scratch each round, so resuming from the labels alone
    continues exactly."""
    P, shards = engine.P, engine.shards
    ray.get([s.scc_init.remote() for s in shards])
    start_round = 0
    if resume and ckpt_root:
        last = GraphEngine.latest_checkpoint(ckpt_root, "scc")
        if last is not None:
            engine.restore(ckpt_root, "scc", last, ["scc"])
            start_round = last
    lineage = {"algo": "scc", "n": engine.n, "edges": engine.edge_count}
    t0 = time.time()
    rounds = start_round
    while True:
        t_rnd = time.time()
        per_shard_un = ray.get(
            [s.scc_unassigned.remote() for s in shards])
        unassigned = sum(per_shard_un)
        if ckpt_root and rounds > start_round \
                and (rounds % ckpt_every == 0 or unassigned == 0):
            rows = [
                {"part": q, "iter": rounds, "msgs": 0, "bytes": 0,
                 "wall_s": time.time() - t_rnd,
                 "delta": float(per_shard_un[q])}
                for q in range(P)
            ]
            engine.checkpoint(
                ckpt_root, "scc", rounds, ["scc"], rows, lineage
            )
        if unassigned == 0:
            break
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError("scc: did not converge")
        # trim to fixpoint (peeling cascades along DAG chains)
        while True:
            in_flags = engine.scatter("scc_neighbor_flags", "fwd")
            out_flags = engine.scatter("scc_neighbor_flags", "rev")
            trimmed = sum(ray.get([
                shards[q].scc_trim.remote(
                    P, *engine.pieces(in_flags, q),
                    *engine.pieces(out_flags, q))
                for q in range(P)
            ]))
            if trimmed == 0:
                break
        # forward coloring to fixpoint
        ray.get([s.scc_color_reset.remote() for s in shards])
        while _sparse_round(engine, "scc_color_scatter", "scc_color_gather"):
            pass
        # backward reachability within color classes
        ray.get([s.scc_bwd_init.remote() for s in shards])
        while _sparse_round(engine, "scc_bwd_scatter", "scc_bwd_gather"):
            pass
        ray.get([s.scc_assign.remote() for s in shards])
    ncomp = engine.renumber_labels("scc") if renumber else None
    return {
        "rounds": rounds - start_round,
        "components": ncomp,
        "wall_s": time.time() - t0,
        "resumed_from": start_round if start_round else None,
    }


def is_connected(engine: "GraphEngine", mode: str = "weak") -> bool:
    """igraph_is_connected (src/components.c:300): one component?
    ``mode`` "weak" runs min-label WCC, "strong" the FW-BW SCC —
    mirroring the reference's dispatch (directedness aside, weak
    treats arcs as undirected)."""
    if engine.n <= 1:
        return True
    if mode == "weak":
        wcc(engine)
        labels = "label"
    elif mode == "strong":
        scc(engine)
        labels = "scc"
    else:
        raise ValueError(f"unknown connectedness mode {mode!r}")
    import numpy as np

    parts = ray.get([s.get_state.remote(labels) for s in engine.shards])
    first = None
    for d in parts:
        arr = d[labels]
        if len(arr) == 0:
            continue
        if first is None:
            first = arr[0]
        if np.any(arr != first):
            return False
    return True
