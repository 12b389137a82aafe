"""Label propagation (reference igraph_community_label_propagation,
src/community.c:2124-2359).

The reference is asynchronous with RNG-shuffled vertex order and random
tie-breaks — a stream a distributed engine cannot replay (SURVEY.md
§7.4).  This is the synchronous deterministic variant: every superstep
each vertex adopts the dominant label among its IN-neighbors (igraph's
adjacency mode, src/community.c:2082-2086; ``mode="all"`` for
undirected semantics), ties broken by smallest label.  Convergence =
no label changed, which implies igraph's stop criterion (every label
dominant in its neighborhood, src/community.c:2302-2306).

Synchronous LPA can 2-cycle (e.g. a<->b swap labels forever); after
``sync_iters`` supersteps the driver switches to red/black alternation
(only even/odd vids update in alternating rounds), which is
oscillation-free.  Final labels are renumbered by first appearance in
vertex-id order, exactly reproducing src/community.c:2320-2339.
"""

from __future__ import annotations

import os
import time

import ray

from .engine import GraphEngine


def label_propagation(
    engine: GraphEngine,
    mode: str = "in",
    weighted: bool = False,
    initial=None,
    fixed=None,
    max_iter: int = 500,
    sync_iters: int = 30,
    renumber: bool = True,
    ckpt_root: str | None = None,
    ckpt_every: int = 10,
    resume: bool = False,
    plateau_patience: int | None = 2,
    hub_deg: int | None = None,
    subfilter: bool | None = None,
) -> dict:
    """Labels land in shard state ``label``; export with
    ``engine.state_dataset(["label"])``.  Checkpoint/resume follows
    the pagerank/wcc pattern: ``label`` is saved per partition with
    lineage + metrics and a _SUCCESS marker; on resume the caches
    rebuild from a full republish (sync LPA is memoryless given the
    labels, so the trajectory continues exactly — the red/black
    phase is preserved via the restored iteration number)."""
    P, shards = engine.P, engine.shards
    # subscription-filtered scatter (engine.lpa2_scatter) is the
    # default; None reads the env DRIVER-side so bench A/B legs can
    # toggle it (actor-side env reads would miss driver env changes)
    if subfilter is None:
        subfilter = os.environ.get("XDATA_LPA_SUBFILTER", "1") != "0"
    init_ref = ray.put(initial) if initial is not None else None
    fixed_ref = ray.put(fixed) if fixed is not None else None
    start_iter = 0
    restored = False
    if resume and ckpt_root:
        last = GraphEngine.latest_checkpoint(ckpt_root, "lpa")
        if last is not None:
            ray.get([
                s.lpa2_init.remote(mode, weighted, init_ref, fixed_ref,
                                   hub_deg, subfilter, False)
                for s in shards
            ])
            engine.restore(ckpt_root, "lpa", last, ["label"])
            start_iter = last + 1
            restored = True
    if not restored:
        # prefill: with vid-valued initial labels the caches equal the
        # CSR neighbor arrays, skipping round 0's O(E) publish+patch
        ray.get([
            s.lpa2_init.remote(mode, weighted, init_ref, fixed_ref,
                               hub_deg, subfilter, initial is None)
            for s in shards
        ])
    lineage = {"algo": "lpa", "mode": mode, "weighted": bool(weighted),
               "n": engine.n, "edges": engine.edge_count}
    t0 = time.time()
    it = start_iter
    # plateau detection: consecutive full rounds whose change count
    # stops shrinking indicate a synchronous oscillation (profiled:
    # a flat 177k-vertex 2-cycle burned 26 full rounds on the bench
    # graph before the fixed sync_iters cutover); after
    # ``plateau_patience`` such rounds, damping starts early.
    # None disables — the replay oracles pin all-full supersteps.
    damped_on = False
    plateau_hits = 0
    recv_bytes = 0
    prev_full_changed: int | None = None
    while it < max_iter:
        # past sync_iters (or once a plateau is detected), damp
        # oscillations with hash-subsampled rounds; every 4th round
        # is full and decides convergence.  In that damped regime
        # ``full`` depends only on it%4, so there are no intra-batch
        # schedule decisions: submit up to two 4-round groups (ending
        # on full rounds) as one chained DAG and barrier ONCE — the
        # convergence tail was superstep-LATENCY bound (26-200 ms
        # rounds x a driver get each).  Overshoot rounds past a
        # converged full round are exact no-ops (the LPA fixpoint is
        # stable; damped rounds update a subset), so labels are
        # bit-identical to the one-round-per-barrier loop.
        damped_phase = (damped_on or it >= sync_iters) and (
            os.environ.get("XDATA_LPA_BATCH", "1") != "0"
        )
        if damped_phase:
            first_full = it + (3 - it % 4) % 4
            rounds = [i for i in range(it, first_full + 5)
                      if i < max_iter]
            if rounds and rounds[-1] % 4 != 3:
                rounds = rounds[:1]  # max_iter clamp mid-group
        else:
            rounds = [it]
        t_it = time.time()
        per_round = []
        for i in rounds:
            full_i = (not damped_on and i < sync_iters) or i % 4 == 3
            outs = engine.scatter("lpa2_scatter")
            per_round.append((i, full_i, [
                shards[q].lpa2_gather.remote(
                    None if full_i else i, *engine.pieces(outs, q))
                for q in range(P)
            ]))
        all_stats = ray.get([r for _, _, refs in per_round
                             for r in refs])
        recv_bytes += sum(s.get("bytes", 0) for s in all_stats)
        done = False
        stats = None
        for bi, (i, full, refs) in enumerate(per_round):
            stats = all_stats[bi * P:(bi + 1) * P]
            changed = sum(s["changed"] for s in stats)
            pending = sum(s.get("pending", 0) for s in stats)
            if full and plateau_patience is not None and not damped_on:
                if (prev_full_changed is not None and changed > 0
                        and changed >= 0.95 * prev_full_changed):
                    plateau_hits += 1
                    if plateau_hits >= plateau_patience:
                        damped_on = True
                else:
                    plateau_hits = 0
                prev_full_changed = changed
            it = i + 1
            if changed == 0 and pending == 0 and full:
                done = True
                break
        # checkpoint at batch boundaries only: shard label state is
        # post-batch, which equals post-round-``it-1`` (overshoot
        # rounds after a converged full round change nothing), so the
        # saved (iter, labels) pair stays consistent; the cadence may
        # drift by up to the batch length
        if ckpt_root and (
            done or any(i % ckpt_every == 0 for i, _, _ in per_round[
                :([i for i, _, _ in per_round].index(it - 1) + 1)])
        ):
            rows = [
                {"part": q, "iter": it - 1, "msgs": 0, "bytes": 0,
                 "wall_s": time.time() - t_it,
                 "delta": float(stats[q]["changed"])}
                for q in range(P)
            ]
            engine.checkpoint(
                ckpt_root, "lpa", it - 1, ["label"], rows, lineage
            )
        if done:
            break

    if renumber:
        # first-appearance order = ascending min carrier vid —
        # distributed (driver sees only partition counts)
        ncomm = engine.renumber_labels_first_appearance("label")
    else:
        ncomm = None
    return {
        "iterations": it - start_iter,
        "communities": ncomm,
        "wall_s": time.time() - t0,
        "recv_bytes": int(recv_bytes),
        "resumed_from": start_iter - 1 if restored else None,
    }
