"""k-core decomposition (reference igraph_coreness, src/cores.c:58-129).

The reference peels by bucket-sorted degree order sequentially; the
distributed version is synchronous batch peeling: at level k, repeat
{count each unpeeled vertex's remaining ALL-degree via a flag exchange;
peel every vertex with degree <= k} until no vertex peels, then advance
k to the minimum remaining degree.  Each vertex's assigned level is its
coreness (identical to the sequential result because peeling at level k
is confluent — order within a level doesn't matter).
"""

from __future__ import annotations

import ray

from .engine import GraphEngine


def coreness(engine: GraphEngine, max_rounds: int = 100_000):
    """ALL-mode coreness into shard state ``core``; returns rounds."""
    P, shards = engine.P, engine.shards
    ray.get([s.core_init.remote() for s in shards])
    k = 0
    rounds = 0
    while True:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError("coreness: did not converge")
        in_f = engine.scatter("core_degree_flags", "fwd")
        out_f = engine.scatter("core_degree_flags", "rev")
        res = ray.get([
            shards[q].core_peel.remote(
                k, P, *engine.pieces(in_f, q), *engine.pieces(out_f, q))
            for q in range(P)
        ])
        peeled = sum(r[0] for r in res)
        min_deg = min((r[1] for r in res if r[1] >= 0), default=-1)
        if peeled == 0:
            if min_deg < 0:
                return rounds  # everything assigned
            k = max(k + 1, min_deg)
