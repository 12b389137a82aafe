"""Degree-preserving randomization (igraph_rewire,
src/structural_properties.c:1544: random double-edge swaps keeping the
graph simple).

Round 1 documented this as an RNG-mutation skip; this is the
distributed, DETERMINISTIC (seeded) version:

* each round, every edge is routed to a pseudo-random bucket (seeded
  hash of (round, edge)); buckets swap locally — a double-edge swap
  (a,b),(c,d) -> (a,d),(c,b) is accepted iff it creates no loop and no
  duplicate within the bucket's current edge set;
* cross-bucket duplicates can still arise, so a repair round follows:
  edges are routed BY (src,dst) (duplicates co-locate) and each bucket
  re-swaps surplus copies; repeat until the graph is simple.

Degrees (out and in separately) are invariant under every swap, loops
are never created, and the result is a pure function of (input, seed,
P).  Per-bucket work is a Python swap loop over its slice — the same
per-trial cost as the reference, parallel across buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..exchange import block_refs, to_dataset

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xBF58476D1CE4E5B9)


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * _H1
    x = (x ^ (x >> np.uint64(27))) * _H2
    return x ^ (x >> np.uint64(31))


@ray.remote
def _route_random(tbl: pa.Table, rnd: int, seed: int, P: int):
    """Split a block into P pieces by a seeded hash of the edge."""
    src = tbl["src"].to_numpy().astype(np.uint64)
    dst = tbl["dst"].to_numpy().astype(np.uint64)
    h = _mix(src * np.uint64(1_000_003) + dst
             + np.uint64(seed * 7919 + rnd * 104729))
    b = (h % np.uint64(P)).astype(np.int64)
    out = []
    for q in range(P):
        m = b == q
        out.append(pa.table({"src": tbl["src"].to_numpy()[m],
                             "dst": tbl["dst"].to_numpy()[m]}))
    return out if P > 1 else out[0]


@ray.remote
def _route_by_edge(tbl: pa.Table, P: int):
    src = tbl["src"].to_numpy().astype(np.uint64)
    dst = tbl["dst"].to_numpy().astype(np.uint64)
    h = _mix(src * np.uint64(1_000_003) + dst)
    b = (h % np.uint64(P)).astype(np.int64)
    out = []
    for q in range(P):
        m = b == q
        out.append(pa.table({"src": tbl["src"].to_numpy()[m],
                             "dst": tbl["dst"].to_numpy()[m]}))
    return out if P > 1 else out[0]


@ray.remote
def _swap_bucket(rnd: int, seed: int, q: int, trials_factor: int,
                 *parts: pa.Table) -> pa.Table:
    t = pa.concat_tables([p for p in parts if p is not None and len(p)],
                         promote_options="default") if parts else None
    if t is None or len(t) < 2:
        return t if t is not None else pa.table(
            {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        )
    src = t["src"].to_numpy().copy()
    dst = t["dst"].to_numpy().copy()
    rng = np.random.default_rng((seed, rnd, q))
    seen = set(zip(src.tolist(), dst.tolist()))
    m = len(src)
    for _ in range(trials_factor * m):
        i, j = rng.integers(0, m, size=2)
        if i == j:
            continue
        a, b = int(src[i]), int(dst[i])
        c, d = int(src[j]), int(dst[j])
        if a == d or c == b:
            continue  # would create a loop
        if (a, d) in seen or (c, b) in seen:
            continue  # would create a duplicate
        seen.discard((a, b))
        seen.discard((c, d))
        seen.add((a, d))
        seen.add((c, b))
        dst[i], dst[j] = d, b
    return pa.table({"src": src, "dst": dst})


@ray.remote
def _repair_bucket(seed: int, q: int, *parts: pa.Table) -> pa.Table:
    """Buckets own whole (src,dst) duplicate groups here; re-swap
    surplus copies against random distinct partners."""
    t = pa.concat_tables([p for p in parts if p is not None and len(p)],
                         promote_options="default") if parts else None
    if t is None or len(t) == 0:
        return pa.table(
            {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        )
    src = t["src"].to_numpy().copy()
    dst = t["dst"].to_numpy().copy()
    m = len(src)
    rng = np.random.default_rng((seed, 0xD0BE, q))
    seen: dict = {}
    surplus = []
    for i in range(m):
        k = (int(src[i]), int(dst[i]))
        if k in seen or k[0] == k[1]:
            surplus.append(i)
        else:
            seen[k] = i
    for i in surplus:
        a, b = int(src[i]), int(dst[i])
        for _ in range(64):
            j = int(rng.integers(0, m))
            if j == i:
                continue
            c, d = int(src[j]), int(dst[j])
            if (c, d) not in seen or seen[(c, d)] != j:
                continue  # j itself is surplus; skip
            if a == d or c == b or (a, d) in seen or (c, b) in seen:
                continue
            del seen[(c, d)]
            dst[i], dst[j] = d, b
            seen[(a, d)] = i
            seen[(c, b)] = j
            break
        # unresolved surplus edges stay; caller loops until clean
    return pa.table({"src": src, "dst": dst})


@ray.remote
def _dup_count(tbl: pa.Table) -> int:
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    if len(src) == 0:
        return 0
    loops = int((src == dst).sum())
    pairs = set(zip(src.tolist(), dst.tolist()))
    return loops + (len(src) - len(pairs))


def rewire(edges, rounds: int = 4, trials_factor: int = 4,
           seed: int = 42, P: int = 8):
    """Randomize a SIMPLE directed edge set preserving every vertex's
    in/out degree.  ``rounds`` re-bucketings x ``trials_factor`` * |E|
    local swap trials per bucket approximate the reference's
    10*|E|-trial default mixing."""
    refs = edges if isinstance(edges, list) else (
        [ray.put(edges)] if isinstance(edges, pa.Table) else block_refs(edges)
    )
    for rnd in range(rounds):
        routed = [
            _route_random.options(num_returns=P if P > 1 else 1).remote(
                r, rnd, seed, P
            )
            for r in refs
        ]
        routed = [[x] if P == 1 else x for x in routed]
        refs = [
            _swap_bucket.remote(
                rnd, seed, q, trials_factor, *[rt[q] for rt in routed]
            )
            for q in range(P)
        ]
    # repair cross-bucket duplicates (routing by edge co-locates them)
    for _ in range(16):
        routed = [
            _route_by_edge.options(num_returns=P if P > 1 else 1).remote(r, P)
            for r in refs
        ]
        routed = [[x] if P == 1 else x for x in routed]
        refs = [
            _repair_bucket.remote(seed, q, *[rt[q] for rt in routed])
            for q in range(P)
        ]
        dups = sum(ray.get([_dup_count.remote(r) for r in refs]))
        if dups == 0:
            break
    else:
        raise RuntimeError("rewire: could not restore simplicity")
    return to_dataset(refs)


# ---------------------------------------------------------------------------
# Constant-probability endpoint rewiring (igraph_rewire_edges,
# src/games.c:2827)
# ---------------------------------------------------------------------------

def _unif01(seed: int, stream: int, ids: np.ndarray) -> np.ndarray:
    k = np.uint64((seed * 0x2545F491 + stream * 0x9E3779B9) % (1 << 64))
    z = _mix(ids.astype(np.uint64) * np.uint64(0x100000001B3) + k)
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)


@ray.remote
def _rewire_endpoints(tbl: pa.Table, off: int, n: int, prob: float,
                      loops: bool, seed: int) -> pa.Table:
    """Rewire each endpoint with probability ``prob`` to a uniform
    vertex.  Mirrors the reference's sequential endpoint walk: src
    endpoints are redrawn against the ORIGINAL dst, dst endpoints
    against the (possibly already rewired) src — positions 2i, 2i+1
    in games.c:2861-2872; the loops=False draw uses the same
    [0, n-2] + collision->n-1 trick."""
    src = tbl["src"].to_numpy().astype(np.int64).copy()
    dst = tbl["dst"].to_numpy().astype(np.int64).copy()
    eid = np.arange(off, off + len(src), dtype=np.uint64)

    def draw(stream: int, other: np.ndarray, m: np.ndarray) -> np.ndarray:
        if loops:
            return (_unif01(seed, stream, eid[m]) * n).astype(np.int64)
        r = (_unif01(seed, stream, eid[m]) * (n - 1)).astype(np.int64)
        return np.where(r == other[m], n - 1, r)

    m = _unif01(seed, 0, eid) < prob
    src[m] = draw(1, dst, m)
    m = _unif01(seed, 2, eid) < prob
    dst[m] = draw(3, src, m)
    cols = {"src": src, "dst": dst}
    for name in tbl.column_names:
        if name not in ("src", "dst"):
            cols[name] = tbl[name]
    return pa.table(cols)


@ray.remote
def _redraw_dups(seed: int, rnd: int, n: int, loops: bool,
                 *parts: pa.Table) -> pa.Table:
    """Surplus copies of a duplicate edge get their dst redrawn with a
    fresh counter stream (multiple=False repair round)."""
    t = pa.concat_tables(list(parts))
    if len(t) == 0:
        return t
    src = t["src"].to_numpy().astype(np.int64).copy()
    dst = t["dst"].to_numpy().astype(np.int64).copy()
    order = np.lexsort((dst, src))
    s2, d2 = src[order], dst[order]
    first = np.ones(len(s2), dtype=bool)
    first[1:] = (s2[1:] != s2[:-1]) | (d2[1:] != d2[:-1])
    surplus = order[~first]
    if len(surplus):
        # duplicate rank within the (src,dst) group: routing co-locates
        # ALL copies of a pair in one bucket, so the rank — and hence
        # the redraw key — is independent of P and block layout
        gstart = np.flatnonzero(first)
        glen = np.diff(np.concatenate((gstart, [len(s2)])))
        rank_sorted = np.arange(len(s2)) - np.repeat(gstart, glen)
        rank = rank_sorted[~first].astype(np.uint64)
        key = (src[surplus].astype(np.uint64) * np.uint64(1_000_003)
               + dst[surplus].astype(np.uint64)
               + np.uint64(rnd * 40503 + 7)
               + rank * np.uint64(0x9E3779B9))
        if loops:
            nd = (_unif01(seed, 4 + rnd, key) * n).astype(np.int64)
        else:
            nd = (_unif01(seed, 4 + rnd, key) * (n - 1)).astype(np.int64)
            nd = np.where(nd == src[surplus], n - 1, nd)
        dst[surplus] = nd
    return pa.table({"src": src, "dst": dst})


def rewire_edges(edges, n: int, prob: float, loops: bool = False,
                 multiple: bool = True, seed: int = 42, P: int = 8):
    """igraph_rewire_edges (src/games.c:2827): every endpoint of every
    edge is rewired with constant probability ``prob`` to a uniformly
    random vertex.  Distributed map over edge blocks; the per-endpoint
    Bernoulli draws replace the reference's equivalent
    geometric-skip walk over the endpoint sequence (games.c:2858).

    Like the reference, ``loops=False`` constrains only the NEW
    draws: rewiring never creates a loop, but a pre-existing loop
    edge survives unless one of its endpoints happens to be rewired.

    Pinned divergences (like ``rewire``): the RNG is a seeded
    counter-hash keyed by (seed, global edge index, endpoint), so the
    output is a pure function of (input block layout, seed, prob) at
    any parallelism; ``multiple=False`` enforces simplicity by
    redrawing the dst of surplus duplicate copies in up to 16
    co-locating repair rounds (the reference's stub-list resampling
    draws a different sequence with the same support), keyed by the
    copy's rank within its duplicate group so the repair is also
    parallelism-invariant — input must be simple for the no-multiple
    contract, same as the reference.  NOTE: the ``multiple=False``
    path returns (src, dst) only; extra columns survive only the
    ``multiple=True`` path (a rewired edge has no canonical attribute
    owner once copies collide).
    """
    if not 0.0 <= prob <= 1.0:
        raise ValueError(
            "Rewiring probability should be between zero and one")
    refs = edges if isinstance(edges, list) else (
        [ray.put(edges)] if isinstance(edges, pa.Table) else block_refs(edges)
    )
    if prob == 0:
        return to_dataset(refs)
    lens = ray.get([_blk_len.remote(r) for r in refs])
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    refs = [
        _rewire_endpoints.remote(r, int(o), n, prob, loops, seed)
        for r, o in zip(refs, offs)
    ]
    if multiple:
        return to_dataset(refs)
    for rnd in range(17):
        routed = [
            _route_by_edge.options(num_returns=P if P > 1 else 1).remote(
                r, P
            )
            for r in refs
        ]
        routed = [[x] if P == 1 else x for x in routed]
        buckets = [[rt[q] for rt in routed] for q in range(P)]
        # duplicates co-locate under edge routing, so per-bucket
        # surplus counts are exact global counts
        dups = sum(ray.get(
            [_surplus_count.remote(*b) for b in buckets]))
        if dups == 0:
            return to_dataset(refs)
        if rnd == 16:  # 16 redraw rounds done and still not simple
            break
        refs = [
            _redraw_dups.remote(seed, rnd, n, loops, *b) for b in buckets
        ]
    raise RuntimeError(
        "rewire_edges: could not reach a multi-edge-free graph in 16 "
        "repair rounds (graph too dense for multiple=False?)")


@ray.remote
def _blk_len(tbl: pa.Table) -> int:
    return len(tbl)


@ray.remote
def _surplus_count(*parts: pa.Table) -> int:
    """Number of surplus duplicate copies (multi-edge defects only —
    loops are legal for rewire_edges when loops=True and impossible
    when loops=False, so they never count here)."""
    t = pa.concat_tables(list(parts))
    if len(t) == 0:
        return 0
    src = t["src"].to_numpy()
    dst = t["dst"].to_numpy()
    pairs = set(zip(src.tolist(), dst.tolist()))
    return len(src) - len(pairs)
