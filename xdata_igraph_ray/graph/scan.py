"""xdata scan statistics (reference src/scan.c:54-1000 — the fork's
namesake feature family).

* local_scan_0          — degree / strength (src/scan.c:54-64)
* local_scan_0_them     — THEM-graph degree/strength (:67+)
* local_scan_1_ecount   — edges inside closed 1-neighborhoods
  (graph/metrics.local_scan_1, deg + triangles)
* local_scan_1_ecount_them — THEM edges inside US 1-neighborhoods
  (wedge-probe joins, same machinery as triangles)
* local_scan_k_ecount   — edges inside closed k-neighborhoods, via the
  multi-source BFS harness: for a wave of S sources, the reach-mask
  matrix flows along edges once; scan_k(v) = sum over edges (a,b) of
  mask_a[v]*mask_b[v] — O(E x S) per wave, no neighborhood
  materialization
* local_scan_1_ecount_approximate — sampled-source unbiased estimate
  (the reference approximates via eigen-decompositions, src/scan.c:401
  — pinned divergence: sampling is the distribution-friendly path)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    groupby_agg,
    hash_join,
    to_dataset,
)
from .engine import GraphEngine


def _refs(ds):
    return ds if isinstance(ds, list) else block_refs(ds)


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


def local_scan_0(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
    weighted: bool = False,
) -> Dataset:
    """(vid, scan0): ALL-mode degree (strength when weighted) —
    igraph_local_scan_0 delegates to degree/strength
    (src/scan.c:54-64)."""
    refs = _refs(edges)

    def expand(t: pa.Table) -> pa.Table:
        w = (
            t["weight"].to_numpy().astype(np.float64)
            if weighted and "weight" in t.column_names
            else np.ones(len(t))
        )
        return pa.table(
            {
                "vid": np.concatenate(
                    (t["src"].to_numpy(), t["dst"].to_numpy())
                ),
                "w": np.concatenate((w, w)),
            }
        )

    import ray.data as rd

    base = rd.range(n).map_batches(
        lambda b: pa.table(
            {"vid": b["id"], "w": np.zeros(len(b["id"]))}
        ),
        batch_format="numpy",
    )
    return groupby_agg(
        [_apply.remote(expand, r) for r in refs] + block_refs(base),
        ["vid"], [("w", "sum", "scan0")], P=P,
    )


def local_scan_0_them(
    them: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
    weighted: bool = False,
) -> Dataset:
    """scan-0 over the THEM graph's edges (src/scan.c:67)."""
    return local_scan_0(them, n, P=P, weighted=weighted).map_batches(
        lambda t: t.rename_columns(
            ["vid" if c == "vid" else "scan0_them" for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


def local_scan_1_ecount_them(
    us: Dataset | list, them: Dataset | list, n: int,
    P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """(vid, scan1_them): THEM edges with both endpoints inside each
    vertex's closed US 1-neighborhood (igraph_local_scan_1_ecount_them,
    src/scan.c).  Decomposition per them-edge (x, y):
      * x == v or y == v: counts when the other endpoint is v itself
        (loop) or a US-neighbor of v
      * else: counts for every v US-adjacent to BOTH x and y
        (a wedge-probe join, the triangles machinery)."""
    us_refs = _refs(us)
    them_refs = _refs(them)

    @ray.remote
    def und_pairs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.table(
            {
                "a": np.concatenate((s, d)),
                "b": np.concatenate((d, s)),
            }
        )

    # distinct US adjacency both directions (closed-neighborhood tests)
    from ..exchange import distinct

    adj = distinct(
        [und_pairs.remote(r) for r in us_refs], ["a", "b"], P=P,
        as_refs=True,
    )

    @ray.remote
    def them_canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d  # loops handled separately (always inside N[v])
        return pa.table({"x": s[keep], "y": d[keep]})

    @ray.remote
    def them_loops(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        keep = s == t["dst"].to_numpy()
        return pa.table(
            {"vid": s[keep], "c": np.ones(int(keep.sum()), np.int64)}
        )

    tref = [them_canon.remote(r) for r in them_refs]

    # case 1: them edge incident to v (x==v): other endpoint y must be
    # v (loop) or a US neighbor -> semi-join them against adj
    j_inc = hash_join(
        tref, adj, keys=["x", "y"], right_keys=["a", "b"],
        how="left semi", P=P, as_refs=True,
    )

    @ray.remote
    def inc_counts(t: pa.Table) -> pa.Table:
        # incident them-edge (x,y), y US-neighbor of x: counts for v=x
        # AND v=y (edge inside both closed neighborhoods)
        return pa.table(
            {
                "vid": np.concatenate(
                    (t["x"].to_numpy(), t["y"].to_numpy())
                ),
                "c": np.ones(2 * len(t), np.int64),
            }
        )

    # case 2: wedge v-x, v-y in US (v != x, y), them edge (x, y):
    # join them edges against adj on x (v candidates), then check v-y
    j1 = hash_join(
        tref,
        [_apply.remote(
            lambda t: pa.table({"x": t["b"], "v": t["a"]}), r
        ) for r in adj],
        keys=["x"], P=P, as_refs=True,
    )

    @ray.remote
    def drop_endpoint(t: pa.Table) -> pa.Table:
        keep = pa.compute.and_(
            pa.compute.not_equal(t["v"], t["x"]),
            pa.compute.not_equal(t["v"], t["y"]),
        )
        return t.filter(keep)

    j2 = hash_join(
        [drop_endpoint.remote(r) for r in j1],
        [_apply.remote(
            lambda t: pa.table({"v": t["a"], "y": t["b"],
                                "hit": np.ones(len(t), np.int8)}), r
        ) for r in adj],
        keys=["v", "y"], how="left semi", P=P, as_refs=True,
    )

    @ray.remote
    def wedge_counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": t["v"], "c": np.ones(len(t), np.int64)}
        )

    import ray.data as rd

    base = rd.range(n).map_batches(
        lambda b: pa.table(
            {"vid": b["id"], "c": np.zeros(len(b["id"]), np.int64)}
        ),
        batch_format="numpy",
    )
    counts = (
        [inc_counts.remote(r) for r in j_inc]
        + [them_loops.remote(r) for r in them_refs]
        + [wedge_counts.remote(r) for r in j2]
        + block_refs(base)
    )
    return groupby_agg(counts, ["vid"], [("c", "sum", "scan1_them")], P=P)


def local_scan_k_ecount(
    engine: GraphEngine, k: int, sources=None, wave: int = 64,
) -> np.ndarray:
    """scan_k(v) = number of edges (with multiplicity) whose both
    endpoints lie within v's closed k-out-neighborhood
    (igraph_local_scan_k_ecount, src/scan.c).  Exact over all vertices
    by default; pass sampled ``sources`` at scale."""
    from .centrality import _ms_forward, _ms_waves

    shards = engine.shards
    if sources is None:
        sources = np.arange(engine.n)
    out = np.empty(len(np.asarray(sources)), dtype=np.float64)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _ms_forward(engine, ws, max_level=k)
        outs = engine.scatter("ms_mask_scatter", k)
        counts = ray.get([
            shards[q].ms_mask_count.remote(k, *engine.pieces(outs, q))
            for q in range(engine.P)
        ])
        out[pos:pos + len(ws)] = np.sum(counts, axis=0)
        pos += len(ws)
    ray.get([s.ms_free.remote() for s in shards])
    return out


def local_scan_k_ecount_them(
    us: "GraphEngine", them: "GraphEngine", k: int,
    sources=None, wave: int = 64,
) -> np.ndarray:
    """scan_k THEM statistics (igraph_local_scan_k_ecount_them,
    src/scan.c:831): for each vertex v, the number of THEM arcs with
    both endpoints inside v's closed k-OUT-neighborhood in US (same
    out-mode restriction as :func:`local_scan_k_ecount`; the reference
    k=0/k=1 fast paths are `local_scan_0_them` /
    `local_scan_1_ecount_them` — this general kernel agrees with them
    for loop-free inputs).

    Both engines must be co-partitioned — build THEM with
    ``GraphEngine.from_edges(..., n=us.n, P=us.P, bounds=us.bounds)``
    — so each US shard's BFS distance matrix transfers 1:1 into the
    matching THEM shard (an object-store ref pass, never via the
    driver), where the mask scatter/count runs over THEM's edges."""
    from .centrality import _ms_forward, _ms_waves

    if us.n != them.n or us.P != them.P or not np.array_equal(
        np.asarray(us.bounds), np.asarray(them.bounds)
    ):
        raise ValueError(
            "scan_k_them: engines must be co-partitioned — build THEM "
            "with from_edges(..., n=us.n, P=us.P, bounds=us.bounds)"
        )
    if k < 1:
        raise ValueError("scan_k_them: k must be >= 1 (k=0 is scan_0_them)")
    if sources is None:
        sources = np.arange(us.n)
    sources = np.asarray(sources)
    out = np.empty(len(sources), dtype=np.float64)
    pos = 0
    for ws in _ms_waves(us, sources, wave):
        _ms_forward(us, ws, max_level=k)
        drefs = [s.ms_get_dist.remote() for s in us.shards]
        ray.get([
            t.ms_set_dist.remote(d)
            for t, d in zip(them.shards, drefs)
        ])
        outs = them.scatter("ms_mask_scatter", k)
        counts = ray.get([
            them.shards[q].ms_mask_count.remote(
                k, *them.pieces(outs, q)
            )
            for q in range(them.P)
        ])
        out[pos:pos + len(ws)] = np.sum(counts, axis=0)
        pos += len(ws)
    ray.get([s.ms_free.remote() for s in us.shards])
    ray.get([s.ms_free.remote() for s in them.shards])
    return out


def local_scan_1_ecount_approximate(
    engine: GraphEngine, sample: int, seed: int = 42, wave: int = 64,
) -> np.ndarray:
    """Sampled-source scan_1 values (exact for the sampled vertices,
    NaN elsewhere) — the distribution-friendly stand-in for the
    reference's eigen-approximation (src/scan.c:401, pinned
    divergence)."""
    rng = np.random.default_rng(seed)
    sources = np.sort(
        rng.choice(engine.n, min(sample, engine.n), replace=False)
    )
    vals = local_scan_k_ecount(engine, k=1, sources=sources, wave=wave)
    out = np.full(engine.n, np.nan)
    out[sources] = vals
    return out


def local_scan_1_ecount_approximate_eigen(
    edges, n: int, noevals: int,
) -> np.ndarray:
    """Eigen-approximated scan_1
    (igraph_local_scan_1_ecount_approximate_eigen, src/scan.c:453 via
    :401): ``res_i = deg(i) + 0.5 * sum_j lambda_j^3 * v_ij^2`` over
    the ``noevals`` largest-magnitude adjacency eigenpairs — for a
    simple undirected graph the full spectrum makes the sum
    ``0.5*(A^3)_ii = triangles(i)``, so res converges to the exact
    scan_1.  Input follows :func:`..embedding.eigen_adjacency`'s
    convention — an UNDIRECTED single-arc edge list (the reference's
    own undirected representation); the degree term counts loops
    twice (IGRAPH_ALL + IGRAPH_LOOPS, as the reference does)."""
    from .embedding import _edge_cols, eigen_adjacency

    if noevals <= 0:
        raise ValueError("noevals must be positive")
    if noevals >= n:
        raise ValueError("noevals must be < n (reference rule)")
    src, dst = _edge_cols(edges)
    if len(src) == 0:
        return np.zeros(n)
    deg = (
        np.bincount(src, minlength=n) + np.bincount(dst, minlength=n)
    ).astype(np.float64)
    vals, vecs = eigen_adjacency(edges, n, which="lm", howmany=noevals)
    return deg + 0.5 * ((vals ** 3)[None, :] * vecs ** 2).sum(axis=1)


def local_scan_neighborhood_ecount(
    edges, neighborhoods, weighted: bool = False,
    P: int = 8,
) -> np.ndarray:
    """Induced edge count (or weight sum) per CALLER-SUPPLIED
    neighborhood list (igraph_local_scan_neighborhood_ecount,
    src/scan.c): for each vertex-id list, the number of arcs with
    both endpoints inside.  One distributed filtered pass brings back
    only arcs touching any neighborhood member; the per-neighborhood
    count is a driver bitset probe — neighborhood lists are
    selector-sized in the reference API too."""
    import ray as _ray

    refs = _refs(edges)
    all_vids = sorted({int(v) for nb in neighborhoods for v in nb})
    vref = _ray.put(np.asarray(all_vids, dtype=np.int64))

    @_ray.remote
    def inside(vs, t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        m = np.isin(src, vs) & np.isin(dst, vs)
        cols = {"src": src[m], "dst": dst[m]}
        if weighted and "weight" in t.column_names:
            cols["weight"] = t["weight"].to_numpy()[m]
        return pa.table(cols)

    tabs = _ray.get([inside.remote(vref, r) for r in refs])
    src = np.concatenate([t["src"].to_numpy() for t in tabs]) \
        if tabs else np.empty(0, np.int64)
    dst = np.concatenate([t["dst"].to_numpy() for t in tabs]) \
        if tabs else np.empty(0, np.int64)
    if weighted:
        w = np.concatenate([
            t["weight"].to_numpy() if "weight" in t.column_names
            else np.ones(len(t)) for t in tabs
        ]) if tabs else np.empty(0)
    else:
        w = np.ones(len(src))
    out = np.zeros(len(neighborhoods), dtype=np.float64)
    for i, nb in enumerate(neighborhoods):
        s = set(int(v) for v in nb)
        m = np.fromiter(((a in s and b in s)
                         for a, b in zip(src.tolist(), dst.tolist())),
                        dtype=bool, count=len(src))
        out[i] = w[m].sum()
    return out
