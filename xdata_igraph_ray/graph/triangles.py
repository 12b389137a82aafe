"""Triangle counting / transitivity (reference src/triangles.c).

The reference counts triangles by degree-ordering vertices and
intersecting forward-neighbor lists with a mark array
(igraph_transitivity / igraph_adjacent_triangles,
src/triangles.c:617-699, 507-546, template
src/triangles_template.h:24-123).  The distributed re-expression
(SURVEY.md §2.1):

1. simplify to the undirected support: canonical (min,max) endpoint
   pairs, loops dropped, multi-edges collapsed (the reference's
   adjlist-simplify step, src/triangles.c:399-428);
2. orient each edge from lower to higher (degree, vid) rank — the
   reference's degree-ordered rank with vid tie-break
   (src/triangles.c:100-107); oriented out-degree is O(sqrt(m)),
   which is the skew bound that makes the wedge step safe on
   power-law graphs;
3. wedge-generate per pivot: for pivot a with oriented out-neighbors
   x1..xk (rank-sorted), emit probes (xi, xj, a) for i<j — an
   exchange keyed by pivot;
4. probe: partitioned hash semi-join of probes against the oriented
   edge set on (x, y); every match is one triangle, counted once;
5. scatter matches to all three corners and count per vertex.

Every triangle (u,v,w) is generated exactly once, at its lowest-rank
corner — so the global count is exact, no division by 3/6 needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    distinct,
    exchange,
    groupby_agg,
    hash_join,
    to_dataset,
)


@ray.remote
def _canonicalize(tbl: pa.Table) -> pa.Table:
    names = tbl.column_names
    s, d = ("a", "b") if "a" in names else ("src", "dst")
    src = tbl[s].to_numpy()
    dst = tbl[d].to_numpy()
    keep = src != dst
    src, dst = src[keep], dst[keep]
    return pa.table(
        {"a": np.minimum(src, dst), "b": np.maximum(src, dst)}
    )


def undirected_support(edges: Dataset | list, P: int = DEFAULT_PARTITIONS):
    """Distinct loop-free (min,max) endpoint pairs, as refs."""
    refs = edges if isinstance(edges, list) else block_refs(edges)
    canon = [_canonicalize.remote(r) for r in refs]
    return distinct(canon, ["a", "b"], P=P, as_refs=True)


def _rank(deg: np.ndarray, vid: np.ndarray) -> np.ndarray:
    """Order-isomorphic scalar encoding of (degree, vid) rank.

    Shift is 31 bits: vid < 2^31 occupies the low bits exclusively and
    deg <= n < 2^31 keeps the product under 2^62.  A 40-bit shift
    OVERFLOWED int64 for degrees >= 2^23 (8.4M) — web-scale hub
    degrees (50.4M on the 10^9-edge soak graph) flipped the
    orientation and made mega-hubs pivots, inflating the wedge count
    to 10^15.  Caught by the soak; all smaller inputs were below the
    overflow line."""
    return deg.astype(np.int64) * np.int64(1 << 31) + vid


@ray.remote
def _tbl_bytes(t: pa.Table) -> int:
    return int(t.nbytes)


def _stage_bytes(stats, key, refs):
    if stats is not None:
        stats[key] = int(sum(ray.get([_tbl_bytes.remote(r) for r in refs])))


def _both_endpoints(t: pa.Table) -> pa.Table:
    return pa.table(
        {"vid": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy()))}
    )


def _triangle_matches(edges: Dataset | list, P: int, stats=None):
    """Shared wedge-probe pipeline: refs of (pivot, x, y) rows, one
    per triangle.  ``stats`` (optional dict) receives the byte size of
    each shuffled intermediate — the kernel's wire-traffic
    attribution (support/oriented/wedges/matches)."""
    und = undirected_support(edges, P=P)
    _stage_bytes(stats, "support_bytes", und)

    deg = groupby_agg(
        [_project.remote(_both_endpoints, r) for r in und],
        ["vid"], [(None, "count", "deg")], P=P, as_refs=True,
    )

    # orient by (deg, vid) rank: join both endpoints against degrees
    j1 = hash_join(
        und, [_rename.remote(r, {"vid": "a", "deg": "deg_a"}) for r in deg],
        keys=["a"], P=P, as_refs=True,
    )
    j2 = hash_join(
        j1, [_rename.remote(r, {"vid": "b", "deg": "deg_b"}) for r in deg],
        keys=["b"], P=P, as_refs=True,
    )
    oriented = [_orient.remote(r) for r in j2]
    _stage_bytes(stats, "oriented_bytes", oriented)

    # wedges per pivot (exchange keyed by pivot, pair-expand per group)
    wedges = exchange(
        oriented, ["pivot"], P=P, reduce_fn=_wedges_of_partition, as_refs=True
    )
    _stage_bytes(stats, "wedge_bytes", wedges)

    # probe wedges against oriented edges on (x, y)
    return hash_join(
        wedges,
        [_probe_table.remote(r) for r in oriented],
        keys=["x", "y"],
        how="inner",
        P=P,
        as_refs=True,
    )


@ray.remote
def _wedge_est(tbl: pa.Table) -> int:
    """Exact wedge count of a pivot partition: sum C(k, 2)."""
    piv = tbl["pivot"].to_numpy()
    if not len(piv):
        return 0
    _, counts = np.unique(piv, return_counts=True)
    return int(np.sum(counts * (counts - 1) // 2))


@ray.remote
def _wave_split(tbl: pa.Table, wave: int, waves: int, P: int,
                agg: bool = False):
    """This wave's wedges of one pivot partition, hash-split by
    (x, y) for the probe join.

    ``agg=True`` (count-only mode): aggregate to (x, y, cnt) before
    shipping.  On web graphs the same (x, y) pair recurs once per
    common lower-rank neighbor — two mega-hubs shared ~58M pivots on
    the 10^9-edge soak graph, i.e. 58M IDENTICAL rows all hashing to
    one wave+partition (a 20 GB straggler task) — and a triangle
    count only needs the multiplicity."""
    from ..exchange import split_by_hash

    pairs = _wedge_pairs(tbl, wave, waves)
    # the (x << 31 | y) pack needs vids < 2^31, i.e. the int32 path
    agg = agg and pairs["x"].type == pa.int32()
    if agg:
        dt = pairs["x"].type.to_pandas_dtype()
        if len(pairs):
            x = pairs["x"].to_numpy().astype(np.int64)
            y = pairs["y"].to_numpy().astype(np.int64)
            pack = (x << np.int64(31)) | y
            uk, cnt = np.unique(pack, return_counts=True)
            pairs = pa.table({
                "x": (uk >> np.int64(31)).astype(dt),
                "y": (uk & np.int64((1 << 31) - 1)).astype(dt),
                "cnt": cnt.astype(np.int64),
            })
        else:
            pairs = pa.table({
                "x": pa.array([], pa.int32()),
                "y": pa.array([], pa.int32()),
                "cnt": pa.array([], pa.int64()),
            })
    parts = split_by_hash(pairs, ["x", "y"], P)
    return tuple(parts) if P > 1 else parts[0]


@ray.remote(num_returns=2)
def _wave_match(per_vertex: bool, probe: pa.Table, *wedge_parts):
    """Join one (x, y) partition's wave wedges against its probe
    bucket; returns (match count, per-corner count partial)."""
    tbls = [t for t in wedge_parts if t is not None and len(t)]
    if not tbls:
        return 0, pa.table({"vid": pa.array([], pa.int64()),
                            "c": pa.array([], pa.int64())})
    w = pa.concat_tables(tbls, promote_options="default")
    if len(w) > 50_000_000:
        import sys as _sys

        print(f"[tri-wave] fat partition: wedges={len(w)} "
              f"probe={len(probe)}", file=_sys.stderr, flush=True)
    m = w.join(probe, keys=["x", "y"], join_type="inner",
               use_threads=False)
    if "cnt" in m.column_names:
        # count-only mode: triangles = sum of matched multiplicities
        import pyarrow.compute as _pc

        total = int(_pc.sum(m["cnt"]).as_py() or 0)
        return total, pa.table({"vid": pa.array([], pa.int64()),
                                "c": pa.array([], pa.int64())})
    if not per_vertex or m.num_rows == 0:
        return m.num_rows, pa.table({"vid": pa.array([], pa.int64()),
                                     "c": pa.array([], pa.int64())})
    vid = np.concatenate((m["x"].to_numpy(), m["y"].to_numpy(),
                          m["pivot"].to_numpy()))
    uv, cnt = np.unique(vid, return_counts=True)
    return m.num_rows, pa.table({"vid": uv.astype(np.int64),
                                 "c": cnt.astype(np.int64)})


@ray.remote
def _merge_counts(acc: pa.Table | None, part: pa.Table) -> pa.Table:
    if acc is None or len(acc) == 0:
        return part
    if len(part) == 0:
        return acc
    vid = np.concatenate((acc["vid"].to_numpy(), part["vid"].to_numpy()))
    c = np.concatenate((acc["c"].to_numpy(), part["c"].to_numpy()))
    uv, inv = np.unique(vid, return_inverse=True)
    sums = np.zeros(len(uv), np.int64)
    np.add.at(sums, inv, c)
    return pa.table({"vid": uv, "c": sums})


def triangles(
    edges: Dataset | list,
    n: int,
    P: int = DEFAULT_PARTITIONS,
    per_vertex: bool = True,
    stats=None,
    wave_budget_bytes: int | None = None,
):
    """Returns (total_triangles, per-vertex Dataset (vid, count) or None).

    Per-vertex counts are igraph_adjacent_triangles semantics
    (src/triangles.c:507-546).

    WAVE-BATCHED: the wedge table (sum of C(oriented-outdeg, 2) rows)
    is never materialized whole.  Pivot rows expand in waves keyed by
    a hash of the lower-rank wedge member; each wave's probes are
    joined, counted, and freed before the next wave starts, so peak
    wedge footprint is ~wave_budget_bytes regardless of graph size
    (the monolithic wedge exchange spilled >200 GB to disk and died
    on the 10^9-edge soak).  The probe buckets and pivot partitions
    are exchanged ONCE and reused across waves.  One wave reproduces
    the old single-shot pipeline."""
    import os as _os

    und = undirected_support(edges, P=P)
    _stage_bytes(stats, "support_bytes", und)
    deg = groupby_agg(
        [_project.remote(_both_endpoints, r) for r in und],
        ["vid"], [(None, "count", "deg")], P=P, as_refs=True,
    )
    j1 = hash_join(
        und, [_rename.remote(r, {"vid": "a", "deg": "deg_a"}) for r in deg],
        keys=["a"], P=P, as_refs=True,
    )
    j2 = hash_join(
        j1, [_rename.remote(r, {"vid": "b", "deg": "deg_b"}) for r in deg],
        keys=["b"], P=P, as_refs=True,
    )
    oriented = [_orient.remote(r) for r in j2]
    _stage_bytes(stats, "oriented_bytes", oriented)
    # drop upstream refs so plasma frees each stage as the next one
    # lands (at soak scale every live stage is ~15-30 GB; holding the
    # whole chain spilled past the disk)
    del und, deg, j1, j2
    piv_parts = exchange(oriented, ["pivot"], P=P, as_refs=True)
    probe_parts = exchange(
        [_probe_table.remote(r) for r in oriented], ["x", "y"], P=P,
        as_refs=True,
    )
    del oriented
    wedge_rows = int(sum(ray.get([_wedge_est.remote(r)
                                  for r in piv_parts])))
    budget = wave_budget_bytes or int(_os.environ.get(
        "XDATA_TRI_WAVE_BYTES", str(8 << 30)))
    W = max(1, int(-(-wedge_rows * 24 // budget)))
    if stats is not None:
        stats["wedge_rows"] = wedge_rows
        stats["wedge_bytes"] = wedge_rows * 24
        stats["waves"] = W
    total = 0
    match_rows = 0
    acc: list = [None] * P
    for w in range(W):
        spl: list[list] = [[] for _ in range(P)]
        for r in piv_parts:
            outs = _wave_split.options(
                num_returns=P if P > 1 else 1).remote(
                    r, w, W, P, not per_vertex)
            outs = [outs] if P == 1 else outs
            for p, o in enumerate(outs):
                spl[p].append(o)
        cnt_refs, corner_refs = [], []
        for p in range(P):
            c_ref, k_ref = _wave_match.remote(
                per_vertex, probe_parts[p], *spl[p])
            cnt_refs.append(c_ref)
            corner_refs.append(k_ref)
        if per_vertex:
            for p in range(P):
                acc[p] = _merge_counts.remote(acc[p], corner_refs[p])
        # barrier per wave: frees this wave's wedge pieces before the
        # next wave expands
        counts = ray.get(cnt_refs)
        match_rows += int(sum(counts))
        if W > 1:
            import sys as _sys

            print(f"[tri-wave] wave {w + 1}/{W} done "
                  f"(running total {match_rows})",
                  file=_sys.stderr, flush=True)
    total = match_rows
    if stats is not None:
        stats["match_rows"] = match_rows
    if not per_vertex:
        return total, None
    zeros = block_refs(
        rd.range(n).map_batches(
            lambda b: pa.table(
                {"vid": b["id"], "c": np.zeros(len(b["id"]), np.int64)}
            ),
            batch_format="numpy",
        )
    )
    counts = groupby_agg(
        [a for a in acc if a is not None] + zeros,
        ["vid"], [("c", "sum", "count")], P=P,
    )
    return total, counts


def list_triangles(edges: Dataset | list,
                   P: int = DEFAULT_PARTITIONS) -> Dataset:
    """igraph_list_triangles (src/triangles.c:567): every triangle
    exactly once as an id-triple, columns (a, b, c) canonicalized
    a < b < c (the reference's row order is enumeration-defined — its
    triples come out in rank order; sorted triples here)."""
    matches = _triangle_matches(edges, P)

    def rows(t: pa.Table) -> pa.Table:
        tri = np.sort(np.stack([t["pivot"].to_numpy(),
                                t["x"].to_numpy(),
                                t["y"].to_numpy()]), axis=0).astype(np.int64)
        return pa.table({"a": tri[0], "b": tri[1], "c": tri[2]})

    return to_dataset([_project.remote(rows, r) for r in matches])


def _per_vertex_counts(matches, n, P, total):

    corners = [_corners.remote(r) for r in matches]
    zeros = block_refs(
        rd.range(n).map_batches(
            lambda b: pa.table(
                {"vid": b["id"], "c": np.zeros(len(b["id"]), np.int64)}
            ),
            batch_format="numpy",
        )
    )
    counts = groupby_agg(
        corners + zeros, ["vid"], [("c", "sum", "count")], P=P
    )
    return total, counts


@ray.remote
def _scalar(fn, tbl):
    """Apply a table -> scalar reducer remotely (partial aggregate)."""
    return fn(tbl)


@ray.remote
def _project(fn, tbl):
    return fn(tbl)


@ray.remote
def _rename(tbl: pa.Table, mapping: dict):
    return tbl.rename_columns([mapping.get(c, c) for c in tbl.column_names])


@ray.remote
def _rows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _orient(tbl: pa.Table) -> pa.Table:
    a = tbl["a"].to_numpy()
    b = tbl["b"].to_numpy()
    ra = _rank(tbl["deg_a"].to_numpy(), a)
    rb = _rank(tbl["deg_b"].to_numpy(), b)
    lo_first = ra < rb
    pivot = np.where(lo_first, a, b)
    head = np.where(lo_first, b, a)
    if len(pivot) == 0 or max(int(pivot.max()), int(head.max())) < (1 << 31):
        # int32 vids: the oriented + probe tables are the largest
        # resident intermediates at soak scale — half the bytes, half
        # the spill (wedge x/y and the join keys inherit the dtype)
        pivot = pivot.astype(np.int32)
        head = head.astype(np.int32)
    return pa.table(
        {
            "pivot": pivot,
            "head": head,
            "rank_head": np.where(lo_first, rb, ra),
        }
    )


def _empty_wedges(dt=np.int64) -> pa.Table:
    t = pa.from_numpy_dtype(np.dtype(dt))
    return pa.table(
        {"x": pa.array([], t), "y": pa.array([], t),
         "pivot": pa.array([], t)}
    )


def _wedge_pairs(tbl: pa.Table, wave: int = 0, waves: int = 1) -> pa.Table:
    """Rank-ordered out-neighbor pairs per pivot: probes (x, y, pivot).

    ``waves > 1`` emits only the pairs whose LOWER-rank member x hashes
    into this wave — partitioning by x (not pivot) keeps a mega-hub
    pivot's O(sqrt(m)^2) pair block spread evenly across waves, so
    each wave's wedge table is ~total/waves regardless of skew."""
    if len(tbl) == 0:
        return _empty_wedges(tbl["pivot"].type.to_pandas_dtype()
                             if len(tbl.schema) else np.int64)
    piv = tbl["pivot"].to_numpy()
    head = tbl["head"].to_numpy()
    rk = tbl["rank_head"].to_numpy()
    order = np.lexsort((rk, piv))
    piv, head = piv[order], head[order]
    grp_start = np.ones(len(piv), dtype=bool)
    grp_start[1:] = piv[1:] != piv[:-1]
    starts = np.flatnonzero(grp_start)
    sizes = np.diff(np.concatenate((starts, [len(piv)])))
    pos = np.arange(len(piv)) - np.repeat(starts, sizes)
    k = np.repeat(sizes, sizes)
    tail = k - 1 - pos  # pairs where this row is the lower-rank member
    if waves > 1:
        with np.errstate(over="ignore"):
            h = (head.astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        tail = np.where(h % np.uint64(waves) == np.uint64(wave), tail, 0)
    total = int(tail.sum())
    if total == 0:
        return _empty_wedges(head.dtype)
    sel = np.flatnonzero(tail)
    t_sel = tail[sel]
    row_i = np.repeat(sel, t_sel)
    first_pair = np.zeros(len(tail), np.int64)
    first_pair[sel] = np.concatenate(([0], np.cumsum(t_sel)))[:-1]
    off = np.arange(total) - first_pair[row_i]
    row_j = row_i + 1 + off
    return pa.table(
        {"x": head[row_i], "y": head[row_j], "pivot": piv[row_i]}
    )


def _wedges_of_partition(tbl: pa.Table) -> pa.Table:
    """All rank-ordered out-neighbor pairs per pivot (full set —
    list_triangles / matches path)."""
    return _wedge_pairs(tbl, 0, 1)


@ray.remote
def _probe_table(tbl: pa.Table) -> pa.Table:
    """Oriented edges as the probe target: key (x=pivot-side low,
    y=head) ordered by rank — but wedge pairs (x, y) are rank-ordered,
    and an edge between x and y is oriented x->y exactly when
    rank(x)<rank(y), so the oriented pair matches directly."""
    return pa.table({"x": tbl["pivot"], "y": tbl["head"]})


@ray.remote
def _corners(tbl: pa.Table) -> pa.Table:
    return pa.table(
        {
            "vid": np.concatenate(
                (tbl["x"].to_numpy(), tbl["y"].to_numpy(),
                 tbl["pivot"].to_numpy())
            ).astype(np.int64),
            "c": np.ones(3 * len(tbl), np.int64),
        }
    )


def transitivity_global(edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS) -> float:
    """2 * closed triples / open+closed triples — reference
    igraph_transitivity_undirected (src/triangles.c:617-699)."""
    und = undirected_support(edges, P=P)

    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy()))}
        )

    deg_refs = groupby_agg(
        [_project.remote(both, r) for r in und],
        ["vid"], [(None, "count", "deg")], P=P, as_refs=True,
    )

    def _triples(t: pa.Table) -> float:
        d = t["deg"].to_numpy().astype(np.float64)
        return float((d * (d - 1.0) / 2.0).sum())

    # distributed partial sums — only P scalars reach the driver
    # (round-2 pulled the whole per-vertex degree table, an O(n)
    # driver materialization at web scale)
    triples = sum(ray.get([_scalar.remote(_triples, r) for r in deg_refs]))
    total, _ = triangles(und, n, P=P, per_vertex=False)
    return (3.0 * total) / triples if triples else float("nan")


def transitivity_local(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """Per-vertex clustering coefficient (mode 4 semantics: all
    vertices; deg<2 -> NaN, matching igraph_transitivity_local_undirected,
    src/triangles.c:173-505)."""
    und = undirected_support(edges, P=P)
    _, counts = triangles(und, n, P=P, per_vertex=True)

    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy())),
             "c": np.zeros(2 * len(t), np.int64)}
        )

    deg_refs = groupby_agg(
        [_project.remote(both, r) for r in und] ,
        ["vid"], [(None, "count", "deg")], P=P, as_refs=True,
    )
    joined = hash_join(block_refs(counts), deg_refs, keys=["vid"], how="left outer", P=P, as_refs=True)

    @ray.remote
    def local_t(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = np.nan_to_num(d)
        c = t["count"].to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            lt = np.where(d >= 2, 2.0 * c / (d * (d - 1)), np.nan)
        return pa.table({"vid": t["vid"], "transitivity": lt})

    return to_dataset([local_t.remote(r) for r in joined])


def transitivity_barrat(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(vid, barrat): Barrat et al. weighted local transitivity —
    reference igraph_transitivity_barrat (src/triangles.c:701-967):
    C_w(i) = 1/(s_i (k_i - 1)) * sum over triangles at i of
    (w_ij + w_ih)/2.  Input directed multi-edges collapse to an
    undirected weighted simple support (weights summed); deg < 2 ->
    NaN (mode-4 semantics, like transitivity_local)."""
    refs = edges if isinstance(edges, list) else block_refs(edges)

    @ray.remote
    def canon_w(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        w = (
            t["weight"].to_numpy().astype(np.float64)
            if "weight" in t.column_names else np.ones(len(t))
        )
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        return pa.table(
            {"a": np.minimum(s, d), "b": np.maximum(s, d), "w": w}
        )

    und = groupby_agg(
        [canon_w.remote(r) for r in refs], ["a", "b"],
        [("w", "sum", "w")], P=P, as_refs=True,
    )

    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy())),
                "w": np.concatenate((t["w"].to_numpy(),) * 2),
            }
        )

    degs = groupby_agg(
        [_project.remote(both, r) for r in und],
        ["vid"], [(None, "count", "deg"), ("w", "sum", "s")],
        P=P, as_refs=True,
    )
    j1 = hash_join(
        und, [_rename.remote(r, {"vid": "a", "deg": "deg_a", "s": "_sa"})
              for r in degs],
        keys=["a"], P=P, as_refs=True,
    )
    j2 = hash_join(
        j1, [_rename.remote(r, {"vid": "b", "deg": "deg_b", "s": "_sb"})
             for r in degs],
        keys=["b"], P=P, as_refs=True,
    )

    @ray.remote
    def orient_w(tbl: pa.Table) -> pa.Table:
        a = tbl["a"].to_numpy()
        b = tbl["b"].to_numpy()
        w = tbl["w"].to_numpy()
        ra = _rank(tbl["deg_a"].to_numpy(), a)
        rb = _rank(tbl["deg_b"].to_numpy(), b)
        lo_first = ra < rb
        return pa.table(
            {
                "pivot": np.where(lo_first, a, b),
                "head": np.where(lo_first, b, a),
                "rank_head": np.where(lo_first, rb, ra),
                "w": w,
            }
        )

    oriented = [orient_w.remote(r) for r in j2]

    def wedges_w(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            e = pa.array([], pa.int64())
            f = pa.array([], pa.float64())
            return pa.table({"x": e, "y": e, "pivot": e, "wx": f, "wy": f})
        piv = tbl["pivot"].to_numpy()
        head = tbl["head"].to_numpy()
        rk = tbl["rank_head"].to_numpy()
        w = tbl["w"].to_numpy()
        order = np.lexsort((rk, piv))
        piv, head, w = piv[order], head[order], w[order]
        grp = np.ones(len(piv), dtype=bool)
        grp[1:] = piv[1:] != piv[:-1]
        starts = np.flatnonzero(grp)
        sizes = np.diff(np.concatenate((starts, [len(piv)])))
        pos = np.arange(len(piv)) - np.repeat(starts, sizes)
        k = np.repeat(sizes, sizes)
        tail = k - 1 - pos
        total = int(tail.sum())
        if total == 0:
            e = pa.array([], pa.int64())
            f = pa.array([], pa.float64())
            return pa.table({"x": e, "y": e, "pivot": e, "wx": f, "wy": f})
        row_i = np.repeat(np.arange(len(piv)), tail)
        first = np.concatenate(([0], np.cumsum(tail)))[:-1]
        off = np.arange(total) - first[row_i]
        row_j = row_i + 1 + off
        return pa.table(
            {
                "x": head[row_i], "y": head[row_j], "pivot": piv[row_i],
                "wx": w[row_i], "wy": w[row_j],
            }
        )

    wedges = exchange(
        oriented, ["pivot"], P=P, reduce_fn=wedges_w, as_refs=True
    )

    @ray.remote
    def probe_w(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"x": tbl["pivot"], "y": tbl["head"], "wxy": tbl["w"]}
        )

    matches = hash_join(
        wedges, [probe_w.remote(r) for r in oriented],
        keys=["x", "y"], how="inner", P=P, as_refs=True,
    )

    @ray.remote
    def corners_w(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        p = t["pivot"].to_numpy()
        wx = t["wx"].to_numpy()   # edge (pivot, x)
        wy = t["wy"].to_numpy()   # edge (pivot, y)
        wxy = t["wxy"].to_numpy()
        # ordered neighbor pairs (j,h): each triangle contributes
        # (w_ij + w_ih)/2 twice per corner, i.e. w_ij + w_ih — this is
        # what makes uniform weights reduce to the unweighted local
        # transitivity (Barrat's defining property)
        return pa.table(
            {
                "vid": np.concatenate((p, x, y)),
                "c": np.concatenate(
                    (wx + wy, wx + wxy, wy + wxy)
                ),
            }
        )

    sums = groupby_agg(
        [corners_w.remote(r) for r in matches], ["vid"],
        [("c", "sum", "tw")], P=P, as_refs=True,
    )
    joined = hash_join(degs, sums, keys=["vid"], how="left outer", P=P,
                       as_refs=True)

    @ray.remote
    def final(t: pa.Table) -> pa.Table:
        k = t["deg"].to_numpy().astype(np.float64)
        s = t["s"].to_numpy().astype(np.float64)
        tw = np.nan_to_num(
            t["tw"].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(k >= 2, tw / (s * (k - 1)), np.nan)
        return pa.table({"vid": t["vid"], "barrat": c})

    return to_dataset([final.remote(r) for r in joined])


def transitivity_avglocal(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> float:
    """Average local clustering coefficient over vertices with
    degree >= 2 (igraph_transitivity_avglocal_undirected,
    src/triangles.c — deg<2 vertices are excluded from the average).
    Distributed mean over the per-vertex table."""
    lt = transitivity_local(edges, n, P=P)

    @ray.remote
    def partial(t: pa.Table):
        v = t["transitivity"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        return float(v[ok].sum()), int(ok.sum())

    from ..exchange import block_refs as _brefs

    parts = ray.get([partial.remote(r) for r in _brefs(lt)])
    total = sum(p[0] for p in parts)
    cnt = sum(p[1] for p in parts)
    return total / cnt if cnt else float("nan")
