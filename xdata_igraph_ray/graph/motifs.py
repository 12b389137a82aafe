"""Triad census and size-3 motif counts (reference igraph_triad_census
src/motifs.c:913-1042, igraph_motifs_randesu :121).

The reference classifies every vertex triple sequentially; the
distributed re-expression enumerates only triples with >= 2 connected
pairs (wedge generation on the undirected support — the same machinery
as triangles.py) and recovers the 1-pair and empty classes by
combinatorial complement:

  1. directed pair codes: per unordered pair (a < b),
     code = 1 (a->b) | 2 (b->a)  (3 = mutual) — a grouped bit-OR
  2. wedges per center: every pair is routed to both endpoints; each
     center emits its vid-sorted neighbor pairs with their codes
  3. probe the third pair: left join wedges against the pair table —
     triples whose third pair exists are triangles, generated at all
     three centers, kept only at the minimum-vid center
  4. classify with a 64-entry lookup (canonical-pair-code triple ->
     triad name, validated against networkx.triadic_census in tests)
  5. classes 012/102 follow from pair counts minus their occurrences
     inside counted triples; 003 is the complement of everything

Scale shape: wedge volume is sum(deg^2)/2 over the support — the same
bound as triangle counting; no driver-side per-triple work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    exchange,
    groupby_agg,
    hash_join,
)

# igraph's triad census order (src/motifs.c:1042 doc block)
TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# canonical-code lookup: index = c12*16 + c13*4 + c23 over the
# vid-sorted triple's canonical pair codes (0 none / 1 lo->hi /
# 2 hi->lo / 3 mutual).  Generated once from networkx.triadic_census
# over all 64 code combinations; tests re-derive it independently.
_TRIAD_OF_CODE = [
    "003", "012", "012", "102", "012", "021U", "021C", "111D",
    "012", "021C", "021D", "111U", "102", "111D", "111U", "201",
    "012", "021C", "021U", "111D", "021D", "030T", "030T", "120D",
    "021C", "030C", "030T", "120C", "111U", "120C", "120U", "210",
    "012", "021D", "021C", "111U", "021C", "030T", "030C", "120C",
    "021U", "030T", "030T", "120U", "111D", "120D", "120C", "210",
    "102", "111U", "111D", "201", "111U", "120U", "120C", "210",
    "111D", "120C", "120D", "210", "201", "210", "210", "300",
]
_LOOKUP = np.array(
    [TRIAD_NAMES.index(nm) for nm in _TRIAD_OF_CODE], dtype=np.int64
)
# mutual / asymmetric pair counts per class (the M and A of the MAN
# label) — used for the complement counting of 102 / 012
_MUT_OF_CLASS = np.array([int(nm[0]) for nm in TRIAD_NAMES])
_ASYM_OF_CLASS = np.array([int(nm[1]) for nm in TRIAD_NAMES])


@ray.remote
def _pair_bits(tbl: pa.Table) -> pa.Table:
    s = tbl["src"].to_numpy()
    d = tbl["dst"].to_numpy()
    keep = s != d
    s, d = s[keep], d[keep]
    return pa.table(
        {
            "a": np.minimum(s, d),
            "b": np.maximum(s, d),
            "code": np.where(s < d, 1, 2).astype(np.int64),
        }
    )


def _or_codes(t: pa.Table) -> pa.Table:
    a = t["a"].to_numpy()
    b = t["b"].to_numpy()
    c = t["code"].to_numpy()
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    new = np.ones(len(a), dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    idx = np.flatnonzero(new)
    code = np.bitwise_or.reduceat(c, idx) if len(idx) else c
    return pa.table({"a": a[idx], "b": b[idx], "code": code})


def _wedges(t: pa.Table) -> pa.Table:
    """Per-center vid-sorted neighbor pairs with codes."""
    c = t["c"].to_numpy()
    o = t["o"].to_numpy()
    code = t["code"].to_numpy()
    order = np.lexsort((o, c))
    c, o, code = c[order], o[order], code[order]
    starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
    sizes = np.diff(np.concatenate((starts, [len(c)])))
    pos = np.arange(len(c)) - np.repeat(starts, sizes)
    k = np.repeat(sizes, sizes)
    tail = k - 1 - pos
    total = int(tail.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return pa.table({"x": e, "y": e, "center": e, "cx": e, "cy": e})
    row_i = np.repeat(np.arange(len(c)), tail)
    first = np.concatenate(([0], np.cumsum(tail)))[:-1]
    off = np.arange(total) - first[row_i]
    row_j = row_i + 1 + off
    return pa.table(
        {
            "x": o[row_i], "y": o[row_j], "center": c[row_i],
            "cx": code[row_i], "cy": code[row_j],
        }
    )


@ray.remote
def _classify(tbl: pa.Table) -> np.ndarray:
    """16-bin class histogram + [sum asym-in-triple, sum mut-in-triple]."""
    if len(tbl) == 0:
        return np.zeros(18, dtype=np.int64)
    x = tbl["x"].to_numpy()
    cen = tbl["center"].to_numpy()
    cx = tbl["cx"].to_numpy()
    cy = tbl["cy"].to_numpy()
    cxy = tbl["cxy"].to_numpy(zero_copy_only=False)
    cxy = np.nan_to_num(cxy).astype(np.int64)
    # triangles (third pair present) are generated at all three
    # centers; keep only the minimum-vid one (x < y always holds)
    keep = (cxy == 0) | (cen < x)
    x, cen, cx, cy, cxy = x[keep], cen[keep], cx[keep], cy[keep], cxy[keep]
    y = tbl["y"].to_numpy()[keep]
    code64 = np.where(
        cen < x,
        cx * 16 + cy * 4 + cxy,
        np.where(cen < y, cx * 16 + cxy * 4 + cy, cxy * 16 + cx * 4 + cy),
    )
    cls = _LOOKUP[code64]
    out = np.zeros(18, dtype=np.int64)
    out[:16] = np.bincount(cls, minlength=16)
    out[16] = int(_ASYM_OF_CLASS[cls].sum())
    out[17] = int(_MUT_OF_CLASS[cls].sum())
    return out


@ray.remote
def _pair_stats(tbl: pa.Table) -> np.ndarray:
    c = tbl["code"].to_numpy()
    return np.array([int((c != 3).sum()), int((c == 3).sum())])


def triad_census(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> dict[str, int]:
    """The 16-class directed triad census (igraph order)."""
    refs = edges if isinstance(edges, list) else block_refs(edges)
    bits = [_pair_bits.remote(r) for r in refs]
    pairs = exchange(
        bits, ["a", "b"], P=P, map_fn=_or_codes, reduce_fn=_or_codes,
        as_refs=True,
    )

    @ray.remote
    def nb(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy())),
                "o": np.concatenate((t["b"].to_numpy(), t["a"].to_numpy())),
                "code": np.concatenate((t["code"].to_numpy(),) * 2),
            }
        )

    wedge_refs = exchange(
        [nb.remote(r) for r in pairs], ["c"], P=P, reduce_fn=_wedges,
        as_refs=True,
    )
    probed = hash_join(
        wedge_refs,
        [_rename_pair.remote(r) for r in pairs],
        keys=["x", "y"], right_keys=["x", "y"],
        how="left outer", P=P, as_refs=True,
    )
    hists = ray.get([_classify.remote(r) for r in probed])
    agg = np.sum(hists, axis=0)
    counts = dict(zip(TRIAD_NAMES, agg[:16].astype(int)))
    stats = np.sum(ray.get([_pair_stats.remote(r) for r in pairs]), axis=0)
    asym_pairs, mut_pairs = int(stats[0]), int(stats[1])
    counts["012"] = asym_pairs * (n - 2) - int(agg[16])
    counts["102"] = mut_pairs * (n - 2) - int(agg[17])
    total = n * (n - 1) * (n - 2) // 6
    counts["003"] = total - sum(
        v for k, v in counts.items() if k != "003"
    )
    return counts


def triad_census_24(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> tuple[int, int]:
    """(count of 012 triads, count of 102 triads) — reference
    igraph_triad_census_24 (src/motifs.c:913-973): the two
    single-connected-dyad triad classes (one asymmetric / one mutual
    dyad plus an isolated third vertex).  Same numbers the full census
    derives from the asym/mut pair totals minus connected-triple
    corrections; exposed as its own entry point for parity."""
    c = triad_census(edges, n, P=P)
    return int(c["012"]), int(c["102"])


@ray.remote
def _rename_pair(t: pa.Table) -> pa.Table:
    return pa.table({"x": t["a"], "y": t["b"], "cxy": t["code"]})


def motifs_3_undirected(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> dict[str, int]:
    """Connected undirected 3-subgraph counts: open wedges (paths) and
    closed triangles (igraph_motifs_randesu size=3 undirected counts
    the same two connected isoclasses; reference src/motifs.c:121).
    Derived from the triad census: every directed class maps to an
    undirected support shape by its null-pair count."""
    census = triad_census(edges, n, P=P)
    # closed = all three support pairs present (zero null dyads);
    # 201 (two mutual dyads + one NULL dyad) is a support PATH
    closed = sum(census[k] for k in ("030T", "030C", "120D", "120U",
                                     "120C", "210", "300"))
    open_ = sum(census[k] for k in ("021D", "021U", "021C", "111D",
                                    "111U", "201"))
    return {"path": open_, "triangle": closed}


# ---------------------------------------------------------------------------
# size-4 undirected motif census — igraph_motifs_randesu size=4
# (src/motifs.c:121; isoclasses per src/topology.c isoclass tables).
#
# Strategy: count NON-induced subgraph copies of the six connected
# 4-vertex classes with closed-form identities + two bounded joins,
# then convert to INDUCED counts by solving the (runtime-derived)
# subgraph-containment linear system:
#
#   claw    = sum_v C(d,3)
#   paw     = sum_v t(v) * (d(v) - 2)
#   P4      = sum_{(a,b) in E} (d(a)-1)(d(b)-1) - 3T
#   C4      = 1/2 * sum_{pairs} C(codeg, 2)
#   diamond = sum_{(a,b) in E} C(codeg(a,b), 2)
#   K4      = (adjacent apex pairs over shared triangle edges) / 6
#
# codegrees come from a full wedge expansion (volume sum_v C(d(v),2))
# — the same scope boundary as the reference's own enumerative
# motifs.c: exact census is for small/medium graphs; RAND-ESU
# sampling is the documented scale path (not implemented).

_M4_CLASSES = ("p4", "claw", "c4", "paw", "diamond", "k4")
_M4_EDGES = {
    "p4": ((0, 1), (1, 2), (2, 3)),
    "claw": ((0, 1), (0, 2), (0, 3)),
    "c4": ((0, 1), (1, 2), (2, 3), (3, 0)),
    "paw": ((0, 1), (1, 2), (2, 0), (0, 3)),
    "diamond": ((0, 1), (1, 2), (2, 0), (0, 3), (1, 3)),
    "k4": ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)),
}


def _m4_copies(pat: str, tgt: str) -> int:
    """# of subgraph copies of class ``pat`` inside ONE induced
    occurrence of class ``tgt``: labeled embeddings / |Aut(pat)|."""
    from itertools import permutations

    pe = {frozenset(e) for e in _M4_EDGES[pat]}
    te = {frozenset(e) for e in _M4_EDGES[tgt]}
    emb = sum(
        1 for perm in permutations(range(4))
        if all(frozenset((perm[a], perm[b])) in te for a, b in pe)
    )
    aut = sum(
        1 for perm in permutations(range(4))
        if {frozenset((perm[a], perm[b])) for a, b in pe} == pe
    )
    return emb // aut


def motifs_4_undirected(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
) -> dict[str, int]:
    """Induced counts of the six connected 4-vertex undirected motif
    classes.  Exact; see the scope note above."""
    from .triangles import undirected_support
    from ..exchange import exchange as _exchange

    if isinstance(edges, pa.Table):
        edges = [ray.put(edges)]
    und = undirected_support(edges, P=P)

    # degrees
    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy()))}
        )

    deg_refs = groupby_agg(
        [_apply.remote(both, r) for r in und],
        ["vid"], [(None, "count", "deg")], P=P, as_refs=True,
    )
    deg_tbl = pa.concat_tables(ray.get(deg_refs))
    deg = np.zeros(n, dtype=np.int64)
    deg[deg_tbl["vid"].to_numpy()] = deg_tbl["deg"].to_numpy()

    # full wedges -> codegree per unordered endpoint pair.  Arcs are
    # symmetrized FIRST so each center's whole neighbor list lands in
    # one key-group (a-side-only grouping would miss wedges whose two
    # neighbors sit on opposite sides of the canonical edge order).
    sym = [_m4_symmetrize.remote(r) for r in und]
    wedge_pairs = _exchange(
        sym, ["c"], P=P, reduce_fn=_m4_wedges_by_center, as_refs=True,
    )
    codeg = groupby_agg(
        wedge_pairs, ["x", "y"],
        [(None, "count", "w")], P=P, as_refs=True,
    )
    # annotate pairs with adjacency (inner-join against edge set)
    adj_pairs = hash_join(
        codeg, [_rename_ab.remote(r) for r in und], keys=["x", "y"],
        how="inner", P=P, as_refs=True,
    )
    parts = [t["w"].to_numpy() for t in ray.get(codeg) if len(t)]
    w_all = np.concatenate(parts) if parts else np.empty(0, np.int64)
    parts = [t["w"].to_numpy() for t in ray.get(adj_pairs) if len(t)]
    w_adj = np.concatenate(parts) if parts else np.empty(0, np.int64)

    # triangles: per-vertex counts + apex-pair adjacency for K4
    from .triangles import triangles as _tri

    total_T, per_v = _tri([r for r in und], n, P=P, per_vertex=True)
    tv_tbl = per_v.to_arrow_refs()
    tv_tbl = pa.concat_tables(ray.get(tv_tbl))
    t_v = np.zeros(n, dtype=np.int64)
    t_v[tv_tbl["vid"].to_numpy()] = tv_tbl["count"].to_numpy()

    # K4: triangle list -> (edge, apex) -> apex pairs -> adjacency
    tri_matches = _m4_triangle_list(und, n, P)
    edge_apex = [_m4_edge_apex.remote(r) for r in tri_matches]
    apex_pairs = _exchange(
        edge_apex, ["ea", "eb"], P=P, reduce_fn=_m4_apex_pairs,
        as_refs=True,
    )
    k4_hits = hash_join(
        apex_pairs, [_rename_ab.remote(r) for r in und], keys=["x", "y"],
        how="inner", P=P, as_refs=True,
    )
    k4 = sum(ray.get([_nrows.remote(r) for r in k4_hits])) // 6

    # non-induced counts from identities
    und_tbl = pa.concat_tables(ray.get(list(und)))
    ea = und_tbl["a"].to_numpy()
    eb = und_tbl["b"].to_numpy()
    T = int(total_T)
    claw = int((deg * (deg - 1) * (deg - 2) // 6).sum())
    paw = int((t_v * np.maximum(deg - 2, 0)).sum())
    p4 = int(((deg[ea] - 1) * (deg[eb] - 1)).sum()) - 3 * T
    c4 = int((w_all * (w_all - 1) // 2).sum()) // 2
    diamond = int((w_adj * (w_adj - 1) // 2).sum())
    non_induced = {
        "p4": p4, "claw": claw, "c4": c4, "paw": paw,
        "diamond": diamond, "k4": k4,
    }

    # N = M @ I  (M upper-triangular by edge count) -> solve for I
    order = _M4_CLASSES
    M = np.array(
        [[_m4_copies(pi, pj) for pj in order] for pi in order],
        dtype=np.float64,
    )
    N = np.array([non_induced[c] for c in order], dtype=np.float64)
    induced = np.linalg.solve(M, N)
    out = {c: int(round(v)) for c, v in zip(order, induced)}
    if any(v < 0 for v in out.values()):
        raise AssertionError(f"motifs4: negative induced count {out}")
    return out


def _m4_triangle_list(und, n, P):
    """Triangle matches (x, y, pivot) via the oriented wedge probe —
    the same pipeline as triangles.py, re-run here to keep the match
    TABLE (triangles() only returns counts)."""
    from .triangles import _orient, _probe_table, _rename, _wedges_of_partition

    deg = groupby_agg(
        [_apply.remote(
            lambda t: pa.table({
                "vid": np.concatenate(
                    (t["a"].to_numpy(), t["b"].to_numpy())
                )
            }), r) for r in und],
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
    from ..exchange import exchange as _exchange

    wedges = _exchange(
        oriented, ["pivot"], P=P, reduce_fn=_wedges_of_partition,
        as_refs=True,
    )
    return hash_join(
        wedges, [_probe_table.remote(r) for r in oriented],
        keys=["x", "y"], how="inner", P=P, as_refs=True,
    )


def _m4_wedge_expand(center: np.ndarray, other: np.ndarray) -> pa.Table:
    order = np.argsort(center, kind="stable")
    center, other = center[order], other[order]
    runs = np.ones(len(center), dtype=bool)
    if len(center):
        runs[1:] = center[1:] != center[:-1]
    starts = np.flatnonzero(runs)
    ends = np.concatenate((starts[1:], [len(center)]))
    xs, ys = [], []
    for s, e in zip(starts, ends):
        nbrs = np.sort(other[s:e])
        k = e - s
        if k < 2:
            continue
        ii, jj = np.triu_indices(k, k=1)
        xs.append(nbrs[ii])
        ys.append(nbrs[jj])
    if not xs:
        ei = np.empty(0, np.int64)
        return pa.table({"x": ei, "y": ei})
    return pa.table({"x": np.concatenate(xs), "y": np.concatenate(ys)})


@ray.remote
def _m4_symmetrize(t: pa.Table) -> pa.Table:
    a = t["a"].to_numpy()
    b = t["b"].to_numpy()
    return pa.table({
        "c": np.concatenate((a, b)), "nbr": np.concatenate((b, a)),
    })


def _m4_wedges_by_center(tbl: pa.Table) -> pa.Table:
    if len(tbl) == 0:
        ei = np.empty(0, np.int64)
        return pa.table({"x": ei, "y": ei})
    return _m4_wedge_expand(tbl["c"].to_numpy(), tbl["nbr"].to_numpy())


@ray.remote
def _rename_ab(t: pa.Table) -> pa.Table:
    return pa.table({"x": t["a"], "y": t["b"]})


@ray.remote
def _apply(fn, t: pa.Table) -> pa.Table:
    return fn(t)


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _m4_edge_apex(t: pa.Table) -> pa.Table:
    """Each triangle (pivot, x, y) -> 3 (edge, apex) records with the
    edge canonicalized (min, max)."""
    # the triangle pipeline emits int32 vids at scale; the downstream
    # join is against the int64 support table — normalize here
    p = t["pivot"].to_numpy().astype(np.int64)
    x = t["x"].to_numpy().astype(np.int64)
    y = t["y"].to_numpy().astype(np.int64)
    e1a, e1b, ap1 = np.minimum(x, y), np.maximum(x, y), p
    e2a, e2b, ap2 = np.minimum(p, x), np.maximum(p, x), y
    e3a, e3b, ap3 = np.minimum(p, y), np.maximum(p, y), x
    return pa.table({
        "ea": np.concatenate((e1a, e2a, e3a)),
        "eb": np.concatenate((e1b, e2b, e3b)),
        "apex": np.concatenate((ap1, ap2, ap3)),
    })


def _m4_apex_pairs(tbl: pa.Table) -> pa.Table:
    """Unordered apex pairs per shared edge (canonicalized)."""
    if len(tbl) == 0:
        ei = np.empty(0, np.int64)
        return pa.table({"x": ei, "y": ei})
    key = tbl["ea"].to_numpy() * (1 << 31) + tbl["eb"].to_numpy()
    return _m4_wedge_expand(key, tbl["apex"].to_numpy())


# ---------------------------------------------------------------------------
# ESU enumeration — igraph_motifs_randesu_no / _estimate
# (src/motifs.c:336-520: each connected induced subgraph is generated
# exactly once, rooted at its minimum vertex, extension candidates
# restricted to ids > root).


def _esu_count(adj: list, size: int, roots, rng=None,
               cut_prob=None, callback=None) -> int:
    """Count connected induced ``size``-subgraphs whose minimum vertex
    is in ``roots`` (ESU, the reference's kernel).  ``cut_prob`` is
    the per-level skip probability vector (RAND-ESU); with a seeded
    ``rng`` the sampling is deterministic — pinned RNG divergence
    from the reference's RNG stream, same distribution.  ``callback``
    (igraph_motifs_randesu_callback) receives each found subgraph's
    sorted vertex list; a truthy return stops the whole search."""
    count = 0
    stop = False
    cp = cut_prob if cut_prob is not None else [0.0] * size

    def keep(level: int) -> bool:
        p = cp[level]
        if p == 0:
            return True
        return rng.random() >= p

    def emit(vs) -> None:
        nonlocal count, stop
        count += 1
        if callback is not None and callback(sorted(vs)):
            stop = True

    for v in sorted(roots):
        if stop:
            break
        ext0 = {u for u in adj[v] if u > v}

        def extend(vs: set, ext: set, level: int):
            if level == size - 1:
                for _u in ext:
                    if stop:
                        return
                    if keep(level):
                        emit(vs | {_u})
                return
            ext = set(ext)
            while ext and not stop:
                w = ext.pop()
                if not keep(level):
                    continue
                # exclusive neighborhood of w wrt vs
                nbh = set().union(*(adj[x] for x in vs)) | vs
                ext2 = ext | {u for u in adj[w]
                              if u > v and u not in nbh and u != w}
                extend(vs | {w}, ext2, level + 1)

        if size == 1:
            if keep(0):
                emit({v})
            continue
        extend({v}, ext0, 1)
    return count


def motifs_randesu_no(edges, n: int, size: int = 3,
                      P: int = DEFAULT_PARTITIONS) -> int:
    """Total number of connected induced ``size``-subgraphs
    (igraph_motifs_randesu_no, src/motifs.c:336 — exact ESU count).
    Driver kernel over the collapsed undirected support (one
    distributed distinct pass)."""
    from .separators import collapse_support

    adj = collapse_support(edges, n, P=P)
    return _esu_count(adj, size, range(n))


def motifs_randesu_callback(edges, n: int, callback, size: int = 3,
                            cut_prob=None, seed: int = 42,
                            P: int = DEFAULT_PARTITIONS) -> int:
    """Invoke ``callback(vertex_list)`` for every connected induced
    ``size``-subgraph (igraph_motifs_randesu_callback,
    src/motifs.c:200-334); a truthy return stops the search, like the
    reference's nonzero-callback-return contract.  Returns the number
    of subgraphs visited.  ``cut_prob`` samples RAND-ESU style with a
    seeded generator (pinned RNG divergence)."""
    from .separators import collapse_support

    adj = collapse_support(edges, n, P=P)
    rng = np.random.default_rng(seed) if cut_prob is not None else None
    return _esu_count(adj, size, range(n), rng=rng, cut_prob=cut_prob,
                      callback=callback)


def motifs_randesu_estimate(
    edges, n: int, size: int = 3, sample_size: int | None = None,
    sample=None, seed: int = 42, cut_prob=None,
    P: int = DEFAULT_PARTITIONS,
) -> float:
    """Estimated total connected induced ``size``-subgraph count from
    a vertex sample (igraph_motifs_randesu_estimate,
    src/motifs.c:420-520): count subgraphs ROOTED (minimum vertex) at
    sampled vertices, scale by n / sample_size.  ``sample`` overrides
    ``sample_size``; seeded numpy sampling replaces the reference's
    RNG (pinned divergence)."""
    from .separators import collapse_support

    rng = np.random.default_rng(seed)
    if sample is None:
        if sample_size is None:
            raise ValueError("need sample_size or sample")
        sample = np.sort(rng.choice(n, size=sample_size, replace=False))
    else:
        sample = np.asarray(sample, dtype=np.int64)
        sample_size = len(sample)
    adj = collapse_support(edges, n, P=P)
    cnt = _esu_count(adj, size, sample.tolist(), rng=rng,
                     cut_prob=cut_prob)
    return cnt * (n / sample_size)
