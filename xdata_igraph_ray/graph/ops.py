"""Relational graph operators (reference src/operators.c, conversions
src/conversion.c, structural predicates src/structural_properties.c).

All operate on (src, dst[, weight]) edge Datasets and return Datasets;
set semantics are igraph's: ``union``/``intersection``/``difference``
work on the edge sets of graphs over the same vertex id space
(src/operators.c:705,418,922 — multiplicities collapse, matching the
sorted-merge igraph_i_merge semantics of distinct edge rows);
``disjoint_union`` shifts the second graph's ids
(src/operators.c:71-184); ``compose`` is relational composition
g1 o g2 (src/operators.c:1151-1215).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
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
def _apply(fn, tbl):
    return fn(tbl)


def _refs(ds):
    if isinstance(ds, list):
        return ds
    if isinstance(ds, pa.Table):
        return [ray.put(ds)]
    return block_refs(ds)


def edge_union(g1, g2, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Edges present in either graph (igraph_union, src/operators.c:705)."""
    return distinct(_refs(g1) + _refs(g2), ["src", "dst"], P=P)


def edge_intersection(g1, g2, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Edges present in both (igraph_intersection, src/operators.c:418)."""
    a = distinct(_refs(g1), ["src", "dst"], P=P, as_refs=True)
    b = distinct(_refs(g2), ["src", "dst"], P=P, as_refs=True)
    return hash_join(a, b, keys=["src", "dst"], how="left semi", P=P)


def edge_difference(g1, g2, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Edges of g1 not in g2 (igraph_difference, src/operators.c:922)."""
    a = distinct(_refs(g1), ["src", "dst"], P=P, as_refs=True)
    b = distinct(_refs(g2), ["src", "dst"], P=P, as_refs=True)
    return hash_join(a, b, keys=["src", "dst"], how="left anti", P=P)


def disjoint_union(g1, g2, n1: int, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Relabel g2 ids by +n1 and concatenate
    (igraph_disjoint_union, src/operators.c:71)."""

    def shift(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.add(t["src"], n1),
                "dst": pc.add(t["dst"], n1),
                **{c: t[c] for c in t.column_names if c not in ("src", "dst")},
            }
        )

    shifted = [_apply.remote(shift, r) for r in _refs(g2)]
    return to_dataset(_refs(g1) + shifted)


def compose(g1, g2, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Edges (a, c) where a->b in g1 and b->c in g2
    (igraph_compose, src/operators.c:1151)."""

    def as_mid_left(t):
        return pa.table({"a": t["src"], "mid": t["dst"]})

    def as_mid_right(t):
        return pa.table({"mid": t["src"], "c": t["dst"]})

    left = [_apply.remote(as_mid_left, r) for r in _refs(g1)]
    right = [_apply.remote(as_mid_right, r) for r in _refs(g2)]
    joined = hash_join(left, right, keys=["mid"], P=P, as_refs=True)

    def project(t):
        return pa.table({"src": t["a"], "dst": t["c"]})

    return distinct([_apply.remote(project, r) for r in joined], ["src", "dst"], P=P)


# ---------------------------------------------------------------------------
# conversions (reference src/conversion.c)


def to_undirected(edges, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Each directed edge becomes a canonical (min,max) pair, collapsed
    (igraph_to_undirected COLLAPSE mode, src/conversion.c:441)."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.table(
            {"src": np.minimum(s, d), "dst": np.maximum(s, d)}
        )

    return distinct([_apply.remote(canon, r) for r in _refs(edges)], ["src", "dst"], P=P)


def to_directed_mutual(edges) -> Dataset:
    """Each undirected edge becomes both arcs
    (igraph_to_directed MUTUAL mode, src/conversion.c:341)."""

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.table(
            {"src": np.concatenate((s, d)), "dst": np.concatenate((d, s))}
        )

    return to_dataset([_apply.remote(both, r) for r in _refs(edges)])


def reverse(edges) -> Dataset:
    """Transpose: swap src/dst."""

    def rev(t: pa.Table) -> pa.Table:
        cols = {"src": t["dst"], "dst": t["src"]}
        for c in t.column_names:
            if c not in ("src", "dst"):
                cols[c] = t[c]
        return pa.table(cols)

    return to_dataset([_apply.remote(rev, r) for r in _refs(edges)])


# ---------------------------------------------------------------------------
# subgraphs / contraction (reference src/structural_properties.c)


def induced_subgraph(
    edges, vertex_ids, P: int = DEFAULT_PARTITIONS, relabel: bool = False
) -> Dataset:
    """Edges with BOTH endpoints in ``vertex_ids``
    (igraph_induced_subgraph, src/structural_properties.c:1942).
    The vertex set is broadcast once via ray.put and probed per batch
    (semi-join by broadcast: no shuffle).  With ``relabel``, ids are
    remapped to 0..k-1 in ascending original order
    (induced_subgraph_map semantics)."""
    vids = np.unique(np.asarray(vertex_ids, dtype=np.int64))
    vref = ray.put(vids)

    @ray.remote
    def filt(t: pa.Table, vs) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = np.isin(s, vs) & np.isin(d, vs)
        out = t.filter(pa.array(keep))
        if relabel:
            s2 = np.searchsorted(vs, out["src"].to_numpy())
            d2 = np.searchsorted(vs, out["dst"].to_numpy())
            cols = {"src": s2, "dst": d2}
            for c in out.column_names:
                if c not in ("src", "dst"):
                    cols[c] = out[c]
            out = pa.table(cols)
        return out

    return to_dataset([filt.remote(r, vref) for r in _refs(edges)])


def subgraph_edges(edges, predicate, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Edges satisfying a vectorized predicate(table)->bool mask
    (igraph_subgraph_edges, src/structural_properties.c:2071)."""

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(np.asarray(predicate(t), dtype=bool)))

    return to_dataset([_apply.remote(filt, r) for r in _refs(edges)])


def contract_vertices(
    edges, mapping: np.ndarray, simplify_result: bool = True,
    P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """Relabel endpoints through ``mapping[vid]`` (igraph_contract_vertices,
    src/structural_properties.c:6235); optionally simplify."""
    mref = ray.put(np.asarray(mapping, dtype=np.int64))

    @ray.remote
    def remap(t: pa.Table, m) -> pa.Table:
        return pa.table(
            {"src": m[t["src"].to_numpy()], "dst": m[t["dst"].to_numpy()]}
        )

    out = [remap.remote(r, mref) for r in _refs(edges)]
    if simplify_result:
        from .build import simplify

        return simplify(out, P=P)
    return to_dataset(out)


def linegraph(edges, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Line graph of a directed graph: edge ids are row positions of
    the input in (src, dst, position) order; L has an arc e1->e2 when
    head(e1) == tail(e2) (igraph_linegraph,
    src/structural_properties.c:3958).  Edge ids are assigned by the
    distributed sorted-rank machinery, so the result is deterministic."""
    from .build import sorted_ranks

    refs = _refs(edges)

    def tag(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "dst": t["dst"]})

    # simple-graph edge ids: rank by (src, dst) over the distinct edge
    # set (multi-edges collapse; run simplify explicitly if that
    # matters — the reference keeps multis, documented v1 divergence)
    tagged = distinct([_apply.remote(tag, r) for r in refs],
                      ["src", "dst"], P=P, as_refs=True)

    # rank directly on the (src, dst) pair — packed scalar keys would
    # collide once vids exceed the pack width (ADVICE round 1)
    ranked = sorted_ranks(tagged, ["src", "dst"], rank_name="eid",
                          P=P, as_refs=True)
    left = [
        _apply.remote(
            lambda t: pa.table({"mid": t["dst"], "e1": t["eid"]}), r
        )
        for r in ranked
    ]
    right = [
        _apply.remote(
            lambda t: pa.table({"mid": t["src"], "e2": t["eid"]}), r
        )
        for r in ranked
    ]
    joined = hash_join(left, right, keys=["mid"], P=P, as_refs=True)
    return to_dataset([
        _apply.remote(lambda t: pa.table({"src": t["e1"], "dst": t["e2"]}), r)
        for r in joined
    ])


# ---------------------------------------------------------------------------
# predicates / scalars (reference src/structural_properties.c)


def count_multiple(edges, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """(src, dst, count) multiplicity per distinct edge
    (igraph_count_multiple, src/structural_properties.c:3624)."""
    return groupby_agg(_refs(edges), ["src", "dst"], [(None, "count", "count")], P=P)


def _scalar_sum(refs, fn) -> float:
    return sum(ray.get([_apply.remote(fn, r) for r in refs]))


def is_simple(edges, P: int = DEFAULT_PARTITIONS) -> bool:
    """No loops, no multi-edges (igraph_is_simple,
    src/structural_properties.c:3404)."""
    refs = _refs(edges)
    loops = _scalar_sum(refs, lambda t: int(
        pc.sum(pc.equal(t["src"], t["dst"])).as_py() or 0))
    if loops:
        return False
    total = _scalar_sum(refs, lambda t: len(t))
    dist = distinct(refs, ["src", "dst"], P=P, as_refs=True)
    dtotal = _scalar_sum(dist, lambda t: len(t))
    return total == dtotal


def edge_count(edges) -> int:
    return int(_scalar_sum(_refs(edges), lambda t: len(t)))


def is_loop(edges) -> Dataset:
    """Per-edge loop flags in input row order (igraph_is_loop,
    src/structural_properties.c:3454): (edge_id, is_loop)."""

    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "is_loop": pc.equal(t["src"], t["dst"]),
        })

    ds = edges if not isinstance(edges, list) else to_dataset(edges)
    return ds.map_batches(flag, batch_format="pyarrow")


def is_multiple(edges, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """igraph_is_multiple (src/structural_properties.c:3562): an edge
    is flagged iff an EARLIER edge (smaller edge id) with the same
    endpoints exists — every duplicate copy except the first.
    Returns (src, dst, dup_rank, is_multiple); dup_rank is the copy
    index within the (src, dst) group in input order."""
    refs = _refs(edges)
    # tag rows with a global sequence per block, then rank per key
    tagged = []
    base = 0
    sizes = ray.get([_apply.remote(lambda t: len(t), r) for r in refs])
    for r, sz in zip(refs, sizes):
        tagged.append(_apply.remote(
            lambda t, b=base: t.append_column(
                "eid", pa.array(b + np.arange(len(t)), pa.int64())), r))
        base += sz

    def rank(t: pa.Table) -> pa.Table:
        order = np.lexsort((t["eid"].to_numpy(), t["dst"].to_numpy(),
                            t["src"].to_numpy()))
        s = t["src"].to_numpy()[order]
        d = t["dst"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, (s[1:] != s[:-1])
                                      | (d[1:] != d[:-1])])
        lens = np.diff(np.r_[starts, len(s)])
        rk = np.arange(len(s)) - np.repeat(starts, lens)
        return pa.table({"src": s, "dst": d,
                         "eid": t["eid"].to_numpy()[order],
                         "dup_rank": rk,
                         "is_multiple": rk > 0})

    return exchange(tagged, ["src", "dst"], P=P, reduce_fn=rank)


def has_multiple(edges, P: int = DEFAULT_PARTITIONS) -> bool:
    """igraph_has_multiple: any duplicated (src, dst) pair."""
    cm = count_multiple(edges, P=P)
    return int(cm.max("count") or 0) > 1


def get_edgelist(edges) -> Dataset:
    """igraph_get_edgelist (src/conversion.c:287) — the edge table in
    edge-id order IS this engine's native representation; this
    projects the endpoint columns."""
    ds = edges if not isinstance(edges, list) else to_dataset(edges)
    return ds.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow")


def density(edges, n: int, directed: bool = True, loops: bool = False) -> float:
    """igraph_density (src/structural_properties.c:2774)."""
    m = edge_count(edges)
    if loops:
        denom = n * n if directed else n * (n + 1) / 2
    else:
        denom = n * (n - 1) if directed else n * (n - 1) / 2
    return m / denom if denom else float("nan")


def reciprocity(edges, P: int = DEFAULT_PARTITIONS) -> float:
    """Fraction of non-loop edges with a reciprocal arc
    (igraph_reciprocity ignore-loops default,
    src/structural_properties.c:2346)."""
    refs = _refs(edges)

    def noloop(t):
        return t.filter(pc.invert(pc.equal(t["src"], t["dst"])))

    nl = [_apply.remote(noloop, r) for r in refs]
    dist = distinct(nl, ["src", "dst"], P=P, as_refs=True)

    def swap(t):
        return pa.table({"src": t["dst"], "dst": t["src"]})

    swapped = [_apply.remote(swap, r) for r in dist]
    mutual = hash_join(dist, swapped, keys=["src", "dst"], how="left semi",
                       P=P, as_refs=True)
    m = _scalar_sum(dist, lambda t: len(t))
    mu = _scalar_sum(mutual, lambda t: len(t))
    return mu / m if m else float("nan")


def get_adjacency_sparse(
    edges: Dataset | list, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(src, dst, count): the sparse adjacency matrix —
    igraph_get_adjacency_sparse (src/conversion.c:201); counts are
    edge multiplicities."""
    return count_multiple(edges, P=P)


def get_adjacency(edges: Dataset | list, n: int) -> np.ndarray:
    """Dense n x n multiplicity matrix (igraph_get_adjacency,
    src/conversion.c:69).  Driver-side dense output — small-n only by
    nature; the scale path is get_adjacency_sparse."""
    if n > 20_000:
        raise ValueError("dense adjacency is a small-n export; use "
                         "get_adjacency_sparse")
    df = count_multiple(edges, P=4).to_pandas()
    m = np.zeros((n, n), dtype=np.int64)
    m[df["src"].to_numpy(), df["dst"].to_numpy()] = df["count"].to_numpy()
    return m


def get_stochastic(
    edges: Dataset | list,
    column_wise: bool = False,
    P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """(src, dst, p): the row- (or column-) stochastic adjacency —
    igraph_get_stochastic (src/conversion.c:741): multiplicity divided
    by the out-degree (in-degree when column_wise)."""
    refs = _refs(edges)
    counts = count_multiple(refs, P=P)
    key = "dst" if column_wise else "src"
    deg = groupby_agg(
        refs, [key], [(None, "count", "deg")], P=P, as_refs=True
    )
    j = hash_join(block_refs(counts), deg, keys=[key], P=P, as_refs=True)

    @ray.remote
    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"], "dst": t["dst"],
                "p": t["count"].to_numpy() / t["deg"].to_numpy(),
            }
        )

    return to_dataset([norm.remote(r) for r in j])


@ray.remote
def _complement_range(lo: int, hi: int, n: int, loops: bool,
                      *edge_parts) -> pa.Table:
    """Complement rows for sources in [lo, hi): output-bound work —
    the complement is Theta(n^2) EDGES no matter the algorithm (the
    reference materializes the same, src/operators.c:1058); this
    shards that output by source range."""
    have = [t for t in edge_parts if t is not None and len(t)]
    rows = hi - lo
    mat = np.zeros((rows, n), dtype=bool)
    for t in have:
        s = t["src"].to_numpy() - lo
        d = t["dst"].to_numpy()
        mat[s, d] = True
    if not loops:
        idx = np.arange(lo, hi)
        mat[np.arange(rows), idx] = True
    src, dst = np.nonzero(~mat)
    return pa.table({"src": src + lo, "dst": dst})


def complementer(edges, n: int, loops: bool = False, P: int = 8,
                 max_vertices: int = 100_000):
    """igraph_complementer (src/operators.c:1058): the edge set of the
    complement graph, sharded by source range (each task emits its
    range's complement rows).  Output is Theta(n^2) edges — guarded by
    ``max_vertices`` because at web scale the complement of a sparse
    graph is essentially the complete graph and should never be
    materialized."""
    if n > max_vertices:
        raise ValueError(
            f"complementer: n={n} exceeds max_vertices={max_vertices}; "
            "the complement has ~n^2 edges"
        )
    from ..exchange import block_refs, to_dataset

    if isinstance(edges, pa.Table):
        refs = [ray.put(edges)]
    else:
        refs = edges if isinstance(edges, list) else block_refs(edges)
    P = max(1, min(P, n))
    bounds = np.linspace(0, n, P + 1).astype(np.int64)
    parts = [
        _route_src.options(num_returns=P if P > 1 else 1).remote(r, bounds)
        for r in refs
    ]
    parts = [[p] if P == 1 else p for p in parts]
    out = [
        _complement_range.remote(
            int(bounds[q]), int(bounds[q + 1]), n, loops,
            *[pt[q] for pt in parts]
        )
        for q in range(P)
    ]
    return to_dataset(out)


@ray.remote
def _route_src(tbl: pa.Table, bounds):
    src = tbl["src"].to_numpy()
    P = len(bounds) - 1
    part = np.searchsorted(bounds, src, side="right") - 1
    order = np.argsort(part, kind="stable")
    t = tbl.take(pa.array(order))
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    out = [t.slice(cuts[p], cuts[p + 1] - cuts[p]) for p in range(P)]
    return tuple(out) if P > 1 else out[0]


def get_laplacian(
    edges: Dataset | list,
    weighted: bool = False,
    normalized: str | None = None,
    P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """Sparse COO Laplacian (igraph_laplacian,
    src/spectral_properties.c:272): loops ignored; diagonal = out-
    strength; off-diagonal (i, j) = -multiplicity (or -sum of weights).
    ``normalized='out'`` divides row i by d_i and sets the diagonal to
    1 where d_i > 0 (the reference's directed rule,
    spectral_properties.c:95-135); ``'sym'`` uses -w/sqrt(d_i d_j)
    (the undirected rule, :186-220 — pass a symmetric edge table).
    Output rows (src, dst, value), diagonal included, zero off-diagonal
    pairs absent."""
    refs = _refs(edges)

    def noloop(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t["src"], t["dst"]))
        t = t.filter(keep)
        w = (
            pc.cast(t["weight"], pa.float64())
            if weighted and "weight" in t.column_names
            else pa.array(np.ones(len(t), np.float64))
        )
        return pa.table({"src": t["src"], "dst": t["dst"], "w": w})

    nl = [_apply.remote(noloop, r) for r in refs]
    adj = groupby_agg(nl, ["src", "dst"], [("w", "sum", "w")], P=P,
                      as_refs=True)
    deg = groupby_agg(nl, ["src"], [("w", "sum", "d")], P=P, as_refs=True)

    if normalized is None:
        @ray.remote
        def off(t: pa.Table) -> pa.Table:
            return pa.table(
                {"src": t["src"], "dst": t["dst"],
                 "value": pc.negate(t["w"])}
            )

        @ray.remote
        def diag(t: pa.Table) -> pa.Table:
            return pa.table(
                {"src": t["src"], "dst": t["src"], "value": t["d"]}
            )

        return to_dataset(
            [off.remote(r) for r in adj] + [diag.remote(r) for r in deg]
        )

    if normalized not in ("out", "sym"):
        raise ValueError("normalized must be None, 'out' or 'sym'")
    j = hash_join(adj, deg, keys=["src"], P=P, as_refs=True)
    if normalized == "sym":
        def rname(t: pa.Table) -> pa.Table:
            return pa.table({"dst2": t["src"], "d2": t["d"]})

        j = hash_join(
            j, [_apply.remote(rname, r) for r in deg],
            keys=["dst"], right_keys=["dst2"], P=P, as_refs=True,
        )

    @ray.remote
    def off_n(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy()
        d = t["d"].to_numpy()
        v = (
            -w / np.sqrt(d * t["d2"].to_numpy())
            if "d2" in t.column_names else -w / d
        )
        return pa.table({"src": t["src"], "dst": t["dst"], "value": v})

    @ray.remote
    def diag_n(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"], "dst": t["src"],
                "value": pa.array(
                    np.ones(len(t), np.float64), pa.float64()
                ),
            }
        )

    return to_dataset(
        [off_n.remote(r) for r in j] + [diag_n.remote(r) for r in deg]
    )


def are_connected(edges: Dataset | list, u: int, v: int,
                  P: int = DEFAULT_PARTITIONS) -> bool:
    """igraph_are_connected: does the arc (u, v) exist (directed
    probe over the distributed edge table)."""
    refs = _refs(edges)

    def probe(t: pa.Table) -> bool:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return bool(((s == u) & (d == v)).any())

    return any(ray.get([_apply.remote(probe, r) for r in refs]))


def unfold_tree(
    edges: Dataset | list, n: int, roots, mode: str = "out",
    P: int = DEFAULT_PARTITIONS,
):
    """igraph_unfold_tree (src/structural_properties.c): BFS from the
    roots; the first edge reaching a vertex keeps it, every later
    edge that would re-visit a seen vertex gets a fresh COPY of that
    endpoint, so the reachable part unfolds into a forest.  Returns
    (tree_edges Table (src, dst), vertex_index array mapping every
    output vertex to its original).  Pinned divergence: incident
    edges are visited in sorted (src, dst) order rather than the
    reference's edge-id order — same structure, copy numbering may
    differ.  Driver kernel over the collapsed arc list."""
    from collections import deque

    refs = _refs(edges)

    def arcs_of(t: pa.Table):
        return t["src"].to_numpy(), t["dst"].to_numpy()

    parts = ray.get([_apply.remote(arcs_of, r) for r in refs])
    s = np.concatenate([p[0] for p in parts]) if parts else \
        np.empty(0, np.int64)
    d = np.concatenate([p[1] for p in parts]) if parts else \
        np.empty(0, np.int64)
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    ne = len(s)
    # incidence per the traversal mode
    inc: list[list[int]] = [[] for _ in range(n)]
    for ei in range(ne):
        if mode in ("out", "all"):
            inc[s[ei]].append(ei)
        if mode in ("in", "all"):
            inc[d[ei]].append(ei)
    out_s = s.copy()
    out_d = d.copy()
    vertex_index = list(range(n))
    seen_v = np.zeros(n, dtype=bool)
    seen_e = np.zeros(ne, dtype=bool)
    v_ptr = n
    for root in np.atleast_1d(np.asarray(roots, np.int64)).tolist():
        if seen_v[root]:
            continue
        seen_v[root] = True
        q = deque([root])
        while q:
            act = q.popleft()
            for ei in inc[act]:
                if seen_e[ei]:
                    continue
                seen_e[ei] = True
                frm, to = int(s[ei]), int(d[ei])
                nei = to if frm == act else frm
                if not seen_v[nei]:
                    seen_v[nei] = True
                    q.append(nei)
                else:
                    vertex_index.append(nei)
                    if frm == nei:
                        out_s[ei] = v_ptr
                    else:
                        out_d[ei] = v_ptr
                    v_ptr += 1
    tree = pa.table({"src": out_s, "dst": out_d})
    return tree, np.asarray(vertex_index, np.int64)


def permute_vertices(edges, perm) -> "Dataset":
    """Relabel vertices: new id of v = perm[v]
    (igraph_permute_vertices, src/topology.c)."""
    import ray as _ray

    from ..exchange import block_refs as _brefs, to_dataset as _tods

    perm = np.asarray(perm, dtype=np.int64)
    pref = _ray.put(perm)

    @_ray.remote
    def relabel(p, t: pa.Table) -> pa.Table:
        cols = dict(zip(t.column_names, t.columns))
        cols["src"] = pa.array(p[t["src"].to_numpy()], pa.int64())
        cols["dst"] = pa.array(p[t["dst"].to_numpy()], pa.int64())
        return pa.table(cols)

    refs = edges if isinstance(edges, list) else _brefs(edges)
    return _tods([relabel.remote(pref, r) for r in refs])


def sort_vertex_ids_by_degree(
    edges, n: int, mode: str = "all", order: str = "desc",
    P: int = 8,
) -> np.ndarray:
    """Vertex ids sorted by degree
    (igraph_sort_vertex_ids_by_degree, src/centrality.c — ties by
    ascending vid, the stable-sort rule).  ``mode``: out / in /
    all."""
    import ray as _ray

    from ..exchange import block_refs as _brefs, groupby_agg

    refs = edges if isinstance(edges, list) else _brefs(edges)

    @_ray.remote
    def pick(t: pa.Table) -> pa.Table:
        if mode == "out":
            v = t["src"].to_numpy()
        elif mode == "in":
            v = t["dst"].to_numpy()
        else:
            v = np.concatenate((t["src"].to_numpy(), t["dst"].to_numpy()))
        return pa.table({"vid": v})

    deg = groupby_agg([pick.remote(r) for r in refs], ["vid"],
                      [(None, "count", "deg")], P=P).to_pandas()
    full = np.zeros(n, dtype=np.int64)
    full[deg["vid"].to_numpy()] = deg["deg"].to_numpy()
    key = -full if order == "desc" else full
    return np.lexsort((np.arange(n), key)).astype(np.int64)


def edge_union_many(graphs, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Edges present in ANY of the graphs (igraph_union_many,
    src/operators.c:233 — the sorted-merge over N edge lists is one
    distinct over the concatenated refs here)."""
    refs: list = []
    for g in graphs:
        refs.extend(_refs(g))
    return distinct(refs, ["src", "dst"], P=P)


def edge_intersection_many(graphs, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """Edges present in ALL graphs (igraph_intersection_many,
    src/operators.c:537): a fold of semi-joins, smallest-first would
    be the scale order but the reference keeps input order — kept."""
    graphs = list(graphs)
    if not graphs:
        raise ValueError("edge_intersection_many needs >= 1 graph")
    acc = distinct(_refs(graphs[0]), ["src", "dst"], P=P, as_refs=True)
    for g in graphs[1:]:
        b = distinct(_refs(g), ["src", "dst"], P=P, as_refs=True)
        acc = hash_join(acc, b, keys=["src", "dst"], how="left semi",
                        P=P, as_refs=True)
    return to_dataset(acc)


def disjoint_union_many(graphs, ns, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """N-ary disjoint union (igraph_disjoint_union_many,
    src/operators.c:137): graph k's ids shift by sum(ns[:k])."""
    graphs = list(graphs)
    ns = list(ns)
    if len(graphs) != len(ns):
        raise ValueError("need one vertex count per graph")
    out: list = []
    off = 0
    for g, n in zip(graphs, ns):
        shift = np.int64(off)

        def _sh(t: pa.Table, shift=shift) -> pa.Table:
            cols = {
                "src": pc.add(t["src"], shift),
                "dst": pc.add(t["dst"], shift),
            }
            for c in t.column_names:
                if c not in ("src", "dst"):
                    cols[c] = t[c]
            return pa.table(cols)

        out.extend(_apply.remote(_sh, r) for r in _refs(g))
        off += int(n)
    return to_dataset(out)


def neighborhood_graphs(
    edges, n: int, vids, order: int = 1, mode: str = "out",
    relabel: bool = False, P: int = DEFAULT_PARTITIONS,
) -> list[Dataset]:
    """Induced subgraph of each seed's <=order-hop neighborhood
    (igraph_neighborhood_graphs, src/structural_properties.c:3016) —
    one bounded BFS + broadcast semi-join per seed, like the
    reference's per-vertex loop."""
    from .engine import GraphEngine
    from .paths import neighborhood

    refs = _refs(edges)
    eng = GraphEngine.from_edges(refs, n=n, P=P)
    try:
        hoods = neighborhood(eng, vids, order=order, mode=mode)
    finally:
        eng.shutdown()
    return [
        induced_subgraph(refs, h, P=P, relabel=relabel) for h in hoods
    ]


def _edge_arrays(edges) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(edges, pa.Table):
        return edges["src"].to_numpy(), edges["dst"].to_numpy()
    tbl = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow")]
    )
    return tbl["src"].to_numpy(), tbl["dst"].to_numpy()


def get_eid(edges, frm: int, to: int, directed: bool = True,
            error: bool = True) -> int:
    """igraph_get_eid (src/type_indexededgelist.c:1137): the edge id
    (= row index, the engine's edge-id convention) of (frm, to).
    Directed graphs with ``directed=False`` also try (to, frm).  With
    parallel edges the SMALLEST id is returned (pinned; the reference
    returns whichever its sorted index lands on).  -1 / ValueError
    when absent."""
    out = get_eids(edges, [(frm, to)], directed=directed, error=error)
    return int(out[0])


def _pack_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Lexicographic (a, b) sort key as a 16-byte void column.  Big-endian
    uint64 halves make the bytewise void comparison equal int order for
    non-negative values, covering the whole int64 vertex-id range."""
    out = np.empty((len(a), 2), dtype=">u8")
    out[:, 0] = a.astype(np.uint64)
    out[:, 1] = b.astype(np.uint64)
    return np.ascontiguousarray(out).view("V16").ravel()


def get_eids(edges, pairs, directed: bool = True,
             error: bool = True) -> np.ndarray:
    """igraph_get_eids / _pairs (src/type_indexededgelist.c:1338):
    vectorized endpoint->edge-id lookup; one lexsort + searchsorted,
    no per-pair scan."""
    s, d = _edge_arrays(edges)
    q = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    if not directed:
        lo = np.minimum(s, d); hi = np.maximum(s, d)
        s, d = lo, hi
        qlo = np.minimum(q[:, 0], q[:, 1]); qhi = np.maximum(q[:, 0], q[:, 1])
        q = np.stack([qlo, qhi], axis=1)
    order = np.lexsort((np.arange(len(s)), d, s))  # ties -> smallest eid
    ss, dd = s[order], d[order]
    # Two-column key via a big-endian byte view: bytewise void compare
    # orders (s, d) lexicographically for any non-negative int64, so no
    # 2^31 overflow / 2^32 collision (the packed-scalar pitfall noted at
    # the linegraph builder above).
    left = np.searchsorted(_pack_pairs(ss, dd), _pack_pairs(q[:, 0], q[:, 1]),
                           side="left")
    eids = np.full(len(q), -1, dtype=np.int64)
    ok = (left < len(ss))
    ok[ok] &= (ss[left[ok]] == q[ok, 0]) & (dd[left[ok]] == q[ok, 1])
    eids[ok] = order[left[ok]]
    if error and (eids < 0).any():
        missing = q[eids < 0][:3].tolist()
        raise ValueError(f"no such edge(s): {missing}")
    return eids


def get_eids_multi(edges, pairs, directed: bool = True,
                   error: bool = True) -> np.ndarray:
    """igraph_get_eids_multi (src/type_indexededgelist.c:1604):
    repeated identical query pairs consume DISTINCT parallel edge
    ids, in ascending-id order; runs out -> -1 / error."""
    s, d = _edge_arrays(edges)
    q = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    if not directed:
        s, d = np.minimum(s, d), np.maximum(s, d)
        q = np.stack([np.minimum(q[:, 0], q[:, 1]),
                      np.maximum(q[:, 0], q[:, 1])], axis=1)
    from collections import defaultdict
    by_pair: dict[tuple[int, int], list[int]] = defaultdict(list)
    order = np.lexsort((np.arange(len(s)), d, s))
    for e in order:
        by_pair[(int(s[e]), int(d[e]))].append(int(e))
    used: dict[tuple[int, int], int] = defaultdict(int)
    eids = np.full(len(q), -1, dtype=np.int64)
    for i, (a, b) in enumerate(map(tuple, q.tolist())):
        lst = by_pair.get((a, b), ())
        k = used[(a, b)]
        if k < len(lst):
            eids[i] = lst[k]
            used[(a, b)] += 1
    if error and (eids < 0).any():
        raise ValueError("not enough parallel edges for repeated pairs")
    return eids


def get_eids_path(edges, path, directed: bool = True,
                  error: bool = True) -> np.ndarray:
    """igraph_get_eids over consecutive path vertices
    (src/type_indexededgelist.c:1295 _path variant)."""
    path = np.asarray(path, dtype=np.int64)
    pairs = np.stack([path[:-1], path[1:]], axis=1)
    return get_eids(edges, pairs, directed=directed, error=error)


def delete_vertices(edges, n: int, vids) -> tuple[pa.Table, np.ndarray]:
    """igraph_delete_vertices(_idx) (src/type_indexededgelist.c:416):
    drop the given vertices and every incident edge; survivors are
    renumbered downward preserving order.  Returns (edges, idx) where
    idx[old] = new id + 1 and 0 marks a deleted vertex — the
    reference's recoding convention."""
    kill = np.zeros(n, dtype=bool)
    kill[np.asarray(list(vids), dtype=np.int64)] = True
    idx = np.zeros(n, dtype=np.int64)
    idx[~kill] = np.arange(1, int((~kill).sum()) + 1)
    if isinstance(edges, pa.Table):
        tbl = edges
    else:
        tbl = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    s = tbl["src"].to_numpy()
    d = tbl["dst"].to_numpy()
    keep = ~(kill[s] | kill[d])
    out = tbl.filter(pa.array(keep))
    cols = {"src": idx[out["src"].to_numpy()] - 1,
            "dst": idx[out["dst"].to_numpy()] - 1}
    for c in out.column_names:
        if c not in ("src", "dst"):
            cols[c] = out[c]
    return pa.table(cols), idx


def delete_edges(edges, eids) -> pa.Table:
    """igraph_delete_edges (src/type_indexededgelist.c:258): drop the
    given edge ids (= row indices); remaining edges keep their
    relative order (their ids shift down, like the reference's
    rebuild)."""
    if isinstance(edges, pa.Table):
        tbl = edges
    else:
        tbl = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    keep = np.ones(tbl.num_rows, dtype=bool)
    keep[np.asarray(list(eids), dtype=np.int64)] = False
    return tbl.filter(pa.array(keep))


def add_edges(edges, new_src, new_dst) -> pa.Table:
    """igraph_add_edges (src/type_indexededgelist.c:258): append rows;
    new edges get the next ids (row order)."""
    if isinstance(edges, pa.Table):
        tbl = edges.select(["src", "dst"])
    else:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow"))
        ).select(["src", "dst"])
    extra = pa.table({"src": np.asarray(new_src, np.int64),
                      "dst": np.asarray(new_dst, np.int64)})
    return pa.concat_tables([tbl, extra])
