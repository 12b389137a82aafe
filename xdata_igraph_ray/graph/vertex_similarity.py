"""Vertex similarity: cocitation, bibliographic coupling, Jaccard /
Dice similarity and Adamic-Adar inverse-log-weighted similarity.

Reference: src/cocitation.c — igraph_cocitation (:68, pivot = each
vertex, pairs of its OUT-neighbors), igraph_bibcoupling (:102, pairs
of IN-neighbors), igraph_similarity_inverse_log_weighted (:159, pivot
weight = 1/log(pivot degree in the opposite mode), degree<=1 keeps the
raw degree as weight per the `if (w>1)` guard at :176-179),
igraph_similarity_jaccard (:323) and igraph_similarity_dice via the
sorted-merge intersection helper igraph_i_neisets_intersect (:258).

The reference fills a dense |vids| x n matrix; at web scale that is
impossible, so every function here returns the SPARSE nonzero pairs
``(u, w, value)`` with ``u < w`` — any absent pair is exactly 0
(self-similarities are never emitted, matching src/cocitation.c:121).
Neighborhoods are SETS (multi-edges collapse via a distinct pass);
the reference's neighbor multisets only differ on multigraphs.

Distributed shape (all exchange-layer, no driver materialization):
  edges -> membership rows (item=pivot, vid=member) -> distinct
        -> exchange keyed on item, reduce = vectorized pair expansion
        -> groupby (u, w) sum.
The pivot fan-out (a pivot with g members emits g(g-1)/2 pairs) is the
reference's own O(|V| d^2) cost made explicit; ``max_group`` lets
callers cap hub pivots — skips are counted and logged, never silent.
"""

from __future__ import annotations

import logging

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

log = logging.getLogger(__name__)

# Default hub cap: pair expansion is O(d^2) per pivot, so an uncapped
# 3M-degree hub would emit ~4.5e12 pairs.  Default ON with a generous
# bound (1e5 members -> <=5e9 pairs across the cluster, spread over
# partitions); capped pivots are dropped from numerator AND
# denominator and logged.  Pass max_group=None for exact small-graph
# semantics (the oracle queries at n<=1000 never hit the cap either
# way).
DEFAULT_MAX_GROUP = 100_000


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


def _refs(ds):
    return ds if isinstance(ds, list) else block_refs(ds)


def _membership(edges, item_col: str, vid_col: str, mode: str,
                drop_self: bool, P: int) -> list:
    """Distinct (item, vid) rows: vid is a mode-neighborhood member of
    the pivot item.  mode='all' unions both edge directions."""

    def emit(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        if mode == "all":
            item = np.concatenate((s, d))
            vid = np.concatenate((d, s))
        else:
            item = t[item_col].to_numpy()
            vid = t[vid_col].to_numpy()
        if drop_self:
            keep = item != vid
            item, vid = item[keep], vid[keep]
        return pa.table({"item": item, "vid": vid})

    rows = [_apply.remote(emit, r) for r in _refs(edges)]
    return distinct(rows, ["item", "vid"], P=P, as_refs=True)


def _pair_reduce(weight_fn):
    """Reduce fn for an item-keyed exchange: emit all unordered member
    pairs per pivot group, carrying the pivot's weight.  Hot-pivot
    capping happens upstream in _pair_counts (on the membership) so
    intersection and degree counts stay consistent."""

    def pairs(t: pa.Table) -> pa.Table:
        item = t["item"].to_numpy()
        vid = t["vid"].to_numpy()
        order = np.argsort(item, kind="stable")
        vals = vid[order]
        _, starts, lens = np.unique(
            item[order], return_index=True, return_counts=True
        )
        row_start = np.repeat(starts, lens)
        local = np.arange(len(vals), dtype=np.int64) - row_start
        m = int(local.sum())
        if m == 0:
            return pa.table(
                {
                    "u": np.empty(0, np.int64),
                    "w": np.empty(0, np.int64),
                    "x": np.empty(0, np.float64),
                }
            )
        # pair k belongs to row r (= its right element); its left
        # element is the off-th earlier member of r's group
        row_rep = np.repeat(np.arange(len(vals), dtype=np.int64), local)
        cum = np.concatenate(([0], np.cumsum(local)[:-1]))
        off = np.arange(m, dtype=np.int64) - np.repeat(cum, local)
        a = vals[row_start[row_rep] + off]
        b = vals[row_rep]
        u = np.minimum(a, b)
        w = np.maximum(a, b)
        wt = weight_fn(lens).astype(np.float64)
        x = wt[np.repeat(np.arange(len(lens)), lens)][row_rep]
        return pa.table({"u": u, "w": w, "x": x})

    return pairs


def _filter_hot(max_group: int):
    """Drop every row of pivot groups larger than ``max_group`` —
    applied to item-co-partitioned membership so group sizes are
    global."""

    def f(t: pa.Table) -> pa.Table:
        item = t["item"].to_numpy()
        vid = t["vid"].to_numpy()
        order = np.argsort(item, kind="stable")
        item, vid = item[order], vid[order]
        _, lens = np.unique(item, return_counts=True)
        hot = lens > max_group
        n_hot = int(hot.sum())
        if n_hot:
            log.warning(
                "vertex_similarity: dropping %d pivot(s) with > %d "
                "members (max size %d) from BOTH intersection and "
                "degree counts",
                n_hot, max_group, int(lens.max()),
            )
            keep = np.repeat(~hot, lens)
            item, vid = item[keep], vid[keep]
        return pa.table({"item": item, "vid": vid})

    return f


def _pair_counts(edges, item_col, vid_col, mode, drop_self, weight_fn,
                 max_group, alias, P, as_refs=False):
    """With ``max_group`` set, hot pivots are removed from the
    membership ONCE, so the pair expansion and any degree counts a
    caller derives from the returned membership see the same truncated
    neighborhoods — Jaccard/Dice ratios stay unbiased (they are
    computed as if hot pivot vertices' neighborhoods were deleted,
    rather than undercounting only the numerator)."""
    mem = _membership(edges, item_col, vid_col, mode, drop_self, P)
    if max_group is not None:
        mem = exchange(
            mem, ["item"], P=P, reduce_fn=_filter_hot(max_group),
            as_refs=True,
        )
        pair_refs = [
            _apply.remote(_pair_reduce(weight_fn), r) for r in mem
        ]
    else:
        pair_refs = exchange(
            mem, ["item"], P=P,
            reduce_fn=_pair_reduce(weight_fn), as_refs=True,
        )
    out = groupby_agg(pair_refs, ["u", "w"], [("x", "sum", alias)], P=P,
                      as_refs=as_refs)
    return out, mem


def cocitation(edges: Dataset | list, P: int = DEFAULT_PARTITIONS,
               max_group: int | None = DEFAULT_MAX_GROUP) -> Dataset:
    """(u, w, cnt): number of vertices citing both u and w — pairs of
    each pivot's OUT-neighbor set (igraph_cocitation,
    src/cocitation.c:68 -> cocitation_real mode=IGRAPH_OUT)."""
    out, _ = _pair_counts(
        edges, "src", "dst", "dir", False,
        lambda lens: np.ones(len(lens)), max_group, "cnt", P,
    )
    return out


def bibcoupling(edges: Dataset | list, P: int = DEFAULT_PARTITIONS,
                max_group: int | None = DEFAULT_MAX_GROUP) -> Dataset:
    """(u, w, cnt): number of vertices both u and w cite — pairs of
    each pivot's IN-neighbor set (igraph_bibcoupling,
    src/cocitation.c:102 -> cocitation_real mode=IGRAPH_IN)."""
    out, _ = _pair_counts(
        edges, "dst", "src", "dir", False,
        lambda lens: np.ones(len(lens)), max_group, "cnt", P,
    )
    return out


def similarity_inverse_log_weighted(
    edges: Dataset | list, mode: str = "out",
    P: int = DEFAULT_PARTITIONS, max_group: int | None = DEFAULT_MAX_GROUP,
) -> Dataset:
    """(u, w, sim): common neighbors weighted by 1/log(pivot degree)
    (Adamic-Adar; igraph_similarity_inverse_log_weighted,
    src/cocitation.c:159).  mode='out': u,w's OUT-neighborhoods are
    compared, pivots weighted by IN-degree (doc at :139-147); degree
    <= 1 keeps the raw degree as weight (:176-179).  Degrees are set
    degrees (distinct neighbors)."""

    def ilw(lens: np.ndarray) -> np.ndarray:
        out = lens.astype(np.float64)
        big = lens > 1
        out[big] = 1.0 / np.log(lens[big].astype(np.float64))
        return out

    if mode == "out":
        item_col, vid_col, m = "dst", "src", "dir"
    elif mode == "in":
        item_col, vid_col, m = "src", "dst", "dir"
    else:
        item_col, vid_col, m = "src", "dst", "all"
    out, _ = _pair_counts(
        edges, item_col, vid_col, m, False, ilw, max_group, "sim", P,
    )
    return out


def _jaccard_dice(edges, mode, loops, kind, P, max_group, n=None):
    if mode == "out":
        item_col, vid_col, m = "dst", "src", "dir"
    elif mode == "in":
        item_col, vid_col, m = "src", "dst", "dir"
    else:
        item_col, vid_col, m = "src", "dst", "all"
    if loops:
        # loops=True: every vertex belongs to its own neighborhood
        # (src/cocitation.c jaccard doc) — inject identity rows
        if n is None:
            raise ValueError("loops=True requires n (vertex count)")
        import ray.data as rd

        ident = rd.range(n).map_batches(
            lambda b: pa.table({"src": b["id"], "dst": b["id"]}),
            batch_format="numpy",
        )
        edges = _refs(edges) + block_refs(ident)
    counts, mem = _pair_counts(
        edges, item_col, vid_col, m, not loops,
        lambda lens: np.ones(len(lens)), max_group, "cnt", P,
        as_refs=True,
    )
    deg = groupby_agg(mem, ["vid"], [(None, "count", "d")], P=P,
                      as_refs=True)
    j1 = hash_join(counts, deg, ["u"], ["vid"], P=P, as_refs=True)

    def r1(t: pa.Table) -> pa.Table:
        return pa.table(
            {"u": t["u"], "w": t["w"], "cnt": t["cnt"], "du": t["d"]}
        )

    j1 = [_apply.remote(r1, r) for r in j1]
    j2 = hash_join(j1, deg, ["w"], ["vid"], P=P, as_refs=True)

    def fin(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy().astype(np.float64)
        du = t["du"].to_numpy().astype(np.float64)
        dw = t["d"].to_numpy().astype(np.float64)
        if kind == "jaccard":
            val = c / (du + dw - c)
        else:
            val = 2.0 * c / (du + dw)
        return pa.table(
            {
                "u": t["u"],
                "w": t["w"],
                kind: np.round(val, 9),
            }
        )

    return to_dataset([_apply.remote(fin, r) for r in j2])


def similarity_jaccard(
    edges: Dataset | list, mode: str = "out", loops: bool = False,
    P: int = DEFAULT_PARTITIONS, max_group: int | None = DEFAULT_MAX_GROUP,
    n: int | None = None,
) -> Dataset:
    """(u, w, jaccard): |N(u) & N(w)| / |N(u) | N(w)| over mode
    neighborhood sets (igraph_similarity_jaccard, src/cocitation.c:323;
    merge-intersection semantics of igraph_i_neisets_intersect :258).
    ``loops`` adds each vertex to its own neighborhood (:300-308 doc;
    requires ``n``)."""
    return _jaccard_dice(edges, mode, loops, "jaccard", P, max_group, n)


def similarity_dice(
    edges: Dataset | list, mode: str = "out", loops: bool = False,
    P: int = DEFAULT_PARTITIONS, max_group: int | None = DEFAULT_MAX_GROUP,
    n: int | None = None,
) -> Dataset:
    """(u, w, dice): 2|N(u) & N(w)| / (|N(u)| + |N(w)|)
    (igraph_similarity_dice, src/cocitation.c — defined from the same
    intersection counts as Jaccard)."""
    return _jaccard_dice(edges, mode, loops, "dice", P, max_group, n)


def bipartite_projection(
    edges: Dataset | list, which: str = "first",
    P: int = DEFAULT_PARTITIONS, max_group: int | None = DEFAULT_MAX_GROUP,
) -> Dataset:
    """Weighted one-mode projection of a bipartite edge table
    (igraph_bipartite_projection, src/bipartite.c:198: multiplicity =
    number of shared opposite-side neighbors).  ``which='first'``
    projects onto the src side (u, w share a dst); ``'second'`` onto
    the dst side.  Output (u, w, weight) with u < w, nonzero pairs
    only — the projection of a web-scale bipartite table is emitted
    sparse, never as a dense matrix."""
    if which == "first":
        item, vid = "dst", "src"
    elif which == "second":
        item, vid = "src", "dst"
    else:
        raise ValueError("which must be 'first' or 'second'")
    out, _ = _pair_counts(
        edges, item, vid, "dir", False,
        lambda lens: np.ones(len(lens)), max_group, "weight", P,
    )
    return out


def _pair_neighbor_sets(edges, vids: set, mode: str, P: int):
    """Driver neighbor sets for a selector-sized vid set: one
    distributed filtered pass (broadcast vid set, only incident rows
    come back)."""
    import ray as _ray

    refs = _refs(edges)
    vref = _ray.put(np.fromiter(sorted(vids), dtype=np.int64,
                                count=len(vids)))

    @_ray.remote
    def incident(vs, t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        rows = []
        if mode in ("out", "all"):
            m = np.isin(src, vs)
            rows.append((src[m], dst[m]))
        if mode in ("in", "all"):
            m = np.isin(dst, vs)
            rows.append((dst[m], src[m]))
        return pa.table({
            "vid": np.concatenate([r[0] for r in rows]),
            "nbr": np.concatenate([r[1] for r in rows]),
        })

    out: dict[int, set] = {v: set() for v in vids}
    for t in _ray.get([incident.remote(vref, r) for r in refs]):
        for v, u in zip(t["vid"].to_numpy().tolist(),
                        t["nbr"].to_numpy().tolist()):
            out[v].add(u)
    return out


def similarity_jaccard_pairs(
    edges, pairs, mode: str = "out", loops: bool = False,
    P: int = DEFAULT_PARTITIONS,
) -> np.ndarray:
    """Jaccard similarity for an EXPLICIT pair list
    (igraph_similarity_jaccard_pairs, src/cocitation.c — the
    selector-sized API: |pairs| values, not the sparse all-pairs
    table).  ``loops`` adds each vertex to its own neighborhood, the
    reference's rule; empty unions give 0."""
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    vids = set(pairs[:, 0].tolist()) | set(pairs[:, 1].tolist())
    nbrs = _pair_neighbor_sets(edges, vids, mode, P)
    if loops:
        for v in vids:
            nbrs[v] = nbrs[v] | {v}
    out = np.empty(len(pairs), dtype=np.float64)
    for i, (a, b) in enumerate(pairs.tolist()):
        sa, sb = nbrs[a], nbrs[b]
        union = len(sa | sb)
        out[i] = len(sa & sb) / union if union else 0.0
    return out


def similarity_dice_pairs(
    edges, pairs, mode: str = "out", loops: bool = False,
    P: int = DEFAULT_PARTITIONS,
) -> np.ndarray:
    """Dice similarity for an explicit pair list
    (igraph_similarity_dice_pairs: 2|A&B| / (|A|+|B|); 0 when both
    neighborhoods are empty)."""
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    vids = set(pairs[:, 0].tolist()) | set(pairs[:, 1].tolist())
    nbrs = _pair_neighbor_sets(edges, vids, mode, P)
    if loops:
        for v in vids:
            nbrs[v] = nbrs[v] | {v}
    out = np.empty(len(pairs), dtype=np.float64)
    for i, (a, b) in enumerate(pairs.tolist()):
        sa, sb = nbrs[a], nbrs[b]
        tot = len(sa) + len(sb)
        out[i] = 2.0 * len(sa & sb) / tot if tot else 0.0
    return out


def similarity_jaccard_es(edges, es_pairs, mode: str = "out",
                          loops: bool = False,
                          P: int = DEFAULT_PARTITIONS) -> np.ndarray:
    """igraph_similarity_jaccard_es: similarity of each edge's
    endpoint pair — alias of the pairs API over an edge list."""
    return similarity_jaccard_pairs(edges, es_pairs, mode=mode,
                                    loops=loops, P=P)


def similarity_dice_es(edges, es_pairs, mode: str = "out",
                       loops: bool = False,
                       P: int = DEFAULT_PARTITIONS) -> np.ndarray:
    """igraph_similarity_dice_es."""
    return similarity_dice_pairs(edges, es_pairs, mode=mode,
                                 loops=loops, P=P)
