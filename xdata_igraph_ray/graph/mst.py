"""Minimum spanning tree / forest via distributed Boruvka rounds.

Reference: src/spanning_trees.c — igraph_minimum_spanning_tree (:78,
dispatches on weights), igraph_minimum_spanning_tree_unweighted (:123,
BFS tree) and igraph_minimum_spanning_tree_prim (:187, heap-based
Prim).  Prim is inherently sequential (one growing frontier), so this
engine uses Boruvka instead — a pinned divergence: for distinct edge
weights the MST (hence the edge set) is identical; with ties both
produce *a* minimum-weight spanning forest of equal total weight, ours
deterministically (min (w, a, b) lexicographic selection).

Distributed shape (exchange layer only; the driver sees row counts):
  - edges canonicalized to (a=min, b=max, w), loops dropped, parallel
    edges collapsed to their min weight (what Prim would pick anyway);
  - per Boruvka round: join component labels onto both endpoints,
    keep cross-component edges, per-component argmin outgoing edge
    (grouped reduce), then contract the component merge graph by
    2-cycle breaking + pointer doubling (O(log) joins over a table
    with one row per component);
  - O(log n) rounds, each at least halving the component count, and
    the surviving edge set shrinks to cross-component edges only.
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
    hash_join,
    to_dataset,
)


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


@ray.remote
def _nrows(tbl) -> int:
    return tbl.num_rows


def _refs(ds):
    return ds if isinstance(ds, list) else block_refs(ds)


def _canon(t: pa.Table, weighted: bool = True) -> pa.Table:
    s = t["src"].to_numpy()
    d = t["dst"].to_numpy()
    w = (
        t["weight"].to_numpy().astype(np.float64)
        if weighted and "weight" in t.column_names
        else np.ones(len(t), np.float64)
    )
    keep = s != d
    a = np.minimum(s[keep], d[keep])
    b = np.maximum(s[keep], d[keep])
    return pa.table({"a": a, "b": b, "w": w[keep]})


def _argmin_rows(t: pa.Table, group: list[str], order: list[str]) -> pa.Table:
    """One row per `group` key: the lexicographic min over `order`."""
    if t.num_rows == 0:
        return t
    keys = [t[c].to_numpy() for c in group]
    cols = keys + [t[c].to_numpy() for c in order]
    idx = np.lexsort(tuple(reversed(cols)))
    same = np.ones(len(idx) - 1, np.bool_)
    for k in keys:
        kk = k[idx]
        same &= kk[1:] == kk[:-1]
    first = np.concatenate(([True], ~same))
    return t.take(pa.array(idx[first]))


def minimum_spanning_tree(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
    max_rounds: int = 64, weighted: bool = True,
) -> Dataset:
    """(a, b, w) rows of a minimum-weight spanning forest of the
    undirected view of `edges` (igraph_minimum_spanning_tree,
    src/spanning_trees.c:78; unweighted inputs reproduce the
    _unweighted variant's forest up to tie choice).

    ``weighted=False`` ignores any weight column and computes the
    unweighted spanning forest (the reference dispatches on whether
    weights are supplied, spanning_trees.c:78)."""
    import ray.data as rd

    # canonical simple weighted edge table; parallel edges -> min w
    canon = [
        _apply.remote(lambda t, w=weighted: _canon(t, w), r)
        for r in _refs(edges)
    ]
    combine = lambda t: _argmin_rows(t, ["a", "b"], ["w"])  # noqa: E731
    e_refs = exchange(
        canon, ["a", "b"], P=P, map_fn=combine, reduce_fn=combine,
        as_refs=True,
    )

    # component labels (vid, comp), hash-partitioned by vid
    comp_refs = exchange(
        block_refs(
            rd.range(n).map_batches(
                lambda b: pa.table({"vid": b["id"], "comp": b["id"]}),
                batch_format="numpy",
            )
        ),
        ["vid"], P=P, as_refs=True,
    )

    mst_parts: list = []
    for _ in range(max_rounds):
        # annotate both endpoints with their component labels
        ja = hash_join(e_refs, comp_refs, ["a"], ["vid"], P=P, as_refs=True)

        def ra(t: pa.Table) -> pa.Table:
            return pa.table(
                {"a": t["a"], "b": t["b"], "w": t["w"], "ca": t["comp"]}
            )

        jb = hash_join(
            [_apply.remote(ra, r) for r in ja], comp_refs, ["b"], ["vid"],
            P=P, as_refs=True,
        )

        def rb(t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(pc.equal(t["ca"], t["comp"])))
            return pa.table(
                {
                    "a": t["a"], "b": t["b"], "w": t["w"],
                    "ca": t["ca"], "cb": t["comp"],
                }
            )

        active = [_apply.remote(rb, r) for r in jb]
        if sum(ray.get([_nrows.remote(r) for r in active])) == 0:
            break
        e_refs = active  # only cross-component edges can still matter

        # per-component min outgoing edge, emitted for both sides
        def both(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "comp": np.concatenate(
                        (t["ca"].to_numpy(), t["cb"].to_numpy())
                    ),
                    "other": np.concatenate(
                        (t["cb"].to_numpy(), t["ca"].to_numpy())
                    ),
                    "w": np.tile(t["w"].to_numpy(), 2),
                    "a": np.tile(t["a"].to_numpy(), 2),
                    "b": np.tile(t["b"].to_numpy(), 2),
                }
            )

        pick = lambda t: _argmin_rows(t, ["comp"], ["w", "a", "b"])  # noqa: E731
        sel = exchange(
            [_apply.remote(both, r) for r in active],
            ["comp"], P=P, map_fn=pick, reduce_fn=pick, as_refs=True,
        )

        # selected original edges join the forest (both sides may pick
        # the same edge -> distinct)
        mst_parts.extend(
            distinct(
                [
                    _apply.remote(lambda t: t.select(["a", "b", "w"]), r)
                    for r in sel
                ],
                ["a", "b", "w"], P=P, as_refs=True,
            )
        )

        # contract the merge graph: parent(c) = chosen neighbor comp;
        # break 2-cycles (both picked the same edge) to min(c, p),
        # then pointer-double to the roots
        def par(t: pa.Table) -> pa.Table:
            return pa.table({"c": t["comp"], "p": t["other"]})

        parent = _pointer_double(
            _break_two_cycles([_apply.remote(par, r) for r in sel], P), P
        )

        # relabel: comp -> root(comp); comps without a chosen edge
        # (fully merged already) keep their label via left outer join
        jc = hash_join(
            comp_refs, parent, ["comp"], ["c"], P=P, how="left outer",
            as_refs=True,
        )

        def rc(t: pa.Table) -> pa.Table:
            comp = t["comp"].to_numpy(zero_copy_only=False)
            p = t["p"].to_numpy(zero_copy_only=False).astype(np.float64)
            newc = np.where(np.isnan(p), comp, p).astype(np.int64)
            return pa.table({"vid": t["vid"], "comp": newc})

        comp_refs = exchange(
            [_apply.remote(rc, r) for r in jc], ["vid"], P=P, as_refs=True
        )

    if not mst_parts:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "w": pa.array([], pa.float64()),
            }
        )
        return rd.from_arrow(empty)
    return to_dataset(
        distinct(mst_parts, ["a", "b", "w"], P=P, as_refs=True)
    )


def _rename(cols: dict):
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({new: t[old] for old, new in cols.items()})

    return fn


def _break_two_cycles(parent: list, P: int) -> list:
    """parent(parent(c)) == c  =>  parent(c) = min(c, parent(c))."""
    pr = [_apply.remote(_rename({"c": "c2", "p": "p2"}), r) for r in parent]
    j = hash_join(parent, pr, ["p"], ["c2"], P=P, as_refs=True)

    def fix(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy()
        p = t["p"].to_numpy()
        pp = t["p2"].to_numpy()
        newp = np.where(pp == c, np.minimum(c, p), p)
        return pa.table({"c": c, "p": newp})

    return [_apply.remote(fix, r) for r in j]


def _pointer_double(parent: list, P: int, max_iter: int = 40) -> list:
    """Iterate p <- parent[p] (roots keep p via left outer) until no
    row changes; O(log depth) iterations."""

    @ray.remote(num_returns=2)
    def step(t: pa.Table):
        p = t["p"].to_numpy(zero_copy_only=False)
        pp = t["p2"].to_numpy(zero_copy_only=False).astype(np.float64)
        newp = np.where(np.isnan(pp), p, pp).astype(np.int64)
        return (
            pa.table({"c": t["c"], "p": newp}),
            int((newp != p).sum()),
        )

    for _ in range(max_iter):
        pr = [
            _apply.remote(_rename({"c": "c2", "p": "p2"}), r)
            for r in parent
        ]
        j = hash_join(parent, pr, ["p"], ["c2"], P=P, how="left outer",
                      as_refs=True)
        outs = [step.remote(r) for r in j]
        parent = [o[0] for o in outs]
        if sum(ray.get([o[1] for o in outs])) == 0:
            break
    return parent
