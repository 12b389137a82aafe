"""Distributed hash exchange primitives (shuffle, group-aggregate, join).

Why this exists: in the Ray version shipped here, a Ray Data
``groupby``/``sort`` all-to-all costs 10-30 s of fixed overhead per
call regardless of input size (measured on 200-row and 1M-row inputs,
sort- and hash-shuffle strategies alike; see BASELINE.md).  The
engine's one-time build steps and every iterative superstep need an
exchange that costs milliseconds, so we implement the classic two-round
partitioned exchange directly on Ray tasks over Arrow block refs:

    round 1 (map):    one task per input block — optional per-block
                      partial aggregation (combiner), then hash-split
                      into P sub-tables returned as P object refs
    round 2 (reduce): one task per partition — fetch its P' pieces
                      (object-store locality, zero-copy Arrow),
                      concatenate, final-aggregate / join

This is exactly the "pre-aggregate inside map_batches, then a small
groupby" pattern the scale guidance prescribes, with the all-to-all
expressed as raw object transfers.  Datasets remain the API: inputs
are ``ray.data.Dataset`` (or block-ref lists), outputs are Datasets
via ``from_arrow_refs``.

Partitioning keys are hashed with ``pandas.util.hash_array`` (SipHash
with a fixed key — deterministic across processes and nodes).  Skewed
keys are mitigated structurally: the combiner bounds the per-key fan-in
at one row per (block, key), so a hot key receives at most
``num_blocks`` rows in round 2.

Reference analog: the C core has no relational layer (joins are dense
array lookups, SURVEY.md §2.5); this module is their distributed
re-expression.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

DEFAULT_PARTITIONS = 32

# ---------------------------------------------------------------------------
# hashing / splitting


def key_hash(tbl: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Deterministic uint64 hash of one or more key columns."""
    h = np.zeros(len(tbl), dtype=np.uint64)
    for k in keys:
        col = tbl[k].to_numpy(zero_copy_only=False)
        if col.dtype == object or col.dtype.kind in "OUS":
            hk = pd.util.hash_array(col.astype(object))
        else:
            hk = pd.util.hash_array(np.ascontiguousarray(col))
        h = h * np.uint64(31) + hk
    return h


def split_by_hash(tbl: pa.Table, keys: Sequence[str], P: int) -> list[pa.Table]:
    """Split a table into P sub-tables by key hash."""
    if len(tbl) == 0:
        return [tbl] * P
    part = (key_hash(tbl, keys) % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_tbl = _safe_take(tbl, order)
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [sorted_tbl.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(P)]


_TAKE_CHILD_LIMIT = 3 << 30  # stay clear of Arrow's 4 GiB wraparound


def _gather_list_numpy(col: pa.ChunkedArray | pa.Array,
                       order: np.ndarray) -> pa.ChunkedArray:
    """Row gather of a list<primitive> column done entirely in numpy,
    emitting output chunks whose children stay under the byte limit.
    flatten() per chunk is safe at any size (it is the child itself);
    only Arrow's take/concat gathers wrap past 4 GiB."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    v_parts, l_parts = [], []
    for ch in chunks:
        v_parts.append(ch.flatten().to_numpy(zero_copy_only=False))
        l_parts.append(
            ch.value_lengths().to_numpy(zero_copy_only=False
                                        ).astype(np.int64))
    vals = np.concatenate(v_parts) if v_parts else np.empty(0)
    lens = (np.concatenate(l_parts) if l_parts
            else np.empty(0, np.int64))
    offs = np.concatenate(([0], np.cumsum(lens)))
    sel_lens = lens[order]
    tot = int(sel_lens.sum())
    first = np.concatenate(([0], np.cumsum(sel_lens)))
    flat = (
        np.arange(tot, dtype=np.int64)
        - np.repeat(first[:-1], sel_lens)
        + np.repeat(offs[order], sel_lens)
    )
    new_vals = vals[flat]
    max_elems = max(1, _TAKE_CHILD_LIMIT // max(new_vals.dtype.itemsize, 1))
    out = []
    row = 0
    n = len(order)
    while row < n:
        end = int(np.searchsorted(
            first, first[row] + max_elems, side="right") - 1)
        end = min(max(end, row + 1), n)
        sub_offs = (first[row:end + 1] - first[row]).astype(np.int32)
        out.append(pa.ListArray.from_arrays(
            pa.array(sub_offs),
            pa.array(new_vals[first[row]:first[end]]),
        ))
        row = end
    return pa.chunked_array(out)


def _safe_take(tbl: pa.Table, order: np.ndarray) -> pa.Table:
    """``tbl.take`` that is SAFE for list columns with huge children.

    pyarrow (observed on 16.1.0) silently corrupts ``list<T>``
    columns whose flattened child exceeds 4 GiB during take/concat
    gathers: rows read from SOURCE byte offsets past 4 GiB come back
    shifted with their lengths intact (uint32 wraparound).  Surfaced
    as inflated ngram-Jaccard intersections on the sf0.1 oracle gate
    and reproduced standalone.  Affected list columns (primitive
    child, no nulls — the only shape our payloads use) are gathered
    in numpy instead; everything else takes the normal kernel."""
    big_cols = []
    for idx, col in enumerate(tbl.columns):
        for ch in (col.chunks if isinstance(col, pa.ChunkedArray)
                   else [col]):
            if ((pa.types.is_list(ch.type)
                 or pa.types.is_large_list(ch.type))
                    and ch.values.nbytes > _TAKE_CHILD_LIMIT
                    and pa.types.is_primitive(ch.type.value_type)
                    and col.null_count == 0):
                big_cols.append(idx)
                break
    if not big_cols:
        return tbl.take(pa.array(order))
    names = tbl.column_names
    cols = {}
    rest = tbl.drop_columns([names[i] for i in big_cols])
    rest = rest.take(pa.array(order))
    for i, nm in enumerate(names):
        if i in big_cols:
            cols[nm] = _gather_list_numpy(tbl.column(i), order)
        else:
            cols[nm] = rest[nm]
    return pa.table(cols)


# ---------------------------------------------------------------------------
# block plumbing


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return t.num_rows


def block_refs(ds: Dataset) -> list["ray.ObjectRef"]:
    """Materialize a Dataset into object-store Arrow blocks (refs only;
    nothing is pulled to the driver).  Ray Data emits 0-row blocks with
    EMPTY schemas (no columns) which poison downstream Arrow kernels —
    drop them here (keeping one block if everything is empty).  Row
    counts come from the materialized block METADATA (no per-block
    RPC round; RPC fallback if the internal bundle API shifts)."""
    mat = ds.materialize()
    try:
        refs, rows = [], []
        for bundle in mat.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                refs.append(ref)
                rows.append(meta.num_rows)
        if len(refs) <= 1:
            return refs
        if any(n is None for n in rows):
            raise ValueError("missing block metadata")
    except Exception:
        refs = mat.to_arrow_refs()
        if len(refs) <= 1:
            return refs
        rows = ray.get([_block_rows.remote(r) for r in refs])
    kept = [r for r, n in zip(refs, rows) if n > 0]
    return kept if kept else refs[:1]


def to_dataset(refs: list["ray.ObjectRef"]) -> Dataset:
    return rd.from_arrow_refs(refs)


def _coerce_arrow(block) -> pa.Table:
    """Raw materialized blocks may be pandas (batch_format='pandas'
    stages); exchange kernels are Arrow-native."""
    if isinstance(block, pd.DataFrame):
        return pa.Table.from_pandas(block, preserve_index=False)
    return block


@ray.remote
def _map_split(fn, keys, P, block: pa.Table):
    block = _coerce_arrow(block)
    out = fn(block) if fn is not None else block
    parts = split_by_hash(out, keys, P)
    return tuple(parts) if P > 1 else parts[0]


@ray.remote
def _reduce(fn, *parts: pa.Table):
    parts = [_coerce_arrow(t) for t in parts]
    tables = [t for t in parts if t is not None and len(t) > 0]
    if not tables:
        base = next(t for t in parts if t is not None)
        return fn(base.schema.empty_table()) if fn else base.schema.empty_table()
    merged = pa.concat_tables(tables, promote_options="default")
    return fn(merged) if fn else merged


def exchange(
    ds: Dataset | list,
    keys: Sequence[str],
    P: int = DEFAULT_PARTITIONS,
    map_fn: Callable[[pa.Table], pa.Table] | None = None,
    reduce_fn: Callable[[pa.Table], pa.Table] | None = None,
    as_refs: bool = False,
):
    """Generic two-round hash exchange.

    ``map_fn`` runs per input block before the split (use it as a
    combiner); ``reduce_fn`` runs once per output partition on the
    concatenation of that partition's pieces.  Rows with equal ``keys``
    end up in the same output partition.
    """
    refs = ds if isinstance(ds, list) else block_refs(ds)
    P = max(1, P)
    shards: list[list] = [[] for _ in range(P)]
    for r in refs:
        outs = _map_split.options(num_returns=P if P > 1 else 1).remote(
            map_fn, list(keys), P, r
        )
        if P == 1:
            shards[0].append(outs)
        else:
            for p, o in enumerate(outs):
                shards[p].append(o)
    out_refs = [_reduce.remote(reduce_fn, *shards[p]) for p in range(P)]
    return out_refs if as_refs else to_dataset(out_refs)


# ---------------------------------------------------------------------------
# group-aggregate

_FINAL_KIND = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _agg_table(tbl, keys, aggs, kinds):
    """pyarrow group_by with output column names fixed to aliases."""
    spec = []
    for (col, kind, alias), final in zip(aggs, kinds):
        spec.append((col if col is not None else keys[0], final))
    gb = tbl.group_by(keys, use_threads=False).aggregate(spec)
    cols = {k: gb[k] for k in keys}
    for i, ((col, kind, alias), final) in enumerate(zip(aggs, kinds)):
        src = f"{col if col is not None else keys[0]}_{final}"
        cols[alias] = gb[src]
    return pa.table(cols)


def groupby_agg(
    ds: Dataset | list,
    keys: Sequence[str],
    aggs: Sequence[tuple[str | None, str, str]],
    P: int = DEFAULT_PARTITIONS,
    as_refs: bool = False,
):
    """Distributed group-by aggregate with per-block combining.

    ``aggs`` rows are ``(column, kind, alias)`` with kind in
    {sum, count, min, max} (count ignores ``column``).  Partial
    aggregates are computed per input block, so a skewed key crosses
    the wire as at most one row per block.
    """
    keys = list(keys)
    aggs = [tuple(a) for a in aggs]
    partial_kinds = [a[1] for a in aggs]
    final_kinds = [_FINAL_KIND[a[1]] for a in aggs]

    def partial(tbl: pa.Table) -> pa.Table:
        return _agg_table(tbl, keys, aggs, partial_kinds)

    def final(tbl: pa.Table) -> pa.Table:
        # after the partial pass every agg column is named by alias;
        # re-aggregate under the merged kind
        merged_aggs = [(alias, fk, alias) for (_, _, alias), fk in zip(aggs, final_kinds)]
        return _agg_table(tbl, keys, merged_aggs, final_kinds)

    return exchange(ds, keys, P, map_fn=partial, reduce_fn=final, as_refs=as_refs)


def distinct(
    ds: Dataset | list,
    keys: Sequence[str],
    P: int = DEFAULT_PARTITIONS,
    as_refs: bool = False,
):
    """Exact distinct on key columns (hash-partition + per-group first,
    reference igraph_simplify analog src/structural_properties.c:2177)."""
    keys = list(keys)

    def uniq(tbl: pa.Table) -> pa.Table:
        return tbl.select(keys).group_by(keys, use_threads=False).aggregate([])

    return exchange(ds, keys, P, map_fn=uniq, reduce_fn=uniq, as_refs=as_refs)


# ---------------------------------------------------------------------------
# join


def hash_join(
    left: Dataset | list,
    right: Dataset | list,
    keys: Sequence[str],
    right_keys: Sequence[str] | None = None,
    how: str = "inner",
    P: int = DEFAULT_PARTITIONS,
    as_refs: bool = False,
):
    """Partitioned hash join: both sides split by key hash, joined
    per-partition with the Arrow join kernel."""
    keys = list(keys)
    right_keys = list(right_keys) if right_keys else keys
    lrefs = left if isinstance(left, list) else block_refs(left)
    rrefs = right if isinstance(right, list) else block_refs(right)
    P = max(1, P)
    lsh: list[list] = [[] for _ in range(P)]
    rsh: list[list] = [[] for _ in range(P)]
    for r in lrefs:
        outs = _map_split.options(num_returns=P if P > 1 else 1).remote(None, keys, P, r)
        outs = [outs] if P == 1 else outs
        for p, o in enumerate(outs):
            lsh[p].append(o)
    for r in rrefs:
        outs = _map_split.options(num_returns=P if P > 1 else 1).remote(
            None, right_keys, P, r
        )
        outs = [outs] if P == 1 else outs
        for p, o in enumerate(outs):
            rsh[p].append(o)

    @ray.remote
    def _join(nl: int, *parts: pa.Table):
        lt = pa.concat_tables(parts[:nl], promote_options="default")
        rt = pa.concat_tables(parts[nl:], promote_options="default")
        try:
            return lt.join(
                rt, keys=keys, right_keys=right_keys, join_type=how,
                use_threads=False,
            )
        except pa.lib.ArrowInvalid:
            # Arrow's join kernel rejects nested / extension payload
            # columns (e.g. tensor columns); fall back to pandas.
            # Logged loudly: this path de-vectorizes the join, so a
            # hot-loop join landing here is a performance bug.
            import logging

            logging.getLogger(__name__).warning(
                "hash_join: Arrow join kernel rejected the schema "
                "(nested/extension column?) — falling back to pandas "
                "for a %d x %d row partition; this de-vectorizes the "
                "join", len(lt), len(rt),
            )
            ldf, rdf = lt.to_pandas(), rt.to_pandas()
            if how == "left semi":
                out = ldf[ldf.set_index(keys).index.isin(
                    rdf.set_index(right_keys).index)]
            elif how == "left anti":
                out = ldf[~ldf.set_index(keys).index.isin(
                    rdf.set_index(right_keys).index)]
            else:
                pd_how = {"inner": "inner", "left outer": "left",
                          "right outer": "right", "full outer": "outer"}[how]
                out = ldf.merge(
                    rdf, left_on=keys, right_on=right_keys, how=pd_how
                )
            return pa.Table.from_pandas(out, preserve_index=False)

    out = [_join.remote(len(lsh[p]), *lsh[p], *rsh[p]) for p in range(P)]
    return out if as_refs else to_dataset(out)
