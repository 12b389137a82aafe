"""Window operators over an ordered event log (ray_guide
"streaming-shaped workloads": Ray Data has no event-time watermarks, so
windows are expressed as key-partitioned batch aggregations; the
ordering assumption is events sorted within each key partition, which
the session reduce enforces itself).

* tumbling — fixed buckets (floor_temporal), plain grouped aggregate
* sliding  — width W, step S: each event expands to its W/S covering
  windows inside ``map_batches``, then one grouped aggregate
* session  — gap-based: per-key sort + diff/cumsum inside the
  per-partition reduce (incremental actor state would only be needed
  for an unbounded stream; this engine is batch, like the reference —
  SURVEY.md §2.12)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..exchange import DEFAULT_PARTITIONS, exchange, groupby_agg


@ray.remote
def _tag(fn, tbl):
    return fn(tbl)


def tumbling(
    events: Dataset, key: str, ts_col: str, value_col: str,
    unit: str = "hour", P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """(key, window, n, total) fixed windows."""
    prep = events.map_batches(
        lambda t: pa.table(
            {
                key: t[key],
                "window": pc.floor_temporal(t[ts_col], unit=unit),
                value_col: t[value_col],
            }
        ),
        batch_format="pyarrow",
    )
    return groupby_agg(
        prep, [key, "window"],
        [(None, "count", "n"), (value_col, "sum", "total")], P=P,
    )


def sliding(
    events: Dataset, key: str, ts_col: str, value_col: str,
    width_s: int = 7200, step_s: int = 3600, P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """(key, window_start, n, total): windows [k*step, k*step+width).
    Each event fans out to its <= ceil(width/step) covering windows;
    for non-divisible widths the last candidate window may not contain
    the event, so membership is checked per event (ADVICE round 1)."""
    k = -(-width_s // step_s)  # ceil

    def expand(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        step = step_s * 1_000_000
        width = width_s * 1_000_000
        base = (ts // step) * step
        keys, starts, vals = [], [], []
        kv = t[key].to_numpy()
        vv = t[value_col].to_numpy()
        for i in range(k):
            start = base - i * step
            inside = ts - start < width  # start <= ts holds by construction
            keys.append(kv[inside])
            starts.append(start[inside])
            vals.append(vv[inside])
        return pa.table(
            {
                key: np.concatenate(keys),
                "window_start": np.concatenate(starts).astype(
                    "datetime64[us]"
                ),
                value_col: np.concatenate(vals),
            }
        )

    prep = events.map_batches(expand, batch_format="pyarrow")
    return groupby_agg(
        prep, [key, "window_start"],
        [(None, "count", "n"), (value_col, "sum", "total")], P=P,
    )


def session(
    events: Dataset, key: str, ts_col: str,
    gap_s: int = 1800, P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """(key, session_start, session_end, n) gap-based sessions."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], ts_col: t[ts_col]})

    def sessionize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([key, ts_col])
        gap = pd.Timedelta(seconds=gap_s)
        new_key = df[key] != df[key].shift()
        new_gap = (df[ts_col] - df[ts_col].shift()) > gap
        sid = (new_key | new_gap).cumsum()
        out = df.groupby(sid).agg(
            **{
                key: (key, "first"),
                "session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
                "n": (ts_col, "size"),
            }
        )
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    return exchange(events, [key], P=P, map_fn=project, reduce_fn=sessionize)


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """Backward as-of join: for every left row, the LATEST right row of
    the same ``key`` with right ts <= left ts (inclusive) — DuckDB
    ``ASOF LEFT JOIN`` semantics.  Right rows must be unique per
    (key, ts); pre-aggregate ties upstream (the SQL ASOF is equally
    ambiguous on duplicates).

    Distributed shape: both sides are tagged and hash-exchanged by
    ``key`` in ONE all-to-all (side marker column), then each
    partition runs a vectorized searchsorted merge — per-key data must
    fit a partition, the same assumption as every hash join here.
    Output: left_cols + right_cols (null where no match) + ``lag_us``
    (left ts - matched right ts, microseconds; null if no match).

    Right columns come back in their INPUT types (nullable where no
    match) — any Arrow type works, matches are gathered with Arrow
    ``take`` rather than a float64 round-trip, so int64 above 2^53 and
    strings survive losslessly.  The packed (key, ts) searchsorted
    splits a 63-bit budget between the ts span and the per-partition
    distinct-key count; both dimensions are guarded with explicit
    errors rather than silent wraparound.
    """
    out_l = [c for c in left_cols if c != ts_col]
    lschema = left.schema().base_schema
    ltypes = {c: lschema.field(c).type for c in out_l}
    rschema = right.schema().base_schema
    rtypes = {c: rschema.field(c).type for c in right_cols}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {key: t[key],
                ts_col: pc.cast(t[ts_col], pa.timestamp("us")),
                "_side": pa.array(np.ones(len(t), np.int8))}
        for c in out_l:
            cols[c] = t[c]
        for c in right_cols:
            cols[c] = pa.nulls(len(t), rtypes[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {key: t[key],
                ts_col: pc.cast(t[ts_col], pa.timestamp("us")),
                "_side": pa.array(np.zeros(len(t), np.int8))}
        for c in out_l:
            if c == key:  # keep the key intact when it's also output
                continue
            cols[c] = pa.nulls(len(t), ltypes[c])
        for c in right_cols:
            cols[c] = t[c]
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        k = t[key].to_numpy(zero_copy_only=False)
        tv = t[ts_col].to_numpy(zero_copy_only=False).view("int64")
        lm = side == 1
        rm = ~lm
        lk, lt = k[lm], tv[lm]
        rk, rt = k[rm], tv[rm]
        cols: dict = {c: t[c].filter(pa.array(lm)) for c in out_l}
        if len(lt) == 0 or len(rt) == 0:
            n = len(lt)
            cols["lag_us"] = pa.nulls(n, pa.int64())
            for c in right_cols:
                cols[c] = pa.nulls(n, t.schema.field(c).type)
            return pa.table(cols)
        ro = np.lexsort((rt, rk))
        rk, rt = rk[ro], rt[ro]
        # dictionary-encode keys so the packed (key, ts) ordinal fits
        uk = np.unique(np.concatenate((lk, rk)))
        lki = np.searchsorted(uk, lk)
        rki = np.searchsorted(uk, rk)
        off = int(min(lt.min(), rt.min()))
        dl = lt - off
        dr = rt - off
        # split the 63-bit pack budget dynamically: ts span gets what
        # it needs, the rest bounds the distinct-key count — both
        # overflow modes raise instead of silently wrapping
        ts_bits = max(1, max(int(dl.max()), int(dr.max())).bit_length())
        if ts_bits > 43:
            raise ValueError(
                f"asof_join: ts span needs {ts_bits} bits (> 2^43 us "
                "~278 y) — check the timestamp column"
            )
        if len(uk) >= 1 << (63 - ts_bits):
            raise ValueError(
                f"asof_join: {len(uk)} distinct keys in one partition "
                f"exceeds the {63 - ts_bits}-bit pack budget — "
                "increase P so fewer keys land per partition"
            )
        pos = np.searchsorted(
            rki * (1 << ts_bits) + dr, lki * (1 << ts_bits) + dl,
            side="right",
        ) - 1
        ok = (pos >= 0) & (rki[np.maximum(pos, 0)] == lki)
        pos = np.maximum(pos, 0)
        lag = np.where(ok, lt - rt[pos], 0)
        cols["lag_us"] = pa.array(lag, pa.int64(), mask=~ok)
        # gather matched right values with Arrow take (null index ->
        # null output), preserving the input type losslessly
        ridx = np.nonzero(rm)[0][ro][pos]
        idx = pa.array(ridx, type=pa.int64(), mask=~ok)
        for c in right_cols:
            taken = t[c].take(idx)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            cols[c] = taken
        return pa.table(cols)

    from ..exchange import block_refs

    refs = [
        *[_tag.remote(tag_left, r) for r in block_refs(left)],
        *[_tag.remote(tag_right, r) for r in block_refs(right)],
    ]
    return exchange(refs, [key], P=P, reduce_fn=merge)
