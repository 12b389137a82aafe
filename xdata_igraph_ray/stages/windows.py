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
from ray.data import Dataset

from ..exchange import DEFAULT_PARTITIONS, exchange, groupby_agg


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
