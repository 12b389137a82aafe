"""Window operators vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.stages import windows


def events_tbl():
    ts = pd.to_datetime(
        ["2025-01-01 00:05", "2025-01-01 00:50", "2025-01-01 01:10",
         "2025-01-01 03:00", "2025-01-01 00:20", "2025-01-01 02:59"]
    )
    return pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )


def test_tumbling():
    out = windows.tumbling(
        rd.from_arrow(events_tbl()), "user_id", "ts", "value", P=2
    ).to_pandas().sort_values(["user_id", "window"]).reset_index(drop=True)
    assert list(out["n"]) == [2, 1, 1, 1, 1]
    assert list(out["total"]) == [3.0, 3.0, 4.0, 5.0, 6.0]


def test_sliding_two_hour():
    out = windows.sliding(
        rd.from_arrow(events_tbl()), "user_id", "ts", "value",
        width_s=7200, step_s=3600, P=2,
    ).to_pandas()
    # every event appears in exactly 2 windows
    assert out["n"].sum() == 12
    u1 = out[out["user_id"] == 1].set_index("window_start")["n"]
    # window starting 00:00 covers 00:05, 00:50, 01:10
    key = pd.Timestamp("2025-01-01 00:00")
    assert u1[key] == 3


def test_session_gap():
    out = windows.session(
        rd.from_arrow(events_tbl()), "user_id", "ts", gap_s=1800, P=2
    ).to_pandas().sort_values(["user_id", "session_start"]).reset_index(drop=True)
    # user 1: (00:05), (00:50,01:10), (03:00); user 2: (00:20), (02:59)
    assert list(out["n"]) == [1, 2, 1, 1, 1]
    assert out.iloc[1]["session_end"] == pd.Timestamp("2025-01-01 01:10")


def test_sliding_non_divisible_width():
    """width=5400s (1.5h), step=3600s: membership must be checked per
    event (ADVICE round 1 — k = ceil(width/step) candidate windows,
    some of which don't contain the event)."""
    out = windows.sliding(
        rd.from_arrow(events_tbl()), "user_id", "ts", "value",
        width_s=5400, step_s=3600, P=2,
    ).to_pandas()
    # brute-force oracle
    df = events_tbl().to_pandas()
    rows = {}
    for _, r in df.iterrows():
        ts = r["ts"].value // 1000  # ns -> us
        base = ts // 3_600_000_000 * 3_600_000_000
        for i in range(2):
            start = base - i * 3_600_000_000
            if 0 <= ts - start < 5_400_000_000:
                k = (r["user_id"], start)
                n, tot = rows.get(k, (0, 0.0))
                rows[k] = (n + 1, tot + r["value"])
    got = {
        (r["user_id"], r["window_start"].value // 1000): (r["n"], r["total"])
        for _, r in out.iterrows()
    }
    assert got == rows
