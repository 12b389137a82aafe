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


def test_asof_join_backward():
    ts = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)  # noqa: E731
    left = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({
        "eid": [1, 2, 3, 4, 5],
        "k": [10, 10, 10, 20, 30],
        "ts": [ts(5), ts(10), ts(2), ts(7), ts(9)],
    }), preserve_index=False))
    right = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({
        "k": [10, 10, 20, 40],
        "ts": [ts(3), ts(10), ts(8), ts(1)],
        "v": [1.5, 2.5, 9.0, 7.0],
    }), preserve_index=False))
    df = (
        windows.asof_join(left, right, key="k", ts_col="ts",
                          left_cols=["eid"], right_cols=["v"], P=3)
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    # eid1 t=5 -> right t=3 (v=1.5, lag 2s); eid2 t=10 -> t=10 INCLUSIVE
    # (v=2.5, lag 0); eid3 t=2 -> no match; eid4 k=20 t=7 -> right t=8 is
    # later -> no match; eid5 k=30 -> key absent -> no match
    assert df["v"].tolist()[:2] == [1.5, 2.5]
    assert df["lag_us"].tolist()[:2] == [2_000_000, 0]
    assert df["v"].isna().tolist() == [False, False, True, True, True]
    assert df["lag_us"].isna().tolist() == [False, False, True, True, True]


def test_asof_join_preserves_right_types():
    # int64 above 2^53 and strings must come back losslessly (the old
    # float64 round-trip lost both)
    ts = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)  # noqa: E731
    big = (1 << 60) + 7
    left = rd.from_arrow(pa.table({
        "eid": pa.array([1, 2], pa.int64()),
        "k": pa.array([10, 10], pa.int64()),
        "ts": pa.array([ts(5), ts(1)], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([10], pa.int64()),
        "ts": pa.array([ts(3)], pa.timestamp("us")),
        "big": pa.array([big], pa.int64()),
        "tag": pa.array(["hello"], pa.string()),
    }))
    out = windows.asof_join(left, right, key="k", ts_col="ts",
                            left_cols=["eid"], right_cols=["big", "tag"],
                            P=2)
    import ray

    tbl = pa.concat_tables(
        [ray.get(r) for r in out.to_arrow_refs()]).combine_chunks()
    d = {r["eid"]: r for r in tbl.to_pylist()}
    assert tbl.schema.field("big").type == pa.int64()
    assert tbl.schema.field("tag").type == pa.string()
    assert d[1]["big"] == big and d[1]["tag"] == "hello"
    assert d[2]["big"] is None and d[2]["tag"] is None


def test_asof_join_empty_right():
    left = rd.from_arrow(pa.table({
        "eid": pa.array([1], pa.int64()),
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "v": pa.array([], pa.float64()),
    }))
    df = windows.asof_join(left, right, key="k", ts_col="ts",
                           left_cols=["eid"], right_cols=["v"],
                           P=2).to_pandas()
    assert len(df) == 1 and df["v"].isna().all()
