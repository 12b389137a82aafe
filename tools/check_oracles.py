"""Local stand-in for the driver's correctness gate: run every
queries() callable at a given sf and compare row-count + schema +
order-insensitive values against oracle_sql() via DuckDB.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import logging
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    """STRICT compare mirroring the driver's value-hash gate: columns
    sorted by name, dtypes must agree (int64 vs float64 hashes
    differently), float columns must be BIT-identical (the driver
    hashes raw values; allclose green + hash FAIL was round 2's
    triad/knn failure mode)."""
    if len(got) != len(want):
        return f"ROWS {len(got)} vs {len(want)}"
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        return f"SCHEMA {list(g.columns)} vs {list(w.columns)}"
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if a.dtype != b.dtype:
            return f"DTYPE col={c} got={a.dtype} want={b.dtype}"
        if a.dtype.kind == "f":
            ab, bb = a.view(np.uint64), b.view(np.uint64)
            if not (ab == bb).all():
                bad = np.flatnonzero(ab != bb)[:3]
                return (
                    f"FLOATBITS col={c} rows={bad.tolist()} "
                    f"got={a[bad].tolist()} want={b[bad].tolist()}"
                )
        else:
            if not (a == b).all():
                bad = np.flatnonzero(a != b)[:3]
                return (
                    f"VALUES col={c} rows={bad.tolist()} "
                    f"got={a[bad].tolist()} want={b[bad].tolist()}"
                )
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} QUERY-ERROR {type(e).__name__}: {str(e)[:120]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"{name:28s} rows-only   rows={len(got)}  [{t1-t0:.1f}s]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} SQL-ERROR   {type(e).__name__}: {str(e)[:120]}")
            failures += 1
            continue
        verdict = compare(name, got, want)
        status = "ok" if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures += 1
        print(
            f"{name:28s} {status:5s} rows={len(got)}  "
            f"[ray {t1-t0:.1f}s, sql {time.time()-t1:.1f}s] {verdict if verdict != 'OK' else ''}"
        )
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
