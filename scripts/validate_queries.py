"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01, compare SQL-oracled ones against DuckDB (row count + schema names
+ order-insensitive value equality).  Usage: python scripts/validate_queries.py
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VALIDATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    only = sys.argv[1:] or list(qs)
    for name in only:
        fn = qs[name]
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(SF_DIR)))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} cols={list(got.columns)} ({dt:.1f}s, rows-only)")
            continue
        exp = normalize(con.execute(oracles[name]).fetchdf())
        status = "ok  "
        if list(got.columns) != list(exp.columns):
            status = "FAIL"
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        elif len(got) != len(exp):
            status = "FAIL"
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        else:
            try:
                pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                              exp.reset_index(drop=True),
                                              check_dtype=False, check_exact=False, rtol=0, atol=0)
            except AssertionError as exc:
                status = "FAIL"
                print(f"FAIL {name}: values differ: {str(exc)[:400]}")
        if status == "ok  ":
            print(f"ok   {name}: rows={len(got)} matches oracle ({dt:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{len(only) - len(failures)}/{len(only)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
