"""Local replica of the driver's correctness gate: run every queries() entry
and compare SQL-oracled ones against DuckDB with HASH-FIDELITY — the driver
sorts columns by name, sorts rows, then hashes a byte/string rendering of the
values, so anything pandas equality hides (int64 vs float64 dtype, IEEE -0.0
vs +0.0) is a driver failure.  This gate therefore asserts dtype-kind
equality, float signbit equality, and exact value equality.

Usage:
    python scripts/validate_queries.py [query ...]
    VALIDATE_SF_DIRS=/root/testdata/sf0.001,/root/testdata/sf0.01 \
        python scripts/validate_queries.py          # multi-SF sweep
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEFAULT_SF = os.environ.get("VALIDATE_SF_DIR", "/root/testdata/sf0.01")
SF_DIRS = [d for d in os.environ.get("VALIDATE_SF_DIRS", _DEFAULT_SF).split(",") if d]
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


def _dtype_kind(dt) -> str:
    """Hash-relevant dtype identity.  The driver's value hash is byte-level
    (int32 vs int64 broke label_centroids in round 3), so require the EXACT
    dtype, collapsing only the object/str family."""
    if dt == object:
        return "obj"
    k = np.dtype(dt).kind
    if k in "OUS":
        return "obj"
    return str(np.dtype(dt))


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> str | None:
    """Return a failure description or None. Emulates the driver's value
    hash: exact values, exact float bit-sign (so -0.0 != +0.0), dtype kind."""
    if list(got.columns) != list(exp.columns):
        return f"columns {list(got.columns)} != {list(exp.columns)}"
    if len(got) != len(exp):
        return f"rows {len(got)} != {len(exp)}"
    for c in got.columns:
        gk, ek = _dtype_kind(got[c].dtype), _dtype_kind(exp[c].dtype)
        if gk != ek:
            return f"col {c!r}: dtype kind {gk} (got) != {ek} (oracle)"
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if gk.startswith("float"):
            gn, en = np.isnan(g.astype(float)), np.isnan(e.astype(float))
            if not np.array_equal(gn, en):
                return f"col {c!r}: NaN placement differs"
            gv, ev = g[~gn].astype(float), e[~en].astype(float)
            if not np.array_equal(gv, ev):
                i = int(np.flatnonzero(gv != ev)[0])
                return f"col {c!r}: value mismatch at body row {i}: {gv[i]!r} != {ev[i]!r}"
            sb = np.signbit(gv) != np.signbit(ev)
            if sb.any():
                i = int(np.flatnonzero(sb)[0])
                return (f"col {c!r}: signbit mismatch (IEEE -0.0 seam) at body row {i}: "
                        f"{gv[i]!r} != {ev[i]!r}")
        else:
            eq = (g == e) | (pd.isna(pd.Series(g)).to_numpy()
                             & pd.isna(pd.Series(e)).to_numpy())
            if not eq.all():
                i = int(np.flatnonzero(~eq)[0])
                return f"col {c!r}: value mismatch at row {i}: {g[i]!r} != {e[i]!r}"
    return None


def run_sf(entrymod, sf_dir: str, only: list[str]) -> list[str]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in only:
        fn = qs[name]
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} cols={list(got.columns)} ({dt:.1f}s, rows-only)")
            continue
        exp = normalize(con.execute(oracles[name]).fetchdf())
        err = compare(got, exp)
        if err is None:
            print(f"ok   {name}: rows={len(got)} matches oracle ({dt:.1f}s)")
        else:
            failures.append(name)
            print(f"FAIL {name}: {err[:400]}")
    con.close()
    return failures


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    rc = 0
    for sf_dir in SF_DIRS:
        only = sys.argv[1:] or list(entrymod.queries())
        print(f"=== {sf_dir} ===")
        failures = run_sf(entrymod, sf_dir, only)
        print(f"\n{len(only) - len(failures)}/{len(only)} passed at {sf_dir}\n")
        if failures:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
