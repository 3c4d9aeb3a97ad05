"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir and compares against
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns).  Rows-only queries are executed and row counts printed.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype("float64"), 9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"query raised {type(exc).__name__}: {exc}"))
            print(f"FAIL {name}: query raised {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(got)} rows ({dt:.1f}s)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"oracle raised {exc}"))
            print(f"FAIL {name}: oracle raised {exc}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            idx = neq.any(axis=1)
            failures.append((name, f"values differ in {bad_cols}"))
            print(f"FAIL {name}: values differ in {bad_cols}; "
                  f"first rows:\n{got[idx].head(3)}\nvs\n{want[idx].head(3)}")
            continue
        print(f"PASS {name}: {len(got)} rows ({dt:.1f}s)")
    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
