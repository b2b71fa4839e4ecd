"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count, schema width, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from muopdb_spark.session import get_spark  # noqa: E402

TABLES = entry_mod.TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints stay ints, floats to float64, rest to str
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark("correctness-check")
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}
    oracles = entry_mod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak  {name}: rows={len(got)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = normalize(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        status = []
        if len(got) != len(exp):
            status.append(f"rowcount {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            status.append(f"columns {list(got.columns)} != {list(exp.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status.append(f"values differ: {str(e).splitlines()[-1]}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(got)} rows [{time.time()-t0:.1f}s]")

    scope = (
        f"{checked - len(failures)}/{checked} queries match"
        if not only
        else f"{checked - len(failures)}/{checked} checked queries match"
        f" ({len(qs)} registered)"
    )
    print("\n" + scope + (f"; FAILED: {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
