"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB over the same
sf dir, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from etl_spark.contract import ORACLES, QUERIES
    from etl_spark.session import get_spark

    spark = get_spark("contract_check", parallelism=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ok    {name}: rows-only ({len(got)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            if len(got) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue
        g, e = canon(got), canon(exp)
        msg = None
        if list(g.columns) != list(e.columns):
            msg = f"columns {list(g.columns)} != {list(e.columns)}"
        elif len(g) != len(e):
            msg = f"rows {len(g)} != {len(e)}"
        else:
            for c in g.columns:
                gc, ec = g[c], e[c]
                if pd.api.types.is_float_dtype(ec) or pd.api.types.is_float_dtype(gc):
                    bad = ~(
                        (gc.isna() & ec.isna())
                        | (gc.astype(float) - ec.astype(float)).abs().le(1e-9)
                    )
                else:
                    bad = (gc.astype(str) != ec.astype(str)) & ~(gc.isna() & ec.isna())
                if bad.any():
                    i = bad.idxmax()
                    msg = f"value mismatch col={c} row={i}: {gc[i]!r} != {ec[i]!r}"
                    break
        if msg:
            failures.append((name, msg))
            print(f"FAIL  {name}: {msg}")
        else:
            print(f"ok    {name}: {len(g)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures")
    for n, m in failures:
        print(f"  {n}: {m}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
