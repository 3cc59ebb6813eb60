"""Materialized-aggregate refresh entry point (lake/mv.py): bring a
derived GROUP-BY table up to the base table's current version by
applying the change feed's signed deltas — O(changed rows), never a
base rescan after the first run.

Usage:
    python -m etl_spark.jobs.refresh_mv --table-root /path/to/tbl \
        --mv-dir /path/to/mv --dims conv_id \
        [--sum sum_turns="CAST(turn_idx AS LONG)"] [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--table-root", required=True)
    p.add_argument("--mv-dir", required=True)
    p.add_argument("--dims", required=True,
                   help="comma-separated group-by columns")
    p.add_argument("--sum", action="append", default=[],
                   metavar="NAME=SQL_EXPR",
                   help="additive long metric, repeatable")
    p.add_argument("--parallelism", type=int, default=8)
    args = p.parse_args()

    sums = {}
    for item in args.sum:
        name, _, expr = item.partition("=")
        if not expr:
            raise SystemExit(f"--sum needs NAME=SQL_EXPR, got {item!r}")
        sums[name] = expr

    from etl_spark.lake.mv import refresh
    from etl_spark.lake.table import LakeTable
    from etl_spark.session import get_spark

    spark = get_spark(
        "mv_refresh", parallelism=args.parallelism,
        shuffle_partitions=args.parallelism,
    )
    table = LakeTable(spark, args.table_root)
    stats = refresh(table, args.mv_dir, args.dims.split(","), sums)
    print(json.dumps({"job": "mv_refresh", "mv_dir": args.mv_dir, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
