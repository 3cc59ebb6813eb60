"""Downstream-export entry point: incrementally ship the lake table's
change feed to a downstream parquet directory (lake/export.py).

Run on any cadence off the ingest path; each run exports exactly the
commits since the last successful run (version cursor, exactly-once
under crash replay).

Usage:
    python -m etl_spark.jobs.export --table-root /path/to/tbl \
        --out-dir /path/to/downstream [--cursor PATH] \
        [--pre-images] [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--table-root", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--cursor", default=None,
                   help="cursor file (default <out-dir>/_cursor.json)")
    p.add_argument("--pre-images", action="store_true",
                   help="include update pre-images (needed for signed-"
                   "delta incremental aggregation downstream)")
    p.add_argument("--parallelism", type=int, default=8)
    args = p.parse_args()

    from etl_spark.lake.export import export_changes
    from etl_spark.lake.table import LakeTable
    from etl_spark.session import get_spark

    spark = get_spark(
        "lake_export", parallelism=args.parallelism,
        shuffle_partitions=args.parallelism,
    )
    table = LakeTable(spark, args.table_root)
    stats = export_changes(
        table, args.out_dir, cursor_path=args.cursor,
        include_pre_images=args.pre_images,
    )
    print(json.dumps({"job": "lake_export", "out_dir": args.out_dir, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
