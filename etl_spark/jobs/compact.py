"""Maintenance entry point: bound per-bucket delta-file counts on a
merge-on-read table (Iceberg's rewrite_data_files analog).

At 10^10-row scale this runs as a scheduled job off the ingest path:
the streaming writer appends O(batch) delta files per micro-batch and
this job periodically collapses buckets whose live-file count exceeds
the bound, committing a new snapshot atomically (readers keep seeing
the old snapshot until the manifest swap). The ingest query never
blocks — compaction and appends race only at the manifest O_EXCL
create, and the loser simply retries on the next cycle.

With --expire-keep-last N the same maintenance window also runs
snapshot retention (Iceberg `expire_snapshots` + `remove_orphan_files`
analog): manifests older than the N most recent versions are dropped
and data files no longer referenced by any surviving snapshot —
including crash-orphaned staging directories — are deleted. Running it
after compaction reclaims the pre-compaction file generations in the
same pass.

Usage:
    python -m etl_spark.jobs.compact --table-root /path/to/tbl \
        [--max-files-per-bucket 4] [--parallelism 8] \
        [--expire-keep-last 3] [--no-vacuum]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--table-root", required=True)
    p.add_argument("--max-files-per-bucket", type=int, default=4)
    p.add_argument("--parallelism", type=int, default=8)
    p.add_argument(
        "--expire-keep-last", type=int, default=0,
        help="after compacting, keep only the N newest snapshots "
        "(0 = no retention pass)",
    )
    p.add_argument(
        "--tombstone-grace-lsns", type=int, default=None,
        help="also purge delete tombstones older than "
        "covered_max_lsn - GRACE (Cassandra gc_grace analog); GRACE "
        "must exceed the source's worst-case re-delivery lag in LSNs",
    )
    p.add_argument(
        "--orphan-grace-seconds", type=float, default=900.0,
        help="vacuum only unreferenced files older than this (Iceberg "
        "remove_orphan_files older_than analog) — protects a writer "
        "mid-commit whose rebase moved its final version past its "
        "staging version",
    )
    p.add_argument(
        "--no-vacuum", action="store_true",
        help="with --expire-keep-last: drop old manifests but keep "
        "unreferenced data files on disk",
    )
    p.add_argument(
        "--build-blooms", nargs="*", metavar="COLUMN", default=None,
        help="after compacting, (re)build Bloom sidecars for files "
        "that lack them: no COLUMN = the bucket key (lookup path); "
        "named columns get where_in equality-skipping filters "
        "(Iceberg compute-stats analog; run it here because "
        "compaction replaces files and resets their filters)",
    )
    args = p.parse_args()

    from etl_spark.lake.table import LakeTable
    from etl_spark.session import get_spark

    spark = get_spark(
        "lake_compact", parallelism=args.parallelism,
        shuffle_partitions=args.parallelism,
    )
    table = LakeTable(spark, args.table_root)
    before = table.manifest()
    files_before = len(before.files)
    version = table.compact(
        args.max_files_per_bucket,
        tombstone_grace_lsns=args.tombstone_grace_lsns,
    )
    after = table.manifest()
    out = {
        "job": "lake_compact",
        "table_root": args.table_root,
        "version_before": before.version,
        "version_after": version,
        "files_before": files_before,
        "files_after": len(after.files),
        "compacted": version != before.version,
    }
    if args.build_blooms is not None:
        out["blooms"] = table.build_blooms(
            columns=args.build_blooms or None
        )
    if args.expire_keep_last > 0:
        out["expire"] = table.expire_snapshots(
            keep_last=args.expire_keep_last,
            vacuum=not args.no_vacuum,
            orphan_grace_seconds=args.orphan_grace_seconds,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
