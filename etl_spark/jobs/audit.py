"""Lineage audit entry point: verify the replay invariants and print
per-batch operational metrics from the manifest ledger — the command
an operator runs after (or during) a 10^10-event replay to confirm the
log was applied exactly once and see where the time went. Reads only
manifests: O(batches x buckets), no table scan.

Usage:
    python -m etl_spark.jobs.audit --manifest-dir /path/to/manifest \
        [--manifest-dir /more/dirs ...] [--batches] [--parallelism 4]

Multiple --manifest-dir flags audit the UNION of ledgers (the routed
mode's invariant surface: per-entity ledgers over one shared LSN
sequence are individually sparse but dense together).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest-dir", action="append", required=True)
    p.add_argument("--batches", action="store_true",
                   help="also print one JSON line per batch (metrics)")
    p.add_argument("--parallelism", type=int, default=4)
    args = p.parse_args()

    from etl_spark.engine import lineage
    from etl_spark.session import get_spark

    spark = get_spark(
        "lineage_audit", parallelism=args.parallelism,
        shuffle_partitions=args.parallelism,
    )
    dirs = args.manifest_dir if len(args.manifest_dir) > 1 else args.manifest_dir[0]
    inv = lineage.check_invariants(spark, dirs)  # raises on LSN gap
    print(json.dumps({"job": "lineage_audit", "ok": True, **inv}))
    if args.batches:
        for r in lineage.batch_metrics(spark, dirs).collect():
            print(json.dumps(r.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
