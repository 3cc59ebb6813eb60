"""Write-audit-publish branch control: the operator loop around a
staged CDC backfill. Typical cycle:

    python -m etl_spark.jobs.wap --table-root /lake/tbl create audit
    # ... run the replay with EngineConfig(branch="audit") ...
    python -m etl_spark.jobs.audit --manifest-dir /lake/manifest
    python -m etl_spark.jobs.wap --table-root /lake/tbl publish audit
    #   (or: drop audit  — failed audit; main untouched, files vacuumed)

Publish is a metadata-only fast-forward (manifest renames) and is
re-entrant after a crash; it refuses if main advanced past the fork
(single-writer WAP contract — see lake/table.py). `list` prints each
branch's fork version and head. The reference has no staging
isolation at all — writes land directly in the serving table
(/root/reference/src/pipeline/core/client_clickhouse.py:154-206).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--table-root", required=True)
    p.add_argument("action", choices=["create", "publish", "drop", "list"])
    p.add_argument("branch", nargs="?")
    args = p.parse_args()
    if args.action != "list" and not args.branch:
        p.error(f"{args.action} requires a branch name")

    from etl_spark.lake.table import LakeTable

    # every branch operation is driver-side manifest metadata (copies,
    # O_EXCL creates, atomic renames) — no Spark session, so publish
    # between audit and unblocking main readers is near-instant
    table = LakeTable(None, args.table_root)
    if args.action == "create":
        table.create_branch(args.branch)
        out = {"job": "wap", "action": "create", "branch": args.branch,
               "fork_version": table._branch_fork(args.branch)}
    elif args.action == "publish":
        head = table.publish_branch(args.branch)
        out = {"job": "wap", "action": "publish", "branch": args.branch,
               "main_version": head}
    elif args.action == "drop":
        stats = table.drop_branch(args.branch)
        out = {"job": "wap", "action": "drop", "branch": args.branch, **stats}
    else:
        out = {
            "job": "wap",
            "action": "list",
            "branches": [
                {
                    "name": b,
                    "fork_version": table._branch_fork(b),
                    "head": max(table._branch_versions(b)),
                }
                for b in table.branches()
            ],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
