"""Incremental change-feed export: lake → downstream consumers.

The engine's last hop: downstream systems (feature stores, search
indexes, other lakes) consume the table's changes without rescanning
state. This job tails the version history through `read_changes` and
appends each new commit window to a downstream parquet directory,
exactly-once via a version cursor — the multi-hop counterpart of the
ingest side's checkpoint + ledger. (The reference pipeline ends at its
warehouse table and has no downstream emission; this is the
Delta-CDF-consumer / Kafka-sink shape a production CDC deployment
needs.)

Exactly-once protocol (same two-phase shape as the ingest commit):

1. read the cursor (last exported table version; 0 = never exported),
2. write changes for versions (cursor, current] to
   ``<out_dir>/from=<cursor+1>`` with ``mode("overwrite")``,
3. atomically advance the cursor (tmp + os.replace).

A crash between 2 and 3 leaves the cursor unchanged; the next run
re-exports from the SAME version — and because the directory is named
by the range START only, the rerun overwrites the orphaned directory
even when the range end has advanced in the meantime (a range-named
directory would leave overlapping dirs and duplicate rows). Distinct
``from=`` dirs never overlap because the cursor only advances after a
successful write.

Export windows may span schema evolution: each window is written in
the table's CURRENT logical schema at export time, so older windows
can have fewer columns — `read_exported` reads with mergeSchema so
downstream sees the union schema with NULLs for pre-evolution windows.

Scale: each export moves O(changed rows in the window) — the
`read_changes` plan is bucket-restricted per commit — and the cursor
is one tiny JSON file. Runs off the ingest path on any cadence.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from etl_spark.lake.changes import read_changes
from etl_spark.lake.table import LakeTable


def _read_cursor(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path) as fh:
        return int(json.load(fh)["exported_version"])


def _write_cursor(path: str, version: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"exported_version": version}, fh)
    os.replace(tmp, path)


def export_changes(
    table: LakeTable,
    out_dir: str,
    cursor_path: str | None = None,
    include_pre_images: bool = False,
) -> dict:
    """Export all not-yet-exported commits to `out_dir`; advance the
    cursor only after the write succeeds. Returns
    {"from_version", "to_version", "rows_exported"} (a no-op export
    when the cursor is already current reports rows_exported=0)."""
    cursor_path = cursor_path or os.path.join(out_dir, "_cursor.json")
    frm = _read_cursor(cursor_path)
    cur = table.current_version()
    if cur <= frm:
        return {"from_version": frm, "to_version": cur, "rows_exported": 0}
    try:
        changes = read_changes(
            table, frm, cur, include_pre_images=include_pre_images
        )
    except FileNotFoundError as e:
        # retention outpaced this consumer: expire_snapshots reclaimed
        # manifests the cursor still needs (same hazard as Iceberg
        # snapshot expiry vs changelog consumers). Size keep_last to
        # exceed the export cadence; recovery is a downstream resync.
        raise RuntimeError(
            f"export cursor is at version {frm} but snapshot history "
            f"has been expired past it; full-resync downstream from "
            f"the current snapshot and reset the cursor "
            f"({cursor_path})"
        ) from e
    dest = os.path.join(out_dir, f"from={frm + 1}")
    changes.write.mode("overwrite").parquet(dest)
    # exact count from the written footers (no extra job)
    import pyarrow.parquet as pq

    rows = sum(
        pq.ParquetFile(os.path.join(dest, f)).metadata.num_rows
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    )
    _write_cursor(cursor_path, cur)
    return {"from_version": frm, "to_version": cur, "rows_exported": rows}


def read_exported(spark, out_dir: str) -> DataFrame:
    """Downstream view of the exported feed (all windows; union schema
    across schema-evolution boundaries)."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", out_dir)
        .parquet(os.path.join(out_dir, "from=*"))
        .drop("from")
    )
