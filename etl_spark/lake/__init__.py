"""Versioned parquet lake table: snapshots, schema evolution, MERGE.

Stand-in for an Iceberg v2 table (no lake-format jars ship in this
sandbox). Provides the subset the CDC engine needs:

- atomic versioned snapshot commits (JSON manifest per version,
  created with O_EXCL — crash-safe, single-writer),
- field-ID based schema evolution (add / rename / type-widen are
  metadata-only; old data files are mapped on read),
- hash-bucket layout on the merge key prefix, so MERGE rewrites only
  the touched buckets (copy-on-write with partition pruning),
- per-commit batch ledger for exactly-once foreachBatch retries
  (replaces the reference's `loaded_files` registry table,
  /root/reference/src/pipeline/core/client_clickhouse.py:76-82,193).
"""

from etl_spark.lake.table import LakeTable, TableSchema, Field
from etl_spark.lake.merge import merge_into

__all__ = ["LakeTable", "TableSchema", "Field", "merge_into"]
