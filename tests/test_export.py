"""Incremental change-feed export: exactly-once cursor protocol and
downstream equivalence with the full change feed."""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import functions as F

from etl_spark.lake.changes import read_changes
from etl_spark.lake.export import export_changes, read_exported
from etl_spark.lake.merge import merge_into
from tests.test_lake_table import make_table, seed


def _merge(spark, t, conv, turn, text, lsn, op="U"):
    from etl_spark.lake.table import spark_type

    src = spark.createDataFrame(
        pd.DataFrame(
            dict(conv_id=[conv], turn_idx=[turn], text=[text],
                 ts=[lsn], lsn=[lsn], op=[op])
        )
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    for f in t.manifest().schema.fields:  # align to the evolved schema
        if f.name not in src.columns:
            # null-backfill added columns; map renamed ones from the
            # base name the helper still uses (text -> body)
            base = "text" if f.name == "body" else None
            if base and base in src.columns:
                src = src.withColumnRenamed(base, f.name)
            else:
                src = src.withColumn(f.name, F.lit(None).cast(spark_type(f.type)))
        src = src.withColumn(f.name, F.col(f.name).cast(spark_type(f.type)))
    merge_into(t, src, batch_key=f"b{lsn}")


def _norm(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(["_commit_version", "conv_id", "turn_idx", "_change_type"])
        .reset_index(drop=True)
    )


def test_export_matches_full_feed_incrementally(spark, tmp_path):
    t = make_table(spark, tmp_path)
    seed(spark, t)  # v1
    _merge(spark, t, "c0", 0, "u1", 100)
    _merge(spark, t, "c1", 1, "u2", 101)
    out = str(tmp_path / "downstream")

    s1 = export_changes(t, out)
    assert s1["from_version"] == 0 and s1["to_version"] == t.current_version()
    assert s1["rows_exported"] > 0

    # more commits, incl. a schema change between export windows
    t.add_column("lang", "string")
    _merge(spark, t, "c2", 2, "u3", 102)
    _merge(spark, t, "c0", 0, "", 103, op="D")
    s2 = export_changes(t, out)
    assert s2["from_version"] == s1["to_version"]
    assert s2["rows_exported"] > 0

    # downstream union == the full feed from version 0 (current schema;
    # pre-evolution windows surface NULL for the added column)
    got = _norm(read_exported(spark, out))
    want = _norm(read_changes(t, 0))
    missing = [c for c in want.columns if c not in got.columns]
    assert missing == []
    pd.testing.assert_frame_equal(got[list(want.columns)], want)

    # cursor is current: re-export is a no-op
    s3 = export_changes(t, out)
    assert s3["rows_exported"] == 0 and s3["to_version"] == s3["from_version"]


def test_export_crash_replay_is_idempotent(spark, tmp_path):
    """Crash between data write and cursor advance: the rerun
    re-exports from the same version — overwriting the orphaned
    window even though the range end has advanced — so downstream
    never sees duplicates."""
    t = make_table(spark, tmp_path)
    seed(spark, t)
    _merge(spark, t, "c0", 0, "u1", 100)
    out = str(tmp_path / "downstream")
    cursor = os.path.join(out, "_cursor.json")

    export_changes(t, out)
    # simulate the crash: roll the cursor back to 0 (data write
    # happened, cursor advance did not), then advance the table
    os.remove(cursor)
    _merge(spark, t, "c1", 1, "u2", 101)
    export_changes(t, out)

    got = _norm(read_exported(spark, out))
    want = _norm(read_changes(t, 0))
    pd.testing.assert_frame_equal(got[list(want.columns)], want)
    # exactly one window dir: the orphan was overwritten, not joined
    dirs = [d for d in os.listdir(out) if d.startswith("from=")]
    assert dirs == ["from=1"]




def test_export_fails_loud_when_retention_outpaces_cursor(spark, tmp_path):
    """expire_snapshots reclaiming history the export cursor still
    needs must be an actionable error, not a silent partial export."""
    import pytest

    t = make_table(spark, tmp_path)
    seed(spark, t)
    _merge(spark, t, "c0", 0, "u1", 100)
    out = str(tmp_path / "downstream")
    export_changes(t, out)  # cursor now at the current version
    os.remove(os.path.join(out, "_cursor.json"))  # consumer "lost" it

    _merge(spark, t, "c1", 1, "u2", 101)
    _merge(spark, t, "c2", 2, "u3", 102)
    t.expire_snapshots(keep_last=2)  # reclaims versions the cursor=0 needs
    with pytest.raises(RuntimeError, match="expired past"):
        export_changes(t, out)


def test_export_aligns_rename_and_widen_across_windows(spark, tmp_path):
    """Schema evolution BETWEEN export runs: a rename must surface as
    ONE logical column across all windows (field-ID alignment — a
    mergeSchema read would split it into two half-null columns) and a
    widen must cast old windows up (mergeSchema outright refuses to
    merge long with timestamp, making the history unreadable)."""
    t = make_table(spark, tmp_path)
    seed(spark, t)
    _merge(spark, t, "c0", 0, "w1-old-names", 100)
    out = str(tmp_path / "downstream")
    export_changes(t, out)  # window 1: schema (text, ts:long)

    t.rename_column("text", "body")
    t.widen_type("ts", "timestamp")
    _merge(spark, t, "c1", 1, "w2-new-names", 101)
    export_changes(t, out)  # window 2: schema (body, ts:timestamp)

    got = read_exported(spark, out)
    cols = got.columns
    assert "body" in cols and "text" not in cols, cols
    assert dict(got.dtypes)["ts"] == "timestamp"
    rows = {r["body"]: r for r in got.filter(F.col("_change_type") != "delete").collect()}
    # window-1 content surfaces under the CURRENT name with cast ts
    assert "w1-old-names" in rows and "w2-new-names" in rows
    assert rows["w1-old-names"]["ts"] is not None
    # and it equals the live feed read at the current schema
    want = _norm(read_changes(t, 0))
    pd.testing.assert_frame_equal(_norm(got)[list(want.columns)], want)
