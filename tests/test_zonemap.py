"""Zone-map data skipping: per-file [min,max] ranges collected from
staged parquet footers (DataFile.ranges, field-ID keyed) and
read(where_ranges=...) file pruning, with the merge-on-read soundness
rule (per-file only within single-commit buckets; multi-commit buckets
all-or-nothing) and sorted compaction (compact(sort_by=...)) as the
layout that makes in-bucket skipping effective. Iceberg metadata
pruning / sort-order compaction analog; the reference has no file
statistics at all (full scans per query)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import LakeTable

FIELDS = [("user_id", "long"), ("v", "long"), ("ts", "timestamp")]
KEY = ["user_id"]
T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _mk(spark, tmp_path, mode, num_buckets=2):
    return LakeTable.create(
        spark, str(tmp_path / f"tbl_{mode}"), FIELDS, KEY, "user_id",
        num_buckets=num_buckets, write_mode=mode,
    )


def _src(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def _row(uid, v, lsn, op="U"):
    ts = None if v is None else T0 + dt.timedelta(minutes=v)
    return dict(user_id=uid, v=v, ts=ts, op=op, lsn=lsn)


def test_ranges_collected_and_cow_prunes_after_sorted_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    merge_into(t, _src(spark, [_row(u, u, u + 1) for u in range(200)]), batch_key="b0")
    m = t.manifest()
    files = m.files
    assert files and all(f.ranges for f in files)
    # every staged file carries a [min,max] for each primitive field
    ts_id = next(f.id for f in m.schema.fields if f.name == "ts")
    for f in files:
        lo, hi = f.ranges[ts_id]
        assert isinstance(lo, int) and lo <= hi

    # unsorted layout: one file per bucket, each spanning ~the full v
    # range — a v-window prune keeps everything (the layout, not the
    # mechanism, is the limit)
    full = t.read(where_ranges={"v": (10, 19)})
    assert {r["v"] for r in full.collect()} == set(range(10, 20))

    # sorted compaction: each bucket becomes range-disjoint files
    t.compact(max_files_per_bucket=0, sort_by="v", split_per_bucket=4)
    total = len(t.manifest().files)
    assert total > 2  # buckets actually split
    pruned = t.read(where_ranges={"v": (10, 19)})
    assert {r["v"] for r in pruned.collect()} == set(range(10, 20))
    assert len(pruned.inputFiles()) < total

    # timestamp bounds (datetime and ISO string) prune too
    lo, hi = T0 + dt.timedelta(minutes=50), T0 + dt.timedelta(minutes=59)
    got = t.read(where_ranges={"ts": (lo, hi)})
    assert got.count() == 10
    assert len(got.inputFiles()) < total
    got2 = t.read(where_ranges={"ts": (lo.isoformat(), hi.isoformat())})
    assert got2.count() == 10


def test_ranges_survive_rename(spark, tmp_path):
    """Ranges key by field ID: files staged before a rename still
    prune under the new column name."""
    t = _mk(spark, tmp_path, "cow")
    merge_into(t, _src(spark, [_row(u, u, u + 1) for u in range(100)]), batch_key="b0")
    t.compact(max_files_per_bucket=0, sort_by="v", split_per_bucket=4)
    t.rename_column("v", "val")
    total = len(t.manifest().files)
    got = t.read(where_ranges={"val": (0, 9)})
    assert {r["val"] for r in got.collect()} == set(range(10))
    assert len(got.inputFiles()) < total


def test_mor_multi_commit_bucket_never_resurrects(spark, tmp_path):
    """The hazard the bucket-granular rule exists for: the current
    image (out of range) lives in a newer file, a stale in-range image
    in an older one. Per-file pruning would drop the newer file and
    resurrect the stale value; the rule keeps the whole bucket and the
    residual filter returns nothing."""
    t = _mk(spark, tmp_path, "mor", num_buckets=1)
    merge_into(t, _src(spark, [_row(1, 5, 1)]), batch_key="b0")   # v=5 in range
    merge_into(t, _src(spark, [_row(1, 50, 2)]), batch_key="b1")  # v=50 current
    assert t.read(where_ranges={"v": (0, 10)}).count() == 0
    assert [r["v"] for r in t.read().collect()] == [50]

    # all files excluded -> the bucket IS droppable (resolved value is
    # always one of the stored values)
    none = t.read(where_ranges={"v": (1000, 2000)})
    assert none.count() == 0 and none.inputFiles() == []

    # compaction collapses to a single commit: per-file pruning arms
    t.compact()
    m = t.manifest()
    kept = t._prune_files(m, m.files, {"v": (0, 10)}, resolve=True)
    assert kept == []
    assert t.read(where_ranges={"v": (0, 10)}).count() == 0


def test_mor_single_commit_bucket_prunes_per_file(spark, tmp_path):
    """A bucket whose files all come from one commit has at most one
    version of any key, so files prune independently — sorted
    compaction under MoR restores in-bucket skipping."""
    t = _mk(spark, tmp_path, "mor", num_buckets=1)
    for b, lo in enumerate(range(0, 200, 50)):
        merge_into(
            t,
            _src(spark, [_row(u, u, 1000 * b + u + 1) for u in range(lo, lo + 50)]),
            batch_key=f"b{b}",
        )
    t.compact(max_files_per_bucket=2, sort_by="v", split_per_bucket=4)
    m = t.manifest()
    total = len(m.files)
    assert total > 1
    kept = t._prune_files(m, m.files, {"v": (0, 30)}, resolve=True)
    assert 0 < len(kept) < total
    got = t.read(where_ranges={"v": (0, 30)})
    assert {r["v"] for r in got.collect()} == set(range(31))


def test_tombstone_and_delete_interaction(spark, tmp_path):
    """Deletes stay dead under a range read: a dead key's stale
    in-range image must not surface, and a tombstone-holding file with
    no sort-column stats is never pruned away from under the resolve."""
    t = _mk(spark, tmp_path, "mor", num_buckets=1)
    merge_into(t, _src(spark, [_row(1, 5, 1), _row(2, 6, 2)]), batch_key="b0")
    merge_into(t, _src(spark, [_row(1, None, 3, op="D")]), batch_key="b1")
    got = t.read(where_ranges={"v": (0, 10)})
    assert {(r["user_id"], r["v"]) for r in got.collect()} == {(2, 6)}


def test_where_ranges_validation(spark, tmp_path):
    t = _mk(spark, tmp_path, "cow")
    merge_into(t, _src(spark, [_row(1, 1, 1)]), batch_key="b0")
    import pytest

    with pytest.raises(ValueError, match="unknown column"):
        t.read(where_ranges={"nope": (0, 1)})


def test_prune_survives_timestamp_widen(spark, tmp_path):
    """Regression (round-4 review find): bounds stored before an
    (int|long)->timestamp widen are epoch SECONDS in the writer-type
    domain, while post-widen query bounds encode as epoch MICROS.
    Comparing raw pruned every pre-widen file — a silent empty result
    for an in-range window. The prune now converts stored bounds
    through the file's write-time schema (x1e6 for the timestamp
    widens), so pre-widen files keep pruning CORRECTLY, and a numeric
    widen (int->long) keeps pruning EFFECTIVELY."""
    base = 1_704_067_200  # 2024-01-01T00:00Z
    for mode in ("cow", "mor"):
        t = LakeTable.create(
            spark, str(tmp_path / f"w_{mode}"),
            [("user_id", "long"), ("v", "int"), ("ts", "long")],
            ["user_id"], "user_id", num_buckets=2, write_mode=mode,
        )
        rows = [
            dict(user_id=u, v=u, ts=base + u * 60, op="U", lsn=u + 1)
            for u in range(100)
        ]
        src = _src(spark, rows).withColumn("v", F.col("v").cast("int"))
        merge_into(t, src, batch_key="b0")
        t.widen_type("ts", "timestamp")
        t.widen_type("v", "long")
        lo = T0 + dt.timedelta(minutes=10)
        hi = T0 + dt.timedelta(minutes=19)
        got = t.read(where_ranges={"ts": (lo, hi)})
        assert {r["user_id"] for r in got.collect()} == set(range(10, 20))
        # the numeric widen still prunes (identity map, not disabled)
        t.compact(max_files_per_bucket=0, sort_by="v", split_per_bucket=4)
        total = len(t.manifest().files)
        narrow = t.read(where_ranges={"v": (10, 19)})
        assert {r["v"] for r in narrow.collect()} == set(range(10, 20))
        assert len(narrow.inputFiles()) < total
        # an out-of-range window over pre-widen files still prunes to
        # nothing (conversion preserves exclusion, not just inclusion)
        t2 = t.read(where_ranges={"ts": (T0 + dt.timedelta(days=365), None)})
        assert t2.count() == 0 and t2.inputFiles() == []


def test_date_column_zone_maps(spark, tmp_path):
    """Date columns get footer ranges (days since epoch) and prune
    under where_ranges with date or ISO-string bounds (regression:
    date was z-orderable but absent from _STAT_TYPES, so the layout
    could never be used for pruning on that dimension)."""
    t = LakeTable.create(
        spark, str(tmp_path / "dt"),
        [("user_id", "long"), ("d", "date"), ("v", "long")],
        ["user_id"], "user_id", num_buckets=2,
    )
    d0 = dt.date(2024, 1, 1)
    rows = [
        dict(user_id=u, d=d0 + dt.timedelta(days=u), v=u, op="U", lsn=u + 1)
        for u in range(120)
    ]
    merge_into(t, _src(spark, rows), batch_key="b0")
    m = t.manifest()
    d_id = next(f.id for f in m.schema.fields if f.name == "d")
    for f in m.files:
        lo, hi = f.ranges[d_id]
        assert isinstance(lo, int) and lo <= hi  # days since epoch
    t.compact(max_files_per_bucket=0, sort_by="d", split_per_bucket=4)
    total = len(t.manifest().files)
    lo, hi = d0 + dt.timedelta(days=30), d0 + dt.timedelta(days=39)
    got = t.read(where_ranges={"d": (lo, hi)})
    assert {r["v"] for r in got.collect()} == set(range(30, 40))
    assert len(got.inputFiles()) < total
    got2 = t.read(where_ranges={"d": (lo.isoformat(), hi.isoformat())})
    assert got2.count() == 10
    # z-order over (d, v) serves both dimensions for a date column too
    t.compact(max_files_per_bucket=0, zorder_by=["d", "v"],
              split_per_bucket=4)
    both = t.read(where_ranges={"d": (lo, hi), "v": (0, 34)})
    assert {r["v"] for r in both.collect()} == set(range(30, 35))
    assert len(both.inputFiles()) < len(t.manifest().files)
