"""Z-order clustering compaction (compact(zorder_by=[...]) +
lake/zorder.py): Morton-key layout makes every file an axis-aligned
box in k-space, so read(where_ranges=...) prunes files for range
predicates on ANY interleaved column — a 1-D sorted layout only
serves its own column. Delta OPTIMIZE ZORDER BY analog; the
reference full-scans per query (no file statistics at all)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import LakeTable
from etl_spark.lake.zorder import column_bounds, zvalue_column

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _mk(spark, tmp_path, mode="cow", num_buckets=2):
    return LakeTable.create(
        spark, str(tmp_path / f"ztbl_{mode}"),
        [("user_id", "long"), ("x", "long"), ("y", "double"),
         ("ts", "timestamp")],
        ["user_id"], "user_id", num_buckets=num_buckets, write_mode=mode,
    )


def _rows(n):
    # x and y walk independent residue patterns, so neither is a
    # function of the other: a 1-D sort on x leaves y unclustered
    out = []
    for i in range(n):
        out.append(dict(
            user_id=i, x=(i * 7) % n, y=float((i * 13) % n),
            ts=T0 + dt.timedelta(minutes=i), op="U", lsn=i + 1,
        ))
    return out


def _fill(spark, t, n=512):
    merge_into(
        t, spark.createDataFrame(pd.DataFrame(_rows(n))), batch_key="b0"
    )
    return n


def test_zvalue_interleaves_and_orders(spark):
    df = spark.createDataFrame(
        pd.DataFrame([
            dict(x=0, y=0.0), dict(x=3, y=0.0),
            dict(x=0, y=3.0), dict(x=3, y=3.0),
        ])
    )
    cols = [("x", "long"), ("y", "double")]
    bounds = column_bounds(df, cols)
    assert bounds == {"x": (0.0, 3.0), "y": (0.0, 3.0)}
    z = [
        r["z"]
        for r in df.select(zvalue_column(cols, bounds, bits=2).alias("z"))
                   .collect()
    ]
    # 2-bit ranks: (0,0)->0b0000, (3,0)->0b0101, (0,3)->0b1010,
    # (3,3)->0b1111 — x takes the even bit lanes, y the odd ones
    assert z == [0, 5, 10, 15]


def test_zvalue_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        pd.DataFrame([dict(x=1, y=None), dict(x=5, y=None)])
    ).withColumn("y", F.col("y").cast("double"))
    cols = [("x", "long"), ("y", "double")]
    bounds = column_bounds(df, cols)
    z = [
        r["z"]
        for r in df.select(zvalue_column(cols, bounds, bits=2).alias("z"))
                   .collect()
    ]
    # all-null y ranks constant 0; x alone still orders the rows
    assert z[0] < z[1]


def test_zorder_preserves_state_and_prunes_both_dims(spark, tmp_path):
    t = _mk(spark, tmp_path)
    n = _fill(spark, t)
    before = {(r["user_id"], r["x"], r["y"]) for r in t.read().collect()}

    t.compact(max_files_per_bucket=0, zorder_by=["x", "y"],
              split_per_bucket=8)
    after = {(r["user_id"], r["x"], r["y"]) for r in t.read().collect()}
    assert after == before
    total = len(t.read().inputFiles())
    assert total >= 8  # the split actually happened

    # a narrow slice on EACH dimension alone prunes files
    for col, lo, hi in (("x", 0, n // 8), ("y", 0.0, n / 8)):
        got = t.read(where_ranges={col: (lo, hi)})
        assert len(got.inputFiles()) < total
        exp = {k for k in before if lo <= (k[1] if col == "x" else k[2]) <= hi}
        assert {(r["user_id"], r["x"], r["y"]) for r in got.collect()} == exp


def test_zorder_beats_lexicographic_on_second_dim(spark, tmp_path):
    tz = _mk(spark, tmp_path / "z")
    tl = _mk(spark, tmp_path / "lex")
    n = _fill(spark, tz)
    _fill(spark, tl)
    tz.compact(max_files_per_bucket=0, zorder_by=["x", "y"],
               split_per_bucket=8)
    tl.compact(max_files_per_bucket=0, sort_by="x", split_per_bucket=8)

    w = {"y": (0.0, n / 8)}
    z_files = len(tz.read(where_ranges=w).inputFiles())
    lex_files = len(tl.read(where_ranges=w).inputFiles())
    lex_total = len(tl.read().inputFiles())
    # x-sorted files each span ~the full y range: no pruning on y.
    # z-ordered files are y-narrow boxes: real pruning.
    assert lex_files == lex_total
    assert z_files < lex_files
    # both layouts return identical rows (pruning is never semantics)
    assert (
        sorted(r["user_id"] for r in tz.read(where_ranges=w).collect())
        == sorted(r["user_id"] for r in tl.read(where_ranges=w).collect())
    )


def test_zorder_mor_single_commit_prunes_per_file(spark, tmp_path):
    t = _mk(spark, tmp_path, mode="mor")
    n = _fill(spark, t)
    # second delta commit so buckets are multi-commit pre-compaction
    merge_into(
        t,
        spark.createDataFrame(pd.DataFrame(
            [dict(user_id=i, x=i, y=float(i),
                  ts=T0 + dt.timedelta(minutes=i), op="U", lsn=n + i + 1)
             for i in range(0, 32)]
        )),
        batch_key="b1",
    )
    t.compact(max_files_per_bucket=0, zorder_by=["x", "ts"],
              split_per_bucket=8)
    total = len(t.read().inputFiles())
    got = t.read(where_ranges={
        "ts": (T0, T0 + dt.timedelta(minutes=n // 8))
    })
    assert len(got.inputFiles()) < total
    # last-writer-wins survives the clustered rewrite
    assert {r["x"] for r in t.lookup([3]).collect()} == {3}


def test_zorder_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _fill(spark, t, n=16)
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.compact(max_files_per_bucket=0, sort_by="x", zorder_by=["y"])
    with pytest.raises(ValueError, match="unknown zorder_by"):
        t.compact(max_files_per_bucket=0, zorder_by=["nope"])
    with pytest.raises(ValueError, match="1..3"):
        t.compact(max_files_per_bucket=0,
                  zorder_by=["x", "y", "ts", "user_id"])
    t2 = LakeTable.create(
        spark, str(tmp_path / "s"), [("k", "long"), ("s", "string")],
        ["k"], "k", num_buckets=1,
    )
    merge_into(
        t2,
        spark.createDataFrame(pd.DataFrame(
            [dict(k=1, s="a", op="U", lsn=1)]
        )),
        batch_key="b0",
    )
    with pytest.raises(ValueError, match="not\\s+rankable"):
        t2.compact(max_files_per_bucket=0, zorder_by=["s"])


def test_user_column_named_layout_survives_rewrites(spark, tmp_path):
    """The clustered-rewrite temp column must never collide with a
    user column (regression: dropping by the fixed name "_layout"
    silently deleted a real column of that name from every rewritten
    file — data loss on read). Both the sort_by and zorder_by paths
    preserve it."""
    t = LakeTable.create(
        spark, str(tmp_path / "lay"),
        [("user_id", "long"), ("_layout", "long"), ("v", "long")],
        ["user_id"], "user_id", num_buckets=1,
    )
    rows = [
        dict(user_id=u, _layout=u * 3, v=u, op="U", lsn=u + 1)
        for u in range(64)
    ]
    merge_into(t, spark.createDataFrame(pd.DataFrame(rows)), batch_key="b0")
    t.compact(max_files_per_bucket=0, sort_by="_layout", split_per_bucket=2)
    got = {(r["user_id"], r["_layout"]) for r in t.read().collect()}
    assert got == {(u, u * 3) for u in range(64)}
    t.compact(max_files_per_bucket=0, zorder_by=["_layout", "v"],
              split_per_bucket=2)
    got = {(r["user_id"], r["_layout"]) for r in t.read().collect()}
    assert got == {(u, u * 3) for u in range(64)}
    # and the layout still prunes on the awkwardly-named column
    sel = t.read(where_ranges={"_layout": (0, 30)})
    assert {r["_layout"] for r in sel.collect()} == {u * 3 for u in range(11)}
