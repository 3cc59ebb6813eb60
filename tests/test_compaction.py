"""Merge-on-read maintenance: compaction bounds per-bucket file counts
without changing visible state (tombstone winners preserved)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.config import EngineConfig
from etl_spark.engine.apply import apply_batch
from etl_spark.gen.binlog import GenConfig, gen_base, gen_binlog, gen_schema_ops
from etl_spark.gen.oracle import replay_oracle
from etl_spark.lake.table import LakeTable
from etl_spark.pipeline import bootstrap, final_state
from tests.util import assert_frames_equal


def _apply_all(spark, cfg, ops, binlog):
    for batch_id, (_, seg) in enumerate(binlog.groupby("_seg")):
        df = spark.createDataFrame(seg.drop(columns="_seg"))
        df = df.withColumn("turn_idx", F.col("turn_idx").cast("int")).withColumn(
            "schema_version", F.col("schema_version").cast("int")
        )
        apply_batch(spark, cfg, ops, df, batch_id)


def test_inline_compaction_preserves_state(spark, tmp_path):
    g = GenConfig(n_convs=6, n_events=120, dup_rate=0.1, disorder_window=6, segment_size=20)
    base, ops = gen_base(g), gen_schema_ops(g)
    binlog = gen_binlog(g, base, ops)

    cfg_plain = EngineConfig(
        table_root=str(tmp_path / "t1"), manifest_dir=str(tmp_path / "m1"),
        checkpoint_dir=str(tmp_path / "c1"), num_buckets=4,
    )
    cfg_compact = EngineConfig(
        table_root=str(tmp_path / "t2"), manifest_dir=str(tmp_path / "m2"),
        checkpoint_dir=str(tmp_path / "c2"), num_buckets=4,
        compact_max_files_per_bucket=2,
    )
    for cfg in (cfg_plain, cfg_compact):
        bootstrap(spark, cfg, base)
        _apply_all(spark, cfg, ops, binlog)

    oracle = replay_oracle(base, binlog, ops)
    assert_frames_equal(final_state(spark, cfg_plain), oracle)
    assert_frames_equal(final_state(spark, cfg_compact), oracle)

    # compacted table respects the file bound; plain table accumulated
    # one delta file set per batch (6 segments + bootstrap)
    mc = LakeTable(spark, cfg_compact.table_root).manifest()
    per_bucket: dict[int, int] = {}
    for f in mc.files:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
    assert max(per_bucket.values()) <= 2, per_bucket
    mp = LakeTable(spark, cfg_plain.table_root).manifest()
    assert len(mp.files) > len(mc.files)


def test_explicit_compact_after_replay(spark, tmp_path):
    g = GenConfig(n_convs=5, n_events=80, segment_size=20, dup_rate=0.05)
    base, ops = gen_base(g), gen_schema_ops(g)
    binlog = gen_binlog(g, base, ops)
    cfg = EngineConfig(
        table_root=str(tmp_path / "t"), manifest_dir=str(tmp_path / "m"),
        checkpoint_dir=str(tmp_path / "c"), num_buckets=4,
    )
    bootstrap(spark, cfg, base)
    _apply_all(spark, cfg, ops, binlog)
    table = LakeTable(spark, cfg.table_root)
    before = final_state(spark, cfg).toPandas()
    table.compact(max_files_per_bucket=1)
    after = final_state(spark, cfg).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(before, after)
    m = table.manifest()
    per_bucket: dict[int, int] = {}
    for f in m.files:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
    assert max(per_bucket.values()) <= 1
