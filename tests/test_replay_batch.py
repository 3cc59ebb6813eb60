"""Replay-equivalence golden test (batch path): engine vs sequential oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_spark.config import EngineConfig
from etl_spark.engine.apply import apply_batch
from etl_spark.gen.binlog import GenConfig, gen_base, gen_binlog, gen_schema_ops
from etl_spark.gen.oracle import replay_oracle
from etl_spark.pipeline import bootstrap, final_state
from tests.util import assert_frames_equal


def run_engine_batches(spark, tmp_path, cfg_gen: GenConfig, ops, base, binlog):
    cfg = EngineConfig(
        table_root=str(tmp_path / "tbl"),
        manifest_dir=str(tmp_path / "manifest"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_buckets=8,
    )
    bootstrap(spark, cfg, base)
    for batch_id, (_, seg) in enumerate(binlog.groupby("_seg")):
        seg = seg.drop(columns="_seg").copy()
        df = spark.createDataFrame(seg)
        df = df.withColumn("turn_idx", F.col("turn_idx").cast("int")).withColumn(
            "schema_version", F.col("schema_version").cast("int")
        )
        apply_batch(spark, cfg, ops, df, batch_id)
    return cfg


def test_replay_no_evolution(spark, tmp_path):
    g = GenConfig(n_convs=5, n_events=80, dup_rate=0.1, disorder_window=6, segment_size=25)
    base = gen_base(g)
    ops = gen_schema_ops(g)
    assert ops == []
    binlog = gen_binlog(g, base, ops)
    cfg = run_engine_batches(spark, tmp_path, g, ops, base, binlog)
    assert_frames_equal(final_state(spark, cfg), replay_oracle(base, binlog, ops))


def test_replay_with_schema_evolution(spark, tmp_path):
    g = GenConfig(
        n_convs=6,
        n_events=120,
        dup_rate=0.08,
        disorder_window=6,
        segment_size=30,
        schema_op_fracs=(0.25, 0.5, 0.75),
    )
    base = gen_base(g)
    ops = gen_schema_ops(g)
    assert len(ops) == 3
    binlog = gen_binlog(g, base, ops)
    cfg = run_engine_batches(spark, tmp_path, g, ops, base, binlog)
    engine = final_state(spark, cfg)
    oracle = replay_oracle(base, binlog, ops)
    # evolved schema shape: lang added, tool renamed, ts widened
    assert list(oracle.columns) == ["conv_id", "turn_idx", "role", "text", "tool_name", "ts", "lang"]
    assert pd.api.types.is_datetime64_any_dtype(oracle["ts"])
    assert_frames_equal(engine, oracle)


def test_replay_single_giant_batch(spark, tmp_path):
    """All events in one micro-batch: straddles every schema boundary."""
    g = GenConfig(
        n_convs=4, n_events=90, dup_rate=0.1, disorder_window=10,
        segment_size=90, schema_op_fracs=(0.3, 0.6, 0.9),
    )
    base = gen_base(g)
    ops = gen_schema_ops(g)
    binlog = gen_binlog(g, base, ops)
    cfg = run_engine_batches(spark, tmp_path, g, ops, base, binlog)
    assert_frames_equal(final_state(spark, cfg), replay_oracle(base, binlog, ops))


def test_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch retry semantics: re-applying a committed batch_id
    changes nothing."""
    g = GenConfig(n_convs=4, n_events=40, segment_size=40)
    base = gen_base(g)
    ops = gen_schema_ops(g)
    binlog = gen_binlog(g, base, ops)
    cfg = run_engine_batches(spark, tmp_path, g, ops, base, binlog)
    before = final_state(spark, cfg).toPandas()
    # re-apply batch 0
    seg = binlog[binlog["_seg"] == 0].drop(columns="_seg")
    df = spark.createDataFrame(seg).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    apply_batch(spark, cfg, ops, df, 0)
    after = final_state(spark, cfg).toPandas()
    pd.testing.assert_frame_equal(before, after)
