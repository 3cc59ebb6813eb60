"""Streaming replay: checkpoint resume, exactly-once, lineage invariants."""

from __future__ import annotations

import os
import shutil

import pandas as pd

from etl_spark.config import EngineConfig
from etl_spark.engine import lineage
from etl_spark.gen.binlog import GenConfig, gen_base, gen_binlog, gen_schema_ops, write_segments
from etl_spark.gen.oracle import replay_oracle
from etl_spark.pipeline import bootstrap, final_state, replay
from tests.util import assert_frames_equal


def make_cfg(tmp_path, **kw) -> EngineConfig:
    return EngineConfig(
        table_root=str(tmp_path / "tbl"),
        manifest_dir=str(tmp_path / "manifest"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_buckets=8,
        max_files_per_trigger=1,
        **kw,
    )


def gen_all(tmp_path, **kw):
    g = GenConfig(
        n_convs=6, n_events=150, dup_rate=0.1, disorder_window=5,
        segment_size=30, schema_op_fracs=(0.2, 0.5, 0.8), **kw,
    )
    base = gen_base(g)
    ops = gen_schema_ops(g)
    binlog = gen_binlog(g, base, ops)
    seg_dir = str(tmp_path / "segments")
    paths = write_segments(binlog, seg_dir)
    return g, base, ops, binlog, seg_dir, paths


def test_streaming_replay_matches_oracle(spark, tmp_path):
    _, base, ops, binlog, seg_dir, _ = gen_all(tmp_path)
    cfg = make_cfg(tmp_path)
    bootstrap(spark, cfg, base)
    replay(spark, cfg, seg_dir, ops)
    assert_frames_equal(final_state(spark, cfg), replay_oracle(base, binlog, ops))
    inv = lineage.check_invariants(spark, cfg.manifest_dir)
    assert inv["events_distinct_total"] == 150
    assert inv["max_lsn"] == 150


def test_kill_and_resume_from_checkpoint(spark, tmp_path):
    """Replay half the log, 'crash', resume with the full log from the
    same checkpoint: final state identical, lineage covers the log
    exactly once (no gaps/overlaps across the restart)."""
    _, base, ops, binlog, seg_dir, paths = gen_all(tmp_path)
    staged = str(tmp_path / "staged_segments")
    os.makedirs(staged)
    for p in paths[: len(paths) // 2]:
        shutil.copy(p, staged)
    cfg = make_cfg(tmp_path)
    bootstrap(spark, cfg, base)
    replay(spark, cfg, staged, ops)  # first run drains available segments
    mid_rows = final_state(spark, cfg).count()
    for p in paths[len(paths) // 2 :]:
        shutil.copy(p, staged)
    replay(spark, cfg, staged, ops)  # resume: same checkpoint dir
    assert_frames_equal(final_state(spark, cfg), replay_oracle(base, binlog, ops))
    inv = lineage.check_invariants(spark, cfg.manifest_dir)
    assert inv["events_distinct_total"] == 150
    assert mid_rows > 0


def test_restart_with_no_new_data_is_noop(spark, tmp_path):
    _, base, ops, binlog, seg_dir, _ = gen_all(tmp_path)
    cfg = make_cfg(tmp_path)
    bootstrap(spark, cfg, base)
    replay(spark, cfg, seg_dir, ops)
    before = final_state(spark, cfg).toPandas()
    v_before = __import__("etl_spark.lake.table", fromlist=["LakeTable"]).LakeTable(
        spark, cfg.table_root
    ).current_version()
    replay(spark, cfg, seg_dir, ops)
    after = final_state(spark, cfg).toPandas()
    pd.testing.assert_frame_equal(before, after)
    v_after = __import__("etl_spark.lake.table", fromlist=["LakeTable"]).LakeTable(
        spark, cfg.table_root
    ).current_version()
    assert v_after == v_before
