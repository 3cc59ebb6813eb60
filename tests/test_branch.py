"""Write-audit-publish branches (Iceberg branching / WAP analog):
CDC micro-batches commit onto `_meta/branches/<name>/` while main
readers see the pre-fork table; audit runs against the branch state;
publish fast-forwards main by moving manifests (metadata-only). The
reference writes straight into the serving table with no staging
isolation (/root/reference/src/pipeline/core/client_clickhouse.py:
154-206)."""

from __future__ import annotations

import os

import pytest

from etl_spark.config import EngineConfig
from etl_spark.engine import lineage
from etl_spark.gen.binlog import GenConfig, gen_base, gen_binlog, gen_schema_ops, write_segments
from etl_spark.gen.oracle import replay_oracle
from etl_spark.lake.table import LakeTable
from etl_spark.pipeline import bootstrap, final_state, replay
from tests.util import assert_frames_equal


def _setup(tmp_path, **gen_kw):
    g = GenConfig(
        n_convs=6, n_events=120, dup_rate=0.1, disorder_window=5,
        segment_size=30, schema_op_fracs=(0.25, 0.5, 0.75), **gen_kw,
    )
    base = gen_base(g)
    ops = gen_schema_ops(g)
    binlog = gen_binlog(g, base, ops)
    seg_dir = str(tmp_path / "segments")
    write_segments(binlog, seg_dir)
    cfg = EngineConfig(
        table_root=str(tmp_path / "tbl"),
        manifest_dir=str(tmp_path / "manifest"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_buckets=8,
        max_files_per_trigger=1,
        branch="audit",
    )
    return g, base, ops, binlog, seg_dir, cfg


def test_wap_flow_engine_replay(spark, tmp_path):
    """The full WAP loop through the REAL streaming path: replay onto
    the branch; main stays at the fork (version AND rows); audit the
    branch (lineage invariants + oracle equality); publish; main is
    fast-forwarded to the identical state, and a re-run of the replay
    against the published main is a ledger no-op."""
    g, base, ops, binlog, seg_dir, cfg = _setup(tmp_path)
    main = bootstrap(spark, cfg, base)
    fork_version = main.current_version()
    main_rows_before = main.read().count()
    main.create_branch("audit")

    replay(spark, cfg, seg_dir, ops)  # commits land on the branch

    # main untouched while the branch accumulated the whole replay
    main = LakeTable(spark, cfg.table_root)
    assert main.current_version() == fork_version
    assert main.read().count() == main_rows_before
    assert "lang" not in main.manifest().schema.names()  # evolution stayed on the branch

    # audit the branch state
    branch = LakeTable(spark, cfg.table_root, branch="audit")
    oracle = replay_oracle(base, binlog, ops)
    assert_frames_equal(branch.read().orderBy("conv_id", "turn_idx"), oracle)
    inv = lineage.check_invariants(spark, cfg.manifest_dir)
    assert inv["events_distinct_total"] == g.n_events

    # publish: metadata-only fast-forward
    new_head = main.publish_branch("audit")
    assert new_head > fork_version
    assert main.branches() == []
    assert_frames_equal(final_state(spark, cfg.__class__(**{**cfg.__dict__, "branch": None})), oracle)
    # the ledger moved with the manifests: replaying the same
    # checkpointed stream against published main is a no-op
    cfg_main = cfg.__class__(**{**cfg.__dict__, "branch": None})
    replay(spark, cfg_main, seg_dir, ops)
    assert LakeTable(spark, cfg.table_root).current_version() == new_head
    assert_frames_equal(final_state(spark, cfg_main), oracle)


def test_drop_branch_reclaims_files_main_untouched(spark, tmp_path):
    g, base, ops, binlog, seg_dir, cfg = _setup(tmp_path)
    main = bootstrap(spark, cfg, base)
    before = main.read().toPandas()
    fork_version = main.current_version()
    main.create_branch("audit")
    replay(spark, cfg, seg_dir, ops)

    branch = LakeTable(spark, cfg.table_root, branch="audit")
    branch_files = {
        f.path
        for v in branch._branch_versions("audit")
        if v > fork_version
        for f in branch.manifest(v).files
    }
    main_files = {f.path for f in main.manifest(fork_version).files}
    new_files = branch_files - main_files
    assert new_files, "branch must have staged new data files"

    stats = main.drop_branch("audit")
    assert stats["files_removed"] >= len(new_files)
    for rel in new_files:
        assert not os.path.exists(os.path.join(cfg.table_root, rel))
    # main bit-identical
    assert main.current_version() == fork_version
    after = main.read().toPandas()
    assert before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_publish_conflict_when_main_advances(spark, tmp_path):
    g, base, ops, binlog, seg_dir, cfg = _setup(tmp_path)
    main = bootstrap(spark, cfg, base)
    main.create_branch("audit")
    replay(spark, cfg, seg_dir, ops)
    # a foreign commit on main after the fork (WAP contract violation)
    main.add_column("rogue", "string")
    with pytest.raises(ValueError, match="publish conflict"):
        main.publish_branch("audit")
    # the branch is still intact for inspection / drop
    assert main.branches() == ["audit"]


def test_publish_resumes_after_partial_move(spark, tmp_path):
    """Crash-in-the-middle-of-publish: some manifests already moved to
    main. Re-running publish_branch must resume, not conflict."""
    g, base, ops, binlog, seg_dir, cfg = _setup(tmp_path)
    main = bootstrap(spark, cfg, base)
    fork = main.current_version()
    main.create_branch("audit")
    replay(spark, cfg, seg_dir, ops)
    branch = LakeTable(spark, cfg.table_root, branch="audit")
    pending = [v for v in branch._branch_versions("audit") if v > fork]
    assert len(pending) >= 2
    # simulate the crash: move only the first post-fork manifest
    bdir = os.path.join(cfg.table_root, "_meta", "branches", "audit")
    first = pending[0]
    os.rename(
        os.path.join(bdir, f"v{first:010d}.json"),
        os.path.join(cfg.table_root, "_meta", f"v{first:010d}.json"),
    )
    head = main.publish_branch("audit")
    assert head == pending[-1]
    assert_frames_equal(
        LakeTable(spark, cfg.table_root).read().orderBy("conv_id", "turn_idx"),
        replay_oracle(base, binlog, ops),
    )


def test_vacuum_on_main_spares_live_branch(spark, tmp_path):
    """expire_snapshots+vacuum on main must treat branch-referenced
    files as live: the branch stays fully readable afterwards."""
    g, base, ops, binlog, seg_dir, cfg = _setup(tmp_path)
    main = bootstrap(spark, cfg, base)
    main.create_branch("audit")
    replay(spark, cfg, seg_dir, ops)
    main.expire_snapshots(keep_last=1, vacuum=True)
    branch = LakeTable(spark, cfg.table_root, branch="audit")
    assert_frames_equal(
        branch.read().orderBy("conv_id", "turn_idx"),
        replay_oracle(base, binlog, ops),
    )
    # and a branch view refuses to run retention itself
    with pytest.raises(ValueError, match="main view"):
        branch.expire_snapshots(keep_last=1)
