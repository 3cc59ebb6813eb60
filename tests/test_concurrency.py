"""Optimistic concurrency for out-of-band maintenance racing the
stream's merges: the O_EXCL manifest create alone only catches the
final instant; `expected_version`/`CommitConflict` closes the WIDE
window where a competing commit lands during an expensive bucket
rewrite and a stale commit would silently drop the winner's rows
(Iceberg commit-conflict analog). The reference has no concurrency
story at all — its registry insert races its JDBC append
(/root/reference/src/pipeline/core/client_clickhouse.py:197-203)."""

from __future__ import annotations

from unittest import mock

import pytest
from pyspark.sql import functions as F

from etl_spark.config import EngineConfig
from etl_spark.gen.binlog import GenConfig, gen_base, gen_binlog, write_segments
from etl_spark.gen.oracle import replay_oracle
from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import CommitConflict, LakeTable
from etl_spark.pipeline import bootstrap, final_state, replay


def _table(spark, tmp_path, **cfg_kw):
    g = GenConfig(
        n_convs=6, n_events=120, dup_rate=0.05, disorder_window=4,
        segment_size=30, p_insert=0.3, p_update=0.3, p_delete=0.4,
    )
    base = gen_base(g)
    binlog = gen_binlog(g, base, [])
    seg_dir = str(tmp_path / "segments")
    write_segments(binlog, seg_dir)
    cfg = EngineConfig(
        table_root=str(tmp_path / "tbl"), manifest_dir=str(tmp_path / "m"),
        checkpoint_dir=str(tmp_path / "c"), num_buckets=4,
        max_files_per_trigger=2, **cfg_kw,
    )
    bootstrap(spark, cfg, base)
    replay(spark, cfg, seg_dir, ops=[])
    return g, base, binlog, cfg, LakeTable(spark, cfg.table_root)


def _racing_merge(spark, table, conv_id, lsn):
    """A competing single-row merge commit (the live stream winning a
    race), injectable mid-rewrite."""
    src = spark.createDataFrame(
        [(conv_id, 0, "user", f"winner-{lsn}", None, 1, "U", lsn)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts long, op string, lsn long",
    )
    merge_into(table, src, batch_key=f"race:{lsn}")


def _inject_between_stage_and_commit(table, inject):
    """Patch _stage_dataframe so `inject` runs AFTER the rewrite is
    staged but BEFORE the manifest commit — the widest race window."""
    real = LakeTable._stage_dataframe
    state = {"fired": False}

    def wrapper(self, df, m, version, **kwargs):
        out = real(self, df, m, version, **kwargs)
        if not state["fired"]:
            state["fired"] = True
            inject()
        return out

    return mock.patch.object(LakeTable, "_stage_dataframe", wrapper)


def test_compact_loses_race_gracefully(spark, tmp_path):
    """An out-of-band compaction that loses the manifest race to a
    live merge skips the cycle (no exception, no lost update) — the
    contract jobs/compact.py documents."""
    g, base, binlog, cfg, table = _table(spark, tmp_path)
    oracle = replay_oracle(base, binlog, [])
    conv = oracle["conv_id"].iloc[0]
    max_lsn = int(binlog["lsn"].max())
    racer = LakeTable(spark, cfg.table_root)

    with _inject_between_stage_and_commit(
        table, lambda: _racing_merge(spark, racer, conv, max_lsn + 1)
    ):
        v = table.compact(max_files_per_bucket=1)
    # compaction skipped; the racing merge's row survives
    row = table.read().filter(
        (F.col("conv_id") == conv) & (F.col("turn_idx") == 0)
    ).collect()
    assert len(row) == 1 and row[0]["text"] == f"winner-{max_lsn + 1}"
    # a lost race returns the PLANNED-FROM version (same convention as
    # the no-op paths) so callers' "did I compact" = version-advance
    # inference can't count the racing writer's commit as ours; the
    # racer's merge is the only commit that landed
    assert v == table.current_version() - 1
    # the next (unraced) cycle compacts normally
    v2 = table.compact(max_files_per_bucket=1)
    assert v2 > v
    row = table.read().filter(
        (F.col("conv_id") == conv) & (F.col("turn_idx") == 0)
    ).collect()
    assert row[0]["text"] == f"winner-{max_lsn + 1}"


def test_erase_retries_and_lands_after_race(spark, tmp_path):
    """An erase racing a live merge must LAND (GDPR): it retries from
    the fresh snapshot, preserving the winner's rows in other keys."""
    g, base, binlog, cfg, table = _table(spark, tmp_path)
    oracle = replay_oracle(base, binlog, [])
    victim = oracle["conv_id"].iloc[0]
    other = oracle["conv_id"].iloc[-1]
    assert victim != other
    max_lsn = int(binlog["lsn"].max())
    racer = LakeTable(spark, cfg.table_root)

    with _inject_between_stage_and_commit(
        table, lambda: _racing_merge(spark, racer, other, max_lsn + 1)
    ):
        table.erase_keys([victim], batch_key="erase:raced")
    # the erase landed AND the racing merge's row survived
    assert table.read().filter(F.col("conv_id") == victim).count() == 0
    row = table.read().filter(
        (F.col("conv_id") == other) & (F.col("turn_idx") == 0)
    ).collect()
    assert len(row) == 1 and row[0]["text"] == f"winner-{max_lsn + 1}"


def test_merge_conflicts_when_erase_wins_race(spark, tmp_path):
    """A CoW merge whose target scan predates a winning erase must
    NOT commit (it would resurrect pre-erase rows it carried over):
    CommitConflict propagates so the streaming engine replays the
    batch against the fresh snapshot."""
    g, base, binlog, cfg, table = _table(spark, tmp_path, write_mode="cow")
    oracle = replay_oracle(base, binlog, [])
    victim = oracle["conv_id"].iloc[0]
    other = oracle["conv_id"].iloc[-1]
    max_lsn = int(binlog["lsn"].max())

    eraser = LakeTable(spark, cfg.table_root)
    with _inject_between_stage_and_commit(
        table, lambda: eraser.erase_keys([victim], batch_key="erase:winner")
    ):
        with pytest.raises(CommitConflict):
            _racing_merge(spark, table, other, max_lsn + 1)
    # the erase held; replaying the merge against the fresh snapshot works
    assert table.read().filter(F.col("conv_id") == victim).count() == 0
    _racing_merge(spark, table, other, max_lsn + 1)
    assert table.read().filter(F.col("conv_id") == victim).count() == 0
    row = table.read().filter(
        (F.col("conv_id") == other) & (F.col("turn_idx") == 0)
    ).collect()
    assert len(row) == 1 and row[0]["text"] == f"winner-{max_lsn + 1}"


def test_merge_rebases_over_maintenance_race(spark, tmp_path):
    """A merge racing a COMPACTION (maintenance-only winner) proceeds:
    the rewrite is logically valid against the reorganized files, so
    the stream never fails a batch just because maintenance ran."""
    g, base, binlog, cfg, table = _table(spark, tmp_path, write_mode="cow")
    oracle = replay_oracle(base, binlog, [])
    other = oracle["conv_id"].iloc[-1]
    max_lsn = int(binlog["lsn"].max())

    compactor = LakeTable(spark, cfg.table_root)
    fired = {"done": False}

    def compact_once():
        if not fired["done"]:
            fired["done"] = True
            compactor.compact(max_files_per_bucket=1)

    with _inject_between_stage_and_commit(table, compact_once):
        _racing_merge(spark, table, other, max_lsn + 1)  # must NOT raise
    row = table.read().filter(
        (F.col("conv_id") == other) & (F.col("turn_idx") == 0)
    ).collect()
    assert len(row) == 1 and row[0]["text"] == f"winner-{max_lsn + 1}"
    assert_equalish = final_state(spark, cfg).count()
    assert assert_equalish == table.read().count()


def test_erase_rebased_over_maintenance_keeps_feed_visibility(spark, tmp_path):
    """Version-stamped props must be stamped with the version the
    commit ACTUALLY lands at: an erase that rebases over a winning
    compaction still needs `erase_commit == version`, or the change
    feed's erase waiver misses it and downstream silently retains
    GDPR-erased rows."""
    from etl_spark.lake.changes import read_changes

    g, base, binlog, cfg, table = _table(spark, tmp_path)
    oracle = replay_oracle(base, binlog, [])
    victim = oracle["conv_id"].iloc[0]
    n_victim = int((oracle["conv_id"] == victim).sum())
    compactor = LakeTable(spark, cfg.table_root)
    v0 = table.current_version()

    with _inject_between_stage_and_commit(
        table, lambda: compactor.compact(max_files_per_bucket=1)
    ):
        table.erase_keys([victim], batch_key="erase:rebased")
    v1 = table.current_version()
    assert table.read().filter(F.col("conv_id") == victim).count() == 0
    m = table.manifest()
    assert m.props.get("erase_commit") == v1, "stamp must match landed version"
    deletes = read_changes(table, from_version=v0, to_version=v1).filter(
        F.col("_change_type") == "delete"
    )
    assert deletes.count() == n_victim


def test_merge_conflicts_when_rebucket_wins(spark, tmp_path):
    """Rebucket carries the maintenance marker but CHANGES the bucket
    layout: a stale rewrite must NOT rebase over it (its staged files
    carry old hash-mod bucket ids), regardless of the marker."""
    g, base, binlog, cfg, table = _table(spark, tmp_path, write_mode="cow")
    oracle = replay_oracle(base, binlog, [])
    other = oracle["conv_id"].iloc[-1]
    max_lsn = int(binlog["lsn"].max())
    rebucketer = LakeTable(spark, cfg.table_root)
    fired = {"done": False}

    def rebucket_once():
        if not fired["done"]:
            fired["done"] = True
            rebucketer.rebucket(8)

    with _inject_between_stage_and_commit(table, rebucket_once):
        with pytest.raises(CommitConflict):
            _racing_merge(spark, table, other, max_lsn + 1)
    # replay against the new layout succeeds and state is consistent
    _racing_merge(spark, table, other, max_lsn + 1)
    row = table.read().filter(
        (F.col("conv_id") == other) & (F.col("turn_idx") == 0)
    ).collect()
    assert len(row) == 1 and row[0]["text"] == f"winner-{max_lsn + 1}"


def test_mor_append_rebases_over_compaction(spark, tmp_path):
    """The MoR merge path (pure delta append) must survive losing the
    manifest race to a compaction — rebased onto the fresh file list,
    never a failed stream batch (appends cannot lose updates)."""
    g, base, binlog, cfg, table = _table(spark, tmp_path)  # mor default
    oracle = replay_oracle(base, binlog, [])
    other = oracle["conv_id"].iloc[-1]
    max_lsn = int(binlog["lsn"].max())
    compactor = LakeTable(spark, cfg.table_root)
    fired = {"done": False}

    def compact_once():
        if not fired["done"]:
            fired["done"] = True
            compactor.compact(max_files_per_bucket=1)

    with _inject_between_stage_and_commit(table, compact_once):
        _racing_merge(spark, table, other, max_lsn + 1)  # must NOT raise
    row = table.read().filter(
        (F.col("conv_id") == other) & (F.col("turn_idx") == 0)
    ).collect()
    assert len(row) == 1 and row[0]["text"] == f"winner-{max_lsn + 1}"
    # total state equals oracle with the winner row updated
    assert table.read().count() == len(oracle) + (
        0 if ((oracle["conv_id"] == other) & (oracle["turn_idx"] == 0)).any() else 1
    )
