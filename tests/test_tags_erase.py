"""Immutable snapshot tags (retention-pinned refs) and GDPR-style
erase (tombstoning predicate/key erase that survives late stale
events). Both are lake-level workflows the reference lacks entirely —
its serving table has no snapshot model at all
(/root/reference/src/pipeline/core/client_clickhouse.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_spark.config import EngineConfig
from etl_spark.gen.binlog import GenConfig, gen_base, gen_binlog, gen_schema_ops, write_segments
from etl_spark.gen.oracle import replay_oracle
from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import LakeTable
from etl_spark.pipeline import bootstrap, replay
from tests.util import assert_frames_equal


def _replayed_table(spark, tmp_path, **cfg_kw):
    g = GenConfig(
        n_convs=6, n_events=120, dup_rate=0.1, disorder_window=5,
        segment_size=30, schema_op_fracs=(0.25, 0.5, 0.75),
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
        **cfg_kw,
    )
    bootstrap(spark, cfg, base)
    replay(spark, cfg, seg_dir, ops)
    return g, base, ops, binlog, LakeTable(spark, cfg.table_root)


def test_tag_pins_snapshot_through_expiry(spark, tmp_path):
    g, base, ops, binlog, table = _replayed_table(spark, tmp_path)
    oracle = replay_oracle(base, binlog, ops)
    v = table.current_version()
    table.tag("train-v1")
    assert table.tags() == {"train-v1": v}
    # table keeps evolving past the tag
    table.add_column("extra", "string")
    table.erase_keys([oracle["conv_id"].iloc[0]], batch_key="erase:1")
    # aggressive retention: without the tag, v would be expired
    table.expire_snapshots(keep_last=1, vacuum=True)
    assert os.path.exists(table._manifest_path(v))
    # tag read is exactly the tagged snapshot (pre-erase, pre-add)
    assert_frames_equal(table.read(version="train-v1").orderBy("conv_id", "turn_idx"), oracle)
    # duplicate tag names are loud; drop then re-pin works
    with pytest.raises(FileExistsError):
        table.tag("train-v1")
    table.drop_tag("train-v1")
    table.tag("train-v1")  # now pins the current (post-erase) version
    assert table.tags()["train-v1"] == table.current_version()


def test_erase_keys_tombstones_and_blocks_resurrection(spark, tmp_path):
    g, base, ops, binlog, table = _replayed_table(spark, tmp_path)
    oracle = replay_oracle(base, binlog, ops)
    victim = oracle["conv_id"].iloc[0]
    n_victim = int((oracle["conv_id"] == victim).sum())
    assert n_victim > 0
    v0 = table.current_version()

    table.erase_keys([victim], batch_key="erase:gdpr-1")
    # live view: victim gone, everyone else intact
    left = table.read()
    assert left.filter(F.col("conv_id") == victim).count() == 0
    assert left.count() == len(oracle) - n_victim
    # tombstones retain key + _lsn but no payload (content erased)
    raw = table.read(include_system=True, buckets=None)
    dead = (
        table.read_raw()
        .filter((F.col("conv_id") == victim) & F.col("_deleted"))
        .select("conv_id", "turn_idx", "_lsn", "text")
        .collect()
    )
    assert len(dead) >= n_victim
    assert all(r["text"] is None and r["_lsn"] is not None for r in dead)
    # idempotent replay of the erase batch
    assert table.erase_keys([victim], batch_key="erase:gdpr-1") == table.current_version()
    # a LATE STALE event (lower LSN) cannot resurrect the erased turn
    m = table.manifest()
    stale = spark.createDataFrame(
        [(victim, 0, "user", "resurrected?", None, 1, "en", "U", 1)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool_name string, ts long, lang string, op string, lsn long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    merge_into(table, stale, batch_key="late-stale")
    assert table.read().filter(F.col("conv_id") == victim).count() == 0
    # history classifies the erase commit
    kinds = {r["version"]: r["kind"] for r in table.history().collect()}
    assert kinds[v0 + 1] == "erase"


def test_erase_where_predicate_and_feed_visibility(spark, tmp_path):
    g, base, ops, binlog, table = _replayed_table(spark, tmp_path)
    v0 = table.current_version()
    # erase every tool-role turn (content predicate, not key-based)
    n_match = table.read().filter(F.col("role") == "tool").count()
    if n_match == 0:
        pytest.skip("corpus drew no tool turns")
    table.erase_where(F.col("role") == "tool", batch_key="erase:tools")
    assert table.read().filter(F.col("role") == "tool").count() == 0
    # no-op predicate commits nothing
    v1 = table.current_version()
    assert table.erase_where(F.col("role") == "no-such-role") == v1
    # the change feed emits the erasures as deletes
    from etl_spark.lake.changes import read_changes

    feed = read_changes(table, from_version=v0, to_version=v1)
    deletes = feed.filter(F.col("_change_type") == "delete")
    assert deletes.count() == n_match


def test_erase_under_mor_resolves_then_tombstones(spark, tmp_path):
    g, base, ops, binlog, table = _replayed_table(
        spark, tmp_path, write_mode="mor"
    )
    oracle = replay_oracle(base, binlog, ops)
    victim = oracle["conv_id"].iloc[-1]
    n_victim = int((oracle["conv_id"] == victim).sum())
    table.erase_keys([victim], batch_key="erase:mor")
    left = table.read()
    assert left.filter(F.col("conv_id") == victim).count() == 0
    assert left.count() == len(oracle) - n_victim


def test_patch_on_erased_key_stays_dead_until_full_image(spark, tmp_path):
    """Erase/patch interaction: a partial image whose base was erased
    must NOT resurrect the key as a mostly-NULL row (its unset columns
    would coalesce from the nulled tombstone); only a later FULL image
    re-creates it. The tombstone's LSN is not advanced by the dropped
    patch, so the full image still applies."""
    g, base, ops, binlog, table = _replayed_table(spark, tmp_path, write_mode="cow")
    oracle = replay_oracle(base, binlog, ops)
    victim = oracle["conv_id"].iloc[0]
    vrow = oracle[oracle["conv_id"] == victim].iloc[0]
    turn = int(vrow["turn_idx"])
    table.erase_keys([victim], batch_key="erase:px")
    max_lsn = int(binlog["lsn"].max())

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool_name string, ts timestamp, lang string, op string, lsn long, "
        "_set_role boolean, _set_text boolean, _set_tool_name boolean, "
        "_set_ts boolean, _set_lang boolean"
    )
    patch = spark.createDataFrame(
        [(victim, turn, None, "patched-after-erase", None, None, None,
          "P", max_lsn + 1, False, True, False, False, False)],
        schema,
    )
    merge_into(table, patch, batch_key="patch-after-erase")
    assert table.read().filter(F.col("conv_id") == victim).count() == 0

    full = spark.createDataFrame(
        [(victim, turn, "user", "fresh full image", None, None, "en",
          "U", max_lsn + 2, True, True, True, True, True)],
        schema,
    )
    merge_into(table, full, batch_key="full-after-erase")
    rows = table.read().filter(
        (F.col("conv_id") == victim) & (F.col("turn_idx") == turn)
    ).collect()
    assert len(rows) == 1 and rows[0]["text"] == "fresh full image"
    assert rows[0]["role"] == "user"  # full image, not tombstone coalesce


def test_rollback_commit_stays_silent_in_feed(spark, tmp_path):
    """Regression: the erase-aware delete rule must not leak rollback
    commits into the change feed — rollback() documents feed silence
    (restored rows carry OLDER LSNs; downstream needs a resync, not a
    half-rollback of deletes)."""
    g, base, ops, binlog, table = _replayed_table(spark, tmp_path)
    v_head = table.current_version()
    # find a pre-head version that differs in live keys (mid-replay)
    v_mid = max(1, v_head - 2)
    table.rollback(v_mid)
    from etl_spark.lake.changes import read_changes

    feed = read_changes(table, from_version=v_head, to_version=table.current_version())
    assert feed.count() == 0
