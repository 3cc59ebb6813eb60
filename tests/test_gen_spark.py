"""Spark-distributed binlog generator (gen/binlog_spark.py): the
corpus is a pure function of (seed, GenConfig) — independent of task
decomposition — and obeys the same FIXTURES.md §2 semantics as the
driver generator: I/U/D/P legality per key, duplicate re-emits
identical and later within their segment, bounded in-segment
disorder, schema evolution by LSN. The engine's streaming replay of a
Spark-generated corpus must match the sequential oracle exactly."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd

from etl_spark.config import EngineConfig
from etl_spark.engine import lineage
from etl_spark.gen.binlog import GenConfig, gen_base, gen_schema_ops
from etl_spark.gen.binlog_spark import gen_binlog_spark
from etl_spark.gen.oracle import replay_oracle
from etl_spark.pipeline import bootstrap, final_state, replay
from tests.util import assert_frames_equal

CFG = dict(
    seed=11,
    n_convs=40,
    max_turns=5,
    n_events=2000,
    segment_size=250,
    dup_rate=0.08,
    disorder_window=6,
    patch_rate=0.2,
    zipf_alpha=1.3,
    schema_op_fracs=(0.2, 0.5, 0.8),
)


def _read_segments(seg_dir: str) -> pd.DataFrame:
    frames = [
        pd.read_parquet(p).assign(_seg=i)
        for i, p in enumerate(sorted(glob.glob(os.path.join(seg_dir, "*.parquet"))))
    ]
    return pd.concat(frames, ignore_index=True)


def test_decomposition_invariant_and_semantics(spark, tmp_path):
    g = GenConfig(**CFG)
    base, ops = gen_base(g), gen_schema_ops(g)
    a = tmp_path / "a"
    b = tmp_path / "b"
    gen_binlog_spark(spark, g, base, ops, str(a), group_buckets=3)
    gen_binlog_spark(spark, g, base, ops, str(b), group_buckets=17)
    da, db = _read_segments(str(a)), _read_segments(str(b))
    # bit-identical at every decomposition (the "two cluster sizes"
    # axis for the generator itself)
    pd.testing.assert_frame_equal(da, db)

    n = g.n_events
    assert set(da["lsn"]) == set(range(1, n + 1))
    # dups: same (lsn) rows are byte-identical and the re-emit comes
    # later within the same segment
    dup = da[da.duplicated(subset=["lsn"], keep=False)]
    assert len(dup) > 0
    for lsn, grp in dup.groupby("lsn"):
        assert grp["_seg"].nunique() == 1
        assert grp["op"].nunique() == 1
        assert grp["turn_idx"].nunique() == 1
        assert grp["payload"].astype(str).nunique() == 1
    # segments partition the LSN space (disorder stays in-segment)
    bounds = da.groupby("_seg")["lsn"].agg(["min", "max"]).sort_index()
    for i in range(len(bounds) - 1):
        assert bounds["max"].iloc[i] < bounds["min"].iloc[i + 1] + g.segment_size

    # I/U/D/P legality per (conv, turn) in LSN order: U/P/D only on
    # live keys, I only on dead/new keys
    live = {
        (r["conv_id"], int(r["turn_idx"])) for _, r in base.iterrows()
    }
    seq = da.drop_duplicates(subset=["lsn"]).sort_values("lsn")
    for _, r in seq.iterrows():
        key = (r["conv_id"], int(r["turn_idx"]))
        if r["op"] == "I":
            assert key not in live, key
            live.add(key)
        elif r["op"] in ("U", "P"):
            assert key in live, key
        else:
            assert key in live, key
            live.discard(key)
    # patches: payload carries a non-empty _changed subset
    patches = seq[seq["op"] == "P"]
    assert len(patches) > 0
    for _, r in patches.iterrows():
        d = json.loads(r["payload"])
        assert d["_changed"] and set(d["_changed"]) <= set(d.keys())


def test_engine_replay_of_spark_corpus_matches_oracle(spark, tmp_path):
    g = GenConfig(**CFG)
    base, ops = gen_base(g), gen_schema_ops(g)
    seg_dir = tmp_path / "segments"
    gen_binlog_spark(spark, g, base, ops, str(seg_dir))
    binlog = _read_segments(str(seg_dir))
    cfg = EngineConfig(
        table_root=str(tmp_path / "tbl"),
        manifest_dir=str(tmp_path / "manifest"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_buckets=8,
        max_files_per_trigger=2,
        patch_ops=True,
        write_mode="cow",
    )
    bootstrap(spark, cfg, base)
    replay(spark, cfg, str(seg_dir), ops)
    assert_frames_equal(
        final_state(spark, cfg),
        replay_oracle(base, binlog.drop(columns=["_seg"]), ops),
    )
    inv = lineage.check_invariants(spark, cfg.manifest_dir)
    assert inv["events_distinct_total"] == g.n_events
    assert inv["overlapping_batches"] == []


def test_routes_tag(spark, tmp_path):
    g = GenConfig(**{**CFG, "n_events": 400, "segment_size": 100})
    base, ops = gen_base(g), gen_schema_ops(g)
    seg_dir = tmp_path / "routed"
    gen_binlog_spark(spark, g, base, ops, str(seg_dir), routes=3)
    df = _read_segments(str(seg_dir))
    expect = "e" + (df["conv_id"].str[5:].astype(int) % 3).astype(str)
    assert (df["entity"] == expect).all()
