"""Streaming tumbling-window metrics with a watermark (§2.8 'windows'
cell): append-mode finalized windows match a batch recomputation, the
open tail window is withheld until it can finalize, and a
below-watermark late event is dropped from the aggregation (metrics
tolerate bounded loss; the exact path for late data is the lineage
ledger)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_spark.engine.stream import streaming_window_metrics
from etl_spark.gen.binlog import GenConfig, gen_base, gen_binlog, write_segments


def _run_stream(spark, seg_dir, name, window, watermark, mft=1):
    from etl_spark.cdc_schema import TRANSCRIPTS

    stream = (
        spark.readStream.schema(TRANSCRIPTS.binlog_schema())
        .option("maxFilesPerTrigger", mft)
        .parquet(seg_dir)
    )
    out = streaming_window_metrics(stream, window=window, watermark=watermark)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_finalized_windows_match_batch(spark, tmp_path):
    g = GenConfig(n_convs=5, n_events=150, dup_rate=0.0, disorder_window=1, segment_size=30)
    base = gen_base(g)
    binlog = gen_binlog(g, base, [])
    seg_dir = str(tmp_path / "segments")
    write_segments(binlog, seg_dir)

    got = _run_stream(spark, seg_dir, "wm1", "1 minute", "10 seconds").toPandas()

    # batch recomputation over the same segments, restricted to the
    # windows the final watermark (max op_ts - 10 s) can finalize
    ev = spark.read.parquet(seg_dir)
    max_ts = ev.agg(F.max("op_ts")).collect()[0][0]
    exp = (
        ev.groupBy(F.window("op_ts", "1 minute").alias("w"), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op", "n_events", "min_lsn", "max_lsn",
        )
        .filter(F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 10 SECONDS"))
        .toPandas()
    )
    assert len(exp) > 0, "need at least one finalizable window"
    key = ["window_start", "op"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)
    # the open tail window is withheld (append emits only finalized)
    open_windows = got[got["window_end"] > max_ts - pd.Timedelta(seconds=10)]
    assert len(open_windows) == 0


def test_below_watermark_late_event_dropped(spark, tmp_path):
    """A late event arriving TWO micro-batches after its window is
    dropped by the watermark filter (Spark filters late records with
    the PREVIOUS batch's watermark and evicts state with the current
    one — SPARK-40925 two-watermark semantics — so the drop becomes
    observable one batch after the window's eviction). Append mode
    must not re-emit or mutate the closed window; the late event is
    lost to metrics by design, while the MERGE path — which has no
    watermark dependence — would still apply it exactly once."""
    g = GenConfig(n_convs=4, n_events=120, dup_rate=0.0, disorder_window=1, segment_size=40)
    base = gen_base(g)
    binlog = gen_binlog(g, base, [])
    # op_ts = BASE + row index seconds; push one event of segment 2
    # back to the very first second. Batch 0 (ts 0..39) sets the
    # watermark to 34 s; batch 1 evicts+emits [0,10); batch 2's late
    # filter (watermark 34 s) then drops the time traveler.
    late_pos = binlog.index[binlog["_seg"] == 2][5]
    binlog.loc[late_pos, "op_ts"] = binlog["op_ts"].min()
    seg_dir = str(tmp_path / "segments")
    write_segments(binlog, seg_dir)

    got = _run_stream(spark, seg_dir, "wm2", "10 seconds", "5 seconds").toPandas()
    late_lsn = int(binlog.loc[late_pos, "lsn"])
    first_window = got[got["window_start"] == got["window_start"].min()]
    # [0,10) was computed from segment 0 alone: exactly its own 10
    # events, never the late LSN from segment 2
    assert int(first_window["n_events"].sum()) == 10
    assert late_lsn not in set(
        int(x) for x in first_window["max_lsn"].tolist()
    )
    # no duplicate emission of any (window, op) group
    assert not got.duplicated(subset=["window_start", "op"]).any()
