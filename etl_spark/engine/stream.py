"""Structured Streaming binlog tail -> foreachBatch apply.

One streaming query replaces the reference's consumer threads + 30 s
poll loop + per-file batch jobs (/root/reference/src/pipeline/core/
kafka_multi_consumer.py:100-139, client_clickhouse.py:177-206): the
file source's own listing + offset log in the checkpoint is the
incremental scan the reference hand-rolled with a bucket listing and
`loaded_files` set-diff. In production the source line swaps to
`format("kafka")`; everything downstream is unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_spark.cdc_schema import TRANSCRIPTS, SchemaOp, SourceSpec
from etl_spark.config import EngineConfig
from etl_spark.engine.apply import apply_batch, drain_pending


def run_replay(
    spark: SparkSession,
    segments_dir: str,
    cfg: EngineConfig,
    ops: list[SchemaOp],
    available_now: bool = True,
    processing_time: str = "1 second",
    spec: SourceSpec = TRANSCRIPTS,
) -> None:
    """Tail the binlog segment directory and apply every micro-batch.
    `available_now=True` = bounded replay (drain all segments, then
    stop); False = continuous tail. Resumable: offsets live in the
    checkpoint, applied state in the lake manifest ledger."""
    stream = (
        spark.readStream.schema(spec.binlog_schema())
        .option("maxFilesPerTrigger", cfg.max_files_per_trigger)
        .parquet(segments_dir)
    )
    if cfg.use_watermark_dedup:
        # cross-batch duplicate suppression within the watermark horizon;
        # anything later than the horizon is still caught by the MERGE
        # LSN guard (idempotent upsert), so correctness never depends on
        # the watermark — only state size does.
        stream = stream.withWatermark("op_ts", cfg.watermark)
        stream = stream.dropDuplicatesWithinWatermark(list(spec.key) + ["lsn"])

    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_batch(spark, cfg, ops, df, bid, spec=spec)
    ).option("checkpointLocation", cfg.checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        drain_pending(cfg.table_root)  # join the last batch's lineage
    else:
        # continuous tail: caller owns the query; stop with
        # q.stop() then drain_pending(cfg.table_root)
        q = writer.trigger(processingTime=processing_time).start()
        return q
