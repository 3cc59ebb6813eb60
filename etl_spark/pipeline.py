"""End-to-end convenience wiring: bootstrap table, replay binlog,
read final state. Used by tests, bench.py and __spark_entry__.py."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.cdc_schema import TRANSCRIPTS, SchemaOp, SourceSpec
from etl_spark.config import EngineConfig
from etl_spark.engine.stream import run_replay
from etl_spark.lake.table import LakeTable


def bootstrap(
    spark: SparkSession,
    cfg: EngineConfig,
    base: pd.DataFrame | None,
    spec: SourceSpec = TRANSCRIPTS,
) -> LakeTable:
    """Create the entity's lake table and seed the base state."""
    table = LakeTable.create(
        spark,
        cfg.table_root,
        fields=list(spec.base_fields),
        key=list(spec.key),
        bucket_by=spec.bucket_by,
        num_buckets=cfg.num_buckets,
        write_mode=cfg.write_mode,
    )
    if base is not None and len(base):
        sdf = spark.createDataFrame(base)
        if "turn_idx" in sdf.columns:
            sdf = sdf.withColumn("turn_idx", F.col("turn_idx").cast("int"))
        table.append_full(sdf, batch_key="bootstrap")
    return table


def replay(
    spark: SparkSession,
    cfg: EngineConfig,
    segments_dir: str,
    ops: list[SchemaOp],
    spec: SourceSpec = TRANSCRIPTS,
) -> LakeTable:
    run_replay(spark, segments_dir, cfg, ops, available_now=True, spec=spec)
    return LakeTable(spark, cfg.table_root)


def final_state(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    table = LakeTable(spark, cfg.table_root)
    return table.read().orderBy(*table.manifest().key)
