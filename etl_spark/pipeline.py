"""End-to-end convenience wiring: bootstrap table, replay binlog,
read final state. Used by tests, bench.py and __spark_entry__.py."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.cdc_schema import BASE_FIELDS, BUCKET_BY, KEY, SchemaOp
from etl_spark.config import EngineConfig
from etl_spark.engine.stream import run_replay
from etl_spark.lake.table import LakeTable


def bootstrap(
    spark: SparkSession, cfg: EngineConfig, base: pd.DataFrame | None
) -> LakeTable:
    """Create the transcripts lake table and seed the base state."""
    table = LakeTable.create(
        spark,
        cfg.table_root,
        fields=BASE_FIELDS,
        key=KEY,
        bucket_by=BUCKET_BY,
        num_buckets=cfg.num_buckets,
        write_mode=cfg.write_mode,
    )
    if base is not None and len(base):
        sdf = spark.createDataFrame(base)
        sdf = sdf.withColumn("turn_idx", F.col("turn_idx").cast("int"))
        table.append_full(sdf, batch_key="bootstrap")
    return table


def replay(
    spark: SparkSession, cfg: EngineConfig, segments_dir: str, ops: list[SchemaOp]
) -> LakeTable:
    run_replay(spark, segments_dir, cfg, ops, available_now=True)
    return LakeTable(spark, cfg.table_root)


def final_state(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    table = LakeTable(spark, cfg.table_root)
    return table.read().orderBy(*KEY)
