"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship CDC path — bootstrap + incremental
MERGE of the sf0.001 events changelog into a bucketed lake table —
and returns the final upserted state. `queries()` / `oracle_sql()`
delegate to etl_spark.contract: one entry per operator family from
SURVEY.md §2 plus the training-data-pipeline extension (dedup,
similarity search, text analysis, multimodal plumbing), each with an
exact DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark.contract import ORACLES, QUERIES, q_cdc_events_replay


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC replay of the sf0.001 events changelog through the
    REAL streaming engine — file-source micro-batches, checkpoint,
    foreachBatch, footer stats, max-LSN resolve, ledgered MERGE commits,
    pipelined lineage — returning the final table state
    (last-writer-wins per (user_id, event_type))."""
    return q_cdc_events_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # the transcripts-replay oracle reads the seeded generator's own
    # binlog from a fixed parquet path — make sure it exists before
    # DuckDB runs, regardless of whether the Spark query ran first
    from etl_spark.contract import transcripts_fixture

    transcripts_fixture()
    return dict(ORACLES)
