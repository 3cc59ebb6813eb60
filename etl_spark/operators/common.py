"""Shared operator plumbing.

`spread`: ensure a DataFrame has at least the session's default
parallelism before an expensive narrow stage (explode/shingle/UDF
decode). A scan of FEW parquet files yields that few partitions, and
every narrow transform downstream inherits them — at the extreme, one
input file serializes the whole operator onto one core (measured:
the sf0.1 documents table is a single file, so shingling 260k grams
ran 7.3 s single-threaded vs ~0.5 s spread over 32). The repartition
shuffles only the small source rows (ids + raw text), far cheaper
than single-threading the expansion.

At real corpus scale the input has thousands of files and `spread` is
a no-op — the partition-count probe costs one physical-plan
resolution, no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition `df` up to the session default parallelism (or
    `min_partitions`) if its plan currently yields fewer partitions;
    pass through untouched otherwise."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
