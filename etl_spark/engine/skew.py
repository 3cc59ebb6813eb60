"""Salted repartitioning for hot-key skew.

The reference has no parallelism to skew (1 Kafka partition per topic,
/root/reference/src/pipeline/core/kafka_admin.py:44). At 10^10 events,
Zipf-hot conversations would pin single shuffle partitions; salting
spreads one key across `salt` partitions for the stateless stages
(parse, normalize, per-partition lineage), and the salt never reaches
the MERGE join key — it is a transient repartition key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "_salt"


def salted_repartition(
    df: DataFrame, key_col: str, num_partitions: int, salt: int = 8
) -> DataFrame:
    """Hash-repartition on (key, salt) so one hot `key_col` value
    spreads over up to `salt` partitions. Drop the salt downstream
    with `drop_salt` before any keyed operation.

    The salt hashes the `lsn` column when present (unique per event —
    perfect spread at the cost of ONE int64 hash; hashing every
    non-key column would xxhash the full JSON payload string per event
    on the hot path just to derive a number in [0, salt)); frames
    without an lsn fall back to hashing the remaining columns."""
    if "lsn" in df.columns:
        basis = [F.col("lsn")]
    else:
        others = [c for c in df.columns if c != key_col]
        if not others:
            raise ValueError(
                "salted_repartition: need an lsn or at least one "
                "non-key column to derive the salt from"
            )
        basis = [F.col(c) for c in others]
    salted = df.withColumn(SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(salt)))
    return salted.repartition(num_partitions, F.col(key_col), F.col(SALT_COL))


def drop_salt(df: DataFrame) -> DataFrame:
    return df.drop(SALT_COL) if SALT_COL in df.columns else df
