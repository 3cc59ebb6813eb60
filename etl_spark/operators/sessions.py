"""Sessionization — gap-based session assignment over an event stream.

Two forms with identical semantics:
- `sessionize` (here): the batch/window-function form — a lag-gap
  indicator cumulatively summed per key. One shuffle on the key; the
  window never materializes the pair space. SQL-expressible, so the
  driver contract checks it hash-exact against DuckDB.
- `engine.sessions.streaming_sessionize`: the streaming form of the
  same semantics as a custom stateful operator
  (`applyInPandasWithState` — Arrow-batched per-group state), golden-
  tested against this batch form.

The reference has no sessionization; this is training-pipeline
surface (conversation/agent-trace segmentation before packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    order_col: str,
    ts_col: str,
    gap_seconds: int = 60,
) -> DataFrame:
    """Assign a 0-based session index per key: a new session starts
    when the gap to the previous event (ordered by `order_col`)
    exceeds `gap_seconds`. Returns the input keys + order + session_idx.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap > gap_seconds, 1).otherwise(0)
    return df.select(
        F.col(key_col),
        F.col(order_col),
        F.sum(new_sess).over(w).cast("int").alias("session_idx"),
    )


def session_summaries(
    df: DataFrame,
    key_col: str,
    order_col: str,
    ts_col: str,
    gap_seconds: int = 60,
) -> DataFrame:
    """One row per (key, session): event count and LSN/ts bounds."""
    s = sessionize(df, key_col, order_col, ts_col, gap_seconds)
    joined = df.join(s, [key_col, order_col])
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    return joined.groupBy(key_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(order_col).alias("first_id"),
        F.max(order_col).alias("last_id"),
        F.min(epoch).alias("start_s"),
        F.max(epoch).alias("end_s"),
    )
