"""Streaming sessionization — a custom stateful operator on
`applyInPandasWithState` (Arrow-batched per-group state).

Semantics are identical to the batch window-function form
(`operators.sessions.sessionize`): per conversation, a new session
starts when the gap between consecutive events (by LSN) exceeds
`gap_seconds`. The streaming form keeps (last_lsn, last_ts,
session_idx, running counts) as typed group state across micro-batches
and emits an UPDATED summary row for every session touched in the
batch — downstream keeps the latest row per (key, session_idx).

Scale shape: state is O(active conversations) with a fixed-width
schema; each micro-batch shuffles only its own rows to their group's
state partition (the same key-hash exchange the resolve aggregation
uses). This is the engine's `applyInPandasWithState` exemplar for
operators that genuinely cannot be expressed as stateless DataFrame
transforms (cross-batch running state over unbounded input).

The reference has no stateful streaming at all (its loop is poll +
full-file batch jobs, /root/reference/src/pipeline/core/
client_clickhouse.py:177-206).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_idx", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_lsn", T.LongType()),
        T.StructField("last_lsn", T.LongType()),
        T.StructField("start_s", T.LongType()),
        T.StructField("end_s", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_lsn", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("session_idx", T.IntegerType()),
        T.StructField("sess_n", T.LongType()),
        T.StructField("sess_first", T.LongType()),
        T.StructField("sess_start", T.LongType()),
        T.StructField("sess_end", T.LongType()),
    ]
)


def _make_fn(gap_seconds: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            last_lsn, last_ts, sidx, sn, sfirst, sstart, send = state.get
        else:
            last_lsn, last_ts, sidx, sn, sfirst, sstart, send = (
                -1, None, -1, 0, 0, 0, 0
            )
        # in-batch disorder: order by LSN; at-least-once re-emits and
        # cross-batch re-delivery: drop already-applied LSNs
        batch = (
            batch.drop_duplicates(subset=["lsn"])
            .sort_values("lsn")
        )
        batch = batch[batch["lsn"] > last_lsn]
        touched: dict[int, tuple] = {}
        for lsn, es in zip(batch["lsn"].astype("int64"), batch["es"].astype("int64")):
            # gap is measured against the LSN-previous event's time;
            # session bounds are min/max time (out-of-order events can
            # carry earlier timestamps than their predecessors)
            if last_ts is None or es - last_ts > gap_seconds:
                sidx += 1
                sn, sfirst = 0, int(lsn)
                sstart = send = int(es)
            sn += 1
            sstart, send = min(sstart, int(es)), max(send, int(es))
            last_lsn, last_ts = int(lsn), int(es)
            touched[sidx] = (conv_id, sidx, sn, sfirst, int(lsn), sstart, send)
        state.update((last_lsn, last_ts, sidx, sn, sfirst, sstart, send))
        if touched:
            yield pd.DataFrame(
                list(touched.values()),
                columns=[
                    "conv_id", "session_idx", "n_events",
                    "first_lsn", "last_lsn", "start_s", "end_s",
                ],
            )

    return fn


def streaming_sessionize(
    stream: DataFrame, gap_seconds: int = 60
) -> DataFrame:
    """Apply gap-based sessionization to a binlog stream (any op —
    I/U/D all count as conversation activity). Returns an update-mode
    stream of session summary rows.

    PRECONDITION (in-order-across-batches): the cross-batch filter
    `lsn > last_lsn` treats every below-watermark LSN as an
    at-least-once re-delivery and drops it. A genuinely NEW event whose
    LSN is below a later batch's watermark (first-delivery disorder
    that crosses a micro-batch boundary) would be silently excluded
    from its session's counts/bounds, diverging from the batch twin.
    The binlog contract pins first-delivery disorder inside a segment
    (gen/binlog.py `disorder_window`), so segment-granular micro-
    batches satisfy this; only re-deliveries may cross batches. If the
    source cannot guarantee it, either widen micro-batches to cover
    the disorder horizon or recompute affected keys with the batch
    form (`operators.sessions`), which is order-insensitive."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    # default gap matches the batch twin (operators/sessions.py) so
    # default-parameter callers of the two "identical semantics" forms
    # cannot silently diverge. NULL event times are dropped up front:
    # pandas would otherwise materialize NaN and astype(int64) would
    # kill the whole stream (the batch twin filters identically).
    prepared = stream.filter(F.col("op_ts").isNotNull()).select(
        "conv_id",
        "lsn",
        F.col("op_ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    return prepared.groupBy("conv_id").applyInPandasWithState(
        _make_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
