"""Custom stateful streaming operator: the running counter.

The reference's counter output keeps a monotone per-sink count across
batches under a mutex (internal/output/counter/counter.go:39-62 — prints
``{"count": n}`` per event with n ever-increasing). In Spark that is a
custom stateful operator: ``applyInPandasWithState`` with a per-key count
state (SURVEY §2.10 — the only stateful surface the reference implies).

The kernel is Arrow-batched (pandas DataFrames per group per micro-batch);
state is one integer per key — O(keys), never O(rows).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("batch_rows", T.LongType()),
        T.StructField("running_total", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])


def _count_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
    (total,) = state.get if state.exists else (0,)
    total += batch_rows
    state.update((total,))
    yield pd.DataFrame(
        {"key": [key[0]], "batch_rows": [batch_rows], "running_total": [total]}
    )


def running_counter(stream_df: DataFrame, key_col: str = "tag") -> DataFrame:
    """Per-key running count across micro-batches (counter.go semantics).

    Emits one row per key per batch: (key, batch_rows, running_total)."""
    return (
        stream_df.withColumn("key", F.col(key_col))
        .groupBy("key")
        .applyInPandasWithState(
            _count_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming sessionization (stateful twin of __spark_entry__.q_sessionize)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open session state: (start_us, last_us, n_events)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

SESSION_GAP_US = 1800 * 1_000_000  # 30 min, matching the batch sessionizer


def _session_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    def emit(rows):
        return pd.DataFrame(
            rows, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )

    if state.hasTimedOut:
        # watermark passed last_event + gap: the open session is final
        start, last, n = state.get
        state.remove()
        yield emit([(key[0], start, last, n)])
        return

    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(v) for v in pdf["ts_us"])
    ts.sort()
    start = last = n = None
    if state.exists:
        start, last, n = state.get
    closed = []
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_US:
            closed.append((key[0], start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = max(last, t), n + 1
    state.update((start, last, n))
    # the open session finalizes when event time passes last + gap
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_US // 1000)
    yield emit(closed)


def stream_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "event_time",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming sessionization with bounded per-user state: sessions split
    on >30-minute gaps exactly like the batch q_sessionize; a session is
    EMITTED when a later event of the same user opens the next session, or
    when the event-time watermark passes its end + gap (timeout) — so
    output is append-only and state is one (start, last, n) triple per
    active user. The custom-stateful-operator surface of SURVEY §2.10."""
    src = stream_df.withWatermark(time_col, watermark).select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(time_col).cast("timestamp")).alias("ts_us"),
        F.col(time_col),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
