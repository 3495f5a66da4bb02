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
