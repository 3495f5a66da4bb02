"""As-of join: each left row gets the LATEST right row at or before its
timestamp, per key — the temporal-enrichment operator (rates, configs,
dimension versions) that Spark's DataFrame API lacks natively.

Scalable realization (no range cross-join, no per-row backward scan):

1. tag both sides and union them (right payload NULL on left rows),
2. one window per key ordered by (time, side) — right rows sort BEFORE
   left rows at equal time so ``<=`` semantics hold,
3. ``last(payload, ignorenulls=True)`` over the unbounded-preceding frame
   carries the most recent right payload forward,
4. filter the left rows back out.

Cost: ONE shuffle on the key (the same partitioning a plain join would
need) + a per-partition sort — at 10^12 rows this is the plan you want;
the naive ``left.ts >= right.ts`` non-equi join explodes to the full
range product and falls into BroadcastNestedLoopJoin.

The DuckDB oracle is the native ``ASOF LEFT JOIN`` (identical semantics),
so the operator is value-hash-gated against an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: all ``left`` columns + ``payload_cols`` from the
    latest ``right`` row with ``right_time <= left_time`` and equal
    ``key`` (NULL when no such row). ``right`` must be unique per
    (key, right_time) — pre-aggregate if it is not.
    """
    lcols = left.columns
    clash = [c for c in payload_cols if c in lcols]
    if clash:
        raise ValueError(f"payload columns {clash} collide with left columns")
    # The payload is carried as ONE struct, not per-column: with independent
    # last(ignorenulls) per column, a NULL field in the latest right row
    # would be back-filled from an OLDER right row, producing a mixed tuple
    # that never existed. A struct is non-null whenever a right row matched
    # (even if every field inside is NULL), so all fields come from the SAME
    # right row and matched-row NULLs are preserved — exactly DuckDB's
    # ASOF LEFT JOIN semantics.
    ptype = right.select(
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload")
    ).schema["_payload"].dataType
    l = (
        left.withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_payload", F.lit(None).cast(ptype))
    )
    r = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    sel = [key, "_t", "_side", "_payload", *[c for c in lcols if c != key]]
    unioned = l.select(*sel).unionByName(r.select(*sel))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        key,
        "_side",
        *[c for c in lcols if c != key],
        F.last(F.col("_payload"), ignorenulls=True).over(w).alias("_payload"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols, *[F.col("_payload")[c].alias(c) for c in payload_cols]
    )


def as_of_join_sql(
    left_sql: str,
    right_sql: str,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    left_cols: list[str],
) -> str:
    """DuckDB oracle twin: the native ASOF LEFT JOIN."""
    pl = ", ".join(f"r.{c}" for c in payload_cols)
    lc = ", ".join(f"l.{c}" for c in left_cols)
    return f"""
        SELECT {lc}, {pl}
        FROM ({left_sql}) l
        ASOF LEFT JOIN ({right_sql}) r
          ON l.{key} = r.{key} AND l.{left_time} >= r.{right_time}
    """
