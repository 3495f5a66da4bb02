"""Range (interval) join: points joined to the key-matched intervals that
contain them — the other temporal operator (maintenance windows, IP blocks,
validity ranges) Spark's planner handles badly out of the box: a raw
``p.t >= i.start AND p.t < i.end`` predicate plans as a nested-loop over
the full key-pair product.

Scalable realization (the standard bucketed interval join):

1. pick a bucket width; each interval EXPLODES to every bucket it
   overlaps (intervals are usually short relative to the width, so the
   duplication factor is ~1-2),
2. points map to their single bucket,
3. equi-join on (key, bucket) — a plain shuffle hash join Catalyst can
   plan, broadcast when the interval side is small,
4. the exact containment filter runs only on bucket-colocated candidates.

Correct for ANY interval length (long intervals just explode to more
buckets); the bucket width trades duplication against candidate density
exactly like an IVF cell size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with the same ``key`` and
    ``start <= t < end`` (half-open, timestamp columns). Returns all point
    columns + all interval columns except the key. ``how='inner'`` drops
    uncontained points.
    """
    w = bucket_seconds * MICROS
    t = F.unix_micros(F.col(time_col).cast("timestamp"))  # NTZ-safe (UTC session)
    p = points.withColumn("_bkt", F.floor(t / w))
    s = F.unix_micros(F.col(start_col).cast("timestamp"))
    e = F.unix_micros(F.col(end_col).cast("timestamp"))
    # empty/inverted intervals contain no point (half-open) — and would
    # otherwise explode a DESCENDING bucket sequence (Spark sequence(5,3)
    # counts down), assigning wrong buckets
    iv = intervals.filter(e > s).withColumn(
        "_bkt",
        F.explode(F.sequence(F.floor(s / w), F.floor((e - 1) / w))),
    )
    tt = F.unix_micros(F.col(time_col).cast("timestamp"))
    joined = p.join(iv, [key, "_bkt"], how).filter(
        (tt >= F.unix_micros(F.col(start_col).cast("timestamp")))
        & (tt < F.unix_micros(F.col(end_col).cast("timestamp")))
    )
    return joined.drop("_bkt")


def range_join_sql(
    points_sql: str,
    intervals_sql: str,
    key: str,
    time_col: str,
    start_col: str,
    end_col: str,
    point_cols: list[str],
    interval_cols: list[str],
) -> str:
    """DuckDB oracle twin: the plain inequality join (exact by definition —
    DuckDB plans it as an IEJoin, so it is an independent implementation)."""
    pc = ", ".join(f"p.{c}" for c in point_cols)
    ic = ", ".join(f"i.{c}" for c in interval_cols)
    return f"""
        SELECT {pc}, {ic}
        FROM ({points_sql}) p JOIN ({intervals_sql}) i
          ON p.{key} = i.{key}
         AND p.{time_col} >= i.{start_col} AND p.{time_col} < i.{end_col}
    """
