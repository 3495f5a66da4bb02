"""Explicit partitioning & skew handling (north rule).

The graft's ``source`` column is Zipf-skewed (one source ≥60% of rows). A
plain ``repartition(N, source)`` sends 60% of 10^12 rows to one partition —
AQE's skew-join handling does not apply to explicit repartitions, so the
north rule demands explicit salting (SURVEY §4.3).

Strategy: a cheap ``groupBy(source).count()`` pre-scan (the source domain is
tiny — tens of values) sizes a per-source salt factor
``S_k = ceil(rows_k / (total/num_partitions))``; rows get
``salt = pmod(hash(row_key), S_k)`` and we repartition on (key, salt).
Low-frequency sources keep S=1 (no extra fragmentation / tiny files —
SURVEY §7.3 risk 3). The collect() touches only the aggregated source
domain, never row data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_salt_factors(df: DataFrame, key: str, num_partitions: int) -> dict[str, int]:
    """Pre-scan: per-key salt factor, 1 for keys below the even-share line."""
    rows = df.groupBy(key).count().collect()
    total = sum(r["count"] for r in rows)
    if total == 0:
        return {}
    even_share = total / num_partitions
    return {
        r[key]: min(num_partitions, max(1, math.ceil(r["count"] / even_share)))
        for r in rows
    }


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "source",
    buckets: int = 32,
    sort_by: str | None = "doc_id",
) -> None:
    """Bucketed table write: later equi-joins/aggregations on ``key``
    co-locate WITHOUT a shuffle (the 10^12-row co-location strategy — both
    sides bucketed on the join key means zero Exchange at read time).

    Uses the session catalog (works with the in-memory catalog locally and
    any HMS/Glue catalog on a cluster)."""
    w = df.write.bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def salted_repartition(
    df: DataFrame,
    key: str = "source",
    num_partitions: int = 32,
    row_key: str = "doc_id",
    factors: dict[str, int] | None = None,
) -> DataFrame:
    """Repartition by (key, salt) with per-key salt factors.

    The ``_salt`` column is retained so downstream per-(key,salt) work stays
    co-located; callers drop it when done. Aggregations by ``key`` alone are
    unaffected by salting (partial aggregation combines across salts)."""
    if factors is None:
        factors = source_salt_factors(df, key, num_partitions)
    if not factors or all(v == 1 for v in factors.values()):
        return df.repartition(num_partitions, F.col(key)).withColumn("_salt", F.lit(0))
    factor_expr = None
    for k, s in factors.items():
        cond = F.col(key) == F.lit(k)
        factor_expr = (
            F.when(cond, F.lit(s)) if factor_expr is None else factor_expr.when(cond, F.lit(s))
        )
    factor_expr = factor_expr.otherwise(F.lit(1))
    salt = F.pmod(F.hash(F.col(row_key)), factor_expr)
    return df.withColumn("_salt", salt).repartition(num_partitions, F.col(key), F.col("_salt"))
