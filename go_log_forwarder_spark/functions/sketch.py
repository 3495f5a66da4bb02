"""Cardinality sketches: HyperLogLog register state, computed EXACTLY.

The distributed part of HLL — hashing keys, bucketing, taking the max
leading-zero rank per bucket — is pure integer/string arithmetic here
(hex60 md5 hash, rank via binary-string length), so the full register
relation is reproducible bit-for-bit by the DuckDB oracle: the sketch
STATE is value-hash-gated, not just its float estimate. The estimate
itself (alpha * m^2 / sum(2^-reg), Flajolet et al. 2007, public algorithm)
is a trivial driver-side formula over the m registers; accuracy against
exact count-distinct is pinned by a unit test.

Scale shape: one narrow map pass + a groupBy on (group, bucket) with
map-side partial max — registers merge associatively, which is exactly why
HLL works on 10^12 rows (registers from partial aggregations combine with
max, no rescan). Register width 2^p per group is constant state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import hex60_col, hex60_sql

HLL_P = 6  # 2^6 = 64 buckets -> ~13% standard error
HLL_HASH_BITS = 60  # hex60: first 15 md5 hex chars


def hll_rank_col(rest: Column, width: int) -> Column:
    """Position of the leftmost 1-bit of a ``width``-bit suffix (rank),
    width+1 when zero. bin() has no leading zeros, so
    rank = width - bit_length + 1 — exact in both engines."""
    return F.when(rest == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(rest)) + 1
    )


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """(group_cols..., bucket int, register int): the HLL register relation
    per group. Missing buckets are implicitly rank 0 (no key hashed there).
    """
    width = HLL_HASH_BITS - p
    h = hex60_col(F.col(key_col).cast("string"))
    bucket = F.shiftright(h, width).cast("int")
    rest = h.bitwiseAND(F.lit((1 << width) - 1))
    return (
        df.select(*group_cols, bucket.alias("bucket"), hll_rank_col(rest, width).alias("_r"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_r").cast("int").alias("register"))
    )


def hll_registers_sql(
    table: str, key_expr: str, group_cols: list[str], p: int = HLL_P
) -> str:
    """DuckDB twin of :func:`hll_registers`."""
    width = HLL_HASH_BITS - p
    h = hex60_sql(f"CAST({key_expr} AS VARCHAR)")
    gc = ", ".join(group_cols)
    mask = (1 << width) - 1
    return f"""
        WITH hashed AS (
            SELECT {gc},
                   CAST(({h}) >> {width} AS INT) AS bucket,
                   ({h}) & {mask} AS rest
            FROM {table}
        )
        SELECT {gc}, bucket,
               CAST(MAX(CASE WHEN rest = 0 THEN {width + 1}
                             ELSE {width} - length(bin(rest)) + 1 END) AS INT) AS register
        FROM hashed GROUP BY {gc}, bucket
    """


def hll_estimate(registers: dict[int, int], p: int = HLL_P) -> float:
    """Driver-side HLL estimate from a group's register map (bucket->reg),
    with the standard small-range linear-counting correction."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    denom = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    e = alpha * m * m / denom
    zeros = sum(1 for j in range(m) if registers.get(j, 0) == 0)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e
