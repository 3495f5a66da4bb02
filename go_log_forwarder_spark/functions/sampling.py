"""Deterministic sampling + data mixing for training pipelines.

``df.sample()`` is engine- and partitioning-dependent — useless when the
training mix must be reproducible, auditable, and re-derivable by another
engine. Hash-gate sampling fixes that: a row is kept iff
``hex60(md5(seed:key)) < fraction * 2^60`` — a pure function of the row
key, so the SAME rows are selected on any cluster size, any engine, any
day (the md5 bits are uniform; fraction precision is 2^-60). Same trick
for shuffle order: ``order by hex60(seed:key)`` is a reproducible global
permutation (the 'deterministic shuffle' of training-data loaders).

Scale shape: both are one narrow map pass (a filter / a sort key); the
per-source mixing variant broadcasts the tiny rate map as a CASE
expression, so mixing 10^12 rows is scan-speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import hex60_col, hex60_sql

HASH_SPACE = 1 << 60


def _gate(key: Column, seed: str) -> Column:
    return hex60_col(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "s0"
) -> DataFrame:
    """Keep rows whose hash gate falls below ``fraction`` of the hash
    space — reproducible on any engine/cluster, disjoint across seeds."""
    return df.filter(_gate(F.col(key_col), seed) < int(fraction * HASH_SPACE))


def mix_sample(
    df: DataFrame, key_col: str, group_col: str, rates: dict[str, float], seed: str = "s0"
) -> DataFrame:
    """Per-group sampling rates (the training-data MIX: e.g. keep 100% of
    rare sources, 10% of the crawl). Groups absent from ``rates`` drop."""
    thr = None
    for g, frac in sorted(rates.items()):
        c = F.when(F.col(group_col) == g, F.lit(int(frac * HASH_SPACE)))
        thr = c if thr is None else thr.when(F.col(group_col) == g, F.lit(int(frac * HASH_SPACE)))
    thr = thr.otherwise(F.lit(0))
    return df.filter(_gate(F.col(key_col), seed) < thr)


def shuffle_position(key: Column, seed: str = "s0") -> Column:
    """Reproducible global shuffle key: order by this column for a
    deterministic permutation of the dataset (stable across engines)."""
    return _gate(key, seed)


def sample_gate_sql(key_expr: str, seed: str = "s0") -> str:
    return hex60_sql(f"'{seed}:' || CAST({key_expr} AS VARCHAR)")


def quota_sample(
    df: DataFrame, key_col: str, group_col: str, n_per_group: int, seed: str = "s0"
) -> DataFrame:
    """Exactly ``n_per_group`` rows per group (fewer when the group is
    smaller), selected by hash order — the deterministic stratified-head
    mixing mode (vs :func:`mix_sample`'s rate mode). Plans as a
    WindowGroupLimit (per-partition top-n before the shuffle), so the full
    sort of each group never happens."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        shuffle_position(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_qr", F.row_number().over(w))
        .filter(F.col("_qr") <= n_per_group)
        .drop("_qr")
    )
