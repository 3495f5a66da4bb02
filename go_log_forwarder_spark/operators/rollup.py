"""Hypertable-style time rollup: multi-resolution continuous aggregates.

The hypertable/continuous-aggregate trick: the FINEST level aggregates the
raw rows exactly once; every coarser level re-aggregates the previous
level's OUTPUT (a day bucket merges 24 hourly partials, never the 10^12
raw rows again). That works because the aggregates are decomposable —
counts and sums merge with sum, min/max with min/max — the same property
Spark's own partial aggregation exploits within one groupBy.

In one Spark query plan the hour->day->week chain shares the hourly
aggregate subtree (AQE exchange reuse); in production each level is
materialized as its own table and incrementally refreshed, which this
operator's shape maps to directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}


def time_rollup(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    aggs: list[tuple[str, Column, str]],
    levels: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """Aggregate ``df`` at each time resolution in ``levels`` (finest
    first; each must truncate-nest into the next). ``aggs`` is a list of
    (name, base aggregate Column over raw rows, merge fn in sum|min|max).
    Returns one frame: (level, bucket, *keys, *agg names).
    """
    _GRAIN = {"minute": 0, "hour": 1, "day": 2, "week": 3, "month": 4, "year": 5}
    grains = [_GRAIN.get(lvl) for lvl in levels]
    if None in grains or grains != sorted(grains) or len(set(grains)) != len(grains):
        raise ValueError(f"levels must be strictly finest-to-coarsest from {sorted(_GRAIN)}; got {levels}")
    if "week" in levels and levels[-1] != "week":
        # weeks cross month/year boundaries: nothing truncate-nests FROM a
        # week bucket, so week partials cannot feed a coarser level
        raise ValueError(f"'week' must be the last level (it nests into nothing); got {levels}")
    for _, _, m in aggs:
        if m not in _MERGE:
            raise ValueError(f"unsupported merge {m!r}; decomposable merges: {sorted(_MERGE)}")
    out = None
    cur = None
    for i, lvl in enumerate(levels):
        if cur is None:
            cur = df.groupBy(
                F.date_trunc(lvl, F.col(time_col)).alias("bucket"), *keys
            ).agg(*[base.alias(n) for n, base, _ in aggs])
        else:
            cur = cur.groupBy(
                F.date_trunc(lvl, F.col("bucket")).alias("bucket"), *keys
            ).agg(*[_MERGE[m](n).alias(n) for n, _, m in aggs])
        if i < len(levels) - 1:
            # materialize every non-final level: each union branch would
            # otherwise RE-SCAN the raw input (no cross-branch exchange
            # reuse — distinct attribute ids), defeating the whole point.
            # In production each level is its own table; here the cache
            # plays that role within the single action.
            cur = cur.persist()
        lev = cur.select(F.lit(lvl).alias("level"), "bucket", *keys, *[n for n, _, _ in aggs])
        out = lev if out is None else out.unionByName(lev)
    return out
