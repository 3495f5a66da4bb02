"""Aggregations: the counter output and pipeline metrics.

The reference's ONLY aggregate is the counter output
(``internal/output/counter/counter.go:39-62``): a per-sink running count of
tag-matched events. The implicit second aggregate is the per-input line
accounting (tail.go:449, http.go:134-149). The north rule widens these to
per-sink / per-source counts and per-partition pipeline metrics
(rows_in / rows_parsed / rows_dropped / rows_routed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.routing import SinkSpec, route_exploded


def _sink_count_cols(sinks: list[SinkSpec], tag_col: str) -> list:
    return [
        F.sum(s.compiled.column(F.col(tag_col)).cast("long")).alias(s.name)
        for s in sinks
    ]


def _stack_expr(sinks: list[SinkSpec]) -> str:
    pairs = ", ".join(f"'{s.name}', `{s.name}`" for s in sinks)
    return f"stack({len(sinks)}, {pairs}) as (sink_name, n)"


def per_sink_counts(df: DataFrame, sinks: list[SinkSpec], tag_col: str = "tag") -> DataFrame:
    """counter.go:46-62 for every sink at once: (sink_name, n).

    Sinks that match zero rows still appear (count 0) — the reference
    counter prints 0 before any event arrives (counter.go:39-44).

    Round 7: conditional aggregation (one sum per sink over the unexploded
    frame) instead of explode + groupBy + a zero-backfill join — the
    explode built a rowcount-x-sinkcount blowup just to count it (guide
    §2.3: aggregate before you move rows)."""
    got = df.agg(*_sink_count_cols(sinks, tag_col))
    return got.selectExpr(_stack_expr(sinks)).select(
        "sink_name", F.coalesce("n", F.lit(0)).alias("n")
    )


def per_sink_source_counts(
    df: DataFrame, sinks: list[SinkSpec], tag_col: str = "tag", source_col: str = "source"
) -> DataFrame:
    """(sink_name, source, n) — the north rule's per-sink/per-source counts.

    Same conditional-aggregation shape as :func:`per_sink_counts`; the
    unpivot emits every (sink, source) cell, so the n > 0 filter restores
    the explode formulation's exact row set (a pair appeared there iff at
    least one row routed to it)."""
    got = df.groupBy(F.col(source_col).alias("source")).agg(
        *_sink_count_cols(sinks, tag_col)
    )
    return (
        got.select("source", F.expr(_stack_expr(sinks)))
        .filter(F.col("n") > 0)
        .select("sink_name", "source", "n")
    )


def per_partition_metrics(parsed_df: DataFrame, run_id: str = "run") -> DataFrame:
    """A2 (north rule): per-PHYSICAL-partition accounting — rows_in /
    rows_parsed per spark_partition_id, the executor-granular twin of the
    per-unit lineage metrics (plans/lineage.py). One map-side pass +
    one tiny shuffle over (partition_id) rows."""
    return (
        parsed_df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.when(F.col("parsed").isNotNull(), 1).otherwise(0)).alias("rows_parsed"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def pipeline_metrics_single_scan(
    parsed_df: DataFrame,
    keep_pred,
    sinks: list[SinkSpec],
    key_col: str = "source",
    tag_col: str = "tag",
) -> DataFrame:
    """One-scan twin of :func:`pipeline_metrics` for the common case
    ``kept_df == parsed_df.filter(keep_pred)`` (round-7 optimization):
    the three-frame formulation aggregates parsed/kept/routed separately,
    which re-evaluates the whole parse pipeline three times (three scans
    at the sf1.0 bench). Conditional aggregation computes all four
    metrics in ONE pass: rows_routed is the sum over kept rows of their
    matching-sink count — a row matching no sink contributes 0, exactly
    as ``route_exploded`` dropping it; rows_dropped = rows_in - kept.
    Output is identical column-for-column (pinned by the unchanged
    oracle)."""
    key = F.col(key_col)
    n_match = None
    for s in sinks:
        c = s.compiled.column(F.col(tag_col)).cast("long")
        n_match = c if n_match is None else n_match + c
    return parsed_df.groupBy(key.alias(key_col)).agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(F.col("parsed").isNotNull(), 1).otherwise(0)).alias("rows_parsed"),
        F.sum(keep_pred.cast("long")).alias("_kept"),
        F.sum(F.when(keep_pred, n_match).otherwise(0)).alias("rows_routed"),
    ).select(
        key_col,
        "rows_in",
        "rows_parsed",
        (F.col("rows_in") - F.col("_kept")).alias("rows_dropped"),
        "rows_routed",
    )


def pipeline_metrics(
    parsed_df: DataFrame,
    kept_df: DataFrame,
    sinks: list[SinkSpec],
    key_col: str = "source",
    tag_col: str = "tag",
) -> DataFrame:
    """Per-``key_col`` metrics: rows_in, rows_parsed, rows_dropped (by the
    filter chain), rows_routed (row x sink pairs; fan-out duplicates rows
    across sinks by design, engine.go:137-143).

    ``parsed_df`` is the post-parse pre-filter frame; ``kept_df`` the
    post-filter frame. Mirrors the accounting in tail.go:449/http.go:149.
    """
    key = F.col(key_col)
    ins = parsed_df.groupBy(key.alias(key_col)).agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(F.col("parsed").isNotNull(), 1).otherwise(0)).alias("rows_parsed"),
    )
    kept = kept_df.groupBy(key.alias(key_col)).agg(F.count(F.lit(1)).alias("rows_kept"))
    routed = (
        route_exploded(kept_df, sinks, tag_col)
        .groupBy(F.col(key_col))
        .agg(F.count(F.lit(1)).alias("rows_routed"))
    )
    return (
        ins.join(kept, key_col, "left")
        .join(routed, key_col, "left")
        .select(
            key_col,
            "rows_in",
            "rows_parsed",
            (F.col("rows_in") - F.coalesce("rows_kept", F.lit(0))).alias("rows_dropped"),
            F.coalesce("rows_routed", F.lit(0)).alias("rows_routed"),
        )
    )
