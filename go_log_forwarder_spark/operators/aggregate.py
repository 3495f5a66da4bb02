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


def per_sink_counts(df: DataFrame, sinks: list[SinkSpec], tag_col: str = "tag") -> DataFrame:
    """counter.go:46-62 for every sink at once: (sink_name, n).

    Sinks that match zero rows still appear (count 0) — the reference
    counter prints 0 before any event arrives (counter.go:39-44).
    """
    spark = df.sparkSession
    names = spark.createDataFrame([(s.name,) for s in sinks], "sink_name string")
    got = (
        route_exploded(df, sinks, tag_col)
        .groupBy(F.col("sink").alias("sink_name"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        names.join(got, "sink_name", "left")
        .select("sink_name", F.coalesce("n", F.lit(0)).alias("n"))
    )


def per_sink_source_counts(
    df: DataFrame, sinks: list[SinkSpec], tag_col: str = "tag", source_col: str = "source"
) -> DataFrame:
    """(sink_name, source, n) — the north rule's per-sink/per-source counts."""
    return (
        route_exploded(df, sinks, tag_col)
        .groupBy(F.col("sink").alias("sink_name"), F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("n"))
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
