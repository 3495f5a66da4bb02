"""Driver contract for the spark-graft builder (PySpark target).

Implements the go-log-forwarder pipeline (SURVEY.md §2) over the driver's
testdata: the ``events`` table plays the role of the input stream (its
``props`` column is the raw JSON log line), tags derive from ``event_type``
(S7 metadata stamping), sources from ``user_id``. Every query routes through
the library in ``go_log_forwarder_spark/``; every oracle is ANSI/DuckDB SQL
over the same parquet views, with tag predicates rendered by the SAME
compiled pattern objects the Spark side uses (no drift possible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_log_forwarder_spark.functions.enrich import broadcast_enrich
from go_log_forwarder_spark.functions.filters import GrepFilter
from go_log_forwarder_spark.functions.parsers import JsonParser, ParserChain, RegexParser
from go_log_forwarder_spark.functions.tags import compile_tag_pattern
from go_log_forwarder_spark.operators.aggregate import (
    per_sink_counts,
    per_sink_source_counts,
    pipeline_metrics,
)
from go_log_forwarder_spark.operators.routing import SinkSpec, route_exploded

# ---------------------------------------------------------------------------
# pipeline configuration (FIXTURES.md F5-style sink table: every TagMatch
# branch — star / prefix / exact / suffix / multi-wildcard / empty)
# ---------------------------------------------------------------------------

SINKS = [
    SinkSpec("sink_all", "*"),
    SinkSpec("sink_err", "evt-err*"),
    SinkSpec("sink_click", "evt-click"),
    SinkSpec("sink_view", "*iew"),
    SinkSpec("sink_infix", "evt-*i*"),
    SinkSpec("sink_none", ""),
]

CORRUPT_MOD = 13  # every 13th event's raw line is malformed (parser no-match path)
GREP_PATTERN = '"k":[0-9]*[02468]}'  # keep rows whose parsed k is even
GREP = GrepFilter(op="and", include=(GREP_PATTERN,), match="evt-*")

REGEX_CORRUPT_MOD = 11
REGEX_PATTERN = r"^(?P<level>[A-Z]+) id=(?P<id>\d+) user=(?P<user>\d+)(?: opt=(?P<opt>\d*))?"

LOOKUP_ROWS = [  # broadcast-join lookup (FIXTURES.md F4 analog, keyed on event_type)
    ("click", "team-growth", 1),
    ("view", "team-growth", 2),
    ("purchase", "team-revenue", 1),
    ("error", "team-sre", 0),
    # 'signup' intentionally absent -> NULL enrichment (left join)
]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 metadata stamping: raw line + tag + source + ingest time."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.when(F.col("event_id") % CORRUPT_MOD == 0, F.lit('{"corrupt": '))
        .otherwise(F.col("props"))
        .alias("raw"),
        F.concat(F.lit("evt-"), F.col("event_type")).alias("tag"),
        F.concat(F.lit("src"), (F.col("user_id") % 10).cast("string")).alias("source"),
        F.col("event_type"),
        F.col("value"),
        F.col("ts").alias("ingest_time"),
    )


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ParserChain([JsonParser()]).apply(_ingest(spark, sf_dir))


def _kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GREP.apply(_parsed(spark, sf_dir))


# SQL mirror of the ingest/parse/keep pipeline. All events.props values are
# single-key JSON objects {"k": <int>}, so the canonical (Go json.Marshal)
# text is reconstructable in SQL.
_BASE_CTE = f"""
WITH base AS (
    SELECT event_id,
           'evt-' || event_type AS tag,
           'src' || CAST(user_id % 10 AS VARCHAR) AS source,
           event_type,
           value,
           CASE WHEN event_id % {CORRUPT_MOD} = 0 THEN NULL
                ELSE json_extract_string(props, 'k') END AS k,
           CASE WHEN event_id % {CORRUPT_MOD} = 0 THEN 'null'
                ELSE '{{"k":' || json_extract_string(props, 'k') || '}}' END AS canonical
    FROM events
),
kept AS (
    SELECT * FROM base WHERE regexp_matches(canonical, '{GREP_PATTERN}')
)
"""


def _sink_pred_sql(spec: SinkSpec, tag_expr: str = "tag") -> str:
    return compile_tag_pattern(spec.match).duckdb_sql(tag_expr)


def _routed_union_sql(from_clause: str = "kept") -> str:
    """(sink_name, row...) relation as a UNION ALL over per-sink predicates."""
    parts = [
        f"SELECT '{s.name}' AS sink_name, * FROM {from_clause} WHERE {_sink_pred_sql(s)}"
        for s in SINKS
    ]
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_route_per_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/K2 counter output for every sink (counter.go:46-62)."""
    return per_sink_counts(_kept(spark, sf_dir), SINKS)


def q_route_per_sink_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule per-sink/per-source aggregate counts."""
    return per_sink_source_counts(_kept(spark, sf_dir), SINKS)


def q_json_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 json parser: parsed-field extraction + per-tag aggregates."""
    parsed = _parsed(spark, sf_dir)
    return parsed.groupBy("tag").agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.count(F.col("parsed")["k"]).alias("n_parsed"),
        F.sum(F.col("parsed")["k"].cast("bigint")).alias("sum_k"),
    )


def q_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 pipeline metrics per source: rows in/parsed/dropped/routed."""
    parsed = _parsed(spark, sf_dir)
    kept = GREP.apply(parsed)
    return pipeline_metrics(parsed, kept, SINKS)


def q_routed_rows_err_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/R2 routed-row equality for the prefix sink (full row set)."""
    routed = route_exploded(_kept(spark, sf_dir), SINKS)
    return routed.filter(F.col("sink") == "sink_err").select(
        "event_id", "tag", "source", F.col("parsed")["k"].cast("bigint").alias("k")
    )


def q_tag_sink_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 tag-wildcard truth table over the live tag domain."""
    tags = _ingest(spark, sf_dir).select("tag").distinct()
    return route_exploded(tags, SINKS).select("tag", F.col("sink").alias("sink_name"))


def q_enrich_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 enrichment via broadcast hash join; per-team aggregates.

    value is summed as exact cents (round-then-cast) so Spark and DuckDB
    aggregate identical integers — float sum order is engine-dependent."""
    lookup = spark.createDataFrame(LOOKUP_ROWS, "event_type string, team string, priority int")
    enriched = broadcast_enrich(_kept(spark, sf_dir), lookup, on="event_type")
    return enriched.groupBy("team").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        F.max("priority").alias("max_priority"),
    )


def q_regex_parse_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 vectorized regex parser: named groups, corrupt lines no-match."""
    ev = _events(spark, sf_dir)
    df = ev.select(
        "event_id",
        F.concat(
            F.when(F.col("event_id") % REGEX_CORRUPT_MOD == 0, F.lit("~~")).otherwise(F.lit("")),
            F.upper(F.col("event_type")),
            F.lit(" id="),
            F.col("event_id").cast("string"),
            F.lit(" user="),
            F.col("user_id").cast("string"),
        ).alias("raw"),
        F.col("ts").alias("ingest_time"),
    )
    parsed = ParserChain([RegexParser(pattern=REGEX_PATTERN)]).apply(df)
    return parsed.groupBy(F.col("parsed")["level"].alias("level")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("parsed")["id"].cast("bigint")).alias("sum_id"),
        F.sum(F.col("parsed")["user"].cast("bigint")).alias("sum_user"),
    )


def q_parser_chain_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 first-match-wins chain: json then regex; neither -> kept raw."""
    ev = _events(spark, sf_dir)
    df = ev.select(
        "event_id",
        F.when(F.col("event_id") % CORRUPT_MOD == 0, F.lit("{nope"))
        .when(F.col("event_id") % 2 == 0, F.col("props"))
        .otherwise(
            F.concat(
                F.upper(F.col("event_type")),
                F.lit(" id="),
                F.col("event_id").cast("string"),
                F.lit(" user="),
                F.col("user_id").cast("string"),
            )
        )
        .alias("raw"),
        F.col("ts").alias("ingest_time"),
    )
    parsed = ParserChain(
        [JsonParser(), RegexParser(pattern=REGEX_PATTERN)]
    ).apply(df)
    return parsed.groupBy("parser").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse→filter→route→aggregate pipeline at sf0.001."""
    return q_route_per_sink_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "route_per_sink_counts": q_route_per_sink_counts,
        "route_per_sink_source_counts": q_route_per_sink_source_counts,
        "json_parse_extract": q_json_parse_extract,
        "pipeline_metrics": q_pipeline_metrics,
        "routed_rows_err_sink": q_routed_rows_err_sink,
        "tag_sink_matrix": q_tag_sink_matrix,
        "enrich_broadcast_lookup": q_enrich_broadcast_lookup,
        "regex_parse_groups": q_regex_parse_groups,
        "parser_chain_first_match": q_parser_chain_first_match,
    }


def oracle_sql() -> dict[str, str]:
    per_sink_counts_sql = " UNION ALL ".join(
        f"SELECT '{s.name}' AS sink_name, (SELECT COUNT(*) FROM kept WHERE {_sink_pred_sql(s)})::BIGINT AS n"
        for s in SINKS
    )
    per_sink_source_sql = " UNION ALL ".join(
        f"SELECT '{s.name}' AS sink_name, source, COUNT(*)::BIGINT AS n FROM kept WHERE {_sink_pred_sql(s)} GROUP BY source"
        for s in SINKS
    )
    routed_per_source = " UNION ALL ".join(
        f"SELECT source, event_id FROM kept WHERE {_sink_pred_sql(s)}" for s in SINKS
    )
    lookup_values = ", ".join(f"('{t}', '{team}', {p})" for t, team, p in LOOKUP_ROWS)
    tag_matrix = " UNION ALL ".join(
        f"SELECT tag, '{s.name}' AS sink_name FROM tags WHERE {_sink_pred_sql(s)}"
        for s in SINKS
    )
    return {
        "route_per_sink_counts": _BASE_CTE + per_sink_counts_sql,
        "route_per_sink_source_counts": _BASE_CTE + per_sink_source_sql,
        "json_parse_extract": _BASE_CTE
        + """
            SELECT tag,
                   COUNT(*)::BIGINT AS rows_in,
                   COUNT(k)::BIGINT AS n_parsed,
                   SUM(CAST(k AS BIGINT)) AS sum_k
            FROM base GROUP BY tag
        """,
        "pipeline_metrics": _BASE_CTE
        + f"""
            , routed AS ({routed_per_source})
            SELECT b.source,
                   COUNT(*)::BIGINT AS rows_in,
                   COUNT(b.k)::BIGINT AS rows_parsed,
                   (COUNT(*) - (SELECT COUNT(*) FROM kept k2 WHERE k2.source = b.source))::BIGINT AS rows_dropped,
                   (SELECT COUNT(*) FROM routed r WHERE r.source = b.source)::BIGINT AS rows_routed
            FROM base b GROUP BY b.source
        """,
        "routed_rows_err_sink": _BASE_CTE
        + f"""
            SELECT event_id, tag, source, CAST(k AS BIGINT) AS k
            FROM kept WHERE {_sink_pred_sql(SinkSpec('sink_err', 'evt-err*'))}
        """,
        "tag_sink_matrix": _BASE_CTE
        + f", tags AS (SELECT DISTINCT tag FROM base) {tag_matrix}",
        "enrich_broadcast_lookup": _BASE_CTE
        + f"""
            , lookup(event_type, team, priority) AS (VALUES {lookup_values})
            SELECT l.team,
                   COUNT(*)::BIGINT AS n,
                   SUM(CAST(ROUND(k2.value * 100) AS BIGINT)) AS sum_cents,
                   MAX(l.priority) AS max_priority
            FROM kept k2 LEFT JOIN lookup l USING (event_type)
            GROUP BY l.team
        """,
        "regex_parse_groups": f"""
            WITH raws AS (
                SELECT event_id,
                       CASE WHEN event_id % {REGEX_CORRUPT_MOD} = 0 THEN '~~' ELSE '' END
                       || upper(event_type) || ' id=' || event_id || ' user=' || user_id AS raw
                FROM events
            ), parsed AS (
                SELECT CASE WHEN event_id % {REGEX_CORRUPT_MOD} <> 0
                            THEN regexp_extract(raw, '^([A-Z]+) id=([0-9]+) user=([0-9]+)', 1) END AS level,
                       CASE WHEN event_id % {REGEX_CORRUPT_MOD} <> 0
                            THEN regexp_extract(raw, '^([A-Z]+) id=([0-9]+) user=([0-9]+)', 2) END AS id,
                       CASE WHEN event_id % {REGEX_CORRUPT_MOD} <> 0
                            THEN regexp_extract(raw, '^([A-Z]+) id=([0-9]+) user=([0-9]+)', 3) END AS user
                FROM raws
            )
            SELECT level, COUNT(*)::BIGINT AS n,
                   SUM(CAST(id AS BIGINT)) AS sum_id,
                   SUM(CAST(user AS BIGINT)) AS sum_user
            FROM parsed GROUP BY level
        """,
        "parser_chain_first_match": f"""
            SELECT CASE WHEN event_id % {CORRUPT_MOD} = 0 THEN NULL
                        WHEN event_id % 2 = 0 THEN 'json'
                        ELSE 'regex' END AS parser,
                   COUNT(*)::BIGINT AS n
            FROM events GROUP BY 1
        """,
    }


if __name__ == "__main__":
    from go_log_forwarder_spark.session import get_spark

    df = entry(get_spark(master="local[8]"))
    df.show()
