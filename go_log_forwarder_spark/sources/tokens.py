"""The graft input table: pre-tokenized training sequences.

``BASELINE.json input_hint``: ``(doc_id string, tokens array<int32>,
n_tok int32, source string)`` — an Iceberg table at 10^12 rows in
production, synthesized deterministically at small scale for tests and
benchmarks (no external data).

The generator is a portable integer LCG evaluated identically by Spark
(``F.transform`` over ``F.sequence``) and DuckDB (list comprehension), so
oracle queries can re-derive the exact same table — including exact
token-array equality — with no data exchange. All intermediate products stay
< 2^63 (BIGINT-safe in both engines).

``source`` is Zipf-skewed: one source holds ~60% of rows (FIXTURES.md F1),
to exercise the north rule's explicit skew handling (salted repartition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

M = 1048573  # prime modulus
MAX_TOKEN = 50257  # GPT-2-ish vocab size

# typed schema for the json-parser path over serialized sequence records
TOKENS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def serialize_tokens(df: DataFrame) -> DataFrame:
    """Render each sequence row as a raw JSON log line (the pipeline's parse
    input), keeping the original columns for roundtrip verification."""
    return df.withColumn(
        "raw", F.to_json(F.struct("doc_id", "tokens", "n_tok", "source"))
    )


def parse_tokens_raw(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Typed json parse (P2 with declared schema — SURVEY §1.3): invalid
    lines yield NULL struct, rows are kept (engine.go:93-97 semantics)."""
    return df.withColumn("parsed", F.from_json(F.col(raw_col), TOKENS_JSON_SCHEMA))

# (threshold, name): src-hot takes 60% of rows
SOURCE_BUCKETS = [
    (60, "src-hot"),
    (75, "src-a"),
    (85, "src-b"),
    (92, "src-c"),
    (96, "src-d"),
    (98, "src-e"),
    (99, "src-f"),
    (100, "src-g"),
]


def _source_col(i: Column) -> Column:
    r = ((i % M) * 16807 + 7) % M % 100
    expr = None
    for threshold, name in SOURCE_BUCKETS:
        cond = r < F.lit(threshold)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def _source_sql(i_expr: str) -> str:
    r = f"((({i_expr}) % {M}) * 16807 + 7) % {M} % 100"
    cases = " ".join(
        f"WHEN {r} < {threshold} THEN '{name}'" for threshold, name in SOURCE_BUCKETS
    )
    return f"CASE {cases} END"


def tokens_cols(i: Column, max_len: int = 128) -> list[Column]:
    """The four graft columns derived from a BIGINT row index ``i``.

    A NEGATIVE index makes n_tok <= 0 (both engines' % keeps the dividend
    sign); Spark's sequence(1, n) would then DESCEND while DuckDB's
    generate_series(1, n) is empty — guard to the empty array so both
    engines agree (self-review round 5)."""
    n_tok = (F.lit(1) + ((i % M) * 48271 + 11) % M % max_len).cast("int")
    tok = lambda j: (  # noqa: E731
        (((i % M) * 48271 + j * 16807 + 13) % M * 48271) % M % MAX_TOKEN
    ).cast("int")
    toks = F.when(
        n_tok >= 1, F.transform(F.sequence(F.lit(1), n_tok), tok)
    ).otherwise(F.array().cast("array<int>"))
    return [
        F.concat(F.lit("doc-"), F.lpad(i.cast("string"), 12, "0")).alias("doc_id"),
        toks.alias("tokens"),
        n_tok.alias("n_tok"),
        _source_col(i).alias("source"),
    ]


def tokens_oracle_sql(i_expr: str, from_clause: str, max_len: int = 128) -> str:
    """DuckDB SQL producing the EXACT same table from the same row indexes."""
    n_tok = f"(1 + ((({i_expr}) % {M}) * 48271 + 11) % {M} % {max_len})"
    tok = (
        f"((((({i_expr}) % {M}) * 48271 + j * 16807 + 13) % {M} * 48271) % {M} % {MAX_TOKEN})"
    )
    return f"""
        SELECT 'doc-' || lpad(CAST({i_expr} AS VARCHAR), 12, '0') AS doc_id,
               CAST([ {tok} for j in generate_series(1, {n_tok}) ] AS INTEGER[]) AS tokens,
               CAST({n_tok} AS INTEGER) AS n_tok,
               {_source_sql(i_expr)} AS source
        FROM {from_clause}
    """


def synth_tokens(spark: SparkSession, n_rows: int, max_len: int = 128, partitions: int | None = None) -> DataFrame:
    """Distributed synthesis of the tokens table (bench/scale path)."""
    rng = spark.range(n_rows, numPartitions=partitions)
    return rng.select(*tokens_cols(F.col("id"), max_len))


def tokens_from_events(spark: SparkSession, sf_dir: str, max_len: int = 128) -> DataFrame:
    """Oracle-checkable synthesis keyed on events.event_id, so the row count
    tracks the driver's scale factor and DuckDB can re-derive it."""
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.select(*tokens_cols(F.col("event_id").cast("bigint"), max_len))
