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


def synth_tokens_arrow(
    ids: DataFrame, max_len: int = 128, columns: list[str] | None = None
) -> DataFrame:
    """Vectorized twin of ``select(*tokens_cols(...))`` over a one-column
    DataFrame of bigint row indexes (optimization round 7, guide §4.2):
    the Catalyst formulation evaluates the token LCG through an
    interpreted ``transform(sequence(...))`` lambda — ~10 s/M rows at
    sf1.0, paid by every tokens-table query — where this kernel computes
    the identical integers with a handful of numpy ops per Arrow batch.

    Exact-parity notes (pinned by tests/test_tokenops.py against
    ``tokens_cols`` including negative and >= 10^12 indexes):
    - the ``_tmod`` helper is the TRUNCATED modulus (sign of the
      dividend), i.e. Spark's ``%`` — Python's ``%``/np ``%`` floor-mod
      would diverge on negative indexes (whose n_tok <= 0 must yield an
      empty array but a NEGATIVE n_tok column, exactly like the guard in
      tokens_cols);
    - Spark ``lpad(s, 12, '0')`` also TRUNCATES to 12 chars — mirrored
      with utf8_lpad + a leftmost-12 slice;
    - the source CASE's first-match-below-threshold equals
      ``searchsorted(thresholds, r, side='right')`` (negative r falls in
      the first bucket, like the CASE).

    ``columns`` selects which of ``doc_id, tokens, n_tok, source,
    n_distinct`` to emit — the kernel computes only what is requested
    (an opaque kernel defeats Catalyst column pruning, guide §4.1).
    ``n_distinct`` is a DERIVED column: the per-row count of distinct
    token values (== ``size(array_distinct(tokens))``), computed where
    the flat values already live so a quality-style consumer never ships
    the arrays at all."""
    import numpy as np

    def _tmod(a, m):
        # truncated modulus (Spark %) built on floor-mod: np.fmod handles
        # the sign correctly but is ~9x slower than % on int64 (measured);
        # adjust the negative-dividend remainders only when any exist
        r = a % m
        if (a < 0).any():
            r = np.where((a < 0) & (r != 0), r - m, r)
        return r

    VALID = ["doc_id", "tokens", "n_tok", "source", "n_distinct"]
    cols = list(columns) if columns is not None else VALID[:4]
    bad = [c for c in cols if c not in VALID]
    if bad:
        raise ValueError(f"synth_tokens_arrow: unknown columns {bad}")
    types = {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
        "n_distinct": "int",
    }
    need_vals = "tokens" in cols or "n_distinct" in cols

    def kernel(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        names = np.array([name for _, name in SOURCE_BUCKETS], dtype=object)
        thresh = np.array([t for t, _ in SOURCE_BUCKETS], dtype=np.int64)
        for batch in it:
            i = np.asarray(batch.column(0)).astype(np.int64)
            im = _tmod(i, M)
            n_tok = _tmod(_tmod(im * 48271 + 11, M), max_len) + 1
            lens = np.maximum(n_tok, 0)
            total = int(lens.sum())
            if need_vals and total:
                j = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(lens) - lens, lens)
                    + 1
                )
                v = _tmod(np.repeat(im * 48271 + 13, lens) + j * 16807, M)
                v = _tmod(_tmod(v * 48271, M), MAX_TOKEN)
            else:
                v = np.array([], dtype=np.int64)
            out = {}
            if "doc_id" in cols:
                padded = pc.utf8_lpad(pc.cast(batch.column(0), pa.string()), 12, "0")
                out["doc_id"] = pc.binary_join_element_wise(
                    pa.scalar("doc-"), pc.utf8_slice_codeunits(padded, 0, 12), ""
                )
            if "tokens" in cols:
                offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
                out["tokens"] = pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()),
                    pa.array(v.astype(np.int32), type=pa.int32()),
                )
            if "n_tok" in cols:
                out["n_tok"] = pa.array(n_tok.astype(np.int32))
            if "source" in cols:
                r = _tmod(_tmod(im * 16807 + 7, M), 100)
                out["source"] = pa.array(names[np.searchsorted(thresh, r, side="right")])
            if "n_distinct" in cols:
                if total:
                    # tokens are < MAX_TOKEN < 2^16 by construction, so
                    # (row, value) packs into ONE int64 sort key — a single
                    # np.sort is ~5x faster than the 2-key lexsort
                    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
                    key = np.sort((row_idx << 16) | v)
                    new = np.empty(total, dtype=bool)
                    new[0] = True
                    np.not_equal(key[1:], key[:-1], out=new[1:])
                    nd = np.bincount(key[new] >> 16, minlength=len(lens))
                else:
                    nd = np.zeros(len(lens), dtype=np.int64)
                out["n_distinct"] = pa.array(nd.astype(np.int32))
            yield pa.RecordBatch.from_arrays([out[c] for c in cols], names=cols)

    return ids.mapInArrow(
        kernel, ", ".join(f"{c} {types[c]}" for c in cols)
    )


def tokens_from_events(
    spark: SparkSession,
    sf_dir: str,
    max_len: int = 128,
    columns: list[str] | None = None,
) -> DataFrame:
    """Oracle-checkable synthesis keyed on events.event_id, so the row count
    tracks the driver's scale factor and DuckDB can re-derive it. Runs
    through :func:`synth_tokens_arrow` (bit-identical to the Catalyst
    ``tokens_cols``; see its parity notes).

    ``columns`` prunes the synthesis: an opaque kernel defeats Catalyst's
    column pruning (guide §4.1), so a consumer that doesn't need the
    ``tokens`` array would otherwise pay the full array materialization +
    Arrow transfer (measured: tokens_length_stats 0.5 -> 3.1 s at sf1.0
    when the kernel path shipped the arrays it never reads). Without
    ``tokens`` in ``columns`` the scalar columns come straight from the
    Catalyst expressions — JVM-only, fully pruned."""
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ids = ev.select(F.col("event_id").cast("bigint").alias("id"))
    if columns is not None and "tokens" not in columns and "n_distinct" not in columns:
        # JVM-only pruned path: the scalar columns are plain Catalyst
        # expressions, no array materialization, no Python boundary
        return ids.select(*tokens_cols(F.col("id"), max_len)).select(*columns)
    return synth_tokens_arrow(ids, max_len, columns=columns)
