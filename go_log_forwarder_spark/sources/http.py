"""http input (S6): line-split ingestion of POSTed bodies.

Reference (internal/input/http/http.go:91-150): POST body split on ``\\n``;
each line gets its trailing ``\\r`` trimmed (TrimSuffix, NOT TrimSpace —
unlike tail); empty lines are skipped and — unlike tail — NOT counted
(``linenumber++`` happens after the skip, http.go:127-133). The response
reports the processed-line count (our rows_in metric analog).

Spark realization: the body arrives as a string column (from any transport
table); ``split`` + ``filter``-aware numbering reproduce the exact line_num
assignment. The 5 MB body cap (http.go:20,99-101) is enforced declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BODY_BYTES = 5 * 1024 * 1024  # http.go:20


def http_body_lines(
    df: DataFrame,
    body_col: str = "body",
    source_col: str = "remote_addr",
    tag: str = "",
    host: str = "spark",
    input_source: str = "http",
    enforce_cap: bool = True,
) -> DataFrame:
    """One row per non-empty line with http.go's numbering: line_num counts
    only NON-empty lines, in order."""
    body = F.col(body_col)
    if enforce_cap:
        df = df.filter(F.octet_length(body) <= MAX_BODY_BYTES)  # 413 analog
    # trim exactly one trailing \r per line (TrimSuffix, not TrimSpace)
    lines = F.transform(
        F.split(body, "\n"), lambda s: F.regexp_replace(s, "\r$", "")
    )
    nonempty = F.filter(lines, lambda s: F.length(s) > 0)
    exploded = df.select(
        F.col(source_col).alias("source"),
        F.posexplode(nonempty).alias("idx", "raw"),
    )
    return (
        exploded.select(
            "raw",
            "source",
            (F.col("idx") + 1).cast("long").alias("line_num"),
        )
        .withColumn("tag", F.lit(tag))
        .withColumn("host", F.lit(host))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )


def processed_lines_response(df: DataFrame, source_col: str = "source") -> DataFrame:
    """http.go:148-149 'Successfully processed %d lines' — per request."""
    return df.groupBy(source_col).agg(F.count(F.lit(1)).alias("lines_processed"))
