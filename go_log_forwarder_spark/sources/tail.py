"""tail input (S1-S4): file-glob line source.

Reference (internal/input/tail/tail.go): polls a glob every 100 ms, reads
new lines from the saved offset, TrimSpaces each line, counts EVERY line
(LastReadLine++ happens before the empty check, tail.go:449-453), skips
empties, emits one Event per non-empty line with (path, line_num).

Spark realization:
- **Batch**: ``wholetext`` read + ``posexplode(split(...))`` — exact
  per-file line numbers (a plain ``spark.read.text`` can split one file
  across partitions, losing stable numbering). For log files up to the
  100 MB class this is the right tool; bigger inputs arrive through the
  tokens/Iceberg path anyway.
- **Streaming**: ``spark.readStream.text(dir)`` — Spark's file source does
  discovery + offset/checkpoint tracking natively, subsuming the reference's
  stat-loop, inode bookkeeping, debounce and SQLite offsets
  (tail.go:201-355, repository.go). Rotation/truncation (S3) has no analog
  for immutable inputs; see plans/lineage.py for the reprocess story.
- Metadata stamping (S7, input/input.go:16-21): tag/host/input_source
  literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Go strings.TrimSpace trims everything unicode.IsSpace accepts — notably
# \r (CRLF files), \t, \v, \f, NEL (U+0085) and NBSP (U+00A0) — while
# Spark's F.trim strips ASCII space only. Java regex \s is [ \t\n\x0B\f\r];
# the class below adds the two unicode members Go also trims.
_SPACE_CLASS = "[\\s\\u0085\\u00A0]"


def trim_space(col: Column) -> Column:
    """strings.TrimSpace parity (tail.go:448): trim ALL leading/trailing
    whitespace, not just ASCII spaces."""
    return F.regexp_replace(col, f"^{_SPACE_CLASS}+|{_SPACE_CLASS}+$", "")


def tail_batch(
    spark: SparkSession,
    glob: str,
    tag: str = "",
    host: str = "spark",
    input_source: str = "tail",
) -> DataFrame:
    """One row per non-empty trimmed line: (raw, source, line_num, tag,
    host, input_source, ingest_time). line_num counts empty lines too
    (tail.go:449-453 semantics)."""
    files = spark.read.format("text").option("wholetext", "true").load(glob)
    lines = files.select(
        F.input_file_name().alias("source"),
        F.posexplode(F.split(F.col("value"), "\n")).alias("idx", "line"),
    )
    return (
        lines.select(
            trim_space(F.col("line")).alias("raw"),
            "source",
            (F.col("idx") + 1).cast("long").alias("line_num"),
        )
        .filter(F.length("raw") > 0)
        .withColumn("tag", F.lit(tag))
        .withColumn("host", F.lit(host))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )


def tail_stream(
    spark: SparkSession,
    directory: str,
    tag: str = "",
    host: str = "spark",
    input_source: str = "tail",
) -> DataFrame:
    """Streaming variant: line-per-row text stream; file discovery and
    offsets are Spark's (no per-file line numbers across splits — the
    streaming checkpoint replaces them as the resume token)."""
    return (
        spark.readStream.text(directory)
        .select(trim_space(F.col("value")).alias("raw"))
        .filter(F.length("raw") > 0)
        .withColumn("source", F.lit(directory))
        .withColumn("tag", F.lit(tag))
        .withColumn("host", F.lit(host))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )
