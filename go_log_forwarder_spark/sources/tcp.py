"""tcp input (S5): socket stream source.

Reference (internal/input/tcp/tcp.go): a TCP listener where each Read()
chunk becomes ONE event — no line splitting (tcp.go:115-209), 64 KB buffer,
<=50 connections, 10-minute idle timeout, and load-shedding when the
pipeline is full (tcp.go:199-205).

Spark mapping (SURVEY §2.1-S5):
- :func:`tcp_chunks` replicates the reference's per-Read EVENT SEMANTICS as
  a batch transform: a connection's byte stream becomes one event per
  consecutive ``buffer_size`` chunk (tcp.go:163-208) — NO line splitting,
  no trimming, ``line_num`` = 1-based chunk counter (tcp.go:186-194), and
  empty reads emit nothing (the ``n > 0`` guard, tcp.go:186).
- :func:`tcp_stream` wraps Spark's dev-only socket source for live use.
  Divergences (documented): the socket source splits on newlines (use
  tcp_chunks on reassembled bodies for chunk parity) and never sheds load
  (SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUFFER_SIZE = 64 * 1024  # tcp.go:19
DEFAULT_MAX_CONNS = 50  # tcp.go:21
DEFAULT_IDLE_TIMEOUT_S = 600  # tcp.go:20


def tcp_chunks(
    df: DataFrame,
    body_col: str = "body",
    source_col: str = "remote_addr",
    buffer_size: int = DEFAULT_BUFFER_SIZE,
    tag: str = "",
    host: str = "spark",
    input_source: str = "tcp",
) -> DataFrame:
    """One event per ``buffer_size`` chunk of each connection body.

    ``df`` holds one row per connection: (body_col string, source_col).
    Mirrors tcp.go:163-208: raw = the chunk AS-IS (newlines inside a chunk
    stay inside it; nothing is trimmed), line_num counts chunks from 1,
    empty bodies emit no events. Chunking is by CHARACTER here (Spark
    string semantics); the reference chunks bytes — identical for the
    ASCII log corpora both systems test with, and a ``binary`` body column
    would use the same plan shape.

    Pure Catalyst — one narrow pass, no shuffle, no Python. Chunking mode
    is width-dependent (round-7 measurement): per-chunk ``substr`` is
    QUADRATIC in chunk count (UTF8String locates a char position by
    scanning from the string start, so chunk i pays an O(i*width) scan —
    5.5 s of the sf1.0 tcp row at width 40), while the Java-regex
    fixed-width split ``(?<=\\G.{w})`` is one linear scan with an
    O(width) lookbehind check per boundary. Small widths therefore take
    the split (O(n*width) total); large widths keep the substr form
    (O(n^2/width) — few chunks, and a 64 KB-length lookbehind would be
    the slower side). Both modes produce identical chunks.
    """
    if buffer_size < 1:
        raise ValueError(f"buffer_size must be >= 1, got {buffer_size}")
    body = F.col(body_col)
    if buffer_size <= 4096:
        # (?s): chunks must cross newlines — dot matches all. A body whose
        # length is an exact multiple of the width splits with one trailing
        # EMPTY element (Spark split keeps trailing empties); real chunks
        # are never empty, so dropping empties removes exactly that
        # artifact and nothing else.
        chunks = F.filter(
            F.split(body, "(?s)(?<=\\G.{" + str(buffer_size) + "})"),
            lambda c: F.length(c) > 0,
        )
    else:
        n = F.ceil(F.length(body) / F.lit(buffer_size)).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: body.substr((i - 1) * buffer_size + 1, F.lit(buffer_size)),
        )
    chunk_list = F.when(F.length(body) > 0, chunks).otherwise(
        F.array().cast("array<string>")
    )
    lines = df.select(
        F.col(source_col).alias("source"),
        F.posexplode(chunk_list).alias("idx", "raw"),
    )
    return (
        lines.select("raw", "source", (F.col("idx") + 1).cast("long").alias("line_num"))
        .withColumn("tag", F.lit(tag))
        .withColumn("host", F.lit(host))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )


def tcp_stream(
    spark: SparkSession,
    host: str = "localhost",
    port: int = 9999,
    tag: str = "",
    input_source: str = "tcp",
) -> DataFrame:
    """Streaming socket source (dev-only; see module docstring)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(F.col("value").alias("raw"))
        .filter(F.length(F.trim(F.col("raw"))) > 0)
        .withColumn("source", F.lit(f"{host}:{port}"))
        .withColumn("tag", F.lit(tag))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )
