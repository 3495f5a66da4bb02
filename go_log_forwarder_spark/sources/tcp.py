"""tcp input (S5): socket stream source.

Reference (internal/input/tcp/tcp.go): a TCP listener where each Read()
chunk becomes ONE event — no line splitting (tcp.go:115-209), 64 KB buffer,
<=50 connections, 10-minute idle timeout, and load-shedding when the
pipeline is full (tcp.go:199-205).

Spark mapping (SURVEY §2.1-S5): the socket source is dev-only in Spark (no
fault-tolerance guarantees) and the graft models tcp traffic as just
another ``source`` value in the sequence table; this module exists for
API-surface completeness. Divergences (documented): Spark's socket source
splits on newlines (the reference emits per-Read chunks) and never sheds
load (SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUFFER_SIZE = 64 * 1024  # tcp.go:19
DEFAULT_MAX_CONNS = 50  # tcp.go:21
DEFAULT_IDLE_TIMEOUT_S = 600  # tcp.go:20


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
