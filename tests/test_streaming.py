"""Streaming variant: foreachBatch fan-out reusing the batch pipeline;
checkpointed restart processes only new files (exactly-once)."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_log_forwarder_spark.functions.filters import GrepFilter
from go_log_forwarder_spark.functions.parsers import JsonParser, ParserChain
from go_log_forwarder_spark.operators.routing import SinkSpec
from go_log_forwarder_spark.streaming.pipeline import run_foreach_batch, stream_events

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("raw", T.StringType()),
        T.StructField("tag", T.StringType()),
        T.StructField("ingest_time", T.TimestampType()),
    ]
)

SINKS = [SinkSpec("all", "*"), SinkSpec("err", "evt-err*")]


def _mk_batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        F.concat(F.lit('{"k":'), F.col("id").cast("string"), F.lit("}")).alias("raw"),
        F.when(F.col("id") % 3 == 0, F.lit("evt-error")).otherwise(F.lit("evt-ok")).alias("tag"),
        F.lit(datetime.datetime(2024, 1, 1)).alias("ingest_time"),
    )


def _pipeline(df):
    parsed = ParserChain([JsonParser()]).apply(df)
    return GrepFilter(op="and", include=('"k":[0-9]+}',)).apply(parsed)


def test_stream_fanout_and_restart(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _mk_batch(spark, 0, 50).coalesce(1).write.mode("append").parquet(indir)

    q = run_foreach_batch(
        stream_events(spark, indir, SCHEMA), _pipeline, SINKS, outdir, ckpt
    )
    q.processAllAvailable()
    q.stop()
    all1 = spark.read.parquet(f"{outdir}/all").count()
    err1 = spark.read.parquet(f"{outdir}/err").count()
    assert all1 == 50
    assert err1 == len([i for i in range(50) if i % 3 == 0])

    # more files arrive; restart from checkpoint -> only new data processed
    _mk_batch(spark, 50, 80).coalesce(1).write.mode("append").parquet(indir)
    q2 = run_foreach_batch(
        stream_events(spark, indir, SCHEMA), _pipeline, SINKS, outdir, ckpt
    )
    q2.processAllAvailable()
    q2.stop()
    ids = sorted(r["id"] for r in spark.read.parquet(f"{outdir}/all").select("id").collect())
    assert ids == list(range(80))  # no dup, no loss across restart
