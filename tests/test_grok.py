"""Grok pattern compilation + parse via the vectorized kernel."""

import datetime

import pytest
from pyspark.sql import functions as F

from go_log_forwarder_spark.functions.grok import grok_parser, grok_to_regex
from go_log_forwarder_spark.functions.parsers import ParserChain


def test_grok_to_regex_named_and_unnamed():
    r = grok_to_regex("%{INT:n} of %{INT}")
    assert r == r"(?P<n>[+-]?(?:[0-9]+)) of (?:[+-]?(?:[0-9]+))"


def test_grok_unknown_pattern():
    with pytest.raises(ValueError, match="unknown grok pattern"):
        grok_to_regex("%{NOPE:x}")


def test_grok_extra_patterns():
    r = grok_to_regex("%{MYID:id}", extra_patterns={"MYID": r"X-\d+"})
    assert r == r"(?P<id>X-\d+)"


def test_grok_parse_end_to_end(spark):
    raws = [
        '203.0.113.9 GET /api/v1/items 200 "fast"',
        "no match here",
    ]
    df = spark.createDataFrame(
        [(r, datetime.datetime(2020, 1, 1)) for r in raws],
        "raw string, ingest_time timestamp",
    )
    p = grok_parser(
        "%{IPV4:ip} %{HTTPMETHOD:method} %{URIPATH:path} %{INT:status}"
    )
    rows = {r["raw"]: r for r in ParserChain([p]).apply(df).collect()}
    assert rows[raws[0]]["parsed"] == {
        "ip": "203.0.113.9",
        "method": "GET",
        "path": "/api/v1/items",
        "status": "200",
    }
    assert rows["no match here"]["parsed"] is None


def test_grok_timestamp_extraction(spark):
    df = spark.createDataFrame(
        [("2024-02-20T15:04:05Z ERROR boom", datetime.datetime(2020, 1, 1))],
        "raw string, ingest_time timestamp",
    )
    p = grok_parser(
        "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{GREEDYDATA:msg}",
        time_key="ts",
    )
    r = ParserChain([p]).apply(df).head()
    assert r["parsed"]["level"] == "ERROR"
    assert r["event_time"] == datetime.datetime(2024, 2, 20, 15, 4, 5)
