"""Parser parity tests — golden cases ported from the reference's own
tables (internal/parser/regex/regex_test.go, internal/parser/json/json_test.go)
plus the FIXTURES.md F3 table, run against the Spark kernels and
cross-checked against the pure-Python oracle."""

import datetime

import pytest
from pyspark.sql import functions as F

from go_log_forwarder_spark import oracle
from go_log_forwarder_spark.functions.parsers import (
    JsonParser,
    ParserChain,
    RegexParser,
    go_layout_to_spark,
)

INGEST = datetime.datetime(2020, 1, 1, 0, 0, 0)


def _run_chain(spark, raws, parsers):
    df = spark.createDataFrame(
        [(r, INGEST) for r in raws], "raw string, ingest_time timestamp"
    )
    out = ParserChain(parsers).apply(df)
    rows = out.orderBy("raw").collect()
    return {r["raw"]: r for r in rows}


# --- regex parser (regex_test.go:87-167) ---------------------------------


def test_regex_named_groups(spark):
    p = RegexParser(pattern=r"(?P<level>\w+)\s+(?P<message>.+)")
    rows = _run_chain(spark, ["INFO this is a test message"], [p])
    r = rows["INFO this is a test message"]
    assert r["parsed"] == {"level": "INFO", "message": "this is a test message"}
    assert r["parser"] == "regex"
    assert r["event_time"] == INGEST  # no TimeKey -> ingest time kept


def test_regex_timestamp_extraction(spark):
    p = RegexParser(
        pattern=r"(?P<timestamp>\S+)\s+(?P<level>\w+)\s+(?P<message>.+)",
        time_key="timestamp",
    )
    rows = _run_chain(spark, ["2024-02-20T15:04:05Z INFO test message"], [p])
    r = rows["2024-02-20T15:04:05Z INFO test message"]
    assert r["parsed"]["level"] == "INFO"
    assert r["event_time"] == datetime.datetime(2024, 2, 20, 15, 4, 5)


@pytest.mark.parametrize(
    "allow_empty,expected",
    [
        (False, {"message": "test"}),
        (True, {"level": "", "message": "test"}),
    ],
)
def test_regex_allow_empty(spark, allow_empty, expected):
    # regex_test.go:128-155 — AllowEmpty both ways on ' test'
    p = RegexParser(pattern=r"(?P<level>\w*)\s+(?P<message>.*)", allow_empty=allow_empty)
    rows = _run_chain(spark, [" test"], [p])
    assert rows[" test"]["parsed"] == expected


def test_regex_no_match_row_kept(spark):
    # regex_test.go:156-166 + engine.go:93-97: no match -> parsed NULL, row kept
    p = RegexParser(pattern=r"(?P<level>ERROR)\s+(?P<message>.+)")
    rows = _run_chain(spark, ["INFO test message"], [p])
    r = rows["INFO test message"]
    assert r["parsed"] is None
    assert r["parser"] is None
    assert r["event_time"] == INGEST


def test_regex_init_validation():
    # regex_test.go:50-56: invalid pattern fails Init
    with pytest.raises(Exception):
        RegexParser(pattern="[invalid")
    with pytest.raises(ValueError):
        go_layout_to_spark("invalid")


# --- json parser (json_test.go:11-66) ------------------------------------


def test_json_valid_and_time(spark):
    raw = '{"timestamp":"2024-02-20T15:04:05Z","message":"test log"}'
    p = JsonParser(time_key="timestamp")
    rows = _run_chain(spark, [raw], [p])
    r = rows[raw]
    assert r["parsed"] == {"timestamp": "2024-02-20T15:04:05Z", "message": "test log"}
    assert r["event_time"] == datetime.datetime(2024, 2, 20, 15, 4, 5)
    assert r["parser"] == "json"


@pytest.mark.parametrize("raw", ['{"invalid json', "", "[1,2]", "42"])
def test_json_invalid_kept_unparsed(spark, raw):
    rows = _run_chain(spark, [raw or " "], [JsonParser()])
    r = rows[raw or " "]
    assert r["parsed"] is None
    assert r["parser"] is None


def test_json_empty_object_matches(spark):
    rows = _run_chain(spark, ["{}"], [JsonParser()])
    assert rows["{}"]["parsed"] == {}
    assert rows["{}"]["parser"] == "json"


def test_json_nested_preserved(spark):
    # json_test.go:53-65: nested map preserved (as its JSON text in the
    # map<string,string> parity view)
    raw = '{"data":{"nested":"value"},"message":"test"}'
    rows = _run_chain(spark, [raw], [JsonParser()])
    assert rows[raw]["parsed"] == {"data": '{"nested":"value"}', "message": "test"}


def test_json_time_parse_failure_keeps_ingest(spark):
    # parser.go:17-19: time parse failure silently keeps old timestamp
    raw = '{"timestamp":"not-a-time","m":"x"}'
    rows = _run_chain(spark, [raw], [JsonParser(time_key="timestamp")])
    assert rows[raw]["event_time"] == INGEST
    assert rows[raw]["parser"] == "json"


# --- chain: first match wins (engine.go:93-97) ----------------------------


def test_chain_first_match_wins(spark):
    raws = [
        '{"k":"v"}',  # json wins (tried first)
        "INFO hello world",  # regex wins
        "{invalid and no regex match~~",  # neither -> kept raw
    ]
    chain = [
        JsonParser(),
        RegexParser(pattern=r"^(?P<level>[A-Z]+)\s+(?P<message>.+)$"),
    ]
    rows = _run_chain(spark, raws, chain)
    assert rows['{"k":"v"}']["parser"] == "json"
    assert rows["INFO hello world"]["parser"] == "regex"
    assert rows["INFO hello world"]["parsed"] == {"level": "INFO", "message": "hello world"}
    assert rows["{invalid and no regex match~~"]["parser"] is None
    assert rows["{invalid and no regex match~~"]["parsed"] is None


def test_chain_vs_oracle(spark):
    """Property-ish: chain result equals the pure-Python oracle on a mixed
    corpus (values rendered to the map<string,string> parity view)."""
    raws = [
        '{"a":"1","b":"two"}',
        '{"n": 7}',
        "ERROR boom",
        "plain text line",
        '{"nested":{"x":"y"}}',
        "WARN   spaced",
        "{bad json",
    ]
    chain = [
        JsonParser(),
        RegexParser(pattern=r"^(?P<level>[A-Z]+)\s+(?P<message>.+)$"),
    ]
    got = _run_chain(spark, raws, chain)
    for raw in raws:
        ev = oracle.Event(raw=raw)
        name = oracle.parser_chain(
            ev,
            [
                ("json", lambda e: oracle.json_parse(e)),
                (
                    "regex",
                    lambda e: oracle.regex_parse(e, r"^(?P<level>[A-Z]+)\s+(?P<message>.+)$"),
                ),
            ],
        )
        assert got[raw]["parser"] == name, raw
        if ev.parsed is None:
            assert got[raw]["parsed"] is None
        else:
            # oracle holds typed values; spark view holds their JSON text
            want = {
                k: (
                    v
                    if isinstance(v, str)
                    else oracle.go_json_marshal(v)
                )
                for k, v in ev.parsed.items()
            }
            assert got[raw]["parsed"] == want, raw


def test_json_null_line_is_a_match(spark):
    # json.go:44-49: json.Unmarshal("null", &map) SUCCEEDS with a nil map,
    # so a bare 'null' line is a json MATCH (NULL parsed data, canonical
    # 'null') and must NOT fall through to later parsers in a chain.
    chain = [JsonParser(), RegexParser(pattern=r"^(?P<word>[a-z]+)$")]
    rows = _run_chain(spark, ["null", " null ", "nullish"], chain)
    for raw in ("null", " null "):
        assert rows[raw]["parser"] == "json", raw
        assert rows[raw]["parsed"] is None, raw
        assert rows[raw]["canonical"] == "null", raw
    # 'nullish' is NOT valid JSON -> falls through to the regex parser
    assert rows["nullish"]["parser"] == "regex"
    assert rows["nullish"]["parsed"] == {"word": "nullish"}
