"""Tag wildcard matching parity.

Truth table ported verbatim from the reference's
internal/util/util_test.go:10-24, checked against all three
implementations: pure-Python oracle, compiled Spark Column, and the
DuckDB-SQL rendering the oracle harness uses.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_log_forwarder_spark.functions.tags import (
    compile_tag_pattern,
    tag_match_py,
)

# (name, input_tag, match, want) — util_test.go:10-24
REFERENCE_CASES = [
    ("Exact match", "foo", "foo", True),
    ("Prefix match", "foobar", "foo*", True),
    ("Suffix match", "foobar", "*bar", True),
    ("Middle match", "foobarbaz", "foo*baz", True),
    ("Multiple wildcards", "foobarbaz", "f*bar*baz", True),
    ("No match", "foobar", "baz*", False),
    ("Empty pattern", "foobar", "", False),
    ("Empty input", "", "*", True),
    # extra edge cases pinned against the Go algorithm
    ("Empty both", "", "", True),
    ("Star matches all", "anything", "*", True),
    ("Infix only", "xbarx", "*bar*", True),
    ("Infix miss", "xbax", "*bar*", False),
    ("Ordered parts", "bazbarfoo", "foo*baz", False),
    ("Overlap", "abab", "ab*ab", True),
    ("Overlap short", "ab", "ab*ab", False),
    ("Double star adjacent", "foobar", "foo**bar", True),
    ("Double star hit", "fooxbar", "foo**bar", True),
    # wildcard-free is prefix+suffix, NOT equality (util.go:25-33; found by
    # hypothesis property testing)
    ("Presuf overlap", "aa", "a", True),
    ("Presuf repeat", "abxab", "ab", True),
    ("Presuf miss", "abxba", "ab", False),
]


@pytest.mark.parametrize("name,tag,match,want", REFERENCE_CASES)
def test_tag_match_py(name, tag, match, want):
    assert tag_match_py(tag, match) is want


def test_tag_match_spark(spark):
    df = spark.createDataFrame([(t,) for _, t, _, _ in REFERENCE_CASES], "tag string")
    for name, tag, match, want in REFERENCE_CASES:
        got = (
            df.filter(F.col("tag") == tag)
            .select(compile_tag_pattern(match).column(F.col("tag")).alias("m"))
            .head()[0]
        )
        assert bool(got) is want, f"{name}: spark({tag!r},{match!r})={got}"


@pytest.mark.parametrize("name,tag,match,want", REFERENCE_CASES)
def test_tag_match_duckdb(name, tag, match, want):
    pred = compile_tag_pattern(match).duckdb_sql("tag")
    got = duckdb.sql(
        f"select {pred} from (select '{tag}' as tag)"
    ).fetchone()[0]
    assert bool(got) is want


@settings(max_examples=300, deadline=None)
@given(
    tag=st.text(alphabet="ab-*c", max_size=8),
    match=st.text(alphabet="ab-*c", max_size=6),
)
def test_tag_match_property_py_vs_duckdb(tag, match):
    """The compiled predicate agrees with the Go algorithm on arbitrary
    small inputs (DuckDB render as the cheap-to-exercise engine)."""
    pred = compile_tag_pattern(match).duckdb_sql("tag")
    got = duckdb.execute(
        "select " + pred + " from (select ? as tag)", [tag]
    ).fetchone()[0]
    assert bool(got) is tag_match_py(tag, match)
