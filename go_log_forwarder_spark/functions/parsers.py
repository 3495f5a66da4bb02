"""Parsers: raw log line -> structured map, first-match-wins chain.

Reference semantics:
- json parser (``internal/parser/json/json.go:44-56``): ``json.Unmarshal``
  into ``map[string]any``; returns false (no-op) on anything that is not a
  JSON object; optional timestamp extraction from a parsed key.
- regex parser (``internal/parser/regex/regex.go:58-86``): unanchored
  leftmost search (``FindStringSubmatch``); named capture groups become the
  parsed map; ``AllowEmpty=false`` drops empty-string groups
  (``regex.go:69-76``); no-match -> false.
- time extraction (``internal/parser/parser.go:14-22``): parse
  ``parsed[time_key]`` with a Go reference-time layout; on success overwrite
  the event timestamp, on failure silently keep the old one.
- chain (``internal/engine/engine.go:93-97``): parsers run in config order,
  the FIRST match wins; if none matches the raw row continues down the
  pipeline with NULL parsed data.

Spark realization: the json path is pure Catalyst (``from_json``); the regex
path is a vectorized pandas UDF (Arrow-batched — the only Python in the hot
path, looping only inside the UDF body over a pandas Series); the chain is a
``coalesce`` over per-parser struct results, which Catalyst folds into one
projection.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit Go-layout -> Spark-pattern overrides. These take precedence over
# the token compiler below (they pin behavior the round-1 suite verified);
# everything else goes through :func:`go_layout_to_spark`'s token-by-token
# translation of the Go reference time (parser.go:14-22 accepts ANY layout).
GO_TO_SPARK_TIME_LAYOUTS: dict[str, str] = {
    "2006-01-02T15:04:05Z07:00": "yyyy-MM-dd'T'HH:mm:ssXXX",  # RFC3339 (default)
    "2006-01-02T15:04:05.999999999Z07:00": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",
    "2006-01-02 15:04:05": "yyyy-MM-dd HH:mm:ss",
    "2006-01-02": "yyyy-MM-dd",
    "02/Jan/2006:15:04:05 -0700": "dd/MMM/yyyy:HH:mm:ss Z",  # apache CLF
    "Jan  2 15:04:05": "MMM d HH:mm:ss",  # syslog (no year)
    "15:04:05": "HH:mm:ss",
}

GO_RFC3339 = "2006-01-02T15:04:05Z07:00"

PARSED_TYPE = T.MapType(T.StringType(), T.StringType())

# Go reference-time tokens -> java.time pattern letters, longest-first.
# None = recognized Go token with no faithful java.time equivalent ->
# ValueError (loud-on-unknown, SURVEY §7.3 item 5: silently mis-parsing
# timestamps is worse than rejecting a config).
_GO_TIME_TOKENS: list[tuple[str, str | None]] = sorted(
    [
        ("2006", "yyyy"),
        ("06", "yy"),
        ("January", "MMMM"),
        ("Jan", "MMM"),
        ("01", "MM"),
        ("1", "M"),
        ("Monday", "EEEE"),
        ("Mon", "EEE"),
        ("02", "dd"),
        ("_2", "d"),  # space-padded day: java.time has no pad modifier here
        ("2", "d"),
        ("002", "DDD"),
        ("__2", "D"),
        ("15", "HH"),
        ("03", "hh"),
        ("3", "h"),
        ("04", "mm"),
        ("4", "m"),
        ("05", "ss"),
        ("5", "s"),
        ("PM", "a"),
        # java.time 'a' only parses upper-case AM/PM; go_time_parse
        # upper-cases the meridiem in the VALUE when the layout used 'pm'
        ("pm", "a"),
        ("MST", "zzz"),
        # second-precision zones (round 4): java.time XXXX/xxxx parse
        # ±HHmmss (XXXX also 'Z'), XXXXX/xxxxx the colon forms — slightly
        # LENIENT vs Go: the seconds are optional on the java side where
        # Go's 6/8-char tokens require them
        ("Z07:00:00", "XXXXX"),
        ("Z070000", "XXXX"),
        ("Z07:00", "XXX"),
        ("Z0700", "XX"),
        ("Z07", "X"),
        ("-07:00:00", "xxxxx"),
        ("-070000", "xxxx"),
        ("-07:00", "xxx"),
        ("-0700", "xx"),
        ("-07", "x"),
    ],
    key=lambda kv: -len(kv[0]),
)

_JAVA_QUOTE_NEEDED = re.compile(r"[a-zA-Z'\[\]#{}]")


def _quote_literal(run: str) -> str:
    """Quote a literal run for java.time patterns (letters and the reserved
    punctuation must be quoted; ' escapes as '')."""
    if any(c.isdigit() for c in run):
        # a bare digit in a Go layout is (mis)read by Go itself as part of a
        # reference-time number — refuse rather than silently mis-parse
        raise ValueError(f"literal digits in Go time layout run {run!r}")
    if _JAVA_QUOTE_NEEDED.search(run):
        return "'" + run.replace("'", "''") + "'"
    return run


def go_layout_to_spark(layout: str) -> str:
    """Translate a Go reference-time layout to a Spark datetime pattern.

    Token-by-token compilation of the Go reference time
    ``Mon Jan 2 15:04:05 MST 2006``: longest-match tokens map to java.time
    letters, literal runs are quoted, and fractional seconds translate as
    ``.000...`` -> ``.SSS...`` (exact digits) / ``.999...`` -> ``[.SSS...]``
    (optional — Go drops the fraction entirely when zero; note java.time
    still requires the full digit count WHEN present, a documented
    divergence for Go's trailing-zero trimming). Second-precision zone
    offsets map since round 4 (``Z070000`` -> ``XXXX``, ``-07:00:00`` ->
    ``xxxxx`` etc. — java accepts the secondless forms too, a documented
    leniency); any token still without a java.time equivalent raises
    ``ValueError`` — the reference silently keeps the old timestamp on
    parse failure (parser.go:17-19), but a config-time unknown layout is a
    build error here.

    Documented divergences: two-digit years 69-99 pivot to 19xx in Go but
    20xx in java.time; ``.999`` fractions must carry the full digit count
    when present (Go trims trailing zeros). Go's ``_2`` space-padding and
    lower-case ``pm`` are handled by :func:`go_time_parse` (value-side pad
    collapse / meridiem upper-casing — the latter is slightly LENIENT:
    Go's ``pm`` rejects an upper-case "PM" value, this parser accepts it) —
    the bare pattern from this function alone expects an unpadded day and
    an upper-case meridiem.
    """
    if layout in GO_TO_SPARK_TIME_LAYOUTS:
        return GO_TO_SPARK_TIME_LAYOUTS[layout]
    out: list[str] = []
    lit: list[str] = []
    n_tokens = 0
    i = 0
    while i < len(layout):
        # fractional seconds: .0000 (fixed) / .9999 (optional)
        m = re.match(r"[.,](0+|9+)", layout[i:])
        if m:
            if lit:
                out.append(_quote_literal("".join(lit)))
                lit = []
            digits = m.group(1)
            sep = layout[i]
            frac = "'" + sep + "'" if sep == "," else sep
            if digits[0] == "0":
                out.append(frac + "S" * len(digits))
            else:
                out.append("[" + frac + "S" * len(digits) + "]")
            n_tokens += 1
            i += 1 + len(digits)
            continue
        for tok, pat in _GO_TIME_TOKENS:
            if layout.startswith(tok, i):
                if pat is None:
                    raise ValueError(
                        f"Go time token {tok!r} in layout {layout!r} has no "
                        "faithful Spark/java.time equivalent"
                    )
                if lit:
                    out.append(_quote_literal("".join(lit)))
                    lit = []
                out.append(pat)
                n_tokens += 1
                i += len(tok)
                break
        else:
            lit.append(layout[i])
            i += 1
    if lit:
        out.append(_quote_literal("".join(lit)))
    if n_tokens == 0:
        # all-literal "layouts" are almost certainly a config mistake —
        # loud beats a parser that only ever matches one fixed string
        raise ValueError(f"Go time layout {layout!r} contains no time tokens")
    return "".join(out)


_DAY_NAME_RE = (
    "(Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday"
    "|Mon|Tue|Wed|Thu|Fri|Sat|Sun)"
)


def go_time_parse(raw: Column, go_layout: str) -> Column:
    """Parse a string Column with a Go layout; NULL on value-level failure.

    Spark bans week-based fields ('E') in PARSING patterns, and Go's Parse
    never cross-checks the day name against the date anyway — so for
    layouts containing Mon/Monday the day name is stripped from the value
    and the EEE token dropped from the pattern (information-preserving)."""
    fmt = go_layout_to_spark(go_layout)
    if "EEE" in fmt:
        fmt = fmt.replace("EEEE", "").replace("EEE", "")
        raw = F.regexp_replace(raw, _DAY_NAME_RE, "")
    if "_2" in go_layout:
        # Go renders the _2 / __2 tokens space-PADDED (" 5"); java.time 'd'
        # has no pad modifier, so collapse the pad spaces in the value
        raw = F.regexp_replace(raw, " {2,}(\\d)", " $1")
    if "pm" in go_layout:
        # Go's lower-case 'pm' token parses a lower-case meridiem, which
        # java.time 'a' rejects — upper-case it in the VALUE. Any am/pm text
        # in a layout-valid value IS the meridiem (a literal 'pm' in a Go
        # layout cannot be expressed: it would BE the token), so a blanket
        # replace is safe; invalid values return NULL either way.
        raw = F.regexp_replace(F.regexp_replace(raw, "pm", "PM"), "am", "AM")
    return F.try_to_timestamp(raw, F.lit(fmt))


def extract_time_col(parsed: Column, time_key: str, go_layout: str) -> Column:
    """``ExtractTime`` (parser.go:14-22) as a Column: parsed[time_key]
    parsed with the layout; NULL (caller coalesces with ingest time) on
    failure — mirroring 'keep old timestamp on parse error'."""
    return go_time_parse(parsed.getItem(time_key), go_layout)


@dataclass(frozen=True)
class JsonParser:
    """json parser (json.go:23-56). Produces map<string,string> parity view:
    scalar JSON values are rendered the way Go re-serializes them (numbers
    via float64 -> shortest form, bools as true/false)."""

    name: str = "json"
    time_key: str = ""
    time_format: str = GO_RFC3339

    def parsed_col(self, raw: Column) -> Column:
        # from_json returns NULL for malformed input and for non-object JSON
        # when the target type is a map — matching json.Unmarshal into
        # map[string]any failing on arrays/scalars.
        return F.from_json(raw, PARSED_TYPE)

    def matched_col(self, raw: Column, parsed: Column) -> Column:
        # Go json.Unmarshal("null", &map) SUCCEEDS with a nil map
        # (json.go:44-49), so a bare 'null' line (mod JSON whitespace:
        # space/\t/\n/\r) is a json MATCH with NULL parsed data — it must
        # not fall through to later parsers in a chain.
        return parsed.isNotNull() | raw.rlike("^[ \\t\\r\\n]*null[ \\t\\r\\n]*$")

    def canonical_col(self, raw: Column, parsed: Column) -> Column:
        # Go json.Marshal(json.Unmarshal(raw)): variant round-trip gives
        # sorted keys + preserved types (see functions/filters.py docstring).
        from .filters import canonical_json_from_raw

        return canonical_json_from_raw(raw)

    def time_col(self, parsed: Column) -> Column | None:
        if self.time_key and self.time_format:
            return extract_time_col(parsed, self.time_key, self.time_format)
        return None


def _re2_extractable(pattern: str, group_names: list[str]) -> bool:
    """True when Arrow's C++ RE2 extract_regex can run this pattern: RE2
    syntax (no backrefs/lookaround), all capturing groups NAMED, at least
    one group. RE2 is Go's regexp engine, so reference-legal patterns
    always qualify — the Python fallback only covers python-only syntax or
    unnamed capturing groups."""
    if not group_names:
        return False
    try:
        import pyarrow as pa
        import pyarrow.compute as pc

        pc.extract_regex(pa.array([], type=pa.string()), pattern=pattern)
        return True
    except Exception:  # noqa: BLE001 — any rejection routes to the fallback
        return False


def _compile_regex_struct_udf(
    pattern: str, group_names: list[str], with_canonical: bool = False
):
    """RE2 fast path: the whole batch goes through Arrow's C++
    extract_regex — ZERO per-row Python. Returns struct<name:string,...>
    whose fields are all-NULL exactly when the row did not match (RE2
    non-participating groups yield "", never NULL — Go regex.go:66-77
    parity by construction).

    ``with_canonical`` (round 7) additionally emits the Go
    ``json.Marshal(map[string]string)`` text as a ``__canon`` field,
    built INSIDE the kernel with vectorized replace/join: the post-UDF
    projection that previously assembled it from the map is not
    whole-stage-codegen'd, so its 5-regexp escape chain per key and value
    ran interpreted per row. Key order is the static sort of the group
    names (ASCII, same order Catalyst's array_sort(map_entries) yields);
    escapes and quoting match filters._escape_json_string exactly;
    no-match rows emit NULL."""
    from pyspark.sql import types as T

    fields = [T.StructField(n, T.StringType()) for n in group_names]
    if with_canonical:
        fields.append(T.StructField("__canon", T.StringType()))
    struct_type = T.StructType(fields)

    @F.pandas_udf(struct_type)
    def parse(raw: pd.Series) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(raw, type=pa.string())
        res = pc.extract_regex(arr, pattern=pattern)
        # flatten() ANDs child validity with the struct's: no-match rows
        # come out as NULL in every field
        cols = res.flatten()
        out = {n: c.to_pandas() for n, c in zip(group_names, cols)}
        if with_canonical:
            def esc(c):
                for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                             ("\t", "\\t"), ("\r", "\\r")):
                    c = pc.replace_substring(c, pattern=a, replacement=b)
                return c

            by_name = dict(zip(group_names, cols))
            parts = []
            for i, n in enumerate(sorted(group_names)):
                # '{"k":"' for the first entry, '","k":"' after (closing
                # the previous value's quote before the comma)
                parts.append(pa.scalar(('","' if i else '{"') + n + '":"'))
                parts.append(esc(by_name[n]))
            parts.append(pa.scalar('"}'))
            out["__canon"] = pc.binary_join_element_wise(
                *parts, pa.scalar(""), null_handling="emit_null"
            ).to_pandas()
        return pd.DataFrame(out)

    return parse


def _compile_regex_parse_udf(pattern: str, allow_empty: bool):
    """Build the vectorized regex-parse pandas UDF (Python-re fallback).

    One precompiled regex per executor (closure), applied per Arrow batch.
    Go parity notes:
    - ``FindStringSubmatch`` is an unanchored leftmost search == ``re.search``.
    - Go returns "" for a non-participating group (regex.go:66-77 stores it);
      Python gives None -> normalized to "".
    - ``AllowEmpty=false`` drops keys whose value is "" (regex.go:73-76).
    - Compiled with ``re.ASCII`` so ``\\d``/``\\w``/``\\s``/``\\b`` are
      ASCII-only, exactly like RE2/Go (ADVICE r3): parse results must not
      depend on which kernel ``_re2_extractable`` selects. Go's regexp
      needs ``\\p{...}`` for Unicode classes; so does this fallback (via
      explicit char classes — Python re has no ``\\p``).
    """
    compiled = re.compile(pattern, re.ASCII)
    group_names = [g for g in compiled.groupindex]

    @F.pandas_udf(PARSED_TYPE)
    def parse(raw: pd.Series) -> pd.Series:
        out = []
        for s in raw:
            if s is None:
                out.append(None)
                continue
            m = compiled.search(s)
            if m is None:
                out.append(None)
                continue
            d = {}
            for name in group_names:
                value = m.group(name)
                value = "" if value is None else value
                if allow_empty or value != "":
                    d[name] = value
            out.append(d)
        return pd.Series(out)

    return parse


@dataclass(frozen=True)
class RegexParser:
    """regex parser (regex.go:25-86): named-group extraction into a map.

    Matching semantics are RE2/Go on BOTH kernels: the fast path is Arrow's
    RE2 ``extract_regex``; the Python-re fallback compiles with
    ``re.ASCII`` so ``\\d``/``\\w``/``\\s``/``\\b`` are ASCII-only either
    way (ADVICE r3 — results never depend on kernel selection)."""

    pattern: str
    name: str = "regex"
    allow_empty: bool = True
    time_key: str = ""
    time_format: str = GO_RFC3339

    def __post_init__(self) -> None:
        re.compile(self.pattern)  # Init-time validation (regex.go:32-35)

    def parsed_col(self, raw: Column) -> Column:
        group_names = [g for g in re.compile(self.pattern).groupindex]
        if _re2_extractable(self.pattern, group_names):
            # RE2 fast path (~5x): C++ extract_regex into a struct, then a
            # pure-Catalyst struct->map conversion. Matched rows never have
            # NULL fields ("" for non-participating groups), so any-null =
            # no-match -> NULL map, exactly like the fallback kernel.
            s = _compile_regex_struct_udf(self.pattern, group_names)(raw)
            entries = F.map_from_arrays(
                F.array(*[F.lit(n) for n in group_names]),
                F.array(*[s.getField(n) for n in group_names]),
            )
            if not self.allow_empty:
                entries = F.map_filter(entries, lambda _k, v: v != "")
            return F.when(s.getField(group_names[0]).isNotNull(), entries)
        return _compile_regex_parse_udf(self.pattern, self.allow_empty)(raw)

    def parsed_and_canonical(self, raw: Column) -> tuple[Column, Column] | None:
        """Fused RE2 path (round 7): one kernel evaluation yields BOTH the
        parsed map and the canonical Go-marshal text (see
        _compile_regex_struct_udf with_canonical). Only offered when the
        kernel applies and ``allow_empty`` is on (empty-dropping canonical
        depends on per-row membership — the Catalyst map build handles
        that); callers fall back to parsed_col + canonical_col otherwise.
        Identical UDF expressions are deduplicated at extraction, so the
        kernel still runs once per row."""
        group_names = [g for g in re.compile(self.pattern).groupindex]
        if not self.allow_empty or not _re2_extractable(self.pattern, group_names):
            return None
        s = _compile_regex_struct_udf(
            self.pattern, group_names, with_canonical=True
        )(raw)
        entries = F.map_from_arrays(
            F.array(*[F.lit(n) for n in group_names]),
            F.array(*[s.getField(n) for n in group_names]),
        )
        matched = s.getField(group_names[0]).isNotNull()
        return F.when(matched, entries), F.when(matched, s.getField("__canon"))

    def canonical_col(self, raw: Column, parsed: Column) -> Column:
        # regex output is map[string]string in Go — all values quoted.
        from .filters import canonical_json_of_string_map

        return canonical_json_of_string_map(parsed)

    def time_col(self, parsed: Column) -> Column | None:
        if self.time_key and self.time_format:
            return extract_time_col(parsed, self.time_key, self.time_format)
        return None


@dataclass
class ParserChain:
    """First-match-wins parser chain (engine.go:93-97).

    ``apply(df, raw_col, ingest_time_col)`` adds:
    - ``parsed`` map<string,string> (NULL when no parser matched — the row
      is KEPT, matching the reference),
    - ``parser`` string (name of the matching parser, NULL if none),
    - ``canonical`` string — Go-parity ``json.Marshal(ParsedData)`` text
      (the grep filter's match target, grep.go:79; ``null`` when unparsed),
    - ``event_time`` timestamp (extracted if the matching parser has a
      time_key and it parses; else the ingest time — parser.go:17-19).
    """

    parsers: list = field(default_factory=list)

    def apply(self, df, raw_col: str = "raw", ingest_time_col: str = "ingest_time"):
        # Each parser's candidate struct is materialized as its OWN column
        # (round-7 optimization): the candidate is referenced at least
        # twice downstream (the next parser's input mask + the final
        # coalesce), and CollapseProject keeps a multi-referenced non-cheap
        # alias materialized instead of inlining it — so when a later
        # parser is a Python UDF (its extraction splits the projection
        # around an ArrowEvalPython node, whose output projection is NOT
        # whole-stage-codegen'd and has no common-subexpression
        # elimination), the earlier parser's from_json/variant work is
        # computed ONCE in the codegen stage below the Python node and
        # flows through it as a plain attribute. The round-6 inline-
        # expression composition re-evaluated the json parse 3x per row
        # around the UDF boundary (measured: the 2-parser chain cost 6 s/M
        # rows more than the sum of its 1-parser chains).
        if not self.parsers:
            return (
                df.withColumn("parsed", F.lit(None).cast(PARSED_TYPE))
                .withColumn("parser", F.lit(None).cast("string"))
                .withColumn("canonical", F.lit("null"))
                .withColumn("event_time", F.col(ingest_time_col))
            )
        out = df
        cand_names: list[str] = []
        for i, p in enumerate(self.parsers):
            # first-match-wins short circuit that survives UDF extraction:
            # a pandas UDF is computed in its own ArrowEvalPython node for
            # EVERY row regardless of the later coalesce, so mask the input
            # to NULL for rows an earlier parser already matched — the
            # kernel's None fast-path skips them.
            if cand_names:
                prev = (
                    F.coalesce(*[F.col(c) for c in cand_names])
                    if len(cand_names) > 1
                    else F.col(cand_names[0])
                )
                raw = F.when(prev.isNull(), F.col(raw_col))
            else:
                raw = F.col(raw_col)
            fused = (
                p.parsed_and_canonical(raw)
                if hasattr(p, "parsed_and_canonical")
                else None
            )
            if fused is not None:
                parsed, canonical = fused
            else:
                parsed = p.parsed_col(raw)
                canonical = p.canonical_col(raw, parsed)
            tcol = p.time_col(parsed)
            event_time = (
                F.coalesce(tcol, F.col(ingest_time_col))
                if tcol is not None
                else F.col(ingest_time_col)
            )
            matched = (
                p.matched_col(raw, parsed)
                if hasattr(p, "matched_col")
                else parsed.isNotNull()
            )
            candidate = F.when(
                matched,
                F.struct(
                    parsed.alias("parsed"),
                    F.lit(p.name).alias("parser"),
                    canonical.alias("canonical"),
                    event_time.alias("event_time"),
                ),
            )
            name = f"_cand{i}"
            out = out.withColumn(name, candidate)
            cand_names.append(name)
        result = (
            F.coalesce(*[F.col(c) for c in cand_names])
            if len(cand_names) > 1
            else F.col(cand_names[0])
        )
        return (
            out.withColumn("_p", result)
            .withColumn("parsed", F.col("_p.parsed"))
            .withColumn("parser", F.col("_p.parser"))
            .withColumn("canonical", F.coalesce(F.col("_p.canonical"), F.lit("null")))
            .withColumn(
                "event_time", F.coalesce(F.col("_p.event_time"), F.col(ingest_time_col))
            )
            .drop("_p", *cand_names)
        )
