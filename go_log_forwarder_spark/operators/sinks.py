"""Sink-side event formatting (SURVEY §2.6 E3-E8, §2.7).

Every formatter is a Column expression over the pipeline frame
(raw, parsed, canonical, tag, source, line_num, event_time) — the reference
re-serializes per event per output (stdout.go:121-194, splunk.go:136-156,
gelf.go:102-117); here Catalyst folds formatting into the sink's projection
and only the routed rows pay for it.

Parity notes:
- stdout json (E5, stdout.go:121-151): ``{timestamp: RFC3339, tag, data,
  lineNum?, path?}`` — lineNum omitted when 0, path omitted when empty;
  Go marshals map keys sorted: data, lineNum, path, tag, timestamp.
- stdout plain (E6, stdout.go:175-194): ``ts [tag] k=v k=v `` — Go map
  iteration order is RANDOM, so any fixed order is parity-safe (SURVEY
  §2.6); we emit sorted keys. Unparsed rows fall back to ``RawData=<raw>``.
- template (E7, stdout.go:153-173): Go text/template over
  {Timestamp, Tag, Data}; we support the ``{{.Field}}`` / ``{{.Data.key}}``
  substitution subset.
- colorize (E8, stdout.go:196-216): substring-triggered ANSI wrapping.
- splunk event (E3, splunk.go:129-156): keys event/index/source/sourcetype/
  host/time; Host is the literal "Logs from GO Log" (sic, splunk.go:141);
  SendRaw short-circuits to the raw line; metadata (source, lineNum) merged
  into the event map otherwise.
- gelf message (E4, gelf.go:102-117): version 1.1, short_message =
  json(parsed) else raw, unix timestamp, level 6 (info).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RFC3339 = "yyyy-MM-dd'T'HH:mm:ssXXX"

RESET = "[0m"
RED = "[31m"
GREEN = "[32m"
YELLOW = "[33m"
BLUE = "[34m"


def stdout_json_col(
    canonical: Column, tag: Column, event_time: Column, line_num: Column, source: Column
) -> Column:
    """E5: sorted-key JSON with conditional lineNum/path fields."""
    data_part = F.concat(F.lit('"data":'), F.coalesce(canonical, F.lit("null")))
    line_part = F.when(
        line_num.isNotNull() & (line_num != 0),
        F.concat(F.lit(',"lineNum":'), line_num.cast("string")),
    ).otherwise(F.lit(""))
    path_part = F.when(
        source.isNotNull() & (source != ""),
        F.concat(F.lit(',"path":"'), source, F.lit('"')),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("{"),
        data_part,
        line_part,
        path_part,
        F.lit(',"tag":"'),
        tag,
        F.lit('","timestamp":"'),
        F.date_format(event_time, RFC3339),
        F.lit('"}'),
    )


def stdout_plain_col(parsed: Column, raw: Column, tag: Column, event_time: Column) -> Column:
    """E6: ``ts [tag] k=v k=v `` (sorted keys) else ``ts [tag] RawData=raw``."""
    kv = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(parsed)),
            lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value")),
        ),
        " ",
    )
    head = F.concat(F.date_format(event_time, RFC3339), F.lit(" ["), tag, F.lit("] "))
    return F.when(parsed.isNotNull(), F.concat(head, kv, F.lit(" "))).otherwise(
        F.concat(head, F.lit("RawData="), raw)
    )


def template_col(
    template: str, parsed: Column, tag: Column, event_time: Column
) -> Column:
    """E7 (stdout.go:153-173): Go text/template compiled to one Column —
    field actions, {{.Data}} map rendering, if/else, trim markers; Go
    ``time.Time.String()`` timestamp rendering. See functions/gotemplate."""
    from ..functions.gotemplate import compile_go_template

    return compile_go_template(template, parsed, tag, event_time)


def colorize_col(output: Column) -> Column:
    """E8 (stdout.go:196-216): error->red, warn->yellow, info->green, else blue."""
    low = F.lower(output)
    return (
        F.when(low.contains("error"), F.concat(F.lit(RED), output, F.lit(RESET)))
        .when(low.contains("warn"), F.concat(F.lit(YELLOW), output, F.lit(RESET)))
        .when(low.contains("info"), F.concat(F.lit(GREEN), output, F.lit(RESET)))
        .otherwise(F.concat(F.lit(BLUE), output, F.lit(RESET)))
    )


def json_quote(s: Column) -> Column:
    """JSON string literal of a string column (escaping included):
    to_json of a 1-element array, brackets stripped."""
    arr = F.to_json(F.array(s))
    return arr.substr(F.lit(2), F.length(arr) - 2)


def splunk_event_col(
    parsed: Column,
    raw: Column,
    event_time: Column,
    source: Column,
    line_num: Column,
    index: str = "main",
    event_host: str = "",
    source_type: str = "_json",
    send_raw: bool = False,
    event_fields: dict[str, str] | None = None,
) -> Column:
    """E3 (splunk.go:129-156): the HEC payload as JSON text.

    event = RawData when SendRaw; else ParsedData merged with the
    configured EventFields (util.MergeMaps — statics win) plus metadata
    source/lineNum (AppendMetadata, splunk.go:129-134); empty ParsedData ->
    event null (splunk.go:151-155 leaves Event nil). Documented divergence:
    this works over the map<string,string> parity view, so numeric values
    in the event map serialize quoted.
    """
    time_part = F.concat(F.lit(',"time":'), F.unix_timestamp(event_time).cast("string"))
    meta_part = F.lit(
        f',"index":"{index}","source":"{event_host}","sourcetype":"{source_type}",'
        '"host":"Logs from GO Log"'
    )
    if send_raw:
        event_val = json_quote(raw)
    else:
        statics = F.create_map(
            *[F.lit(x) for kv in sorted((event_fields or {}).items()) for x in kv]
        ) if event_fields else None
        meta_map = F.create_map(
            F.lit("source"), F.coalesce(source, F.lit("")),
            F.lit("lineNum"), F.coalesce(line_num.cast("string"), F.lit("0")),
        )
        base = parsed
        merged = F.map_concat(
            F.map_filter(
                base,
                lambda k, _: ~k.isin("source", "lineNum", *(event_fields or {}).keys()),
            ),
            *( [statics] if statics is not None else [] ),
            meta_map,
        )
        from ..functions.filters import canonical_json_of_string_map

        event_val = F.when(
            parsed.isNull() | (F.size(F.map_keys(parsed)) == 0), F.lit("null")
        ).otherwise(canonical_json_of_string_map(merged))
    return F.concat(
        F.lit('{"event":'), event_val, meta_part, time_part, F.lit("}")
    )


def gelf_message_col(canonical: Column, raw: Column, event_time: Column, host: str = "spark") -> Column:
    """E4 (gelf.go:102-117): GELF 1.1 message JSON; short_message is the
    JSON text of ParsedData when parsed, else the raw line."""
    short = F.when(
        canonical.isNotNull() & (canonical != "null"), canonical
    ).otherwise(raw)
    return F.concat(
        F.lit('{"version":"1.1","host":"'),
        F.lit(host),
        F.lit('","short_message":'),
        json_quote(short),
        F.lit(',"timestamp":'),
        F.unix_timestamp(event_time).cast("string"),
        F.lit(',"level":6}'),
    )
