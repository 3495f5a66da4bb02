"""Enrichment: static field merge + broadcast lookup join.

Reference analogs:
- static ``EventFields`` merged into each event's ParsedData, with the
  configured fields OVERWRITING existing keys
  (``internal/output/splunk/splunk.go:151`` via ``util.MergeMaps``,
  ``internal/util/util.go:47-50`` — maps.Copy(m1, m2) lets m2 win).
- the north rule upgrades this to a keyed lookup table joined on
  ``source`` via a broadcast hash join (the lookup side is small; no
  shuffle on the 10^12-row fact side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_static_fields(df: DataFrame, fields: dict[str, str], parsed_col: str = "parsed") -> DataFrame:
    """splunk.go:151: merge configured fields into the parsed map; the
    static fields overwrite existing keys (util.go:47-50 semantics —
    map_concat in Spark <3.4 would error on dup keys; we emulate 'last
    wins' explicitly)."""
    if not fields:
        return df
    static = F.create_map(*[F.lit(x) for kv in fields.items() for x in kv])
    parsed = F.col(parsed_col)
    # keep original entries whose key is NOT overridden, then concat
    keep = F.map_filter(parsed, lambda k, _: ~k.isin(*fields.keys()))
    merged = F.when(parsed.isNull(), static).otherwise(F.map_concat(keep, static))
    return df.withColumn(parsed_col, merged)


def broadcast_enrich(
    df: DataFrame, lookup: DataFrame, on: str = "source", how: str = "left"
) -> DataFrame:
    """Broadcast-hash-join enrichment: rows with unknown key keep NULL
    enrichment columns (left join, FIXTURES F4)."""
    return df.join(F.broadcast(lookup), on, how)
