"""Per-partition lineage + resumable runs (north rule; SURVEY §2.8).

The reference persists ``(path, inode) -> (offset, lastReadLine)`` to SQLite
every 100 ms (internal/input/tail/repository.go:50-120, tail.go:473-497) and
seeks to the saved offset on restart (tail.go:418) — at-least-once. This
engine is strictly stronger (exactly-once across retries):

- **Work unit** = input file (the file-scan task granule; at 10^12 rows an
  Iceberg scan-task manifest plays the same role). The unit list comes from
  the filesystem/manifest, never from scanning row data.
- **Idempotent output**: each run processes ALL uncommitted units in ONE
  Spark job and writes every sink partitioned by unit with dynamic partition
  overwrite — a retried unit replaces its own output, never duplicates it.
- **Atomic lineage commit**: after the sink writes succeed, one lineage row
  per unit (run_id, unit, rows_in/parsed/dropped/routed, status, ts) is
  committed via temp+rename JSON — the parquet-manifest analog of an Iceberg
  snapshot commit. Crash before the commit -> the unit is reprocessed and
  its output overwritten (no dup, no loss). Crash after -> it is skipped.
- **Resume** = anti-join of the unit list against committed lineage
  (a driver-side set difference over file names — partition pruning happens
  BEFORE any data is read, mirroring the offset seek).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.routing import SinkSpec
from ..sources.storage import ParquetSnapshotStore

UNIT_COL = "_unit"

_METRICS_SCHEMA = (
    "run_id string, unit string, rows_in long, rows_parsed long, "
    "rows_dropped long, rows_routed long, status string"
)


def _unit_path(unit: str) -> str:
    # input_file_name() yields a percent-encoded file:// URI — decode it,
    # or units with spaces etc. stat-fail and silently disable the reset
    return unquote(urlparse(unit).path or unit)


def unit_size(unit: str) -> int | None:
    """Current byte size of a unit (a file:// URI from input_file_name);
    None when unreadable. The manifest of a real table format carries this."""
    try:
        return os.path.getsize(_unit_path(unit))
    except OSError:
        return None


def unit_mtime_ns(unit: str) -> int | None:
    """Current mtime (ns) of a unit; None when unreadable. Recorded at
    commit so same-size-or-larger replacements are detected, not just
    shrinks (a real table format's snapshot id plays this role)."""
    try:
        return os.stat(_unit_path(unit)).st_mtime_ns
    except OSError:
        return None


class LineageStore:
    """One JSON file per committed (run_id, unit) — atomic via rename."""

    def __init__(self, base: str):
        self.base = base

    def _run_dir(self, run_id: str) -> str:
        return os.path.join(self.base, run_id)

    def committed(self, run_id: str, spark: SparkSession | None = None) -> dict[str, dict]:
        d = self._run_dir(run_id)
        if not os.path.isdir(d):
            return {}
        out = {}
        for f in os.listdir(d):
            if f.endswith(".json"):
                rec = json.load(open(os.path.join(d, f)))
                out[rec["unit"]] = rec
        return out

    def commit(self, run_id: str, records: list[dict]) -> None:
        d = self._run_dir(run_id)
        os.makedirs(d, exist_ok=True)
        for rec in records:
            tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                json.dump(rec, f)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, os.path.join(d, f"{uuid.uuid5(uuid.NAMESPACE_URL, rec['unit']).hex}.json"))

    def invalidate(self, run_id: str, unit: str) -> None:
        """Drop a unit's commit so the next run reprocesses it (the offset
        reset of tail.go:409-415 at unit granularity)."""
        p = os.path.join(
            self._run_dir(run_id), f"{uuid.uuid5(uuid.NAMESPACE_URL, unit).hex}.json"
        )
        if os.path.exists(p):
            os.remove(p)

    def metrics_df(self, spark: SparkSession, run_id: str) -> DataFrame:
        recs = list(self.committed(run_id).values())
        rows = [
            (
                r["run_id"], r["unit"], r["rows_in"], r["rows_parsed"],
                r["rows_dropped"], r["rows_routed"], r["status"],
            )
            for r in recs
        ]
        return spark.createDataFrame(rows, _METRICS_SCHEMA)


class TableLineageStore:
    """Lineage as an append-only parquet-manifest TABLE (the Iceberg shape;
    SURVEY §7.0): every commit/invalidation appends one atomic snapshot via
    :class:`ParquetSnapshotStore`; a unit's state is its LATEST row
    (invalidations are tombstone rows with status='invalidated'). On a real
    cluster this is a config-only swap to Iceberg appends — same interface
    as :class:`LineageStore`."""

    TABLE = "lineage"
    _SCHEMA = (
        "run_id string, unit string, rows_in long, rows_parsed long, "
        "rows_dropped long, rows_routed long, status string, "
        "committed_at double, unit_size long, unit_mtime_ns long"
    )

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.store = ParquetSnapshotStore(base)

    def _latest(self, run_id: str) -> DataFrame | None:
        df = self.store.read(self.spark, self.TABLE)
        if df is None:
            return None
        from pyspark.sql.window import Window

        w = Window.partitionBy("unit").orderBy(F.desc("committed_at"))
        return (
            df.filter(F.col("run_id") == run_id)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def committed(self, run_id: str, spark: SparkSession | None = None) -> dict[str, dict]:
        latest = self._latest(run_id)
        if latest is None:
            return {}
        return {
            r["unit"]: r.asDict()
            for r in latest.filter(F.col("status") == "committed").collect()
        }

    def commit(self, run_id: str, records: list[dict]) -> None:
        rows = [
            (
                rec["run_id"], rec["unit"], rec["rows_in"], rec["rows_parsed"],
                rec["rows_dropped"], rec["rows_routed"], rec["status"],
                rec["committed_at"], rec.get("unit_size"), rec.get("unit_mtime_ns"),
            )
            for rec in records
        ]
        self.store.append(self.spark.createDataFrame(rows, self._SCHEMA), self.TABLE)

    def invalidate(self, run_id: str, unit: str) -> None:
        self.commit(
            run_id,
            [
                {
                    "run_id": run_id, "unit": unit, "rows_in": 0, "rows_parsed": 0,
                    "rows_dropped": 0, "rows_routed": 0, "status": "invalidated",
                    "committed_at": time.time(), "unit_size": None,
                    "unit_mtime_ns": None,
                }
            ],
        )

    def metrics_df(self, spark: SparkSession, run_id: str) -> DataFrame:
        latest = self._latest(run_id)
        cols = [c.strip().split(" ")[0] for c in _METRICS_SCHEMA.split(",")]
        if latest is None:
            return spark.createDataFrame([], _METRICS_SCHEMA)
        return latest.filter(F.col("status") == "committed").select(*cols)


class ResumablePipeline:
    """Exactly-once resumable pipeline runner over file-unit granules.

    ``pipeline_fn(df) -> (parsed_df, kept_df)`` is the parse+filter stage;
    sinks receive ``kept_df`` rows whose tag matches their pattern.
    """

    def __init__(self, work_dir: str, sinks: list[SinkSpec], lineage=None):
        self.work_dir = work_dir
        self.sinks = sinks
        # default: filesystem JSON store; pass a TableLineageStore for the
        # parquet-manifest (Iceberg-shaped) variant — same interface
        self.lineage = lineage or LineageStore(os.path.join(work_dir, "_lineage"))

    def _sink_dir(self, sink: SinkSpec) -> str:
        return os.path.join(self.work_dir, "sinks", sink.name)

    def list_units(self, spark: SparkSession, input_path: str) -> list[str]:
        df = spark.read.parquet(input_path)
        return sorted(
            r[0]
            for r in df.select(F.input_file_name().alias("f")).distinct().collect()
        )

    def run(
        self,
        spark: SparkSession,
        input_path: str,
        pipeline_fn: Callable[[DataFrame], tuple[DataFrame, DataFrame]],
        run_id: str,
        fail_after_units: int | None = None,
        max_units_per_batch: int | None = None,
    ) -> dict:
        """Process all units not yet committed for ``run_id``.

        ``fail_after_units``/``max_units_per_batch`` exist for the
        crash-resume tests (FIXTURES.md F8): process only a prefix of the
        todo list, optionally 'crash' (raise) after writing sink data but
        BEFORE committing lineage for the tail half of that prefix.
        """
        # drop Spark's cached file listing/sizes for this input up front —
        # after a truncation/rotation a stale cached length makes the scan
        # read past the new EOF (cheap: metadata only)
        spark.catalog.refreshByPath(input_path)
        units = self.list_units(spark, input_path)
        committed = self.lineage.committed(run_id, spark)
        # truncation/replacement reset (tail.go:409-415: offset > size ->
        # seek 0), generalized: a committed unit whose file CHANGED since
        # commit — shrunk, grew (append), or was replaced in place (size
        # equal but mtime moved) — is invalidated so it reprocesses; the
        # dynamic-partition-overwrite sink replaces its old output (no dup).
        # Records from older stores may lack unit_mtime_ns; the mtime check
        # only fires when both sides are present.
        truncated = []
        for u, rec in committed.items():
            cur, old = unit_size(u), rec.get("unit_size")
            cur_mt, old_mt = unit_mtime_ns(u), rec.get("unit_mtime_ns")
            changed = (
                cur is not None and old is not None and cur != old
            ) or (cur_mt is not None and old_mt is not None and cur_mt != old_mt)
            if changed:
                self.lineage.invalidate(run_id, u)
                truncated.append(u)
        for u in truncated:
            committed.pop(u)
        done = set(committed)
        todo = [u for u in units if u not in done]
        if max_units_per_batch is not None:
            todo = todo[:max_units_per_batch]
        if not todo:
            return {"processed": 0, "skipped": len(done)}

        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df = spark.read.parquet(*todo).withColumn(UNIT_COL, F.input_file_name())
        parsed, kept = pipeline_fn(df)
        parsed = parsed.persist()
        kept = kept.persist()
        try:
            for s in self.sinks:
                sdf = kept.filter(s.compiled.column(F.col("tag")))
                (
                    sdf.write.mode("overwrite")
                    .partitionBy(UNIT_COL)
                    .parquet(self._sink_dir(s))
                )
            # per-unit metrics (A2): rows in/parsed/dropped/routed — ONE
            # aggregation job over the persisted frames (routed counts are
            # per-sink conditional sums, not a second pass per sink; the
            # old shape ran 3 collects + one count per sink).
            in_stats = parsed.groupBy(UNIT_COL).agg(
                F.count(F.lit(1)).alias("rows_in"),
                F.sum(F.when(F.col("parsed").isNotNull(), 1).otherwise(0)).alias(
                    "rows_parsed"
                ),
            )
            routed_expr = None
            for s in self.sinks:
                term = F.sum(s.compiled.column(F.col("tag")).cast("long"))
                routed_expr = term if routed_expr is None else routed_expr + term
            kept_stats = kept.groupBy(UNIT_COL).agg(
                F.count(F.lit(1)).alias("rows_kept"),
                routed_expr.alias("rows_routed"),
            )
            stats = {
                r[UNIT_COL]: r
                for r in in_stats.join(kept_stats, UNIT_COL, "left").collect()
            }
        finally:
            parsed.unpersist()
            kept.unpersist()

        records = []
        for i, u in enumerate(todo):
            if fail_after_units is not None and i >= fail_after_units:
                # simulated crash: sink data written, lineage NOT committed
                raise RuntimeError(f"injected failure before committing {u}")
            st = stats.get(u)
            records.append(
                {
                    "run_id": run_id,
                    "unit": u,
                    "rows_in": st["rows_in"] if st else 0,
                    "rows_parsed": st["rows_parsed"] if st else 0,
                    "rows_dropped": (st["rows_in"] - (st["rows_kept"] or 0)) if st else 0,
                    "rows_routed": (st["rows_routed"] or 0) if st else 0,
                    "status": "committed",
                    "committed_at": time.time(),
                    "unit_size": unit_size(u),
                    "unit_mtime_ns": unit_mtime_ns(u),
                }
            )
            self.lineage.commit(run_id, [records[-1]])
        return {"processed": len(todo), "skipped": len(done)}

    def read_sink(self, spark: SparkSession, sink_name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.work_dir, "sinks", sink_name))
