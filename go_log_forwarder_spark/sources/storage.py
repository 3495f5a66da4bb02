"""Storage abstraction: Iceberg when available, parquet + snapshot manifests
otherwise (SURVEY §7.0).

The production deployment writes Iceberg tables (atomic snapshot commits,
incremental ``start-snapshot-id`` reads). This sandbox has no Iceberg
runtime jar, so the fallback reproduces the two Iceberg behaviors the
pipeline actually relies on:

1. **Atomic snapshot commit**: data files land under
   ``<table>/data/snap=<id>/``; the snapshot becomes visible only when its
   manifest JSON appears at ``<table>/manifests/<id>.json`` — written via
   temp-file + ``os.rename`` (atomic on POSIX). A crash mid-write leaves
   data files orphaned but never a half-visible snapshot.
2. **Incremental reads**: ``read(table, after_snapshot=...)`` unions only
   manifests with id greater than the checkpoint — the Iceberg
   ``option("start-snapshot-id", ...)`` analog, replacing the reference's
   byte-offset seek (internal/input/tail/tail.go:418).

Checkpoint/lineage logic is written against this interface, so the
spark-submit cluster deployment is config-only (swap ``ParquetSnapshotStore``
for ``IcebergStore``).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetSnapshotStore:
    """Parquet-files + JSON-manifest snapshot store (Iceberg fallback)."""

    def __init__(self, base: str):
        self.base = base

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.base, table)

    def _manifest_dir(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "manifests")

    def snapshots(self, table: str) -> list[int]:
        d = self._manifest_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[: -len(".json")]) for f in os.listdir(d) if f.endswith(".json")
        )

    def append(self, df: DataFrame, table: str, snapshot_id: int | None = None) -> int:
        """Write a new snapshot; returns its id. Commit is atomic (manifest
        rename); data written before the rename is invisible until then."""
        if snapshot_id is None:
            existing = self.snapshots(table)
            snapshot_id = (existing[-1] + 1) if existing else 1
        data_dir = os.path.join(self._table_dir(table), "data", f"snap={snapshot_id}")
        df.write.mode("overwrite").parquet(data_dir)
        manifest = {
            "snapshot_id": snapshot_id,
            "data_dir": data_dir,
            "committed_at": time.time(),
        }
        mdir = self._manifest_dir(table)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(mdir, f"{snapshot_id}.json"))  # atomic commit
        return snapshot_id

    def read(
        self, spark: SparkSession, table: str, after_snapshot: int | None = None
    ) -> DataFrame | None:
        """Union of committed snapshots; ``after_snapshot`` reads only newer
        ones (incremental / resume path). None if nothing committed."""
        ids = self.snapshots(table)
        if after_snapshot is not None:
            ids = [i for i in ids if i > after_snapshot]
        if not ids:
            return None
        dirs = [
            json.load(open(os.path.join(self._manifest_dir(table), f"{i}.json")))["data_dir"]
            for i in ids
        ]
        return spark.read.parquet(*dirs)


class IcebergStore:
    """Real-Iceberg variant (needs iceberg-spark-runtime on the classpath;
    config-only swap on a real cluster)."""

    def __init__(self, catalog: str = "spark_catalog"):
        self.catalog = catalog

    def append(self, df: DataFrame, table: str, snapshot_id: int | None = None) -> int:
        df.writeTo(f"{self.catalog}.{table}").append()
        hist = df.sparkSession.sql(f"SELECT snapshot_id FROM {self.catalog}.{table}.snapshots ORDER BY committed_at DESC LIMIT 1")
        return hist.head()[0]

    def read(self, spark: SparkSession, table: str, after_snapshot: int | None = None):
        reader = spark.read.format("iceberg")
        if after_snapshot is not None:
            reader = reader.option("start-snapshot-id", str(after_snapshot))
        return reader.load(f"{self.catalog}.{table}")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def get_store(spark: SparkSession, base: str):
    """Iceberg when on the classpath, parquet-manifest fallback otherwise."""
    if iceberg_available(spark):
        return IcebergStore()
    return ParquetSnapshotStore(base)
