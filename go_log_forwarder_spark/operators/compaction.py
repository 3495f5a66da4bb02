"""Output compaction: rewrite a parquet directory into ~target-sized files.

Log pipelines produce many small files (per-batch, per-sink, per-unit
appends); at 10^12-row scale the resulting file-count explosion dominates
scan planning and metadata costs (the classic small-files problem —
Iceberg's rewrite_data_files is the managed-table analog). This operator
measures the directory's actual on-disk bytes, picks
``ceil(bytes / target)`` output files, and rewrites atomically
(write to a temp dir, swap via rename) so readers never observe a
half-compacted directory.

The file count comes from real sizes, not row counts — compression ratios
vary wildly across columns/corpora, so sizing by rows under- or
over-shoots by 10x.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_MB = 128


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def recover_compaction(path: str) -> str:
    """Crash recovery for :func:`compact_parquet_dir`'s rename window.

    If ``path`` is missing but a sibling ``<path>__old_<uuid>`` exists, the
    process died between the two renames — rename the old dir back (its
    content is intact; the original is never deleted until the new dir is
    in place). Stray ``<path>__compact_<uuid>`` temp dirs are incomplete
    outputs and are removed. Returns one of ``'ok'`` (path present, nothing
    to do), ``'restored'`` (old dir renamed back), ``'missing'`` (no path
    and no old dir — nothing recoverable)."""
    parent, base = os.path.split(path.rstrip("/"))
    leftovers = sorted(
        f for f in os.listdir(parent or ".") if f.startswith(base + "__")
    )
    for f in leftovers:
        if f.startswith(base + "__compact_"):
            shutil.rmtree(os.path.join(parent, f))
    olds = [f for f in leftovers if f.startswith(base + "__old_")]
    if os.path.exists(path):
        # a completed swap may still leave an __old_ dir if the crash hit
        # between the second rename and the rmtree — safe to drop now
        for f in olds:
            shutil.rmtree(os.path.join(parent, f))
        return "ok"
    if olds:
        os.rename(os.path.join(parent, olds[0]), path)
        for f in olds[1:]:
            shutil.rmtree(os.path.join(parent, f))
        return "restored"
    return "missing"


def compact_parquet_dir(
    spark: SparkSession, path: str, target_mb: int = DEFAULT_TARGET_MB
) -> dict:
    """Rewrite ``path`` into ceil(bytes/target) parquet files. Returns
    {files_before, files_after, bytes}.

    Swap semantics: the compacted output lands in a sibling
    ``__compact_<uuid>`` temp dir and replaces ``path`` with two renames.
    Readers never observe partially-written files, but the swap is NOT
    atomic — POSIX cannot atomically exchange directories without
    renameat2(RENAME_EXCHANGE) — so there is a window between the two
    renames where ``path`` does not exist, and a crash inside it leaves the
    data under ``<path>__old_<uuid>``. Crash recovery: if ``path`` is
    missing, rename the ``__old_`` dir back (its content is intact — the
    original is never deleted until the new dir is in place); stray
    ``__compact_`` dirs are incomplete outputs and can always be removed.
    On an object store / real table format this whole operator becomes an
    Iceberg rewrite-data-files snapshot commit, which IS atomic."""
    before = [
        f
        for _root, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = dir_bytes(path)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex}"
    # coalesce avoids a shuffle when reducing file count (the common case);
    # repartition only when we must INCREASE parallelism
    df = spark.read.parquet(path)
    writer = df.coalesce(n_out) if n_out <= df.rdd.getNumPartitions() else df.repartition(n_out)
    writer.write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = [
        f
        for _root, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    return {"files_before": len(before), "files_after": len(after), "bytes": total}
