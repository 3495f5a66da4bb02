"""tail input (S1-S4): file-glob line source.

Reference (internal/input/tail/tail.go): polls a glob every 100 ms, reads
new lines from the saved offset, TrimSpaces each line, counts EVERY line
(LastReadLine++ happens before the empty check, tail.go:449-453), skips
empties, emits one Event per non-empty line with (path, line_num).

Spark realization:
- **Batch**: ``wholetext`` read + ``posexplode(split(...))`` — exact
  per-file line numbers (a plain ``spark.read.text`` can split one file
  across partitions, losing stable numbering). For log files up to the
  100 MB class this is the right tool; bigger inputs arrive through the
  tokens/Iceberg path anyway.
- **Streaming**: ``spark.readStream.text(dir)`` — Spark's file source does
  discovery + offset/checkpoint tracking natively, subsuming the reference's
  stat-loop, inode bookkeeping, debounce and SQLite offsets
  (tail.go:201-355, repository.go). Rotation/truncation (S3) has no analog
  for immutable inputs; see plans/lineage.py for the reprocess story.
- Metadata stamping (S7, input/input.go:16-21): tag/host/input_source
  literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Go strings.TrimSpace trims everything unicode.IsSpace accepts — notably
# \r (CRLF files), \t, \v, \f, NEL (U+0085) and NBSP (U+00A0) — while
# Spark's F.trim strips ASCII space only. Java regex \s is [ \t\n\x0B\f\r];
# the class below adds the two unicode members Go also trims.
_SPACE_CLASS = "[\\s\\u0085\\u00A0]"


def trim_space(col: Column) -> Column:
    """strings.TrimSpace parity (tail.go:448): trim ALL leading/trailing
    whitespace, not just ASCII spaces."""
    return F.regexp_replace(col, f"^{_SPACE_CLASS}+|{_SPACE_CLASS}+$", "")


def tail_batch(
    spark: SparkSession,
    glob: str,
    tag: str = "",
    host: str = "spark",
    input_source: str = "tail",
) -> DataFrame:
    """One row per non-empty trimmed line: (raw, source, line_num, tag,
    host, input_source, ingest_time). line_num counts empty lines too
    (tail.go:449-453 semantics)."""
    files = spark.read.format("text").option("wholetext", "true").load(glob)
    lines = files.select(
        F.input_file_name().alias("source"),
        F.posexplode(F.split(F.col("value"), "\n")).alias("idx", "line"),
    )
    return (
        lines.select(
            trim_space(F.col("line")).alias("raw"),
            "source",
            (F.col("idx") + 1).cast("long").alias("line_num"),
        )
        .filter(F.length("raw") > 0)
        .withColumn("tag", F.lit(tag))
        .withColumn("host", F.lit(host))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )


def tail_batch_chunked(
    spark: SparkSession,
    glob: str,
    chunk_bytes: int = 64 * 1024 * 1024,
    offsets: dict[str, tuple[int, int]] | None = None,
    tag: str = "",
    host: str = "spark",
    input_source: str = "tail",
    return_state: bool = False,
    complete_files: bool = True,
):
    """Chunked tail for files of ANY size (tail.go:357-471 seek semantics;
    VERDICT r2 item 6) — the wholetext path loads each file as one row,
    which is wrong for multi-GB single files.

    Same output contract as :func:`tail_batch` (one row per non-empty
    trimmed line with exact per-file line numbers), but each file is read
    as ``chunk_bytes``-sized byte ranges in parallel executor tasks:

    - driver lists files + sizes only (manifest-scale, never row data) and
      cuts [start, end) chunk specs;
    - pass A counts newlines per chunk (cheap scan) — the per-chunk counts
      (bounded by total_bytes/chunk_bytes rows) prefix-sum into each
      chunk's starting line number;
    - pass B re-reads each chunk and emits the lines that START inside it,
      stitching boundary lines by extending past ``end`` to the next
      newline — every line is owned by exactly one chunk, numbering is
      byte-exact.

    ``offsets`` maps path -> (byte_offset, last_read_line): the saved tail
    position (repository.go:50-120); reading resumes at the offset and
    numbering continues at last_read_line+1. An offset past EOF means the
    file was truncated/rotated -> seek 0 and restart numbering
    (tail.go:409-415).

    ``complete_files=False`` switches to LIVE-TAIL semantics: only
    newline-terminated lines are emitted (an unterminated final line is
    left for the next run, like the reference's scanner waiting for its
    '\n'); the default emits it (wholetext batch parity — the file is
    complete). ``return_state=True`` additionally returns
    {path: (next_offset, last_read_line)} — next_offset sits after the
    last TERMINATED line, so committing it after a successful sink write
    yields exactly-once tailing across runs (see TailOffsetStore)."""
    import glob as _glob
    import math
    import os
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    specs = []  # one row per chunk
    for path in sorted(_glob.glob(glob)):
        size = os.path.getsize(path)
        base, base_line = 0, 0
        if offsets and path in offsets:
            off, last_line = offsets[path]
            if off > size:  # truncation: offset past EOF -> seek 0
                base, base_line = 0, 0
            else:
                base, base_line = off, last_line
        n = math.ceil((size - base) / chunk_bytes) if size > base else 0
        for ci in range(n):
            s = base + ci * chunk_bytes
            specs.append((path, base, base_line, ci, s, min(s + chunk_bytes, size)))

    spec_schema = T.StructType.fromDDL(
        "path string, base long, base_line long, ci int, s long, e long"
    )
    if not specs:
        empty = spark.createDataFrame(
            [], "raw string, source string, line_num long"
        ).select(
            "raw", "source", "line_num",
            F.lit(tag).alias("tag"), F.lit(host).alias("host"),
            F.lit(input_source).alias("input_source"),
            F.current_timestamp().alias("ingest_time"),
        )
        return (empty, dict(offsets or {})) if return_state else empty
    spec_df = spark.createDataFrame(specs, spec_schema).repartition(
        max(len(specs) // 4, 1)
    )

    def count_newlines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, s, e, ci in zip(pdf["path"], pdf["s"], pdf["e"], pdf["ci"]):
                with open(path, "rb") as f:
                    f.seek(int(s))
                    buf = f.read(int(e) - int(s))
                nl = buf.count(b"\n")
                last = buf.rfind(b"\n")
                last_end = int(s) + last + 1 if last >= 0 else -1
                rows.append((path, int(ci), nl, last_end))
            yield pd.DataFrame(rows, columns=["path", "ci", "nl", "last_end"])

    # per-chunk newline counts: one small row per chunk (manifest-scale)
    arows = spec_df.mapInPandas(
        count_newlines, "path string, ci int, nl long, last_end long"
    ).collect()
    counts = {(r["path"], r["ci"]): r["nl"] for r in arows}
    last_ends = {(r["path"], r["ci"]): r["last_end"] for r in arows}
    prefix = {}
    for path, base, base_line, ci, s, e in sorted(specs):
        key = (path, ci)
        prev = prefix.get((path, ci - 1))
        before = 0 if prev is None else prev + counts[(path, ci - 1)]
        prefix[key] = before
    spec2 = spark.createDataFrame(
        [
            (path, base, base_line, ci, s, e, prefix[(path, ci)])
            for path, base, base_line, ci, s, e in specs
        ],
        "path string, base long, base_line long, ci int, s long, e long, nl_before long",
    ).repartition(max(len(specs) // 4, 1))

    def emit_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_raw, out_src, out_num = [], [], []
            for path, base, base_line, s, e, nlb in zip(
                pdf["path"], pdf["base"], pdf["base_line"], pdf["s"], pdf["e"], pdf["nl_before"]
            ):
                base, s, e = int(base), int(s), int(e)
                with open(path, "rb") as f:
                    skipped = 0
                    pos = s
                    if s > base:
                        # a line starts at s only if the previous byte is \n;
                        # otherwise skip to just after the next newline >= s
                        f.seek(s - 1)
                        if f.read(1) != b"\n":
                            # search only inside [s, e): if the first newline
                            # is at/after e, no line starts in this chunk
                            while True:
                                blk = f.read(min(65536, e - f.tell()) or 1)
                                if not blk or f.tell() > e:
                                    pos = e
                                    break
                                j = blk.find(b"\n")
                                if j >= 0:
                                    pos = f.tell() - len(blk) + j + 1
                                    skipped = 1
                                    break
                                if f.tell() >= e:
                                    pos = e
                                    break
                    if pos >= e:
                        continue
                    f.seek(pos)
                    raw = f.read(e - pos)
                    # extend to complete the final owned line
                    while not raw.endswith(b"\n"):
                        blk = f.read(65536)
                        if not blk:
                            break
                        j = blk.find(b"\n")
                        if j >= 0:
                            raw += blk[: j + 1]
                            break
                        raw += blk
                    p = pos
                    segs = raw.split(b"\n")
                    terminated_last = raw.endswith(b"\n")
                    for j, seg in enumerate(segs):
                        if p >= e:
                            break
                        if (
                            not complete_files
                            and j == len(segs) - 1
                            and not terminated_last
                        ):
                            break  # live-tail mode: wait for the line's \n
                        out_raw.append(seg.decode("utf-8", errors="replace"))
                        out_src.append(path)
                        out_num.append(int(base_line) + int(nlb) + skipped + j + 1)
                        p += len(seg) + 1
            yield pd.DataFrame({"raw": out_raw, "source": out_src, "line_num": out_num})

    lines = spec2.mapInPandas(emit_lines, "raw string, source string, line_num long")
    out = (
        lines.select(trim_space(F.col("raw")).alias("raw"), "source", "line_num")
        .filter(F.length("raw") > 0)
        .withColumn("tag", F.lit(tag))
        .withColumn("host", F.lit(host))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )
    if not return_state:
        return out
    # per-file commit state: next offset sits after the last TERMINATED
    # line in live-tail mode (an unterminated tail is re-read next run),
    # or at the read end in complete-files mode; last_read_line counts
    # terminated lines (newlines) past base_line. Untouched files keep
    # their previous offsets.
    state: dict[str, tuple[int, int]] = dict(offsets or {})
    per_file: dict[str, list] = {}
    for path, base, base_line, ci, s_, e_ in specs:
        t = per_file.setdefault(path, [base, int(base_line), base, 0, base])
        le = last_ends[(path, ci)]
        if le >= 0:
            t[2] = max(t[2], le)
        t[3] += counts[(path, ci)]
        t[4] = max(t[4], e_)
    for path, (base, base_line, nl_end, nl_total, read_end) in per_file.items():
        state[path] = (
            (read_end, base_line + nl_total)
            if complete_files
            else (nl_end, base_line + nl_total)
        )
    return out, state


def tail_stream(
    spark: SparkSession,
    directory: str,
    tag: str = "",
    host: str = "spark",
    input_source: str = "tail",
) -> DataFrame:
    """Streaming variant: line-per-row text stream; file discovery and
    offsets are Spark's (no per-file line numbers across splits — the
    streaming checkpoint replaces them as the resume token)."""
    return (
        spark.readStream.text(directory)
        .select(trim_space(F.col("value")).alias("raw"))
        .filter(F.length("raw") > 0)
        .withColumn("source", F.lit(directory))
        .withColumn("tag", F.lit(tag))
        .withColumn("host", F.lit(host))
        .withColumn("input_source", F.lit(input_source))
        .withColumn("ingest_time", F.current_timestamp())
    )


class TailOffsetStore:
    """``path -> (offset, last_read_line)`` persisted as ONE JSON file via
    atomic temp+rename — the SQLite offset repository analog
    (repository.go:50-120), minus the 100 ms timer: commit points are
    explicit, AFTER the sink write succeeds (so a crash re-reads, never
    skips)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict[str, tuple[int, int]]:
        import json
        import os

        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return {k: (v[0], v[1]) for k, v in json.load(f).items()}

    def save(self, offsets: dict[str, tuple[int, int]]) -> None:
        import json
        import os
        import uuid

        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({k: list(v) for k, v in offsets.items()}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.path)


def tail_batch_resumable(
    spark: SparkSession,
    glob: str,
    store: TailOffsetStore,
    chunk_bytes: int = 64 * 1024 * 1024,
    **kwargs,
):
    """Resumable tail over growing files of any size: read from the saved
    offsets (live-tail semantics — only newline-terminated lines), return
    ``(df, commit)``. Materialize ``df`` into your sink, then call
    ``commit()`` to persist the new offsets; a crash before commit re-reads
    the same lines (pair with an idempotent sink, like the lineage
    pipeline's dynamic-partition overwrite) — never skips data."""
    offsets = store.load()
    df, state = tail_batch_chunked(
        spark, glob, chunk_bytes, offsets,
        return_state=True, complete_files=False, **kwargs,
    )
    return df, (lambda: store.save(state))
