"""Vectorized token-array kernels (optimization round 7, guide §4.2).

Catalyst higher-order functions (``transform`` / ``filter`` lambdas +
``array_join``) are interpreted per element — they do not participate in
whole-stage codegen — so the tokens-table queries that render or scan every
token (bigram stats, md5 fingerprints, distinct-ratio quality) were paying
an interpreted lambda call per token over ~64M tokens at sf1.0. Each kernel
here processes a whole Arrow batch with pyarrow/numpy: the token lists of a
batch are ONE contiguous values buffer plus offsets, so per-token work
becomes a handful of vectorized array ops.

Every kernel is bit-exact with the Catalyst expression it replaces (the
replaced expression is named in each docstring); parity is pinned by
tests/test_tokenops.py against the old expressions and by the unchanged
driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIGRAM_BASE = 4294967296  # 2^32: bigram encode = t1 * 2^32 + t2 (exact for
# int32 tokens; int64 wrap-around arithmetic matches the JVM expression
# try_element_at(t, i)*2^32 + try_element_at(t, i+1) for every input)


def bigram_count_partials(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Per-task PARTIAL counts of encoded token bigrams: (bg, n) with
    ``bg = t[i]*2^32 + t[i+1]`` — the map-side half of the corpus bigram
    count. Replaces ``explode(transform(sequence(...), encode))`` +
    first-level hash aggregation: adjacent pairs are one shifted-add over
    the batch's contiguous values buffer (minus the row-boundary slots) and
    the per-batch partial count is one ``np.unique`` on int64 keys, so the
    JVM only aggregates pre-reduced (bg, n) partials. Rows with fewer than
    2 tokens contribute nothing (the ``n_tok >= 2`` guard's behavior);
    NULL token arrays contribute nothing; NULL token VALUES are rejected
    loudly (undefined values buffer)."""

    def kernel(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            tok = batch.column(0)
            if tok.values.null_count:
                raise ValueError("bigram_count_partials: NULL token values unsupported")
            lens = np.asarray(pc.fill_null(pc.list_value_length(tok), 0)).astype(np.int64)
            offs = np.asarray(tok.offsets).astype(np.int64)
            vals = np.asarray(tok.values).astype(np.int64)
            m = np.maximum(lens - 1, 0)
            total = int(m.sum())
            if total == 0:
                continue
            gstart = np.repeat(offs[:-1], m)
            pos0 = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
            g0 = gstart + pos0
            bg = vals[g0] * np.int64(BIGRAM_BASE) + vals[g0 + 1]
            uniq, counts = np.unique(bg, return_counts=True)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq), pa.array(counts.astype(np.int64))], names=["bg", "n"]
            )

    return df.select(F.col(tokens_col)).mapInArrow(kernel, "bg bigint, n bigint")


def joined_digest(
    df: DataFrame,
    array_col: str,
    out_col: str,
    kind: str = "md5",
    sep: str = ",",
) -> DataFrame:
    """Append a digest of the ``sep``-joined decimal rendering of an int
    array column and DROP the array column. ``kind='md5'`` replaces
    ``md5(array_join(transform(a, cast string), sep))`` (hex string);
    ``kind='hex60'`` replaces ``hex60_col`` of the same text (first 60 md5
    bits as bigint). The decimal rendering (pyarrow int->string cast) and
    the empty-array '' / NULL-array NULL behaviors match the Catalyst
    chain exactly. All other columns pass through the kernel unchanged."""
    if kind not in ("md5", "hex60"):
        raise ValueError(f"joined_digest kind must be 'md5' or 'hex60', got {kind!r}")
    other = [f for f in df.schema.fields if f.name != array_col]
    out_type = "string" if kind == "md5" else "bigint"
    schema_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in other]
        + [f"`{out_col}` {out_type}"]
    )
    names = [f.name for f in other]

    def kernel(it):
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            idx = batch.schema.get_field_index(array_col)
            arr = batch.column(idx)
            joined = pc.binary_join(pc.cast(arr, pa.list_(pa.string())), sep)
            if kind == "md5":
                out = pa.array(
                    [
                        None if s is None else hashlib.md5(s.encode()).hexdigest()
                        for s in joined.to_pylist()
                    ],
                    type=pa.string(),
                )
            else:
                out = pa.array(
                    [
                        None
                        if s is None
                        else int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                        for s in joined.to_pylist()
                    ],
                    type=pa.int64(),
                )
            cols = [batch.column(batch.schema.get_field_index(n)) for n in names]
            yield pa.RecordBatch.from_arrays(cols + [out], names=names + [out_col])

    return df.mapInArrow(kernel, schema_ddl)


def with_distinct_count(
    df: DataFrame, tokens_col: str = "tokens", out_col: str = "n_distinct"
) -> DataFrame:
    """Append the per-row count of DISTINCT token values and DROP the array
    column. Replaces ``size(array_distinct(a))``: per batch, one argsort of
    (row, value) pairs + boundary count — no per-element JVM hash-set work.
    NULL arrays yield NULL (``size(array_distinct(NULL))`` semantics under
    the callers' non-legacy config); NULL token values are rejected loudly."""
    other = [f for f in df.schema.fields if f.name != tokens_col]
    schema_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in other]
        + [f"`{out_col}` int"]
    )
    names = [f.name for f in other]

    def kernel(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            idx = batch.schema.get_field_index(tokens_col)
            tok = batch.column(idx)
            if tok.values.null_count:
                raise ValueError("with_distinct_count: NULL token values unsupported")
            lens = np.asarray(pc.fill_null(pc.list_value_length(tok), 0)).astype(np.int64)
            offs = np.asarray(tok.offsets).astype(np.int64)
            vals = np.asarray(tok.values).astype(np.int64)
            nrows = len(lens)
            total = int(lens.sum())
            if total:
                row_idx = np.repeat(np.arange(nrows, dtype=np.int64), lens)
                flat = vals[
                    np.repeat(offs[:-1], lens)
                    + (np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens))
                ]
                # distinct-per-row: sort by (row, value), count boundaries
                order = np.lexsort((flat, row_idx))
                r_s, v_s = row_idx[order], flat[order]
                new = np.empty(total, dtype=bool)
                new[0] = True
                np.not_equal(r_s[1:], r_s[:-1], out=new[1:])
                np.logical_or(new[1:], v_s[1:] != v_s[:-1], out=new[1:])
                counts = np.bincount(r_s[new], minlength=nrows)
            else:
                counts = np.zeros(nrows, dtype=np.int64)
            valid = ~np.asarray(pc.is_null(tok)).astype(bool) if tok.null_count else None
            out = pa.array(counts.astype(np.int32), mask=None if valid is None else ~valid)
            cols = [batch.column(batch.schema.get_field_index(n)) for n in names]
            yield pa.RecordBatch.from_arrays(cols + [out], names=names + [out_col])

    return df.mapInArrow(kernel, schema_ddl)
