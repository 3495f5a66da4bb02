"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash. (SURVEY-mandated additions beyond the
reference's operator set; first-class graded components.)

Scale design (the point is 100 TB, not 500 rows):
- exact: hash-groupBy on md5(text) — one shuffle on a short key, never on
  the text payload (project the hash first, let Catalyst prune ``text``).
- jaccard: explode to (doc, word) pairs, self-join on word. At scale the
  word join is the classic candidate-blowup; the MinHash/LSH path below is
  the scale path — jaccard is the exact verifier applied to LSH candidates.
- MinHash+LSH: per-doc signature is one narrow map-side pass (no shuffle);
  banding shuffles only (band_id, signature) — tiny — and candidate pairs
  are verified with exact jaccard. This is shingle→minhash→band→bucket-join.
- SimHash: pure map-side signature; near-dup = signature distance, here
  materialized per-doc (pairing strategies are a downstream join choice).

Portability: hashes are md5-hex-prefix ints (see textstats.hex60_*), so the
DuckDB oracle reproduces every signature bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import hex60_col, hex60_sql, micro_col, micro_sql, words_col, words_sql

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 32


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: (text_hash, n_dups, keeper) — keeper = min(id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper"))
    )


def exact_dedup_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
        SELECT md5({text_col}) AS text_hash, COUNT(*)::BIGINT AS n_dups,
               MIN({id_col}) AS keeper
        FROM {table} GROUP BY 1
    """


def doc_words(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, word) distinct pairs — the unigram shingle relation."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(words_col(F.col(text_col))).alias("word"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int | None = 20_000,
) -> DataFrame:
    """EXACT n-gram (unigram-set) Jaccard near-dup pairs: (id_a, id_b,
    jaccard_micro) with id_a < id_b and jaccard >= threshold.

    This is the full word self-join — candidate count grows quadratically,
    so it is a VERIFIER for micro corpora or LSH candidate sets, never a
    first-class corpus scan; ``max_docs`` guards against accidental use at
    scale (pass None to bypass). The scale path is
    :func:`minhash_lsh_dedup` (same exact verify, LSH-pruned candidates).
    """
    if max_docs is not None:
        n = df.select(id_col).count()
        if n > max_docs:
            raise ValueError(
                f"jaccard_pairs is quadratic: {n} docs > max_docs={max_docs}; "
                "use minhash_lsh_dedup (LSH-pruned) or pass max_docs=None"
            )
    dw = doc_words(df, text_col, id_col)
    sizes = dw.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = dw.alias("a")
    b = dw.alias("b")
    inter = (
        a.join(b, F.col("a.word") == F.col("b.word"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard_micro",
            micro_col(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ),
        )
    )
    return j.filter(F.col("jaccard_micro") >= int(threshold * 1e6)).select(
        "id_a", "id_b", "jaccard_micro"
    )


def jaccard_pairs_sql(table: str, threshold: float = 0.6, text_col: str = "text", id_col: str = "doc_id") -> str:
    ws = words_sql(text_col)
    return f"""
        WITH dw AS (
            SELECT DISTINCT {id_col} AS id, unnest({ws}) AS word FROM {table}
        ),
        sizes AS (SELECT id, COUNT(*) AS sz FROM dw GROUP BY id),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
            FROM dw a JOIN dw b ON a.word = b.word AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               {micro_sql('CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)')} AS jaccard_micro
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE {micro_sql('CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)')} >= {int(threshold * 1e6)}
    """


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sig array<bigint>[N_MINHASH]): min over words of
    hex60(md5(seed || ':' || word)). Map-side only — no shuffle.

    Words are materialized in their own projection first: 16 seeded
    transforms referencing an inline split() would re-split 16x per row
    (no CSE across higher-order lambdas)."""
    df = df.select(F.col(id_col), words_col(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")

    def _seeded(seed: int):
        # closure factory: a default-arg lambda would be treated as a
        # two-parameter (element, index) higher-order-function lambda
        return lambda w: hex60_col(F.concat(F.lit(f"{seed}:"), w))

    sig = F.array(
        *[F.array_min(F.transform(ws, _seeded(s))) for s in range(N_MINHASH)]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def minhash_bands(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, band, bsig): the banded MinHash signature relation — N_BANDS
    bands of N_MINHASH/N_BANDS signature rows each. Map-side only. This IS
    the persistable LSH index row format (see :func:`lsh_index_increment`)."""
    rows_per_band = N_MINHASH // N_BANDS
    sigs = minhash_signature(df, text_col, id_col)
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.element_at(F.col("sig"), b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bsig"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig"))


def lsh_candidates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """MinHash LSH candidate pairs: band the signature (N_BANDS bands of
    N_MINHASH/N_BANDS rows), bucket-join on (band, band_signature)."""
    bands = minhash_bands(df, text_col, id_col)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bsig") == F.col("b.bsig")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame, threshold: float = 0.6, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scale-path near-dup: LSH candidates verified with exact jaccard.

    The exact-jaccard verify runs ONLY over docs that appear in some
    candidate pair (left-semi prune) — the full pairwise join never happens,
    which is the whole point of LSH at 10^12 rows."""
    cands = lsh_candidates(df, text_col, id_col)
    ids = cands.select(F.col("id_a").alias("id")).unionByName(
        cands.select(F.col("id_b").alias("id"))
    ).distinct()
    dw = doc_words(df, text_col, id_col).join(ids, "id", "left_semi")
    sizes = dw.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = dw.alias("a"), dw.alias("b")
    inter = (
        a.join(b, F.col("a.word") == F.col("b.word"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(cands, ["id_a", "id_b"], "left_semi")
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard_micro",
            micro_col(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ),
        )
        .filter(F.col("jaccard_micro") >= int(threshold * 1e6))
        .select("id_a", "id_b", "jaccard_micro")
    )


LSH_INDEX_TABLE = "lsh_bands"


def lsh_index_increment(store, batch: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        snapshot_id: int | None = None,
                        meta: dict | None = None) -> int:
    """Incremental cross-run dedup, write side (VERDICT r4 item 2): MinHash-
    band ONLY the new batch and append the band relation as one atomic
    snapshot of the persisted index (``sources.storage`` snapshot store /
    Iceberg). At 100 TB the corpus is never re-signatured per increment —
    each run pays for its own batch; everything older is parquet on disk.
    Returns the committed snapshot id.

    ``snapshot_id`` pins the id for idempotent callers (the streaming
    wiring maps micro-batch id -> snapshot id, so a replayed batch raises
    ``ValueError`` instead of double-appending — the exactly-once guard)."""
    return store.append(
        minhash_bands(batch, text_col, id_col), LSH_INDEX_TABLE,
        snapshot_id=snapshot_id, meta=meta,
    )


def lsh_index_compact(spark, store, target_mb: int = 128) -> int | None:
    """Compact the persisted LSH band index (round-5 TODO closure): after
    thousands of per-batch :func:`lsh_index_increment` appends the index is
    thousands of tiny ``snap=`` dirs, and every :func:`lsh_incremental_pairs`
    plan pays a FileScan per snapshot. Folding them into one snapshot
    (``store.compact`` — Iceberg rewrite_data_files analog) keeps the
    band-relation bytes identical while the plan reads ONE dir.

    Must run at a quiescent point between batch runs: the compacted
    snapshot keeps the newest id, so a run that already emitted its pairs
    never re-reads its own bands as new (each run reads only the snapshot
    it just committed as its new-batch side)."""
    return store.compact(spark, LSH_INDEX_TABLE, target_mb=target_mb)


def lsh_incremental_pairs(
    spark,
    store,
    corpus: DataFrame,
    snapshot_id: int,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental cross-run dedup, read side: near-dup pairs involving at
    least one doc of snapshot ``snapshot_id`` — new-batch bands (read back
    off the index, never recomputed) bucket-join the FULL index
    (new x old + new x new); candidates are verified with exact jaccard
    over ONLY the candidate docs (left-semi prune against ``corpus``, the
    data lake the ids point into). Old x old pairs were emitted by earlier
    runs, so the union of every run's output equals the full-corpus
    :func:`minhash_lsh_dedup` relation exactly — that equality IS the
    driver gate (q_dedup_minhash_lsh drives this path against the
    unchanged full-corpus oracle).

    Scale shape: the only signature computation per run is the batch's own
    (in :func:`lsh_index_increment`); this side is two FileScans of the
    band index (tiny rows: id, band, bsig) + the pruned verify. The plan
    gate (test_lsh_incremental_*) pins that old bands come from a
    ``snap=`` FileScan, not a re-derivation."""
    new_bands = store.read(spark, LSH_INDEX_TABLE, after_snapshot=snapshot_id - 1)
    all_bands = store.read(spark, LSH_INDEX_TABLE)
    if new_bands is None or all_bands is None:
        raise ValueError(f"snapshot {snapshot_id} not committed to {LSH_INDEX_TABLE}")
    a, b = new_bands.alias("a"), all_bands.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bsig") == F.col("b.bsig")))
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )
    ids = cands.select(F.col("id_a").alias("id")).unionByName(
        cands.select(F.col("id_b").alias("id"))
    ).distinct()
    dw = doc_words(corpus, text_col, id_col).join(ids, "id", "left_semi")
    sizes = dw.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    wa, wb = dw.alias("a"), dw.alias("b")
    inter = (
        wa.join(wb, F.col("a.word") == F.col("b.word"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(cands, ["id_a", "id_b"], "left_semi")
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard_micro",
            micro_col(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ),
        )
        .filter(F.col("jaccard_micro") >= int(threshold * 1e6))
        .select("id_a", "id_b", "jaccard_micro")
    )


def lsh_candidates_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    rows_per_band = N_MINHASH // N_BANDS
    ws = words_sql(text_col)
    mins = ", ".join(
        f"list_min(list_transform({ws}, w -> {hex60_sql(repr(f'{s}:') + ' || w')})) AS m{s}"
        for s in range(N_MINHASH)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, "
        + " || '-' || ".join(
            f"CAST(m{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + " AS bsig FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""
        WITH sigs AS (SELECT {id_col} AS id, {mins} FROM {table}),
        bands AS ({band_rows})
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
    """


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash bigint): SIMHASH_BITS-bit signature over distinct words.

    bit j of word-hash votes +1/-1; simhash bit j set iff the vote sum > 0."""
    dw = doc_words(df, text_col, id_col).withColumn("h", hex60_col(F.col("word")))
    votes = dw.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("id", sim.cast("bigint").alias("simhash"))


def simhash_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    ws = words_sql(text_col)
    h = hex60_sql("word")
    terms = " + ".join(
        f"CASE WHEN SUM(CASE WHEN ({h} >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
        WITH dw AS (SELECT DISTINCT {id_col} AS id, unnest({ws}) AS word FROM {table})
        SELECT id, CAST({terms} AS BIGINT) AS simhash FROM dw GROUP BY id
    """


def simhash_pairs(
    df: DataFrame, max_distance: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup pairs: (id_a, id_b, hamming) with hamming distance
    <= max_distance, found WITHOUT an all-pairs scan.

    Banding pigeonhole: with B = max_distance + 1 bands of SIMHASH_BITS/B
    bits, any pair within distance d <= max_distance differs in at most
    max_distance bands, so it matches EXACTLY on at least one band —
    candidates come from B band-bucket self-joins (each bucket tiny),
    verify = popcount(xor) on the full signature. The standard simhash
    index shape at web scale (Manku et al., WWW'07 — public algorithm).
    """
    B = max_distance + 1
    if SIMHASH_BITS % B != 0:
        raise ValueError(f"SIMHASH_BITS={SIMHASH_BITS} not divisible by {B} bands")
    width = SIMHASH_BITS // B
    mask = (1 << width) - 1
    sigs = simhash(df, text_col, id_col)
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bsig"),
                    )
                    for b in range(B)
                ]
            )
        ).alias("bs"),
    ).select("id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bsig").alias("bsig"))
    a, b2 = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b2, (F.col("a.band") == F.col("b.band")) & (F.col("a.bsig") == F.col("b.bsig")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.simhash").alias("sa"),
            F.col("b.id").alias("id_b"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("bigint")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_sql(
    table: str, max_distance: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`simhash_pairs` (same bands, same popcount)."""
    B = max_distance + 1
    width = SIMHASH_BITS // B
    mask = (1 << width) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS bsig FROM sigs"
        for b in range(B)
    )
    return f"""
        WITH sigs AS ({simhash_sql(table, text_col, id_col)}),
        bands AS ({band_rows}),
        cands AS (
            SELECT DISTINCT a.id AS id_a, a.simhash AS sa, b.id AS id_b, b.simhash AS sb
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cands WHERE bit_count(xor(sa, sb)) <= {max_distance}
    """


DECON_NGRAM = 8  # benchmark-decontamination shingle width (words)


def _ngram_hashes(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, h): distinct hex60 hashes of each doc's word n-grams. Docs
    shorter than n words contribute nothing (no n-gram exists)."""
    with_words = df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("_ws"))
    grams = F.when(
        F.size(F.col("_ws")) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_ws")) - n + 1),
            lambda i: hex60_col(
                F.array_join(F.slice(F.col("_ws"), i, n), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return with_words.select("id", F.explode(grams).alias("h")).distinct()


def _ngram_hashes_sql(table: str, n: int, text_col: str, id_col: str) -> str:
    ws = words_sql(text_col)
    gram = hex60_sql(f"array_to_string(w[i : i + {n - 1}], ' ')")
    return f"""
        SELECT DISTINCT id, h FROM (
            SELECT {id_col} AS id,
                   unnest([{gram} for i in generate_series(1, len(w) - {n - 1})]) AS h
            FROM (SELECT {id_col}, {ws} AS w FROM {table})
            WHERE len(w) >= {n}
        )
    """


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DECON_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (the train/test-overlap gate every
    training pipeline needs): flag every doc sharing ANY word ``n``-gram
    with the benchmark set. The standard scale shape: both sides reduce to
    distinct shingle hashes (map-side), the benchmark side is tiny and
    broadcast, the check is a semi-join — corpus text is scanned once and
    never pairwise-compared. Returns (doc_id, n_hits, contaminated)."""
    dg = _ngram_hashes(docs, n, text_col, id_col)
    bg = _ngram_hashes(benchmark, n, text_col, id_col).select("h").distinct()
    hits = dg.join(F.broadcast(bg), "h").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        docs.select(F.col(id_col))
        .join(hits.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    table: str, benchmark_pred: str, n: int = DECON_NGRAM,
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the benchmark set is ``table`` rows matching
    ``benchmark_pred`` (mirroring a driver-side benchmark table)."""
    return f"""
        WITH dg AS ({_ngram_hashes_sql(table, n, text_col, id_col)}),
        bg AS (
            SELECT DISTINCT h FROM ({_ngram_hashes_sql(
                f"(SELECT * FROM {table} WHERE {benchmark_pred})", n, text_col, id_col)})
        ),
        hits AS (
            SELECT id, COUNT(*) AS n_hits FROM dg JOIN bg USING (h) GROUP BY id
        )
        SELECT d.{id_col},
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM {table} d LEFT JOIN hits h ON h.id = d.{id_col}
    """


SPAN_NGRAM = 5  # shingle width (words) for exact-substring span dedup


def shingle_positions(
    df: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, h): hex60 hash of each word ``n``-gram WITH its 1-based
    start position — the position-keeping sibling of ``_ngram_hashes``
    (which dedups to distinct hashes for decontamination). Map-side only."""
    with_words = df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("_ws"))
    grams = F.when(
        F.size(F.col("_ws")) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_ws")) - n + 1),
            lambda i: hex60_col(F.array_join(F.slice(F.col("_ws"), i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return with_words.select("id", F.posexplode(grams).alias("pos0", "h")).select(
        "id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "h"
    )


def substring_spans(
    df: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-substring (span-level) dedup — the Lee et al. 2021 repeated-
    substring removal mode, reshaped for Spark (no suffix array, and
    certainly not one on the driver): every word ``n``-gram that occurs
    MORE THAN ONCE anywhere in the corpus (intra- or inter-document) marks
    its covered words as duplicated; per document, overlapping/adjacent
    covered ranges merge into maximal removal spans.

    Distributed shape (100 TB story):
    1. shingle positions (map-side explode, no shuffle);
    2. the fingerprint-partitioned index: ONE groupBy(h) partial-agg
       shuffle keeps hashes with >= 2 occurrences — the index relation is
       tiny relative to the corpus (only repeated shingles survive);
    3. a left-semi join back tags duplicated positions;
    4. span merge is a per-document window (lag + running sum islands) —
       partition = one document, never a corpus-wide sort.

    Two shingle starts p < q belong to one span iff q - p <= n (their
    covered word ranges [p, p+n-1], [q, q+n-1] overlap or touch), so the
    output spans are exactly the maximal unions of covered words.
    Returns (doc_id, span_start, span_end, span_len, n_shingles) with
    1-based inclusive word indexes."""
    return _global_dup_spans(shingle_positions(df, n, text_col, id_col), n)


DUP_BROADCAST_ROWS = 2_000_000  # ~48 MB at 24 B/key: above this the dup-hash
# set joins through a plain shuffle — the relation is bounded by DISTINCT
# REPEATED shingles (data-dependent, unbounded at 100 TB), so broadcasting it
# unconditionally would be an executor/driver OOM; same count-gated pattern
# as similarity.SEED_BROADCAST_ROWS.


def _global_dup_spans(sp: DataFrame, n: int, counts: DataFrame | None = None) -> DataFrame:
    """Steps 2-4 of the span-dedup shape over a (id, pos, h) shingle
    relation: the fingerprint-partitioned >= 2 count index, the semi-join
    back, and the per-document islands merge — shared by the word
    (:func:`substring_spans`) and token (:func:`token_substring_spans`)
    variants, which differ only in how shingles are produced.

    Shape choice, measured (rounds 6-7): a window-count formulation
    (count(*) OVER (PARTITION BY h)) computes ``sp`` once but ALWAYS
    shuffles the full position relation by hash; a localCheckpoint of
    ``sp`` also lost to recompute once shingle production got cheap
    (round 7: 156 s vs 143 s at sf1.0 — materializing the position
    relation costs more than re-deriving it). The groupBy+semi-join here
    recomputes ``sp`` map-side for the probe, and in exchange broadcasts
    the duplicated-hash set whenever it is small, so the corpus never
    shuffles by hash at all. Round 7 makes that broadcast EXPLICIT and
    count-gated: the dup set is checkpointed (it is needed twice anyway:
    once to size it, once to join), and joins broadcast only under
    ``DUP_BROADCAST_ROWS`` — AQE alone converts the join too late, after
    the probe side's shuffle map stage already ran (measured 34 s of
    wasted shuffle write at sf1.0). Above the gate the join degrades to
    the plain shuffle semi-join, which is the 100 TB-safe fallback.

    ``counts`` optionally supplies a pre-aggregated (h, n_occ) relation
    (e.g. kernel-side partial counts summed by the JVM — see
    :func:`token_shingle_count_partials`) so the index pass never ships
    raw positions through an aggregation.

    Islands merge: when the dup set broadcasts AND ``sp`` carries an
    integral id, the probe side never shuffles — rows reach the join
    map-side, doc-contiguous with ascending positions (both producers,
    ``posexplode`` and the Arrow shingle kernel, emit a doc's grams
    consecutively, and a broadcast hash join preserves stream order) —
    so the merge runs in a streaming Arrow kernel with zero
    shuffle/sort, replacing the window formulation's Exchange + per-
    partition sort (21 s of the sf1.0 find). The kernel guards its
    order invariant at runtime (revisited doc id or non-ascending
    positions raise). The shuffle-join fallback keeps the window shape —
    its shuffle destroys contiguity anyway."""
    src = counts if counts is not None else sp.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    dup_h = (
        src.filter(F.col("n_occ") >= 2)
        .select("h")
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import types as T

    if dup_h.count() <= DUP_BROADCAST_ROWS:
        dup_pos = sp.join(F.broadcast(dup_h), "h", "left_semi")
        if isinstance(sp.schema["id"].dataType, (T.LongType, T.IntegerType)):
            return _dup_span_islands_arrow(dup_pos, n)
        return _spans_from_dup_positions(dup_pos, n)
    return _spans_from_dup_positions(sp.join(dup_h, "h", "left_semi"), n)


def _dup_span_islands_arrow(dup_pos: DataFrame, n: int) -> DataFrame:
    """Streaming islands merge over an (id, pos) relation that is doc-
    contiguous with ascending positions within every partition (see
    :func:`_global_dup_spans` for why the broadcast path guarantees it):
    one vectorized pass finds the gap>n breaks, emits completed spans per
    batch and carries the open tail run across batches. Output is
    identical to :func:`_spans_from_dup_positions` — same fields, same
    1-based inclusive indexes — with zero shuffle and zero sort. Both
    invariants are asserted per batch; a violation raises instead of
    silently merging wrong islands."""

    NAMES = ["doc_id", "span_start", "span_end", "span_len", "n_shingles"]

    def kernel(it):
        import numpy as np
        import pyarrow as pa

        seen: set[int] = set()
        cur = None  # open run: [id, start_pos, last_pos, count]

        def span_of(run):
            i, s, last, c = run
            return (i, s, last + n - 1, last + n - s, c)

        for batch in it:
            ids = np.asarray(batch.column(0)).astype(np.int64)
            pos = np.asarray(batch.column(1)).astype(np.int64)
            if len(ids) == 0:
                continue
            same = ids[1:] == ids[:-1]
            d = pos[1:] - pos[:-1]
            if np.any(same & (d <= 0)):
                raise RuntimeError(
                    "islands kernel: positions not strictly ascending within a doc"
                )
            starts = np.concatenate(
                ([0], np.flatnonzero(~same | (d > n)) + 1, [len(ids)])
            )
            s_arr, e_arr = starts[:-1], starts[1:]
            seg_id = ids[s_arr]
            seg_sp = pos[s_arr].copy()
            seg_ep = pos[e_arr - 1]
            seg_cnt = (e_arr - s_arr).astype(np.int64)
            flushed = None
            if cur is not None:
                gap = int(seg_sp[0]) - cur[2]
                if int(seg_id[0]) == cur[0] and gap <= n:
                    if gap <= 0:
                        raise RuntimeError(
                            "islands kernel: positions not strictly ascending within a doc"
                        )
                    seg_sp[0] = cur[1]
                    seg_cnt[0] += cur[3]
                else:
                    flushed = span_of(cur)
                    if int(seg_id[0]) != cur[0]:
                        seen.add(cur[0])
                cur = None
            # contiguity guard: only id TRANSITIONS need set bookkeeping —
            # O(docs per batch), not O(segments)
            trans = np.flatnonzero(
                np.concatenate(([True], seg_id[1:] != seg_id[:-1]))
            )
            prev = None
            for t in trans:
                i = int(seg_id[t])
                if prev is not None:
                    seen.add(prev)
                if i in seen:
                    raise RuntimeError(
                        "islands kernel: doc id revisited — input not doc-contiguous"
                    )
                prev = i
            # segments 0..K-2 are complete; the last stays open (carried)
            K = len(s_arr)
            cur = [int(seg_id[K - 1]), int(seg_sp[K - 1]), int(seg_ep[K - 1]), int(seg_cnt[K - 1])]
            cols = [
                seg_id[: K - 1],
                seg_sp[: K - 1],
                seg_ep[: K - 1] + (n - 1),
                seg_ep[: K - 1] + n - seg_sp[: K - 1],
                seg_cnt[: K - 1],
            ]
            if flushed is not None:
                f = np.array(flushed, dtype=np.int64)
                cols = [np.concatenate(([f[i]], c)) for i, c in enumerate(cols)]
            if len(cols[0]):
                yield pa.RecordBatch.from_arrays(
                    [pa.array(c) for c in cols], names=NAMES
                )
        if cur is not None:
            f = np.array([span_of(cur)], dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(f[:, i]) for i in range(5)], names=NAMES
            )

    return dup_pos.select("id", "pos").mapInArrow(
        kernel,
        "doc_id bigint, span_start bigint, span_end bigint, span_len bigint, n_shingles bigint",
    )


def token_shingle_positions(
    df: DataFrame, n: int = SPAN_NGRAM, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, h): each token ``n``-gram with its 1-based start position —
    the tokens-native sibling of :func:`shingle_positions` (VERDICT r5
    item 1: Lee et al. span dedup is defined over token sequences, and the
    graft input is ``(doc_id, tokens array<int>)``). The key is an
    INJECTIVE integer packing, not a string and not a hash: consecutive
    token pairs pack into one bigint each ((hi << 32) | unsigned(lo), an
    odd tail token rides alone), so the key is a struct of ceil(n/2)
    bigints. Exactly collision-free for any int32 token values — two
    n-grams share a key iff they are the same token sequence, the same
    equivalence classes as round 6's space-joined decimal rendering, so
    every downstream span is identical. Chosen over the r6 string key by
    measurement (optimization round 7): rendering + joining 5 decimal
    strings per position dominated the whole span row (83 s of the 291 s
    sf1.0 row was this map-side pass alone); the packed form is pure
    integer arithmetic, ~16-24 B/key, and cheaper to hash, shuffle and
    compare. ``id_col`` must be numeric (it is cast to bigint for the
    fixed Arrow schema — the graft table's doc ids are numeric, see
    ``__spark_entry__``).

    The pass runs as a vectorized ``mapInArrow`` kernel (guide §4.2): a
    Catalyst transform-lambda + posexplode formulation of the same packing
    is interpreted per element (higher-order functions do not participate
    in whole-stage codegen) and measured 53 s at sf1.0 where the numpy
    sliding-window kernel takes 19 s — the whole batch is one contiguous
    Arrow values buffer, so every gram word is one vectorized shift-or
    over strided views. Map-side only; only (id, tokens) cross the Python
    boundary."""
    el_t = df.schema[tokens_col].dataType.elementType.typeName()
    if el_t not in ("integer", "short", "byte"):
        raise ValueError(
            f"token_shingle_positions packs int32-range token ids; got "
            f"array<{el_t}> for {tokens_col!r}"
        )
    n_words = (n + 1) // 2
    kernel = _token_shingle_kernel(n, n_words)
    flat_schema = "id bigint, pos bigint, " + ", ".join(
        f"h{k} bigint" for k in range(n_words)
    )
    flat = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(tokens_col).alias("_ts")
    ).mapInArrow(kernel, flat_schema)
    return flat.select(
        "id", "pos", F.struct(*[f"h{k}" for k in range(n_words)]).alias("h")
    )


def token_shingle_count_partials(
    df: DataFrame, n: int = SPAN_NGRAM, tokens_col: str = "tokens"
) -> DataFrame:
    """Per-task PARTIAL counts of the packed shingle keys: (h, n_occ) with
    the same injective packing as :func:`token_shingle_positions` but
    pre-reduced per Arrow batch (one pyarrow hash group_by in C++),
    so the dup-index aggregation ships ~distinct-keys-per-task rows into
    the JVM instead of one row per position. Sum over ``h`` to get global
    occurrence counts — exactly ``token_shingle_positions(...).groupBy(h)
    .count()``."""
    el_t = df.schema[tokens_col].dataType.elementType.typeName()
    if el_t not in ("integer", "short", "byte"):
        raise ValueError(
            f"token_shingle_count_partials packs int32-range token ids; got "
            f"array<{el_t}> for {tokens_col!r}"
        )
    n_words = (n + 1) // 2
    kernel = _token_shingle_kernel(n, n_words, counts=True)
    flat_schema = (
        ", ".join(f"h{k} bigint" for k in range(n_words)) + ", n_occ bigint"
    )
    flat = df.select(F.lit(0).cast("bigint").alias("id"), F.col(tokens_col).alias("_ts")).mapInArrow(
        kernel, flat_schema
    )
    return flat.select(
        F.struct(*[f"h{k}" for k in range(n_words)]).alias("h"), "n_occ"
    )


def _token_shingle_kernel(n: int, n_words: int, counts: bool = False):
    """Build the sliding-window shingle kernel for :func:`token_shingle_
    positions`: per Arrow batch, flatten the token lists to one contiguous
    int64 array, index every n-gram start with strided arithmetic, and
    pack consecutive token pairs into bigint key words — all numpy, no
    per-row Python. With ``counts=True`` the kernel instead emits per-batch
    PARTIAL key counts (pyarrow hash group_by). NULL token arrays
    contribute no grams (the Catalyst ``when(size >= n)`` guard's
    behavior); NULL token VALUES are rejected loudly (the values buffer is
    undefined there — silent garbage keys would be far worse than an
    error)."""

    def kernel(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        MASK = np.int64(4294967295)
        for batch in it:
            ids = np.asarray(batch.column(0)).astype(np.int64)
            tok = batch.column(1)
            if tok.values.null_count:
                raise ValueError(
                    "token_shingle_positions: NULL token values unsupported"
                )
            lens = pc.fill_null(pc.list_value_length(tok), 0)
            lens = np.asarray(lens).astype(np.int64)
            offs = np.asarray(tok.offsets).astype(np.int64)
            vals = np.asarray(tok.values).astype(np.int64)
            m = np.maximum(lens - n + 1, 0)
            total = int(m.sum())
            if total == 0:
                continue
            row_idx = np.repeat(np.arange(len(lens)), m)
            gstart = np.repeat(offs[:-1], m)
            pos0 = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
            g0 = gstart + pos0
            hs = []
            for k in range(n_words):
                hi = vals[g0 + 2 * k]
                if 2 * k + 1 < n:
                    lo = vals[g0 + 2 * k + 1]
                    hs.append((hi << 32) | (lo & MASK))
                else:
                    hs.append(hi)
            if counts:
                # hash-based partial counting (pyarrow group_by). The
                # obvious sort-then-boundary-diff alternatives were all
                # measured slower on the real dup-heavy corpus: a memcmp-
                # order void-view sort of the packed key bytes cost 2.84 s
                # vs 1.05 s for this group_by on the identical sf0.1 pass
                # (void comparisons are per-element function calls, and
                # heavy duplication makes the comparison count worst-case),
                # and an n_words-key lexsort was ~1.5x slower still.
                # use_threads=False: the task slot is the parallelism unit.
                key_names = [f"h{k}" for k in range(n_words)]
                tb = pa.table({nm: h for nm, h in zip(key_names, hs)})
                g = (
                    tb.group_by(key_names, use_threads=False)
                    .aggregate([([], "count_all")])
                    .rename_columns(key_names + ["n_occ"])
                )
                for rb in g.to_batches():
                    if rb.num_rows:
                        yield rb
            else:
                cols = [pa.array(ids[row_idx]), pa.array(pos0 + 1)] + [
                    pa.array(h) for h in hs
                ]
                yield pa.RecordBatch.from_arrays(
                    cols, names=["id", "pos"] + [f"h{k}" for k in range(n_words)]
                )

    return kernel


def token_substring_spans(
    df: DataFrame, n: int = SPAN_NGRAM, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """Span-level exact-substring dedup over TOKEN SEQUENCES — the form Lee
    et al. 2021 actually define (their suffix array is built over the
    tokenized corpus), run on the graft's own input table. Same distributed
    shape as :func:`substring_spans` (map-side shingles, ONE partial-agg
    shuffle of hashes, dup-set probe, per-doc islands merge); returns
    (doc_id, span_start, span_end, span_len, n_shingles) with 1-based
    inclusive TOKEN indexes. The dup index aggregates kernel-side partial
    counts (:func:`token_shingle_count_partials`) so raw positions never
    enter the JVM aggregation.

    Probe shape (round 7): when the dup set fits the broadcast gate
    (``DUP_BROADCAST_ROWS`` — the same memory bound the JVM broadcast
    join already implies, since a broadcast relation is collected to the
    driver either way), it ships to the probe as raw key bytes in a
    Spark broadcast variable and the WHOLE probe — shingle keys,
    membership (one C++ hash-set lookup per gram), islands merge — runs in a
    single Arrow kernel pass over the token table: no position relation
    ever leaves Python, no join, and islands need no cross-batch carry
    (each doc's grams live inside its own row). Above the gate the plain
    shuffle semi-join + window formulation remains (the 100 TB-safe
    fallback), exactly as in :func:`_global_dup_spans`."""
    from pyspark.sql import types as T

    counts = (
        token_shingle_count_partials(df, n, tokens_col)
        .groupBy("h")
        .agg(F.sum("n_occ").alias("n_occ"))
    )
    dup_h = (
        counts.filter(F.col("n_occ") >= 2).select("h").localCheckpoint(eager=True)
    )
    n_words = (n + 1) // 2
    id_integral = isinstance(
        df.schema[id_col].dataType, (T.LongType, T.IntegerType)
    )
    if id_integral and dup_h.count() <= DUP_BROADCAST_ROWS:
        return _token_spans_via_broadcast(df, dup_h, n, n_words, tokens_col, id_col)
    sp = token_shingle_positions(df, n, tokens_col, id_col)
    dup_pos = sp.join(dup_h, "h", "left_semi")
    return _spans_from_dup_positions(dup_pos, n)


def _token_spans_via_broadcast(
    df: DataFrame, dup_h: DataFrame, n: int, n_words: int,
    tokens_col: str, id_col: str,
) -> DataFrame:
    """Single-pass probe for :func:`token_substring_spans`: the dup keys
    arrive as a broadcast of their raw fixed-width key bytes; membership
    is one hash-table lookup per gram (``pyarrow.compute.is_in`` over a
    ``fixed_size_binary`` view of the packed words — exact binary
    equality, the same equivalence classes as the struct key). A
    ``np.searchsorted`` over a sorted void view of the same bytes was
    measured 5.3x slower on the real corpus (298.9 vs 56.6 ms per 640k-
    gram batch at sf0.1): void comparisons are per-element function
    calls, and a binary search pays ~18 of them per probe where the hash
    set pays one vectorized lookup. Islands merge is the same vectorized
    break logic as :func:`_dup_span_islands_arrow`, but with no carried
    state: a doc's grams are complete within its own input row."""
    import numpy as np

    spark = df.sparkSession
    pdf = dup_h.select("h.*").toPandas()
    key_bytes = np.int64().itemsize * n_words
    dup = np.empty((len(pdf), n_words), dtype=np.int64)
    for k in range(n_words):
        dup[:, k] = pdf[f"h{k}"].to_numpy(dtype=np.int64)
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(dup))
    NAMES = ["doc_id", "span_start", "span_end", "span_len", "n_shingles"]

    def kernel(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        dv = bc.value
        dup_set = pa.Array.from_buffers(
            pa.binary(key_bytes), len(dv), [None, pa.py_buffer(dv)]
        )
        MASK = np.int64(4294967295)
        seen_ids: set[int] = set()
        for batch in it:
            ids = np.asarray(batch.column(0)).astype(np.int64)
            tok = batch.column(1)
            if tok.values.null_count:
                raise ValueError(
                    "token_substring_spans: NULL token values unsupported"
                )
            lens = np.asarray(pc.fill_null(pc.list_value_length(tok), 0)).astype(np.int64)
            offs = np.asarray(tok.offsets).astype(np.int64)
            vals = np.asarray(tok.values).astype(np.int64)
            m = np.maximum(lens - n + 1, 0)
            total = int(m.sum())
            if total == 0:
                continue
            row_idx = np.repeat(np.arange(len(lens)), m)
            gstart = np.repeat(offs[:-1], m)
            pos0 = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
            g0 = gstart + pos0
            keys = np.empty((total, n_words), dtype=np.int64)
            for k in range(n_words):
                hi = vals[g0 + 2 * k]
                if 2 * k + 1 < n:
                    keys[:, k] = (hi << 32) | (vals[g0 + 2 * k + 1] & MASK)
                else:
                    keys[:, k] = hi
            if len(dv):
                kb = np.ascontiguousarray(keys)
                probe = pa.Array.from_buffers(
                    pa.binary(key_bytes), total, [None, pa.py_buffer(kb)]
                )
                is_dup = pc.is_in(probe, value_set=dup_set).to_numpy(
                    zero_copy_only=False
                )
            else:
                is_dup = np.zeros(total, dtype=bool)
            if not is_dup.any():
                continue
            d_ids = ids[row_idx[is_dup]]
            d_pos = pos0[is_dup] + 1
            # duplicate-doc-id guard (the window formulation would MERGE
            # positions of repeated ids; this per-row shape cannot — raise
            # loudly instead of silently diverging)
            uniq = ids[np.concatenate(([True], ids[1:] != ids[:-1]))]
            for i in uniq.tolist():
                if i in seen_ids:
                    raise RuntimeError(
                        "token_substring_spans: duplicate doc id in input"
                    )
                seen_ids.add(i)
            same = d_ids[1:] == d_ids[:-1]
            gap = d_pos[1:] - d_pos[:-1]
            starts = np.concatenate(
                ([0], np.flatnonzero(~same | (gap > n)) + 1, [len(d_ids)])
            )
            s_arr, e_arr = starts[:-1], starts[1:]
            sp = d_pos[s_arr]
            ep = d_pos[e_arr - 1]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(d_ids[s_arr]),
                    pa.array(sp),
                    pa.array(ep + (n - 1)),
                    pa.array(ep + n - sp),
                    pa.array((e_arr - s_arr).astype(np.int64)),
                ],
                names=NAMES,
            )

    return df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(tokens_col).alias("_ts")
    ).mapInArrow(
        kernel,
        "doc_id bigint, span_start bigint, span_end bigint, span_len bigint, n_shingles bigint",
    )


def remove_repeated_token_spans(
    df: DataFrame, n: int = SPAN_NGRAM, tokens_col: str = "tokens",
    id_col: str = "doc_id", spans: DataFrame | None = None,
) -> DataFrame:
    """APPLY half of token-level span dedup: drop every token covered by a
    repeated-substring span (tiny span relation collected per doc and
    left-joined back; the token arrays are never exploded and never cross a
    shuffle). Returns (doc_id, clean_tokens array<int>, n_kept, n_removed)
    for EVERY input document.

    Round 7 reshapes the drop from a per-TOKEN ``filter(exists(spans))``
    HOF — O(n_tok x spans) interpreted lambda calls per doc, the dominant
    cost of the tok_clean kind at sf1.0 — to a per-SPAN gap slice: the
    doc's spans are sorted and overlap-merged (a no-op for find output,
    which is already disjoint, but keeps the function correct for
    arbitrary caller-supplied span relations), and ``clean_tokens`` is the
    concatenation of the inter-span slices — O(spans) array ops per doc,
    identical coverage, identical order."""
    if spans is None:
        spans = token_substring_spans(df, n, tokens_col, id_col)
    span_t = "array<struct<span_start:bigint,span_end:bigint>>"
    sp_agg = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_ts"))
    joined = docs.join(sp_agg, "doc_id", "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array().cast(span_t))
    )
    merged = _merge_span_array(F.array_sort(F.col("_spans")), span_t)
    joined = joined.withColumn("_m", merged)
    m = F.col("_m")
    n_tok = F.size("_ts")

    def _gap_slice(i):
        # slice strictly between merged span i and span i+1 (i = 0 -> head,
        # i = size -> tail); spans are 1-based inclusive and within bounds
        start = F.when(i == 0, F.lit(1)).otherwise(
            F.element_at(m, i)["span_end"] + 1
        )
        end_excl = F.when(i == F.size(m), n_tok.cast("bigint") + 1).otherwise(
            F.element_at(m, i + 1)["span_start"]
        )
        return F.slice(
            F.col("_ts"),
            start.cast("int"),
            F.greatest(end_excl - start, F.lit(0).cast("bigint")).cast("int"),
        )

    kept = F.flatten(F.transform(F.sequence(F.lit(0), F.size(m)), _gap_slice))
    return joined.select(
        "doc_id",
        kept.alias("clean_tokens"),
        F.size(kept).cast("bigint").alias("n_kept"),
        (n_tok - F.size(kept)).cast("bigint").alias("n_removed"),
    )


def _merge_span_array(sorted_spans, span_t: str):
    """Fold a SORTED span-struct array into its disjoint overlap-merge
    (touching spans merge too — coverage-identical either way)."""
    return F.aggregate(
        sorted_spans,
        F.array().cast(span_t),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s["span_start"] <= F.element_at(acc, -1)["span_end"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["span_start"].alias("span_start"),
                        F.greatest(
                            F.element_at(acc, -1)["span_end"], s["span_end"]
                        ).alias("span_end"),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _spans_from_dup_positions(dup_pos: DataFrame, n: int) -> DataFrame:
    """Merge duplicated shingle-start positions (id, pos) into maximal
    spans: per-document islands window (lag + running sum) — partition =
    one document, never a corpus-wide sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("pos")
    new_island = (
        F.when(
            F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > n),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    runs = dup_pos.withColumn(
        "grp",
        F.sum(new_island).over(
            Window.partitionBy("id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy(F.col("id").alias("doc_id"), "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_shingles",
        )
    )


def substring_spans_sql(
    table: str, n: int = SPAN_NGRAM, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`substring_spans` (same hashes, same islands)."""
    return _spans_sql(table, words_sql(text_col), n, id_col)


def token_substring_spans_sql(
    table: str, n: int = SPAN_NGRAM, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`token_substring_spans`: same body, shingles
    drawn from the decimal-rendered token array instead of words, keyed on
    the raw joined n-gram (no hash — mirrors the Spark side)."""
    return _spans_sql(
        table, f"list_transform({tokens_col}, x -> CAST(x AS VARCHAR))", n, id_col,
        hashed=False,
    )


def _spans_sql(table: str, w_expr: str, n: int, id_col: str,
               hashed: bool = True) -> str:
    """Shared span-find SQL body over any string-array expression ``w_expr``.
    NB the two unnests in ``sp`` zip positionally (DuckDB semantics).
    ``hashed=False`` keys on the raw joined n-gram (the token path — see
    :func:`token_shingle_positions`)."""
    ws = w_expr
    raw = f"array_to_string(w[i : i + {n - 1}], ' ')"
    gram = hex60_sql(raw) if hashed else raw
    return f"""
        WITH sp AS (
            SELECT id,
                   unnest(generate_series(1, len(w) - {n - 1})) AS pos,
                   unnest([{gram} for i in generate_series(1, len(w) - {n - 1})]) AS h
            FROM (SELECT {id_col} AS id, {ws} AS w FROM {table})
            WHERE len(w) >= {n}
        ),
        dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(*) >= 2),
        dp AS (SELECT sp.id, sp.pos FROM sp JOIN dup USING (h)),
        isl AS (
            SELECT id, pos,
                   SUM(CASE WHEN prev_pos IS NULL OR pos - prev_pos > {n}
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY pos) AS grp
            FROM (SELECT id, pos,
                         LAG(pos) OVER (PARTITION BY id ORDER BY pos) AS prev_pos
                  FROM dp)
        )
        SELECT id AS doc_id,
               MIN(pos) AS span_start,
               MAX(pos) + {n - 1} AS span_end,
               MAX(pos) + {n - 1} - MIN(pos) + 1 AS span_len,
               COUNT(*)::BIGINT AS n_shingles
        FROM isl GROUP BY id, grp
    """


SPAN_INDEX_TABLE = "span_shingles"


def span_index_increment(
    store, batch: DataFrame, n: int = SPAN_NGRAM,
    text_col: str = "text", id_col: str = "doc_id",
    snapshot_id: int | None = None, meta: dict | None = None,
) -> int:
    """Incremental substring-span dedup, write side (round-6 shortlist
    item 1, same shape as :func:`lsh_index_increment`): shingle ONLY the
    new batch and append its per-hash partial counts (h, n_occ) as one
    atomic snapshot of the persisted index. Positions are deliberately
    NOT persisted — the global ≥2 filter needs only counts, and the count
    relation is bounded by distinct shingles while a position relation
    would be corpus-sized (one row per word). Returns the committed
    snapshot id."""
    counts = (
        shingle_positions(batch, n, text_col, id_col)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return store.append(counts, SPAN_INDEX_TABLE, snapshot_id=snapshot_id, meta=meta)


def span_incremental_spans(
    spark,
    store,
    batch: DataFrame,
    n: int = SPAN_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental substring-span dedup, read side: removal spans of the
    NEW batch's documents under FULL-corpus shingle counts — a shingle is
    duplicated if its occurrences summed across every committed snapshot
    (history + this batch) reach 2, so a repeat whose first copy lives in
    an EARLIER batch is caught (the case a per-batch recompute misses).

    EXACT equivalence: span membership of a position depends only on its
    shingle's global count, so this result equals
    ``substring_spans(full corpus)`` restricted to the batch's documents —
    that equality is the test gate. Scale shape: history is ONE FileScan
    of (h, n_occ) partials re-aggregated by hash (never re-shingled);
    only the batch's own text is shingled again for its positions — a
    map-side pass over the increment, not the corpus."""
    all_counts = store.read(spark, SPAN_INDEX_TABLE)
    if all_counts is None:
        raise ValueError(f"no snapshots committed to {SPAN_INDEX_TABLE}")
    dup_h = (
        all_counts.groupBy("h")
        .agg(F.sum("n_occ").alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("h")
    )
    sp = shingle_positions(batch, n, text_col, id_col)
    return _spans_from_dup_positions(sp.join(dup_h, "h", "left_semi"), n)


def remove_repeated_spans(
    df: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text",
    id_col: str = "doc_id", spans: DataFrame | None = None,
) -> DataFrame:
    """APPLY the span-level dedup (the step after :func:`substring_spans`
    finds the spans): drop every word covered by a repeated-substring
    span and re-join the survivors — the corpus-cleaning half of the
    Lee et al. 2021 pipeline. Returns
    (doc_id, clean_text, n_kept, n_removed) for EVERY input document
    (documents without spans pass through unchanged).

    Distributed shape (100 TB story): the span relation is tiny relative
    to the corpus (only repeated regions survive), collected per doc_id
    into an array by ONE groupBy and left-joined back; the word drop is
    a pure Catalyst higher-order filter (two-arg lambda gives the word
    index; an EXISTS over the doc's span array covers it) — the corpus
    text is never exploded and never crosses a shuffle. Pass ``spans``
    (a precomputed/persisted :func:`substring_spans` relation) to avoid
    re-shingling the corpus when the caller already has it."""
    if spans is None:
        spans = substring_spans(df, n, text_col, id_col)
    span_t = "array<struct<span_start:bigint,span_end:bigint>>"
    sp_agg = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    docs = df.select(
        F.col(id_col).alias("doc_id"), words_col(F.col(text_col)).alias("_ws")
    )
    joined = docs.join(sp_agg, "doc_id", "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array().cast(span_t))
    )
    kept = F.filter(
        F.col("_ws"),
        lambda w, i: ~F.exists(
            F.col("_spans"),
            lambda s: ((i + 1) >= s["span_start"]) & ((i + 1) <= s["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_kept"),
        (F.size("_ws") - F.size(kept)).cast("bigint").alias("n_removed"),
    )


def remove_spans_sql(
    table: str, n: int = SPAN_NGRAM, text_col: str = "text",
    id_col: str = "doc_id", spans_rel: str | None = None,
) -> str:
    """DuckDB twin of :func:`remove_repeated_spans`: the spans CTE is the
    :func:`substring_spans_sql` query verbatim — or, when ``spans_rel``
    names an already-defined relation/CTE, that relation (the SQL sibling
    of the function's ``spans`` parameter; a caller that also selects the
    spans themselves shares ONE evaluation instead of DuckDB re-running
    the shingle+group pipeline per reference). The word drop is a list
    comprehension whose IF clause runs a nested ``list_filter`` lambda
    capturing the comprehension index (DuckDB supports the capture)."""
    ws = words_sql(text_col)
    keep = (
        "[ d.w[i] FOR i IN generate_series(1, len(d.w)) "
        "IF len(list_filter(COALESCE(a.spans, CAST([] AS BIGINT[][])), "
        "s -> i >= s[1] AND i <= s[2])) = 0 ]"
    )
    spans_src = spans_rel or f"({substring_spans_sql(table, n, text_col, id_col)})"
    return f"""
        WITH spans_rel AS (SELECT * FROM {spans_src}),
        agg AS (
            SELECT doc_id, list([span_start, span_end]) AS spans
            FROM spans_rel GROUP BY doc_id
        ),
        docs AS (SELECT {id_col} AS doc_id, {ws} AS w FROM {table})
        SELECT doc_id,
               COALESCE(array_to_string(kept, ' '), '') AS clean_text,
               CAST(len(kept) AS BIGINT) AS n_kept,
               CAST(n_words - len(kept) AS BIGINT) AS n_removed
        FROM (
            SELECT d.doc_id, len(d.w) AS n_words, {keep} AS kept
            FROM docs d LEFT JOIN agg a USING (doc_id)
        ) t
    """


def remove_token_spans_sql(
    table: str, n: int = SPAN_NGRAM, tokens_col: str = "tokens",
    id_col: str = "doc_id", spans_rel: str | None = None,
) -> str:
    """DuckDB twin of :func:`remove_repeated_token_spans`. Emits the kept
    tokens pre-joined as ``clean_str`` (comma-separated decimal, the same
    canonical text the gate hashes — a raw INTEGER[] cell is unsortable in
    the driver's pandas canonicalizer, same reason tokens_roundtrip digests
    its arrays)."""
    keep = (
        "[ d.w[i] FOR i IN generate_series(1, len(d.w)) "
        "IF len(list_filter(COALESCE(a.spans, CAST([] AS BIGINT[][])), "
        "s -> i >= s[1] AND i <= s[2])) = 0 ]"
    )
    spans_src = spans_rel or f"({token_substring_spans_sql(table, n, tokens_col, id_col)})"
    return f"""
        WITH tok_spans_rel AS (SELECT * FROM {spans_src}),
        agg AS (
            SELECT doc_id, list([span_start, span_end]) AS spans
            FROM tok_spans_rel GROUP BY doc_id
        ),
        docs AS (SELECT {id_col} AS doc_id, {tokens_col} AS w FROM {table})
        SELECT doc_id,
               COALESCE(array_to_string(kept, ','), '') AS clean_str,
               CAST(len(kept) AS BIGINT) AS n_kept,
               CAST(n_words - len(kept) AS BIGINT) AS n_removed
        FROM (
            SELECT d.doc_id, len(d.w) AS n_words, {keep} AS kept
            FROM docs d LEFT JOIN agg a USING (doc_id)
        ) t
    """


def dup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Near-dup clustering: connected components over a pair relation
    (id_a, id_b) via iterative min-label propagation — the dedup step that
    picks ONE representative per duplicate group.

    Each iteration is one join + aggregate (labels against the undirected
    edge set); convergence is checked with a cheap count of changed labels.
    At 10^12-row scale the edge relation comes from LSH (sparse); iteration
    count is bounded by the cluster diameter (small for dup clusters).
    Raises if ``max_iters`` is hit with labels still changing — silently
    returning unconverged labels would diverge from the exact
    recursive-closure oracle on long duplicate chains.
    Returns (id, cluster_id) with cluster_id = min id in the component.
    """
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # localCheckpoint (eager) truncates lineage each iteration — without it
    # the logical plan doubles per round and Catalyst analysis time blows up
    # (the classic iterative-DataFrame trap).
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    for i in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_cid = F.least(
            F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
        )
        # the changed-label count rides the checkpoint job as an observed
        # metric — ONE action per iteration, not checkpoint + count
        obs = Observation(f"dup_clusters_{i}")
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                new_cid.alias("cluster_id"),
                (new_cid != F.col("cluster_id")).cast("long").alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("changed"))
            .drop("_chg")
            .localCheckpoint(eager=True)
        )
        changed = obs.get["changed"] or 0
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dup_clusters did not converge within {max_iters} iterations "
        f"({changed} labels still changing); raise max_iters — the cap is a "
        "safety valve, not a truncation point"
    )


def dup_clusters_sql(edges_sql: str) -> str:
    """DuckDB oracle twin: recursive min-reachability closure over the same
    edge relation (``edges_sql`` must yield columns id_a, id_b)."""
    return f"""
        WITH RECURSIVE e AS (
            SELECT id_a AS src, id_b AS dst FROM ({edges_sql}) t
            UNION ALL
            SELECT id_b, id_a FROM ({edges_sql}) t
        ),
        reach(id, r) AS (
            SELECT DISTINCT src, src FROM e
            UNION
            SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
        )
        SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """
