"""Subword tokenizer-apply (text -> token ids) — VERDICT r4 item 8.

A training-data pipeline needs text->tokens, not just pre-tokenized
sequences. This implements the deployable half exactly: GREEDY LONGEST-
MATCH-FIRST subword encoding (the WordPiece inference rule, Wu et al.
2016; also how learned BPE merge tables are commonly applied) over a
deterministically corpus-derived vocabulary:

- vocab = every single character of the corpus words + the TOP_K most
  frequent character n-grams (n = 2..NGRAM_MAX) counted over word
  OCCURRENCES, ties broken lexicographically; token id = rank of the
  piece in lexicographic order. One aggregation pass in both engines.
- encode = per word, repeatedly take the LONGEST vocab piece prefixing
  the remainder (single chars guarantee progress on corpus text).

Why not the merge-loop BPE TRAINER: learning a merge list is k sequential
full-corpus passes whose SQL oracle needs k unrolled MATERIALIZED CTE
levels — the exactness gate would cost more than the operator teaches
(decision recorded in TODO.md). Greedy longest-match over a frequency
vocab is exactly replayable instead: the DuckDB twin computes per-(word,
pos) greedy step lengths (a join against the vocab, position-independent)
and walks them with a LINEAR recursive CTE (pointer chasing — each row
spawns at most one successor), so Spark and SQL agree token-for-token.

Scale design (100 TB story): the vocab is tiny and BROADCAST (Spark
auto-broadcasts the dict closure with the mapInPandas kernel); encoding
is one Arrow-batched map-side pass over the corpus — zero shuffle, no
driver collect of data (only the bounded vocab relation, TOP_K + alphabet
rows, ever reaches the driver — same class as the OPQ energy scalars).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import words_col, words_sql

NGRAM_MAX = 4  # longest vocab piece
TOP_K = 48  # frequency-ranked multi-char pieces kept in the vocab


def train_vocab(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    top_k: int = TOP_K, ngram_max: int = NGRAM_MAX,
) -> dict[str, int]:
    """Corpus-derived vocab: piece -> token id (rank in lexicographic
    order). Distributed aggregation; only the bounded (top_k + alphabet)
    relation is collected."""
    occ = docs.select(F.explode(words_col(F.col(text_col))).alias("word")).filter(
        F.length("word") > 0
    )
    gram_cols = [
        F.when(
            F.length("word") >= n,
            F.transform(
                F.sequence(F.lit(1), F.length("word") - n + 1),
                _substr_maker(n),
            ),
        ).otherwise(F.array().cast("array<string>"))
        for n in range(2, ngram_max + 1)
    ]
    grams = occ.select(F.explode(F.flatten(F.array(*gram_cols))).alias("piece"))
    top = (
        grams.groupBy("piece")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(top_k)
        .select("piece")
    )
    singles = (
        occ.distinct()
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")), _substr_maker(1)
                )
            ).alias("piece")
        )
        .distinct()
    )
    pieces = sorted({r["piece"] for r in top.unionByName(singles).collect()})
    return {p: i + 1 for i, p in enumerate(pieces)}


def _substr_maker(n: int):
    """Closure factory (a default-arg lambda would become a two-parameter
    (element, index) HOF lambda — the classic PySpark trap)."""
    return lambda i: F.col("word").substr(i, F.lit(n))


# MUST mirror words_col/words_sql exactly: Java/RE2 \s is ASCII-only and
# Spark/DuckDB trim strips 0x20 only — Python's unicode-aware \s/strip()
# would split NBSP/U+2000../NEL and hash-mismatch the oracle on any
# corpus containing non-ASCII whitespace
_WS = re.compile(r"\s+", re.ASCII)


def encode_docs(
    docs: DataFrame, vocab: dict[str, int],
    text_col: str = "text", id_col: str = "doc_id", ngram_max: int = NGRAM_MAX,
) -> DataFrame:
    """Greedy longest-match encode via an Arrow-batched mapInPandas kernel
    with the (broadcast) vocab dict. Emits one row per doc with >= 1
    token: (doc_id, n_tokens, tokens_md5) — md5 over the comma-joined id
    sequence, so the driver hash pins every token id and its order.
    A character outside the vocab raises (corpus-derived vocabs cover the
    corpus by construction; silence would mean dropped text)."""
    vset = dict(vocab)  # captured by the kernel closure -> shipped once per task

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        word_cache: dict[str, list[int]] = {}

        def enc_word(word: str) -> list[int]:
            toks = word_cache.get(word)
            if toks is not None:
                return toks
            toks = []
            pos = 0
            L = len(word)
            while pos < L:
                for n in range(ngram_max, 0, -1):
                    piece = word[pos : pos + n]
                    tid = vset.get(piece)
                    if tid is not None:
                        toks.append(tid)
                        pos += len(piece)
                        break
                else:
                    raise ValueError(f"character {word[pos]!r} not in vocab")
            word_cache[word] = toks
            return toks

        for pdf in batches:
            ids, n_toks, md5s = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[int] = []
                for word in _WS.split((text or "").strip(" ")):
                    if word:
                        toks.extend(enc_word(word))
                if not toks:
                    continue  # mirror the oracle's inner-join semantics
                ids.append(doc_id)
                n_toks.append(len(toks))
                md5s.append(hashlib.md5(",".join(map(str, toks)).encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "n_tokens": n_toks, "tokens_md5": md5s}
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, n_tokens long, tokens_md5 string"
    )


def subword_oracle_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id",
    top_k: int = TOP_K, ngram_max: int = NGRAM_MAX,
) -> str:
    """DuckDB twin: same vocab, same greedy walk. Per-(word, pos) greedy
    step lengths are position-independent, so the sequential scan becomes
    pointer chasing — a LINEAR recursive CTE (each row spawns at most one
    successor), not an exponential unroll."""
    ws = words_sql(text_col)
    gram_unions = "\n    UNION ALL\n    ".join(
        f"SELECT unnest([substr(word, i, {n}) for i in"
        f" generate_series(1, len(word) - {n - 1})]) AS g FROM occ"
        for n in range(2, ngram_max + 1)
    )
    return f"""
WITH w AS (SELECT {id_col} AS doc_id, {ws} AS ws FROM {table}),
occ AS (
  SELECT doc_id,
         unnest(ws) AS word,
         unnest(generate_series(1, len(ws))) AS widx
  FROM w
),
words AS (SELECT DISTINCT word FROM occ WHERE len(word) > 0),
grams AS (
  SELECT g AS piece, COUNT(*) AS c FROM (
    {gram_unions}
  ) GROUP BY 1
),
topk AS (SELECT piece FROM grams ORDER BY c DESC, piece ASC LIMIT {top_k}),
singles AS (
  SELECT DISTINCT unnest([substr(word, i, 1) for i in generate_series(1, len(word))]) AS piece
  FROM words
),
vid AS (
  SELECT piece, ROW_NUMBER() OVER (ORDER BY piece) AS tok_id
  FROM (SELECT piece FROM topk UNION SELECT piece FROM singles)
),
wp AS (SELECT word, unnest(generate_series(1, len(word))) AS pos FROM words),
steps AS (
  SELECT word, pos, MAX(len(piece)) AS step, arg_max(tok_id, len(piece)) AS tok_id
  FROM (
    SELECT wp.word, wp.pos, v.piece, v.tok_id
    FROM wp JOIN vid v ON substr(wp.word, wp.pos, len(v.piece)) = v.piece
  ) GROUP BY word, pos
),
walk AS (
  WITH RECURSIVE r(word, pos) AS (
    SELECT word, CAST(1 AS BIGINT) FROM words
    UNION ALL
    SELECT r.word, r.pos + s.step FROM r JOIN steps s ON s.word = r.word AND s.pos = r.pos
  ) SELECT * FROM r
),
wtoks AS (
  SELECT wk.word, list(s.tok_id ORDER BY wk.pos) AS toks
  FROM walk wk JOIN steps s ON s.word = wk.word AND s.pos = wk.pos
  GROUP BY wk.word
),
dtoks AS (
  SELECT o.doc_id, flatten(list(t.toks ORDER BY o.widx)) AS toks
  FROM occ o JOIN wtoks t USING (word) GROUP BY o.doc_id
)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       md5(array_to_string(toks, ',')) AS tokens_md5
FROM dtoks
"""


VOCAB_TABLE = "subword_vocab"


def vocab_train_persist(
    spark, store, docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    top_k: int = TOP_K, ngram_max: int = NGRAM_MAX,
) -> int:
    """Train the vocab ONCE and commit (piece, tok_id) as a snapshot of the
    same store that holds the LSH bands, span counts, and ANN models —
    round 6 completes the set: every trained artifact in the repo persists
    through one atomic-commit interface. At 100 TB the vocab aggregation is
    a full-corpus pass; apply-to-new-batch runs read the frozen relation
    back (:func:`vocab_load`) instead of re-counting n-grams per batch.
    Returns the committed snapshot id."""
    vocab = train_vocab(docs, text_col, id_col, top_k, ngram_max)
    vdf = spark.createDataFrame(sorted(vocab.items()), "piece string, tok_id int")
    return store.append(vdf, VOCAB_TABLE)


def vocab_load(spark, store) -> dict[str, int]:
    """Read the frozen vocab back (one tiny snap= FileScan; the relation is
    bounded by TOP_K + alphabet, the same class of driver-side collect as
    training itself). Encoding a batch containing a character the frozen
    vocab has never seen stays LOUD (encode_docs raises) — the operating
    model is retrain-or-extend, not silent text drop; a real tokenizer's
    [UNK] id slots in at the encode kernel's else-branch."""
    df = store.read(spark, VOCAB_TABLE)
    if df is None:
        raise ValueError(f"no vocab committed to {VOCAB_TABLE}")
    return {r["piece"]: r["tok_id"] for r in df.collect()}
