"""Text analysis for training-data pipelines (SURVEY-mandated additions):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Catalyst expressions (JVM-side, codegen'd) — and
every kernel has an exact DuckDB-SQL twin for the oracle gate, built from
the same constants so they cannot drift.

Portability invariants (Spark <-> DuckDB):
- integer arithmetic only until the final division (IEEE doubles divide
  bit-identically given identical operands)
- hashes derive from md5 hex (identical in both engines); 60-bit prefixes
  parse via base-16 (Spark ``conv``, DuckDB ``'0x'||s`` cast) staying
  BIGINT-safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deliberately tiny, deterministic stopword lists (language-ID heuristic)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
}

BPE_ISH_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"  # word | digit | other-symbol


# PII scrubbing patterns — deliberately simple character-class regexes that
# parse identically under java.util.regex (Spark) and RE2 (DuckDB); no
# backrefs, no lookaround.
REDACT_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
}


def redact_col(text, order=("email", "url")):
    """Replace PII spans with <KIND> placeholders, in a fixed pattern order
    (emails before urls: an email inside a url query-string would otherwise
    change depending on order). Pure Catalyst regexp_replace chain."""
    from pyspark.sql import functions as F

    out = text
    for kind in order:
        out = F.regexp_replace(out, REDACT_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def redact_sql(text_expr: str, order=("email", "url")) -> str:
    out = text_expr
    for kind in order:
        # DuckDB single-quoted strings keep backslashes literal — the RE2
        # pattern text is identical to the Java one, no re-escaping
        out = f"regexp_replace({out}, '{REDACT_PATTERNS[kind]}', '<{kind.upper()}>', 'g')"
    return out


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher/C4-style intra-document repetition signals (public filters:
    Rae et al. 2021 §A1.1): per doc, the count of its MOST FREQUENT word
    bigram and the (micro fixed-point) fraction of bigram slots it
    occupies — highly repetitive boilerplate scores near 1. All integer
    counts until one final division. Explode -> per-(doc,bigram) count ->
    per-doc max: two partial-aggregated shuffles on (doc_id[, bigram]),
    never a self-join. Returns (doc_id, n_bigrams, top_bigram_n,
    top_bigram_micro); docs with < 2 words emit 0/0/0."""
    from pyspark.sql import functions as F

    ws = df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("_ws"))
    grams = F.when(
        F.size(F.col("_ws")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_ws")) - 1),
            lambda i: F.concat(
                F.element_at(F.col("_ws"), i), F.lit(" "), F.element_at(F.col("_ws"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        ws.select("id", F.explode(grams).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = per_gram.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_n")
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("top_bigram_n", F.lit(0)).cast("bigint").alias("top_bigram_n"),
            F.coalesce(
                micro_col(F.col("top_bigram_n").cast("double") / F.col("n_bigrams")),
                F.lit(0),
            ).cast("bigint").alias("top_bigram_micro"),
        )
    )


def repetition_stats_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    ws = words_sql(text_col)
    return f"""
        WITH w AS (SELECT {id_col} AS id, {ws} AS ws FROM {table}),
        grams AS (
            SELECT id, unnest([ws[i] || ' ' || ws[i+1]
                               for i in generate_series(1, len(ws) - 1)]) AS g
            FROM w WHERE len(ws) >= 2
        ),
        per_gram AS (SELECT id, g, COUNT(*) AS c FROM grams GROUP BY id, g),
        per_doc AS (
            SELECT id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_n FROM per_gram GROUP BY id
        )
        SELECT d.{id_col},
               CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(p.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
               CAST(COALESCE({micro_sql('CAST(p.top_bigram_n AS DOUBLE) / p.n_bigrams')}, 0) AS BIGINT) AS top_bigram_micro
        FROM {table} d LEFT JOIN per_doc p ON p.id = d.{id_col}
    """


def doc_freq_score(df, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-frequency quality score (training-data curation signal): for
    each doc, the mean corpus frequency of its word OCCURRENCES — high =
    boilerplate/common-word text, low = rare-token noise. Two-pass shape:
    corpus word counts (map-side partial agg), shuffle-join back to the
    occurrence relation on ``word``, re-aggregate per doc. All integers
    until one final division (micro fixed-point) — cross-engine exact.
    Returns (doc_id, n_words, sum_freq, mean_freq_micro)."""
    from pyspark.sql import functions as F  # local alias for clarity

    words = df.select(
        F.col(id_col).alias("id"), F.explode(words_col(F.col(text_col))).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    joined = words.join(counts, "word")
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("wc").alias("sum_freq"),
        micro_col(F.sum("wc").cast("double") / F.count(F.lit(1))).alias("mean_freq_micro"),
    ).select(F.col("id").alias(id_col), "n_words", "sum_freq", "mean_freq_micro")


def doc_freq_score_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`doc_freq_score`."""
    ws = words_sql(text_col)
    return f"""
        WITH words AS (
            SELECT {id_col} AS id, unnest({ws}) AS word FROM {table}
        ),
        counts AS (SELECT word, COUNT(*) AS wc FROM words GROUP BY word)
        SELECT w.id AS {id_col},
               COUNT(*)::BIGINT AS n_words,
               CAST(SUM(c.wc) AS BIGINT) AS sum_freq,
               {micro_sql('CAST(SUM(c.wc) AS DOUBLE) / COUNT(*)')} AS mean_freq_micro
        FROM words w JOIN counts c USING (word)
        GROUP BY w.id
    """


def words_col(text: Column) -> Column:
    """Whitespace tokenization (empty-safe). The separator class is
    EXPLICIT, not ``\\s``: Java's \\s includes \\x0B where RE2's does not
    — text containing a vertical tab would tokenize differently between
    the Spark query and its DuckDB oracle (self-review round 5)."""
    return F.split(F.trim(text), "[ \\t\\n\\x0B\\f\\r]+")


def words_sql(text_expr: str) -> str:
    # trim(x, ' ') NOT trim(x): DuckDB's default trim strips unicode
    # spaces (NBSP etc.) while Spark's F.trim strips 0x20 only — an
    # edge-NBSP corpus would diverge (self-review round 5). The explicit
    # separator class mirrors words_col (\v = \x0B in RE2; RE2's \s
    # lacks it while Java's \s has it).
    return f"regexp_split_to_array(trim({text_expr}, ' '), '[ \\t\\n\\v\\f\\r]+')"


def micro_col(x: Column) -> Column:
    """Portable fixed-point: floor(x*1e6 + 0.5) as BIGINT. Spark's ROUND on
    doubles goes through the shortest decimal repr (BigDecimal.valueOf) while
    DuckDB rounds the scaled binary double — they disagree 1 ulp at decimal
    boundaries. Pure double arithmetic + floor is bit-identical in both."""
    return F.floor(x * 1000000.0 + 0.5).cast("bigint")


def micro_sql(x_expr: str) -> str:
    return f"CAST(FLOOR(({x_expr}) * 1000000.0 + 0.5) AS BIGINT)"


def hex60_col(s: Column) -> Column:
    """First 60 bits of md5 as BIGINT (portable hash)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def hex60_sql(s_expr: str) -> str:
    return f"CAST(('0x' || substr(md5({s_expr}), 1, 15)) AS BIGINT)"


def token_count_cols(text: Column, words: Column | None = None) -> list[Column]:
    """Token counting: whitespace tokens + a BPE-ish regex token count.

    Pass a pre-materialized ``words`` column (own projection) in hot paths:
    Catalyst does NOT CSE a ``split`` referenced from several higher-order
    lambdas in one projection — measured 12x on doc_fingerprint."""
    return [
        F.size(words if words is not None else words_col(text)).alias("n_ws_tokens"),
        F.regexp_count(text, F.lit(BPE_ISH_RE)).alias("n_bpe_tokens"),
    ]


def token_count_sql(text_expr: str) -> list[str]:
    return [
        f"len({words_sql(text_expr)}) AS n_ws_tokens",
        f"len(regexp_extract_all({text_expr}, '{BPE_ISH_RE}')) AS n_bpe_tokens",
    ]


def quality_cols(text: Column, words: Column | None = None) -> list[Column]:
    """Quality scoring: length / mean word length / stopword ratio /
    alpha ratio, and a composite score. Ratios output as micro-int
    fixed-point (see micro_col). Pass pre-materialized ``words`` in hot
    paths (see token_count_cols)."""
    ws = words if words is not None else words_col(text)
    n_words = F.size(ws)
    n_chars = F.length(text)
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS["en"])))
    n_alpha = F.regexp_count(text, F.lit("[a-zA-Z]"))
    mean_wl = (n_chars - (n_words - 1)).cast("double") / n_words
    stop_ratio = n_stop.cast("double") / n_words
    alpha_ratio = n_alpha.cast("double") / n_chars
    score = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + stop_ratio * 0.25
        + alpha_ratio * 0.25
    )
    return [
        n_words.alias("n_words"),
        n_stop.alias("n_stopwords"),
        micro_col(mean_wl).alias("mean_word_len_micro"),
        micro_col(stop_ratio).alias("stopword_ratio_micro"),
        micro_col(alpha_ratio).alias("alpha_ratio_micro"),
        micro_col(score).alias("quality_score_micro"),
    ]


def quality_sql(text_expr: str) -> list[str]:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    ws = words_sql(text_expr)
    n_words = f"len({ws})"
    n_stop = f"len(list_filter({ws}, w -> w IN ({stop_list})))"
    n_alpha = f"len(regexp_extract_all({text_expr}, '[a-zA-Z]'))"
    n_chars = f"length({text_expr})"
    mean_wl = f"CAST({n_chars} - ({n_words} - 1) AS DOUBLE) / {n_words}"
    stop_ratio = f"CAST({n_stop} AS DOUBLE) / {n_words}"
    alpha_ratio = f"CAST({n_alpha} AS DOUBLE) / {n_chars}"
    score = (
        f"LEAST(CAST({n_words} AS DOUBLE) / 100.0, 1.0) * 0.5"
        f" + ({stop_ratio}) * 0.25 + ({alpha_ratio}) * 0.25"
    )
    return [
        f"{n_words} AS n_words",
        f"{n_stop} AS n_stopwords",
        f"{micro_sql(mean_wl)} AS mean_word_len_micro",
        f"{micro_sql(stop_ratio)} AS stopword_ratio_micro",
        f"{micro_sql(alpha_ratio)} AS alpha_ratio_micro",
        f"{micro_sql(score)} AS quality_score_micro",
    ]


def lang_guess_col(text: Column, words: Column | None = None) -> Column:
    """Language-ID n-gram/stopword heuristic: argmax stopword-hit count,
    ties broken by language code order; no hits at all -> 'und'.

    Round 7: all per-language hit counts fold in ONE aggregate pass over
    the word array (a struct accumulator) instead of one interpreted
    filter traversal per language — same counts, same left-to-right
    strict-greater argmax."""
    ws = words if words is not None else words_col(text)
    langs = sorted(STOPWORDS)
    acc0 = F.struct(*[F.lit(0).alias(lang) for lang in langs])
    cstruct = F.aggregate(
        ws,
        acc0,
        lambda acc, w: F.struct(
            *[
                (acc[lang] + w.isin(*STOPWORDS[lang]).cast("int")).alias(lang)
                for lang in langs
            ]
        ),
    )
    counts = [(lang, cstruct[lang]) for lang in langs]
    best = None
    best_count = None
    for lang, cnt in counts:
        if best is None:
            best, best_count = F.lit(lang), cnt
        else:
            cond = cnt > best_count
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_count = F.when(cond, cnt).otherwise(best_count)
    return F.when(best_count > 0, best).otherwise(F.lit("und"))


def lang_guess_sql(text_expr: str) -> str:
    ws = words_sql(text_expr)
    cnt = {
        lang: f"len(list_filter({ws}, w -> w IN ({', '.join(repr(w) for w in wl)})))"
        for lang, wl in sorted(STOPWORDS.items())
    }
    langs = sorted(STOPWORDS)
    # same left-to-right argmax with > (strict) as the Column fold above
    expr, count_expr = f"'{langs[0]}'", cnt[langs[0]]
    for lang in langs[1:]:
        expr = f"CASE WHEN {cnt[lang]} > {count_expr} THEN '{lang}' ELSE {expr} END"
        count_expr = f"GREATEST({cnt[lang]}, {count_expr})"
    return f"CASE WHEN {count_expr} > 0 THEN {expr} ELSE 'und' END"


def gopher_cols(text: Column, words: Column | None = None) -> list[Column]:
    """Gopher-style word-level repetition/length filters (public: Rae et
    al. 2021 §A1.1): duplicate-word fraction, most-frequent-word occupancy,
    short-word (<=2 chars) and long-word (>=8 chars) fractions, max word
    length. Pure Catalyst higher-order functions — all integer counts until
    the final micro division."""
    ws = words if words is not None else words_col(text)
    n = F.size(ws)
    distinct_n = F.size(F.array_distinct(ws))
    # most-frequent-word count via max run length over the SORTED word
    # array — O(n) per doc. The round-6 formulation (count each distinct
    # word with a nested filter) was O(n x distinct) interpreted lambda
    # calls and dominated the whole profile at sf1.0 (guide §1.2: fix the
    # per-task algorithm). Identical value: sorting groups equal words, so
    # the longest run IS the highest count; empty arrays yield NULL like
    # array_max over an empty transform did.
    run_state = F.aggregate(
        F.array_sort(ws),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: F.greatest(acc["best"], acc["run"]),
    )
    top_n = F.when(n > 0, run_state)
    # short/long/max-word-length fold in ONE aggregate pass (round 7 —
    # three separate interpreted traversals before); greatest() skips the
    # NULL initial max, so empty arrays still yield NULL max_word_len
    # like array_max over an empty transform did
    slm = F.aggregate(
        ws,
        F.struct(
            F.lit(0).alias("s"),
            F.lit(0).alias("l"),
            F.lit(None).cast("int").alias("m"),
        ),
        lambda acc, w: F.struct(
            (acc["s"] + (F.length(w) <= 2).cast("int")).alias("s"),
            (acc["l"] + (F.length(w) >= 8).cast("int")).alias("l"),
            F.greatest(acc["m"], F.length(w)).alias("m"),
        ),
    )
    short_n = slm["s"]
    long_n = slm["l"]
    return [
        micro_col((n - distinct_n).cast("double") / n).alias("dup_word_micro"),
        micro_col(top_n.cast("double") / n).alias("top_word_micro"),
        micro_col(short_n.cast("double") / n).alias("short_word_micro"),
        micro_col(long_n.cast("double") / n).alias("long_word_micro"),
        slm["m"].alias("max_word_len"),
    ]


def gopher_sql(text_expr: str) -> list[str]:
    ws = words_sql(text_expr)
    n = f"len({ws})"
    distinct_n = f"len(list_distinct({ws}))"
    top_n = (
        f"list_max(list_transform(list_distinct({ws}),"
        f" w -> len(list_filter({ws}, x -> x = w))))"
    )
    short_n = f"len(list_filter({ws}, w -> length(w) <= 2))"
    long_n = f"len(list_filter({ws}, w -> length(w) >= 8))"
    return [
        f"{micro_sql(f'CAST({n} - {distinct_n} AS DOUBLE) / {n}')} AS dup_word_micro",
        f"{micro_sql(f'CAST({top_n} AS DOUBLE) / {n}')} AS top_word_micro",
        f"{micro_sql(f'CAST({short_n} AS DOUBLE) / {n}')} AS short_word_micro",
        f"{micro_sql(f'CAST({long_n} AS DOUBLE) / {n}')} AS long_word_micro",
        f"CAST(list_max(list_transform({ws}, w -> length(w))) AS INT) AS max_word_len",
    ]


def fingerprint_cols(text: Column, words: Column | None = None) -> list[Column]:
    """Document fingerprinting: full-text md5 + a rolling min-hash over word
    3-grams (shift-resistant near-dup fingerprint). Pass pre-materialized
    ``words`` in hot paths (see token_count_cols)."""
    ws = words if words is not None else words_col(text)
    n = F.size(ws)
    # try_element_at: out-of-range -> NULL (concat_ws skips NULLs, matching
    # DuckDB's list[i] semantics; plain element_at throws under ANSI mode)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.try_element_at(ws, i), F.try_element_at(ws, i + 1), F.try_element_at(ws, i + 2)
    )
    grams = F.transform(F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))), gram)
    return [
        F.md5(text).alias("md5_fp"),
        F.array_min(F.transform(grams, lambda g: hex60_col(g))).alias("rolling_fp"),
    ]


def fingerprint_sql(text_expr: str) -> list[str]:
    ws = words_sql(text_expr)
    gram = f"concat_ws(' ', {ws}[i], {ws}[i+1], {ws}[i+2])"
    return [
        f"md5({text_expr}) AS md5_fp",
        f"list_min([ {hex60_sql(gram)} for i in generate_series(1, GREATEST(len({ws}) - 2, 1)) ]) AS rolling_fp",
    ]
