"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline. Embeddings are
  quantized to integers (round(x*10000)) so dot products are EXACT integer
  arithmetic — cross-engine bit-identical, immune to float summation order —
  and cosine = int_dot / sqrt(int_norm_a * int_norm_b) divides identically
  in IEEE doubles. Ranking uses (rounded cosine, id) for deterministic ties.
- LSH-bucketed variant (the scale path): sign-bit bucket over the first
  SIGN_BITS dimensions; top-k search touches only the query's bucket.
  At 10^12 rows the bucket map-side partitions the corpus; brute force
  remains the per-bucket kernel.

All pure Catalyst (zip_with/aggregate) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import micro_sql

QUANT = 10000
SIGN_BITS = 8


def quantize(v: Column) -> Column:
    # floor(x*Q + 0.5), not ROUND: portable across engines (textstats.micro_col)
    return F.transform(
        v, lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("bigint")
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def cosine_col(qa: Column, qb: Column) -> Column:
    """Exact-int cosine of two QUANTIZED vectors, as micro fixed-point
    (floor(c*1e6+0.5) — see textstats.micro_col for why not ROUND)."""
    c = int_dot(qa, qb).cast("double") / F.sqrt(
        (int_dot(qa, qa) * int_dot(qb, qb)).cast("double")
    )
    return F.floor(c * 1000000.0 + 0.5).cast("bigint")


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): top-k by (cosine desc, id).

    The query side is broadcast (small); the corpus side streams — one
    narrow pass + a per-query top-k (window over query partitions)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_micro", cosine_col(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine_micro")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_micro"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(v: Column) -> Column:
    """LSH bucket: concatenated sign bits of the first SIGN_BITS dims."""
    bits = [
        F.when(F.try_element_at(v, F.lit(i + 1)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(SIGN_BITS)
    ]
    return F.concat(*bits)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize(F.col(vec_col)).alias("qv"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        quantize(F.col(vec_col)).alias("cv"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_micro", cosine_col(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine_micro")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_micro"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --- DuckDB oracle twins ---------------------------------------------------


def _quant_sql(v: str) -> str:
    return f"list_transform({v}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT))"


def _dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"


def brute_force_topk_sql(
    table: str, query_pred: str, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    return f"""
        WITH qz AS (SELECT {id_col} AS id, {_quant_sql(vec_col)} AS v FROM {table}),
        q AS (SELECT id AS query_id, v AS qv FROM qz WHERE {query_pred}),
        scored AS (
            SELECT q.query_id, c.id AS neighbor_id,
                   {micro_sql(f"CAST({_dot_sql('q.qv', 'c.v')} AS DOUBLE) / sqrt(CAST({_dot_sql('q.qv', 'q.qv')} * {_dot_sql('c.v', 'c.v')} AS DOUBLE))")} AS cosine_micro
            FROM q JOIN qz c ON c.id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine_micro,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_micro DESC, neighbor_id) AS INT) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


def sign_bucket_sql(v: str) -> str:
    bits = " || ".join(
        f"CASE WHEN {v}[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(SIGN_BITS)
    )
    return f"({bits})"


def lsh_topk_sql(
    table: str, query_pred: str, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    return f"""
        WITH qz AS (SELECT {id_col} AS id, {_quant_sql(vec_col)} AS v,
                           {sign_bucket_sql(vec_col)} AS bucket FROM {table}),
        q AS (SELECT id AS query_id, v AS qv, bucket FROM qz WHERE {query_pred}),
        scored AS (
            SELECT q.query_id, c.id AS neighbor_id,
                   {micro_sql(f"CAST({_dot_sql('q.qv', 'c.v')} AS DOUBLE) / sqrt(CAST({_dot_sql('q.qv', 'q.qv')} * {_dot_sql('c.v', 'c.v')} AS DOUBLE))")} AS cosine_micro
            FROM q JOIN qz c USING (bucket)
            WHERE c.id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine_micro,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_micro DESC, neighbor_id) AS INT) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


def all_pairs_cosine_micro(
    emb: DataFrame,
    threshold_micro: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine near-dup pairs via numpy-blocked EXACT-INT matmul.

    Why not Columns: Catalyst pushes the cosine filter into the
    BroadcastNestedLoopJoin condition, so the (interpreted, non-codegen)
    higher-order dot product evaluates for every n x n candidate — twice.
    Here each partition computes an int64 block-matmul (C speed) against a
    broadcast quantized corpus: the standard brute-force-ANN block design.
    At 10^12 scale the corpus side comes from LSH/IVF buckets, not a full
    broadcast (see lsh_topk); the kernel is the same.

    Exactness: quantized int64 dot products are exact; int64->float64 and
    the final division/sqrt are IEEE-identical to the DuckDB oracle.
    Emits (id_a, id_b, cosine_micro) with id_a < id_b, micro >= threshold.
    """
    import numpy as np

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.floor(
        np.asarray([r[1] for r in rows], dtype=np.float64) * QUANT + 0.5
    ).astype(np.int64)
    norms = (M * M).sum(axis=1)
    bc = emb.sparkSession.sparkContext.broadcast((ids, M, norms))

    def kernel(batches):
        import pandas as pd

        ids_all, M_all, norms_all = bc.value
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.floor(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                * QUANT + 0.5
            ).astype(np.int64)
            a_norms = (A * A).sum(axis=1)
            dots = A @ M_all.T  # exact int64
            cos = dots.astype(np.float64) / np.sqrt(
                (a_norms[:, None] * norms_all[None, :]).astype(np.float64)
            )
            micro = np.floor(cos * 1000000.0 + 0.5).astype(np.int64)
            keep = (micro >= threshold_micro) & (a_ids[:, None] < ids_all[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": ids_all[bi],
                    "cosine_micro": micro[ai, bi],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, "id_a long, id_b long, cosine_micro long"
    )


# --- IVF (inverted-file) variant --------------------------------------------

IVF_K = 16  # coarse centroids
IVF_NPROBE = 4  # buckets probed per query


def ivf_assign(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = IVF_K
) -> DataFrame:
    """IVF coarse assignment: nearest of K deterministic seed centroids
    (the first K vectors by id) under exact-int squared L2
    ``d = |a|^2 + |c|^2 - 2<a,c>``. Ties break by centroid index.

    The centroid side is tiny and broadcast; assignment is one narrow pass
    — the partitioning structure of an IVF index at any scale. (A trained
    k-means quantizer slots into the same shape; seeds keep the whole
    index reproducible in the DuckDB oracle.)
    Returns (id, v quantized, norm2, centroid int, dist bigint)."""
    qz = emb.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("v")
    ).withColumn("norm2", int_dot(F.col("v"), F.col("v")))
    cents = (
        qz.filter(F.col("id") < k)
        .select(
            F.col("id").cast("int").alias("cidx"),
            F.col("v").alias("cv"),
            F.col("norm2").alias("cn"),
        )
    )
    joined = qz.join(F.broadcast(cents)).withColumn(
        "dist", F.col("norm2") + F.col("cn") - 2 * int_dot(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("id").orderBy(F.asc("dist"), F.asc("cidx"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "v", "norm2", F.col("cidx").alias("centroid"), "dist")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the nprobe nearest centroid buckets per query,
    brute-force cosine inside them (query side broadcast)."""
    assigned = ivf_assign(emb, id_col, vec_col)
    # per query: the nprobe nearest centroids (distances to all centroids
    # computed for the query rows only)
    qz = emb.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    ).join(queries.select(F.col(id_col).alias("query_id")), "query_id", "left_semi")
    qz = qz.withColumn("qn", int_dot(F.col("qv"), F.col("qv")))
    cents = (
        emb.select(F.col(id_col).alias("cid"), quantize(F.col(vec_col)).alias("cv"))
        .filter(F.col("cid") < IVF_K)
        .withColumn("cn", int_dot(F.col("cv"), F.col("cv")))
        .select(F.col("cid").cast("int").alias("cidx"), "cv", "cn")
    )
    qc = qz.join(F.broadcast(cents)).withColumn(
        "dist", F.col("qn") + F.col("cn") - 2 * int_dot(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("cidx"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", F.col("cidx").alias("centroid"))
    )
    cands = probes.join(
        assigned.select(
            F.col("id").alias("neighbor_id"),
            F.col("v").alias("cv2"),
            F.col("norm2").alias("nn"),
            "centroid",
        ),
        "centroid",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = int_dot(F.col("qv"), F.col("cv2")).cast("double") / F.sqrt(
        (F.col("qn") * F.col("nn")).cast("double")
    )
    scored = cands.withColumn(
        "cosine_micro", F.floor(cos * 1000000.0 + 0.5).cast("bigint")
    ).select("query_id", "neighbor_id", "cosine_micro")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_micro"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk_sql(
    table: str, query_pred: str, k: int = 10, nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    dist = "qz.norm2 + c.cn - 2 * list_sum(list_transform(generate_series(1, len(qz.v)), i -> qz.v[i] * c.cv[i]))"
    return f"""
        WITH qz AS (
            SELECT {id_col} AS id, {_quant_sql(vec_col)} AS v,
                   {_dot_sql(_quant_sql(vec_col), _quant_sql(vec_col))} AS norm2
            FROM {table}
        ),
        cents AS (
            SELECT CAST(id AS INT) AS cidx, v AS cv, norm2 AS cn FROM qz WHERE id < {IVF_K}
        ),
        assigned AS (
            SELECT id, v, norm2, cidx AS centroid FROM (
                SELECT qz.id, qz.v, qz.norm2, c.cidx,
                       row_number() OVER (PARTITION BY qz.id ORDER BY {dist}, c.cidx) AS rn
                FROM qz CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT id AS query_id, v AS qv, norm2 AS qn, cidx AS centroid FROM (
                SELECT qz.id, qz.v, qz.norm2, c.cidx,
                       row_number() OVER (PARTITION BY qz.id ORDER BY {dist}, c.cidx) AS rn
                FROM qz CROSS JOIN cents c
                WHERE qz.id IN (SELECT {id_col} FROM {table} WHERE {query_pred.replace('id', id_col)})
            ) WHERE rn <= {nprobe}
        ),
        scored AS (
            SELECT p.query_id, a.id AS neighbor_id,
                   {micro_sql("CAST(list_sum(list_transform(generate_series(1, len(p.qv)), i -> p.qv[i] * a.v[i])) AS DOUBLE) / sqrt(CAST(p.qn * a.norm2 AS DOUBLE))")} AS cosine_micro
            FROM probes p JOIN assigned a USING (centroid)
            WHERE a.id <> p.query_id
        )
        SELECT query_id, neighbor_id, cosine_micro,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_micro DESC, neighbor_id) AS INT) AS rank
        FROM scored QUALIFY rank <= {k}
    """


def kmeans_int(
    emb: DataFrame,
    k: int = IVF_K,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained IVF coarse quantizer: integer k-means over quantized vectors.

    Fully deterministic and engine-portable by construction: init = first k
    vectors by id; assignment = exact-int squared L2 (ties to the lower
    centroid index); update = per-dimension floor(int_sum / count) (floor of
    an exact int ratio in doubles — both sums and counts are far below
    2^53). Empty clusters keep their previous centroid. Each iteration is
    one broadcast-assign pass + one posexplode aggregation — no driver-side
    math; centroid arrays are rebuilt with a deterministic sort.
    Returns (cidx int, cv array<bigint>) after ``iters`` Lloyd steps.
    """
    qz = emb.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("v")
    ).withColumn("norm2", int_dot(F.col("v"), F.col("v")))
    qz = qz.localCheckpoint(eager=True)
    cents = (
        qz.filter(F.col("id") < k)
        .select(F.col("id").cast("int").alias("cidx"), F.col("v").alias("cv"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        cn = cents.withColumn("cn", int_dot(F.col("cv"), F.col("cv")))
        joined = qz.join(F.broadcast(cn)).withColumn(
            "dist", F.col("norm2") + F.col("cn") - 2 * int_dot(F.col("v"), F.col("cv"))
        )
        w = Window.partitionBy("id").orderBy(F.asc("dist"), F.asc("cidx"))
        assigned = (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", "v", F.col("cidx").alias("centroid"))
        )
        dims = assigned.select(
            "centroid", F.posexplode(F.col("v")).alias("pos", "x")
        )
        sums = dims.groupBy("centroid", "pos").agg(
            F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
        )
        new_cents = (
            sums.withColumn(
                "cval",
                F.floor(F.col("s").cast("double") / F.col("n")).cast("bigint"),
            )
            .groupBy("centroid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("cval")))
                    ),
                    lambda e: e.getField("cval"),
                ).alias("cv")
            )
            .select(F.col("centroid").alias("cidx"), "cv")
        )
        # empty clusters keep their previous centroid
        cents = (
            cents.select("cidx", F.col("cv").alias("cv_old"))
            .join(new_cents, "cidx", "left")
            .select("cidx", F.coalesce("cv", "cv_old").alias("cv"))
            .localCheckpoint(eager=True)
        )
    return cents
