"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec", "queries", "sf"}.

Each query is fully materialized via the noop writer (computes every column,
no sink I/O cost), after one untimed warm-up of the session + page cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


# Headline set: the parse→route→aggregate pipeline + tokens flagship +
# training-data ops. Excluded: dedup_jaccard_pairs / dedup_minhash_lsh
# (pairwise outputs explode quadratically on the synthetic word-soup corpus
# — they stay in queries() for the sf0.01 correctness gate), and the
# stream/resume/multimodal demos (temp-dir side effects, not throughput).
HEADLINE = [
    "route_per_sink_counts",
    "route_per_sink_source_counts",
    "json_parse_extract",
    "pipeline_metrics",
    "routed_rows_err_sink",
    "tag_sink_matrix",
    "enrich_broadcast_lookup",
    "regex_parse_groups",
    "grok_parse_groups",
    "parser_chain_first_match",
    "tokens_roundtrip_equality",
    "tokens_route_counts",
    "tokens_salted_per_source",
    "text_token_count",
    "text_quality",
    "text_lang_id",
    "doc_fingerprint",
    "text_doc_freq",
    "doc_chunks_overlap",
    "decontaminate",
    "text_redact",
    "text_repetition",
    "dedup_exact",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_pq_topk",
    "tcp_chunks",
    "multimodal_features",
    "multimodal_frames",
    "windowed_route_counts",
    "window_top_tags",
    "sessionize",
    "asof_enrich",
    "range_join_windows",
    "hll_user_sketch",
    "rollup_hour_day_week",
    "http_lines_split",
    "tokens_quality_filter",
    "tokens_pack_concat",
    "tokens_length_stats",
    "tokens_mix_sample",
    "tokens_dedup_exact",
    "token_bigrams_topk",
    "dedup_embedding_cosine",
    "dedup_clusters",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry_mod
    from go_log_forwarder_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    qs = entry_mod.queries()
    # warm-up: JVM JIT + parquet footer/page cache (untimed)
    materialize(entry_mod.q_route_per_sink_counts(spark, sf_dir))

    # min-of-N per query: the host is heavily time-shared (identical runs
    # vary up to 30x — see BASELINE.md); the minimum is the least-interfered
    # estimate of the actual cost.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "end-to-end parse→route→aggregate wall time, all headline queries",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
