"""Ad-hoc per-query measurement harness for the optimization rounds
(guide §1: noop-sink isolation, job labels, plan capture). NOT the frozen
driver bench — bench.py stays the measured contract; this file exists so
optimization work can time single queries at any SF and dump
``.explain("formatted")`` output without paying the full headline sweep.

Usage:
    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries dedup_substring_spans,token_bigrams_topk --reps 2 \
        --explain-dir plans/r07 --explain-suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="", help="comma list; empty = all headline")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--explain-suffix", default="")
    ap.add_argument("--no-time", action="store_true", help="explain only, skip timed reps")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry_mod
    from go_log_forwarder_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")

    qs = entry_mod.queries()
    names = [n for n in (args.queries.split(",") if args.queries else bench.HEADLINE) if n]
    timings: dict[str, list[float]] = {}
    for name in names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            path = os.path.join(args.explain_dir, f"{name}{args.explain_suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            bench.materialize(qs[name](spark, args.sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        timings[name] = samples
        print(json.dumps({"q": name, "samples": samples, "min": min(samples)}), flush=True)
        spark.sparkContext.setJobDescription(None)
    if timings:
        print(json.dumps({
            "sf_dir": args.sf_dir,
            "total_min": round(sum(min(s) for s in timings.values()), 2),
            "phases": entry_mod.PHASE_TIMES,
        }), flush=True)


if __name__ == "__main__":
    main()
