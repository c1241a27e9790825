"""Round-17 measurement harness (guide §1: measure first).

For each named catalog query, split the per-invocation cost into
  build_s  — Python DataFrame construction (plan assembly, driver-side)
  plan_s   — forcing analysis + optimization + physical planning
             (df._jdf.queryExecution().executedPlan(), driver-side)
  exec_s   — min-of-3 noop-sink execution (computes every column of
             every row; guide §1.4) timed from the ALREADY-BUILT df,
             so executor compute is isolated from plan assembly
  e2e_s    — min-of-3 of the bench's own convention (fresh build +
             .count()) for comparability with BENCH_SELF.json

and dump `.explain("formatted")` to plans/r18/<name>_<tag>.txt.

Usage:
  python tools/profile_r18.py [--tag before|after] [--sink noop|count]
      [--queries a,b,c | --headline | --extras]
Writes JSON to /tmp/profile_r18_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wikihadoop_spark.relational import QUERIES  # noqa: E402
from wikihadoop_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary", "q3_top_revenue", "q5_revenue_by_nation",
    "join_inner_agg", "agg_cube", "window_rank_topk", "window_lag_pairs",
    "sessionize_events", "asof_join_events_orders", "range_join_near_orders",
    "minhash_lsh_pairs", "similarity_topk", "text_quality", "text_fingerprint",
]
EXTRAS = [
    "dedup_clusters", "dedup_verify_pairs", "dedup_keeper_quality",
    "ngram_overlap", "text_repetition", "sample_stratified", "sample_mixture",
    "text_tfidf_topk", "decontaminate_exact", "decontaminate_ngram",
    "decontaminate_bloom", "text_quality_model", "chunk_documents",
    "text_scrub_pii", "pack_token_budget", "dedup_line_frequency",
    "dsir_weights", "text_c4_clean", "dedup_span_exact", "semantic_dedup",
    "text_lm_surprisal", "text_lm_bigram", "sketch_count_min",
    "mixture_waterfill", "similarity_topk_int8", "text_lm_buckets",
    "similarity_topk_int8_lsh", "similarity_topk_int8_ivf",
    "embedding_cosine_dedup_int8", "similarity_probe_int8_stream_analog",
]


def main() -> None:
    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    plans_only = "--plans-only" in sys.argv
    names = HEADLINE
    if "--extras" in sys.argv:
        names = EXTRAS
    elif "--all" in sys.argv:
        names = HEADLINE + EXTRAS
    elif "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("wikihadoop-profile-r18", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(REPO, "plans", "r18")
    os.makedirs(plans_dir, exist_ok=True)

    # warm codegen at the tiny sf, same as the bench
    if not plans_only:
        for name in names:
            QUERIES[name](spark, "/root/testdata/sf0.001").count()

    import glob

    def prewarm() -> None:
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # -- build (plan assembly, driver python)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        build_s = time.perf_counter() - t0
        # -- planning (analysis + optimization + physical plan)
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        plan_s = time.perf_counter() - t0
        # -- plan dump
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
        if plans_only:
            out[name] = {"build_s": round(build_s, 3), "plan_s": round(plan_s, 3)}
            print(json.dumps({name: out[name]}), flush=True)
            continue
        # -- execution from the pre-built df (noop sink)
        execs = []
        for _ in range(3):
            prewarm()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        # -- bench convention: fresh build + count
        e2es = []
        for _ in range(3):
            prewarm()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            e2es.append(time.perf_counter() - t0)
        out[name] = {
            "build_s": round(build_s, 3),
            "plan_s": round(plan_s, 3),
            "exec_noop_min3_s": round(min(execs), 3),
            "e2e_count_min3_s": round(min(e2es), 3),
            "e2e_spread_s": round(max(e2es) - min(e2es), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    path = f"/tmp/profile_r18_{tag}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
