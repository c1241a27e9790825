"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count); a
warmup pass on sf0.001 first touches code paths so JIT/codegen cost
doesn't land on query 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from wikihadoop_spark.relational import QUERIES
from wikihadoop_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_revenue_by_nation",
    "join_inner_agg",
    "agg_cube",
    "window_rank_topk",
    "window_lag_pairs",
    "sessionize_events",
    "asof_join_events_orders",
    "range_join_near_orders",
    "minhash_lsh_pairs",
    "similarity_topk",
    "text_quality",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = get_spark("wikihadoop-bench", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: run every headline query once at the tiny sf so whole-stage
    # codegen compilation (seconds for the wide minhash/window exprs) is
    # paid before timing — the timed runs then measure the engine.
    for name in HEADLINE:
        QUERIES[name](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
