"""Record ISOLATED sf1 spot watermarks (round-11 verdict item 2).

Runs each sf1 spot query min-of-3 in a fresh process doing nothing
else — the isolated protocol SCALING.md's adjudications use — and
prints one JSON object per query with the sf0.1 and sf1 minimums,
spreads, and the ratio.  The sf1 minimums are the values to paste into
bench.py's `_SF1_ISOLATED_WATERMARKS` (with provenance in SCALING.md).

Usage:
    python tools/spot_isolated.py [query ...]   # default: all spots
    python tools/spot_isolated.py --headline    # headline-suite total
                                                # (round-13 verdict
                                                # item 2): min-of-3 +
                                                # stall-confirmation per
                                                # headline query at
                                                # $SPARK_GRAFT_SF_DIR,
                                                # prints the total to
                                                # paste into bench.py's
                                                # _HEADLINE_ISOLATED_WATERMARKS
    python tools/spot_isolated.py --wikidump    # plain/bz2/markup row
                                                # minima (round-14
                                                # verdict item 4) for
                                                # _WIKIDUMP_ISOLATED_WATERMARKS

Run on a quiet host: no concurrent pytest or bench (see SCALING.md's
host-variance protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the replica builders + query sets)
from wikihadoop_spark.relational import QUERIES  # noqa: E402
from wikihadoop_spark.session import get_spark  # noqa: E402


def _run(spark, name: str, data_dir: str) -> None:
    if name == "curation_e2e":
        bench._curate_e2e(spark, data_dir)
    else:
        QUERIES[name](spark, data_dir).count()


def _min3(spark, name: str, data_dir: str) -> tuple[float, float]:
    _run(spark, name, data_dir)  # warm plan + codegen
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _run(spark, name, data_dir)
        dts.append(time.perf_counter() - t0)
    return min(dts), max(dts) - min(dts)


def _headline_total(spark, sf_dir: str) -> None:
    """Isolated headline-suite watermark: the exact bench.py protocol
    (sf0.001 codegen warmup, sequential parquet prewarm before each
    pass, per-query min-of-3 PLUS the confirmed-min stall fallback —
    round-14 ADVICE: the tool used to lack the _needs_stall_rerun
    loop, so its readings were not protocol-identical to the bench
    they calibrate) in a process doing nothing else."""
    import glob

    for name in bench.HEADLINE:
        bench.QUERIES[name](spark, "/root/testdata/sf0.001").count()

    def prewarm() -> None:
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass

    raw: dict[str, list[float]] = {n: [] for n in bench.HEADLINE}
    for _ in range(3):
        prewarm()
        for name in bench.HEADLINE:
            t0 = time.perf_counter()
            bench.QUERIES[name](spark, sf_dir).count()
            raw[name].append(time.perf_counter() - t0)
    # stall fallback, same rule as bench.main(): an UNCONFIRMED
    # minimum gets up to _STALL_EXTRA_RUNS extra timed runs
    for name in bench.HEADLINE:
        for _ in range(bench._STALL_EXTRA_RUNS):
            if not bench._needs_stall_rerun(raw[name]):
                break
            prewarm()
            t0 = time.perf_counter()
            bench.QUERIES[name](spark, sf_dir).count()
            raw[name].append(time.perf_counter() - t0)
    mins = {n: round(min(v), 3) for n, v in raw.items()}
    print(
        json.dumps(
            {
                "headline_isolated_total_sec": round(sum(mins.values()), 3),
                "sf_dir": sf_dir,
                "queries": mins,
                "queries_spread": {
                    n: round(max(v) - min(v), 3) for n, v in raw.items()
                },
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("spot-isolated", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if "--headline" in sys.argv[1:]:
        _headline_total(spark, sf_dir)
        spark.stop()
        return
    if "--wikidump" in sys.argv[1:]:
        # isolated wikidump-row watermarks (round-14 verdict item 4):
        # the full plain/bz2/markup pipeline bench — already
        # min-of-3 + stall-confirmed internally — in a process doing
        # nothing else; the sec minima are the values for bench.py's
        # _WIKIDUMP_ISOLATED_WATERMARKS (provenance in SCALING.md)
        w = bench._bench_wikidump(spark)
        print(
            json.dumps(
                {
                    "wikidump_isolated": {
                        "plain": {"sec": w["sec"], "input_gb": w["input_gb"]},
                        "bz2": {
                            "sec": w["bz2"]["sec"],
                            "input_gb": w["input_gb"],
                        },
                        "markup": {
                            "sec": w["markup"]["sec"],
                            "input_gb": w["markup"]["input_gb"],
                        },
                    }
                }
            )
        )
        spark.stop()
        return
    spot_dir, span_dir = bench._sf1_replica_dirs(spark, sf_dir)

    wanted = sys.argv[1:]
    plan = [(n, spot_dir) for n in bench._SF1_SPOT_QUERIES] + [
        (n, span_dir) for n in bench._SF1_SPAN_QUERIES
    ]
    if wanted:
        plan = [(n, d) for n, d in plan if n in wanted]

    out = {}
    for name, sf1_dir in plan:
        b01, s01 = _min3(spark, name, sf_dir)
        b1, s1 = _min3(spark, name, sf1_dir)
        out[name] = {
            "sf0.1_sec": round(b01, 3),
            "sf0.1_spread": round(s01, 3),
            "sf1_sec": round(b1, 3),
            "sf1_spread": round(s1, 3),
            "x": round(b1 / b01, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"watermarks": {n: v["sf1_sec"] for n, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
