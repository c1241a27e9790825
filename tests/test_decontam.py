"""Bloom-filter n-gram decontamination: the beyond-broadcast-array
variant must never under-remove (no false negatives vs the exact
shingle-set check), over-remove only within the configured FP budget,
and keep the zero-corpus-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikihadoop_spark.catalog import load_table
from wikihadoop_spark.operators.decontam import (
    NgramBloom,
    build_ngram_bloom,
    decontaminate_ngram_bloom,
)
from wikihadoop_spark.operators.dedup import shingles

SF = "/root/testdata/sf0.001"


def _exact_kept_ids(docs, bench):
    bsh = bench.select(F.explode(shingles(F.col("text"), 3)).alias("s")).agg(
        F.collect_set("s").alias("bsh")
    )
    return {
        r.doc_id
        for r in docs.crossJoin(F.broadcast(bsh))
        .filter(~F.arrays_overlap(shingles(F.col("text"), 3), F.col("bsh")))
        .select("doc_id")
        .collect()
    }


def test_bloom_decontaminate_never_under_removes(spark):
    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    exact_kept = _exact_kept_ids(docs, bench)
    n_docs = docs.count()

    bloom = build_ngram_bloom(bench, bits_per_item=12, n_hashes=4)
    assert bloom.n_items > 0 and len(bloom.words) * 63 == bloom.n_bits
    bloom_kept = {
        r.doc_id
        for r in decontaminate_ngram_bloom(docs, bloom).select("doc_id").collect()
    }
    # no false negatives: every truly-contaminated doc is gone
    assert bloom_kept <= exact_kept
    # over-removal bounded: per-shingle FP ~0.65% at 12 bits / 4 hashes;
    # docs here carry ~100 shingles, so allow a generous 25% of the
    # truly-clean set (observed ~0-15% on this corpus shape)
    over = len(exact_kept) - len(bloom_kept)
    assert over <= max(5, len(exact_kept) // 4), (over, len(exact_kept), n_docs)
    # sanity: the filter actually removes the planted contamination
    assert len(exact_kept) < n_docs


def test_bloom_decontaminate_more_bits_remove_less(spark):
    """Sizing knob works: more bits per item -> fewer false positives,
    and the kept set only grows toward the exact answer."""
    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    kept_small = decontaminate_ngram_bloom(
        docs, build_ngram_bloom(bench, bits_per_item=6, n_hashes=3)
    ).count()
    kept_big = decontaminate_ngram_bloom(
        docs, build_ngram_bloom(bench, bits_per_item=20, n_hashes=4)
    ).count()
    exact = len(_exact_kept_ids(docs, bench))
    assert kept_small <= kept_big <= exact


def test_bloom_probe_plan_never_shuffles_corpus(spark):
    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    bloom = build_ngram_bloom(bench)
    plan = (
        decontaminate_ngram_bloom(docs, bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the only exchange is the broadcast of the single bloom row
    assert plan.count("Exchange") <= 1


def test_bloom_empty_benchmark_keeps_everything(spark):
    docs = load_table(spark, SF, "documents")
    empty = docs.filter(F.lit(False))
    bloom = build_ngram_bloom(empty)
    assert bloom.n_items == 0
    assert decontaminate_ngram_bloom(docs, bloom).count() == docs.count()
