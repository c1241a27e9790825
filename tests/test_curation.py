"""End-to-end curation pipeline: planted low-quality docs, exact dups,
near-dups, and eval-set contamination must each fall out at the right
stage, with observe-based counters auditing every stage in the single
plan."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from wikihadoop_spark.plans.curation import curate_corpus

# tokens with known hashed-weight signs (hash64(t) % 2001 - 1000):
# POS have weight > +50, NEG < -50 (see quality_score)
POS = "beta delta epsilon eta iota lam nu xi omicron rho tau upsilon phi chi omega red iron".split()
NEG = "spam noise drivel amet garbage refuse litter mess sludge".split()


def _corpus(spark):
    base = " ".join(POS)  # strongly positive 17-token base text
    rows = [
        # id, text, source
        (1, base + " one extra", "a"),          # keeper
        (2, base + " one extra", "a"),          # exact dup of 1 -> dropped
        (3, base + " two extra", "a"),          # near-dup of 1 -> dropped (16/18 shingles shared? est>=0.5)
        (4, " ".join(NEG * 3), "a"),            # low quality -> dropped
        (5, "omega chi phi upsilon tau rho benchmark leak", "b"),  # contaminated -> dropped
        (6, "red iron beta chi omega six unique tokens here", "b"),  # keeper (scrambled order: disjoint shingles)
        (7, " ".join(reversed(POS)) + " seven", "b"),  # keeper (different shingles)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_curation_stages_drop_the_planted_rows(spark, tmp_path):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [("OMEGA chi; phi upsilon -- tau rho benchmark LEAK?",)],
        ["text"],
    )  # normalizes to doc 5's fingerprint
    out = str(tmp_path / "shards")
    res = curate_corpus(
        docs,
        benchmark=bench,
        mixture_weights={"a": 1, "b": 1},
        token_budget=10**9,  # budget above supply: mixture keeps all
        shard_budget=20,
        out_dir=out,
    )
    kept = sorted(r.doc_id for r in res.curated.select("doc_id").collect())
    assert kept == [1, 6, 7]

    c = res.counts()
    assert c["near_dedup_dropped_members"] == 0
    assert c["input"] == 7
    assert c["quality"] == 6          # doc 4 out
    assert c["exact_dedup"] == 5      # doc 2 out
    assert c["near_dedup"] == 4       # doc 3 out
    assert c["decontaminate"] == 3    # doc 5 out
    assert c["mixture"] == 3          # keep-all budget

    # shards written, one file per shard, and they reassemble the corpus
    shard_dirs = glob.glob(os.path.join(out, "shard=*"))
    assert shard_dirs
    back = spark.read.parquet(out)
    assert sorted(r.doc_id for r in back.collect()) == [1, 6, 7]
    assert {os.path.basename(d) for d in shard_dirs} == {
        f"shard={r.shard}" for r in res.packed.select("shard").distinct().collect()
    }


def test_curation_minimal_knobs_runs_on_testdata(spark):
    """Default-knob run over the real documents table: monotone stage
    counts, no optional stages, curated stays non-empty."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = curate_corpus(docs)
    c = res.counts()  # eager build: valid before any caller action
    n = res.curated.count()
    assert set(c) == {
        "input", "quality", "exact_dedup", "near_dedup",
        "near_dedup_dropped_members",
    }
    assert c["input"] >= c["quality"] >= c["exact_dedup"] >= c["near_dedup"] == n > 0
    assert res.packed is None


def test_curation_counts_survive_limiting_first_action(spark):
    """The eager build materializes internally, so a caller whose first
    action is a limit cannot pin partial stage counts."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = curate_corpus(docs)
    res.curated.first()  # limiting action
    assert res.counts()["input"] == docs.count()


def test_curation_mixture_budget_only_is_uniform_and_weights_only_raises(spark):
    import pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = curate_corpus(docs, token_budget=5000)  # uniform default weights
    c = res.counts()
    assert "mixture" in c and 0 < c["mixture"] < c["near_dedup"]
    with pytest.raises(ValueError, match="without token_budget"):
        curate_corpus(docs, mixture_weights={"src0": 2})


def test_curation_best_quality_keeper(spark):
    """With keeper='best_quality' the surviving near-dup member is the
    highest-scoring one even when it has the larger id (min_id would
    keep the other)."""
    base = " ".join(POS)
    rows = [
        (1, base + " " + " ".join(NEG[:2]), "a"),   # near-dup, score dragged down
        (2, base + " " + " ".join(POS[:2]), "a"),   # near-dup, highest score
        (3, " ".join(reversed(POS)), "b"),          # unrelated keeper
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kept_min = sorted(
        r.doc_id for r in curate_corpus(docs).curated.select("doc_id").collect()
    )
    kept_best = sorted(
        r.doc_id
        for r in curate_corpus(docs, keeper="best_quality")
        .curated.select("doc_id")
        .collect()
    )
    assert kept_min == [1, 3]
    assert kept_best == [2, 3]


def test_curation_waterfill_without_budget_raises(spark):
    """--waterfill / waterfill=True without a token budget must raise
    (the mixture stage is skipped without one, so the flag would
    silently no-op), mirroring weights-without-budget."""
    import pytest

    with pytest.raises(ValueError, match="waterfill given without token_budget"):
        curate_corpus(_corpus(spark), waterfill=True)


def test_curation_rejects_colliding_input_columns(spark):
    """A corpus already carrying a working/output column (n_tokens is
    common) must be refused up front, not silently overwritten."""
    import pytest

    docs = _corpus(spark).withColumn("n_tokens", F.lit(7))
    with pytest.raises(ValueError, match="collide.*n_tokens"):
        curate_corpus(docs)
    # cum_tokens only collides when packing is requested
    docs2 = _corpus(spark).withColumn("cum_tokens", F.lit(1))
    curate_corpus(docs2)  # fine: no shard_budget
    with pytest.raises(ValueError, match="collide.*cum_tokens"):
        curate_corpus(docs2, shard_budget=100)
