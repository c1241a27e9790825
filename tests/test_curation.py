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


def test_curation_scrub_and_chunk_stages(spark, tmp_path):
    """scrub=True must redact BEFORE anything derives from the text
    (the written corpus carries no PII and the redaction counter
    fires); chunk_tokens must turn curated docs into sequence windows
    that pack reproducibly via the (id, chunk_idx) tiebreak."""
    base = " ".join(POS)
    rows = [
        (1, base + " mail me a@b.com and 10.1.2.3 ref 987654321", "a"),
        (2, base + " clean and wordy " + " ".join(f"x{i}" for i in range(60)), "a"),
        (3, " ".join(NEG * 3), "a"),  # low quality -> dropped
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = str(tmp_path / "shards")
    res = curate_corpus(
        docs,
        scrub=True,
        chunk_tokens=16,
        chunk_stride=12,
        shard_budget=40,
        out_dir=out,
    )
    counts = res.counts()
    assert counts["pii_redactions"] == 3  # email + ip + id on doc 1
    assert counts["quality"] == 2 and counts["chunks"] > 2
    # chunk rows carry the group column and per-chunk token counts
    assert {"doc_id", "source", "chunk_idx", "n_tokens", "chunk_text"} <= set(
        res.curated.columns
    )
    body = " ".join(r.chunk_text for r in res.curated.collect())
    # chunk text is token-joined, so the <EMAIL>/<IP>/<ID> placeholders
    # surface as their alnum tokens — the PII itself must be gone
    assert "mail me email and ip ref id" in body
    assert "a@b.com" not in body and "987654321" not in body and "10.1.2.3" not in body
    # shards wrote and reassemble the chunk corpus
    import glob as _glob

    assert _glob.glob(f"{out}/shard=*/part-*.parquet")
    back = spark.read.parquet(out)
    assert back.count() == counts["chunks"]


def test_curation_counters_survive_zero_pair_corpus(spark):
    """Regression: a corpus yielding ZERO near-dup pairs empties the
    CC join, and AQE's empty-relation propagation used to prune the
    below-cache CollectMetrics from the first execution embedding
    them — resolving the input/quality/exact_dedup observations with
    an empty row and poisoning every later counts() read.  The chain
    now pins those counters with a real completion right after the
    persist, and the truncation counter's pruned-branch read is, by
    construction, zero."""
    base = " ".join(POS)
    rows = [
        (1, base + " mail me and ref", "a"),
        (2, base + " clean and wordy " + " ".join(f"x{i}" for i in range(60)), "a"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    res = curate_corpus(docs)
    counts = res.counts()
    assert counts["input"] == 2
    assert counts["quality"] == 2
    assert counts["exact_dedup"] == 2
    assert counts["near_dedup"] == 2
    assert counts["near_dedup_dropped_members"] == 0


def test_curation_empty_and_degenerate_corpora(spark, tmp_path):
    """An empty corpus (a date partition with zero documents) must
    flow through every knob combination with exact zero counters, and
    an all-low-quality corpus must keep its NONZERO input count —
    AQE's empty-relation propagation used to prune the observed
    subtree from the pinning action itself, losing it (the chain now
    excludes that rule while its own actions run)."""
    empty = spark.createDataFrame([], "doc_id bigint, text string, source string")
    for kw in (
        {},
        {"scrub": True},
        {"token_budget": 1000},
        {"token_budget": 1000, "waterfill": True},
        {"token_budget": 1000, "chunk_tokens": 16, "shard_budget": 50,
         "out_dir": str(tmp_path / "empty_shards")},
    ):
        res = curate_corpus(empty, **kw)
        assert res.curated.count() == 0, kw
        counts = res.counts()
        assert counts["input"] == 0 and counts["near_dedup"] == 0, (kw, counts)

    lowq = spark.createDataFrame(
        [(i, " ".join(NEG * 2), "a") for i in range(3)],
        ["doc_id", "text", "source"],
    )
    counts = curate_corpus(lowq).counts()
    assert counts["input"] == 3  # the nonzero below-the-empty-join count
    assert counts["quality"] == 0 and counts["near_dedup"] == 0
    # and the caller's AQE setting is restored (chain sets it only
    # while its own actions run)
    assert "AQEPropagateEmptyRelation" not in (
        spark.conf.get("spark.sql.adaptive.optimizer.excludedRules", "") or ""
    )
