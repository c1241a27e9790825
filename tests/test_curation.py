"""End-to-end curation pipeline: planted low-quality docs, exact dups,
near-dups, and eval-set contamination must each fall out at the right
stage, with observe-based counters auditing every stage in the single
plan."""

from __future__ import annotations

import pytest

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


def test_curation_full_option_matrix_matches_composed_oracle(spark, tmp_path):
    """Round-7 verdict item 7: the gate's `curate_pipeline` row proves
    ONE configuration (uniform mixture, min_id keeper, no scrub, no
    waterfill).  This drill runs scrub=True + keeper='best_quality' +
    waterfill=True + weighted mixture + chunking + shard packing
    TOGETHER on the real sf0.001 corpus and replays the whole chain
    stage-by-stage in DuckDB — the per-stage oracles are individually
    driver-gated; this pins their full-option COMPOSITION, down to the
    md5 of every chunk.  Waterfill thresholds come from an independent
    one-at-a-time greedy reference (same fixpoint as the batch rounds
    in operators/mixture.py by water-filling monotonicity), not from
    the operator."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_util import duckdb_conn

    from wikihadoop_spark.relational import _SQL_TOKENS, _sql_lsh_pairs

    SF = "/root/testdata/sf0.001"
    SCALE = 1_000_000
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    out = str(tmp_path / "shards")
    res = curate_corpus(
        docs,
        benchmark=bench,
        scrub=True,
        keeper="best_quality",
        mixture_weights={"src0": 5},
        token_budget=30000,
        waterfill=True,
        chunk_tokens=32,
        chunk_stride=24,
        shard_budget=2000,
        out_dir=out,
    )
    got = {
        (r.doc_id, r.source, r.chunk_idx, r.n_tokens, r.m)
        for r in res.curated.select(
            "doc_id", "source", "chunk_idx", "n_tokens",
            F.md5("chunk_text").alias("m"),
        ).collect()
    }

    con = duckdb_conn(SF)
    # stage 0: PII scrub (same Java∩RE2 patterns, same order)
    con.execute(r"""
      CREATE TEMP TABLE scrubbed AS
      SELECT doc_id, source,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\d{9,}', '<ID>', 'g') AS text
      FROM documents""")
    # stage 1+2: quality filter (score rides along for the keeper),
    # then exact dedup (min id per normalized fingerprint)
    con.execute(f"""
      CREATE TEMP TABLE q AS
      SELECT * FROM (
        SELECT *, COALESCE(list_sum(list_transform({_SQL_TOKENS},
                 t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001 - 1000)), 0)
                 AS score
        FROM scrubbed
      ) WHERE score > 0""")
    con.execute("""
      CREATE TEMP TABLE ex1 AS
      SELECT q.*, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
      FROM q
      QUALIFY doc_id = MIN(doc_id) OVER (
        PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))""")
    # stage 3: capped LSH pairs -> connected components -> best-quality
    # keeper (max score per component, min id tiebreak)
    con.execute(f"""
      CREATE TEMP TABLE cc AS
      WITH RECURSIVE edges AS (
        SELECT id_a, id_b FROM ({_sql_lsh_pairs(src="ex1")})
        WHERE est_jaccard >= 0.5
      ),
      e AS (
        SELECT id_a AS s, id_b AS d FROM edges
        UNION SELECT id_b, id_a FROM edges
      ),
      reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM ex1
        UNION
        SELECT e.d, reach.lbl FROM reach JOIN e ON e.s = reach.node
      )
      SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node""")
    con.execute("""
      CREATE TEMP TABLE nd AS
      SELECT ex1.* FROM ex1 JOIN cc USING (doc_id)
      QUALIFY row_number() OVER (
        PARTITION BY cc.component ORDER BY ex1.score DESC, ex1.doc_id) = 1""")
    # stage 4: decontamination (benchmark fingerprints on RAW text)
    con.execute("""
      CREATE TEMP TABLE dec AS
      SELECT * FROM nd WHERE fp NOT IN (
        SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
        FROM documents WHERE doc_id % 97 = 0)""")
    # stage 5: weighted waterfill mixture — group totals from DuckDB,
    # thresholds from an independent greedy reference
    con.execute(f"""
      CREATE TEMP TABLE tok AS
      SELECT doc_id, source, text,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens
      FROM dec""")
    totals = dict(
        con.execute(
            "SELECT source, SUM(n_tokens) FROM tok GROUP BY source"
        ).fetchall()
    )
    weights = {g: (5 if g == "src0" else 1) for g in totals}

    def ref_waterfill(totals, weights, budget):
        active = {g for g, a in totals.items() if a > 0}
        remaining = budget
        thr = {g: 0 for g in totals if totals[g] <= 0}
        changed = True
        while changed and active:
            changed = False
            for g in sorted(active):
                sw = sum(weights[x] for x in active)
                if totals[g] * sw <= remaining * weights[g]:
                    thr[g] = SCALE
                    remaining -= totals[g]
                    active.discard(g)
                    changed = True
        sw = sum(weights[x] for x in active)
        for g in active:
            thr[g] = min(SCALE, (remaining * weights[g] * SCALE) // (sw * totals[g]))
        return thr

    thr = ref_waterfill(totals, weights, 30000)
    thr_values = ", ".join(f"('{g}', {t})" for g, t in sorted(thr.items()))
    # stage 6: md5-bucket keep filter + 32/24 chunking, chunk md5s
    rows = con.execute(f"""
      WITH thr(source, t) AS (VALUES {thr_values}),
      kept AS (
        SELECT tok.doc_id, tok.source, tok.text
        FROM tok JOIN thr USING (source)
        WHERE ('0x' || substr(md5('mix:' || tok.doc_id::VARCHAR), 1, 15))::BIGINT
                % {SCALE} < thr.t
      ),
      ktoks AS (SELECT doc_id, source, {_SQL_TOKENS} AS t FROM kept),
      knz AS (SELECT doc_id, source, t, len(t) AS n FROM ktoks WHERE len(t) > 0),
      ch AS (
        SELECT doc_id, source, unnest(range((n - 1) // 24 + 1)) AS k, t FROM knz
      )
      SELECT doc_id, source, CAST(k AS INT) AS chunk_idx,
             CAST(len(list_slice(t, k*24 + 1, k*24 + 32)) AS BIGINT) AS n_tokens,
             md5(array_to_string(list_slice(t, k*24 + 1, k*24 + 32), ' ')) AS m
      FROM ch""").fetchall()
    want = set(map(tuple, rows))
    assert got == want, (
        f"spark-only: {sorted(got - want)[:5]}; oracle-only: {sorted(want - got)[:5]}"
    )
    assert got, "composition produced an empty corpus — drill is vacuous"
    # packing wrote one dir per shard and reassembles the chunk corpus
    back = spark.read.parquet(out)
    assert back.count() == len(got)
    assert res.counts()["pii_redactions"] >= 0


def test_curation_strip_boilerplate_stage(spark):
    """With strip_boilerplate=True the chain removes corpus-frequent
    lines (keeping the corpus-first copy) BEFORE near-dup signatures —
    two documents identical except for shared boilerplate must still
    both survive near-dedup on their distinct prose, the counter must
    record the stripped segments, and n_tokens must reflect the
    stripped text."""
    from pyspark.sql import functions as F

    banner = "subscribe to our newsletter today"
    rows = [
        (1, f"{banner}\nthe quick brown fox jumps over the lazy dog", "a"),
        (2, f"{banner}\nan entirely different discussion of spark plans", "a"),
        (3, f"{banner}\nthird unique prose about distributed joins", "b"),
        (4, "no boilerplate here at all just words", "b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    res = curate_corpus(
        docs, quality_threshold=-(10**9), strip_boilerplate=True
    )
    got = {r.doc_id: r.text for r in res.curated.collect()}
    res.unpersist()
    assert set(got) == {1, 2, 3, 4}  # nothing near-dup-collapsed
    assert got[1] == f"{banner}\nthe quick brown fox jumps over the lazy dog"
    assert got[2] == "an entirely different discussion of spark plans"
    assert got[3] == "third unique prose about distributed joins"
    assert got[4] == "no boilerplate here at all just words"
    c = res.counts()
    assert c["boilerplate_segments_removed"] == 2  # docs 2 and 3
    # n_tokens derives from the STRIPPED text
    nt = {r.doc_id: r.n_tokens for r in res.curated.select("doc_id", "n_tokens").collect()}
    assert nt[2] == 7 and nt[3] == 6

    # without the stage the shared banner glues docs into near-dup
    # clusters only if prose is similar — regardless, the flag off
    # must keep the banner everywhere
    res2 = curate_corpus(docs, quality_threshold=-(10**9))
    got2 = {r.doc_id: r.text for r in res2.curated.collect()}
    res2.unpersist()
    assert all(banner in t for d, t in got2.items() if d != 4)
    assert "boilerplate_segments_removed" not in res2.counts()


def test_curation_strip_recomputes_fingerprint_and_quality(spark):
    """The boilerplate strip rewrites text, so the decontamination
    fingerprint and the best_quality keeper score must describe the
    POST-strip bytes: a document that becomes byte-identical to a
    benchmark row only after the banner is stripped must still be
    removed by stage 4 (regression: the chain once filtered on the
    pre-strip __fp and leaked the eval text verbatim)."""
    banner = "subscribe to our newsletter today"
    secret = "the secret benchmark answer text nobody should train on"
    rows = [
        (1, f"{banner}\nthe quick brown fox jumps over the lazy dog", "a"),
        (2, f"{banner}\n{secret}", "a"),
        (3, f"{banner}\nthird unique prose about distributed joins", "b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    bench = spark.createDataFrame([(secret,)], ["text"])
    res = curate_corpus(
        docs,
        quality_threshold=-(10**9),
        strip_boilerplate=True,
        benchmark=bench,
    )
    got = {r.doc_id: r.text for r in res.curated.collect()}
    c = res.counts()
    res.unpersist()
    assert 2 not in got, "post-strip benchmark-identical doc leaked"
    assert set(got) == {1, 3}
    assert c["near_dedup"] - c["decontaminate"] == 1
    assert all(secret not in t for t in got.values())


def test_curation_dsir_stage_filters_off_target_docs(spark):
    """With a fitted lambda table, stage 1.5 drops below-threshold
    documents right after the quality gate and the dsir counter
    records survivors; with the knob off the chain is unchanged."""
    from pyspark.sql import functions as F

    from wikihadoop_spark.operators.dsir import (
        bucket_distributions,
        collect_lambda_table,
        dsir_score_rowwise,
    )

    rows = [(1, "epsilon zeta epsilon zeta epsilon", "t")] + [
        (100 + i, "gamma delta gamma delta gamma gamma delta", "r")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    dist = bucket_distributions(docs, F.col("source") == "t").persist()
    lam = collect_lambda_table(dist)
    scores = {
        r.doc_id: r.dsir_bits for r in dsir_score_rowwise(docs, lam).collect()
    }
    dist.unpersist()
    assert scores[1] > 0 > scores[100]  # the fixture separates cleanly

    res = curate_corpus(
        docs, quality_threshold=-(10**9), dsir_lambda=lam, dsir_min_bits=0
    )
    kept = {r.doc_id for r in res.curated.collect()}
    c = res.counts()
    res.unpersist()
    assert kept == {1}
    assert c["dsir"] == 1 and c["quality"] == 21

    res2 = curate_corpus(docs, quality_threshold=-(10**9))
    kept2 = {r.doc_id for r in res2.curated.collect()}
    res2.unpersist()
    assert 1 in kept2 and 100 in kept2  # near-dedup collapses the
    assert "dsir" not in res2.counts()  # identical fillers, not doc 1


@pytest.mark.slow
def test_curation_dedup_spans_stage(spark):
    """With dedup_spans=True the chain removes duplicated k-token spans
    at arbitrary offsets (keeping the corpus-first copy) BEFORE
    near-dup signatures; the counter records removed TOKENS, the stage
    never drops a document, and the decontamination fingerprint
    describes the post-rewrite bytes."""
    header = "all rights reserved by the original author"  # 7 tokens
    rows = [
        (1, f"alpha prose one {header} unique tail alpha", "a"),
        (2, f"beta different words {header} other ending beta", "a"),
        (3, "no duplicated span in this document at all", "b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    res = curate_corpus(
        docs, quality_threshold=-(10**9), dedup_spans=True, span_k=3
    )
    got = {r.doc_id: r.text for r in res.curated.collect()}
    c = res.counts()
    res.unpersist()
    assert set(got) == {1, 2, 3}  # the stage never drops a document
    assert got[1] == f"alpha prose one {header} unique tail alpha"  # owner
    assert got[2] == "beta different words other ending beta"
    assert got[3] == "no duplicated span in this document at all"
    assert c["span_tokens_removed"] == 7  # doc 2's header, one span

    # flag off: header retained everywhere, no counter
    res2 = curate_corpus(docs, quality_threshold=-(10**9))
    got2 = {r.doc_id: r.text for r in res2.curated.collect()}
    res2.unpersist()
    assert header in got2[1] and header in got2[2]
    assert "span_tokens_removed" not in res2.counts()

    # the rewrite recomputes __fp: a doc byte-identical to a benchmark
    # row only AFTER span removal must still be decontaminated
    bench = spark.createDataFrame(
        [("beta different words other ending beta",)], ["text"]
    )
    res3 = curate_corpus(
        docs,
        quality_threshold=-(10**9),
        dedup_spans=True,
        span_k=3,
        benchmark=bench,
    )
    got3 = {r.doc_id: r.text for r in res3.curated.collect()}
    res3.unpersist()
    assert 2 not in got3, "post-rewrite benchmark-identical doc leaked"
    assert set(got3) == {1, 3}


def test_curation_c4_rules_stage(spark):
    """With c4_rules=True the chain removes rule-failing lines and
    drops blocklisted pages BEFORE the quality gate; both counters
    fire, and the quality score describes the cleaned text."""
    rows = [
        (1, "a proper sentence that ends with a period.\nclick here", "a"),
        (2, "lorem ipsum dolor sit amet and then prose.", "a"),
        (3, "please enable javascript in your browser!\nreal prose that survives the rules.", "b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    res = curate_corpus(docs, quality_threshold=-(10**9), c4_rules=True)
    got = {r.doc_id: r.text for r in res.curated.collect()}
    c = res.counts()
    res.unpersist()
    assert 2 not in got  # lorem-ipsum page dropped
    assert got[1] == "a proper sentence that ends with a period."
    assert got[3] == "real prose that survives the rules."
    assert c["c4_pages"] == 2
    # doc1: 'click here' + doc3: javascript line = 2 lines removed
    assert c["c4_lines_removed"] == 2
    # flag off: no counters, pages intact
    res2 = curate_corpus(docs, quality_threshold=-(10**9))
    assert "c4_pages" not in res2.counts()
    assert res2.curated.count() == 3
    res2.unpersist()


def test_surprisal_rowwise_matches_join_scorer_exactly(spark):
    """The driver-held-table LM scorer (the chains' row-local gate)
    must replay the join-based scorer bit-for-bit: same whole-bit
    per-token surprisal (unseen tokens at the ceiling), same
    ``sum * 1000 div n_tokens`` integer fold, empty docs at 0 — so a
    gate threshold fitted on batch scores transfers to the stream with
    NO approximation to legislate.  Also pins the scale guard: the
    table rides as ONE constant-folded map literal, and keys that
    would break the literal's delimiters are rejected loudly."""
    import pytest
    from wikihadoop_spark.catalog import load_table
    from wikihadoop_spark.operators.lm_score import (
        collect_lm_table,
        lm_surprisal_score,
        surprisal_rowwise,
        unigram_model,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # reference model on the even half — the gate queries' fixture
    model = unigram_model(docs.filter(F.col("doc_id") % 2 == 0)).persist()
    batch = {
        r.doc_id: (r.n_tokens, r.lm_bits)
        for r in lm_surprisal_score(docs, model).collect()
    }
    table, ceil = collect_lm_table(model)
    model.unpersist()
    assert ceil >= 1 and table
    # an empty doc and an all-OOV doc ride along
    extra = spark.createDataFrame(
        [(100001, ""), (100002, "zzzqqq xxxyyy")], "doc_id bigint, text string"
    )
    rows = surprisal_rowwise(docs.unionByName(extra), table, ceil).collect()
    got = {r.doc_id: r.lm_bits for r in rows}
    assert all(got[d] == bits for d, (_, bits) in batch.items())
    assert got[100001] == 0  # empty doc scores 0, like the join scorer
    assert got[100002] == ceil * 1000  # all-OOV: ceiling per token

    with pytest.raises(ValueError, match="delimiters"):
        surprisal_rowwise(docs, {"a:b": 1}, 4)
    with pytest.raises(ValueError, match="already exists"):
        surprisal_rowwise(docs.withColumn("lm_bits", F.lit(0)), {"a": 1}, 4)


def test_surprisal_rowwise_property_fuzz(spark):
    """Property fuzz of the rowwise LM scorer against the join-based
    scorer: random small vocab tables and random token texts must
    score identically (the gate-threshold transfer depends on exact
    equality, not approximate agreement).  Uses one Spark round-trip
    per example batch to keep the fuzz fast."""
    import random

    from wikihadoop_spark.operators.lm_score import (
        collect_lm_table,
        lm_surprisal_score,
        surprisal_rowwise,
        unigram_model,
    )

    rng = random.Random(20260815)
    vocab = [f"tok{i}" for i in range(30)]
    for trial in range(3):
        # random reference corpus -> model
        ref_rows = [
            (i, " ".join(rng.choices(vocab[: rng.randint(3, 30)],
                                     k=rng.randint(1, 40))))
            for i in range(20)
        ]
        # random scored corpus: known tokens, OOV tokens, empty docs
        doc_rows = [
            (100 + i, " ".join(rng.choices(vocab + ["oovx", "oovy"],
                                           k=rng.randint(0, 25))))
            for i in range(30)
        ] + [(999, "")]
        ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
        docs = spark.createDataFrame(doc_rows, "doc_id bigint, text string")
        model = unigram_model(ref).persist()
        want = {
            r.doc_id: r.lm_bits
            for r in lm_surprisal_score(docs, model).collect()
        }
        table, ceil = collect_lm_table(model)
        model.unpersist()
        got = {
            r.doc_id: r.lm_bits
            for r in surprisal_rowwise(docs, table, ceil).collect()
        }
        assert got == want, (trial, {k: (got[k], want[k])
                                     for k in got if got[k] != want.get(k)})


def test_prune_lm_table_error_bound_property(spark):
    """prune_lm_table (round-11 verdict item 5): pruning keeps the
    most-frequent tokens and returns the max per-token error in bits
    (bitlen of the dropped counts).  Property, fuzzed over random
    models and corpora: for EVERY document,
    0 <= pruned_score - full_score <= 1000 * max_error_bits — pruning
    only raises surprisal (dropped tokens score the unseen ceiling)
    and the milli-bit fold shifts by at most the bound, because the
    bound times 1000 is an integer that commutes with the floor."""
    import random

    from wikihadoop_spark.operators.lm_score import (
        collect_lm_table,
        prune_lm_table,
        surprisal_rowwise,
        unigram_model,
    )

    rng = random.Random(20260815)
    vocab = [f"tok{i}" for i in range(40)]
    for trial in range(3):
        ref_rows = [
            (i, " ".join(rng.choices(vocab[: rng.randint(5, 40)],
                                     k=rng.randint(1, 60))))
            for i in range(25)
        ]
        doc_rows = [
            (100 + i, " ".join(rng.choices(vocab + ["oovx"],
                                           k=rng.randint(0, 30))))
            for i in range(25)
        ] + [(999, "")]
        ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
        docs = spark.createDataFrame(doc_rows, "doc_id bigint, text string")
        model = unigram_model(ref).persist()
        table, ceil = collect_lm_table(model)
        model.unpersist()
        for max_entries in (0, 3, len(table) // 2, len(table)):
            pruned, bound = prune_lm_table(table, ceil, max_entries)
            assert len(pruned) <= max_entries or max_entries >= len(table)
            assert set(pruned) <= set(table)
            # kept entries are the most frequent (lowest bits first)
            if pruned and len(pruned) < len(table):
                worst_kept = max(pruned.values())
                best_dropped = min(
                    v for k, v in table.items() if k not in pruned
                )
                assert worst_kept <= best_dropped
                assert bound == max(
                    ceil - v for k, v in table.items() if k not in pruned
                )
            full = {
                r.doc_id: r.lm_bits
                for r in surprisal_rowwise(docs, table, ceil).collect()
            }
            # empty pruned table: surprisal_rowwise needs >=0 entries —
            # score everything at the ceiling via an empty map
            got = {
                r.doc_id: r.lm_bits
                for r in surprisal_rowwise(docs, pruned, ceil).collect()
            }
            for d in full:
                diff = got[d] - full[d]
                assert 0 <= diff <= 1000 * bound, (
                    trial, max_entries, d, diff, bound
                )
    import pytest
    with pytest.raises(ValueError, match="max_entries"):
        prune_lm_table({"a": 1}, 4, -1)


def test_curation_gates_accept_pruned_lm_table(spark):
    """The pruned artifact is the same (table, ceiling) shape, so both
    curation chains accept it unchanged; a LOOSER table (pruning only
    raises scores) can only drop more documents, never fewer — and the
    half-supplied arg contract raises loudly on both chains (round-11
    advisor)."""
    import pytest

    from wikihadoop_spark.catalog import load_table
    from wikihadoop_spark.operators.lm_score import (
        collect_lm_table,
        prune_lm_table,
        unigram_model,
    )
    from wikihadoop_spark.plans.curation import curate_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    model = unigram_model(docs.filter(F.col("doc_id") % 2 == 0)).persist()
    table, ceil = collect_lm_table(model)
    model.unpersist()
    pruned, bound = prune_lm_table(table, ceil, max(1, len(table) // 4))
    assert bound > 0  # the fixture vocabulary actually got pruned
    gate = ceil * 700  # between typical scores and the OOV ceiling
    full_ids = {
        r.doc_id
        for r in curate_corpus(
            docs, lm_table=(table, ceil), lm_max_bits=gate
        ).curated.select("doc_id").collect()
    }
    pruned_ids = {
        r.doc_id
        for r in curate_corpus(
            docs, lm_table=(pruned, ceil), lm_max_bits=gate
        ).curated.select("doc_id").collect()
    }
    assert pruned_ids <= full_ids  # looser table only drops MORE

    with pytest.raises(ValueError, match="together"):
        curate_corpus(docs, lm_table=(table, ceil))
    with pytest.raises(ValueError, match="together"):
        curate_corpus(docs, lm_max_bits=gate)
    # the streaming chain's identical contract (the advisor flagged
    # both sites); a batch frame exercises the same code path
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    with pytest.raises(ValueError, match="together"):
        curate_stream(docs, lm_table=(table, ceil))
    with pytest.raises(ValueError, match="together"):
        curate_stream(docs, lm_max_bits=gate)
