"""Structured Streaming tests: windowed aggs with watermarks driven to
completion over a bounded parquet source, cross-checked against the
batch equivalents on the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikihadoop_spark.catalog import load_table
from wikihadoop_spark.operators.sessionize import sessionize
from wikihadoop_spark.streaming.windows import (
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events re-materialized with micro timestamps (the raw parquet's
    TIMESTAMP(NANOS) is unreadable by Spark's reader) + cast to tz
    timestamp, which streaming watermarks require."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    (
        load_table(spark, SF, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )


def test_tumbling_matches_batch(spark, events_dir):
    out = run_stream_to_memory(
        tumbling_counts(_stream(spark, events_dir)), "t_tumbling"
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {
        (r.window_start, r.event_type): r.n_events for r in out.collect()
    }
    exp = {(r.w.start, r.event_type): r.n_events for r in batch.collect()}
    # append mode emits only watermark-closed windows: subset match, and
    # the bulk of windows must have closed
    assert got
    assert len(got) >= len(exp) * 0.8
    for k, v in got.items():
        assert exp[k] == v, k


def test_sliding_each_event_in_two_windows(spark, events_dir):
    out = run_stream_to_memory(
        sliding_counts(_stream(spark, events_dir)), "t_sliding"
    )
    rows = out.collect()
    assert rows
    total_events = spark.read.parquet(events_dir).count()
    emitted = sum(r.n_events for r in rows)
    # 2h window sliding 1h: every event belongs to exactly 2 windows
    assert emitted <= 2 * total_events
    assert emitted >= 2 * total_events * 0.8


def test_session_window_matches_batch_sessionize(spark, events_dir):
    """Native streaming session_window == the batch lag/cumsum
    sessionization (same gap) for closed sessions."""
    out = run_stream_to_memory(
        session_counts(_stream(spark, events_dir), gap="30 minutes"),
        "t_sessions",
    )
    batch = (
        sessionize(
            spark.read.parquet(events_dir),
            key=["user_id"],
            ts="ts",
            gap_seconds=1800,
            order_tiebreak=["event_id"],
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    got = {(r.user_id, r.session_start): r.n_events for r in out.collect()}
    exp = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    assert got and len(got) >= len(exp) * 0.8
    for k, v in got.items():
        assert exp[k] == v, k


def test_streaming_dedup(spark, events_dir, tmp_path):
    """Watermarked dropDuplicates: re-delivered rows collapse to one."""
    dup_dir = str(tmp_path / "dups")
    src = spark.read.parquet(events_dir)
    src.union(src).coalesce(1).write.mode("overwrite").parquet(dup_dir)
    schema = src.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dup_dir)
    )
    out = run_stream_to_memory(streaming_dedup(stream), "t_dedup")
    n = out.count()
    assert n == src.count()


def test_stateful_anomaly_detector(spark, events_dir):
    """applyInPandasWithState: per-key Welford state persists across
    micro-batches (maxFilesPerTrigger=1 forces multiple batches) and
    flags the same anomalies a batch computation would."""
    from wikihadoop_spark.streaming.stateful import streaming_anomalies

    out = run_stream_to_memory(
        streaming_anomalies(_stream(spark, events_dir)), "t_anom"
    )
    rows = out.collect()
    # batch replication of the same running z-score logic
    import math

    events = (
        spark.read.parquet(events_dir)
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in sorted(events, key=lambda r: (r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    expected = set()
    for uid, rs in by_user.items():
        count, mean, m2 = 0, 0.0, 0.0
        for r in rs:
            v = float(r.value)
            if count >= 5:
                var = m2 / (count - 1)
                if var > 0 and abs((v - mean) / math.sqrt(var)) > 3.0:
                    expected.add((uid, r.event_id))
            count += 1
            d = v - mean
            mean += d / count
            m2 += d * (v - mean)
    got = {(r.user_id, r.event_id) for r in rows}
    assert got == expected
    assert expected, "fixture should contain at least one anomaly"


def test_streaming_stratified_sample_matches_batch(spark, tmp_path):
    """The deterministic md5-bucket sampler is stateless, so the same
    expression runs unchanged on a stream and MUST select exactly the
    batch sample regardless of arrival order / trigger slicing (a
    partition-seeded df.sample cannot promise this)."""
    from wikihadoop_spark.relational import QUERIES

    src = str(tmp_path / "docs")
    load_table(spark, SF, "documents").coalesce(3).write.mode("overwrite").parquet(src)

    batch = {
        (r.doc_id, r.lang, r.bucket, r.weight)
        for r in QUERIES["sample_stratified"](spark, SF).collect()
    }

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    # same transformation, expressed over the stream: swap the table
    # source by running the query body against a temp view is not
    # needed — the sampler is a pure projection+filter, so rebuild it
    # from the catalog query's own logic via a one-row-table trick:
    from pyspark.sql import functions as F

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 25).when(F.col("lang") == "zh", 50).otherwise(100)
    )
    weight = (
        F.when(F.col("lang") == "en", 4.0).when(F.col("lang") == "zh", 2.0).otherwise(1.0)
    )
    sampled = stream.select(
        "doc_id", "lang", bucket.alias("bucket"), weight.alias("weight")
    ).filter(F.col("bucket") < rate)

    q = (
        sampled.writeStream.format("memory")
        .queryName("t_sample")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.lang, r.bucket, r.weight)
        for r in spark.sql("SELECT * FROM t_sample").collect()
    }
    assert got == batch and batch


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    """Dedup NEW documents against an EXISTING corpus incrementally:
    arriving docs are signed row-locally (stateless — no aggregation
    state) and probe the persisted band-key signature index via a
    stream-static join.  The streaming candidates must equal the batch
    run of the same probe over the same rows."""
    from wikihadoop_spark.operators.dedup import minhash_signatures_rowwise
    from wikihadoop_spark.streaming.dedup_stream import (
        signature_index,
        stream_candidate_pairs,
    )

    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)

    idx_path = str(tmp_path / "sig_index")
    signature_index(
        minhash_signatures_rowwise(corpus, id_col="doc_id", text_col="text"),
        id_col="doc_id",
    ).write.mode("overwrite").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    batch = {
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in stream_candidate_pairs(new, index).collect()
    }

    new_path = str(tmp_path / "new_docs")
    new.repartition(3).write.mode("overwrite").parquet(new_path)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(new_path)
    )
    q = (
        stream_candidate_pairs(stream, index)
        .writeStream.format("memory")
        .queryName("t_incdedup")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in spark.sql("SELECT * FROM t_incdedup").collect()
    }
    assert got == batch and batch  # nonempty: corpus has near-dups of new docs


def test_streaming_quality_filter_and_mixture_match_batch(spark, tmp_path):
    """The training-data filter chain (hashed quality scorer → mixture
    sampler) is stateless row-local arithmetic, so it runs UNCHANGED on
    a stream: with thresholds frozen from a prior batch pass (how a
    production pipeline deploys them), the streamed selection must
    equal the batch selection exactly, under any trigger slicing."""
    from wikihadoop_spark.operators.dedup import hash64, tokens
    from wikihadoop_spark.operators.mixture import (
        SCALE,
        mixture_sample,
        mixture_thresholds,
    )

    src = str(tmp_path / "docs")
    docs = load_table(spark, SF, "documents")
    docs.coalesce(3).write.mode("overwrite").parquet(src)

    score = F.aggregate(
        tokens(F.col("text")),
        F.lit(0).cast("bigint"),
        lambda acc, tk: acc + (hash64(tk) % 2001 - 1000),
    )

    def filter_chain(df, thr_df):
        scored = df.filter(score > 0)
        bucket = hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % SCALE
        return (
            scored.join(F.broadcast(thr_df), "source")
            .filter(bucket < F.col("keep_threshold"))
            .select("doc_id", "source")
        )

    # batch pass: derive thresholds, then select
    kept_quality = docs.filter(score > 0)
    totals = {
        r["source"]: int(r["a"])
        for r in kept_quality.groupBy("source").agg(F.sum("n_chars").alias("a")).collect()
    }
    thr = mixture_thresholds(totals, {"src0": 5}, 20000, default_weight=1)
    thr_df = spark.createDataFrame(
        sorted(thr.items()), "source string, keep_threshold bigint"
    )
    batch = {tuple(r) for r in filter_chain(docs, thr_df).collect()}
    assert 0 < len(batch) < docs.count()
    # sanity: the chain equals the library operator on the same inputs
    lib = mixture_sample(
        kept_quality,
        group_col="source",
        tokens_col="n_chars",
        id_col="doc_id",
        weights={"src0": 5},
        token_budget=20000,
        default_weight=1,
    )
    assert {(r.doc_id, r.source) for r in lib.collect()} == batch

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = run_stream_to_memory(filter_chain(stream, thr_df), "qmix")
    got = {(r.doc_id, r.source) for r in out.collect()}
    assert got == batch


def test_incremental_dedup_watermark_collapse_matches_batch(spark, tmp_path):
    """The dropDuplicatesWithinWatermark variant must emit exactly ONE
    row per (new_id, corpus_id) pair — the multi-band duplicates the
    plain probe leaves in place collapse under bounded watermark state
    — and the collapsed stream must equal the batch probe deduped on
    the pair key."""
    from wikihadoop_spark.operators.dedup import minhash_signatures_rowwise
    from wikihadoop_spark.streaming.dedup_stream import (
        signature_index,
        stream_candidate_pairs,
        stream_candidate_pairs_collapsed,
    )

    docs = load_table(spark, SF, "documents").withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))
    )
    corpus = docs.filter(F.col("doc_id") < 400)
    # duplicate a corpus doc under a new id so at least one probe pair
    # definitely collides in ALL bands (identical signatures)
    planted = corpus.filter(F.col("doc_id") == 7).withColumn(
        "doc_id", F.lit(9001).cast(docs.schema["doc_id"].dataType)
    )
    new = docs.filter(F.col("doc_id") >= 400).unionByName(planted)

    idx_path = str(tmp_path / "sig_index")
    signature_index(
        minhash_signatures_rowwise(corpus, id_col="doc_id", text_col="text"),
        id_col="doc_id",
    ).write.mode("overwrite").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    raw = stream_candidate_pairs(new, index, carry_cols=("ts",))
    batch = {
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in raw.dropDuplicates(["new_id", "corpus_id"]).collect()
    }
    # the planted all-band duplicate really exercises the collapse
    n_raw = raw.filter(
        (F.col("new_id") == 9001) & (F.col("corpus_id") == 7)
    ).count()
    assert n_raw == 4  # one emission per band before collapsing

    new_path = str(tmp_path / "new_docs")
    new.repartition(3).write.mode("overwrite").parquet(new_path)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(new_path)
    )
    q = (
        stream_candidate_pairs_collapsed(
            stream, index, time_col="ts", watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("t_collapse")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM t_collapse").collect()
    got = {(r.new_id, r.corpus_id, r.est_jaccard) for r in rows}
    assert got == batch and batch
    # exactly one row per pair key survived
    assert len(rows) == len({(r.new_id, r.corpus_id) for r in rows})


def test_curate_stream_matches_batch(spark, tmp_path):
    """The streaming curation front half (quality filter -> Bloom
    decontamination -> token count) must be stateless append-mode and
    produce exactly the batch result over the same rows — and the
    quality/decontamination decisions must agree with the batch
    curate_corpus stages on the same corpus."""
    from wikihadoop_spark.operators.decontam import build_ngram_bloom
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    bloom = build_ngram_bloom(bench)

    batch = {
        (r.doc_id, r.quality, r.n_tokens)
        for r in curate_stream(docs, bloom=bloom, quality_threshold=0)
        .select("doc_id", "quality", "n_tokens")
        .collect()
    }
    assert batch  # the filter keeps a nonempty curated set

    src = str(tmp_path / "arriving")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(stream, bloom=bloom, quality_threshold=0)
        .select("doc_id", "quality", "n_tokens")
        .writeStream.format("memory")
        .queryName("t_curstream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.quality, r.n_tokens)
        for r in spark.sql("SELECT * FROM t_curstream").collect()
    }
    assert got == batch


def test_curate_stream_chunked_matches_batch(spark, tmp_path):
    """With chunk_tokens set the streaming curation emits
    training-sequence chunk rows (posexplode is stateless — still
    append mode) identical to the batch run."""
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents")
    key = lambda r: (r.doc_id, r.chunk_idx, r.quality, r.n_tokens, r.chunk_text)
    batch = {
        key(r)
        for r in curate_stream(docs, chunk_tokens=24, chunk_stride=16).collect()
    }
    assert batch and any(k[1] > 0 for k in batch)  # real multi-chunk docs

    src = str(tmp_path / "arriving")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(stream, chunk_tokens=24, chunk_stride=16)
        .writeStream.format("memory")
        .queryName("t_curchunk")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {key(r) for r in spark.sql("SELECT * FROM t_curchunk").collect()}
    assert got == batch


def test_stateful_detector_timeout_branch_evicts_state():
    """The idle-eviction branch (hasTimedOut) must remove the key's
    state and emit nothing; with a timeout configured, each data batch
    re-arms the timer.  Driven directly — a processing-time timer in a
    processAllAvailable test would wait out the wall clock."""
    import pandas as pd

    from wikihadoop_spark.streaming.stateful import make_detector

    class FakeState:
        def __init__(self):
            self.hasTimedOut = True
            self.removed = False
            self.exists = False

        def remove(self):
            self.removed = True

    st = FakeState()
    out = list(make_detector(10_000)((7,), iter([]), st))
    assert out == [] and st.removed

    class LiveState(FakeState):
        def __init__(self):
            super().__init__()
            self.hasTimedOut = False
            self.timeout_set = None
            self.updated = None

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    st = LiveState()
    pdf = pd.DataFrame(
        {"ts": [1, 2], "event_id": [1, 2], "value": [1.0, 2.0]}
    )
    list(make_detector(10_000)((7,), iter([pdf]), st))
    assert st.updated[0] == 2  # Welford count advanced
    assert st.timeout_set == 10_000  # timer re-armed after the batch

    st = LiveState()
    list(make_detector(None)((7,), iter([pdf]), st))
    assert st.timeout_set is None  # no timer without the knob


def test_strip_frequent_segments_stream_matches_batch(spark, tmp_path):
    """The streaming half of segment-frequency dedup: arriving docs
    strip boilerplate against a static frequent-segment index with NO
    state (append mode), and the streamed rows equal the batch
    application exactly — for both the exact-array index and the
    Bloom-packed one (which may only ever OVER-strip)."""
    from wikihadoop_spark.operators.segdedup import (
        build_segment_bloom,
        frequent_segments,
        strip_frequent_segments,
    )

    corpus = load_table(spark, SF, "documents")
    boiler = "all visitors must accept the terms"
    toks = F.split(F.col("text"), " ")
    built = corpus.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.array_join(F.slice(toks, 1, 5), " "),
            F.lit(boiler),
            F.array_join(F.slice(toks, 6, F.size(toks)), " "),
        ).alias("text"),
    )
    freq = frequent_segments(built)
    idx = [r.segment for r in freq.collect()]
    assert boiler in idx

    batch = {
        (r.doc_id, r.n_removed, r.text)
        for r in strip_frequent_segments(built, idx).collect()
    }
    assert batch and all(boiler not in t for _, _, t in batch)

    src = str(tmp_path / "arriving_docs")
    built.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(built.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        strip_frequent_segments(stream, idx)
        .writeStream.format("memory")
        .queryName("t_segstrip")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.n_removed, r.text)
        for r in spark.sql("SELECT * FROM t_segstrip").collect()
    }
    assert got == batch

    # Bloom-packed index on the same stream: everything the exact index
    # strips is stripped (no false negatives); extras are FP over-strips
    bloom = build_segment_bloom(freq)
    qb = (
        strip_frequent_segments(stream, bloom)
        .writeStream.format("memory")
        .queryName("t_segstrip_bloom")
        .outputMode("append")
        .start()
    )
    qb.processAllAvailable()
    qb.stop()
    bloomed = {
        r.doc_id: (r.n_removed, r.text)
        for r in spark.sql("SELECT * FROM t_segstrip_bloom").collect()
    }
    exact = {d: (n, t) for d, n, t in batch}
    assert set(bloomed) == set(exact)
    for d, (n, t) in exact.items():
        nb, tb = bloomed[d]
        assert nb >= n, d  # over-strip only
        assert boiler not in tb, d


def test_curate_stream_with_segment_strip_matches_batch(spark, tmp_path):
    """curate_stream with a frequent-segment index strips boilerplate
    AFTER the quality gate (the batch chain's stage order) but before
    decontamination/token-count — still stateless append mode, still
    exactly the batch result on the same rows, n_tokens reflects the
    stripped text, and the riding quality score is the post-strip
    recompute."""
    from wikihadoop_spark.operators.segdedup import frequent_segments
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents")
    banner = "subscribe to our newsletter today"
    built = docs.select(
        "doc_id",
        F.concat_ws("\n", F.lit(banner), F.col("text")).alias("text"),
        "source",
    )
    idx = [r.segment for r in frequent_segments(built).collect()]
    assert banner in idx

    batch = {
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in curate_stream(
            built, strip_index=idx, quality_threshold=-(10**12)
        ).collect()
    }
    assert batch and all(banner not in t for _, _, _, t in batch)

    src = str(tmp_path / "arriving_strip")
    built.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(built.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(stream, strip_index=idx, quality_threshold=-(10**12))
        .writeStream.format("memory")
        .queryName("t_curstrip")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in spark.sql("SELECT * FROM t_curstrip").collect()
    }
    assert got == batch


def test_curate_stream_with_dsir_matches_batch(spark, tmp_path):
    """The DSIR selection stage is a literal-array row-local fold, so
    it must run identically on the append-mode stream and on a batch
    frame of the same rows — and actually drop off-target documents."""
    from wikihadoop_spark.operators.dsir import (
        bucket_distributions,
        collect_lambda_table,
    )
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents")
    # fit batch-side: English as the target distribution
    dist = bucket_distributions(docs, F.col("lang") == "en").persist()
    lam = collect_lambda_table(dist)
    dist.unpersist()

    # threshold at the batch-side median score: selection must be
    # genuine (whole-bit lambdas sit mostly at -1/0 here, so absolute
    # thresholds like 0 are degenerate on this fixture)
    from wikihadoop_spark.operators.dsir import dsir_score_rowwise

    vals = sorted(
        r.dsir_bits for r in dsir_score_rowwise(docs, lam).collect()
    )
    thr = vals[len(vals) // 2]
    kwargs = dict(
        quality_threshold=-(10**9), dsir_lambda=lam, dsir_min_bits=thr
    )
    batch = {
        (r.doc_id, r.n_tokens)
        for r in curate_stream(docs, **kwargs)
        .select("doc_id", "n_tokens")
        .collect()
    }
    n_docs = docs.count()
    assert 0 < len(batch) < n_docs  # the threshold genuinely selects

    src = str(tmp_path / "arriving")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(stream, **kwargs)
        .select("doc_id", "n_tokens")
        .writeStream.format("memory")
        .queryName("t_dsirstream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.n_tokens)
        for r in spark.sql("SELECT * FROM t_dsirstream").collect()
    }
    assert got == batch


@pytest.mark.slow
def test_strip_duplicated_spans_stream_matches_batch(spark, tmp_path):
    """The streaming half of exact-substring span dedup: arriving docs
    strip duplicated spans against a static frequent-window index with
    NO state (append mode), and the streamed rows equal the batch
    application exactly — for both the exact fingerprint index and the
    Bloom over the window strings (which may only ever OVER-strip)."""
    from wikihadoop_spark.operators.segdedup import build_segment_bloom
    from wikihadoop_spark.operators.spandedup import (
        collect_window_fps,
        frequent_windows,
        strip_duplicated_spans,
    )

    # subsample: the exact index is a per-position linear literal scan,
    # and the full 500-doc fixture makes this parity test pay minutes
    # for no extra coverage
    corpus = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    header = "this license header is shared by every document verbatim"
    toks = F.split(F.col("text"), " ")
    built = corpus.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.array_join(F.slice(toks, 1, 5), " "),
            F.lit(header),
            F.array_join(F.slice(toks, 6, F.size(toks)), " "),
        ).alias("text"),
    )
    freq = frequent_windows(built, k=5, min_count=2)
    fps = collect_window_fps(freq)
    assert fps

    batch = {
        (r.doc_id, r.n_removed, r.text)
        for r in strip_duplicated_spans(built, fps, k=5).collect()
    }
    assert batch and all(header not in t for _, _, t in batch)

    src = str(tmp_path / "arriving_docs_span")
    built.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(built.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        strip_duplicated_spans(stream, fps, k=5)
        .writeStream.format("memory")
        .queryName("t_spanstrip")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.n_removed, r.text)
        for r in spark.sql("SELECT * FROM t_spanstrip").collect()
    }
    assert got == batch

    # Bloom over the window strings on the same stream: no false
    # negatives (every indexed span stripped); extras over-strip only
    bloom = build_segment_bloom(freq, segment_col="window")
    qb = (
        strip_duplicated_spans(stream, bloom, k=5)
        .writeStream.format("memory")
        .queryName("t_spanstrip_bloom")
        .outputMode("append")
        .start()
    )
    qb.processAllAvailable()
    qb.stop()
    bloomed = {
        r.doc_id: (r.n_removed, r.text)
        for r in spark.sql("SELECT * FROM t_spanstrip_bloom").collect()
    }
    exact = {d: (n, t) for d, n, t in batch}
    assert set(bloomed) == set(exact)
    for d, (n, t) in exact.items():
        nb, tb = bloomed[d]
        assert nb >= n, d  # over-strip only
        assert header not in tb, d


@pytest.mark.slow
def test_curate_stream_with_span_strip_matches_batch(spark, tmp_path):
    """curate_stream with a duplicated-window index strips spans
    BEFORE quality/token-count — stateless append mode, exactly the
    batch result on the same rows, and n_tokens reflects the stripped
    text."""
    from wikihadoop_spark.operators.spandedup import (
        collect_window_fps,
        frequent_windows,
    )
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    # subsample: the exact index is a per-position linear literal scan,
    # so the full 500-doc fixture makes this stream-parity test pay
    # ~5 minutes for no extra coverage
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    header = "this license header is shared by every document verbatim"
    built = docs.select(
        "doc_id",
        F.concat_ws(" ", F.lit(header), F.col("text")).alias("text"),
        "source",
    )
    fps = collect_window_fps(frequent_windows(built, k=5, min_count=2))
    assert fps

    batch = {
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in curate_stream(
            built, span_index=fps, span_k=5, quality_threshold=-(10**12)
        ).collect()
    }
    assert batch and all(header not in t for _, _, _, t in batch)

    src = str(tmp_path / "arriving_spanstrip")
    built.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(built.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(
            stream, span_index=fps, span_k=5, quality_threshold=-(10**12)
        )
        .writeStream.format("memory")
        .queryName("t_curspanstrip")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in spark.sql("SELECT * FROM t_curspanstrip").collect()
    }
    assert got == batch


def test_curate_stream_c4_rules_matches_batch(spark, tmp_path):
    """The C4 rule stage is row-local, so it must run identically on
    the append-mode stream and a batch frame of the same rows — and
    actually remove lines / drop blocklisted pages."""
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents")
    built = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.col("text"), F.lit(".")),
            F.lit("click here"),
            F.when(F.col("doc_id") % 9 == 0, F.lit("lorem ipsum filler.")),
        ).alias("text"),
        "source",
    )
    batch = {
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in curate_stream(
            built, c4_rules=True, quality_threshold=-(10**12)
        ).collect()
    }
    assert batch
    ids = {d for d, _, _, _ in batch}
    assert not any(d % 9 == 0 for d in ids)  # blocklisted pages dropped
    assert all("click here" not in t for _, _, _, t in batch)

    src = str(tmp_path / "arriving_c4")
    built.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(built.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(stream, c4_rules=True, quality_threshold=-(10**12))
        .writeStream.format("memory")
        .queryName("t_curc4")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in spark.sql("SELECT * FROM t_curc4").collect()
    }
    assert got == batch


def test_curate_stream_gate_order_matches_batch(spark, tmp_path):
    """Gate-order parity with the BATCH chain (round-9 advisor item,
    medium): quality (stage 1) and DSIR (stage 1.5) must fire on
    PRE-strip text on BOTH chains — the stream used to strip first and
    gate second, so a document whose boilerplate banner pushed its
    score across the threshold passed one chain and failed the other.
    This fixture makes that sensitivity real (the chosen threshold
    separates pre- and post-strip scores for at least one document),
    runs strip_index + quality + dsir TOGETHER, and requires the
    survivor set of the stream, the batch chain, and an independent
    pre-strip score computation to coincide exactly."""
    from wikihadoop_spark.operators.dsir import (
        bucket_distributions,
        collect_lambda_table,
        dsir_score_rowwise,
    )
    from wikihadoop_spark.operators.segdedup import frequent_segments
    from wikihadoop_spark.plans.curation import curate_corpus, quality_score
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents")
    banner = "buy now limited offer exclusive deal"
    built = docs.select(
        "doc_id",
        F.concat_ws("\n", F.lit(banner), F.col("text")).alias("text"),
        "source",
    ).persist()

    # pre-strip score = banner + text; post-strip = the original text
    # (the banner line is in every document, so both strip paths remove
    # it).  Any threshold separating the two distributions makes the
    # gate ORDER observable.
    scored = {
        r.doc_id: (r.q_pre, r.q_post)
        for r in built.join(
            docs.select("doc_id", F.col("text").alias("orig")), "doc_id"
        )
        .select(
            "doc_id",
            quality_score(F.col("text")).alias("q_pre"),
            quality_score(F.col("orig")).alias("q_post"),
        )
        .collect()
    }
    n = len(scored)

    # DSIR fitted batch-side (English target), gated at the median of
    # the PRE-strip scores so the selection is genuine
    dist = bucket_distributions(docs, F.col("lang") == "en").persist()
    lam = collect_lambda_table(dist)
    dist.unpersist()
    dsir_pre = {
        r.doc_id: r.dsir_bits
        for r in dsir_score_rowwise(built, lam).select(
            "doc_id", "dsir_bits"
        ).collect()
    }
    vals = sorted(dsir_pre.values())
    dthr = vals[len(vals) // 2]
    dsir_pass = {d for d in scored if dsir_pre[d] >= dthr}

    # pick the quality threshold so that at least one DSIR-passing
    # document sits BETWEEN its post- and pre-strip scores: that
    # document survives iff the gate fires pre-strip, so it
    # distinguishes the two orderings end-to-end
    thr = None
    for cand in sorted({q for pair in scored.values() for q in pair}):
        pre = {d for d, (qp, _) in scored.items() if qp > cand}
        sens = {
            d for d, (qp, qq) in scored.items() if (qp > cand) != (qq > cand)
        }
        if 0 < len(pre) < n and sens & dsir_pass:
            thr = cand
            break
    assert thr is not None, "fixture lost gate-order sensitivity"

    expected = {
        d
        for d, (qp, _) in scored.items()
        if qp > thr and dsir_pre[d] >= dthr
    }
    assert 0 < len(expected) < n

    # batch chain: frequency-based strip (min_df=2 catches the banner),
    # near-dup disabled (threshold > 1 can never match), unique texts
    # so exact dedup drops nothing — survivors are exactly the two
    # pre-strip gates
    res = curate_corpus(
        built,
        quality_threshold=thr,
        near_dup_threshold=1.01,
        strip_boilerplate=True,
        boilerplate_min_df=2,
        dsir_lambda=lam,
        dsir_min_bits=dthr,
    )
    batch_ids = {r.doc_id for r in res.curated.select("doc_id").collect()}
    res.unpersist()
    assert batch_ids == expected

    idx = [r.segment for r in frequent_segments(built).collect()]
    assert banner in idx
    src = str(tmp_path / "arriving_gateorder")
    built.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(built.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(
            stream,
            strip_index=idx,
            quality_threshold=thr,
            dsir_lambda=lam,
            dsir_min_bits=dthr,
        )
        .writeStream.format("memory")
        .queryName("t_gateorder")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = {
        r.doc_id: r.text
        for r in spark.sql("SELECT * FROM t_gateorder").collect()
    }
    built.unpersist()
    assert set(out) == expected
    # the stream's index strip removes every banner occurrence (the
    # batch keeps only the corpus-first copy); survivors ship stripped
    assert all(banner not in t for t in out.values())


@pytest.mark.slow
def test_curate_stream_full_stack_kill_midbatch_restart(spark, tmp_path):
    """Checkpoint-restart drill for the FULL stateless stage stack
    (round-9 verdict item 5: the span-strip and DSIR stages had
    stream≡batch parity pins but no kill-mid-batch evidence): C4 rules
    + quality gate + DSIR gate + segment strip + span strip + Bloom
    decontamination, parquet source -> parquet sink with a checkpoint.
    Stop the query mid-flight, let a shard arrive during the downtime,
    restart with availableNow — exactly-once output equal to the batch
    application over everything that ever arrived."""
    import time

    from wikihadoop_spark.operators.decontam import build_ngram_bloom
    from wikihadoop_spark.operators.dsir import (
        bucket_distributions,
        collect_lambda_table,
    )
    from wikihadoop_spark.operators.segdedup import frequent_segments
    from wikihadoop_spark.operators.spandedup import (
        collect_window_fps,
        frequent_windows,
    )
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents")
    banner = "subscribe to our newsletter now"
    toks = F.split(F.col("text"), " ")
    spliced = F.concat_ws(
        " ",
        F.array_join(F.slice(toks, 1, 5), " "),
        F.lit("this shared license span repeats in every document here."),
        F.array_join(F.slice(toks, 6, F.size(toks)), " "),
    )

    def build(frame, id_shift):
        return frame.select(
            (F.col("doc_id") + id_shift).alias("doc_id"),
            F.concat_ws("\n", F.lit(banner), spliced).alias("text"),
            "source",
        )

    built = build(docs, 0).persist()
    seg_idx = [r.segment for r in frequent_segments(built).collect()]
    assert banner in seg_idx
    span_fps = collect_window_fps(frequent_windows(built, k=5))
    assert span_fps
    dist = bucket_distributions(docs, F.col("lang") == "en").persist()
    lam = collect_lambda_table(dist)
    dist.unpersist()
    bloom = build_ngram_bloom(
        spark.createDataFrame(
            [("a held out benchmark sentence that matches nothing here",)],
            "text string",
        )
    )
    kwargs = dict(
        c4_rules=True,
        quality_threshold=-(10**12),
        dsir_lambda=lam,
        dsir_min_bits=-(10**9),
        strip_index=seg_idx,
        span_index=span_fps,
        span_k=5,
        bloom=bloom,
    )

    # the downtime arrival: same corpus re-keyed, so it exercises every
    # stage (banner, license span, language mix) without id collisions
    late = build(docs.limit(60), 10_000_000)

    indir = tmp_path / "arriving_fullstack"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt_fullstack")
    out = str(tmp_path / "out_fullstack")
    built.repartition(6).write.mode("overwrite").parquet(
        str(indir / "first.parquet")
    )

    def make_query(trigger_kwargs):
        stream = spark.readStream.schema(built.schema).option(
            "maxFilesPerTrigger", "2"
        ).parquet(str(indir / "*.parquet"))
        return (
            curate_stream(stream, **kwargs)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    q = make_query({"processingTime": "0 seconds"})
    time.sleep(1.0)
    q.stop()  # interrupt: likely mid-batch; exactly-once must hold either way

    late.coalesce(1).write.mode("overwrite").parquet(
        str(indir / "late.parquet")
    )
    q2 = make_query({"availableNow": True})
    q2.awaitTermination(180)

    want = {
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in curate_stream(
            built.unionByName(late), **kwargs
        ).collect()
    }
    got = [
        (r.doc_id, r.quality, r.n_tokens, r.text)
        for r in spark.read.parquet(out).collect()
    ]
    built.unpersist()
    assert len(got) == len(set(got)), "duplicates after restart"
    assert set(got) == want
    # the full stack genuinely fired: spans and banners are gone
    assert all(banner not in t for _, _, _, t in got)
    assert all("shared license span" not in t for _, _, _, t in got)


def test_curate_stream_lm_gate_matches_batch(spark, tmp_path):
    """CCNet's production perplexity gate (r10 verdict item 7): fit the
    LM + tercile thresholds batch-side, then drop tail-bucket documents
    on arrival.  The stream gate is the batch chain's stage 1.6
    verbatim — a row-local fold against the driver-held surprisal
    table with ONE scalar threshold — so the stream survivors, the
    batch-chain survivors, the batch 'lm' counter, and an independent
    bucket computation must all coincide exactly."""
    from wikihadoop_spark.operators.lm_score import (
        collect_lm_table,
        lm_surprisal_score,
        perplexity_buckets,
        perplexity_thresholds,
        unigram_model,
    )
    from wikihadoop_spark.plans.curation import curate_corpus
    from wikihadoop_spark.streaming.curate_stream import curate_stream

    docs = load_table(spark, SF, "documents").persist()
    model = unigram_model(docs.filter(F.col("doc_id") % 2 == 0)).persist()
    scored = lm_surprisal_score(docs, model).persist()

    # the artifacts a deployment ships: the surprisal table + ceiling
    # and the bucket thresholds, all fitted batch-side
    table, ceil = collect_lm_table(model)
    thresholds = perplexity_thresholds(scored, n_buckets=3)
    model.unpersist()

    # pick the TIGHTEST gate that still separates (the tercile
    # thresholds can degenerate on a small-vocab fixture — ties all
    # fall in bucket 1 — so fall back to the median score, which is a
    # legitimate deployment choice: thresholds are just scalars here)
    bits = {r.doc_id: r.lm_bits for r in scored.collect()}
    n = len(bits)
    gate = None
    for cand in (thresholds[0] if thresholds else None,
                 sorted(bits.values())[n // 2]):
        if cand is not None and 0 < sum(b <= cand for b in bits.values()) < n:
            gate = cand
            break
    assert gate is not None, "fixture lost LM-gate sensitivity"
    expected = {d for d, b in bits.items() if b <= gate}

    # the scalar gate must equal the bucket gate when the scalar IS a
    # bucket threshold (bucket(x) <= m  <=>  x <= t_m)
    if thresholds and gate == thresholds[0]:
        buckets = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(scored, n_buckets=3).collect()
        }
        assert expected == {d for d, bk in buckets.items() if bk <= 1}
    scored.unpersist()

    res = curate_corpus(
        docs,
        quality_threshold=-(10 ** 9),
        near_dup_threshold=1.01,
        lm_table=(table, ceil),
        lm_max_bits=gate,
    )
    batch_ids = {r.doc_id for r in res.curated.select("doc_id").collect()}
    counts = res.counts()
    res.unpersist()
    assert batch_ids == expected
    assert counts["lm"] == len(expected)

    src = str(tmp_path / "arriving_lmgate")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curate_stream(
            stream,
            quality_threshold=-(10 ** 9),
            lm_table=(table, ceil),
            lm_max_bits=gate,
        )
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("t_lmgate")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id for r in spark.sql("SELECT * FROM t_lmgate").collect()}
    docs.unpersist()
    assert got == expected


def test_streaming_int8_ann_probe_matches_batch_lsh(spark, tmp_path):
    """Round-11 verdict item 7 — the int8 variant of the stream-static
    probe: the corpus keeps a persisted int8 ANN index (quantized
    vectors + integer norms + integer-hyperplane buckets, 4× smaller
    than the float column on disk and over the join) and arriving
    embeddings probe it with a stateless stream-static equi-join.
    Stream ≡ batch twice over: (a) the streamed match rows equal the
    batch run of the same probe; (b) ranked at read time they equal
    the batch gate ``cosine_topk_int8_lsh`` on the same arriving
    documents — the int8 kernel's bit-exactness means set equality,
    no tolerance anywhere."""
    from pyspark.sql import Window

    from wikihadoop_spark.operators.quantize import cosine_topk_int8_lsh
    from wikihadoop_spark.relational import _INT8_LSH_PLANES
    from wikihadoop_spark.streaming.dedup_stream import (
        int8_ann_index,
        stream_ann_matches,
    )

    emb = load_table(spark, SF, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    new = emb.filter(F.col("vec_id") < 10)

    idx_path = str(tmp_path / "int8_ann_index")
    int8_ann_index(corpus, _INT8_LSH_PLANES).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    key = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex())
    batch = sorted(
        map(key, stream_ann_matches(new, index, _INT8_LSH_PLANES).collect())
    )
    assert batch, "fixture produced no bucket collisions"

    new_path = str(tmp_path / "new_vecs")
    new.repartition(3).write.mode("overwrite").parquet(new_path)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(new_path)
    )
    q = (
        stream_ann_matches(stream, index, _INT8_LSH_PLANES)
        .writeStream.format("memory")
        .queryName("t_int8ann")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM t_int8ann")
    assert sorted(map(key, streamed.collect())) == batch

    # rank the sink at read time -> must equal the batch gate operator
    # (the corpus side excludes the probe ids, so self-matches and the
    # batch operator's query-side corpus rows are filtered identically)
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), "neighbor_id"
    )
    ranked = (
        streamed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )
    want = cosine_topk_int8_lsh(
        corpus, new, _INT8_LSH_PLANES, id_col="vec_id",
        vec_col="embedding", k=10,
    )
    rkey = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex(), r.rank)
    assert sorted(map(rkey, ranked.collect())) == sorted(map(rkey, want.collect()))


def test_streaming_int8_ivf_probe_and_assign_match_batch(spark, tmp_path):
    """The IVF twin of the int8 LSH stream probe: the corpus keeps a
    WRITTEN int8 IVF index (train-once), arriving embeddings pick
    their nprobe nearest integer centroids row-locally from the
    driver-held literal list and probe the static index with a
    stream-static equi-join (append mode, zero state).  Pins three
    equalities: (a) streamed match rows equal the batch run of the
    same probe; (b) ranked at read time they equal the batch gate
    operator cosine_topk_int8_ivf bit-for-bit; (c) ivf_assign_int8
    tags vectors bit-identically to the build's own assignment — the
    index-append half of train-once/search-many."""
    from pyspark.sql import Window

    from wikihadoop_spark.operators.quantize import (
        cosine_topk_int8_ivf,
        int_norm2,
        ivf_assign_int8,
        ivf_build_or_read_int8,
        quantize_int8,
    )
    from wikihadoop_spark.streaming.dedup_stream import stream_ivf_matches

    emb = load_table(spark, SF, "embeddings")
    qn = (
        emb.select(
            "vec_id",
            quantize_int8(F.col("embedding").cast("array<double>")).alias("q"),
        )
        .withColumn("n2", int_norm2(F.col("q")))
        .filter(F.col("n2") > 0)
    )
    idx_path = str(tmp_path / "ivf_index")
    tagged, cents = ivf_build_or_read_int8(
        spark, qn.filter(F.col("vec_id") >= 10), idx_path, k=4, iterations=2
    )

    # (c) assignment parity: re-assigning the indexed vectors against
    # the trained centroids must reproduce the stored tags exactly
    reassigned = ivf_assign_int8(
        qn.filter(F.col("vec_id") >= 10), cents, id_col="vec_id", q_col="q"
    )
    stored = {(r.vec_id, r.cluster) for r in tagged.collect()}
    assert {(r.vec_id, r.cluster) for r in reassigned.collect()} == stored

    new = emb.filter(F.col("vec_id") < 10)
    index = spark.read.parquet(idx_path + "/vectors")
    key = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex())
    batch = sorted(
        map(key, stream_ivf_matches(new, index, cents, nprobe=2).collect())
    )
    assert batch, "fixture produced no probe matches"

    new_path = str(tmp_path / "new_vecs_ivf")
    new.repartition(3).write.mode("overwrite").parquet(new_path)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(new_path)
    )
    q = (
        stream_ivf_matches(stream, index, cents, nprobe=2)
        .writeStream.format("memory")
        .queryName("t_int8ivf")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM t_int8ivf")
    assert sorted(map(key, streamed.collect())) == batch

    # (b) ranked at read time == the batch gate operator on the same
    # raw vectors (quantization is deterministic, so the inline and
    # pre-quantized probe sides agree bit-for-bit)
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), "neighbor_id"
    )
    ranked = (
        streamed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    want = cosine_topk_int8_ivf(
        tagged, cents, qn.filter(F.col("vec_id") < 10),
        id_col="vec_id", q_col="q", n2_col="n2", k=5, nprobe=2,
    )
    rkey = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex(), r.rank)
    assert sorted(map(rkey, ranked.collect())) == sorted(map(rkey, want.collect()))


@pytest.mark.slow
def test_stream_analog_catalog_query_equals_real_stream(spark, tmp_path):
    """The catalog query `similarity_probe_int8_stream_analog` claims
    its driver gate is evidence FOR the streaming probe — this pin is
    the claim's other half: feed the query's exact arriving slice
    (vec_id % 17 == 0, < 340) through a real readStream micro-batch
    pipeline against the same written index, rank at read time, and
    require bit-equality with the catalog query's batch result."""
    from pyspark.sql import Window

    from wikihadoop_spark.relational import QUERIES
    from wikihadoop_spark.streaming.dedup_stream import stream_ivf_matches
    from wikihadoop_spark.operators.quantize import (
        int_norm2,
        ivf_build_or_read_int8,
        quantize_int8,
    )

    rkey = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex(), r.rank)
    batch = sorted(
        map(
            rkey,
            QUERIES["similarity_probe_int8_stream_analog"](spark, SF).collect(),
        )
    )
    assert batch, "fixture produced no matches"

    emb = load_table(spark, SF, "embeddings")
    qn = (
        emb.filter(F.col("vec_id") % 17 != 0)
        .select(
            "vec_id",
            quantize_int8(F.col("embedding").cast("array<double>")).alias("q"),
        )
        .withColumn("n2", int_norm2(F.col("q")))
        .filter(F.col("n2") > 0)
    )
    # a FRESH index path (not the catalog query's cached artifact): the
    # build is deterministic, so the stream side re-proves the full
    # build+write+probe chain rather than sharing the batch side's file
    idx_path = str(tmp_path / "analog_idx")
    tagged, cents = ivf_build_or_read_int8(spark, qn, idx_path, k=8, iterations=2)

    arriving = emb.filter(
        (F.col("vec_id") % 17 == 0) & (F.col("vec_id") < 340)
    ).select("vec_id", "embedding")
    arr_path = str(tmp_path / "arriving")
    arriving.repartition(4).write.mode("overwrite").parquet(arr_path)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(arr_path)
    )
    q = (
        stream_ivf_matches(stream, tagged, cents, nprobe=4)
        .writeStream.format("memory")
        .queryName("t_analog")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "neighbor_id")
    ranked = (
        spark.sql("SELECT * FROM t_analog")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "int_dot", "qcos", "rank")
    )
    assert sorted(map(rkey, ranked.collect())) == batch


@pytest.mark.slow
def test_streaming_incremental_append_matches_batch_composite(spark, tmp_path):
    """The WRITE half of streaming ANN ingest (round 14: the append
    lifecycle is driver-gated through the batch composite
    similarity_topk_int8_ivf_append — this is the real-stream drill
    behind that analog): arriving embeddings are appended to the
    written int8 IVF index PER MICRO-BATCH via foreachBatch ->
    ivf_append_int8 (quantize + assign row-locally against the
    driver-held centroids — zero state, zero shuffle — rows landing in
    the same cluster=N directories the build wrote), and a search over
    the incrementally-appended index must equal the batch composite
    ivf_build_append_or_read_int8 bit-for-bit, however the arriving
    slice was chopped into micro-batches.  Pins that incremental
    ingest is invisible to readers: same artifact layout, same
    results, no re-train."""
    from wikihadoop_spark.operators.quantize import (
        cosine_topk_int8_ivf,
        int_norm2,
        ivf_append_int8,
        ivf_build_append_or_read_int8,
        ivf_build_or_read_int8,
        ivf_read_int8,
        quantize_int8,
    )

    emb = load_table(spark, SF, "embeddings")

    def quantized(df):
        return (
            df.select(
                "vec_id",
                quantize_int8(F.col("embedding").cast("array<double>")).alias("q"),
            )
            .withColumn("n2", int_norm2(F.col("q")))
            .filter(F.col("n2") > 0)
        )

    corpus = quantized(emb.filter(F.col("vec_id") >= 10))
    arriving_raw = emb.filter(F.col("vec_id") < 10)

    # batch composite: the gate query's exact lifecycle
    idx_batch = str(tmp_path / "ivf_batch_composite")
    tagged_b, cents_b = ivf_build_append_or_read_int8(
        spark, corpus, quantized(arriving_raw), idx_batch, k=4, iterations=2
    )

    # streaming twin: same build, then the arriving slice appended one
    # micro-batch at a time
    idx_stream = str(tmp_path / "ivf_stream_append")
    _, cents_s = ivf_build_or_read_int8(
        spark, corpus, idx_stream, k=4, iterations=2
    )
    assert cents_s == cents_b  # deterministic build, same corpus

    new_path = str(tmp_path / "arriving_vecs")
    arriving_raw.repartition(3).write.mode("overwrite").parquet(new_path)

    def append_batch(df, epoch_id):
        # dedupe_token: foreachBatch replays are reconciled to
        # exactly-once by the two-phase landing (r15) — a replayed
        # epoch must not land its rows twice (round-14 review finding;
        # the token protocol is pinned in test_quantize.py)
        ivf_append_int8(
            quantized(df), cents_s, idx_stream,
            dedupe_token=f"epoch-{epoch_id}",
        )

    q = (
        spark.readStream.schema(arriving_raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(new_path)
        .writeStream.foreachBatch(append_batch)
        .option(
            "checkpointLocation", str(tmp_path / "append_ckpt")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # the incrementally-appended index reads back identical to the
    # batch composite: same rows, same tags...
    tagged_s, cents_read = ivf_read_int8(spark, idx_stream)
    assert cents_read == cents_b
    tag = lambda r: (r.vec_id, tuple(r.q), r.n2, r.cluster)
    assert sorted(map(tag, tagged_s.collect())) == sorted(
        map(tag, tagged_b.collect())
    )

    # ...and a search over it is bit-identical to the gate composite's
    probes = quantized(emb.filter(F.col("vec_id") < 6))
    key = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex(), r.rank)
    got = cosine_topk_int8_ivf(
        tagged_s, cents_read, probes,
        id_col="vec_id", q_col="q", n2_col="n2", k=5, nprobe=2,
    )
    want = cosine_topk_int8_ivf(
        tagged_b, cents_b, probes,
        id_col="vec_id", q_col="q", n2_col="n2", k=5, nprobe=2,
    )
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


@pytest.mark.slow
def test_streaming_append_crash_before_marker_lands_exactly_once(
    spark, tmp_path, monkeypatch
):
    """Round-14 verdict item 3, the kill drill: a foreachBatch append
    that CRASHES between landing its rows and writing the epoch marker
    (the old protocol's unreconcilable window) must land exactly-once
    after the stream restarts from its checkpoint — the replayed epoch
    reconciles via the intent file instead of double-appending or
    silently skipping.  The restarted index reads back bit-equal to
    the batch composite, same as the crash-free drill above."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from wikihadoop_spark.operators import quantize as qz

    emb = load_table(spark, SF, "embeddings")

    def quantized(df):
        return (
            df.select(
                "vec_id",
                qz.quantize_int8(
                    F.col("embedding").cast("array<double>")
                ).alias("q"),
            )
            .withColumn("n2", qz.int_norm2(F.col("q")))
            .filter(F.col("n2") > 0)
        )

    corpus = quantized(emb.filter(F.col("vec_id") >= 10))
    arriving_raw = emb.filter(F.col("vec_id") < 10)

    # distinct stems (text up to the LAST underscore): the build path
    # sweeps same-stem siblings, so "ivf_x"/"ivf_y" would reap each
    # other as stale fingerprints of one corpus
    idx_batch = str(tmp_path / "killdrill_batch_composite")
    tagged_b, cents_b = qz.ivf_build_append_or_read_int8(
        spark, corpus, quantized(arriving_raw), idx_batch, k=4, iterations=2
    )

    idx_stream = str(tmp_path / "killdrill_stream_append")
    _, cents_s = qz.ivf_build_or_read_int8(
        spark, corpus, idx_stream, k=4, iterations=2
    )
    assert cents_s == cents_b

    new_path = str(tmp_path / "arriving")
    arriving_raw.repartition(3).write.mode("overwrite").parquet(new_path)

    # crash injection: the FIRST marker finalization raises AFTER the
    # rows are already renamed into vectors/ — exactly the
    # kill-between-append-and-marker point
    real_finalize = qz._finalize_append_marker
    crashed = {"n": 0}

    def finalize_or_crash(marker, intent, dests):
        if crashed["n"] == 0:
            crashed["n"] = 1
            raise RuntimeError("injected kill between append and marker")
        real_finalize(marker, intent, dests)

    monkeypatch.setattr(qz, "_finalize_append_marker", finalize_or_crash)

    def append_batch(df, epoch_id):
        qz.ivf_append_int8(
            quantized(df), cents_s, idx_stream,
            dedupe_token=f"epoch-{epoch_id}",
        )

    def start():
        return (
            spark.readStream.schema(arriving_raw.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(new_path)
            .writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start()
    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        q.processAllAvailable()
    q.stop()
    assert crashed["n"] == 1, "the injected crash never fired"

    # restart from the same checkpoint: the failed epoch REPLAYS, the
    # intent reconciles the landed-but-unmarked files, and the
    # remaining micro-batches land normally
    q = start()
    q.processAllAvailable()
    q.stop()

    tagged_s, cents_read = qz.ivf_read_int8(spark, idx_stream)
    assert cents_read == cents_b
    tag = lambda r: (r.vec_id, tuple(r.q), r.n2, r.cluster)
    got = sorted(map(tag, tagged_s.collect()))
    want = sorted(map(tag, tagged_b.collect()))
    assert got == want, (
        "crash+restart diverged from the batch composite: "
        f"{len(got)} rows vs {len(want)}"
    )


@pytest.mark.slow
def test_streaming_append_checkpoint_crossproduct_exactly_once(
    spark, tmp_path, monkeypatch
):
    """Round-15 verdict item 6: cross the two-phase landing's crash
    states with the CHECKPOINT outcome, from a LIVE stream restart.
    The batch-side enumeration (test_quantize.py) drills every on-disk
    state; this drill proves both replay flavors end-to-end through
    Structured Streaming's own recovery:

    - epoch A crashes AFTER its marker is durable but BEFORE the
      checkpoint commits -> the restart REPLAYS epoch A with the same
      epoch_id, finds the marker, and SKIPS (replay-with-marker);
    - epoch B crashes after its files landed but BEFORE the marker ->
      the second restart replays epoch B, finds the INTENT, unlinks
      the landed files, and redoes the append (replay-with-intent).

    After both kills and both restarts the incrementally-appended
    index must be bit-equal to the batch composite — each arriving
    row landed exactly once, whichever side of the marker/checkpoint
    boundary the kill hit."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from wikihadoop_spark.operators import quantize as qz

    emb = load_table(spark, SF, "embeddings")

    def quantized(df):
        return (
            df.select(
                "vec_id",
                qz.quantize_int8(
                    F.col("embedding").cast("array<double>")
                ).alias("q"),
            )
            .withColumn("n2", qz.int_norm2(F.col("q")))
            .filter(F.col("n2") > 0)
        )

    corpus = quantized(emb.filter(F.col("vec_id") >= 10))
    arriving_raw = emb.filter(F.col("vec_id") < 10)

    idx_batch = str(tmp_path / "xdrill_batch_composite")
    tagged_b, cents_b = qz.ivf_build_append_or_read_int8(
        spark, corpus, quantized(arriving_raw), idx_batch, k=4, iterations=2
    )

    idx_stream = str(tmp_path / "xdrill_stream_append")
    _, cents_s = qz.ivf_build_or_read_int8(
        spark, corpus, idx_stream, k=4, iterations=2
    )
    assert cents_s == cents_b

    new_path = str(tmp_path / "arriving")
    arriving_raw.repartition(3).write.mode("overwrite").parquet(new_path)

    real_finalize = qz._finalize_append_marker
    fired = {"after_marker": 0, "before_marker": 0, "seq": 0}

    def finalize_hook(marker, intent, dests):
        fired["seq"] += 1
        if fired["seq"] == 1:
            # kill AFTER the marker is durable, BEFORE the epoch's
            # checkpoint commit: the landing succeeded, the stream
            # doesn't know it
            real_finalize(marker, intent, dests)
            fired["after_marker"] += 1
            raise RuntimeError("injected kill after marker, pre-checkpoint")
        if fired["seq"] == 2:
            # kill BEFORE the marker: files landed, intent still there
            fired["before_marker"] += 1
            raise RuntimeError("injected kill before marker")
        real_finalize(marker, intent, dests)

    monkeypatch.setattr(qz, "_finalize_append_marker", finalize_hook)

    def append_batch(df, epoch_id):
        qz.ivf_append_int8(
            quantized(df), cents_s, idx_stream,
            dedupe_token=f"epoch-{epoch_id}",
        )

    def start():
        return (
            spark.readStream.schema(arriving_raw.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(new_path)
            .writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    # run 1: dies after epoch A's marker (checkpoint uncommitted)
    q = start()
    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        q.processAllAvailable()
    q.stop()
    assert fired["after_marker"] == 1

    # run 2: epoch A replays -> marker skip (finalize NOT called for
    # it); epoch B dies before its marker
    q = start()
    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        q.processAllAvailable()
    q.stop()
    assert fired["before_marker"] == 1

    # run 3: epoch B replays -> intent reconciliation; rest land clean
    q = start()
    q.processAllAvailable()
    q.stop()

    tagged_s, cents_read = qz.ivf_read_int8(spark, idx_stream)
    assert cents_read == cents_b
    tag = lambda r: (r.vec_id, tuple(r.q), r.n2, r.cluster)
    assert sorted(map(tag, tagged_s.collect())) == sorted(
        map(tag, tagged_b.collect())
    )
