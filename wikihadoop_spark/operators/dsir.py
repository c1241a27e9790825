"""DSIR-style importance weighting — data selection by distribution
matching: weight each raw-corpus document by how much more likely its
hashed n-gram features are under a TARGET distribution than under the
raw distribution, so a cheap bucket model (not a full LM) steers what
goes into the training mix.  The method is Data Selection via
Importance Resampling (Xie et al., 2023, arXiv:2302.03169): features
are unigrams+bigrams hashed into a small fixed number of buckets, the
weight is ``log p_target(x) - log q_raw(x)`` under per-bucket
categorical models with add-1 smoothing.

Engine-portable by the same whole-bit construction as
``operators/lm_score.py``: real logs are libm floats, so the per-bucket
log-ratio is taken in WHOLE BITS —

    lambda_b = bitlen(t_b + 1) - bitlen(T + B)
             - bitlen(r_b + 1) + bitlen(R + B)

where ``t_b``/``r_b`` are the bucket's target/raw feature counts,
``T``/``R`` the totals, ``B`` the bucket count (the add-1 smoothing
mass), and ``bitlen(n) = length(bin(n))`` the exact integer
binary-magnitude length both Spark and a SQL oracle compute
identically.  A document's weight is the SUM of lambda over its
feature occurrences — an exact (possibly negative) integer; higher
means more target-like.  Resampling itself (DSIR adds Gumbel noise) is
deliberately left to the caller: a deterministic engine exposes the
exact weights and composes with ``sort_topk_global`` /
``sample_stratified`` for selection.

Plan shape (100 TB):

1. features are ROW-LOCAL (token array -> unigram + adjacent-bigram
   strings -> 60-bit md5 hash mod B) — no shuffle;
2. BOTH distributions come from ONE corpus pass
   (:func:`bucket_distributions`): conditional aggregation
   (``count_if(is_target)`` next to ``count(*)``) over the exploded
   features, map-side combined into a B-row frame — persist it once,
   weight many corpora against it;
3. scoring joins the exploded documents to the broadcast B-row lambda
   table and folds one per-document aggregate; the totals fold in-plan
   from the same B-row frame (no driver collect).

Nothing is all-pairs, nothing is a window; the model is B rows
(default 128) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash64, tokens


def _bitlen(n: Column) -> Column:
    """``length(bin(n))`` — exact whole-bit magnitude, engine-portable."""
    return F.length(F.bin(n))


def ngram_bucket_features(
    text: Column, *, n_buckets: int = 128, use_bigrams: bool = True
) -> Column:
    """Row-local hashed feature buckets for one document: every unigram
    and (optionally) every adjacent bigram ("w1 w2"), each mapped to
    ``hash64(gram) % n_buckets`` (hash64 is non-negative, so plain
    ``%`` is portable).  NULL/empty text yields the empty array."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    t = F.coalesce(tokens(text), F.array())
    grams = t
    if use_bigrams:
        bi = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(2), F.greatest(F.size(t), F.lit(2))),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i - 1), F.element_at(t, i)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(t, bi)
    return F.transform(
        grams, lambda g: (hash64(g) % F.lit(n_buckets)).cast("int")
    )


def bucket_distributions(
    corpus: DataFrame,
    is_target: Column,
    *,
    n_buckets: int = 128,
    text_col: str = "text",
    use_bigrams: bool = True,
) -> DataFrame:
    """Target and raw per-bucket feature counts in ONE corpus pass:
    ``(bucket, target_count, raw_count)`` — conditional aggregation
    over the exploded features, B rows out.  ``is_target`` is a boolean
    column over ``corpus`` rows (e.g. ``F.col("lang") == "en"``); the
    raw distribution is the whole corpus, the DSIR framing where the
    target set is a subset used only to fit the model.  Persist or
    write the result once and weight many corpora against it."""
    feats = corpus.select(
        is_target.alias("__ds_t"),
        F.explode(
            ngram_bucket_features(
                F.col(text_col), n_buckets=n_buckets, use_bigrams=use_bigrams
            )
        ).alias("bucket"),
    )
    return feats.groupBy("bucket").agg(
        F.count_if(F.col("__ds_t")).alias("target_count"),
        F.count(F.lit(1)).alias("raw_count"),
    )


def dsir_weights(
    docs: DataFrame,
    distributions: DataFrame,
    *,
    n_buckets: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    use_bigrams: bool = True,
) -> DataFrame:
    """Per-document whole-bit importance weight against a fitted
    ``(bucket, target_count, raw_count)`` frame (same ``n_buckets`` /
    ``use_bigrams`` as the fit — the caller owns that contract).

    Returns one row per input document: ``(id_col, *keep_cols,
    n_feats, dsir_bits)`` with ``dsir_bits = sum(lambda_bucket)`` over
    the document's feature occurrences (negative = raw-like, positive
    = target-like) and feature-free documents restored as ``(0, 0)``.
    ``keep_cols`` stay on the document spine and never enter a join
    key, so NULLs in them cannot un-match the restore join."""
    internal = {"__ds_id", "__ds_t", "bucket", "target_count", "raw_count",
                "n_feats", "dsir_bits"}
    clash = internal & set([id_col, *keep_cols])
    if clash:
        raise ValueError(
            f"columns collide with DSIR working names: {sorted(clash)}"
        )
    # totals fold in-plan from the B-row frame (no driver collect);
    # +B is the add-1 smoothing mass spread over every bucket
    totals = distributions.agg(
        _bitlen(F.coalesce(F.sum("target_count"), F.lit(0)) + n_buckets).alias(
            "__ds_tt"
        ),
        _bitlen(F.coalesce(F.sum("raw_count"), F.lit(0)) + n_buckets).alias(
            "__ds_rt"
        ),
    )
    spark = docs.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    lam = (
        spine.join(distributions, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                _bitlen(F.coalesce(F.col("target_count"), F.lit(0)) + 1)
                - F.col("__ds_tt")
                - _bitlen(F.coalesce(F.col("raw_count"), F.lit(0)) + 1)
                + F.col("__ds_rt")
            ).alias("__ds_lam"),
        )
    )
    exploded = docs.select(
        F.col(id_col).alias("__ds_id"),
        F.explode(
            ngram_bucket_features(
                F.col(text_col), n_buckets=n_buckets, use_bigrams=use_bigrams
            )
        ).alias("bucket"),
    )
    scored = (
        exploded.join(F.broadcast(lam), "bucket")
        .groupBy("__ds_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("__ds_lam").alias("dsir_bits"),
        )
    )
    base = docs.select(F.col(id_col).alias("__ds_id"), *keep_cols)
    return base.join(scored, "__ds_id", "left").select(
        F.col("__ds_id").alias(id_col),
        *keep_cols,
        F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce(F.col("dsir_bits"), F.lit(0).cast("long")).alias(
            "dsir_bits"
        ),
    )


def collect_lambda_table(
    distributions: DataFrame, *, n_buckets: int = 128
) -> list[int]:
    """Fold a fitted ``(bucket, target_count, raw_count)`` frame into
    the driver-held per-bucket lambda list (length ``n_buckets``) —
    the same whole-bit ratio :func:`dsir_weights` computes in-plan,
    evaluated once in Python ints (``int.bit_length`` ==
    ``length(bin(n))`` for positive n).  Bounded state: B integers.
    This is the batch-fitted index the STATELESS scoring path probes —
    the SegmentBloom / exact-segment-list pattern."""
    rows = distributions.select(
        "bucket", "target_count", "raw_count"
    ).collect()
    t = {r["bucket"]: int(r["target_count"]) for r in rows}
    r_ = {r["bucket"]: int(r["raw_count"]) for r in rows}
    tt = (sum(t.values()) + n_buckets).bit_length()
    rt = (sum(r_.values()) + n_buckets).bit_length()
    return [
        (t.get(b, 0) + 1).bit_length()
        - tt
        - (r_.get(b, 0) + 1).bit_length()
        + rt
        for b in range(n_buckets)
    ]


def dsir_score_rowwise(
    docs: DataFrame,
    lam: list[int],
    *,
    text_col: str = "text",
    out_col: str = "dsir_bits",
    use_bigrams: bool = True,
) -> DataFrame:
    """Append the DSIR weight as a ROW-LOCAL fold over the feature
    array against the literal lambda table — no explode, no aggregate,
    no join, so it runs identically on a STREAM (append mode, zero
    state) and adds zero shuffles to a batch chain.  Agrees bit-for-bit
    with :func:`dsir_weights`'s ``dsir_bits`` when ``lam`` came from
    :func:`collect_lambda_table` over the same distributions
    (equivalence pinned in tests).  Feature-free / NULL-text docs
    score 0."""
    n_buckets = len(lam)
    if n_buckets < 2:
        raise ValueError(f"lambda table too short ({n_buckets})")
    if out_col in docs.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    lam_arr = F.array(*[F.lit(int(v)) for v in lam])
    feats = ngram_bucket_features(
        F.col(text_col), n_buckets=n_buckets, use_bigrams=use_bigrams
    )
    return docs.withColumn(
        out_col,
        F.aggregate(
            feats,
            F.lit(0).cast("bigint"),
            lambda acc, b: acc + F.element_at(lam_arr, b + 1),
        ),
    )
