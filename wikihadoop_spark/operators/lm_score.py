"""N-gram language-model surprisal scoring — the CCNet-style quality
axis: score each document by how SURPRISING its tokens are under a
unigram language model, so downstream filters can drop both tails
(gibberish scores high; boilerplate/templated text scores low).
CCNet ranks Common Crawl by KenLM perplexity; the hashed linear
classifier already in the engine (``text_quality_model``) is the
fasttext-style complement — this is the LM half.

Engine-portable by construction: real log-probabilities are float
(and ``log`` is libm — not bit-identical across engines), so the
model works in WHOLE BITS instead.  A token with corpus count ``c``
out of ``N`` total tokens has surprisal

    bits(token) = bitlen(N) - bitlen(c)          (≈ -log2 c/N)

where ``bitlen(n) = length(bin(n))`` is the binary-magnitude length —
an exact integer both Spark (``F.bin``) and any SQL oracle
(DuckDB ``bin``) compute identically, no floating point anywhere.
The per-document score is average surprisal in milli-bits,

    score = Σ bits(token_i) * 1000  div  n_tokens

— integer division, deterministic on any engine and cluster.
Unseen tokens (scoring against a REFERENCE model built from another
corpus) take ``bitlen(N)`` bits, the "count 1" ceiling.

Plan shape (100 TB):

1. the model is ONE hash aggregate over the exploded reference corpus
   (map-side combine pre-reduces hot tokens like "the" to a row per
   map task before the exchange) — vocabulary-sized output, bounded
   (~1e6-1e8 rows of (token, count)), independent of corpus size;
2. scoring joins the exploded document tokens to the model by token —
   a broadcast hash join while the vocabulary fits (tens of MB for
   1e6 tokens), an ordinary shuffle equi-join past that (AQE handles
   the "the"-token skew via its skew-join split, and the doc-side
   aggregate below pre-combines);
3. one hash aggregate by document folds the bits back to a score.

Nothing is all-pairs, nothing is a window, and the model never
re-derives per query — :func:`unigram_model` is a frame callers
persist/write once and score against many times (the CCNet shape: the
reference model is trained on Wikipedia, applied to Common Crawl).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import TOKEN_PATTERN, tokens


def _bitlen(n: Column) -> Column:
    """Binary-magnitude length of a positive integer — exact in every
    engine (``length(bin(n))``), the whole-bits stand-in for
    ``floor(log2 n) + 1``."""
    return F.length(F.bin(n))


def unigram_model(
    corpus: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Token counts over the reference corpus: ``(token, count)`` —
    one map-side-combined aggregate; vocabulary-sized, not
    corpus-sized.  Persist or write this once and score against it."""
    return (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def lm_surprisal_score(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    broadcast_model: bool = True,
) -> DataFrame:
    """Score each document by average unigram surprisal in milli-bits
    (integer; lower = more predictable under the model).

    Appends ``n_tokens`` and ``lm_bits`` (= Σ per-token whole-bit
    surprisal * 1000 div n_tokens; empty docs score 0).  Tokens absent
    from the model cost the full ``bitlen(N)`` bits — one bit above a
    count-1 token — so out-of-domain text scores high rather than
    crashing or scoring 0.

    ``broadcast_model=True`` (default) broadcasts the vocabulary into
    the join — correct while the model fits the broadcast limit; pass
    False for huge vocabularies to take the shuffle equi-join.
    """
    internal = {"__lm_id", "__lm_tok", "__lm_ceil", "token", "count",
                "n_tokens", "lm_bits"}
    clash = internal & set([id_col, *keep_cols])
    if clash:
        raise ValueError(
            f"columns collide with LM-score working names: {sorted(clash)}"
        )
    # N = total reference tokens, folded to bitlen(N) IN-PLAN: a one-row
    # aggregate broadcast-cross-joined onto the token stream (the
    # oracle's "n" CTE shape).  No driver collect — and when the model
    # is an unpersisted aggregate, its shuffle exchange is IDENTICAL in
    # the total branch and the scoring join, so Spark's ReusedExchange
    # evaluates the corpus-sized explode+partial-agg ONCE for both.
    n_row = model.agg(
        # empty model: SUM is NULL -> ceiling 1 (the count-1 floor)
        F.coalesce(F.length(F.bin(F.sum("count"))), F.lit(1)).alias("__lm_ceil")
    )
    # keep_cols are per-document constants: they stay on the base spine
    # and NEVER enter the join keys — a NULL in a keep column must not
    # un-match the restore join (doc would silently score 0/0)
    exploded = docs.select(
        F.col(id_col).alias("__lm_id"),
        F.explode(tokens(F.col(text_col))).alias("__lm_tok"),
    ).crossJoin(F.broadcast(n_row))
    m = F.broadcast(model) if broadcast_model else model
    joined = exploded.join(
        m, exploded["__lm_tok"] == m["token"], "left"
    ).select(
        "__lm_id",
        F.coalesce(
            F.col("__lm_ceil") - _bitlen(F.col("count")), F.col("__lm_ceil")
        ).alias("__bits"),
    )
    scored = joined.groupBy("__lm_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.expr("sum(__bits) * 1000 div count(1)").alias("lm_bits"),
    )
    # empty documents explode to zero rows — restore them with score 0
    # (an empty doc is a LENGTH-filter concern, not an LM one)
    base = docs.select(F.col(id_col).alias("__lm_id"), *keep_cols)
    return (
        base.join(scored, "__lm_id", "left")
        .select(
            F.col("__lm_id").alias(id_col),
            *keep_cols,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            F.coalesce(F.col("lm_bits"), F.lit(0).cast("long")).alias(
                "lm_bits"
            ),
        )
    )


def bigram_model(
    corpus: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Adjacent-token-pair counts over the reference corpus:
    ``(w1, w2, count)`` — one map-side-combined aggregate, bounded by
    the observed-bigram vocabulary (far below |V|²: natural text uses
    a tiny fraction of the possible pairs).  Pairs are built row-
    locally (no self-join, no window)."""
    t = tokens(F.col(text_col))
    pairs = F.transform(
        F.sequence(F.lit(2), F.greatest(F.size(t), F.lit(1))),
        lambda i: F.struct(
            F.element_at(t, i - 1).alias("w1"), F.element_at(t, i).alias("w2")
        ),
    )
    return (
        corpus.select(
            F.explode(F.when(F.size(t) >= 2, pairs).otherwise(F.array())).alias(
                "p"
            )
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def bigram_surprisal_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Average bigram surprisal in milli-bits with whole-bit backoff —
    the two-gram step toward CCNet's KenLM ranking, still exact
    integers end-to-end.  Per token position ``i``:

    * first token (no history): unigram bits
      (``bitlen(N) − bitlen(c_uni)``; ``bitlen(N)`` when unseen);
    * bigram seen: ``bitlen(c_uni(w_{i-1})) − bitlen(c_bi)``
      (≈ −log2 of the conditional probability);
    * bigram unseen: 1 backoff bit + the unigram bits of ``w_i``.

    Appends ``n_tokens`` and ``lm2_bits``; empty docs score 0.  Plan:
    row-local pair construction + one posexplode, THREE vocabulary
    joins (bigram on (w1,w2); unigram on the history word for the
    conditional denominator; unigram on the current word for backoff —
    broadcast while the models fit, shuffle equi-joins past that), one
    per-doc aggregate."""
    internal = {"__lm_id", "__lm_ceil", "n_tokens", "lm2_bits"}
    if id_col in internal:
        raise ValueError(f"id_col collides with working names: {id_col!r}")
    # bitlen(N) in-plan (see lm_surprisal_score): the unigram model's
    # shuffle exchange is shared by this branch and both vocabulary
    # joins via ReusedExchange when the model is an unpersisted
    # aggregate — one corpus pass, no driver collect
    n_row = unigrams.agg(
        F.coalesce(F.length(F.bin(F.sum("count"))), F.lit(1)).alias("__lm_ceil")
    )
    t = tokens(F.col(text_col))
    entries = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1))),
        lambda i: F.struct(
            F.when(i > 1, F.element_at(t, i - 1)).alias("prev"),
            F.element_at(t, i).alias("cur"),
        ),
    )
    exploded = docs.select(
        F.col(id_col).alias("__lm_id"),
        F.explode(F.when(F.size(t) >= 1, entries).otherwise(F.array())).alias(
            "e"
        ),
    ).select(
        "__lm_id", F.col("e.prev").alias("prev"), F.col("e.cur").alias("cur")
    ).crossJoin(F.broadcast(n_row))

    def b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_model else df

    uni_cur = b(
        unigrams.select(F.col("token").alias("cur"), F.col("count").alias("__cu"))
    )
    uni_prev = b(
        unigrams.select(
            F.col("token").alias("prev"), F.col("count").alias("__cp")
        )
    )
    bi = b(
        bigrams.select(
            F.col("w1").alias("prev"),
            F.col("w2").alias("cur"),
            F.col("count").alias("__cb"),
        )
    )
    uni_bits_cur = F.coalesce(
        F.col("__lm_ceil") - _bitlen(F.col("__cu")), F.col("__lm_ceil")
    )
    bits = (
        F.when(F.col("prev").isNull(), uni_bits_cur)  # first token
        .when(
            F.col("__cb").isNotNull(),
            _bitlen(F.col("__cp")) - _bitlen(F.col("__cb")),
        )
        .otherwise(F.lit(1) + uni_bits_cur)  # backoff
    )
    scored = (
        exploded.join(bi, ["prev", "cur"], "left")
        .join(uni_prev, "prev", "left")
        .join(uni_cur, "cur", "left")
        .select("__lm_id", bits.alias("__bits"))
        .groupBy("__lm_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("sum(__bits) * 1000 div count(1)").alias("lm2_bits"),
        )
    )
    base = docs.select(F.col(id_col).alias("__lm_id"))
    return base.join(scored, "__lm_id", "left").select(
        F.col("__lm_id").alias(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce(F.col("lm2_bits"), F.lit(0).cast("long")).alias("lm2_bits"),
    )


def perplexity_buckets(
    scored: DataFrame,
    *,
    score_col: str = "lm_bits",
    n_buckets: int = 3,
    out_col: str = "bucket",
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020, arXiv:
    1911.00359 §4.3): partition documents into ``n_buckets`` exact
    score quantiles — bucket 1 = most target-like — so a curation
    policy can keep head+middle, or mix buckets at chosen rates.

    The thresholds come from a BOUNDED-DOMAIN HISTOGRAM, not a global
    sort or an ntile window (a single-partition window is exactly the
    plan that dies at 100 TB): ``score_col`` is the integer milli-bit
    surprisal, whose domain is capped at ``1000 * bitlen(N) <= 64,000``
    distinct values regardless of corpus size, so one map-side-combined
    aggregate + a <=64k-row collect yields exact quantile thresholds as
    driver-held scalars, and the assignment is a row-local CASE.
    Deterministic tie rule (engine-portable, no interpolation):
    ``t_b`` = the smallest score whose cumulative count satisfies
    ``cum * n_buckets >= b * N``; a document's bucket is
    ``1 + #{b : score > t_b}``.  Ties therefore never split across
    buckets (they all take the lower bucket), which can make buckets
    uneven — the price of exactness, same rule on both engines.

    Appends ``out_col`` (int, 1-based).  An empty frame returns empty.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    if out_col in scored.columns:
        raise ValueError(f"column {out_col!r} already exists on the input")
    hist = (
        scored.groupBy(score_col)
        .agg(F.count(F.lit(1)).alias("__pb_c"))
        .collect()
    )
    # explicit contract, not a stray int(None) TypeError: a NULL score
    # has no place on the quantile axis (the gate query coalesces lm
    # scores to non-null; generic callers must do the same or filter)
    if any(r[score_col] is None for r in hist):
        raise ValueError(
            f"perplexity_buckets: {score_col!r} contains NULL — coalesce "
            "or filter NULL scores before bucketing (a NULL has no "
            "position on the quantile axis)"
        )
    items = sorted((int(r[score_col]), int(r["__pb_c"])) for r in hist)
    thresholds = _histogram_thresholds(items, n_buckets)
    bucket = F.lit(1)
    for t in thresholds:
        bucket = bucket + F.when(F.col(score_col) > t, 1).otherwise(0)
    return scored.withColumn(out_col, bucket.cast("int"))


def _histogram_thresholds(
    items: list[tuple[int, int]], n_buckets: int
) -> list[int]:
    """Exact quantile thresholds from a sorted (value, count) histogram
    under the cross-multiplied tie rule: t_b = smallest value whose
    cumulative count satisfies ``cum * n_buckets >= b * N``."""
    n = sum(c for _, c in items)
    thresholds: list[int] = []
    cum, b = 0, 1
    for v, c in items:
        cum += c
        while b < n_buckets and cum * n_buckets >= b * n:
            thresholds.append(v)
            b += 1
    return thresholds


def perplexity_thresholds(
    scored: DataFrame,
    *,
    score_col: str = "lm_bits",
    n_buckets: int = 3,
) -> list[int]:
    """The bucket thresholds ALONE, as driver-held scalars — the
    artifact a streaming gate needs (CCNet's production use: fit the
    terciles on the batch corpus, then drop arriving tail-bucket
    documents row-locally).  Same bounded-domain histogram and tie
    rule as :func:`perplexity_buckets` — ``bucket(x) <= m`` is exactly
    ``x <= thresholds[m-1]`` because the thresholds are non-decreasing,
    so a single scalar comparison replays the bucket gate.  Returns
    ``n_buckets - 1`` values (fewer if the score domain has fewer
    distinct values than buckets — then the missing top buckets are
    empty and every document already passes the loosest gate)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    hist = (
        scored.groupBy(score_col)
        .agg(F.count(F.lit(1)).alias("__pb_c"))
        .collect()
    )
    if any(r[score_col] is None for r in hist):
        raise ValueError(
            f"perplexity_thresholds: {score_col!r} contains NULL — "
            "coalesce or filter NULL scores before bucketing"
        )
    items = sorted((int(r[score_col]), int(r["__pb_c"])) for r in hist)
    return _histogram_thresholds(items, n_buckets)


def collect_lm_table(model: DataFrame) -> tuple[dict[str, int], int]:
    """Collect a :func:`unigram_model` frame into the driver-held
    scoring artifact ``(token -> whole-bit surprisal, ceiling)`` that
    :func:`surprisal_rowwise` folds row-locally — the CCNet deployment
    shape: the LM is a fixed artifact fitted on the reference corpus
    and SHIPPED to the scorer (KenLM model file → here a vocab-sized
    int table), while the corpus being scored streams past it.  Driver
    state is vocabulary-sized, BOUNDED and independent of corpus size
    (the same argument as DSIR's 128-bucket lambda table, at vocab
    scale) — callers with >~1e6-token vocabularies should prune rare
    tokens first (they score within 1 bit of the unseen ceiling
    anyway: count 1..2^k tokens differ from unseen by <= k bits)."""
    rows = model.collect()
    total = sum(int(r["count"]) for r in rows)
    ceil = int(total).bit_length() if total > 0 else 1
    table = {
        str(r["token"]): ceil - int(r["count"]).bit_length() for r in rows
    }
    return table, ceil


def prune_lm_table(
    table: dict[str, int], ceil_bits: int, max_entries: int
) -> tuple[dict[str, int], int]:
    """Bound the scoring artifact's size: keep the ``max_entries``
    most-frequent tokens (lowest surprisal first; lexicographic
    tiebreak, so pruning is deterministic) and return
    ``(pruned_table, max_error_bits)`` — the code for the rule
    :func:`collect_lm_table` documents for >~1e6-token vocabularies
    (round-11 verdict item 5).

    Error bound: a dropped token scores the unseen ceiling instead of
    its table value, so its per-occurrence error is exactly
    ``ceil_bits - bits`` = bitlen(count) — the returned
    ``max_error_bits`` is the max over dropped entries (0 when nothing
    drops).  Per document the milli-bit score moves by at most
    ``1000 * max_error_bits`` and NEVER down (pruning only raises
    surprisal): ``0 <= pruned - full <= 1000 * max_error_bits``,
    because the integer fold is ``sum * 1000 div n`` and the error
    bound times 1000 is an integer that commutes with the floor.
    Property-pinned in tests/test_curation.py; the pruned table is the
    same artifact shape, so both curation gates accept it unchanged."""
    if max_entries < 0:
        raise ValueError(f"max_entries must be >= 0 (got {max_entries})")
    if len(table) <= max_entries:
        return dict(table), 0
    ranked = sorted(table.items(), key=lambda kv: (kv[1], kv[0]))
    kept = dict(ranked[:max_entries])
    max_err = max(ceil_bits - bits for _, bits in ranked[max_entries:])
    return kept, max_err


def surprisal_rowwise(
    docs: DataFrame,
    table: dict[str, int],
    ceil_bits: int,
    *,
    text_col: str = "text",
    out_col: str = "lm_bits",
) -> DataFrame:
    """Row-local replay of :func:`lm_surprisal_score` against a
    driver-held model table — zero joins, zero shuffles, zero state,
    so it runs identically on a batch frame and a streaming micro-batch
    (append mode): the curation chains' LM gate.

    Exactness: the same whole-bit per-token surprisal and the same
    ``sum * 1000 div n_tokens`` integer fold as the join-based scorer —
    ``tests/test_curation.py`` pins the two scorers equal row-for-row.
    The table rides the plan as ONE constant-folded map literal
    (``str_to_map`` of a single string literal — not a 2·|V|-node
    ``create_map`` expression tree), which is what keeps codegen sane
    at real vocabulary sizes.  Appends ``out_col`` (bigint; empty
    documents score 0)."""
    if out_col in docs.columns:
        raise ValueError(f"column {out_col!r} already exists on the input")
    bad = [t for t in table if not t or any(c in ":," for c in t)]
    if bad:
        raise ValueError(
            f"surprisal_rowwise: table keys collide with the map-literal "
            f"delimiters (must match {TOKEN_PATTERN!r}): {bad[:5]}"
        )
    pairs = ",".join(f"{tok}:{bits}" for tok, bits in sorted(table.items()))
    # str_to_map(lit, lit, lit) is foldable: Catalyst evaluates it ONCE
    # into a map literal, so per-row work is just the lookups
    m = F.str_to_map(F.lit(pairs), F.lit(","), F.lit(":"))
    toks = tokens(F.col(text_col))
    total = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.coalesce(
            F.element_at(m, t).cast("bigint"), F.lit(int(ceil_bits))
        ),
    )
    n = F.size(toks).cast("bigint")
    tmp_t, tmp_n = "__lm_rw_sum", "__lm_rw_n"
    if tmp_t in docs.columns or tmp_n in docs.columns:
        raise ValueError(
            f"columns collide with LM working names: {tmp_t}/{tmp_n}"
        )
    return (
        docs.withColumn(tmp_t, total)
        .withColumn(tmp_n, n)
        .withColumn(
            out_col,
            # the batch scorer's exact integer fold: sum * 1000 div n
            F.when(
                F.col(tmp_n) > 0, F.expr(f"{tmp_t} * 1000 div {tmp_n}")
            )
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
        .drop(tmp_t, tmp_n)
    )
