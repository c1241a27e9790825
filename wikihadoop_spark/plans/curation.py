"""End-to-end corpus curation: the composition that turns a raw
document table into training shards, chaining the engine's
LLM-pipeline operators in their canonical order:

    quality filter → exact dedup → near-dedup (MinHash/LSH/CC)
    → benchmark decontamination → mixture rebalancing
    → token-budget packing → one-file-per-shard write

Every stage is one of the independently-tested operators; this module
adds only the glue and per-stage row counters.  Counters use
``DataFrame.observe`` (CollectMetrics nodes inside the single plan),
so auditing costs NO extra passes over the data — the counts
materialize when the pipeline's own action runs.

Scale notes (the per-operator arguments live with each operator):
the only corpus-wide shuffles are the exact-dedup keeper semi-join,
the LSH band join, and the packing range partition; quality scoring,
decontamination, and mixture filtering are row-local behind broadcast
state.  The near-dup stage's connected components iterates over
edge-touched nodes only, so its cost is sized by duplicate pairs, not
corpus rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from ..observability import TruncationCounter
from ..operators.components import connected_components
from ..operators.dedup import (
    hash64,
    lsh_candidate_pairs,
    minhash_signatures_rowwise,
    tokens,
)
from ..operators.mixture import mixture_sample
from ..operators.packing import pack_token_budget, write_packed_shards


def quality_score(text: Column) -> Column:
    """Hashed linear quality score (see ``text_quality_model``): sum of
    per-token weights ``hash64(token) % 2001 - 1000``, folded
    row-locally — all-integer, shuffle-free, engine-portable."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, tk: acc + (hash64(tk) % 2001 - 1000),
    )


def content_fingerprint(text: Column) -> Column:
    """Normalized exact-content fingerprint (see ``text_fingerprint``)."""
    return F.md5(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))


@dataclass
class CurationResult:
    """The curated corpus plus per-stage observability.

    With the default ``eager=True`` build, ``counts()`` is valid
    immediately: each value is the row count LEAVING that stage, plus
    ``near_dedup_dropped_members`` — the LSH hot-bucket truncation
    counter (nonzero means a >bucket_cap duplicate cluster was
    under-connected; raise ``bucket_cap`` if full connectivity
    matters).  With ``eager=False`` the below-cache counters (input /
    pii / quality / exact_dedup) are already pinned in-call (see
    ``curate_corpus``); the remaining counters pin to the FIRST action
    a caller runs on ``curated``, which must be a full pass (not
    ``show``/``first``) for those counts to be total."""

    curated: DataFrame
    packed: DataFrame | None
    observations: dict[str, Observation | TruncationCounter] = field(
        default_factory=dict
    )
    _cached: DataFrame | None = None

    def counts(self) -> dict[str, int]:
        # each observation carries one metric (stage row count, or the
        # LSH truncation counter) — read it by position, not name.
        # The truncation counter now rides the LSH plan itself (two
        # attach points, total/kept), but AQE can still prune its kept
        # observe when the corpus is degenerate-empty (every stage
        # above the empty scan collapses): a pruned read IS zero.
        # Stage counts re-raise on a poisoned read — that would be a
        # real ordering bug.
        from ..observability import read_counter

        return {
            name: read_counter(
                o, default=0 if name == "near_dedup_dropped_members" else None
            )
            for name, o in self.observations.items()
        }

    def unpersist(self) -> None:
        """Release the cached exact-deduped corpus ``curated`` builds
        on (call when done with the result; unpersisting ``curated``
        itself would not free the upstream cache entry)."""
        if self._cached is not None:
            self._cached.unpersist()


def _observed(df: DataFrame, name: str, sink: dict[str, Observation]) -> DataFrame:
    obs = Observation(name)
    sink[name] = obs
    return df.observe(obs, F.count(F.lit(1)).alias("rows"))


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    quality_threshold: int = 0,
    near_dup_threshold: float = 0.5,
    n_hashes: int = 16,
    bands: int = 4,
    bucket_cap: int = 1000,
    benchmark: DataFrame | None = None,
    mixture_weights: dict[str, int] | None = None,
    token_budget: int | None = None,
    default_weight: int = 1,
    waterfill: bool = False,
    shard_budget: int | None = None,
    out_dir: str | None = None,
    eager: bool = True,
    keeper: str = "min_id",
    scrub: bool = False,
    c4_rules: bool = False,
    strip_boilerplate: bool = False,
    boilerplate_min_df: int = 2,
    boilerplate_split: str = "\n",
    dedup_spans: bool = False,
    span_k: int = 5,
    span_min_count: int = 2,
    dsir_lambda: list[int] | None = None,
    dsir_min_bits: int = 0,
    lm_table: tuple[dict[str, int], int] | None = None,
    lm_max_bits: int | None = None,
    chunk_tokens: int | None = None,
    chunk_stride: int | None = None,
    shuffle_seed: int | None = None,
) -> CurationResult:
    """Run the full curation chain over ``docs``.

    ``benchmark`` (optional): rows with ``text_col`` to decontaminate
    against — its fingerprints are broadcast, so it must be eval-set
    sized, not corpus sized.  ``token_budget`` (optional): enables the
    mixture stage; ``mixture_weights`` defaults to uniform
    (``default_weight`` for every group) when omitted, and weights
    without a budget raise (a half-specified mixture must not silently
    no-op); ``waterfill`` redistributes capped groups' unused budget.  ``shard_budget`` (optional): token budget per output
    shard; with ``out_dir`` the shards are also written (one ordered
    parquet file per shard).

    ``scrub``: redact PII (emails/IPv4s/id runs, `functions/scrub.py`)
    FIRST, before anything derives from the text — fingerprints,
    signatures, and shards all see scrubbed text only, so PII never
    leaks into persisted dedup state; the ``pii_redactions`` counter
    records total matches.

    ``c4_rules``: apply the C4 line rules (`functions/c4.py`, Raffel
    et al. 2020 §2.2) right after the scrub and before the quality
    gate — lines failing the min-words / terminal-punctuation /
    javascript tests are removed, pages flagged by the page blocklist
    are dropped, and every later stage (quality, fingerprints,
    signatures, budgets) sees rule-cleaned text; row-local, so the
    stage adds no exchange.  Counters: ``c4_lines_removed`` (lines)
    and ``c4_pages`` (surviving rows).

    ``strip_boilerplate``: run segment-frequency dedup
    (`operators/segdedup.py`) on the exact-deduped corpus — every line
    (``boilerplate_split`` separated) occurring in
    ``boilerplate_min_df``-or-more documents is removed except its
    corpus-first copy, BEFORE near-dup signatures and token counts, so
    boilerplate neither clusters unrelated documents nor inflates
    shard budgets; the ``boilerplate_segments_removed`` counter
    records stripped segments.

    ``dedup_spans``: run exact-substring span dedup
    (`operators/spandedup.py`) after the (optional) boilerplate strip
    and before near-dup signatures — every duplicated ``span_k``-token
    span (``span_min_count``-or-more occurrences corpus-wide) is
    removed at arbitrary token offsets except its corpus-first copy,
    so mid-sentence duplicated passages neither cluster unrelated
    documents nor inflate shard budgets; the ``span_tokens_removed``
    counter records removed tokens.  The stage never drops a document.

    ``chunk_tokens`` (optional): split the
    curated documents into training-sequence windows
    (`operators/chunking.py`; ``chunk_stride`` defaults to disjoint)
    as the final pre-packing stage — shards then pack chunks in
    (id, chunk_idx) order via the packing tiebreak.

    ``dsir_lambda`` (optional): the driver-held per-bucket DSIR
    lambda table (`operators/dsir.py::collect_lambda_table`, fitted
    once as a batch job over a target/raw split) — documents whose
    row-local whole-bit importance weight falls below
    ``dsir_min_bits`` are dropped right after the quality gate, so
    every expensive downstream stage sees target-like text only; the
    ``dsir`` counter records survivors.  Zero shuffles (a literal-array
    fold), and the identical stage runs statelessly on the streaming
    chain.

    ``lm_table`` + ``lm_max_bits`` (optional, both required together):
    the CCNet perplexity gate — ``lm_table`` is the driver-held
    ``(token -> whole-bit surprisal, ceiling)`` artifact
    (`operators/lm_score.py::collect_lm_table`, fitted once on the
    reference corpus) and ``lm_max_bits`` the bucket threshold scalar
    (`perplexity_thresholds`; keep head+middle = pass
    ``thresholds[1]``).  Documents scoring above it are dropped right
    after the DSIR gate (stage 1.6), row-locally and statelessly —
    the ``lm`` counter records survivors; the identical gate runs on
    the streaming chain.

    ``shuffle_seed`` (optional, needs ``shard_budget``): pack in
    deterministic pseudo-random order instead of id order — the
    training-order shuffle (`operators/shuffle.py`).  The key is a
    pure row function of (seed, id), so the layout reproduces on any
    cluster/partition count (``orderBy(rand(seed))`` does not); the
    ``shuffle_order`` column rides along in the output as provenance.

    ``keeper``: which member survives a near-duplicate cluster —
    ``"min_id"`` (default, cheapest: the component label IS the
    keeper) or ``"best_quality"`` (the member with the highest hashed
    quality score, id as the deterministic tiebreak; one extra
    aggregate over cluster members — sized by duplicate clusters, not
    the corpus).

    ``eager`` (default True): materialize the result inside this call
    (one ``localCheckpoint`` pass).  This guarantees every stage
    counter fires exactly once on the FULL data.  With ``eager=False``
    the chain STILL materializes the scrub → quality → exact-dedup
    prefix in-call: populating the internal cache takes one count, and
    running it here pins the below-cache counters (input / pii /
    quality / exact_dedup) with real rows while the AQE
    empty-relation guard is active (the alternative — deferring to the
    caller's first action — is exactly the counter-poisoning bug the
    guard exists for).  Only the ABOVE-cache counters (near_dedup,
    decontaminate, mixture, chunks) pin to the caller's first action,
    so a limiting action (``show(5)``, ``first()``) records partial
    counts for those, the caller must release the internal cache via
    :meth:`CurationResult.unpersist`, and degenerate-empty corpora can
    still poison the above-cache counters pinned by later caller
    actions.  ``eager=False`` therefore saves the checkpoint write of
    the final chain, not the cost of the curation prefix.
    """
    if mixture_weights is not None and token_budget is None:
        raise ValueError(
            "mixture_weights given without token_budget: the mixture "
            "stage needs both (pass token_budget to enable it)"
        )
    if waterfill and token_budget is None:
        raise ValueError(
            "waterfill given without token_budget: the mixture stage is "
            "skipped entirely without a budget, so the flag would "
            "silently no-op (pass token_budget to enable it)"
        )
    if shuffle_seed is not None and shard_budget is None:
        raise ValueError(
            "shuffle_seed given without shard_budget: the shuffle orders "
            "the packing stage, which doesn't run without a budget, so "
            "the flag would silently no-op (pass shard_budget to enable it)"
        )
    if token_budget is not None and mixture_weights is None:
        mixture_weights = {}  # uniform: every group gets default_weight
    if keeper not in ("min_id", "best_quality"):
        raise ValueError(f"unknown keeper policy: {keeper!r}")
    # working/output column names this chain introduces: a corpus that
    # already carries one (n_tokens is common) would have it silently
    # overwritten in the curated output — refuse up front instead
    reserved = ["__q", "__fp", "n_tokens"]
    if scrub:
        reserved += ["__pii"]
    if c4_rules:
        reserved += ["n_lines", "n_kept", "c4_keep_page"]
    if strip_boilerplate:
        reserved += ["n_segments", "n_removed"]
    if dedup_spans:
        reserved += ["n_removed", "n_spans"]
    if token_budget is not None:
        reserved += ["bucket", "keep_threshold"]
    if chunk_tokens is not None:
        reserved += ["chunk_idx", "chunk_text"]
    if shard_budget is not None:
        reserved += ["cum_tokens", "shard"]
    if shuffle_seed is not None:
        reserved += ["shuffle_order"]
    clash = [c for c in docs.columns if c in reserved]
    if clash:
        raise ValueError(
            f"input columns collide with curation working names: {clash} "
            "— rename them (e.g. n_tokens is recomputed by the chain)"
        )
    # AQE's empty-relation propagation PRUNES CollectMetrics nodes from
    # any execution where a join side turns out empty (zero near-dup
    # pairs; a quality filter that drops everything upstream of the
    # exact-dedup semi-join) — the pruned observation resolves with an
    # empty row, poisoning counts(), and for the input counter the
    # lost value is NONZERO, so "pruned means 0" is not a valid read.
    # Exclude the rule while THIS call runs its actions (empty-relation
    # shortcuts only ever accelerate degenerate empty plans, so nothing
    # of value is lost); restore the caller's setting after.
    spark = docs.sparkSession
    _excl_key = "spark.sql.adaptive.optimizer.excludedRules"
    _aqe_rule = (
        "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
    )
    prev_excluded = spark.conf.get(_excl_key, None)
    merged = (
        _aqe_rule
        if not prev_excluded
        else prev_excluded
        if _aqe_rule in prev_excluded
        else f"{prev_excluded},{_aqe_rule}"
    )
    spark.conf.set(_excl_key, merged)
    try:
        return _curate_corpus_impl(
            docs,
            id_col=id_col,
            text_col=text_col,
            group_col=group_col,
            quality_threshold=quality_threshold,
            near_dup_threshold=near_dup_threshold,
            n_hashes=n_hashes,
            bands=bands,
            bucket_cap=bucket_cap,
            benchmark=benchmark,
            mixture_weights=mixture_weights,
            token_budget=token_budget,
            default_weight=default_weight,
            waterfill=waterfill,
            shard_budget=shard_budget,
            out_dir=out_dir,
            eager=eager,
            keeper=keeper,
            scrub=scrub,
            c4_rules=c4_rules,
            strip_boilerplate=strip_boilerplate,
            boilerplate_min_df=boilerplate_min_df,
            boilerplate_split=boilerplate_split,
            dedup_spans=dedup_spans,
            span_k=span_k,
            span_min_count=span_min_count,
            dsir_lambda=dsir_lambda,
            dsir_min_bits=dsir_min_bits,
            lm_table=lm_table,
            lm_max_bits=lm_max_bits,
            chunk_tokens=chunk_tokens,
            chunk_stride=chunk_stride,
            shuffle_seed=shuffle_seed,
        )
    finally:
        if prev_excluded is None:
            spark.conf.unset(_excl_key)
        else:
            spark.conf.set(_excl_key, prev_excluded)


def _curate_corpus_impl(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    group_col: str,
    quality_threshold: int,
    near_dup_threshold: float,
    n_hashes: int,
    bands: int,
    bucket_cap: int,
    benchmark: DataFrame | None,
    mixture_weights: dict[str, int] | None,
    token_budget: int | None,
    default_weight: int,
    waterfill: bool,
    shard_budget: int | None,
    out_dir: str | None,
    eager: bool,
    keeper: str,
    scrub: bool,
    chunk_tokens: int | None,
    chunk_stride: int | None,
    shuffle_seed: int | None = None,
    c4_rules: bool = False,
    strip_boilerplate: bool = False,
    boilerplate_min_df: int = 2,
    boilerplate_split: str = "\n",
    dedup_spans: bool = False,
    span_k: int = 5,
    span_min_count: int = 2,
    dsir_lambda: list[int] | None = None,
    dsir_min_bits: int = 0,
    lm_table: tuple[dict[str, int], int] | None = None,
    lm_max_bits: int | None = None,
) -> CurationResult:
    obs: dict[str, Observation] = {}
    cur = _observed(docs, "input", obs)

    # 0. PII scrub: FIRST, so no later stage (fingerprints, minhash
    # signatures, shards) ever derives from unredacted text; row-local
    # regexp chain, no shuffle — the counter records total matches
    if scrub:
        from ..functions.scrub import pii_counts, scrub_pii

        redactions = None
        for c in pii_counts(F.col(text_col)).values():
            redactions = c if redactions is None else redactions + c
        scrub_obs = Observation("scrub")
        obs["pii_redactions"] = scrub_obs
        cur = (
            cur.withColumn("__pii", redactions)
            # coalesce: sum over an EMPTY corpus is NULL, not 0
            .observe(scrub_obs, F.coalesce(F.sum("__pii"), F.lit(0)).alias("pii"))
            .withColumn(text_col, scrub_pii(F.col(text_col)))
            .drop("__pii")
        )

    # 0.5 C4 line rules (optional): row-local rewrite + page drop,
    # BEFORE the quality gate so the score (and everything after)
    # describes rule-cleaned text; the lines counter rides the plan
    if c4_rules:
        from ..functions.c4 import c4_clean

        c4_obs = Observation("c4_lines")
        obs["c4_lines_removed"] = c4_obs
        cur = _observed(
            c4_clean(cur, text_col=text_col)
            .observe(
                c4_obs,
                F.coalesce(
                    F.sum(F.col("n_lines") - F.col("n_kept")), F.lit(0)
                ).alias("lines"),
            )
            .filter(F.col("c4_keep_page"))
            .drop("n_lines", "n_kept", "c4_keep_page"),
            "c4_pages",
            obs,
        )

    # 1. model-based quality filter: row-local, no shuffle (the score
    # rides along as __q for the best_quality keeper policy)
    cur = _observed(
        cur.withColumn("__q", quality_score(F.col(text_col))).filter(
            F.col("__q") > quality_threshold
        ),
        "quality",
        obs,
    )

    # 1.5 DSIR target-likeness selection (optional): a row-local fold
    # against the driver-held lambda table (fitted once as a batch job
    # — operators/dsir.py::collect_lambda_table), zero shuffles, the
    # same stage the streaming chain runs statelessly.  Early, so every
    # expensive stage downstream (signatures, CC, packing) only sees
    # target-like documents.
    if dsir_lambda is not None:
        from ..operators.dsir import dsir_score_rowwise

        cur = _observed(
            dsir_score_rowwise(
                cur, dsir_lambda, text_col=text_col, out_col="__dsir"
            )
            .filter(F.col("__dsir") >= dsir_min_bits)
            .drop("__dsir"),
            "dsir",
            obs,
        )

    # 1.6 LM perplexity gate (optional, CCNet's production tercile
    # use: drop the tail bucket on the way in): a row-local fold
    # against the driver-held (token -> whole-bit surprisal) table
    # fitted once batch-side (operators/lm_score.py::collect_lm_table)
    # with the bucket threshold as ONE scalar
    # (perplexity_thresholds[m-1]; bucket(x) <= m  <=>  x <= t_m).
    # Zero shuffles, zero state — the identical stage runs statelessly
    # on the streaming chain.
    if (lm_table is None) != (lm_max_bits is None):
        # loud contract (round-11 advisor): a caller supplying only one
        # half would otherwise ship an UNGATED corpus with no error
        raise ValueError(
            "lm_table and lm_max_bits must be supplied together "
            f"(got lm_table={'set' if lm_table is not None else None}, "
            f"lm_max_bits={lm_max_bits!r})"
        )
    if lm_table is not None and lm_max_bits is not None:
        from ..operators.lm_score import surprisal_rowwise

        cur = _observed(
            surprisal_rowwise(
                cur, lm_table[0], lm_table[1],
                text_col=text_col, out_col="__lm",
            )
            .filter(F.col("__lm") <= lm_max_bits)
            .drop("__lm"),
            "lm",
            obs,
        )

    # 2. exact dedup: deterministic min-id keeper per fingerprint
    fp = cur.withColumn("__fp", content_fingerprint(F.col(text_col)))
    keeper_ids = (
        fp.groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    cur = _observed(
        fp.join(keeper_ids, id_col, "left_semi"), "exact_dedup", obs
    )
    # the exact-deduped corpus feeds FOUR downstream consumers (the
    # signatures, the CC vertex set, the mixture totals, and the final
    # chain) — persist it so the scan + dedup joins execute once, not
    # once per consumer; spills to disk when it outgrows memory.
    # Counters upstream fire on the first materialization only (cached
    # reads skip their CollectMetrics nodes).
    cur = cached = cur.persist()
    # Pin the below-cache counters NOW with a plain count: it populates
    # the cache (which the next consumer would have paid anyway) and
    # completes input/pii/quality/exact_dedup with REAL rows.  Without
    # this, the first execution embedding this subtree can be one where
    # AQE's empty-relation propagation pruned the CollectMetrics nodes
    # (e.g. a corpus yielding ZERO near-dup pairs empties the CC join),
    # which resolves those observations with an empty row and poisons
    # every later read — a real bug this chain shipped with until a
    # two-document corpus exposed it (drill in tests/test_curation.py).
    # Observations keep their FIRST completion, so pinning first wins.
    cached.count()

    # 2.5 boilerplate strip (optional): segment-frequency dedup over
    # the persisted exact-deduped corpus — BEFORE signatures and token
    # counts, so repeated boilerplate neither clusters unrelated
    # documents in the near-dup stage nor inflates shard budgets.  The
    # operator's two passes (dup table + rewrite join) both re-read
    # the cache; the counter records stripped segments, not rows (the
    # stage never drops a document — empty survivors fall to the
    # quality gate a caller applies downstream if desired).
    if strip_boilerplate:
        from ..operators.segdedup import segment_frequency_dedup

        keep = [c for c in cur.columns if c not in (id_col, text_col)]
        seg_obs = Observation("segments")
        obs["boilerplate_segments_removed"] = seg_obs
        stripped = (
            segment_frequency_dedup(
                cur,
                id_col=id_col,
                text_col=text_col,
                split_regex=boilerplate_split,
                min_df=boilerplate_min_df,
                keep_cols=tuple(keep),
            )
            .observe(
                seg_obs,
                F.coalesce(F.sum("n_removed"), F.lit(0)).alias("segments"),
            )
            .drop("n_segments", "n_removed")
            # the strip REWROTE the text: the fingerprint and quality
            # score riding along from stages 1-2 describe the pre-strip
            # bytes.  Recompute both (row-local, folded into the same
            # persist materialization) so stage 4's benchmark anti-join
            # matches the text that actually ships — a stripped doc
            # byte-equal to a benchmark row must HIT — and the
            # best_quality keeper ranks post-strip quality.
            .withColumn("__fp", content_fingerprint(F.col(text_col)))
            .withColumn("__q", quality_score(F.col(text_col)))
        )
        # the stripped frame replaces the exact-deduped one as the
        # chain's multi-consumer point: persist it (materializing also
        # pins the segments counter), then release the superseded cache
        stripped = stripped.persist()
        stripped.count()
        cached.unpersist()
        cur = cached = stripped

    # 2.6 exact-substring span dedup (optional): duplicated k-token
    # spans removed at arbitrary offsets (operators/spandedup.py),
    # AFTER the line-level boilerplate strip (coarse first: a stripped
    # line never feeds window fingerprints) and BEFORE signatures and
    # token counts — the same persist-swap discipline as 2.5.  Never
    # drops a document; the counter records removed TOKENS.
    if dedup_spans:
        from ..operators.spandedup import exact_span_dedup

        keep = [c for c in cur.columns if c not in (id_col, text_col)]
        span_obs = Observation("spans")
        obs["span_tokens_removed"] = span_obs
        despanned = (
            exact_span_dedup(
                cur,
                id_col=id_col,
                text_col=text_col,
                k=span_k,
                min_count=span_min_count,
                keep_cols=tuple(keep),
            )
            .observe(
                span_obs,
                F.coalesce(F.sum("n_removed"), F.lit(0)).alias("tokens"),
            )
            .drop("n_tokens", "n_removed", "n_spans")
            # the rewrite invalidates the riding fingerprint and
            # quality score — recompute both so the benchmark anti-join
            # and the best_quality keeper see the text that ships
            .withColumn("__fp", content_fingerprint(F.col(text_col)))
            .withColumn("__q", quality_score(F.col(text_col)))
        )
        despanned = despanned.persist()
        despanned.count()
        cached.unpersist()
        cur = cached = despanned

    # 3. near-dedup: row-local signatures -> capped LSH pairs -> CC keepers
    sig = minhash_signatures_rowwise(
        cur, id_col=id_col, text_col=text_col, n_hashes=n_hashes
    )
    # two-point total/kept counter riding the LSH plan itself — the
    # signature subtree is evaluated exactly once, counter on or off
    lsh_obs = TruncationCounter()
    obs["near_dedup_dropped_members"] = lsh_obs
    pairs = lsh_candidate_pairs(
        sig,
        id_col=id_col,
        n_hashes=n_hashes,
        bands=bands,
        bucket_cap=bucket_cap,
        observation=lsh_obs,
    ).filter(F.col("est_jaccard") >= near_dup_threshold)
    cc = connected_components(cur.select(id_col), pairs, id_col=id_col)
    if keeper == "best_quality":
        # highest score per cluster, min id on ties: min_by over the
        # (-score, id) struct; the aggregate is keyed by component, so
        # its cost scales with duplicate clusters, not corpus rows
        near_keepers = (
            cc.join(cur.select(id_col, "__q"), id_col)
            .groupBy("component")
            .agg(
                F.min_by(
                    id_col,
                    F.struct(
                        (-F.col("__q")).alias("nq"), F.col(id_col).alias("i")
                    ),
                ).alias(id_col)
            )
            .select(id_col)
        )
    else:
        near_keepers = cc.filter(F.col(id_col) == F.col("component")).select(id_col)
    cur = _observed(cur.join(near_keepers, id_col, "left_semi"), "near_dedup", obs)

    # 4. benchmark decontamination: broadcast anti-join on the cached
    # __fp column — computed by stage 2, or recomputed by stage 2.5
    # when the strip rewrote the text (either way no extra pass here)
    if benchmark is not None:
        bench_fp = (
            benchmark.select(content_fingerprint(F.col(text_col)).alias("__fp"))
            .distinct()
        )
        cur = _observed(
            cur.join(F.broadcast(bench_fp), "__fp", "left_anti"),
            "decontaminate",
            obs,
        )
    cur = cur.drop("__fp", "__q")

    # token counts ride along for mixture + packing
    cur = cur.withColumn(
        "n_tokens", F.size(tokens(F.col(text_col))).cast("bigint")
    )

    # 5. mixture rebalancing toward target token proportions
    if mixture_weights is not None and token_budget is not None:
        cur = _observed(
            mixture_sample(
                cur,
                group_col=group_col,
                tokens_col="n_tokens",
                id_col=id_col,
                weights=mixture_weights,
                token_budget=token_budget,
                default_weight=default_weight,
                waterfill=waterfill,
            ).drop("bucket", "keep_threshold"),
            "mixture",
            obs,
        )

    # 6. training-sequence chunking: the curated documents become
    # sequence-sized rows (higher-order exprs + one explode, no
    # shuffle); shards below then pack CHUNKS in (id, chunk_idx) order
    if chunk_tokens is not None:
        from ..operators.chunking import chunk_documents

        keep = tuple(c for c in (group_col,) if c in cur.columns)
        cur = _observed(
            chunk_documents(
                cur.drop("n_tokens"),
                id_col=id_col,
                text_col=text_col,
                chunk_tokens=chunk_tokens,
                stride=chunk_stride,
                keep_cols=keep,
            ),
            "chunks",
            obs,
        )

    # 7. materialize, then pack into fixed-budget shards
    #
    # The eager localCheckpoint serves three jobs at once: (a) every
    # stage counter fires exactly once on the FULL data (a caller's
    # limiting first action would otherwise pin partial counts, and
    # the range partition below SAMPLES its boundaries in a separate
    # pass, which would double-count); (b) the join/CC lineage is
    # truncated before further consumers; (c) the build-time cache can
    # be released immediately instead of leaking to the caller.
    packed = None
    if eager or shard_budget is not None:
        cur = cur.localCheckpoint(eager=True)
        cached.unpersist()
        cached = None
    if shard_budget is not None:
        # chunked corpora have several rows per doc id: chunk_idx
        # completes the total order so packing stays bit-reproducible
        tiebreak = ["chunk_idx"] if chunk_tokens is not None else []
        order = id_col
        if shuffle_seed is not None:
            # training order: deterministic seeded shuffle (a pure row
            # function of (seed, id) — reproducible on any cluster and
            # partition count, unlike orderBy(rand(seed))); shards then
            # interleave sources instead of replaying ingest order.
            # (id [, chunk_idx]) completes the total order across the
            # astronomically-rare 60-bit hash ties.
            from ..operators.shuffle import shuffle_order

            cur = cur.withColumn(
                "shuffle_order", shuffle_order(shuffle_seed, F.col(id_col))
            )
            order, tiebreak = "shuffle_order", [id_col] + tiebreak
        if out_dir is not None:
            packed = write_packed_shards(
                cur,
                out_dir,
                order_col=order,
                tokens_col="n_tokens",
                budget=shard_budget,
                tiebreak_col=tiebreak or None,
            )
        else:
            packed = pack_token_budget(
                cur,
                order_col=order,
                tokens_col="n_tokens",
                budget=shard_budget,
                tiebreak_col=tiebreak or None,
            )

    return CurationResult(curated=cur, packed=packed, observations=obs, _cached=cached)
