"""Streaming front half of the curation chain: score, filter, and
decontaminate documents AS THEY ARRIVE, instead of re-running batch
curation over the whole corpus per crawl drop.

What composes statelessly (and therefore runs in append mode with
exactly-once file-sink semantics, no watermark, no state store), in
the BATCH CHAIN'S stage order so a document is admitted or dropped by
the same text on both chains:

  arriving docs
    → C4 line rules (optional)                  (batch stage 0.5)
    → hashed quality score + threshold filter   (batch stage 1)
    → DSIR importance gate (optional)           (batch stage 1.5)
    → segment / span strips (optional)          (batch stages 2.5/2.6)
    → Bloom n-gram decontamination              (batch stage 4)
    → token count                               (row-local)

Near-duplicate handling stays SPLIT from this path on purpose: pair
flagging against the corpus is `dedup_stream.stream_candidate_pairs`
(stream-static band join; optionally watermark-collapsed), and
admission/cluster reconciliation is a downstream batch concern — an
in-stream "drop if any pair" would need a per-doc aggregation over the
band fan-out (stateful, watermark-delayed output) and would make the
admit/reject decision racy against concurrent index appends.  Emitting
curated docs + flagged pairs as two append streams keeps both
exactly-once and lets the reconciler own the merge order.

Batch/stream parity: every stage is a deterministic row-local or
broadcast transformation, so running the same function over a batch
frame of the same rows yields the identical result set — pinned by
``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.decontam import NgramBloom, decontaminate_ngram_bloom
from ..operators.dedup import tokens
from ..plans.curation import quality_score


def curate_stream(
    docs: DataFrame,
    *,
    quality_threshold: int = 0,
    bloom: NgramBloom | None = None,
    strip_index=None,
    strip_split: str = "\n",
    span_index=None,
    span_k: int = 5,
    c4_rules: bool = False,
    dsir_lambda: list[int] | None = None,
    dsir_min_bits: int = 0,
    lm_table: tuple[dict[str, int], int] | None = None,
    lm_max_bits: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int | None = None,
    chunk_stride: int | None = None,
) -> DataFrame:
    """Quality-filter, (optionally) decontaminate, and (optionally)
    chunk a document stream.

    Returns the surviving rows with ``quality`` (the hashed linear
    score — kept so downstream keeper policies can prefer the best
    cluster member without re-tokenizing) and ``n_tokens`` appended;
    with ``chunk_tokens`` set, rows become training-sequence chunks
    (`operators/chunking.py` — a stateless posexplode, so it streams)
    carrying ``quality`` through.  Works identically on a batch frame
    (the equivalence test runs both).  The Bloom filter must be
    PRE-BUILT from the eval set
    (`operators/decontam.py:build_ngram_bloom`) — building it is a
    batch job over static data, probing it is the streaming part.
    Stages run in the BATCH CHAIN's order (`plans/curation.py`): the
    quality gate (batch stage 1) and the DSIR gate (batch stage 1.5)
    fire on PRE-strip text, the strips run after them (batch stages
    2.5/2.6), and decontamination probes the post-strip text (batch
    stage 4) — so a document supplied to both chains with the same
    indexes passes or fails identically
    (``tests/test_streaming.py::test_curate_stream_gate_order_matches_batch``
    pins strip_index + quality + dsir together).  After a strip, the
    riding ``quality`` score is RECOMPUTED from the stripped text (the
    batch chain's own post-strip recompute), so downstream keeper
    policies rank the text that ships while the admit decision stays
    pre-strip.  ``strip_index`` (optional): a frequent-segment index —
    the collected segment list or a ``SegmentBloom``
    (`operators/segdedup.py`) — stripped from admitted documents
    row-locally and statelessly, so decontamination shingles and token
    counts see boilerplate-free text; like the
    Bloom filter, building the index is a batch job over the existing
    corpus.  ``span_index`` (optional): a duplicated-window index —
    the collected window fingerprints
    (`operators/spandedup.py::collect_window_fps`) or a
    ``SegmentBloom`` over the window strings — duplicated
    ``span_k``-token spans are stripped from admitted documents right
    after the (optional) segment strip, row-locally and statelessly;
    arriving documents keep NO copy of an indexed span (the batch
    corpus owns every first occurrence).  ``c4_rules``: apply the C4
    line rules (`functions/c4.py`) FIRST, before the gates — the
    batch chain's stage 0.5 position, so a document cleans identically
    on both chains; lines failing the min-words /
    terminal-punctuation / javascript tests are removed and pages
    flagged by the page blocklist are DROPPED (on a stream there is no
    downstream audit pass, so the flag is applied here); row-local,
    stateless.  ``dsir_lambda`` (optional):
    the driver-held DSIR lambda
    table (`operators/dsir.py::collect_lambda_table`, fitted batch-side)
    — arriving documents scoring below ``dsir_min_bits`` are dropped by
    the same row-local fold the batch chain runs (stage 1.5).
    ``lm_table`` + ``lm_max_bits`` (optional, both required together):
    CCNet's perplexity gate — the driver-held ``(token -> whole-bit
    surprisal, ceiling)`` artifact
    (`operators/lm_score.py::collect_lm_table`) and the bucket
    threshold scalar (`perplexity_thresholds`; head+middle =
    ``thresholds[1]``), both fitted batch-side; arriving documents
    scoring above the threshold are dropped by the same row-local fold
    the batch chain runs (stage 1.6), on pre-strip text like the
    quality and DSIR gates."""
    out = docs
    if c4_rules:
        from ..functions.c4 import c4_clean

        # FIRST — the batch chain's stage 0.5 position — so a document
        # cleans identically on both chains: the strips can delete a
        # line's terminal punctuation, and running the rules after
        # them would then delete lines the batch chain (rules-first)
        # keeps
        out = (
            c4_clean(out, text_col=text_col)
            .filter(F.col("c4_keep_page"))
            .drop("n_lines", "n_kept", "c4_keep_page")
        )
    # quality + DSIR gates BEFORE the strips, on pre-strip text — the
    # batch chain's stage order (quality is stage 1, DSIR stage 1.5,
    # the strips 2.5/2.6), so the same document passes or fails both
    # chains identically when strip indexes are supplied
    out = out.withColumn("quality", quality_score(F.col(text_col))).filter(
        F.col("quality") > quality_threshold
    )
    if dsir_lambda is not None:
        from ..operators.dsir import dsir_score_rowwise

        # the batch chain's stage 1.5, verbatim: a literal-array fold —
        # row-local, zero state, so it streams in append mode
        out = (
            dsir_score_rowwise(
                out, dsir_lambda, text_col=text_col, out_col="__dsir"
            )
            .filter(F.col("__dsir") >= dsir_min_bits)
            .drop("__dsir")
        )
    if (lm_table is None) != (lm_max_bits is None):
        # loud contract (round-11 advisor), mirroring the batch chain:
        # half-supplied gate args must not silently skip the LM gate
        raise ValueError(
            "lm_table and lm_max_bits must be supplied together "
            f"(got lm_table={'set' if lm_table is not None else None}, "
            f"lm_max_bits={lm_max_bits!r})"
        )
    if lm_table is not None and lm_max_bits is not None:
        from ..operators.lm_score import surprisal_rowwise

        # the batch chain's stage 1.6, verbatim: CCNet's perplexity
        # tail-drop as a row-local fold against the driver-held
        # (token -> whole-bit surprisal) table with the bucket
        # threshold as ONE scalar (bucket(x) <= m  <=>  x <= t_m) —
        # zero joins, zero state, so it streams in append mode
        out = (
            surprisal_rowwise(
                out, lm_table[0], lm_table[1],
                text_col=text_col, out_col="__lm",
            )
            .filter(F.col("__lm") <= lm_max_bits)
            .drop("__lm")
        )
    if strip_index is not None:
        from ..operators.segdedup import strip_frequent_segments

        out = strip_frequent_segments(
            out, strip_index, text_col=text_col, split_regex=strip_split
        ).drop("n_segments", "n_removed")
    if span_index is not None:
        from ..operators.spandedup import strip_duplicated_spans

        # the batch chain's stage 2.6, statelessly: coarse line strip
        # first (above), then duplicated spans at token offsets
        out = strip_duplicated_spans(
            out, span_index, text_col=text_col, k=span_k
        ).drop("n_tokens", "n_removed", "n_spans")
    if strip_index is not None or span_index is not None:
        # a strip REWROTE the text: recompute the riding quality score
        # (the batch chain recomputes __q after stages 2.5/2.6 the same
        # way) so downstream keeper policies rank the text that ships —
        # the admit decision above stays pre-strip
        out = out.withColumn("quality", quality_score(F.col(text_col)))
    if bloom is not None:
        out = decontaminate_ngram_bloom(out, bloom, text_col=text_col)
    if chunk_tokens is not None:
        from ..operators.chunking import chunk_documents

        return chunk_documents(
            out,
            id_col=id_col,
            text_col=text_col,
            chunk_tokens=chunk_tokens,
            stride=chunk_stride,
            keep_cols=("quality",),
        )
    return out.withColumn(
        "n_tokens", F.size(tokens(F.col(text_col))).cast("bigint")
    )
