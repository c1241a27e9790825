"""Corpus data card: the per-source audit a training-data team reads
before admitting a corpus — sizes, token counts, quality keep-rates,
exact-duplicate rates, and length percentiles, in ONE Spark action.

Plan shape at 100 TB: every per-document metric (token count, hashed
quality score, content fingerprint) is a row-local expression inside
the scan projection; the card is then a SINGLE ``rollup`` aggregate —
the NULL grouping row IS the corpus total (``approx_count_distinct``'s
HLL sketch and ``percentile_approx`` merge correctly under rollup), so
per-source cards and the total come out of one data pass.  The rollup
Expand duplicates only the tiny projected rows (g, two longs, a flag,
an md5), never the text: the corpus is scanned and tokenized exactly
once.  One action, one shuffle of 2·G tiny rows (asserted in
tests/test_report.py; the exact integer columns are driver-gated as
``corpus_report_card``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from .curation import content_fingerprint, quality_score


def report_frame(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    quality_threshold: int = 0,
) -> DataFrame:
    """The data-card aggregate as a DataFrame: one row per source plus
    the rollup total row (``is_total = 1``, ``g`` NULL).  Exact integer
    columns (docs/tokens/chars/kept) next to the two sketches
    (approx-distinct fingerprints, approximate length percentiles)."""
    per_doc = docs.select(
        F.col(group_col).alias("g"),
        F.length(F.col(text_col)).cast("bigint").alias("chars"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
        (quality_score(F.col(text_col)) > quality_threshold)
        .cast("long")
        .alias("keep"),
        content_fingerprint(F.col(text_col)).alias("fp"),
    )
    return per_doc.rollup("g").agg(
        F.grouping("g").cast("int").alias("is_total"),
        F.count(F.lit(1)).alias("docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tokens"),
        F.coalesce(F.sum("chars"), F.lit(0)).alias("chars"),
        F.coalesce(F.sum("keep"), F.lit(0)).alias("kept"),
        F.approx_count_distinct("fp").alias("distinct_fp"),
        F.percentile_approx("n_tokens", [0.5, 0.9, 0.99]).alias("pct"),
    )


def corpus_report(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    quality_threshold: int = 0,
) -> dict:
    """One-pass per-source data card.  Returns
    ``{"total": {...}, "groups": {source: {...}}}`` where each entry
    carries ``docs``, ``tokens``, ``chars``, ``quality_keep_rate``
    (share of docs the hashed linear model keeps at ``threshold``),
    ``dup_rate`` (1 − approx-distinct fingerprints / docs; ~0 for a
    clean corpus), and ``p50/p90/p99_tokens`` (approximate length
    percentiles).  ONE collect over the rollup frame — the total row
    rides the same aggregate as the groups."""
    rows = report_frame(
        docs,
        text_col=text_col,
        group_col=group_col,
        quality_threshold=quality_threshold,
    ).collect()

    def card(r) -> dict:
        docs_n = int(r["docs"])
        return {
            "docs": docs_n,
            "tokens": int(r["tokens"]),
            "chars": int(r["chars"]),
            "quality_keep_rate": (int(r["kept"]) / docs_n) if docs_n else 0.0,
            "dup_rate": max(0.0, 1.0 - int(r["distinct_fp"]) / docs_n)
            if docs_n
            else 0.0,
            "p50_tokens": int(r["pct"][0]) if r["pct"] else 0,
            "p90_tokens": int(r["pct"][1]) if r["pct"] else 0,
            "p99_tokens": int(r["pct"][2]) if r["pct"] else 0,
        }

    totals = [r for r in rows if r["is_total"] == 1]
    return {
        "total": card(totals[0]),
        "groups": {
            str(r["g"]): card(r) for r in rows if r["is_total"] == 0
        },
    }


def write_report(report: dict, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
