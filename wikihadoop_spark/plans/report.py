"""Corpus data card: the per-source audit a training-data team reads
before admitting a corpus — sizes, token counts, quality keep-rates,
exact-duplicate rates, and length percentiles, in ONE Spark job.

Plan shape at 100 TB: every per-document metric (token count, hashed
quality score, content fingerprint) is a row-local expression inside
the scan projection; the card is then a single per-source hash
aggregate (plus `approx_count_distinct` for the duplicate rate — a
sketch, the only honest distinct count at corpus scale).  One data
pass, one shuffle of G tiny rows.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from .curation import content_fingerprint, quality_score


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
    percentiles)."""
    per_doc = docs.select(
        F.col(group_col).alias("g"),
        F.length(F.col(text_col)).cast("bigint").alias("chars"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
        (quality_score(F.col(text_col)) > quality_threshold)
        .cast("long")
        .alias("keep"),
        content_fingerprint(F.col(text_col)).alias("fp"),
    )
    aggs = [
        F.count(F.lit(1)).alias("docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tokens"),
        F.coalesce(F.sum("chars"), F.lit(0)).alias("chars"),
        F.coalesce(F.sum("keep"), F.lit(0)).alias("kept"),
        F.approx_count_distinct("fp").alias("distinct_fp"),
        F.percentile_approx("n_tokens", [0.5, 0.9, 0.99]).alias("pct"),
    ]
    rows = per_doc.groupBy("g").agg(*aggs).collect()
    total = per_doc.agg(*aggs).collect()[0]

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

    return {
        "total": card(total),
        "groups": {str(r["g"]): card(r) for r in rows},
    }


def write_report(report: dict, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
