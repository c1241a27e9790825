"""Corpus snapshot delta — incremental-pipeline support: given two
versions of a corpus (yesterday's crawl and today's), classify every
document as ``added`` / ``removed`` / ``changed`` / ``unchanged`` so
downstream curation re-processes ONLY the delta instead of the world.
The training-data loop this serves: re-crawls and refreshed dumps
arrive as full snapshots, but dedup signatures, quality scores, LM
surprisal, and shard packing only need to re-run where content
actually moved.

Change detection is by NORMALIZED content fingerprint (the engine's
``content_fingerprint``: lowercase, strip non-alphanumerics, md5 — the
same identity exact dedup and benchmark decontamination use), so
whitespace/punctuation-only churn does not count as change; pass
``normalized=False`` for byte-level identity.  NULL text hashes to a
sentinel distinct from every real fingerprint AND from empty text, so
NULL→''/''→NULL transitions report ``changed``.

Plan shape (100 TB): fingerprints are row-local inside each scan
projection; the classification is ONE full-outer equi-join on the id
(each side shuffles once on the key it would bucket by in a real
deployment — with both snapshots bucketed by id the join is
exchange-free) followed by a row-local CASE.  Nothing vocabulary- or
pair-shaped; output is one row per id in either snapshot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: classification labels, in the order a reviewer expects
STATUSES = ("added", "removed", "changed", "unchanged")


def _fingerprint(text: Column, normalized: bool) -> Column:
    body = (
        F.md5(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
        if normalized
        else F.md5(text)
    )
    # NULL text must differ from every md5 AND from md5('') — a bare
    # coalesce to '' would call NULL→'' "unchanged"
    return F.coalesce(body, F.lit("__null__"))


def corpus_delta(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
    include_unchanged: bool = False,
) -> DataFrame:
    """One row per document id present in either snapshot:
    ``(id_col, status)`` with ``status`` in ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, fingerprints differ),
    ``unchanged`` (both, fingerprints equal; emitted only with
    ``include_unchanged=True`` — at 100 TB the unchanged set IS the
    corpus, and the point of a delta is not to materialize it)."""
    o = old.select(
        F.col(id_col).alias(id_col),
        _fingerprint(F.col(text_col), normalized).alias("__old_fp"),
    )
    n = new.select(
        F.col(id_col).alias(id_col),
        _fingerprint(F.col(text_col), normalized).alias("__new_fp"),
    )
    status = (
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = o.join(n, id_col, "full_outer").select(
        F.col(id_col), status.alias("status")
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def delta_counts(delta: DataFrame) -> DataFrame:
    """Per-status row counts of a delta frame — the audit line an
    incremental run logs before deciding whether the delta is sane
    (e.g. a crawl bug that "removes" 90% of the corpus should stop the
    pipeline, not flow through it)."""
    return delta.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
