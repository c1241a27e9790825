"""Exact-substring span dedup (operators/spandedup.py) edge cases —
semantics the sf-corpus gate query can't isolate: ownership, run
collapse, interval merging, null/short documents, keep_cols, and the
audit view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikihadoop_spark.operators.spandedup import (
    duplicated_spans,
    exact_span_dedup,
    merge_starts,
    positional_window_fps,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_owner_kept_nonowner_span_removed(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta SHARED SPAN OF SIX TOKENS tail one"),
            (2, "gamma delta SHARED SPAN OF SIX TOKENS tail two"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in exact_span_dedup(df, k=3, min_count=2).collect()
    }
    # min (doc_id, position) owns every duplicated window: doc 1 intact
    assert out[1]["n_removed"] == 0
    assert out[1]["text"] == "alpha beta SHARED SPAN OF SIX TOKENS tail one"
    # doc 2 loses the shared run as ONE merged span; the unique prefix
    # and the diverging last token survive
    assert out[2]["n_spans"] == 1
    assert out[2]["text"].startswith("gamma delta")
    assert "SHARED" not in out[2]["text"]
    assert out[2]["text"].endswith("two")


def test_internal_run_collapses_to_owner_window(spark):
    # a phrase repeated inside ONE document dedups too (total
    # occurrence count, not distinct-document df — the ExactSubstr
    # rule segdedup does not have)
    df = _docs(spark, [(7, "a a a a a a a a")])
    row = exact_span_dedup(df, k=2, min_count=2).collect()[0]
    assert row["n_tokens"] == 8
    assert row["n_spans"] == 1
    assert row["text"] == "a"


def test_short_null_and_empty_docs_pass_through(spark):
    df = _docs(spark, [(1, "short doc"), (2, None), (3, "")])
    out = {
        r["doc_id"]: r
        for r in exact_span_dedup(df, k=5, min_count=2).collect()
    }
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (2, 0)
    assert out[1]["text"] == "short doc"
    # NULL text tokenizes to the empty array, survives as (0, 0, 0, '')
    assert (out[2]["n_tokens"], out[2]["n_spans"], out[2]["text"]) == (0, 0, "")
    # empty string is one empty token (split semantics), untouched
    assert (out[3]["n_tokens"], out[3]["text"]) == (1, "")


def test_disjoint_spans_counted_separately(spark):
    df = _docs(
        spark,
        [
            (1, "ONE TWO THREE x y z FOUR FIVE SIX"),
            (2, "ONE TWO THREE p q r FOUR FIVE SIX"),
        ],
    )
    row = {
        r["doc_id"]: r
        for r in exact_span_dedup(df, k=3, min_count=2).collect()
    }[2]
    assert row["n_spans"] == 2
    assert row["n_removed"] == 6
    assert row["text"] == "p q r"


def test_keep_cols_ride_through(spark):
    df = spark.createDataFrame(
        [(1, "s0", "x y z w v"), (2, "s1", "x y z w u")],
        "doc_id bigint, source string, text string",
    )
    out = exact_span_dedup(df, k=4, min_count=2, keep_cols=("source",))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["source"] == "s0" and rows[2]["source"] == "s1"
    assert rows[1]["n_removed"] == 0 and rows[2]["n_removed"] == 4


def test_merge_starts_and_window_fps_row_local(spark):
    df = spark.createDataFrame(
        [([0, 1, 2, 10, 14],)], "st array<int>"
    ).select(merge_starts(F.col("st"), 4).alias("iv"))
    iv = df.collect()[0]["iv"]
    # 0,1,2 chain (gaps <= 4), 10 opens a new interval, 14 abuts its
    # hi (10+4=14) and extends it
    assert [(v["lo"], v["hi"]) for v in iv] == [(0, 6), (10, 18)]
    n = (
        spark.createDataFrame([("a b c d",)], "text string")
        .select(F.size(positional_window_fps(F.split("text", " "), 3)).alias("n"))
        .collect()[0]["n"]
    )
    assert n == 2  # positions 0 and 1


def test_validation_errors(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="k must be >= 2"):
        exact_span_dedup(df, k=1)
    with pytest.raises(ValueError, match="min_count must be >= 2"):
        exact_span_dedup(df, min_count=1)
    with pytest.raises(ValueError, match="collide"):
        exact_span_dedup(
            df.withColumnRenamed("text", "n_tokens"),
            text_col="n_tokens",
        )
    with pytest.raises(ValueError, match="k must be >= 2"):
        duplicated_spans(df, k=0)


def test_audit_view_matches_rewrite(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta SHARED SPAN OF SIX TOKENS tail one"),
            (2, "gamma delta SHARED SPAN OF SIX TOKENS tail two"),
        ],
    )
    audit = duplicated_spans(df, k=3, min_count=2).collect()
    # every non-owner occurrence points at doc 1's position shifted by
    # the differing prefix length (both prefixes are 2 tokens here)
    assert audit and all(r["owner_id"] == 1 for r in audit)
    assert all(r[0] == 2 for r in audit)
    assert all(r["position"] == r["owner_position"] for r in audit)
    # the rewrite removes exactly the union of the audited windows
    starts = sorted(r["position"] for r in audit)
    k = 3
    covered = set()
    for s in starts:
        covered.update(range(s, s + k))
    row = {
        r["doc_id"]: r
        for r in exact_span_dedup(df, k=3, min_count=2).collect()
    }[2]
    assert row["n_removed"] == len(covered)


def test_strip_duplicated_spans_matches_batch_dedup_for_new_docs(spark):
    """The stateless strip against a frequent-window index removes the
    same spans exact_span_dedup would remove from a NON-OWNER document
    (the batch corpus owns every first occurrence), and an empty index
    strips nothing."""
    from wikihadoop_spark.operators.spandedup import (
        collect_window_fps,
        frequent_windows,
        strip_duplicated_spans,
    )

    corpus = _docs(
        spark,
        [
            (1, "alpha beta SHARED SPAN OF SIX TOKENS tail one"),
            (2, "gamma delta SHARED SPAN OF SIX TOKENS tail two"),
        ],
    )
    freq = frequent_windows(corpus, k=3, min_count=2)
    fps = collect_window_fps(freq)
    assert fps
    arriving = _docs(spark, [(9, "prefix SHARED SPAN OF SIX TOKENS suffix")])
    row = strip_duplicated_spans(arriving, fps, k=3).collect()[0]
    assert "SHARED" not in row["text"]
    assert row["text"].startswith("prefix")
    assert row["n_spans"] == 1 and row["n_removed"] > 0
    # arriving doc keeps NO copy: stricter than the batch owner rule
    untouched = strip_duplicated_spans(arriving, [], k=3).collect()[0]
    assert untouched["n_removed"] == 0
    assert untouched["text"] == "prefix SHARED SPAN OF SIX TOKENS suffix"


def test_strip_duplicated_spans_exact_cap_and_validation(spark):
    import wikihadoop_spark.operators.spandedup as sd

    arriving = _docs(spark, [(1, "x y z")])
    with pytest.raises(ValueError, match="MAX_EXACT_WINDOWS"):
        sd.strip_duplicated_spans(
            arriving, list(range(sd.MAX_EXACT_WINDOWS + 1)), k=2
        )
    with pytest.raises(ValueError, match="k must be >= 2"):
        sd.strip_duplicated_spans(arriving, [], k=1)
    with pytest.raises(ValueError, match="min_count must be >= 2"):
        sd.frequent_windows(arriving, min_count=0)


def test_overlapping_distinct_fingerprints_can_rewrite_an_owner(spark):
    """The guarantee is positional, PER FINGERPRINT (round-9 advisor
    item — the docstring used to overclaim "exactly one copy of every
    duplicated span survives"): an owner occurrence's tokens are never
    removed for their OWN fingerprint, but a different duplicated
    fingerprint whose non-owner occurrence overlaps them can still
    rewrite those positions — in this adversarial layout NO intact
    copy of the "x y" span survives anywhere."""
    df = _docs(
        spark,
        [
            (0, "q y z r"),   # owns (y z): (0, pos 1)
            (1, "x y z w"),   # owns (x y) at pos 0; its (y z) at pos 1
                              # is a NON-owner of doc 0's fingerprint
            (2, "x y s t"),   # non-owner of (x y): removed
        ],
    )
    out = {
        r["doc_id"]: r for r in exact_span_dedup(df, k=2, min_count=2).collect()
    }
    assert out[0]["text"] == "q y z r"  # the (y z) owner is intact
    # doc 1 owned (x y), yet y (and z) fell to doc 0's (y z) ownership:
    # the owner position was partially destroyed by the OVERLAPPING
    # distinct fingerprint
    assert out[1]["text"] == "x w"
    assert out[1]["n_removed"] == 2
    # and doc 2's (x y) was removed as a plain non-owner — so no intact
    # "x y" survives in the corpus, which is exactly the softened claim
    assert out[2]["text"] == "s t"
    survivors = " | ".join(r["text"] for r in out.values())
    assert "x y" not in survivors
