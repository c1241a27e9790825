"""C4 line-rule cleaning (functions/c4.py) edge cases the gate corpus
can't isolate: each rule in isolation, the page flag as flag-not-drop,
null/empty text, and custom knobs."""

from __future__ import annotations

import pytest

from wikihadoop_spark.functions.c4 import c4_clean


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_each_rule_fires_in_isolation(spark):
    rows = [
        (1, "this line is long enough and ends properly."),
        (2, "too short."),                      # < 3 words
        (3, "three words here no terminal punctuation"),
        (4, "please enable JavaScript to continue browsing!"),  # blocklist
        (5, 'he said "stop right there."'),     # closing quote terminal? ends '."' -> '"'
    ]
    out = {r["doc_id"]: r for r in c4_clean(_docs(spark, rows)).collect()}
    assert out[1]["n_kept"] == 1 and out[1]["text"] == rows[0][1]
    assert out[2]["n_kept"] == 0 and out[2]["text"] == ""
    assert out[3]["n_kept"] == 0
    assert out[4]["n_kept"] == 0  # javascript line dropped despite form
    assert out[5]["n_kept"] == 1  # quotation mark IS terminal punctuation
    # every doc survives as a row — the operator is a rewrite, not a drop
    assert set(out) == {1, 2, 3, 4, 5}


def test_page_flag_is_flag_not_drop(spark):
    rows = [
        (1, "perfectly fine prose that ends with a period."),
        (2, "lorem ipsum dolor sit amet filler text here."),
        (3, "function f() { return 1; } and prose after it."),
    ]
    out = {r["doc_id"]: r for r in c4_clean(_docs(spark, rows)).collect()}
    assert out[1]["c4_keep_page"] is True
    assert out[2]["c4_keep_page"] is False  # lorem ipsum
    assert out[3]["c4_keep_page"] is False  # curly brace
    # flagged pages still come back rewritten, the caller owns the drop
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 1


def test_null_and_empty_text(spark):
    out = {
        r["doc_id"]: r
        for r in c4_clean(_docs(spark, [(1, None), (2, "")])).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["text"]) == (0, 0, "")
    assert out[1]["c4_keep_page"] is True
    assert (out[2]["n_lines"], out[2]["n_kept"], out[2]["text"]) == (1, 0, "")


def test_multiline_keeps_order_and_counts(spark):
    text = "\n".join(
        [
            "the first proper sentence of the page ends here.",
            "click here",
            "the second proper sentence also ends with a mark!",
        ]
    )
    row = c4_clean(_docs(spark, [(1, text)])).collect()[0]
    assert row["n_lines"] == 3 and row["n_kept"] == 2
    assert row["text"].splitlines() == [
        "the first proper sentence of the page ends here.",
        "the second proper sentence also ends with a mark!",
    ]


def test_knobs_and_validation(spark):
    df = _docs(spark, [(1, "two words.")])
    # min_words=2 admits what the default rejects
    assert c4_clean(df, min_words=2).collect()[0]["n_kept"] == 1
    # empty terminal set disables the punctuation rule
    assert (
        c4_clean(
            _docs(spark, [(1, "three words here")]), terminal_punct=()
        ).collect()[0]["n_kept"]
        == 1
    )
    with pytest.raises(ValueError, match="min_words"):
        c4_clean(df, min_words=0)
    with pytest.raises(ValueError, match="already exists"):
        c4_clean(df.withColumn("n_lines", df.doc_id))


def test_review_regressions_wordcount_blocklist_joiner(spark):
    """Three review-confirmed defects pinned: (a) empty tokens from
    irregular spacing must not count as words; (b) a non-lowercase
    blocklist phrase must still match (both sides lowered); (c) the
    split regex and the literal joiner are separate parameters — a
    regex-metacharacter separator must not corrupt the document."""
    # (a) 'word1  word2.' is TWO words — double space adds no word
    row = c4_clean(_docs(spark, [(1, "word1  word2.")])).collect()[0]
    assert row["n_kept"] == 0
    # (b) blocklist phrase given in mixed case still fires
    row = c4_clean(
        _docs(spark, [(1, "please enable javascript right now!")]),
        line_blocklist=("JavaScript",),
    ).collect()[0]
    assert row["n_kept"] == 0
    # (c) '|'-separated lines: split_regex escapes it, joiner is literal
    row = c4_clean(
        _docs(spark, [(1, "a fine sentence here.|another fine one too.")]),
        split_regex="[|]",
        joiner="|",
    ).collect()[0]
    assert row["n_lines"] == 2 and row["n_kept"] == 2
    assert row["text"] == "a fine sentence here.|another fine one too."


def test_crlf_and_page_blocklist_case(spark):
    """CRLF documents split cleanly under the default split regex (a
    bare newline split would leave '\\r' on every line and silently
    empty the doc), and a non-lowercase page-blocklist phrase still
    flags the page."""
    crlf = "a proper sentence ends here.\r\nanother good one follows!\r\n"
    row = c4_clean(_docs(spark, [(1, crlf)])).collect()[0]
    assert row["n_kept"] == 2
    assert row["text"] == (
        "a proper sentence ends here.\nanother good one follows!"
    )
    flagged = c4_clean(
        _docs(spark, [(1, "buy Viagra for sale right now.")]),
        page_blocklist=("Viagra",),
    ).collect()[0]
    assert flagged["c4_keep_page"] is False


def test_min_sentences_page_rule(spark):
    """The opt-in paper-faithful page rule (Raffel et al. §2.2 kept
    pages with >= 3 sentences): sentences are counted as [.!?] marks
    over KEPT lines only, a dropped line's sentences never count, the
    blocklist flag composes with AND, NULL/emptied pages fail the
    minimum, and the default (min_sentences=None) stays the shipped
    lax behavior bit-for-bit."""
    import pytest

    from wikihadoop_spark.functions.c4 import c4_clean

    three = (
        "the first proper sentence sits here.\n"
        "the second proper sentence follows it!\n"
        "does the third proper sentence close?"
    )
    two_plus_dropped = (
        "the first proper sentence sits here.\n"
        "short one here.\n"  # 3 words < 5: dropped, its '.' must NOT count
        "the second proper sentence follows it!"
    )
    rows = {
        r["doc_id"]: r
        for r in c4_clean(
            _docs(
                spark,
                [
                    (1, three),
                    (2, two_plus_dropped),
                    (3, None),
                    (4, "lorem ipsum a. b! c? d. padded words here."),
                ],
            ),
            min_words=5,
            min_sentences=3,
        ).collect()
    }
    assert rows[1]["c4_keep_page"] is True
    assert rows[2]["c4_keep_page"] is False  # only 2 kept sentences
    assert rows[2]["n_kept"] == 2
    assert rows[3]["c4_keep_page"] is False  # NULL text: zero sentences
    assert rows[4]["c4_keep_page"] is False  # blocklist still ANDs in

    # multi-mark lines count every mark: one kept line, three sentences
    row = c4_clean(
        _docs(spark, [(1, "one two three! four five six? seven eight nine.")]),
        min_sentences=3,
    ).collect()[0]
    assert row["c4_keep_page"] is True

    # default off: identical to the pre-rule behavior on an empty page
    row = c4_clean(_docs(spark, [(1, None)])).collect()[0]
    assert row["c4_keep_page"] is True

    with pytest.raises(ValueError, match="min_sentences"):
        c4_clean(_docs(spark, [(1, "x.")]), min_sentences=0)


def test_gate_fixture_sentence_rule_fires_both_ways(spark):
    """The driver-gate query must exercise the sentence minimum in both
    directions at the gate's own scale factor: some pages pass, some
    fail on sentence count alone (not merely via the blocklist)."""
    from wikihadoop_spark.relational import QUERIES

    rows = QUERIES["text_c4_clean"](spark, "/root/testdata/sf0.001").collect()
    kept = [r for r in rows if r.c4_keep_page]
    dropped_clean = [
        r
        for r in rows
        if not r.c4_keep_page and r.doc_id % 7 != 0  # not blocklisted
    ]
    assert kept and dropped_clean
