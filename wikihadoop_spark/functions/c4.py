"""C4-style line-rule cleaning (Raffel et al. 2020, arXiv:1910.10683
§2.2) — the rule-based page cleanup that ran BEFORE C4's three-sentence
dedup: keep only lines that end in terminal punctuation and have at
least ``min_words`` words, drop lines containing blocklisted phrases
(C4 used "javascript" from cookie/enable-JS banners), and flag whole
pages containing page-level blocklist markers ("lorem ipsum"
placeholder text, a curly brace as a code smell).

Everything is ROW-LOCAL — line split, per-line word count and
terminal-punctuation test, page flags, and reassembly are higher-order
array expressions inside one projection: zero shuffles, zero state, so
the identical expressions run on a stream in append mode and add
nothing to a batch chain's exchange budget.  All string tests are
plain `contains`/`endswith` (no regex), portable to a SQL oracle
verbatim.

The page FLAG is returned, not applied: dropping pages is a filter the
caller composes (`.filter(F.col("c4_keep_page"))`), keeping this
operator a pure rewrite like segdedup/spandedup — audit-friendly and
loss-explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C4's terminal punctuation: period, exclamation, question mark,
#: closing quotation mark (Raffel et al. §2.2, first rule)
TERMINAL_PUNCT = (".", "!", "?", '"')

#: line-level blocklist: C4 dropped any line with the word
#: "javascript" (enable-JS banners)
LINE_BLOCKLIST = ("javascript",)

#: page-level blocklist: "lorem ipsum" placeholder text and the curly
#: brace (code, not prose) drop the whole page in C4
PAGE_BLOCKLIST = ("lorem ipsum", "{")


def _line_ok(
    line: Column,
    min_words: int,
    terminal_punct: tuple[str, ...],
    line_blocklist: tuple[str, ...],
) -> Column:
    # count NON-EMPTY words: a bare size(split) counts the '' tokens
    # consecutive/leading/trailing spaces produce, under-filtering
    # irregularly spaced web text against the whitespace-word rule
    words = F.filter(F.split(line, " "), lambda w: w != F.lit(""))
    ok = F.size(words) >= min_words
    if terminal_punct:
        ends = [line.endswith(p) for p in terminal_punct]
        terminal = ends[0]
        for e in ends[1:]:
            terminal = terminal | e
        ok = ok & terminal
    for phrase in line_blocklist:
        # lowercase BOTH sides: the line is lowered in-plan, so a
        # non-lowercase blocklist phrase would silently never match
        ok = ok & ~F.contains(F.lower(line), F.lit(phrase.lower()))
    return ok


def c4_clean(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int | None = None,
    terminal_punct: tuple[str, ...] = TERMINAL_PUNCT,
    line_blocklist: tuple[str, ...] = LINE_BLOCKLIST,
    page_blocklist: tuple[str, ...] = PAGE_BLOCKLIST,
    split_regex: str = "\r?\n",
    joiner: str | None = None,
) -> DataFrame:
    """Apply the C4 line rules to each document, row-locally.

    DEFAULTS DEVIATE FROM THE PAPER, intentionally: Raffel et al. §2.2
    retained lines with at least FIVE words and discarded pages with
    fewer than THREE sentences, so the paper-faithful call is
    ``c4_clean(df, min_words=5, min_sentences=3)``.  The shipped
    defaults (``min_words=3``, sentence rule off) are laxer because
    (a) the curation chain that composes this pass
    (`plans/curation.py`) froze on them while driver-gated, and
    (b) short-line corpora (code, chat, the synthetic test tables)
    empty out entirely under the web-prose thresholds — callers
    wanting C4-as-published must opt in explicitly.

    Appends ``n_lines`` / ``n_kept`` / ``c4_keep_page`` and rewrites
    ``text_col`` to the kept lines (original order, joined with
    ``joiner``, default the newline; it is a SEPARATE parameter from
    ``split_regex``, segdedup-style, because the split treats its
    argument as a Java regex while the join is literal — one shared
    value would corrupt documents for any regex-metacharacter
    separator).  The default ``split_regex`` is ``\\r?\\n`` so CRLF
    web text splits cleanly — with a bare ``\\n`` every line would
    keep its trailing ``\\r``, fail the terminal-punctuation test,
    and the document would silently empty; rejoining with the default
    joiner normalizes line endings to ``\\n``.  A line
    survives when it has at least ``min_words`` non-empty
    space-separated words AND ends in one of ``terminal_punct`` AND
    contains no ``line_blocklist`` phrase (case-insensitive).
    ``c4_keep_page`` is False when the ORIGINAL page contains any
    ``page_blocklist`` phrase (case-insensitive) — returned as a flag,
    never applied, so the caller owns the drop and the audit trail.
    With ``min_sentences`` set, the flag additionally requires the
    KEPT text to contain at least that many sentences, where a
    sentence is counted as one ``.``/``!``/``?`` occurrence (a
    deterministic, oracle-replayable stand-in for the reference
    implementation's sentence tokenizer; counted on kept lines, as the
    public C4 pipeline does).  NULL text survives as
    ``(0, 0, true, "")`` — under a sentence minimum its flag is False
    (zero kept sentences), like any other emptied page.
    """
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1 (got {min_words})")
    if min_sentences is not None and min_sentences < 1:
        raise ValueError(
            f"min_sentences must be >= 1 when set (got {min_sentences})"
        )
    if joiner is None:
        joiner = "\n"
    for c in ("n_lines", "n_kept", "c4_keep_page"):
        if c in df.columns:
            raise ValueError(f"column {c!r} already exists on the input")
    lines = F.when(
        F.col(text_col).isNull(), F.array().cast("array<string>")
    ).otherwise(F.split(F.col(text_col), split_regex))
    kept = F.filter(
        lines,
        lambda l: _line_ok(l, min_words, terminal_punct, line_blocklist),
    )
    page_ok = F.lit(True)
    for phrase in page_blocklist:
        # lowercase BOTH sides (same trap as the line blocklist): the
        # page text is lowered in-plan, so a non-lowercase phrase
        # would silently never match
        page_ok = page_ok & ~F.contains(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(phrase.lower()),
        )
    if min_sentences is not None:
        # sentence count over KEPT lines (the public C4 pipeline counts
        # retained sentences): [.!?] occurrences, an exact char-class
        # regex both engines agree on — summed per line so the joiner
        # never enters the count
        n_sentences = F.aggregate(
            kept,
            F.lit(0),
            lambda acc, l: acc
            + F.size(F.regexp_extract_all(l, F.lit("[.!?]"), F.lit(0))),
        )
        page_ok = page_ok & (n_sentences >= min_sentences)
    out_cols = [c for c in df.columns if c != text_col]
    return df.select(
        *out_cols,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        page_ok.alias("c4_keep_page"),
        F.array_join(kept, joiner).alias(text_col),
    )
