"""PII scrubbing: redact emails / IPv4 addresses / long id-like digit
runs from document text before training — a standard curation stage
next to quality filtering and decontamination.

Row-local `regexp_replace` chain inside the scan projection: no
shuffle, no UDF, one data pass at 100 TB.  The patterns deliberately
stay inside the regex subset Java (Spark) and RE2-style engines
(DuckDB, Go) share — character classes, bounded repeats, `\\b` word
boundaries; no lookarounds or backreferences — so the oracle replays
the exact same redactions and the operator ports across engines.

The email classes spell out ``a-zA-Z`` EXPLICITLY (round-7 verdict):
scrubbing runs on RAW document text, and a lowercase-only class
silently under-redacts ``John.Doe@Example.COM`` — for PII,
under-redaction is the failure direction that matters.  The inline
``(?i)`` flag is deliberately NOT used: Java's ``(?i)`` folds ASCII
only while RE2's folds Unicode simple-case (``ſ`` U+017F, KELVIN SIGN
U+212A), so the engines would disagree on which bytes an email-shaped
token spans — explicit ASCII ranges are byte-identical everywhere
(non-ASCII localpart characters stay out of scope in BOTH engines,
consistently).

Counting happens on the ORIGINAL text per pattern (before any
replacement), so counts are order-independent; replacement applies in
the fixed PII_PATTERNS order (emails first — an address contains
digit runs an id pattern would otherwise chew up).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) — order is the replacement order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\d{9,}", "<ID>"),
)


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with its placeholder token (all
    patterns, all occurrences, in PII_PATTERNS order)."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-pattern match counts on the ORIGINAL text (audit columns —
    what a privacy review reads before anything is redacted)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint")
        for name, pat, _ in PII_PATTERNS
    }
