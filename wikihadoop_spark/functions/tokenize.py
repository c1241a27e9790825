"""Wikitext tokenizer (reference operator X1).

Splits wikitext into words, wiki-markup tokens, whitespace runs, HTML
entities and single characters — the token alphabet over which the
revision diff runs (reference: revision_differ.py:30-50).

The alternation order is part of the contract: the reference lists
``{{`` BEFORE ``{{{`` (and ``''`` after ``'''``), so a literal
``{{{`` tokenizes as ``{{`` + ``{`` — the template-var alternative is
unreachable.  Conformance reproduces that behavior rather than
"fixing" it (SURVEY.md §7.4.5); ``fixed_order=True`` gives the
longest-match-first variant for new pipelines.
"""

from __future__ import annotations

import re

# Same token classes and the same (quirky) precedence as the reference.
_CONFORMANT = re.compile(
    r"[\w]+"      # word (unicode letters/digits/underscore)
    r"|\[\["      # opening internal link
    r"|\]\]"      # closing internal link
    r"|\{\{"      # opening template  (listed before {{{ -> shadows it)
    r"|\}\}"      # closing template
    r"|\{\{\{"    # opening template var (unreachable, kept for parity)
    r"|\}\}\}"    # closing template var (unreachable)
    r"|\n+"       # newline runs
    r"| +"        # space runs
    r"|&\w+;"     # HTML entity
    r"|'''"       # bold
    r"|''"        # italics
    r"|=+"        # headers
    r"|\{\|"      # table open
    r"|\|\}"      # table close
    r"|\|\-"      # table row
    r"|."         # any other single character
)

_FIXED = re.compile(
    r"[\w]+"
    r"|\[\[|\]\]"
    r"|\{\{\{|\}\}\}"   # longest first: {{{ actually matches
    r"|\{\{|\}\}"
    r"|\n+| +"
    r"|&\w+;"
    r"|'''|''"
    r"|=+"
    r"|\{\||\|\}|\|\-"
    r"|."
)


def tokenize_wikitext(content: str, fixed_order: bool = False) -> list[str]:
    if not content:
        return []
    pattern = _FIXED if fixed_order else _CONFORMANT
    return pattern.findall(content)
