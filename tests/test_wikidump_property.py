"""Property test: arbitrary page/revision structures round-trip
through the wikidump source, at several split sizes — the
generalization of the reference's randomized split-coverage stress
(TestStreamWikiDumpInputFormat.java:272-344)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wikihadoop_spark.sources.wikidump import read_wikidump

from dump_fixtures import page, rev

text_st = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="<>&\x00",  # xml-escaped chars handled separately
        max_codepoint=0x2FF,
    ),
    max_size=200,
)


@st.composite
def dumps(draw):
    n_pages = draw(st.integers(1, 8))
    pages = []
    expected = []  # (page_id, rev_id, rev_seq, text)
    rid = 0
    for p in range(n_pages):
        page_id = 100 + p
        n_revs = draw(st.integers(1, 6))
        revs = []
        for s in range(n_revs):
            rid += 1
            body = draw(text_st)
            revs.append(
                rev(rid, f"2020-06-{(s % 27) + 1:02d}T01:02:03Z", body)
            )
            expected.append((page_id, rid, s + 1, body))
        pages.append(page(page_id, f"Page {p}", 0, revs))
    xml = "<mediawiki>\n" + "".join(pages) + "</mediawiki>\n"
    return xml, expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(dumps())
@pytest.mark.slow
def test_random_dump_roundtrip(spark, tmp_path_factory, dump):
    xml, expected = dump
    d = tmp_path_factory.mktemp("prop")
    path = d / "dump.xml"
    path.write_text(xml)
    for split in (200, 5000):
        rows = read_wikidump(spark, str(path), splitSize=str(split)).collect()
        got = sorted((r.page_id, r.rev_id, r.rev_seq, r.text) for r in rows)
        assert got == sorted(expected), f"split={split}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(dumps(), st.sampled_from([1, 5, 9]))
@pytest.mark.slow
def test_random_dump_roundtrip_bz2_blocks(spark, tmp_path_factory, dump, level):
    """Same invariance through the block-aligned bz2 splitter, across
    compression levels (block sizes) and split sizes smaller than the
    compressed file."""
    import bz2

    xml, expected = dump
    d = tmp_path_factory.mktemp("propbz")
    path = d / "dump.xml.bz2"
    comp = bz2.compress(xml.encode(), level)
    path.write_bytes(comp)
    for split in (max(1, len(comp) // 5), 300, 1 << 20):
        rows = read_wikidump(spark, str(path), splitsize=str(split)).collect()
        got = sorted((r.page_id, r.rev_id, r.rev_seq, r.text) for r in rows)
        assert got == sorted(expected), f"level={level} split={split}"


# ---------------------------------------------------------------------------
# char-ref decode: the factored fast decoder must equal the combined
# single-pass reference (the r12 implementation, kept here as the spec)
# ---------------------------------------------------------------------------

_REF_NAMED = {b"lt": b"<", b"gt": b">", b"quot": b'"', b"amp": b"&"}
_REF_CHAR_REF = __import__("re").compile(
    rb"&(?:#x([0-9a-fA-F]{1,6})|#([0-9]{1,7})|(lt|gt|quot|amp));"
)


def _reference_unescape(raw: bytes) -> str:
    """The one-combined-pattern one-left-to-right-pass decoder the
    engine's contract is stated against (decoded output never
    rescanned): &#38;lt; -> literal '&lt;', &amp;#160; -> literal
    '&#160;'."""

    def dec(m):
        if m.group(3):
            return _REF_NAMED[m.group(3)]
        cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
        if 0 < cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
            return chr(cp).encode("utf-8")
        return m.group(0)

    if b"&" in raw:
        raw = _REF_CHAR_REF.sub(dec, raw)
    return raw.decode("utf-8", errors="replace")


def test_char_ref_decode_tricky_cases():
    from wikihadoop_spark.sources.wikidump import _unescape

    for raw in (
        b"&amp;lt;",      # XML-escaped literal '&lt;' — must NOT double-decode
        b"&#38;lt;",      # numeric '&' + 'lt;' — output never rescanned
        b"&amp;#160;",    # XML-escaped literal '&#160;' — stays a reference
        b"&quot;&amp;quot;",
        b"&amp;amp;",
        b"&#x41;&amp;&lt;",
        b"a&lt;br&gt;b &#8211; c &bogus; &#xD800; &#0; plain",
        b"&", b"&;", b"&lt", b"",
    ):
        assert _unescape(raw) == _reference_unescape(raw), raw


@settings(max_examples=2000, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                b"&lt;", b"&gt;", b"&amp;", b"&quot;", b"&#8211;", b"&#x41;",
                b"&#38;", b"a", b"b ", b"&", b";", b"#", b"lt;", b"amp;",
                b"&#", b"&am", b"&#999999999;", b"&#xZZ;", b"&#x26;lt;",
            ]
        ),
        max_size=24,
    )
)
def test_char_ref_decode_matches_reference(parts):
    from wikihadoop_spark.sources.wikidump import _unescape

    raw = b"".join(parts)
    assert _unescape(raw) == _reference_unescape(raw)
