"""Property test: arbitrary page/revision structures round-trip
through the wikidump source, at several split sizes — the
generalization of the reference's randomized split-coverage stress
(TestStreamWikiDumpInputFormat.java:272-344)."""

from __future__ import annotations

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
