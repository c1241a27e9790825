"""Block-aligned splittable bz2 reads (reference S2:
SeekableInputStream.java:50-57, StreamWikiDumpInputFormat.java:195-203;
randomized layout/blocksize matrix modeled on
TestStreamWikiDumpInputFormat.java:272-344)."""

from __future__ import annotations

import bz2

import pytest

from tests.dump_fixtures import big_dump, standard_dump, write_dump
from wikihadoop_spark.sources.bz2blocks import (
    Bz2BlockStream,
    decode_block,
    iter_magics,
)
from wikihadoop_spark.sources.wikidump import read_wikidump


def _write_bz2(tmp_path, payload: bytes, name="d.xml.bz2", level=1) -> str:
    p = tmp_path / name
    p.write_bytes(bz2.compress(payload, level))
    return str(p)


# -- container-level primitives ------------------------------------------


def test_magic_scan_finds_all_blocks(tmp_path):
    # bzip2 blocks split on pre-BWT (post-RLE) input, so repetitive XML
    # packs many bytes per block; incompressible payload forces blocks
    import random

    rng = random.Random(11)
    raw = b"".join(
        (f"row {i} {rng.random()} {rng.getrandbits(64):x}\n").encode()
        for i in range(30_000)
    )
    path = _write_bz2(tmp_path, raw, level=1)  # 100k blocks
    magics = list(iter_magics(path))
    blocks = [m for m in magics if not m[1]]
    footers = [m for m in magics if m[1]]
    assert magics[0] == (32, False)  # first block right after BZh header
    assert len(blocks) >= 3  # level 1 on a multi-100k input
    assert len(footers) == 1 and footers[-1] == magics[-1]
    assert [m[0] for m in magics] == sorted(m[0] for m in magics)


def test_scan_start_byte_partitions_magics(tmp_path):
    raw = big_dump(60, 8).encode()
    path = _write_bz2(tmp_path, raw, level=1)
    all_bits = [m[0] for m in iter_magics(path)]
    mid = (all_bits[len(all_bits) // 2] // 8) + 1  # mid-file byte
    tail = [m[0] for m in iter_magics(path, start_byte=mid)]
    assert tail == [b for b in all_bits if b >= mid * 8]


def test_per_block_decode_reassembles(tmp_path):
    raw = big_dump(60, 8).encode()
    path = _write_bz2(tmp_path, raw, level=1)
    magics = list(iter_magics(path))
    import os

    file_end_bit = os.path.getsize(path) * 8
    ends = [m[0] for m in magics][1:] + [file_end_bit]
    with open(path, "rb") as f:
        out = b"".join(
            decode_block(f, m[0], e)
            for m, e in zip(magics, ends)
            if not m[1]
        )
    assert out == raw


def test_decode_block_rejects_garbage_span(tmp_path):
    raw = big_dump(10, 4).encode()
    path = _write_bz2(tmp_path, raw, level=9)
    magics = list(iter_magics(path))
    with open(path, "rb") as f:
        with pytest.raises(ValueError):
            # a span starting 3 bits late is not a block
            decode_block(f, magics[0][0] + 3, magics[1][0] + 3)


def test_block_stream_split_ownership_is_exact(tmp_path):
    raw = big_dump(60, 8).encode()
    path = _write_bz2(tmp_path, raw, level=1)
    size = len(bz2.compress(raw, 1))
    for n_splits in (2, 3, 5):
        step = size // n_splits + 1
        owned = []
        for i in range(n_splits):
            s = Bz2BlockStream(path, i * step, (i + 1) * step if i < n_splits - 1 else 1 << 62)
            got = b""
            while chunk := s.read():
                got += chunk
            end = s.owned_end if s.owned_end is not None else len(got)
            owned.append(got[:end])
            s.close()
        assert b"".join(owned) == raw, f"n_splits={n_splits}"


def test_multistream_file_splits(tmp_path):
    # pbzip2 / Wikimedia-multistream layout: concatenated full streams
    # with different levels
    raw = big_dump(50, 6).encode()
    cut1, cut2 = len(raw) // 3, 2 * len(raw) // 3
    comp = (
        bz2.compress(raw[:cut1], 9)
        + bz2.compress(raw[cut1:cut2], 1)
        + bz2.compress(raw[cut2:], 5)
    )
    path = tmp_path / "multi.xml.bz2"
    path.write_bytes(comp)
    mid = len(comp) // 2
    a = Bz2BlockStream(str(path), 0, mid)
    b = Bz2BlockStream(str(path), mid, 1 << 62)
    ga = b""
    while chunk := a.read():
        ga += chunk
    gb = b""
    while chunk := b.read():
        gb += chunk
    assert ga[: a.owned_end] + gb[: b.owned_end] == raw


def test_read_honors_n(tmp_path):
    """Bz2BlockStream.read is a real file-like read: returns at most n
    bytes, buffers block remainders, b'' only at end of stream, and
    n=-1 drains everything remaining."""
    raw = big_dump(30, 4).encode()
    path = tmp_path / "n.xml.bz2"
    path.write_bytes(bz2.compress(raw, 1))

    s = Bz2BlockStream(str(path), 0, 1 << 62)
    assert s.read(0) == b""
    first = s.read(5)
    assert first == raw[:5]
    got = first
    while chunk := s.read(7919):  # prime-sized reads cross block edges
        assert len(chunk) <= 7919
        got += chunk
    assert got == raw
    assert s.read(1024) == b"" and s.read() == b""
    s.close()

    # n=-1 drains the stream in one call
    s2 = Bz2BlockStream(str(path), 0, 1 << 62)
    head = s2.read(3)
    assert head + s2.read() == raw
    assert s2.read() == b""
    s2.close()

    # many tiny reads against multi-MB decoded blocks: the head-chunk
    # offset keeps each read O(returned bytes), and a mixed small/large
    # sequence still reassembles the stream byte-exactly
    s3 = Bz2BlockStream(str(path), 0, 1 << 62)
    got = bytearray()
    sizes = [1, 2, 3, 64, 1, 100_000, 5, 1, 999_983]
    i = 0
    while chunk := s3.read(sizes[i % len(sizes)]):
        got += chunk
        i += 1
    assert bytes(got) == raw
    s3.close()


# -- source-level split invariance ---------------------------------------


def _rows(df):
    return sorted(
        (r.page_id, r.rev_id, r.rev_seq, r.title, r.text) for r in df.collect()
    )


def test_bz2_split_matches_plain_read(spark, tmp_path):
    content = big_dump(40, 6)
    plain = write_dump(tmp_path, content, "ref.xml")
    packed = _write_bz2(tmp_path, content.encode(), "ref.xml.bz2", level=1)
    expected = _rows(read_wikidump(spark, plain))

    comp_size = (tmp_path / "ref.xml.bz2").stat().st_size
    # several split sizes incl. smaller than one compressed block
    for splitsize in (max(1, comp_size // 7), 50_000, 120_000, 1 << 22):
        df = read_wikidump(spark, packed, splitsize=str(splitsize))
        n_parts = df.rdd.getNumPartitions()
        assert _rows(df) == expected, f"splitsize={splitsize}"
        if splitsize < comp_size:
            assert n_parts > 1, f"splitsize={splitsize} planned one partition"


def test_bz2_split_standard_dump_semantics(spark, tmp_path):
    # the full parser-branch fixture through the block-split path
    packed = _write_bz2(
        tmp_path, standard_dump().encode(), "std.xml.bz2", level=1
    )
    df = read_wikidump(spark, packed, splitsize="300")
    rows = {r.rev_id: r for r in df.collect()}
    assert sorted(rows) == [101, 102, 103, 104, 105, 201, 301, 302]
    assert rows[104].user_text is None  # deleted contributor
    assert rows[105].comment is None  # deleted comment
    assert rows[102].user_ip == "10.0.0.1"


def test_bz2_split_disabled_falls_back(spark, tmp_path):
    packed = _write_bz2(tmp_path, standard_dump().encode(), "s2.xml.bz2")
    df = read_wikidump(spark, packed, bz2_split="false")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 8


def test_page_spanning_many_blocks(spark, tmp_path):
    """A single page larger than several compressed blocks: the owning
    partition must tail-read across block boundaries (and past its own
    range) to finish the page; later partitions must skip it entirely."""
    import random

    rng = random.Random(3)
    words = "alpha beta gamma delta epsilon zeta".split()
    # ~600 KB of low-compressibility body -> many level-1 blocks
    big_body = " ".join(
        f"{rng.choice(words)}{rng.getrandbits(32):x}" for _ in range(60_000)
    )
    from tests.dump_fixtures import page, rev

    content = (
        "<mediawiki><siteinfo><sitename>S</sitename></siteinfo>\n"
        + page(1, "Small A", 0, [rev(11, "2022-01-01T00:00:00Z", "tiny a")])
        + page(2, "Huge", 0, [rev(21, "2022-01-02T00:00:00Z", big_body)])
        + page(3, "Small B", 0, [rev(31, "2022-01-03T00:00:00Z", "tiny b")])
        + "</mediawiki>\n"
    )
    packed = tmp_path / "span.xml.bz2"
    packed.write_bytes(bz2.compress(content.encode(), 1))
    blocks = [m for m in iter_magics(str(packed)) if not m[1]]
    assert len(blocks) >= 4, "fixture must span several blocks"

    for splitsize in (20_000, 60_000, 150_000):
        df = read_wikidump(spark, str(packed), splitsize=str(splitsize))
        rows = {r.rev_id: r.text for r in df.collect()}
        assert sorted(rows) == [11, 21, 31], f"splitsize={splitsize}"
        assert rows[21] == big_body, f"splitsize={splitsize}: big page corrupted"


def test_truncated_bz2_strict_raises_tolerant_keeps_prefix(tmp_path):
    """A truncated .bz2 (mid-block EOF) must be LOUD by default — a
    silently shorter dump is data loss masquerading as a small corpus —
    while tolerate_truncation=True (torn-shard ingest) decodes every
    complete block and drops only the torn tail."""
    import random

    import pytest

    rng = random.Random(5)
    raw = b"".join(
        (f"line {i} {rng.getrandbits(64):x}\n").encode() for i in range(30_000)
    )
    comp = bz2.compress(raw, 1)
    magics = [m for m in iter_magics_bytes(comp)]
    blocks = [m for m in magics if not m[1]]
    assert len(blocks) >= 2
    # cut in the middle of the last block
    cut = (blocks[-1][0] // 8) + 40
    path = tmp_path / "trunc.xml.bz2"
    path.write_bytes(comp[:cut])

    s = Bz2BlockStream(str(path), 0, 1 << 62)
    with pytest.raises(ValueError, match="truncated or corrupt"):
        while s.read():
            pass
    s.close()

    s = Bz2BlockStream(str(path), 0, 1 << 62, tolerate_truncation=True)
    got = b""
    while chunk := s.read():
        got += chunk
    s.close()
    assert 0 < len(got) < len(raw)
    assert raw.startswith(got)


def iter_magics_bytes(data: bytes):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".bz2", delete=False) as f:
        f.write(data)
        name = f.name
    try:
        yield from iter_magics(name)
    finally:
        import os

        os.unlink(name)


def test_false_positive_magic_handling(tmp_path, monkeypatch):
    """A 48-bit magic pattern occurring by chance inside compressed
    data (p≈2^-48/bit — injected here) must not lose or duplicate any
    block: a false END candidate is merged over; a false START
    candidate is skipped."""
    import wikihadoop_spark.sources.bz2blocks as bb

    raw = big_dump(60, 8).encode()
    path = _write_bz2(tmp_path, raw, level=1)
    real = list(bb.iter_magics(path))
    blocks = [m for m in real if not m[1]]
    assert len(blocks) >= 2

    # inject a bogus candidate in the middle of the first block's span
    fake_bit = (blocks[0][0] + blocks[1][0]) // 2
    injected = sorted(real + [(fake_bit, False)])

    orig = bb.iter_magics

    def patched(p, start_byte=0):
        for m in injected:
            if m[0] >= start_byte * 8:
                yield m

    monkeypatch.setattr(bb, "iter_magics", patched)
    s = bb.Bz2BlockStream(path, 0, 1 << 62)
    got = b""
    while chunk := s.read():
        got += chunk
    s.close()
    monkeypatch.setattr(bb, "iter_magics", orig)
    assert got == raw, "false-positive candidate corrupted the stream"
