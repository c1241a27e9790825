"""Block-aligned splittable reads of bzip2 files — pure Python.

The reference parallelizes a compressed dump by re-synchronizing to
bzip2 block boundaries inside each split (SeekableInputStream.java:50-57,
consumed by StreamWikiDumpInputFormat.java:195-203,308-316).  CPython's
``bz2`` exposes no block seeks, but the bzip2 container makes the same
strategy possible from first principles:

- a stream is ``BZh<level>`` then a sequence of blocks, then a stream
  footer; blocks start with the 48-bit magic ``0x314159265359`` and the
  footer with ``0x177245385090`` — both at arbitrary *bit* offsets;
- each block header carries the block's own CRC32 in the 32 bits right
  after the magic;
- the stream footer is the footer magic plus a combined CRC that, for a
  single-block stream, equals that block's CRC.

So any block can be decoded in isolation: find its magic bit position,
bit-shift ``[magic, next_magic)`` to byte alignment, wrap it as
``BZh9`` + block + footer-magic + block-CRC — a fully valid one-block
stream that ``bz2.BZ2Decompressor`` finishes cleanly (and whose
per-block CRC check it still enforces).  A partition owns the blocks
whose magic bit position falls in its compressed byte range — the same
owner rule the uncompressed splitter uses for ``<page>`` tags — and
tail-reads subsequent blocks only to finish its last owned page.

This also parallelizes *multi-stream* files (pbzip2 output, Wikimedia
"multistream" dumps): the scan is position-independent, stream footers
simply delimit the preceding block, and each new stream's blocks are
found like any others.

False-positive magics (a 48-bit pattern recurring in compressed data;
~2e-2 expected across a full 700 GB dump) are handled structurally:
a span that fails to decode is merged with the following span(s), and a
start that never decodes is skipped — both sides of a range boundary
reach the same verdict because validation depends only on bit
positions, not on the partition doing the probing.
"""

from __future__ import annotations

import bz2
from collections import deque
from typing import Iterator

BLOCK_MAGIC = 0x314159265359
EOS_MAGIC = 0x177245385090

_SCAN_CHUNK = 4 << 20
# Merge a failed block span forward over false-positive magics as long
# as the merged span could still be ONE legal block: bzip2 compresses
# at most 900k of input per block, so a compressed block can't exceed
# ~1 MB even for incompressible data — 16 MB is a 16x-margin structural
# bound.  A DATA bound (not the old fixed count of 3) means a cluster
# of false positives inside one real block can never exhaust the merge
# budget and silently drop the genuine block.
_MAX_SPAN_BITS = (16 << 20) * 8


def _patterns(magic: int):
    """Byte-aligned search patterns for a 48-bit magic at each of the 8
    bit phases.  For phase ``s`` the magic spans 7 bytes: the low
    ``8-s`` bits of byte 0, five full bytes, and the high ``s`` bits of
    byte 6.  The five full bytes are searched with C-speed
    ``bytes.find``; the edge bytes are verified under masks."""
    out = []
    for s in range(8):
        if s == 0:
            out.append((s, magic.to_bytes(6, "big"), 0, 0, 0, 0))
        else:
            inner = ((magic >> s) & ((1 << 40) - 1)).to_bytes(5, "big")
            first_mask = (1 << (8 - s)) - 1
            first_val = magic >> (40 + s)
            last_mask = (0xFF << (8 - s)) & 0xFF
            last_val = (magic & ((1 << s) - 1)) << (8 - s)
            out.append((s, inner, first_mask, first_val, last_mask, last_val))
    return out


_BLOCK_PATTERNS = _patterns(BLOCK_MAGIC)
_EOS_PATTERNS = _patterns(EOS_MAGIC)


def _scan_buffer(buf: bytes, patterns, is_eos: bool) -> list[tuple[int, bool]]:
    """All (bit_offset_in_buf, is_eos) candidate magics whose full
    7-byte window lies inside ``buf``."""
    hits = []
    n = len(buf)
    for s, inner, fmask, fval, lmask, lval in patterns:
        if s == 0:
            pos = buf.find(inner)
            while pos != -1:
                hits.append((pos * 8, is_eos))
                pos = buf.find(inner, pos + 1)
        else:
            pos = buf.find(inner, 1)
            while pos != -1:
                i = pos - 1  # byte holding the magic's first bits
                if i + 7 <= n and (buf[i] & fmask) == fval and (
                    buf[i + 6] & lmask
                ) == lval:
                    hits.append((i * 8 + s, is_eos))
                pos = buf.find(inner, pos + 1)
    return hits


def iter_magics(path: str, start_byte: int = 0) -> Iterator[tuple[int, bool]]:
    """Yield (absolute_bit_position, is_eos) for every block/footer
    magic whose bit position is >= start_byte*8, in increasing order,
    reading the file lazily from ``start_byte`` to EOF.

    A magic is attributed to the byte its first bit lives in, so a
    partition scanning from its own start byte finds exactly the magics
    it owns and none owned by its predecessor."""
    with open(path, "rb") as f:
        f.seek(start_byte)
        carry = b""
        carry_base = start_byte  # absolute byte offset of carry[0]
        while True:
            data = f.read(_SCAN_CHUNK)
            if not data:
                return
            buf = carry + data
            hits = _scan_buffer(buf, _BLOCK_PATTERNS, False)
            hits += _scan_buffer(buf, _EOS_PATTERNS, True)
            # keep a 6-byte tail: a magic starting there lacks its full
            # 7-byte window and is re-scanned with the next chunk
            cut = max(0, len(buf) - 6)
            base_bit = carry_base * 8
            for bit, eos in sorted(hits):
                if bit < cut * 8 and base_bit + bit >= start_byte * 8:
                    yield base_bit + bit, eos
            carry = buf[cut:]
            carry_base += cut
        # EOF: the tail cannot hold a complete magic window; any magic
        # ending exactly at EOF was already inside the final buf


def _extract_bits(f, bit_start: int, bit_end: int) -> int:
    """The file's bits [bit_start, bit_end) as a big-endian integer."""
    byte0, byte1 = bit_start // 8, (bit_end + 7) // 8
    f.seek(byte0)
    chunk = f.read(byte1 - byte0)
    n = int.from_bytes(chunk, "big")
    n >>= len(chunk) * 8 - (bit_end - byte0 * 8)
    return n & ((1 << (bit_end - bit_start)) - 1)


def decode_block(f, bit_start: int, bit_end: int) -> bytes:
    """Decode the single bzip2 block occupying bits [bit_start,
    bit_end) of open file ``f`` by wrapping it as a one-block stream.
    Raises ValueError if the span is not a complete valid block."""
    nbits = bit_end - bit_start
    if nbits < 80:  # magic + CRC alone need 80 bits
        raise ValueError("span too short for a bzip2 block")
    block = _extract_bits(f, bit_start, bit_end)
    crc = (block >> (nbits - 80)) & 0xFFFFFFFF  # bits 48..80 of the block
    total = nbits + 80
    pad = -total % 8
    val = (((block << 48) | EOS_MAGIC) << 32 | crc) << pad
    mini = b"BZh9" + val.to_bytes((total + pad) // 8, "big")
    d = bz2.BZ2Decompressor()
    try:
        out = d.decompress(mini)
    except OSError as e:
        raise ValueError(f"invalid block at bit {bit_start}: {e}") from e
    if not d.eof:
        raise ValueError(f"truncated block at bit {bit_start}")
    return out


class _PeekableMagics:
    """Buffered lookahead over iter_magics — lets span-merge probe the
    next few magics without losing them."""

    def __init__(self, it: Iterator[tuple[int, bool]]):
        self._it = it
        self._buf: list[tuple[int, bool]] = []

    def peek(self, i: int) -> tuple[int, bool] | None:
        while len(self._buf) <= i:
            nxt = next(self._it, None)
            if nxt is None:
                return None
            self._buf.append(nxt)
        return self._buf[i]

    def pop(self) -> tuple[int, bool] | None:
        if self._buf:
            return self._buf.pop(0)
        return next(self._it, None)


class Bz2BlockStream:
    """Decompressed byte stream over the blocks of a .bz2 file whose
    magic bit position falls in compressed byte range [start, end),
    continuing lazily into later blocks for owner-rule tail reads.

    ``owned_end`` is None while decoding owned blocks and becomes the
    total decompressed size of the owned region the moment the first
    non-owned magic is reached — by then any caller offset past it is
    comparing against a set value."""

    def __init__(
        self, path: str, start: int, end: int,
        tolerate_truncation: bool = False,
    ):
        self._tolerate_truncation = tolerate_truncation
        self._f = open(path, "rb")
        self._f.seek(0, 2)
        self._file_end_bit = self._f.tell() * 8
        self.owned_end: int | None = None
        self._gen = self._decode_blocks(path, start, end)
        self._pending: deque[bytes] = deque()
        self._off = 0  # consumed bytes of the head chunk
        self._pending_len = 0  # unconsumed bytes across the deque

    def _decode_blocks(self, path: str, start: int, end: int):
        magics = _PeekableMagics(iter_magics(path, start))
        produced = 0
        cur = magics.pop()
        while cur is not None:
            bit, eos = cur
            if self.owned_end is None and bit >= end * 8:
                # first magic at/past the range end: the owned region's
                # decompressed extent is final (tail blocks follow only
                # to finish the last owned page)
                self.owned_end = produced
            if eos:
                cur = magics.pop()
                continue
            # decode the block [bit, next magic); a failed decode means
            # a false-positive magic — merge the span forward over it
            out = None
            merges = 0
            saw_eos_after = False
            reached_eof = False
            k = 0
            while True:
                nxt = magics.peek(k)
                cand_end = nxt[0] if nxt is not None else self._file_end_bit
                if nxt is not None and nxt[1]:
                    saw_eos_after = True
                if cand_end - bit > _MAX_SPAN_BITS:
                    break  # span can no longer be one legal block
                try:
                    out = decode_block(self._f, bit, cand_end)
                    merges = k
                    break
                except ValueError:
                    if nxt is None:
                        reached_eof = True
                        break  # span already reaches EOF
                    k += 1
            if out is None:
                # Distinguish the two all-candidates-failed cases:
                # - a FALSE-POSITIVE start magic mid-stream (the real
                #   stream continues — an EOS magic exists beyond it,
                #   or the 16 MB bound tripped before the file end):
                #   skip it; the genuine blocks around it decode from
                #   their own magics.
                # - a TRUNCATED/CORRUPT tail (the span ran to EOF and
                #   NO end-of-stream magic exists past this point, so
                #   the bytes cannot be part of any intact stream):
                #   raise instead of silently shrinking the dump —
                #   silent loss here used to read as a smaller corpus.
                if (
                    reached_eof
                    and not saw_eos_after
                    and not self._tolerate_truncation
                ):
                    raise ValueError(
                        f"bzip2 stream truncated or corrupt: block at bit "
                        f"{bit} of {path!r} cannot be decoded to any "
                        "consistent end and no end-of-stream magic follows "
                        "(pass tolerate_truncation=True / the source's "
                        "bz2_tolerate_truncation option to keep the "
                        "complete prefix of a torn shard instead)"
                    )
                cur = magics.pop()
                continue
            produced += len(out)
            yield out
            for _ in range(merges):
                magics.pop()  # false-positive magics inside the span
            cur = magics.pop()  # the magic that ended the block
        if self.owned_end is None:
            self.owned_end = produced

    def read(self, n: int = -1) -> bytes:
        """File-like contract: up to ``n`` decompressed bytes (all
        remaining bytes when ``n`` < 0), ``b""`` only at end of stream.
        Decoded blocks are buffered so a short read never discards the
        rest of a block.

        The owner-rule invariant survives the buffering: ``owned_end``
        is set by the generator before the first non-owned block is
        yielded, so by the time a caller has consumed bytes past the
        owned region the value is final."""
        if n is None or n < 0:
            if self._off:
                self._pending[0] = self._pending[0][self._off :]
                self._off = 0
            parts = list(self._pending)
            parts.extend(self._gen)
            self._pending.clear()
            self._pending_len = 0
            return b"".join(parts)
        while self._pending_len < n:
            blk = next(self._gen, None)
            if blk is None:
                break
            self._pending.append(blk)
            self._pending_len += len(blk)
        # consume from the head chunk via an offset — never re-join the
        # whole buffer, so many small reads stay O(returned bytes)
        parts = []
        need = n
        while need > 0 and self._pending:
            head = self._pending[0]
            avail = len(head) - self._off
            if avail <= need:
                parts.append(head[self._off :] if self._off else head)
                self._pending.popleft()
                self._off = 0
                self._pending_len -= avail
                need -= avail
            else:
                parts.append(head[self._off : self._off + need])
                self._off += need
                self._pending_len -= need
                need = 0
        return b"".join(parts)

    def close(self) -> None:
        self._f.close()
