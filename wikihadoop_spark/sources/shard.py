"""Dump sharder — the practical answer to non-splittable bz2.

The reference gets parallelism inside one .bz2 via Hadoop's
block-aligned BZip2Codec (SeekableInputStream.java:50-57); pure-Python
bz2 exposes no block seeks, so a single compressed dump reads as one
partition.  This utility does the one sequential pass ONCE, cutting
the stream into page-aligned shards; every later job reads the shard
glob fully parallel (and shards re-compress independently, so the
corpus stays compressed at rest).

One pass, constant memory, page-aligned by construction — the shard
boundary is always immediately after a ``</page>``.
"""

from __future__ import annotations

import bz2 as bz2lib
import gzip
import os


PAGE_CLOSE = b"</page>"


def _open_in(path: str):
    if path.endswith(".bz2"):
        return bz2lib.open(path, "rb")
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _open_out(path: str, compress: str | None):
    if compress == "bz2":
        return bz2lib.open(path + ".bz2", "wb")
    if compress == "gz":
        return gzip.open(path + ".gz", "wb")
    return open(path, "wb")


def shard_dump(
    input_path: str,
    output_dir: str,
    *,
    shard_bytes: int = 64 * 1024 * 1024,
    compress: str | None = None,
    chunk: int = 1 << 20,
) -> list[str]:
    """Split a dump into page-aligned shards; returns shard paths.

    Each shard is a well-formed fragment: ``<mediawiki>`` wrapper +
    whole pages.  Bytes before the first page (siteinfo) stay in shard
    0 inside the wrapper.
    """
    os.makedirs(output_dir, exist_ok=True)
    paths: list[str] = []
    shard_idx = 0
    written = 0
    out = None
    carry = b""

    def open_shard():
        nonlocal out, shard_idx, written
        base = os.path.join(output_dir, f"shard-{shard_idx:05d}.xml")
        out = _open_out(base, compress)
        out.write(b"<mediawiki>\n")
        paths.append(base + {"bz2": ".bz2", "gz": ".gz"}.get(compress or "", ""))
        shard_idx += 1
        written = 0

    def close_shard():
        nonlocal out
        if out is not None:
            out.write(b"</mediawiki>\n")
            out.close()
            out = None

    open_shard()
    tag_len = len(PAGE_CLOSE)
    with _open_in(input_path) as fh:
        while True:
            data = fh.read(chunk)
            if not data:
                break
            buf = carry + data
            pos = 0
            # emit page by page so rotation can happen at ANY boundary,
            # not once per chunk
            while True:
                idx = buf.find(PAGE_CLOSE, pos)
                if idx == -1:
                    break
                end = idx + tag_len
                out.write(buf[pos:end])
                written += end - pos
                pos = end
                if written >= shard_bytes:
                    close_shard()
                    open_shard()
            rest = buf[pos:]
            # mid-page continuation: flush all but a tag-prefix tail so
            # memory stays bounded on giant pages
            if len(rest) > tag_len - 1:
                flush = len(rest) - (tag_len - 1)
                out.write(rest[:flush])
                written += flush
                rest = rest[flush:]
            carry = rest
        # trailing bytes after the last </page> (epilogue/partial page)
        if carry.strip():
            out.write(carry)
    close_shard()
    return paths
