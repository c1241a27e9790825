"""wikidump — Spark Python DataSource for MediaWiki full-history XML dumps.

The reference (whym/wikihadoop) solves this with a Hadoop InputFormat:
a driver-side full-file scan plans page-aligned splits
(StreamWikiDumpInputFormat.java:183-272), a per-split page-offset
pre-scan builds a boundary index (:515-554), and a record reader
re-emits one synthesized XML record per revision (:360-432), pairing
each revision with its predecessor in a one-revision buffer (:427-429).
Known defects: duplicated rows across bz2 splits (<0.02%, Issue #1)
and missing rows (<0.003%, Issue #2).

This source keeps the reference's two good ideas — byte-level 4-tag
scanning (only ``<page>``, ``</page>``, ``<revision``, ``</revision>``
are ever searched for, README.rst:264-271) and bounded per-record
memory — and replaces the physical strategy with Spark-native design:

- **No driver-side data scan.**  Partitions are fixed byte ranges
  planned from file sizes only (the reference's planning scan could
  take >6000 s, README.rst:246-250).  Each task re-syncs to the first
  ``<page>`` tag at-or-after its range start.
- **Exactly-once by the owner rule.**  A page belongs to the partition
  in whose [start, end) range its ``<page>`` tag begins; a partition
  reads past its end to finish its last owned page.  Duplicates and
  gaps are structurally impossible (vs the reference's statistical
  bounds above).
- **Flat typed rows, not XML blobs.**  Revisions come out as columns
  (FIXTURES.md §1); downstream pairing is a window ``lag`` — or
  source-side streaming pairing (``pair_revisions`` option) for
  pathological multi-GB page histories, the analog of the reference's
  prevRevision buffer.
- **Column pruning.**  The reader receives the pruned schema and
  skips wikitext extraction when ``text``/``prev_text`` are not
  selected — the lazy-parse strategy the reference documents
  (README.rst:264-271) done through the engine instead of by hand.

Compressed dumps: ``.bz2`` files SPLIT like uncompressed ones — the
block-aligned strategy of the reference (SeekableInputStream.java:50-57,
StreamWikiDumpInputFormat.java:195-203) rebuilt on the bzip2 container
itself (see ``bz2blocks.py``): each partition scans its compressed
byte range for block magics, decodes its blocks in isolation, and owns
the pages whose ``<page>`` tag starts in its blocks' decompressed
output — the same exactly-once owner rule, lifted to two levels.
Multi-stream files (pbzip2, Wikimedia "multistream" dumps) split the
same way.  ``.gz`` is a non-splittable codec: one partition per file.
"""

from __future__ import annotations

import bz2
import gzip
import io
import os
import re
from dataclasses import dataclass
from datetime import datetime
from glob import glob
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

PAGE_OPEN = b"<page>"
PAGE_CLOSE = b"</page>"
REV_OPEN = b"<revision"
REV_CLOSE = b"</revision>"

BASE_SCHEMA_DDL = (
    "page_id long, title string, ns int, redirect string, "
    "rev_id long, rev_seq int, parent_id long, ts timestamp_ntz, "
    "comment string, minor boolean, model string, format string, "
    "user_id long, user_text string, user_ip string, "
    "sha1 string, text_bytes long, text string"
)
PAIRED_EXTRA_DDL = "prev_rev_id long, prev_text string, beginningofpage boolean"
OPS_EXTRA_DDL = "ops array<struct<position:bigint,action:int,content:string>>"


class _TagScanner:
    """Incremental multi-tag search over a byte stream.

    Cursor-based: the consumed prefix is tracked as an index into the
    buffer and only compacted when refilling — a naive
    ``buf = buf[consumed:]`` per record is O(buffer) memcpy per call
    and caps the whole source at a few MB/s.  Memory stays bounded by
    one chunk while skipping, or one record while capturing (the
    reference's per-record buffer bound, strategy #6)."""

    def __init__(self, stream: io.RawIOBase, base_offset: int = 0, chunk: int = 1 << 20):
        self._stream = stream
        self._chunk = chunk
        self._buf = b""
        self._pos = 0  # cursor: bytes before it are consumed
        self._buf_start = base_offset  # absolute offset of _buf[0]
        self._eof = False

    def _fill(self) -> bool:
        if self._pos:
            self._buf = self._buf[self._pos :]
            self._buf_start += self._pos
            self._pos = 0
        data = self._stream.read(self._chunk)
        if not data:
            self._eof = True
            return False
        self._buf = self._buf + data if self._buf else data
        return True

    def find_first(
        self, tags: list[bytes], capture: bool = True
    ) -> tuple[int, int, bytes] | None:
        """Find the earliest occurrence of any tag.  Returns
        (tag_index, absolute_offset_of_tag, bytes_before_tag) and
        consumes through the end of the tag.  None at EOF.

        With ``capture`` the pre-tag bytes accumulate (bounded by one
        record); without it consumed bytes are dropped at each refill —
        constant memory over arbitrarily long skipped regions."""
        buf = self._buf
        longest = max(len(t) for t in tags)
        search_from = self._pos
        while True:
            best_pos = -1
            best_i = 0
            for i, tag in enumerate(tags):
                pos = buf.find(tag, search_from)
                if pos != -1 and (best_pos == -1 or pos < best_pos):
                    best_pos, best_i = pos, i
            if best_pos != -1:
                before = buf[self._pos : best_pos] if capture else b""
                abs_pos = self._buf_start + best_pos
                self._pos = best_pos + len(tags[best_i])
                return best_i, abs_pos, before
            # nothing found: resume after the region that cannot hold a
            # full tag start
            search_from = max(self._pos, len(buf) - (longest - 1))
            if not capture:
                self._pos = search_from
            rel = search_from - self._pos  # preserved across compaction
            if self._eof or not self._fill():
                return None
            buf = self._buf
            search_from = self._pos + rel

    def skip_to(self, tag: bytes) -> int | None:
        """Consume until after `tag`; return its absolute offset."""
        found = self.find_first([tag], capture=False)
        return None if found is None else found[1]


_TAG_TEXT = re.compile(rb"<text[^>]*>(.*?)</text>", re.DOTALL)
_SELF_CLOSED_TEXT = re.compile(rb"<text[^>]*/>")


def _extract(fragment: bytes, tag: str) -> bytes | None:
    """First <tag>...</tag> content in an XML fragment, or None.  The
    4-tag outer grammar guarantees fragments are small; inner fields
    are extracted with targeted scans, not a DOM parse."""
    open_pat = ("<" + tag).encode()
    start = fragment.find(open_pat)
    if start == -1:
        return None
    gt = fragment.find(b">", start)
    if gt == -1:
        return None
    if fragment[gt - 1 : gt] == b"/":  # self-closed
        return b""
    close_pat = ("</" + tag + ">").encode()
    end = fragment.find(close_pat, gt + 1)
    if end == -1:
        return None
    return fragment[gt + 1 : end]


_NAMED_REFS = {b"lt": b"<", b"gt": b">", b"quot": b'"', b"amp": b"&"}

# Decode contract — ONE left-to-right pass whose output is never
# rescanned: &#38;lt; decodes to the literal '&lt;' the XML encodes
# (a sequential numeric-then-named scheme would double-decode it to
# '<') and &amp;#160; stays the literal wikitext '&#160;'.
_CHAR_REF = re.compile(
    rb"&(?:#x([0-9a-fA-F]{1,6})|#([0-9]{1,7})|(lt|gt|quot|amp));"
)


def _decode_char_ref(m: re.Match) -> bytes:
    if m.group(3):
        return _NAMED_REFS[m.group(3)]
    cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
    if 0 < cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
        return chr(cp).encode("utf-8")
    return m.group(0)  # invalid codepoint: leave the reference literal


def _named_chain(seg: bytes) -> bytes:
    """Named-entity-only decode via chained C-level replaces, &amp;
    LAST — equal to the combined single pass on input with no numeric
    refs because (a) the four entity literals cannot overlap each
    other (each starts '&', ends ';', none contains '&' internally)
    and (b) no replacement output contains '&', so earlier replaces
    cannot manufacture a later pattern and nothing runs after &amp;
    to rescan its output.  ~4× faster than the regex pass on
    entity-dense wikitext (&lt;ref&gt;/&amp; markup)."""
    return (
        seg.replace(b"&lt;", b"<")
        .replace(b"&gt;", b">")
        .replace(b"&quot;", b'"')
        .replace(b"&amp;", b"&")
    )


def _decode_refs(raw: bytes) -> bytes:
    """Hybrid decoder: text with NO numeric reference (the common case
    in real dumps — XML escaping produces only the four named
    entities) takes the chained-replace fast path; any '&#' falls back
    to the combined single-pass regex, whose left-to-right no-rescan
    semantics the fast path provably matches on its own domain.
    Equivalence is pinned by a fuzz test against a single-pass
    reference (tests/test_wikidump_property.py::test_char_ref_*)."""
    if b"&#" in raw:
        return _CHAR_REF.sub(_decode_char_ref, raw)
    return _named_chain(raw)


def _unescape(raw: bytes | None) -> str | None:
    if raw is None:
        return None
    if b"&" in raw:
        raw = _decode_refs(raw)
    return raw.decode("utf-8", errors="replace")


def _parse_ts(raw: str | None) -> datetime | None:
    if not raw:
        return None
    return datetime.fromisoformat(raw.rstrip("Z"))


@dataclass
class _PageHeader:
    page_id: int | None
    title: str | None
    ns: int | None
    redirect: str | None


def _parse_header(header: bytes) -> _PageHeader:
    title = _unescape(_extract(header, "title"))
    ns_raw = _extract(header, "ns")
    ns = int(ns_raw) if ns_raw not in (None, b"") else None
    pid_raw = _extract(header, "id")
    page_id = int(pid_raw) if pid_raw not in (None, b"") else None
    redirect = None
    rm = re.search(rb'<redirect title="([^"]*)"', header)
    if rm:
        redirect = _unescape(rm.group(1))
    return _PageHeader(page_id, title, ns, redirect)


def _parse_revision(frag: bytes, want_text: bool) -> dict:
    """Parse one <revision> fragment body (without the outer tags).

    Contributor semantics mirror the reference's output contract
    (fileformat.rst:13-25, revision_differ.py:143-148): registered ->
    (user_id, user_text); anonymous -> user_ip only; deleted -> all
    null.  Absent/deleted comment -> null.  Missing text -> ''.
    """
    rev_id_raw = _extract(frag, "id")
    parent_raw = _extract(frag, "parentid")
    row: dict = {
        "rev_id": int(rev_id_raw) if rev_id_raw else None,
        "parent_id": int(parent_raw) if parent_raw else None,
        "ts": _parse_ts(_unescape(_extract(frag, "timestamp"))),
        "minor": b"<minor" in frag,
        "model": _unescape(_extract(frag, "model")),
        "format": _unescape(_extract(frag, "format")),
        "sha1": _unescape(_extract(frag, "sha1")),
        "user_id": None,
        "user_text": None,
        "user_ip": None,
        "comment": None,
        "text": None,
        "text_bytes": None,
    }
    comment = _extract(frag, "comment")
    if comment is not None:
        # deleted="deleted" only counts inside the <comment ...> open tag
        # itself: <contributor deleted="deleted"/> precedes <comment> in
        # dump order and must null user fields only, not the comment.
        ci = frag.find(b"<comment")
        open_tag = frag[ci : frag.find(b">", ci) + 1]
        if b'deleted="deleted"' not in open_tag:
            row["comment"] = _unescape(comment)
    contrib = _extract(frag, "contributor")
    if contrib:  # empty bytes == deleted contributor (self-closed)
        uid = _extract(contrib, "id")
        row["user_id"] = int(uid) if uid not in (None, b"") else None
        row["user_text"] = _unescape(_extract(contrib, "username"))
        row["user_ip"] = _unescape(_extract(contrib, "ip"))
        if row["user_text"] is None and row["user_ip"] is not None:
            row["user_text"] = row["user_ip"]
    tm = _TAG_TEXT.search(frag)
    if tm:
        body = tm.group(1)
        row["text_bytes"] = len(body)
        if want_text:
            row["text"] = _unescape(body) or ""
    elif _SELF_CLOSED_TEXT.search(frag) is not None:
        row["text_bytes"] = 0
        if want_text:
            row["text"] = ""
    elif want_text:
        row["text"] = ""
    return row


@dataclass
class WikidumpPartition(InputPartition):
    path: str
    start: int
    end: int  # ownership range end; reading may continue past it
    codec: str  # "plain" | "bz2block" | "bz2" | "gz"


class WikidumpReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._full_schema = schema
        self._options = options
        self._path = options.get("path")
        if not self._path:
            raise ValueError("wikidump source requires a path")
        self._split_size = int(options.get("splitsize", 32 * 1024 * 1024))
        self._exclude = options.get("excludepageswith")
        self._paired = str(options.get("pair_revisions", "false")).lower() == "true"
        # compute_diffs: run the token diff INSIDE the source partition
        # (the reference's in-mapper architecture) — the ops column
        # comes out of the scan and the two texts never cross the
        # Python->JVM->Python Arrow boundary unless selected
        self._diffs = str(options.get("compute_diffs", "false")).lower() == "true"
        if self._diffs:
            self._paired = True  # diffing implies pairing
        self._pushed: dict[str, object] = {}  # page-level equality filters

    def pushFilters(self, filters):
        """Scan-level predicate pushdown (reference strategy #1:
        excluded pages are skipped before any revision is parsed,
        StreamWikiDumpInputFormat.java:387-393).  Page-level equality
        filters on ns / title / page_id are handled in the source —
        whole pages are skipped right after the header scan; everything
        else is left to Catalyst."""
        from pyspark.sql.datasource import EqualTo

        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute in (
                ("ns",),
                ("title",),
                ("page_id",),
            ):
                self._pushed[f.attribute[0]] = f.value
            else:
                unsupported.append(f)
        return unsupported

    # -- planning: metadata only, no data scan (vs reference getSplits) --

    def partitions(self) -> list[WikidumpPartition]:
        paths = sorted(glob(self._path)) if any(c in self._path for c in "*?[") else [
            self._path
        ]
        if not paths:
            raise FileNotFoundError(self._path)
        bz2_split = str(self._options.get("bz2_split", "true")).lower() == "true"
        parts: list[WikidumpPartition] = []
        for p in paths:
            size = os.path.getsize(p)
            if p.endswith(".bz2"):
                if bz2_split:
                    # ranges over COMPRESSED bytes; each partition owns
                    # the bzip2 blocks whose magic starts in its range
                    for start, end in self._ranges(size):
                        parts.append(WikidumpPartition(p, start, end, "bz2block"))
                else:
                    parts.append(WikidumpPartition(p, 0, 1 << 62, "bz2"))
            elif p.endswith(".gz"):
                parts.append(WikidumpPartition(p, 0, 1 << 62, "gz"))
            else:
                for start, end in self._ranges(size):
                    parts.append(WikidumpPartition(p, start, end, "plain"))
        return parts

    def _ranges(self, size: int) -> list[tuple[int, int]]:
        n = max(1, (size + self._split_size - 1) // self._split_size)
        step = (size + n - 1) // n
        return [
            (i * step, min(size, (i + 1) * step) if i < n - 1 else 1 << 62)
            for i in range(n)
        ]

    # -- execution ----------------------------------------------------------

    def read(self, partition: WikidumpPartition):
        """Yields Arrow RecordBatches — row tuples would be pickled one
        by one across the Python<->JVM boundary; batching through Arrow
        is the difference between ~1 MB/s and tens of MB/s."""
        import pyarrow as pa

        fields = [f.name for f in self._full_schema.fields]
        # diff only when the ops column survives pruning; diffs need
        # the texts internally even when neither text column is selected
        compute_ops = self._diffs and "ops" in fields
        want_text = "text" in fields or "prev_text" in fields or compute_ops
        exclude = re.compile(self._exclude.encode()) if self._exclude else None

        if partition.codec == "plain":
            f = open(partition.path, "rb")
            f.seek(partition.start)
            scanner = _TagScanner(f, base_offset=partition.start)
            end_fn = lambda: partition.end  # noqa: E731
        elif partition.codec == "bz2block":
            from wikihadoop_spark.sources.bz2blocks import Bz2BlockStream

            f = Bz2BlockStream(
                partition.path,
                partition.start,
                partition.end,
                # default STRICT: a truncated shard raises instead of
                # silently reading as a smaller dump; torn-shard ingest
                # (e.g. a stream watching a directory mid-upload) opts
                # in to keeping the complete prefix
                tolerate_truncation=str(
                    self._options.get("bz2_tolerate_truncation", "false")
                ).lower()
                == "true",
            )
            # scanner offsets are decompressed-local; ownership ends at
            # the decompressed extent of this range's blocks, known by
            # the time any offset could exceed it
            scanner = _TagScanner(f, base_offset=0)
            end_fn = lambda: (  # noqa: E731
                f.owned_end if f.owned_end is not None else 1 << 62
            )
        elif partition.codec == "bz2":
            f = bz2.open(partition.path, "rb")
            scanner = _TagScanner(f, base_offset=0)
            end_fn = lambda: partition.end  # noqa: E731
        else:
            f = gzip.open(partition.path, "rb")
            scanner = _TagScanner(f, base_offset=0)
            end_fn = lambda: partition.end  # noqa: E731

        arrow_type = {
            "page_id": pa.int64(), "title": pa.string(), "ns": pa.int32(),
            "redirect": pa.string(), "rev_id": pa.int64(), "rev_seq": pa.int32(),
            "parent_id": pa.int64(), "ts": pa.timestamp("us"),
            "comment": pa.string(), "minor": pa.bool_(), "model": pa.string(),
            "format": pa.string(), "user_id": pa.int64(), "user_text": pa.string(),
            "user_ip": pa.string(), "sha1": pa.string(), "text_bytes": pa.int64(),
            "text": pa.string(), "prev_rev_id": pa.int64(),
            "prev_text": pa.string(), "beginningofpage": pa.bool_(),
            "ops": pa.list_(
                pa.struct(
                    [
                        ("position", pa.int64()),
                        ("action", pa.int32()),
                        ("content", pa.string()),
                    ]
                )
            ),
        }
        schema = pa.schema([(c, arrow_type[c]) for c in fields])
        batch_rows, batch_bytes = [], 0
        # flush on row count or accumulated text size — bounds task memory
        max_rows, max_bytes = 2048, 32 << 20

        if compute_ops:
            from wikihadoop_spark.functions.diffs import token_diff

            # No tokenize memo here (an earlier version cached row i's
            # token list for reuse as row i+1's prev): token_diff
            # char-strips each PAIR to its edit region before
            # tokenizing, so the strings reaching the tokenizer are
            # pair-dependent and a text-keyed cache essentially never
            # hits — it was pure dict upkeep plus up to 4M pinned
            # tokens of dead substrings per task.

        # cyclic GC off while parsing: the scanner allocates millions of
        # acyclic objects (fragments, field strings, row dicts) and
        # mid-task gen2 sweeps showed up as multi-second stalls; all of
        # it is freed by refcounting.  Disabled immediately before the
        # try so the finally always restores it (workers are reused).
        import gc

        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            for row in self._read_pages(scanner, end_fn, fields, want_text, exclude):
                if compute_ops:
                    row["ops"] = list(
                        token_diff(
                            row.get("prev_text") or "",
                            row.get("text") or "",
                        )
                    )
                batch_rows.append(row)
                t = row.get("text")
                batch_bytes += len(t) if t else 64
                if len(batch_rows) >= max_rows or batch_bytes >= max_bytes:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([r.get(c) for r in batch_rows], type=arrow_type[c]) for c in fields],
                        schema=schema,
                    )
                    batch_rows, batch_bytes = [], 0
            if batch_rows:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([r.get(c) for r in batch_rows], type=arrow_type[c]) for c in fields],
                    schema=schema,
                )
        finally:
            if gc_was_enabled:
                gc.enable()
            f.close()

    def _read_pages(self, scanner, end_fn, fields, want_text, exclude):
        while True:
            # Owner rule: only pages whose <page> tag starts inside
            # the partition's ownership range (byte range for plain
            # files, its blocks' decompressed extent for bz2).
            page_pos = scanner.skip_to(PAGE_OPEN)
            if page_pos is None or page_pos >= end_fn():
                return
            # header = bytes until the first <revision or </page>
            # (a page may legitimately carry zero revisions)
            found = scanner.find_first([REV_OPEN, PAGE_CLOSE])
            if found is None:
                return
            tag_idx, _, header = found
            if exclude is not None and exclude.search(header):
                # reference F1, byte-for-byte conformant: the pattern
                # searches the RAW page-header bytes (title + ns + id +
                # redirect, XML-ESCAPED — 'AT&T' appears as 'AT&amp;T',
                # and a digit pattern can hit <id>/<ns> too), exactly
                # like the reference's find() over the header string
                # (StreamWikiDumpInputFormat.java:387-393).  For a
                # clean unescaped-TITLE filter, use the plan-level
                # rlike on the title column (plans/diffdb.py) instead
                # — the two are different contracts on purpose.
                if tag_idx == 0:
                    scanner.skip_to(PAGE_CLOSE)
                continue
            hdr = _parse_header(header)
            if self._pushed:
                hvals = {"ns": hdr.ns, "title": hdr.title, "page_id": hdr.page_id}
                if any(hvals[k] != v for k, v in self._pushed.items()):
                    # pushed page filter: skip before parsing revisions
                    if tag_idx == 0:
                        scanner.skip_to(PAGE_CLOSE)
                    continue
            rev_seq = 0
            prev_text = ""
            prev_rev_id = None
            while tag_idx == 0:  # at a <revision
                found = scanner.find_first([REV_CLOSE])
                if found is None:
                    return
                frag = found[2]
                rev_seq += 1
                row = _parse_revision(frag, want_text)
                base = {
                    "page_id": hdr.page_id,
                    "title": hdr.title,
                    "ns": hdr.ns,
                    "redirect": hdr.redirect,
                    "rev_seq": rev_seq,
                    **row,
                }
                if self._paired:
                    base["prev_rev_id"] = prev_rev_id
                    base["prev_text"] = prev_text if want_text else None
                    base["beginningofpage"] = rev_seq == 1
                    prev_rev_id = base["rev_id"]
                    prev_text = base["text"] if want_text else ""
                yield base
                nxt = scanner.find_first([REV_OPEN, PAGE_CLOSE])
                if nxt is None:
                    return
                tag_idx = nxt[0]


class WikidumpStreamReader(DataSourceStreamReader):
    """Incremental ingest of ARRIVING dump files (shards land in a
    directory; each microbatch reads the new ones).

    Offsets are JSON dicts ``{"files": {path: size}}``; a file is
    consumed exactly once, in its entirety, when first observed (dump
    shards are immutable once written — writers should move complete
    files in, e.g. via rename).  Batch partitions reuse the batch
    reader's planning (byte ranges, bz2 block splitting, owner rule),
    so a single huge arriving shard still parallelizes."""

    def __init__(self, schema: StructType, options: dict):
        self._batch = WikidumpReader(schema, options)
        self._path = options.get("path")

    def _current_files(self) -> dict[str, int]:
        paths = (
            sorted(glob(self._path))
            if any(c in self._path for c in "*?[")
            else [self._path]
            if os.path.exists(self._path)
            else []
        )
        if len(paths) == 1 and os.path.isdir(paths[0]):
            base = paths[0]
            paths = sorted(
                os.path.join(base, f)
                for f in os.listdir(base)
                if not f.startswith(".") and not f.endswith(".tmp")
            )
        return {p: os.path.getsize(p) for p in paths}

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        return {"files": self._current_files()}

    def partitions(self, start: dict, end: dict):
        # Plan from the size RECORDED in the committed offset, never a
        # fresh os.path.getsize: a file appended to (or replaced)
        # between latestOffset and execution — or before a failed batch
        # replays — would otherwise plan different ranges for the SAME
        # offset interval, breaking exactly-once replay (and a deleted
        # file would crash planning instead of surfacing at read time).
        seen = start.get("files", {})
        new = {
            p: sz for p, sz in end.get("files", {}).items() if p not in seen
        }
        bz2_split = (
            str(self._batch._options.get("bz2_split", "true")).lower()
            == "true"
        )
        parts: list[WikidumpPartition] = []
        for p in sorted(new):
            size = int(new[p])
            # the batch planner leaves the LAST range open-ended (own
            # everything to EOF — at batch planning time EOF == size);
            # for a stream the ownership boundary must be the RECORDED
            # size, so a replay of this offset interval owns exactly
            # the same bytes even if the file has since grown
            ranges = [
                (s, min(e, size)) for s, e in self._batch._ranges(size)
            ]
            if p.endswith(".bz2"):
                if bz2_split:
                    for s, e in ranges:
                        parts.append(WikidumpPartition(p, s, e, "bz2block"))
                else:
                    # honor the batch reader's opt-out (single-stream
                    # decode, one partition per file).  end stays
                    # unbounded: for whole-file codecs it is compared
                    # against DECOMPRESSED offsets, not file bytes
                    parts.append(WikidumpPartition(p, 0, 1 << 62, "bz2"))
            elif p.endswith(".gz"):
                parts.append(WikidumpPartition(p, 0, 1 << 62, "gz"))
            else:
                for s, e in ranges:
                    parts.append(WikidumpPartition(p, s, e, "plain"))
        return parts

    def read(self, partition: WikidumpPartition):
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass


class WikidumpDataSource(DataSource):
    """spark.read.format("wikidump").option("path", ...).load() — or
    ``spark.readStream`` with the same options for incremental ingest
    of arriving dump shards."""

    @classmethod
    def name(cls) -> str:
        return "wikidump"

    def schema(self) -> str:
        diffs = str(self.options.get("compute_diffs", "false")).lower() == "true"
        paired = diffs or (
            str(self.options.get("pair_revisions", "false")).lower() == "true"
        )
        ddl = BASE_SCHEMA_DDL
        if paired:
            ddl += f", {PAIRED_EXTRA_DDL}"
        if diffs:
            ddl += f", {OPS_EXTRA_DDL}"
        return ddl

    def reader(self, schema: StructType) -> WikidumpReader:
        return WikidumpReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> WikidumpStreamReader:
        return WikidumpStreamReader(schema, dict(self.options))


def register_wikidump(spark: "SparkSession") -> None:
    # required once a reader defines pushFilters(); Spark refuses to
    # plan the scan otherwise
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WikidumpDataSource)


def read_wikidump(spark: "SparkSession", path: str, **options) -> "DataFrame":
    register_wikidump(spark)
    reader = spark.read.format("wikidump").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
