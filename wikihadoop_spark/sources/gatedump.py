"""Deterministic wikidump fixture derived from the documents table —
lets the DRIVER's DuckDB-oracle gate cover the custom-source path.

The correctness gate runs (spark, sf_dir) queries against oracle SQL
over the same parquet tables, so the wikidump source, revision
pairing, and diff operators were previously invisible to it (they read
XML, not parquet).  This module closes the loop: materialize a
MediaWiki dump whose content is a pure function of
``documents.parquet`` (two revisions per doc — the original text and
an edited version), read it back through the real source, join
against the parquet table, and emit metadata plus equality/invariant
booleans that the oracle reproduces from ``documents`` alone.  Any
parser, pairing, ownership, or diff defect flips a value and
hash-fails the gate.

The fixture is built with pyarrow (no Spark session) and written
atomically; both a plain XML and a bz2 copy (compresslevel 1 → real
multi-block layout) are produced so the block-aligned splittable
reader (bz2blocks.py) is driver-gated too.
"""

from __future__ import annotations

import bz2
import os
import re
from datetime import datetime, timezone

EPOCH0 = 1_600_000_000
TRAILER = " trailer"


def gate_dump_paths(sf_dir: str) -> tuple[str, str]:
    """Cache paths keyed by sf dir AND the parquet's identity (mtime +
    size): if documents.parquet is ever regenerated, the key changes
    and the fixture rebuilds instead of silently hash-failing every
    wikidump gate query against stale content."""
    tag = re.sub(r"\W+", "_", sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        tag += f"_{int(st.st_mtime)}_{st.st_size}"
    except OSError:
        pass
    xml = f"/tmp/wikidump_gate_{tag}.xml"
    return xml, xml + ".bz2"


def _iso(epoch: int) -> str:
    return datetime.fromtimestamp(epoch, timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _esc(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def ensure_gate_dump(sf_dir: str) -> tuple[str, str]:
    """Build (once, atomically) the XML + bz2 gate dump for a scale
    factor.  Content is deterministic: sorted by doc_id, two revisions
    per document with metadata that is a closed-form function of
    doc_id (see the oracle SQL in relational.py)."""
    import pyarrow.parquet as pq

    xml_path, bz2_path = gate_dump_paths(sf_dir)
    if os.path.exists(xml_path) and os.path.exists(bz2_path):
        return xml_path, bz2_path

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = sorted(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))

    parts = ["<mediawiki>\n<siteinfo><sitename>Gate</sitename></siteinfo>\n"]
    for did, text in rows:
        text = text or ""
        r1, r2 = did * 10 + 1, did * 10 + 2
        comment = f"<comment>edit {did}</comment>" if did % 2 else ""
        minor = "<minor />" if did % 3 == 0 else ""
        parts.append(
            f"<page><title>Doc {did}</title><ns>0</ns><id>{did}</id>\n"
            f"<revision><id>{r1}</id>"
            f"<timestamp>{_iso(EPOCH0 + did)}</timestamp>"
            f"<contributor><username>U{did}</username><id>{did}</id></contributor>"
            f'<text xml:space="preserve">{_esc(text)}</text></revision>\n'
            f"<revision><id>{r2}</id><parentid>{r1}</parentid>"
            f"<timestamp>{_iso(EPOCH0 + did + 60)}</timestamp>"
            f"<contributor><ip>10.0.0.{did % 256}</ip></contributor>"
            f"{minor}{comment}"
            f'<text xml:space="preserve">{_esc(text + TRAILER)}</text></revision>\n'
            f"</page>\n"
        )
    parts.append("</mediawiki>\n")
    data = "".join(parts).encode()

    tmp = xml_path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, xml_path)
    tmpb = bz2_path + f".tmp{os.getpid()}"
    with open(tmpb, "wb") as fh:
        fh.write(bz2.compress(data, 1))  # level 1: multi-block layout
    os.replace(tmpb, bz2_path)
    return xml_path, bz2_path
