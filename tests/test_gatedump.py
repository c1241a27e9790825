"""The driver-gate dump fixture must be a deterministic pure function
of documents.parquet (relational.py's closed-form oracle depends on
it), and safe to rebuild concurrently."""

from __future__ import annotations

import bz2
import os

from wikihadoop_spark.sources.gatedump import ensure_gate_dump, gate_dump_paths

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


def test_gate_dump_deterministic_rebuild():
    xml, bzp = ensure_gate_dump(SF)
    first = open(xml, "rb").read()
    os.remove(xml)
    os.remove(bzp)
    xml2, bzp2 = ensure_gate_dump(SF)
    assert (xml2, bzp2) == (xml, bzp)
    assert open(xml, "rb").read() == first
    # the bz2 copy decompresses to the identical XML
    assert bz2.decompress(open(bzp, "rb").read()) == first


def test_gate_dump_paths_distinct_per_sf():
    a = gate_dump_paths("/root/testdata/sf0.01")
    b = gate_dump_paths("/root/testdata/sf0.1")
    assert a != b and a[0] != b[0]


def test_gate_dump_multiblock_bz2():
    from wikihadoop_spark.sources.bz2blocks import iter_magics

    _, bzp = ensure_gate_dump(SF)
    blocks = [m for m in iter_magics(bzp) if not m[1]]
    assert len(blocks) >= 2, "gate bz2 should have a multi-block layout"
