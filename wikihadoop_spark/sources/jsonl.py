"""JSONL corpus ingest / export — the LLM training-data interchange
format (one JSON document per line; corpora such as The Pile and
SlimPajama ship as directories of ``*.jsonl.zst`` / ``*.jsonl.gz``
shards).

Both directions stay JVM-side: Spark's native JSON datasource parses
(and, for ingest, decompresses gzip/zstd/bzip2 line streams) inside
whole-stage codegen — no Python in the hot path.  The reference engine
has no JSONL surface; this module exists for the training-pipeline
north star (a user pointing the curation chain at a published corpus,
or exporting one).

Scale notes (100 TB):

- ALWAYS pass an explicit schema.  ``spark.read.json`` without one
  runs a full schema-inference pass over every shard before the real
  scan — doubling the most expensive IO in the job.
  ``read_corpus_jsonl`` therefore REQUIRES a schema.
- Compressed JSONL shards are non-splittable: one task per shard, so
  the shard count IS the read parallelism (same S3-codec semantics as
  the reference's gz dumps, SeekableInputStream.java:58-64).  1000
  executors want thousands of shards; ``write_corpus_jsonl(shards=N)``
  makes the exported layout explicit for the next reader.
- Malformed lines must not kill a web-scale ingest: the default
  ``on_corrupt="drop"`` parses DROPMALFORMED (torn lines vanish at
  parse time, row-locally); audit them with ``on_corrupt="keep"`` +
  an aggregate over ``_corrupt_record``; ``"fail"`` opts in to
  FAILFAST strictness for curated inputs.
- zstd: the JVM READS ``.zst`` shards natively; Spark's text writers
  cannot produce zstd (gzip/bzip2/lz4/deflate/snappy only), so export
  defaults to gzip.
"""

from __future__ import annotations

import gzip
import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

# the documents-table shape (TESTDATA.md) — the schema most callers want
DOCUMENT_SCHEMA_DDL = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

_CORRUPT_COL = "_corrupt_record"


def read_corpus_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENT_SCHEMA_DDL,
    *,
    on_corrupt: str = "drop",
    options: dict | None = None,
) -> DataFrame:
    """Read JSONL shards (plain / .gz / .zst / .bz2 — decoded by the
    JVM datasource) with an EXPLICIT schema, skipping Spark's
    full-corpus inference pass.

    ``on_corrupt``: ``"drop"`` (default) silently filters unparseable
    lines row-locally; ``"keep"`` exposes them in a
    ``_corrupt_record`` column (other fields null); ``"fail"`` raises
    on the first bad line (FAILFAST).
    """
    if on_corrupt not in ("drop", "keep", "fail"):
        raise ValueError(f"on_corrupt must be drop|keep|fail, got {on_corrupt!r}")
    st = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    if on_corrupt == "keep":
        # PERMISSIVE keeps the raw line in the corrupt column — which
        # must exist in the schema to be retained
        if _CORRUPT_COL not in st.fieldNames():
            st = st.add(_CORRUPT_COL, StringType())
        reader = (
            spark.read.schema(st)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        )
    else:
        # "drop" uses the parser's native DROPMALFORMED rather than a
        # PERMISSIVE read + corrupt-column filter: torn lines vanish at
        # parse time, and no plan ever references the internal corrupt
        # column (Spark disallows column-pruned actions over it,
        # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        mode = "FAILFAST" if on_corrupt == "fail" else "DROPMALFORMED"
        reader = spark.read.schema(st).option("mode", mode)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_corpus_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str = "gzip",
    shards: int | None = None,
    mode: str = "error",
) -> None:
    """Export a corpus as JSONL shards through the JVM JSON writer.

    ``shards`` repartitions so the output file count — and therefore
    the NEXT reader's parallelism, since compressed JSONL is
    non-splittable — is explicit rather than an accident of the
    upstream plan.  One round-robin shuffle; omit it to keep the
    upstream partitioning.
    """
    if shards is not None:
        df = df.repartition(shards)
    (
        df.write.mode(mode)
        .option("compression", compression)
        .json(path)
    )


# ===========================================================================
# Driver-gate fixture: deterministic JSONL shards derived from
# documents.parquet (same closed-loop pattern as gatedump.py — content
# is a pure function of the parquet table, so the DuckDB oracle states
# every output in closed form and any parse/codec/fidelity defect
# hash-fails the gate).
# ===========================================================================

_N_SHARDS = 4


def gate_jsonl_dir(sf_dir: str) -> str:
    """Cache dir keyed by sf dir + the parquet's identity (mtime+size),
    so a regenerated documents.parquet rebuilds the fixture instead of
    silently hash-failing the gate against stale shards."""
    tag = re.sub(r"\W+", "_", sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        tag += f"_{int(st.st_mtime)}_{st.st_size}"
    except OSError:
        pass
    return f"/tmp/jsonl_gate_{tag}"


def ensure_gate_jsonl(sf_dir: str) -> str:
    """Build (once, atomically) ``_N_SHARDS`` ``.jsonl.gz`` and
    ``.jsonl.zst`` shards from documents.parquet.  Returns the dir;
    globs are ``<dir>/*.jsonl.gz`` and ``<dir>/*.jsonl.zst``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = gate_jsonl_dir(sf_dir)
    if os.path.isdir(out):
        return out

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])

    shard_lines: list[list[bytes]] = [[] for _ in range(_N_SHARDS)]
    for r in rows:
        # ensure_ascii keeps the bytes 7-bit: codec fidelity is tested
        # independently of any utf-8 disagreement
        line = (
            json.dumps(
                {
                    "doc_id": r["doc_id"],
                    "text": r["text"],
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": r["n_chars"],
                }
            ).encode()
            + b"\n"
        )
        shard_lines[r["doc_id"] % _N_SHARDS].append(line)

    tmp = f"{out}.tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for i, lines in enumerate(shard_lines):
        data = b"".join(lines)
        with gzip.open(os.path.join(tmp, f"shard-{i}.jsonl.gz"), "wb") as fh:
            fh.write(data)
        with pa.CompressedOutputStream(
            os.path.join(tmp, f"shard-{i}.jsonl.zst"), "zstd"
        ) as fh:
            fh.write(data)
    try:
        os.rename(tmp, out)
    except OSError:
        # concurrent builder won the race; its content is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return out


#: every doc whose id satisfies this is written TORN in the corrupt
#: fixture (truncated to the first 10 bytes — always the unparseable
#: prefix ``{"doc_id":``); the oracle replays the rule in SQL
_CORRUPT_MOD, _CORRUPT_REM = 7, 3


def ensure_gate_jsonl_corrupt(sf_dir: str) -> str:
    """Build (once, atomically) ``_N_SHARDS`` ``.jsonl.gz`` shards from
    documents.parquet with DETERMINISTIC torn lines: documents where
    ``doc_id % 7 == 3`` are truncated mid-object (an upload cut / a
    torn append — the realistic web-scale ingest defect), everything
    else written intact.  Drives the ``on_corrupt="keep"`` audit gate:
    which lines survive, which count as corrupt, and how they
    distribute over shards are all closed-form functions of the
    parquet table, so the DuckDB oracle hash-verifies the whole
    failure-policy surface."""
    import pyarrow.parquet as pq

    out = gate_jsonl_dir(sf_dir) + "_corrupt"
    if os.path.isdir(out):
        return out

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    shard_lines: list[list[bytes]] = [[] for _ in range(_N_SHARDS)]
    for r in rows:
        line = json.dumps(
            {
                "doc_id": r["doc_id"],
                "text": r["text"],
                "lang": r["lang"],
                "source": r["source"],
                "n_chars": r["n_chars"],
            }
        ).encode()
        if r["doc_id"] % _CORRUPT_MOD == _CORRUPT_REM:
            line = line[:10]  # b'{"doc_id":' — never valid JSON
        shard_lines[r["doc_id"] % _N_SHARDS].append(line + b"\n")

    tmp = f"{out}.tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for i, lines in enumerate(shard_lines):
        with gzip.open(os.path.join(tmp, f"shard-{i}.jsonl.gz"), "wb") as fh:
            fh.write(b"".join(lines))
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
