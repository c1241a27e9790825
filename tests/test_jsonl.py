"""JSONL corpus source/sink (sources/jsonl.py): write→read fidelity,
shard-count control, corrupt-line policy, and the zstd ingest path the
driver gate exercises."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from wikihadoop_spark.sources.jsonl import (
    DOCUMENT_SCHEMA_DDL,
    ensure_gate_jsonl,
    read_corpus_jsonl,
    write_corpus_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_write_read_roundtrip_gzip(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    out = str(tmp_path / "corpus")
    write_corpus_jsonl(docs, out, compression="gzip", shards=3)
    files = glob.glob(out + "/part-*.json.gz")
    assert len(files) == 3, files

    back = read_corpus_jsonl(spark, out + "/*.json.gz", DOCUMENT_SCHEMA_DDL)
    assert back.schema == docs.select(*back.columns).schema
    a = sorted(docs.collect(), key=lambda r: r.doc_id)
    b = sorted(back.collect(), key=lambda r: r.doc_id)
    assert [r.asDict() for r in a] == [
        {k: r[k] for k in docs.columns} for r in b
    ]


def test_read_requires_no_inference(spark, tmp_path):
    """The explicit schema is honored verbatim — a field absent from
    the data stays null, a field absent from the schema is ignored."""
    p = tmp_path / "x.jsonl"
    p.write_text('{"doc_id": 7, "extra": "ignored"}\n')
    df = read_corpus_jsonl(spark, str(p), "doc_id bigint, lang string")
    row = df.collect()[0]
    assert row.doc_id == 7 and row.lang is None
    assert df.columns == ["doc_id", "lang"]


@pytest.mark.parametrize("codec", ["gz", "zst"])
def test_gate_fixture_matches_parquet(spark, codec):
    base = ensure_gate_jsonl(SF)
    j = read_corpus_jsonl(spark, f"{base}/*.jsonl.{codec}", DOCUMENT_SCHEMA_DDL)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    assert j.count() == docs.count()
    joined = j.alias("j").join(docs.alias("p"), "doc_id")
    bad = joined.where(
        (F.col("j.text") != F.col("p.text"))
        | (F.col("j.n_chars") != F.col("p.n_chars"))
        | (F.col("j.lang") != F.col("p.lang"))
        | (F.col("j.source") != F.col("p.source"))
    ).count()
    assert bad == 0


def _corpus_with_torn_line(tmp_path) -> str:
    p = tmp_path / "torn.jsonl.gz"
    lines = [json.dumps({"doc_id": i, "lang": "en"}) for i in range(5)]
    body = "\n".join(lines[:3]) + '\n{"doc_id": 3, "lang": "e\n' + lines[4] + "\n"
    with gzip.open(p, "wt") as fh:
        fh.write(body)
    return str(p)


def test_corrupt_drop_keep_fail(spark, tmp_path):
    p = _corpus_with_torn_line(tmp_path)
    schema = "doc_id bigint, lang string"

    kept = read_corpus_jsonl(spark, p, schema, on_corrupt="drop")
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 2, 4]
    assert "_corrupt_record" not in kept.columns

    full = read_corpus_jsonl(spark, p, schema, on_corrupt="keep")
    rows = full.collect()
    assert len(rows) == 5
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1 and corrupt[0].doc_id is None

    with pytest.raises(Exception, match="(?s)FAILFAST|Malformed"):
        read_corpus_jsonl(spark, p, schema, on_corrupt="fail").collect()

    with pytest.raises(ValueError, match="on_corrupt"):
        read_corpus_jsonl(spark, p, schema, on_corrupt="nope")


def test_export_shards_observable_parallelism(spark, tmp_path):
    """shards=N is the contract that the next reader gets N tasks:
    compressed JSONL is non-splittable, so files == read partitions."""
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    out = str(tmp_path / "sharded")
    write_corpus_jsonl(docs, out, shards=5)
    back = read_corpus_jsonl(spark, out + "/*.json.gz", DOCUMENT_SCHEMA_DDL)
    assert back.rdd.getNumPartitions() == 5
