"""Shard utility + salted aggregation tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikihadoop_spark.catalog import load_table
from wikihadoop_spark.operators.skew import salted_agg
from wikihadoop_spark.sources.shard import shard_dump
from wikihadoop_spark.sources.wikidump import read_wikidump

from dump_fixtures import big_dump, standard_dump, write_dump

SF = "/root/testdata/sf0.001"


def test_shard_roundtrip_plain(spark, tmp_path):
    path = write_dump(tmp_path, big_dump(), "big.xml")
    out = str(tmp_path / "shards")
    paths = shard_dump(path, out, shard_bytes=20_000)
    assert len(paths) > 3
    orig = sorted(
        (r.page_id, r.rev_id, r.text) for r in read_wikidump(spark, path).collect()
    )
    shd = sorted(
        (r.page_id, r.rev_id, r.text)
        for r in read_wikidump(spark, out + "/shard-*.xml").collect()
    )
    assert shd == orig


def test_shard_bz2_to_parallel(spark, tmp_path):
    """The real use: one non-splittable .bz2 -> parallel-readable
    compressed shards, zero row loss."""
    src = write_dump(tmp_path, big_dump(), "big.xml", compress="bz2")
    out = str(tmp_path / "shards")
    paths = shard_dump(src, out, shard_bytes=20_000, compress="bz2")
    assert len(paths) > 3 and all(p.endswith(".bz2") for p in paths)
    orig = sorted((r.page_id, r.rev_id) for r in read_wikidump(spark, src).collect())
    df = read_wikidump(spark, out + "/shard-*.xml.bz2")
    assert df.rdd.getNumPartitions() == len(paths)  # one partition per shard
    assert sorted((r.page_id, r.rev_id) for r in df.collect()) == orig


def test_shards_are_page_aligned(spark, tmp_path):
    path = write_dump(tmp_path, big_dump(), "big.xml")
    out = str(tmp_path / "shards")
    for p in shard_dump(path, out, shard_bytes=20_000):
        content = open(p, "rb").read()
        assert content.count(b"<page>") == content.count(b"</page>")


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF, "lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "total_qty": ("sum", F.col("l_quantity").cast("decimal(15,2)")),
            "n": ("count", F.lit(1)),
            "min_price": ("min", F.col("l_extendedprice")),
            "max_price": ("max", F.col("l_extendedprice")),
        },
        salt=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("total_qty"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    li = load_table(spark, SF, "lineitem")
    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(li, ["l_returnflag"], {"avg": ("avg", "l_quantity")})
