"""Streaming wikidump ingest: spark.readStream over a directory where
dump shards arrive between microbatches — each file consumed exactly
once, planned with the same byte-range/bz2-block partitioning as the
batch reader."""

from __future__ import annotations

import bz2
import time

from wikihadoop_spark.sources.wikidump import register_wikidump

from dump_fixtures import big_dump, page, rev, standard_dump


def _shard(i: int, n_revs: int = 3) -> tuple[str, list[int]]:
    rid0 = 1000 * i
    revs = [
        rev(rid0 + r, f"2023-01-{r + 1:02d}T00:00:00Z", f"shard {i} body {r}")
        for r in range(n_revs)
    ]
    xml = (
        "<mediawiki><siteinfo><sitename>S</sitename></siteinfo>\n"
        + page(500 + i, f"Shard Page {i}", 0, revs)
        + "</mediawiki>\n"
    )
    return xml, [rid0 + r for r in range(n_revs)]


def test_stream_reads_arriving_shards_exactly_once(spark, tmp_path):
    register_wikidump(spark)
    indir = tmp_path / "arriving"
    indir.mkdir()

    xml1, ids1 = _shard(1)
    (indir / "shard-1.xml").write_text(xml1)
    xml2, ids2 = _shard(2)
    (indir / "shard-2.xml.bz2").write_bytes(bz2.compress(xml2.encode(), 1))

    stream = (
        spark.readStream.format("wikidump")
        .option("path", str(indir))
        .load()
        .select("page_id", "rev_id", "rev_seq", "title")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wd_stream")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.rev_id for r in spark.sql("SELECT * FROM wd_stream").collect()}
        assert got == set(ids1) | set(ids2)

        # a new shard lands mid-stream: only its rows are appended
        xml3, ids3 = _shard(3, n_revs=2)
        tmp = indir / ".shard-3.xml.tmp"
        tmp.write_text(xml3)
        tmp.rename(indir / "shard-3.xml")
        q.processAllAvailable()
        got = {r.rev_id for r in spark.sql("SELECT * FROM wd_stream").collect()}
        assert got == set(ids1) | set(ids2) | set(ids3)
        # exactly-once: no duplicates across batches
        rows = spark.sql("SELECT rev_id, count(*) c FROM wd_stream GROUP BY rev_id HAVING count(*) > 1").collect()
        assert rows == []
    finally:
        q.stop()


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    register_wikidump(spark)
    indir = tmp_path / "arriving2"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    xml1, ids1 = _shard(7)
    (indir / "a.xml").write_text(xml1)

    def run_once():
        stream = (
            spark.readStream.format("wikidump")
            .option("path", str(indir))
            .load()
            .select("rev_id")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {r.rev_id for r in spark.read.parquet(out).collect()}
    assert first == set(ids1)

    xml2, ids2 = _shard(8)
    (indir / "b.xml").write_text(xml2)
    run_once()
    rows = [r.rev_id for r in spark.read.parquet(out).collect()]
    assert set(rows) == set(ids1) | set(ids2)
    # exactly-once across restarts
    assert len(rows) == len(set(rows))


def test_streaming_diffdb_matches_batch(spark, tmp_path):
    """Incremental diffdb: the SAME build_diffdb plan runs on the
    streaming source (compute_diffs in-scan -> stream-static broadcast
    ns join -> projection), producing exactly the batch pipeline's rows
    as shards arrive — the reference's 22-hour full re-run becomes an
    append-only stream."""
    from wikihadoop_spark.plans.diffdb import build_diffdb
    from wikihadoop_spark.sources.wikidump import read_wikidump

    indir = tmp_path / "arrive3"
    indir.mkdir()
    (indir / "s1.xml").write_text(standard_dump())
    (indir / "s2.xml").write_text(big_dump(5, 3))

    revs_stream = (
        spark.readStream.format("wikidump")
        .option("path", str(indir))
        .option("compute_diffs", "true")
        .load()
    )
    stream_df = build_diffdb(revs_stream, paired=True).drop("beginningofpage")
    q = (
        stream_df.writeStream.format("memory")
        .queryName("diffdb_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM diffdb_stream").collect()
    finally:
        q.stop()

    batch = build_diffdb(
        read_wikidump(spark, str(indir / "*.xml"), compute_diffs="true"),
        paired=True,
    ).drop("beginningofpage").collect()

    def key(rows):
        return sorted(
            (r.rev_id, r.page_id, r.title, r.timestamp,
             [(o.position, o.action, o.content) for o in r.ops])
            for r in rows
        )

    assert key(got) == key(batch)
    assert len(got) > 0
