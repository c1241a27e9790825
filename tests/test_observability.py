from __future__ import annotations

from pyspark.sql import functions as F

from wikihadoop_spark.catalog import load_table
from wikihadoop_spark.observability import observed_counts

SF = "/root/testdata/sf0.001"


def test_observed_counts(spark):
    docs = load_table(spark, SF, "documents")
    df, obs = observed_counts(
        docs,
        total=None,
        english=F.col("lang") == "en",
        long_docs=F.col("n_chars") > 200,
    )
    df.count()
    got = obs.get
    assert got["total"] == docs.count()
    assert got["english"] == docs.filter(F.col("lang") == "en").count()
    assert got["long_docs"] == docs.filter(F.col("n_chars") > 200).count()
