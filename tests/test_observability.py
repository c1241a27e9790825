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


def test_read_counter_maps_pruned_row_to_default(spark):
    """AQE empty-relation propagation prunes a CollectMetrics branch
    whose join partner is empty; the Observation then resolves with an
    EMPTY row and the read raises a Py4J AssertionError from toPyRow.
    read_counter(default=0) maps exactly that shape to the default."""
    from pyspark.sql import Observation

    from wikihadoop_spark.observability import read_counter

    obs = Observation("pruned")
    left = spark.range(10).observe(obs, F.count(F.lit(1)).alias("n"))
    left.join(spark.range(0), "id").count()
    assert read_counter(obs, default=0) == 0


def test_read_counter_reraises_unrelated_failures():
    """An unrelated failure (connection loss, interrupted job) must NOT
    be reported as a zero count, even with a default set."""
    import pytest

    from wikihadoop_spark.observability import read_counter

    class Boom:
        @property
        def get(self):
            raise RuntimeError("py4j connection dropped")

    with pytest.raises(RuntimeError, match="connection dropped"):
        read_counter(Boom(), default=0)
