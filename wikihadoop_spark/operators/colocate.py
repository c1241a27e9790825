"""Co-located (bucketed) joins — the exchange-free repeated-join path.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the key.  When the same join recurs (revision chains joined
to page metadata, candidate pairs joined back to the corpus), write
both tables bucketed AND sorted by the key once: every later join
picks SortMergeJoin with NO Exchange and NO per-query Sort on either
side — the shuffle was paid once at write time.

Spark specifics encoded here:
- both sides must have the same bucket count (or one a divisor of the
  other with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- bucket pruning applies to equality filters on the bucket key;
- ``saveAsTable`` is required (bucket metadata lives in the catalog —
  a bare ``parquet(path)`` write silently drops bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` so
    subsequent equi-joins on ``key`` against an equally-bucketed table
    are exchange-free."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key — with equal bucket
    counts this plans as SortMergeJoin with zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
