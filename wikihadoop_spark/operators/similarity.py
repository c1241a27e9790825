"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
compute cosine with built-in higher-order array functions (JVM-side,
no Python), rank with a per-query window.  One pass over the corpus,
no shuffle of the corpus itself; the window shuffles only
(query × corpus) scored rows, and WindowGroupLimit keeps per-partition
top-k before the exchange.

Scale path: LSH bucketing via random hyperplane signs (SimHash for
vectors) — corpus hashed once, queries probe matching buckets only;
implemented here as ``hyperplane_bucket`` + bucketed join.  A full IVF
(k-means coarse quantizer) needs iterative clustering; the bucketed
LSH keeps everything in one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Top-k corpus neighbors per query vector by cosine similarity.

    Returns (query_id, neighbor_id, cosine_sim, rank).  Ties broken by
    neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cvec"),
    )
    scored = c.join(F.broadcast(q), how="cross")
    if not include_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn("cosine_sim", cosine(F.col("__qvec"), F.col("__cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed into an
    int.  Vectors with small angle land in the same bucket with high
    probability; used to prune the candidate set before exact cosine."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(vec, plane) >= 0).cast("int")
        bucket = bucket + bit * F.lit(2**i)
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.

    Trades recall for a corpus-partitionable equi-join on bucket id —
    the 100 TB-scale path (bucket the corpus once, broadcast bucketed
    queries)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cvec"),
    ).withColumn("__bucket", hyperplane_bucket(F.col("__cvec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    ).withColumn("__bucket", hyperplane_bucket(F.col("__qvec"), planes))
    scored = (
        c.join(F.broadcast(q), on="__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
