"""Int8 embedding quantization + integer similarity kernel — the
bandwidth path for ANN at 100 TB.

A float32 embedding column is the dominant byte stream of a
similarity-heavy pipeline: at 100 TB of corpus with d=768 vectors,
every brute-force or rerank pass moves 4·d bytes per row.  Symmetric
int8 quantization cuts that 4× (scan bytes, shuffle bytes, broadcast
size) and turns the inner product into small-integer multiply-adds —
the same trade every production vector store ships (FAISS SQ8,
ScaNN's fixed-point AH).  Recall cost is tiny for cosine ranking
because quantization error is bounded at 1/254 of the per-vector max.

Engine-portable by construction — every step is exact or
IEEE-exactly-rounded, so a SQL oracle replays the kernel bit-for-bit:

- quantize: ``q_j = trunc(x_j * 127.0 / max_k |x_k|)`` on DOUBLES —
  one multiply and one divide (both exactly rounded), trunc toward
  zero (Spark's int cast == DuckDB's trunc), q_j in [-127, 127];
- integer dot / squared norm: products ≤ 127² and d-term sums stay
  far below 2^53, so EVERY summation order yields the same exact
  integer (no float drift to legislate);
- quantized cosine: ``dot / sqrt(n2_a * n2_b)`` — the product of two
  exact integer norms is exact in double, sqrt and the final division
  are IEEE-exactly-rounded, hence bit-identical across engines.

Zero vectors quantize to all-zero (scale guard) and carry n2 = 0;
similarity against them is undefined — callers filter ``n2 > 0``
(the gate query does, on both engines).

FINITE-INPUT PRECONDITION: the bit-identical claim holds for finite
inputs only.  A NaN element makes the per-vector max NaN — Spark
orders NaN greater than 0.0 so the quantize branch runs and
``NaN.cast("int")`` silently yields 0, while DuckDB's
``CAST(trunc(NaN) AS INT)`` raises; an element with ``|x| >
DBL_MAX/127`` overflows ``x * 127.0`` to Inf with similarly divergent
cast behavior (Spark clamps, DuckDB raises).  Callers quantizing a
corpus that may contain non-finite embeddings must pre-filter (e.g.
``F.exists(vec, F.isnan)`` / infinity range checks) so the failure is
loud and identical on both engines instead of a silent 0-vector on
Spark only.

Plan shape: quantization is a row-local projection (rides the scan);
the kernel composes with the existing ANN paths (broadcast queries,
hyperplane buckets, IVF) unchanged — only the element type narrows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantize_int8(vec: Column) -> Column:
    """array<double> -> array<int> in [-127, 127] (symmetric per-vector
    scale).  NULL passes through; an all-zero vector yields all zeros
    (scale guard — no NaN leaks into downstream integer math)."""
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    return F.when(
        mx > F.lit(0.0),
        F.transform(vec, lambda x: (x * F.lit(127.0) / mx).cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer inner product of two int8-range arrays (bigint —
    d·127² never approaches an overflow)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def int_norm2(a: Column) -> Column:
    """Exact squared norm (bigint)."""
    return int_dot(a, a)


def quantized_cosine(dot_col: Column, n2a: Column, n2b: Column) -> Column:
    """``dot / sqrt(n2a * n2b)`` — bit-exact across engines (see module
    docstring); callers must have filtered zero norms."""
    return dot_col.cast("double") / F.sqrt((n2a * n2b).cast("double"))


def hyperplane_bucket_int(qvec: Column, planes: list[list[int]]) -> Column:
    """Integer-hyperplane LSH bucket over an int8-quantized vector:
    sign bit per plane packed little-endian into an int.

    This is the bucketing half of the bandwidth path — at 100 TB the
    corpus is hashed reading the 4×-smaller int8 column, never the
    float one.  Unlike the float hyperplane family (whose dot is a
    float fold, portable only because both engines fold left-to-right),
    EVERY term here is exact integer math: |q_j| <= 127, plane entries
    small ints, so each product and the d-term sum sit far below 2^53
    — the bucket id is bit-identical across engines BY CONSTRUCTION,
    in any summation order.  The hash family is the spec (same trick
    as the float LSH gate, with the portability argument upgraded
    from 'both engines fold the same way' to 'exact integers')."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(int(x)) for x in p])
        bit = (int_dot(qvec, plane) >= 0).cast("int")
        bucket = bucket + bit * F.lit(2 ** i)
    return bucket


def cosine_topk_int8_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[int]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k over int8-quantized embeddings, probing only
    the query's integer-hyperplane bucket — the two scale levers
    composed: LSH makes the search an equi-join on bucket id (scan
    ~1/2^planes of the corpus per probe) and int8 makes every byte of
    that scan 4× cheaper (FAISS-SQ8 inside an LSH index, from public
    designs).  Returns (query_id, neighbor_id, int_dot, qcos, rank) —
    the same schema as the brute-force int8 query so recall pins can
    compare them directly.

    Zero-norm quantized vectors are excluded on both sides (cosine
    against them is undefined).  At real scale the quantized+bucketed
    corpus is a WRITE — materialized once next to the corpus — so
    every search pass reads only (int8 vector, norm, bucket); here the
    operator quantizes inline (the gate query persists the shared
    quantized frame instead, see relational.py's CSE-across-join
    note).  Finite-input precondition applies (module docstring)."""
    qn_c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            quantize_int8(F.col(vec_col).cast("array<double>")).alias("qb"),
        )
        .withColumn("nb", int_norm2(F.col("qb")))
        .filter(F.col("nb") > 0)
        .withColumn("__bucket", hyperplane_bucket_int(F.col("qb"), planes))
    )
    qn_q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            quantize_int8(F.col(vec_col).cast("array<double>")).alias("qa"),
        )
        .withColumn("na", int_norm2(F.col("qa")))
        .filter(F.col("na") > 0)
        .withColumn("__bucket", hyperplane_bucket_int(F.col("qa"), planes))
    )
    scored = (
        qn_c.join(F.broadcast(qn_q), on="__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("int_dot", int_dot(F.col("qa"), F.col("qb")))
        .withColumn(
            "qcos", quantized_cosine(F.col("int_dot"), F.col("na"), F.col("nb"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "int_dot", "qcos", "rank")
    )
