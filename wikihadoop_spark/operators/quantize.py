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

Plan shape: quantization is a row-local projection (rides the scan);
the kernel composes with the existing ANN paths (broadcast queries,
hyperplane buckets, IVF) unchanged — only the element type narrows.
"""

from __future__ import annotations

from pyspark.sql import Column
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
