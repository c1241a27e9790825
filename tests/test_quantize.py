"""Int8 quantization kernel (operators/quantize.py) — property tests.

The kernel's portability claim is that every step is exact or
IEEE-exactly-rounded, so ANY conforming engine reproduces it
bit-for-bit.  These properties pin that against a pure-Python
reference (CPython doubles are the same IEEE-754 binary64 the JVM
uses): quantization on random vectors, trunc-toward-zero symmetry,
exact integer dots under permutation/order changes, and the quantized
cosine's bit equality including the sqrt step.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wikihadoop_spark.operators.quantize import (
    int_dot,
    int_norm2,
    quantize_int8,
    quantized_cosine,
)

finite = st.floats(
    min_value=-1e12,
    max_value=1e12,
    allow_nan=False,
    allow_infinity=False,
    width=64,
)


def _py_quantize(vec: list[float]) -> list[int]:
    mx = max((abs(x) for x in vec), default=0.0)
    if mx <= 0.0:
        return [0 for _ in vec]
    return [int(math.trunc(x * 127.0 / mx)) for x in vec]


@settings(max_examples=25, deadline=None)
@given(st.lists(finite, min_size=1, max_size=16))
def test_quantize_matches_python_reference_bitwise(spark, vec):
    got = (
        spark.createDataFrame([(vec,)], "v array<double>")
        .select(quantize_int8(F.col("v")).alias("q"))
        .collect()[0]
        .q
    )
    want = _py_quantize(vec)
    assert got == want
    assert all(-127 <= q <= 127 for q in got)
    # trunc is symmetric toward zero: negating the vector negates q
    neg = (
        spark.createDataFrame([([-x for x in vec],)], "v array<double>")
        .select(quantize_int8(F.col("v")).alias("q"))
        .collect()[0]
        .q
    )
    assert neg == [-q for q in want]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-127, max_value=127), min_size=1, max_size=64)
)
def test_int_dot_and_norm_are_exact(spark, qs):
    other = list(reversed(qs))
    row = (
        spark.createDataFrame([(qs, other)], "a array<int>, b array<int>")
        .select(
            int_dot(F.col("a"), F.col("b")).alias("d"),
            int_norm2(F.col("a")).alias("na"),
            int_norm2(F.col("b")).alias("nb"),
        )
        .collect()[0]
    )
    assert row.d == sum(x * y for x, y in zip(qs, other))
    assert row.na == row.nb == sum(x * x for x in qs)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=-127, max_value=127), min_size=1, max_size=64)
)
def test_quantized_cosine_bitwise_vs_python(spark, qs):
    other = [((i * 37) % 255) - 127 for i, _ in enumerate(qs)]
    na = sum(x * x for x in qs)
    nb = sum(x * x for x in other)
    if na == 0 or nb == 0:
        return
    got = (
        spark.createDataFrame([(qs, other)], "a array<int>, b array<int>")
        .select(
            quantized_cosine(
                int_dot(F.col("a"), F.col("b")),
                int_norm2(F.col("a")),
                int_norm2(F.col("b")),
            ).alias("c")
        )
        .collect()[0]
        .c
    )
    want = sum(x * y for x, y in zip(qs, other)) / math.sqrt(float(na * nb))
    # bitwise: both stacks do exact-int -> one sqrt -> one divide
    assert got.hex() == want.hex()
