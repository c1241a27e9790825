"""Skew-resistant aggregation via salting.

AQE's skew-join splitting handles join skew; aggregation skew (one hot
group key receiving a large fraction of all rows) still funnels the
hot group through a single reduce task.  Salting splits every group
into ``salt`` sub-groups aggregated in parallel, then merges partials —
two shuffles, both uniform.  Worth it only for algebraic aggregates
(sum/count/min/max: partials merge losslessly) on genuinely skewed
keys; Spark's map-side partial aggregation already absorbs mild skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate name -> (partial fn, merge fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    *,
    salt: int = 16,
) -> DataFrame:
    """GroupBy ``keys`` with algebraic aggregates, salted ``salt`` ways.

    ``aggs`` maps output column -> (agg_name, input column), e.g.
    ``{"total": ("sum", "amount"), "n": ("count", F.lit(1))}``.
    Result is identical to the unsalted groupBy (asserted in tests).
    """
    keys = list(keys)
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial_exprs = []
    merge_exprs = []
    for out, (name, col) in aggs.items():
        if name not in _ALGEBRAIC:
            raise ValueError(
                f"{name!r} is not algebraic; salting would change results"
            )
        partial_fn, merge_fn = _ALGEBRAIC[name]
        partial_exprs.append(partial_fn(col).alias(f"__p_{out}"))
        merge_exprs.append(merge_fn(f"__p_{out}").alias(out))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)
