"""Top-K per group.

``row_number() <= k`` over a window — Spark plans this as a single
shuffle with per-partition partial top-k (WindowGroupLimit pushes the
limit below the sort since Spark 3.5), so it scales without
materializing full per-group sorts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    *,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the first ``k`` rows of each group under ``order_by``.

    ``order_by`` should be a total order (include a unique tiebreak) for
    deterministic output.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
