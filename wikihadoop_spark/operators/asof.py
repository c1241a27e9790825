"""As-of join (point-in-time lookup), Spark-first.

Spark has no native ASOF JOIN.  The scalable formulation is the
union-window trick: tag both sides, union on (key, time), and carry the
most recent right-side payload forward with ``last(..., ignorenulls)``
over an unbounded-preceding row frame.  One shuffle on the key, one
sort — O(n log n), no per-group pandas, no skew-prone range cross-join.
``pd.merge_asof`` per group (applyInPandas) would serialize every group
through Python; this stays entirely in Tungsten.

The right payload travels as a single non-null struct so legitimately
NULL right columns don't get skipped by ``ignorenulls``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    right_cols: Sequence[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_on <= left.left_on`` (``<`` when ``strict``) within the
    same ``by`` key group.  Left rows with no prior right row keep NULLs
    (left-outer semantics).

    If several right rows share (key, time), the payload of the one
    sorting last on the remaining right columns wins — pre-canonicalize
    the right side when that matters.
    """
    by = list(by)
    right_cols = list(right_cols or [c for c in right.columns if c not in by])
    if right_on not in right_cols:
        right_cols = right_cols + [right_on]

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof_payload")
    # Right rows sort before left rows at equal time for inclusive (<=)
    # semantics, after them for strict (<).
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    left_cols = list(left.columns)
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__asof_time"),
        F.lit(right_tag).alias("__asof_side"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by],
    )
    l = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__asof_time"),
        F.lit(left_tag).alias("__asof_side"),
        F.lit(None).cast(r.schema["__asof_payload"].dataType).alias("__asof_payload"),
        *[F.col(c) for c in left_cols if c not in by],
    )
    unioned = r.unionByName(l)

    w = (
        Window.partitionBy(*by)
        .orderBy("__asof_time", "__asof_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    )
    is_left = F.col("__asof_side") == F.lit(left_tag)
    out = carried.filter(is_left)
    for c in right_cols:
        out = out.withColumn(c, F.col("__asof_match")[c])
    return out.select(
        *by,
        *[c for c in left_cols if c not in by],
        *right_cols,
    )
