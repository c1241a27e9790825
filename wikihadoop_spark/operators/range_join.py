"""Range (interval) join via bucketing.

A naive |t_a - t_b| <= w join is a cross product with a filter — O(n²)
and unrunnable at scale.  Bucketing by floor(epoch / w) turns it into
an equi-join: a row only needs to probe its own bucket and the two
neighbors (any pair within w spans at most one bucket boundary).  The
probe side explodes ×3; the join is a plain shuffled hash join that
AQE can re-plan, and the exact predicate filters the superset after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(time_col: str, width_us: int):
    return F.floor(F.unix_micros(F.col(time_col).cast("timestamp")) / F.lit(width_us))


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    width_seconds: int,
) -> DataFrame:
    """Inner join of rows with |left_on - right_on| <= width_seconds.

    Returns left columns + right columns (caller must pre-rename
    collisions)."""
    width_us = int(width_seconds) * 1_000_000
    l = left.withColumn("__rb", F.explode(F.array(
        _bucket(left_on, width_us) - 1,
        _bucket(left_on, width_us),
        _bucket(left_on, width_us) + 1,
    )))
    r = right.withColumn("__rb", _bucket(right_on, width_us))
    lt = F.unix_micros(F.col(left_on).cast("timestamp"))
    rt = F.unix_micros(F.col(right_on).cast("timestamp"))
    return (
        l.join(r, "__rb")
        .filter(F.abs(lt - rt) <= F.lit(width_us))
        .drop("__rb")
    )


def range_count(
    df: DataFrame,
    *,
    key_col: str,
    time_col: str,
    width_seconds: int,
    count_col: str = "n_near",
) -> DataFrame:
    """Per row: how many OTHER rows fall within ±width_seconds.
    Left-outer semantics: rows with no neighbor report 0."""
    probe = df.select(F.col(key_col), F.col(time_col))
    build = df.select(
        F.col(key_col).alias("__rk"), F.col(time_col).alias("__rt")
    )
    pairs = range_join(
        probe, build, left_on=time_col, right_on="__rt", width_seconds=width_seconds
    ).filter(F.col("__rk") != F.col(key_col))
    counts = pairs.groupBy(key_col).agg(F.count(F.lit(1)).alias(count_col))
    return (
        df.select(key_col)
        .join(counts, key_col, "left")
        .select(F.col(key_col), F.coalesce(F.col(count_col), F.lit(0)).alias(count_col))
    )
