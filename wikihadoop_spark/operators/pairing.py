"""Consecutive-row pairing — the reference's core operator (P1).

The reference pairs each revision with its predecessor inside the record
reader, buffering one previous revision per page and emitting a dummy
empty revision at page start (reference: StreamWikiDumpInputFormat.java:298-429,
README.rst:107-190).  Spark-first, that is a window ``lag`` over
``partitionBy(page) orderBy(sequence)`` — one shuffle on the page key,
no buffering logic, and the "dummy first revision" is
``lag(...) IS NULL`` + ``coalesce(lag(text), '')``.

Scale note: a window per page key puts one page's whole history in one
task.  For pathological pages (multi-GB histories) the wikidump source
offers source-side streaming pairing instead (sources/wikidump.py);
for relational data the window is the right default — Spark's window
operator spills, and AQE handles moderate skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pair_with_previous(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    cols: Sequence[str],
    *,
    fill: dict[str, object] | None = None,
    first_flag: str = "is_first",
    prefix: str = "prev_",
) -> DataFrame:
    """Add ``prev_<col>`` for each col in ``cols`` plus a boolean
    ``first_flag`` column (the ``beginningofpage`` analog).

    ``fill`` maps column name -> value used when there is no previous row
    (the reference uses the empty string for ``text``).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fill = fill or {}
    out = df
    for c in cols:
        lagged = F.lag(F.col(c)).over(w)
        if c in fill:
            lagged = F.coalesce(lagged, F.lit(fill[c]))
        out = out.withColumn(prefix + c, lagged)
    marker = F.lag(F.lit(1)).over(w)
    return out.withColumn(first_flag, marker.isNull())


def pair_with_previous_join(
    df: DataFrame,
    partition_by: Sequence[str],
    seq_col: str,
    cols: Sequence[str],
    *,
    fill: dict[str, object] | None = None,
    first_flag: str = "is_first",
    prefix: str = "prev_",
) -> DataFrame:
    """Join-based pairing for DENSE sequences (seq = 1..n per key,
    which the wikidump source guarantees for rev_seq).

    ``Window.partitionBy(page)`` puts a page's entire history in one
    task — the giant-page hazard (SURVEY §7.4.1).  Joining row (key,
    seq) against row (key, seq-1) instead hash-partitions on BOTH key
    and sequence, so a multi-gigabyte page history spreads across the
    cluster like any other join.  Costs a second shuffle of the paired
    columns; wins unbounded skew-resistance.  Equivalence with the
    window variant is asserted in tests.
    """
    fill = fill or {}
    keys = list(partition_by)
    prev = df.select(
        *[F.col(k) for k in keys],
        (F.col(seq_col) + 1).alias(seq_col),
        *[F.col(c).alias(prefix + c) for c in cols],
        F.lit(1).alias("__has_prev"),
    )
    joined = df.join(prev, on=[*keys, seq_col], how="left")
    out = joined.withColumn(first_flag, F.col("__has_prev").isNull()).drop(
        "__has_prev"
    )
    for c, v in fill.items():
        out = out.withColumn(
            prefix + c, F.coalesce(F.col(prefix + c), F.lit(v))
        )
    return out
