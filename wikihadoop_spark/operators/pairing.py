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
    """Join-semantics pairing for DENSE sequences (seq = 1..n per key,
    which the wikidump source guarantees for rev_seq) — row (key, seq)
    meets row (key, seq-1), realized as ONE exchange.

    ``Window.partitionBy(page)`` puts a page's entire history in one
    task — the giant-page hazard (SURVEY §7.4.1).  Pairing on the
    composite (key, seq) instead hash-partitions on BOTH key and
    sequence, so a multi-gigabyte page history spreads across the
    cluster like any other keyed exchange.  The naive self-join costs
    TWO shuffles (each side exchanges on the composite key) and two
    scans; this formulation costs ONE of each: every input row is
    exploded into two shuffle records — its own payload addressed at
    (key, seq) and its paired columns re-addressed at (key, seq+1) —
    and one aggregate over (key, seq) zips the at-most-one "self" and
    at-most-one "prev" record back into a row.  Same bytes a join
    would move, half the exchanges, and the (key, seq+1) records with
    no self row (each key's end-of-sequence sentinel) drop in the
    aggregate.  ``first(ignorenulls)`` is deterministic here because
    density makes (key, seq) unique: each group holds at most one
    non-null candidate per struct.  Equivalence with the window
    variant is asserted in tests; the one-exchange no-window plan
    shape is pinned in tests/test_plans.py.

    CONTRACT GUARDS (round-16 review): a violated density contract
    must fail LOUDLY, not corrupt silently.  A NULL ``seq_col`` value
    raises at execution time (in this formulation the row's self and
    prev records would otherwise land in the same (key, NULL) group
    and the row would report ITSELF as its predecessor — worse than
    the old join formulation's accidental is_first=True).  A
    duplicated (key, seq) raises too (the aggregate would otherwise
    collapse duplicates to one nondeterministic survivor — silent row
    loss, where the old join silently multiplied).  Both guards are
    row-local expressions inside the existing single aggregate — no
    extra pass, no extra exchange.

    SCHEMA ORDER (round-16 review): the output column order is
    partition keys, then ``seq_col``, then the remaining input
    columns, then the ``prev_``-prefixed pair columns and
    ``first_flag`` — NOT the input ``df.columns`` order the pre-r16
    join formulation preserved.  Select by name; positional consumers
    of the old order must re-bind.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    fill = fill or {}
    keys = list(partition_by)
    rest = [c for c in df.columns if c not in keys and c != seq_col]
    by_name = {f.name: f for f in df.schema.fields}
    # "__p" marker: keeps the prev struct non-empty when cols == []
    # and makes row presence independent of the paired values' nulls
    self_t = StructType(
        [StructField("__p", BooleanType())]
        + [StructField(c, by_name[c].dataType) for c in rest]
    )
    prev_t = StructType(
        [StructField("__p", BooleanType())]
        + [StructField(c, by_name[c].dataType) for c in cols]
    )
    # NULL-seq guard: raise per-row instead of mis-grouping (same
    # idiom as the quantize dimension guards — loud on a PRESENT
    # contract violation)
    guarded_seq = F.when(
        F.col(seq_col).isNotNull(), F.col(seq_col)
    ).otherwise(
        F.raise_error(
            F.concat_ws(
                "",
                F.lit(
                    "pair_with_previous_join: NULL sequence value for key "
                ),
                *[F.col(k).cast("string") for k in keys],
                F.lit(" — the dense-seq contract requires seq = 1..n"),
            )
        )
    )
    two = F.array(
        F.struct(
            guarded_seq.alias("__seq"),
            F.struct(
                F.lit(True).alias("__p"), *[F.col(c) for c in rest]
            ).alias("__self"),
            F.lit(None).cast(prev_t).alias("__prev"),
        ),
        F.struct(
            (F.col(seq_col) + 1).alias("__seq"),
            F.lit(None).cast(self_t).alias("__self"),
            F.struct(
                F.lit(True).alias("__p"), *[F.col(c) for c in cols]
            ).alias("__prev"),
        ),
    )
    doubled = df.select(
        *[F.col(k) for k in keys], F.explode(two).alias("__x")
    ).select(
        *keys,
        F.col("__x.__seq").alias(seq_col),
        F.col("__x.__self").alias("__self"),
        F.col("__x.__prev").alias("__prev"),
    )
    agg = doubled.groupBy(*keys, seq_col).agg(
        F.first("__self", ignorenulls=True).alias("__self"),
        F.first("__prev", ignorenulls=True).alias("__prev"),
        F.count("__self").alias("__ns"),
        F.count("__prev").alias("__np"),
    )
    # duplicate-(key, seq) guard: >1 self (or prev) record in a group
    # means the sequence is not unique — raise instead of collapsing
    # to one nondeterministic survivor
    dup_guard = F.when(
        (F.col("__ns") <= 1) & (F.col("__np") <= 1), F.col("__self")
    ).otherwise(
        F.raise_error(
            F.concat_ws(
                "",
                F.lit(
                    "pair_with_previous_join: duplicated (key, seq) for key "
                ),
                *[F.col(k).cast("string") for k in keys],
                F.lit(" seq "),
                F.col(seq_col).cast("string"),
                F.lit(" — the dense-seq contract requires unique seq per key"),
            )
        )
    )
    agg = agg.withColumn("__self", dup_guard).drop("__ns", "__np")
    proj: list[Column] = [F.col(k) for k in keys]
    proj.append(F.col(seq_col))
    proj.extend(F.col(f"__self.{c}").alias(c) for c in rest)
    for c in cols:
        pc: Column = F.col(f"__prev.{c}")
        if c in fill:
            pc = F.coalesce(pc, F.lit(fill[c]))
        proj.append(pc.alias(prefix + c))
    proj.append(F.col("__prev").isNull().alias(first_flag))
    return agg.filter(F.col("__self").isNotNull()).select(*proj)
