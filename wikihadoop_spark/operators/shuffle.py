"""Deterministic seeded corpus shuffle — the training-order stage.

Trainers consume the curated corpus in pseudo-random order (source
interleaving, no curriculum accidents from ingest order), and the
order must be REPRODUCIBLE: the same seed re-derives the same shard
layout on any cluster, any partition count, any re-run.

Spark's own ``orderBy(rand(seed))`` is NOT that: ``rand`` seeds per
partition, so the order changes with the partition count.  Instead the
order key is a pure row function — the portable 60-bit md5 hash
(operators/dedup.py::hash64) of ``seed:id`` — which (a) is identical
everywhere including DuckDB (the gate oracle replays it), (b) costs
one projection, no extra shuffle beyond the range exchange the
consumer (packing) already performs, and (c) composes with
``pack_token_budget`` as an ordinary numeric order column, inheriting
its distributed-prefix-sum scale path.

Collisions: 60 bits make ties astronomically rare but not impossible
at 10^10 documents; consumers keep the id as a tiebreak so the TOTAL
order — and therefore the packed layout — stays well-defined anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash64


def shuffle_order(seed: int, *cols: Column) -> Column:
    """Portable pseudo-random order key for (seed, cols...).

    DuckDB replay:
    ``('0x' || substr(md5(seed || ':' || col || ...), 1, 15))::BIGINT``
    with the same ``':'`` separators.
    """
    parts = [F.lit(str(int(seed)))] + [c.cast("string") for c in cols]
    return hash64(F.concat_ws(":", *parts))


def shuffle_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    order_name: str = "shuffle_order",
) -> DataFrame:
    """Attach the deterministic shuffle key (one row-local projection;
    actual reordering happens in whatever consumes the key — packing,
    a write sort, a window)."""
    return df.withColumn(order_name, shuffle_order(seed, F.col(id_col)))
