"""Token-budget packing: assign ordered documents to fixed-budget
shards (the training-data step that turns a curated corpus into
bounded-size chunks for tokenization/serialization).

Shard id = floor(exclusive-prefix-sum(n_tokens) / budget) over a
deterministic document order — a pure function of the data, so results
are reproducible across runs, engines, and cluster sizes.

The naive formulation is a running-sum window with a GLOBAL order and
no partition key, which Spark executes in ONE task — a scale-killer.
This operator computes the same prefix sum distributed:

1. range-repartition + sort within partitions on the order key (the
   same machinery a global orderBy uses — data moves once),
2. per-partition token totals (one tiny row per partition) collected
   to the driver — O(partitions), broadcast state, not data,
3. each partition's exclusive offset joined back (broadcast), then a
   per-partition cumulative window (partitionBy spark_partition_id)
   adds local prefix sums to the offset.

The result equals the single-partition window bit-for-bit (prefix sums
don't depend on where partition boundaries land), which the tests pin
by running both and by re-running under different partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_budget(
    df: DataFrame,
    *,
    order_col: str,
    tokens_col: str,
    budget: int,
    num_partitions: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Add ``cum_tokens`` (inclusive prefix sum of ``tokens_col`` in
    ``order_col`` order) and ``shard`` (= (cum_tokens - n) div budget:
    the fixed-budget chunk this document starts in).  Documents larger
    than ``budget`` still land in exactly one shard (they start it and
    overflow it — splitting oversized docs is the tokenizer's job
    downstream).

    Determinism contract: the document order must be a TOTAL order —
    ``order_col`` unique, or ``(order_col, tiebreak_col)`` unique with
    ``tiebreak_col`` given.  With duplicate order keys and no tiebreak
    the prefix sum is partition-count-dependent (the range shuffle may
    split tied keys across partitions and the in-partition tie order is
    arbitrary), which silently breaks the bit-for-bit reproducibility
    this operator promises.  The window uses an explicit ROWS frame:
    Spark's default RANGE frame would make ties peers and assign them
    all the tie-group's total — a different (also order-dependent)
    result."""
    if budget <= 0:
        raise ValueError(f"budget must be positive (got {budget})")
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins ONE physical partitioning: repartitionByRange
    # samples its boundaries per evaluation, and this plan is evaluated
    # twice (partition totals, then the final cumsum) — without the pin
    # the two evaluations can land rows in different partitions and the
    # offsets silently misalign (caught by the sf0.1 parity gate).
    arranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # one tiny row per partition -> exclusive offsets on the driver
    totals = (
        arranged.groupBy("__pid")
        .agg(F.sum(tokens_col).alias("__tot"))
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__tot"]
    # explicit schema: createDataFrame([]) cannot infer types, and an
    # empty input (e.g. a corpus date-partition with no documents) must
    # yield an empty result, not a ValueError
    offset_df = arranged.sparkSession.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "__pid int, __off bigint",
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = arranged.join(F.broadcast(offset_df), "__pid")
    cum = (F.col("__off") + F.sum(tokens_col).over(w)).alias("cum_tokens")
    out = local.select(*df.columns, cum)
    # integer division (no float rounding however large the corpus sum)
    shard = F.expr(f"(cum_tokens - {tokens_col}) div {int(budget)}")
    return out.select(*df.columns, "cum_tokens", shard.alias("shard"))


def write_packed_shards(
    df: DataFrame,
    out_dir: str,
    *,
    order_col: str,
    tokens_col: str,
    budget: int,
    fmt: str = "parquet",
    num_partitions: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Pack ``df`` into fixed-token-budget shards and write ONE file per
    shard under ``out_dir/shard=<id>/`` — the serialization step that
    turns a curated corpus into bounded-size training chunks.

    Plan: after :func:`pack_token_budget` assigns shard ids, a single
    hash repartition on ``shard`` co-locates each shard in exactly one
    task (several shards per task is fine; a shard never straddles
    tasks), and ``partitionBy("shard")`` with rows sorted by
    ``(shard, order_col)`` emits exactly one ordered file per shard.
    Data moves twice total (the range shuffle inside the prefix sum +
    this one), independent of corpus size.

    Sizing at 100 TB: one output directory per shard — pick ``budget``
    so shards land in the 100 MB–1 GB range (≈100k–1M shards at
    100 TB), which both HDFS-style namespaces and object stores
    handle; a million 10-KB shards would be an object-store-metadata
    denial-of-service, and that is a ``budget`` misconfiguration, not
    a plan property.

    Returns the packed DataFrame (with ``cum_tokens``/``shard``) so
    callers can audit shard fill without re-deriving it."""
    packed = pack_token_budget(
        df,
        order_col=order_col,
        tokens_col=tokens_col,
        budget=budget,
        num_partitions=num_partitions,
        tiebreak_col=tiebreak_col,
    )
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    (
        packed.repartition(F.col("shard"))
        .sortWithinPartitions("shard", *order_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(out_dir)
    )
    return packed
