"""Streaming windowed aggregations and stateful ops.

Each builder takes a *streaming* DataFrame (``spark.readStream``) with
an event-time column and returns the transformed streaming DataFrame;
``run_stream_to_memory`` drives any of them to completion over a
bounded source for testing (memory sink + processAllAvailable — the
local smoke pattern; production sinks are kafka/parquet/foreachBatch).

Design notes for scale:
- Watermarks bound state: every aggregation here declares one, so the
  state store evicts closed windows instead of growing forever.
- ``session_window`` is the native gap-session operator (state merges
  adjacent sessions); the batch twin is operators/sessionize.py and
  their outputs are cross-checked in tests/test_streaming.py.
- ``dropDuplicates`` with the event-time column in the key is the
  streaming dedup (reference O3's `sort -u` analog, but with
  watermark-bounded state — and therefore weaker semantics for late
  data: see :func:`streaming_dedup` for the precise contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    ts: str = "ts",
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    *,
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Gap-based session windows (native stateful session merging)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    *,
    ts: str = "ts",
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Duplicate-row suppression with watermark-bounded state.

    Semantics, stated precisely (the naive "exactly-once" label
    overclaims on two axes):

    - **Late data is dropped, not deduped**: a row whose event time is
      older than the watermark is FILTERED OUT by streaming
      ``dropDuplicates`` even if it is genuinely new — for rows later
      than ``watermark``, this operator is at-most-once.  Size the
      watermark to the pipeline's real lateness bound, and route
      later-than-watermark data through a batch backfill.
    - **First arrival wins within a key**: two rows sharing
      ``(*keys, ts)`` but differing in payload columns keep whichever
      arrived first, so payload columns of the survivor are
      arrival-order-dependent (unlike the reference's batch
      ``sort -u``, which is deterministic).  Keys should therefore
      identify the payload (event_id does in this schema); dedup on a
      proper subset of the payload identity only when any survivor is
      acceptable."""
    return events.withWatermark(ts, watermark).dropDuplicates([*keys, ts])


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a bounded streaming DataFrame to completion into a memory
    sink; returns the result as a batch DataFrame."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
