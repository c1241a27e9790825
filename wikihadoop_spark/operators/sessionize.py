"""Gap-based sessionization (batch).

Classic single-window formulation: a session break is a row whose gap
from the previous row exceeds the threshold; the session id is the
running count of breaks.  Two window passes over one shuffle on the
user key — no self-join, no state store (streaming session windows live
in streaming/windows.py via ``session_window``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    key: Sequence[str],
    ts: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a 1-based ``session_col`` per ``key`` group: a new session
    starts when the previous event is more than ``gap_seconds`` older.

    ``ts`` must be a timestamp column; comparison uses epoch
    microseconds so semantics are engine-portable.
    """
    key = list(key)
    micros = F.unix_micros(F.col(ts).cast("timestamp"))
    w = Window.partitionBy(*key).orderBy(F.col(ts), *[F.col(c) for c in order_tiebreak])
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    prev = F.lag(micros).over(w)
    is_break: Column = prev.isNull() | ((micros - prev) > gap_us)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        session_col, F.sum(is_break.cast("int")).over(wrun)
    )
