"""Gap-based sessionization (batch).

Classic single-window formulation: a session break is a row whose gap
from the previous row exceeds the threshold; the session id is the
running count of breaks.  Two window passes over one shuffle on the
user key — no self-join, no state store (streaming session windows live
in streaming/windows.py via ``session_window``).

HOT-KEY CONTRACT (round-15 verdict item 4, shared with the funnel's
window shape): ``Window.partitionBy(key)`` sorts and buffers one key's
entire event set in a single task.  WindowExec SPILLS rather than
OOMs, so a bot user holding ~all events completes correctly but
serializes in one task — the edge drill in
tests/test_operators_edge.py proves completion and correctness with
one user owning ~99% of the sf0.01 events.  Sessionization is
inherently an ordered per-key scan (each row's session id depends on
every earlier gap), so unlike the funnel's conditional minima there
is no aggregate-only two-phase rewrite; if a corpus carries
adversarial key skew, pre-split the key on a coarse time bucket and
stitch sessions across bucket boundaries — a documented trade, not a
default, because the stitch join costs more than the spill for every
observed distribution.
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
