"""Custom stateful streaming operators via applyInPandasWithState.

The built-in streaming aggregations cover counts/sums/sessions; this
module is the escape hatch for operator state Spark doesn't ship —
here, a per-key running anomaly detector: emit an output row whenever
a key's value deviates more than ``k`` sigma from its running mean
(Welford state carried across micro-batches).

State layout per key: (count, mean, m2) — constant size, so total
state is O(distinct LIVE keys).  With the default
``idle_timeout_ms=None`` the state never expires and total state
grows with lifetime-distinct keys — acceptable for bounded key
domains (user ids of a tenant), a real OOM hazard for unbounded ones
(the 100 TB churning-id shape).  Pass ``idle_timeout_ms`` to arm a
processing-time timeout that EVICTS a key's state after it has seen
no data for that long: the timeout branch removes the state, bounding
retention to the live working set.  Deterministic tests keep the
default (a processing-time timer makes ``processAllAvailable`` wait
out the clock); the eviction branch itself is unit-tested directly.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count long, mean double, m2 double"
OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, zscore double, n_seen long"
)


def make_detector(idle_timeout_ms: int | None = None):
    """Build the applyInPandasWithState function.  With a timeout, the
    timer is re-armed after every batch that carries data for the key;
    a key idle past the timeout hits the ``hasTimedOut`` branch on a
    later micro-batch and its state is removed (bounded retention)."""

    def _detect(
        key: tuple, batches: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            count, mean, m2 = state.get
        else:
            count, mean, m2 = 0, 0.0, 0.0
        rows = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                v = float(r["value"])
                if count >= 5:
                    var = m2 / (count - 1)
                    if var > 0:
                        z = (v - mean) / var**0.5
                        if abs(z) > 3.0:
                            rows.append(
                                (key[0], int(r["event_id"]), v, z, count)
                            )
                # Welford update
                count += 1
                d = v - mean
                mean += d / count
                m2 += d * (v - mean)
        state.update((count, mean, m2))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "value", "zscore", "n_seen"]
            )

    return _detect


#: default-config detector (no idle eviction) — kept as a module-level
#: name so existing imports and tests keep working
_detect = make_detector(None)


def streaming_anomalies(
    events: DataFrame, *, idle_timeout_ms: int | None = None
) -> DataFrame:
    """events stream -> anomaly rows (|z| > 3 vs the key's running
    stats).  State: one (count, mean, m2) triple per user.

    ``idle_timeout_ms=None`` (default): no eviction — state is
    O(lifetime distinct keys); use for bounded key domains and
    deterministic tests.  With a value, a ProcessingTimeTimeout evicts
    keys idle past the duration, bounding state to the live working
    set (the correct setting for unbounded/churning key domains)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_detector(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
