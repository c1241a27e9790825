"""Job counters / observed metrics (reference operators A1-A3).

The reference counts FOUND_PAGES / WRITTEN_PAGES / WRITTEN_REVISIONS /
SKIPPED_PAGES through Hadoop counters
(StreamWikiDumpInputFormat.java:589-591) and a stderr protocol from the
streaming mapper (revision_differ.py:166).  Spark-first, the same
surface is ``df.observe`` + ``pyspark.sql.Observation``: metrics ride
the existing action (no extra job), aggregate across tasks like
accumulators, and are exact for counts.  Progress (A3) is the Spark UI
/ task metrics — free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_counts(
    df: DataFrame, **named_conditions
) -> tuple[DataFrame, Observation]:
    """Attach counter metrics to a DataFrame without an extra pass.

    ``named_conditions`` maps counter name -> boolean Column (or None
    for a plain row count).  After any action on the returned
    DataFrame, ``observation.get`` yields the counts.

        df, obs = observed_counts(rows, total=None,
                                  skipped=F.col("ns") != 0)
        df.write...   # runs the job
        obs.get       # {'total': ..., 'skipped': ...}
    """
    obs = Observation()
    metrics = []
    for name, cond in named_conditions.items():
        if cond is None:
            metrics.append(F.count(F.lit(1)).alias(name))
        else:
            metrics.append(F.sum(cond.cast("long")).alias(name))
    if not metrics:
        metrics = [F.count(F.lit(1)).alias("rows")]
    return df.observe(obs, *metrics), obs


def read_counter(obs: Observation, default: int | None = None) -> int:
    """Read an Observation's single metric, tolerating AQE
    empty-relation pruning.

    When an observed branch feeds a join whose other side turns out
    EMPTY, adaptive execution replaces the join with an empty relation
    and prunes the branch — the execution still completes, so the
    Observation resolves with an EMPTY row and ``obs.get`` raises
    (Py4J ``toPyRow`` assertion) instead of blocking.  For counters
    whose branch is only ever pruned when the true answer is zero
    (e.g. a dropped-members count attached to a bucket frame that was
    empty), pass ``default=0``; with ``default=None`` the read
    re-raises, because a poisoned stage-count is a real bug.

    Only the SPECIFIC empty-row failure maps to ``default`` — the
    pruned row surfaces as a Py4J ``AssertionError`` from ``toPyRow``
    (shape verified in tests), or ``StopIteration`` on an empty metric
    dict.  Anything else (connection loss, interrupted job) re-raises
    regardless: reporting an unrelated failure as "0 dropped members"
    would silently hide it."""
    try:
        return int(next(iter(obs.get.values())))
    except StopIteration:
        if default is None:
            raise
        return default
    except Exception as exc:
        # match by class NAME + message, not an import: importing py4j
        # inside the handler would itself raise on distributions that
        # ship without it (pyspark-connect), masking the real error
        pruned_row = type(exc).__name__ == "Py4JJavaError" and (
            "toPyRow" in str(exc) and "AssertionError" in str(exc)
        )
        if default is None or not pruned_row:
            raise
        return default
