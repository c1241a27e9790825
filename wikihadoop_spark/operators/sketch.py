"""Count-min sketch — bounded-state frequency estimation (Cormode &
Muthukrishnan 2005): a ``depth x width`` integer matrix where every
item increments one counter per row (``row r``'s counter chosen by an
independent hash), and an item's estimate is the MIN over its ``depth``
counters.  Guarantees: never an underestimate (every counter the item
touched counted ALL its occurrences), and with width ``w`` the
overestimate exceeds ``2N/w`` with probability at most ``2^-depth``.

Why an engine with exact aggregation wants one: the exact token-count
aggregate's state is VOCABULARY-sized — fine for natural-language
unigrams, unbounded for URLs, n-grams, user ids, or adversarial text
at 100 TB.  The sketch's state is ``depth*width`` cells REGARDLESS of
vocabulary, its build is one map-side-combined aggregate whose partial
states are the same fixed size, and two corpus sketches MERGE by
cell-wise addition (:func:`cms_merge`) — the shape that lets every
shard/day/source build independently and combine.

Engine-portable by construction: the row hashes are the engine's
md5-based ``hash64`` over a salted token (``"cms{r}#" + token``), so a
SQL oracle replays the sketch — build, probe, and min — bit-for-bit.
Everything is exact integer arithmetic; "approximate" means the
ESTIMATE has bounded error, not that the computation is
nondeterministic.

Plan shape (100 TB): build = row-local explode of ``depth`` (row,
col) cells per token occurrence -> one hash aggregate with at most
``depth*width`` output rows (map-side combine reduces each task's
stream to the same fixed-size partial sketch).  Probe = broadcast the
d*w-cell sketch, join the query tokens' cells, one min-aggregate per
token.  Nothing vocabulary-sized ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash64


def _cms_col(token: Column, row: int, width: int) -> Column:
    """Row ``row``'s counter index for a token: salted 60-bit md5 hash
    mod width (hash64 is non-negative, so plain ``%`` is portable)."""
    return (hash64(F.concat(F.lit(f"cms{row}#"), token)) % width).cast("int")


def _cells(token: Column, depth: int, width: int) -> Column:
    """The ``depth`` (row, col) cells one token occurrence touches."""
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cms_col(token, r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )


def _check(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ValueError(
            f"need depth >= 1 and width >= 2 (got depth={depth}, width={width})"
        )


def count_min_sketch(
    items: DataFrame,
    *,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch over one occurrence per input row: returns at
    most ``depth*width`` rows ``(row, col, cnt)`` (cells never touched
    are absent — probes treat them as 0).  NULL tokens are ignored."""
    _check(depth, width)
    return (
        items.filter(F.col(token_col).isNotNull())
        .select(
            F.explode(_cells(F.col(token_col), depth, width)).alias("cell")
        )
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shaped sketches — the distributive merge
    that lets shards/days/sources sketch independently."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    probes: DataFrame,
    sketch: DataFrame,
    *,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each probe token's count: min over its ``depth`` cells
    (untouched cells read 0).  ``depth``/``width`` must match the
    build — the caller owns that contract.  Appends ``cms_count`` to
    the probe frame's columns, PRESERVING probe cardinality: duplicate
    probe rows (same token and same other columns) each keep their own
    output row — a transient per-row key rides the explode/re-aggregate
    so the fan-out collapses back to exactly the input rows.  A NULL
    probe token gets ``cms_count`` NULL (its cells hash to NULL and can
    never have been counted by the build, which ignores NULLs — a
    silent 0 would misread as "seen zero times with certainty").  The
    sketch (<= d*w rows) is broadcast, so probing never shuffles the
    corpus side.

    Single-lineage assumption: the transient key is
    ``monotonically_increasing_id()``, a non-deterministic expression —
    the explode and the re-aggregate consume it inside ONE lineage
    (assign → fan out → collapse, no recomputation boundary between),
    which is what makes it safe here.  A caller that checkpoints or
    re-executes the exploded intermediate across a retry boundary
    could see ids reassigned; keep the operator's output as the unit
    of reuse (persist THIS frame, not an internal stage) and the
    cardinality contract holds."""
    _check(depth, width)
    keep = [c for c in probes.columns if c != token_col]
    reserved = {"row", "col", "cnt", "cms_count", "__cms_probe_row"}
    if reserved & set(probes.columns):
        raise ValueError(
            "probe columns collide with sketch working names "
            "(row/col/cnt/cms_count/__cms_probe_row)"
        )
    keyed = probes.withColumn("__cms_probe_row", F.monotonically_increasing_id())
    cells = keyed.select(
        "__cms_probe_row",
        token_col,
        *keep,
        F.explode(_cells(F.col(token_col), depth, width)).alias("cell"),
    ).select("__cms_probe_row", token_col, *keep, "cell.row", "cell.col")
    return (
        cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("__cms_probe_row", token_col, *keep)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("__cms_min"))
        .select(
            token_col,
            *keep,
            F.when(
                F.col(token_col).isNotNull(), F.col("__cms_min")
            ).alias("cms_count"),
        )
    )


def heavy_hitters(
    items: DataFrame,
    *,
    token_col: str = "token",
    k: int = 64,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Candidate heavy hitters: distinct tokens whose sketch estimate
    is at least ``total/k`` (integer division, in-plan total).  The
    no-underestimate guarantee makes this a SUPERSET of the true
    ``>= total/k`` tokens — a sketch can only promote, never hide, a
    heavy hitter; the caller exact-counts the (small) candidate set if
    exactness matters.  Returns ``(token, cms_count)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    _check(depth, width)
    sketch = count_min_sketch(
        items, token_col=token_col, depth=depth, width=width
    )
    total = items.filter(F.col(token_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("__cms_total")
    )
    probes = items.filter(F.col(token_col).isNotNull()).select(token_col).distinct()
    est = cms_lookup(
        probes, sketch, token_col=token_col, depth=depth, width=width
    )
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("cms_count") >= F.expr(f"__cms_total div {k}"))
        .select(token_col, "cms_count")
    )
