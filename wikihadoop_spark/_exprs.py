"""Column-expression memoization (round-17 optimization).

PySpark Column construction is py4j traffic: every operator, literal,
and lambda in an expression tree is a JVM round trip at PLAN BUILD
time.  For the expression-heavy operators (16-permutation MinHash
signatures, LSH band structs, hyperplane-bucket folds) that adds up to
~0.5-3 s of pure driver latency per query BUILD — paid again on every
invocation, dwarfing the executor time at bench scale and still pure
overhead at 100 TB scale.

Unresolved Column objects are immutable expression ASTs; reusing one
across DataFrames/plans is ordinary PySpark practice (``c = F.col("x")
+ 1`` used on many frames).  This module memoizes *construction*: the
first build of an expression family pays the py4j cost, every later
query build reuses the identical AST.  Plans, values, and results are
bit-identical — only the Python-side construction cost changes.

Cache keys incorporate the live SparkContext's id: literals hold JVM
object references through the active gateway, so a restarted context
(fresh JVM) must rebuild rather than reuse stale handles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_CACHE: dict[tuple, Any] = {}


def _ctx_id() -> tuple:
    # stable context identity (round-18 ADVICE): id(sc) can be REUSED
    # by CPython after a stopped context is garbage-collected, which
    # would serve memoized Columns holding JVM references through the
    # dead gateway.  (applicationId, startTime) is unique per JVM
    # context lifetime.
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return ("none",)
    # the identity lookup is itself 2 py4j round trips — memoize it ON
    # the context object (the attribute dies with the object, and a
    # recycled id() belongs to a NEW object without the attribute)
    ident = getattr(sc, "_wikihadoop_ctx_ident", None)
    if ident is None:
        ident = (sc.applicationId, sc.startTime)
        sc._wikihadoop_ctx_ident = ident
    return ident


def cached_exprs(key: tuple, builder: Callable[[], Any]) -> Any:
    """Memoize ``builder()`` (a Column or list/tuple of Columns) under
    ``key`` for the lifetime of the active SparkContext."""
    full = (_ctx_id(), *key)
    val = _CACHE.get(full)
    if val is None:
        val = builder()
        _CACHE[full] = val
        # drop entries from dead contexts so the dict stays bounded
        live = full[0]
        for stale in [k for k in _CACHE if k[0] != live]:
            del _CACHE[stale]
    return val
