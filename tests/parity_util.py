"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, and compares results as order-insensitive
multisets with columns sorted by name — the same contract the driver's
value-hash uses.  Exact equality, including floats (bitwise).

Round-1 lesson: the driver's hasher renders values (DuckDB results go
through a pandas path where DECIMAL and HUGEINT become float64, while
Spark keeps exact Decimal/int objects), so equal *values* with
different *renderings* — Decimal('506627.00') vs 506627.0 — still
hash-fail.  This harness therefore additionally REJECTS any output
whose type is not rendering-stable across fetch paths:

- no decimal.Decimal in either engine's result values,
- no DECIMAL / HUGEINT / INT128 column in the DuckDB result type
  (checked via DESCRIBE; e.g. a bare SUM(int) is HUGEINT → float64
  under .df() → renders '1.0' where Spark renders '1'),
- floats compared bitwise (so +0.0 vs -0.0 or last-ulp drift fails
  here rather than at the driver).

Safe output types: BIGINT/INT, DOUBLE (bit-equal by construction),
VARCHAR, BOOLEAN, DATE, TIMESTAMP at µs grain, and lists thereof.
"""

from __future__ import annotations

import datetime
import decimal
import math
import struct
from collections import Counter

import duckdb

from wikihadoop_spark.catalog import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


class UnsafeOutputType(AssertionError):
    """An output value/column type that is not rendering-stable across
    the driver's possible fetch paths (see module docstring)."""


_UNSAFE_DUCK_TYPES = ("DECIMAL", "HUGEINT", "INT128", "UHUGEINT")


def check_duck_output_types(con, oracle_sql: str) -> None:
    """Fail if the oracle result declares a DECIMAL/HUGEINT column —
    those become float64 under pandas fetch and render differently
    from Spark's exact objects."""
    desc = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    for col_name, col_type, *_ in desc:
        up = str(col_type).upper()
        if any(t in up for t in _UNSAFE_DUCK_TYPES):
            raise UnsafeOutputType(
                f"oracle column {col_name!r} has rendering-unsafe type {col_type}; "
                "cast to DOUBLE/BIGINT in the oracle SQL"
            )


def _norm(v):
    if isinstance(v, decimal.Decimal):
        raise UnsafeOutputType(
            f"Decimal value {v!r} in result: decimal outputs are not "
            "rendering-stable — cast to DOUBLE/BIGINT on both sides"
        )
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        # bitwise: distinguishes -0.0 from 0.0 the way a renderer would
        return ("float", struct.pack("<d", v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, list):
        return ("list", tuple(_norm(x) for x in v))
    return (type(v).__name__, v)


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare_query(spark, name: str, query_fn, oracle_sql: str, sf_dir: str):
    """Returns (ok, message)."""
    sdf = query_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    try:
        check_duck_output_types(con, oracle_sql)
        res = con.execute(oracle_sql)
        d_cols = [d[0].lower() for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"

    ms, md = _rows_to_multiset(s_cols, s_rows), _rows_to_multiset(d_cols, d_rows)
    if ms != md:
        only_s = list((ms - md).items())[:3]
        only_d = list((md - ms).items())[:3]
        return False, (
            f"value mismatch ({sum((ms - md).values())} rows differ)\n"
            f"  spark-only sample: {only_s}\n  duck-only sample: {only_d}\n"
            f"  cols(sorted): {sorted(s_cols)}"
        )
    return True, f"ok ({len(s_rows)} rows)"
