"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, and compares results as order-insensitive
multisets with columns sorted by name — the same contract the driver's
value-hash uses.  Exact equality, including floats: the engine is
designed so compared values are bit-identical (see relational.py
docstring).
"""

from __future__ import annotations

import datetime
import decimal
import math
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


def _norm(v):
    if isinstance(v, decimal.Decimal):
        # value-based (hash(Decimal('3.75')) == hash(Decimal('3.7500')));
        # also record the scale so a textual-scale mismatch is caught —
        # the driver may stringify values before hashing.
        return ("dec", v, -v.as_tuple().exponent)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", v)
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
