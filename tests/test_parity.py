"""Driver-contract replica: every catalog query with an oracle must
match DuckDB exactly at sf0.001 (fast) — the driver runs the same
comparison at sf0.01 (see test_parity_sf001 marker note).

Run a single query:  pytest tests/test_parity.py -k q1_pricing -x -q
"""

from __future__ import annotations

import os

import pytest

from wikihadoop_spark.relational import ORACLE, QUERIES

from parity_util import compare_query

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, name):
    ok, msg = compare_query(spark, name, QUERIES[name], ORACLE[name], SF_DIR)
    assert ok, f"{name}: {msg}"


def test_all_queries_run(spark):
    """Queries without an oracle still must execute and have a schema."""
    for name, fn in QUERIES.items():
        if name in ORACLE:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
