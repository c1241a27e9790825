"""Vanilla-driver simulation: fresh local[8] session, no repo confs.

Replicates the grading driver's __spark_entry__ contract end-to-end:
import the module under a BARE SparkSession (no UTC/Arrow configs the
test session sets), collect entry(), and value-compare two spot
queries against their DuckDB oracles at the driver's gate scale.
Part of the pre-round checklist in README.md; the 50-query gate
replica is tools/gate_rehearsal.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").getOrCreate())
import __spark_entry__ as e

rows = e.entry(spark).collect()
print("entry rows:", len(rows))

import duckdb
qs, osql = e.queries(), e.oracle_sql()
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
for name in ["corpus_report_card", "text_scrub_pii"]:
    sdf = qs[name](spark, SF).toPandas()
    ddf = con.execute(osql[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns), (name, cols, sorted(ddf.columns))
    a = sorted(map(tuple, sdf[cols].astype(str).values.tolist()))
    b = sorted(map(tuple, ddf[cols].astype(str).values.tolist()))
    print(name, "rows", len(a), "match:", a == b)
    assert a == b, name
print("driver-sim OK")
