"""Corpus data card: exact counts where exact is cheap, sketches where
exact isn't, one pass either way."""

from __future__ import annotations

import pytest

import json
import os
import subprocess
import sys

from wikihadoop_spark.plans.report import corpus_report

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def test_corpus_report_shape_and_consistency(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rep = corpus_report(docs)
    t = rep["total"]
    assert t["docs"] == docs.count()
    assert t["tokens"] > 0 and t["chars"] > 0
    assert 0.0 <= t["quality_keep_rate"] <= 1.0
    assert 0.0 <= t["dup_rate"] < 0.1  # synthetic corpus: ~no exact dups
    assert t["p50_tokens"] <= t["p90_tokens"] <= t["p99_tokens"]
    # groups partition the corpus
    assert sum(g["docs"] for g in rep["groups"].values()) == t["docs"]
    assert sum(g["tokens"] for g in rep["groups"].values()) == t["tokens"]


def test_corpus_report_detects_planted_dups(spark):
    rows = [(i, "identical boilerplate text", "a") for i in range(50)] + [
        (100 + j, f"unique body {j} with words w{j}", "a") for j in range(50)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    rep = corpus_report(docs)
    # 100 docs, ~51 distinct fingerprints -> dup rate ~0.49 (sketch: ±5%)
    assert 0.40 <= rep["total"]["dup_rate"] <= 0.58


def test_corpus_report_is_one_action(spark, monkeypatch):
    """Round-7 verdict: the card must be ONE data pass — previously it
    ran a per-group collect AND a total agg, re-tokenizing the corpus
    twice.  Now the total rides the same rollup aggregate, so exactly
    one action (collect) executes, and the plan carries the rollup
    Expand instead of a second aggregate over per_doc."""
    from wikihadoop_spark.plans.report import report_frame

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    calls = []
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is the
    # abstract base in Spark 4; classic sessions instantiate a subclass
    # that overrides collect)
    cls = type(docs)
    orig = cls.collect

    def spy(self):
        calls.append(self)
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    rep = corpus_report(docs)
    assert len(calls) == 1, "corpus_report must run exactly one action"
    assert rep["total"]["docs"] == docs.count() - 0  # sanity: dict built
    # the single plan is a rollup: physical plan contains the Expand
    # the grouping-sets lowering introduces
    plan = report_frame(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan


@pytest.mark.slow
def test_report_cli_writes_json(tmp_path):
    out = str(tmp_path / "card.json")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, "-m", "wikihadoop_spark", "report",
         "--input", f"{SF}/documents.parquet", "--output", out],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = json.load(open(out))
    assert card["total"]["docs"] > 0 and card["groups"]
