"""Similarity-search tests: IVF build/search recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikihadoop_spark.catalog import load_table
from wikihadoop_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    ivf_build,
)

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=10)
    tagged, centroids = ivf_build(emb, k=8, iterations=2)
    assert len(centroids) == 8
    approx = cosine_topk_ivf(tagged, centroids, queries, k=10, nprobe=4)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got_sets = {}
    for r in approx.collect():
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # probing half the clusters should recover well over half the true
    # neighbors on this data
    assert mean_recall >= 0.5, recalls


def test_gated_ivf_query_recall_vs_exact(spark):
    """Catalog-level recall: the driver-gated similarity_topk_ivf query
    must recover >= 0.6 of the exact similarity_topk neighbors per
    query on the gate data (the gate's own hash check already proves
    determinism; this pins the quality floor the approximation claims)."""
    from wikihadoop_spark.relational import QUERIES

    exact = QUERIES["similarity_topk"](spark, SF).collect()
    approx = QUERIES["similarity_topk_ivf"](spark, SF).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got_sets: dict = {}
    for r in approx:
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_clusters_partition_corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    tagged, centroids = ivf_build(emb, k=8, iterations=1)
    counts = tagged.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    assert all(0 <= r.cluster < 8 for r in counts)


def test_ivf_build_clamps_k_to_corpus_size(spark):
    """Regression: a corpus with fewer vectors than k crashed with
    IndexError on the first Lloyd iteration; k must clamp to the
    corpus size, and an empty corpus must raise clearly."""
    import pytest

    from wikihadoop_spark.operators.similarity import cosine_topk_ivf, ivf_build

    rows = [(i, [float(i), 1.0 - i / 10.0]) for i in range(5)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    tagged, centroids = ivf_build(corpus, k=16, iterations=2)
    assert len(centroids) == 5
    assert tagged.count() == 5
    out = cosine_topk_ivf(tagged, centroids, corpus, k=2, nprobe=3)
    assert out.count() > 0

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        ivf_build(empty, k=4)


def test_semantic_dedup_composition_keeper_semantics(spark):
    """SemDeDup composition on crafted vectors: two near-identical
    embeddings collapse to one keeper (min id), an orthogonal vector
    stays its own singleton component — the pair stage, the closure,
    and the keeper flag working together on known geometry."""
    from pyspark.sql import functions as F

    from wikihadoop_spark.operators.components import (
        component_summary,
        connected_components,
    )
    from wikihadoop_spark.operators.dedup import capped_block_pairs
    from wikihadoop_spark.operators.similarity import cosine

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, e array<double>")
    # one shared block: at 3 vectors blocking is irrelevant, the test
    # pins the threshold + closure + keeper semantics
    v = emb.withColumn("bkt", F.lit(0))
    pairs = (
        capped_block_pairs(
            v, block_cols=["bkt"], id_col="vec_id", payload_cols=["e"], cap=10
        )
        .withColumn("cosine_sim", cosine(F.col("e_a"), F.col("e_b")))
        .filter(F.col("cosine_sim") >= 0.35)
        .select("id_a", "id_b")
    )
    cc = connected_components(emb.select("vec_id"), pairs, id_col="vec_id")
    out = {
        r["vec_id"]: r for r in component_summary(cc, id_col="vec_id").collect()
    }
    assert out[1]["is_keeper"] and out[1]["n_members"] == 2
    assert not out[2]["is_keeper"] and out[2]["component"] == 1
    assert out[3]["is_keeper"] and out[3]["n_members"] == 1


def test_multiprobe_pairs_recover_family_split_pair(spark):
    """Recall mechanics on known geometry: family A's hyperplane
    splits a near-identical pair (opposite signs on dim 0), family B
    co-buckets it (same sign on dim 1) — one family misses the pair,
    the union finds it exactly once, and an orthogonal vector pairs
    with nobody."""
    from wikihadoop_spark.operators.similarity import multiprobe_pairs

    rows = [
        (1, [0.1, 1.0]),
        (2, [-0.1, 1.0]),   # cosine(1,2) ~ 0.98, split by plane [1,0]
        (3, [1.0, -0.2]),   # near-orthogonal to both
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    fam_a = [[1.0, 0.0]]
    fam_b = [[0.0, 1.0]]

    only_a = multiprobe_pairs(emb, [fam_a], threshold=0.5).collect()
    assert only_a == []  # family A alone misses the near-pair

    both = multiprobe_pairs(emb, [fam_a, fam_b], threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in both] == [(1, 2)]  # found once

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one plane family"):
        multiprobe_pairs(emb, [])
