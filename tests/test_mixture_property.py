"""Property tests for mixture threshold math (driver-side, no Spark)."""

from __future__ import annotations
from hypothesis import given, settings, strategies as st

from wikihadoop_spark.operators.mixture import SCALE, mixture_report, mixture_thresholds

groups = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=3),
    st.integers(min_value=0, max_value=10**15),
    min_size=1,
    max_size=8,
)
weights_vals = st.integers(min_value=1, max_value=100)


@settings(max_examples=300, deadline=None)
@given(totals=groups, budget=st.integers(min_value=0, max_value=10**16), w=weights_vals)
def test_thresholds_bounded_and_expected_kept_within_budget(totals, budget, w):
    wt = {g: w for g in totals}
    thr = mixture_thresholds(totals, wt, budget)
    assert all(0 <= t <= SCALE for t in thr.values())
    rep = mixture_report(totals, wt, budget)
    # floor rounding only ever under-fills: expected kept never exceeds
    # the budget unless a capped group's own supply is under its target
    uncapped_expected = sum(
        g["expected_kept"] for g in rep["groups"].values() if not g["capped"]
    )
    capped_expected = sum(
        g["expected_kept"] for g in rep["groups"].values() if g["capped"]
    )
    capped_target = sum(
        g["target"] for g in rep["groups"].values() if g["capped"]
    )
    assert uncapped_expected + capped_expected <= budget + len(rep["groups"]) or \
        capped_expected <= capped_target


@settings(max_examples=300, deadline=None)
@given(totals=groups, budget=st.integers(min_value=0, max_value=10**16))
def test_threshold_monotone_in_weight(totals, budget):
    gs = sorted(totals)
    g0 = gs[0]
    lo = mixture_thresholds(totals, {g: 1 for g in gs}, budget)
    hi = mixture_thresholds(totals, {**{g: 1 for g in gs}, g0: 5}, budget)
    # raising one group's weight never lowers ITS threshold
    assert hi[g0] >= lo[g0]
    # and never raises anyone else's
    assert all(hi[g] <= lo[g] for g in gs[1:])


@settings(max_examples=300, deadline=None)
@given(totals=groups, budget=st.integers(min_value=0, max_value=10**16), w=weights_vals)
def test_waterfill_dominates_single_pass_and_respects_budget(totals, budget, w):
    from wikihadoop_spark.operators.mixture import mixture_thresholds_waterfill

    wt = {g: w for g in totals}
    sp = mixture_thresholds(totals, wt, budget)
    wf = mixture_thresholds_waterfill(totals, wt, budget)
    # water-filling only ever keeps MORE, never less
    assert all(wf[g] >= sp[g] for g in totals)
    assert all(0 <= t <= SCALE for t in wf.values())
    # expected kept tokens stay within the budget (floor slack only),
    # except the degenerate all-capped case bounded by total supply
    expected = sum(a * wf[g] // SCALE for g, a in totals.items())
    assert expected <= max(budget, 0) or all(t == SCALE for t in wf.values() if t)
    # a budget covering the whole supply keeps everything
    full = mixture_thresholds_waterfill(totals, wt, sum(totals.values()))
    assert all(full[g] == SCALE for g, a in totals.items() if a > 0)


def test_waterfill_zero_weight_groups_after_all_positive_cap():
    """Regression: when every positive-weight group caps and only
    weight-0 groups ('exclude this source') stay active, waterfill
    previously divided by zero; the excluded groups must get threshold
    0 — same as the single-pass formula."""
    from wikihadoop_spark.operators.mixture import (
        SCALE,
        mixture_thresholds,
        mixture_thresholds_waterfill,
    )

    totals = {"a": 4, "b": 10}
    weights = {"a": 1, "b": 0}
    wf = mixture_thresholds_waterfill(totals, weights, 5)
    assert wf == {"a": SCALE, "b": 0}
    sp = mixture_thresholds(totals, weights, 5)
    assert wf["b"] == sp["b"] == 0
