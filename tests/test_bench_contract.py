"""bench.py driver-contract test: exactly one JSON line on stdout with
the required keys, at a small scale factor so it stays fast."""

from __future__ import annotations

import pytest

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_prints_one_json_line(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        # contract test verifies output shape, not throughput: small
        # corpus targets, generated under a private dir so a full-size
        # 500/250 MB corpus cached in /dev/shm by a prior real bench
        # run is never reused here (it would run the full pipeline and
        # risk the timeout)
        SPARK_GRAFT_BENCH_BYTES="60000000",
        SPARK_GRAFT_BENCH_MARKUP_BYTES="30000000",
        SPARK_GRAFT_BENCH_DIR=str(tmp_path / "bench_corpora"),
        SPARK_GRAFT_BENCH_SELF=str(tmp_path / "BENCH_SELF.json"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be exactly one JSON line: {lines}"
    d = json.loads(lines[0])
    assert {"metric", "value", "unit", "queries", "sf"} <= set(d)
    assert d["unit"] == "sec" and d["sf"] == 0.001
    assert d["queries"] and all(isinstance(v, float) for v in d["queries"].values())
    assert "wikidump" in d and d["wikidump"]["gb_per_core_hour"] > 0
    assert d["wikidump"]["bz2"]["raw_gb_per_core_hour"] > 0
    assert d["wikidump"]["markup"]["gb_per_core_hour"] > 0
    # durability contract (round-7 verdict): the driver keeps only the
    # LAST 2000 chars of the line, so the headline timings dict must be
    # the final key and the whole line must fit the capture window
    assert list(d)[-1] == "queries", "queries must be the last printed key"
    assert len(lines[0]) <= 2000, (
        f"printed line is {len(lines[0])} chars; the driver's tail "
        "capture keeps 2000 — trim the compact subset"
    )
    # round-12: sf1_spot is what overflowed the capture in r07/r11 (it
    # only exists at sf0.1, which this fast contract run can't reach) —
    # keep it OUT of the printed line structurally; it lives in
    # BENCH_SELF.json, which the `full` key points at
    assert "sf1_spot" not in d, "sf1_spot must stay file-only"
    assert d.get("full") == "BENCH_SELF.json"
    # ... and the FULL result (spreads, pipeline extras) is durable on disk
    full = json.load(open(env["SPARK_GRAFT_BENCH_SELF"]))
    assert set(d["queries"]) == set(full["queries"])
    assert "queries_spread" in full
    assert full["queries"] == d["queries"]


def test_spot_annotation_rule():
    """Round-12 verdict item 5: an sf1 spot entry must carry the
    isolated quiet-host watermark whenever the shipped (min, spread)
    pair is contended OR noisy (spread/min > 0.5), flag or no flag —
    and must stay unannotated for a genuinely clean reading."""
    sys.path.insert(0, REPO)
    from bench import _annotate_spot

    def entry():
        return {"sec": 4.0, "spread_sec": 1.0, "x_vs_sf0.1": 2.0}

    # clean reading, watermark known: no annotation
    clean = _annotate_spot(entry(), 4.0, 1.0, wm=3.5, contended=False)
    assert "contended" not in clean and "isolated_watermark_sec" not in clean
    # noisy but unflagged (spread/min > 0.5): watermark attaches
    noisy = _annotate_spot(entry(), 4.0, 2.5, wm=3.5, contended=False)
    assert "contended" not in noisy
    assert noisy["isolated_watermark_sec"] == 3.5
    # contended: flag + watermark
    flagged = _annotate_spot(entry(), 4.0, 5.0, wm=3.5, contended=True)
    assert flagged["contended"] is True
    assert flagged["isolated_watermark_sec"] == 3.5
    # no watermark recorded yet (new spot query): flag only, no crash
    virgin = _annotate_spot(entry(), 4.0, 5.0, wm=None, contended=True)
    assert virgin["contended"] is True
    assert "isolated_watermark_sec" not in virgin


def test_headline_watermark_annotation_rule():
    """Round-13 verdict item 2: the headline suite total must carry
    its isolated quiet-host watermark whenever it exceeds 1.2x the
    watermark — in BOTH the committed file and the printed line — so a
    stall-inflated driver reading (r13's 10.59 s vs a same-day
    8.27-8.84 s band) self-adjudicates in the artifact.  The `queries`
    key must stay last when present (printed-line tail contract)."""
    sys.path.insert(0, REPO)
    from bench import (
        _HEADLINE_ISOLATED_WATERMARKS,
        _annotate_headline,
    )

    # the watermark for the driver's bench SF must actually be recorded
    assert _HEADLINE_ISOLATED_WATERMARKS.get(0.1), (
        "no isolated headline watermark recorded for sf0.1 — run "
        "tools/spot_isolated.py --headline on a quiet host"
    )

    def entry():
        return {"metric": "headline_suite_seconds", "value": 12.0,
                "queries": {"q1": 1.0}}

    # inside the band: no annotation
    clean = _annotate_headline(entry(), 9.0, wm=8.5)
    assert "headline_isolated_watermark_sec" not in clean
    # beyond 1.2x: watermark attaches, queries stays the LAST key
    hot = _annotate_headline(entry(), 10.6, wm=8.5)
    assert hot["headline_isolated_watermark_sec"] == 8.5
    assert list(hot)[-1] == "queries"
    # no watermark recorded for this sf (e.g. the sf0.001 contract
    # run): no annotation, no crash
    virgin = _annotate_headline(entry(), 100.0, wm=None)
    assert "headline_isolated_watermark_sec" not in virgin


def test_stall_rerun_rule():
    """Round-13 verdict item 6: a headline query whose minimum is
    UNCONFIRMED (no second run within 0.5x of it) gets extra timed
    runs before the min ships.  Confirmation — not total spread — must
    be the condition, because spread only grows as runs append: a
    spread-based loop could never be satisfied by new evidence."""
    sys.path.insert(0, REPO)
    from bench import _STALL_EXTRA_RUNS, _needs_stall_rerun

    assert not _needs_stall_rerun([1.0, 1.1, 1.2])   # quiet pass
    # one stalled run among agreeing minima: min already confirmed,
    # no extra runs wasted
    assert not _needs_stall_rerun([1.0, 1.0, 1.8])
    # r13 ngram case — all three runs in distinct stalls: rerun
    assert _needs_stall_rerun([4.0, 9.1, 16.3])
    # extra evidence CAN end the loop: a confirming run suffices
    assert not _needs_stall_rerun([4.0, 9.1, 16.3, 3.7])
    assert not _needs_stall_rerun([2.0, 3.0, 9.0])   # exactly 0.5: ships
    assert _STALL_EXTRA_RUNS == 2


def test_wikidump_watermark_annotation_rule():
    """Round-14 verdict item 4: the wikidump pipeline rows (plain /
    bz2 / markup) must self-adjudicate like the headline total — a
    contended minimum carries the recorded quiet-host watermark AND
    the GB/core-hour it implies, so the throughput number reads
    without SCALING.md archaeology.  A row measured on a nonstandard
    corpus size must stay unannotated (the watermark was recorded on a
    different corpus)."""
    sys.path.insert(0, REPO)
    from bench import (
        _WIKIDUMP_ISOLATED_WATERMARKS,
        _annotate_wikidump,
    )

    # all three rows must actually have recorded watermarks
    for key in ("plain", "bz2", "markup"):
        wm = _WIKIDUMP_ISOLATED_WATERMARKS.get(key)
        assert wm and wm.get("sec") and wm.get("input_gb"), (
            f"no isolated wikidump watermark recorded for {key!r} — run "
            "tools/spot_isolated.py --wikidump on a quiet host"
        )

    wm = _WIKIDUMP_ISOLATED_WATERMARKS["plain"]
    gb, cpus = wm["input_gb"], 32

    def entry(sec):
        return {"input_gb": gb, "sec": sec, "spread_sec": 0.1,
                "gb_per_core_hour": round(gb / (sec / 3600) / cpus, 2)}

    # inside the band: no annotation
    clean = _annotate_wikidump(entry(wm["sec"] * 1.1), "plain", gb, cpus)
    assert "isolated_watermark_sec" not in clean
    # beyond 1.2x: watermark + implied quiet rate attach
    hot = _annotate_wikidump(entry(wm["sec"] * 1.5), "plain", gb, cpus)
    assert hot["isolated_watermark_sec"] == wm["sec"]
    assert hot["watermark_gb_per_core_hour"] == round(
        gb / (wm["sec"] / 3600) / cpus, 2
    )
    # nonstandard corpus (SPARK_GRAFT_BENCH_BYTES override): silent no-op
    off = _annotate_wikidump(entry(wm["sec"] * 9), "plain", gb * 3, cpus)
    assert "isolated_watermark_sec" not in off
    # unknown row key: no crash, no annotation
    assert "isolated_watermark_sec" not in _annotate_wikidump(
        entry(99.0), "nonesuch", gb, cpus
    )


def test_timed_runs_shared_stall_policy():
    """The wikidump rows time through the same confirmed-min loop as
    the headline queries (_timed_runs): an unconfirmed minimum takes
    extra passes (bounded), a confirmed one stops at 3."""
    sys.path.insert(0, REPO)
    from bench import _STALL_EXTRA_RUNS, _timed_runs

    # quiet host: exactly 3 passes, 3 prewarms
    seq = iter([1.0, 1.05, 1.1])
    calls = {"prewarm": 0}
    out = _timed_runs(lambda: next(seq), lambda: calls.__setitem__(
        "prewarm", calls["prewarm"] + 1))
    assert out == [1.0, 1.05, 1.1] and calls["prewarm"] == 3
    # three distinct stalls: extra passes until a run confirms the min
    seq = iter([4.0, 9.1, 16.3, 3.7])
    out = _timed_runs(lambda: next(seq), lambda: None)
    assert out == [4.0, 9.1, 16.3, 3.7]  # 4th run confirmed: loop ends
    # never more than _STALL_EXTRA_RUNS extras even if nothing confirms
    seq = iter([1.0, 9.0, 25.0, 64.0, 121.0, 999.0])
    out = _timed_runs(lambda: next(seq), lambda: None)
    assert len(out) == 3 + _STALL_EXTRA_RUNS
