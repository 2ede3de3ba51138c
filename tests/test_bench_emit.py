"""The bench stdout contract: ONE compact JSON line the driver's bounded
tail capture can always hold. BENCH_r07 AND BENCH_r08 both recorded
"parsed": null — the real tail window measured from those artifacts is
~2,260 bytes, so the line is bounded at bench.LINE_BUDGET (1,800 B) with
tiered fallbacks: full mins map → 3-decimal mins → aggregate-only. The
spread map lives exclusively in the bench_detail.json sidecar."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake(n):
    names = bench.HEADLINE + [f"bl_q{i}" for i in range(1, 14)]
    if n <= len(names):
        # the REAL emit population: actual query names, actual lengths
        names = names[:n]
    else:
        names = (names * (n // len(names) + 1))[:n]
        names = [f"{nm}_{i}" for i, nm in enumerate(names)]
    timings = {nm: round(0.1 + i * 0.001, 4) for i, nm in enumerate(names)}
    disp = {nm: {"min": 0.1, "median": 0.12, "max": 0.19, "spread_pct": 88.7}
            for nm in names}
    return timings, disp


def test_real_population_fits_measured_window(tmp_path):
    # exactly the real population: every headline query + the 13 bl_q
    # doc rows — the line must fit the MEASURED driver tail window with
    # the full per-query mins map intact, and must never carry spreads
    timings, disp = _fake(len(bench.HEADLINE) + 13)
    line = bench.emit(timings, disp, 0.1, 12.34,
                      detail_path=str(tmp_path / "d.json"))
    assert "\n" not in line
    assert len(line) <= bench.LINE_BUDGET
    obj = json.loads(line)
    assert obj["metric"] == "headline_queries_total"
    assert set(obj["queries"]) == set(timings)
    assert "spread_pct" not in obj
    detail = json.loads((tmp_path / "d.json").read_text())
    assert detail["dispersion"] == disp
    assert "protocol" in detail


def test_budget_inside_measured_tail_window():
    # the empirical window from BENCH_r07/r08 is ~2,260 B; the budget
    # must leave real headroom under it, not hope for 2.8 KB again
    assert bench.LINE_BUDGET <= 2000


def test_fallback_line_always_parseable(tmp_path):
    # even a pathological future population must yield SOME parseable
    # line within budget: queries move to the sidecar as the last tier
    timings, disp = _fake(300)
    line = bench.emit(timings, disp, 0.1, 99.9,
                      detail_path=str(tmp_path / "d.json"))
    assert len(line) <= bench.LINE_BUDGET
    obj = json.loads(line)
    assert obj["value"] == 99.9
    assert obj["sf"] == 0.1
    if "queries" not in obj:
        assert obj["queries_in_detail"] is True
        # the sidecar still has the full map
        detail = json.loads((tmp_path / "d.json").read_text())
        assert set(detail["queries"]) == set(timings)


def test_tier2_precision_shave_before_drop(tmp_path):
    # a population that overflows tier 1 but fits at 3 decimals keeps
    # the per-query map (precision is sacrificed before coverage)
    timings, disp = _fake(len(bench.HEADLINE) + 13)
    # inflate every value to a 4-decimal float that shrinks at 3
    timings = {k: 10.1234 for k in timings}
    line = bench.emit(timings, disp, 0.1, 99.9,
                      detail_path=str(tmp_path / "d.json"))
    obj = json.loads(line)
    assert len(line) <= bench.LINE_BUDGET
    if "queries" in obj:
        assert all(v in (10.1234, 10.123) for v in obj["queries"].values())
