"""The bench stdout contract: ONE compact JSON line the driver's bounded
tail capture can always hold (BENCH_r07 recorded "parsed": null when the
r7 dispersion block pushed the single line past the window), with the full
dispersion record in the bench_detail.json sidecar."""

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


def test_compact_line_bounded_and_parseable(tmp_path):
    # exactly the real population: every headline query + the 13 bl_q
    # doc rows — at THIS scale the spread map must survive intact
    timings, disp = _fake(len(bench.HEADLINE) + 13)
    line = bench.emit(timings, disp, 0.1, 12.34,
                      detail_path=str(tmp_path / "d.json"))
    assert "\n" not in line
    assert len(line) <= 2800
    obj = json.loads(line)
    assert obj["metric"] == "headline_queries_total"
    assert set(obj["queries"]) == set(timings)
    assert obj["spread_pct"][next(iter(timings))] == 89
    detail = json.loads((tmp_path / "d.json").read_text())
    assert detail["dispersion"] == disp
    assert "protocol" in detail


def test_spread_dropped_before_line_overflows(tmp_path):
    # even a future doubling of the headline set must not overflow: the
    # spread map is sacrificed first, the per-query mins never are
    timings, disp = _fake(130)
    line = bench.emit(timings, disp, 0.1, 99.9,
                      detail_path=str(tmp_path / "d.json"))
    assert len(line) <= 2800 or "spread_pct" not in json.loads(line)
    obj = json.loads(line)
    assert set(obj["queries"]) == set(timings)
