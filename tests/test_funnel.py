"""operators/timeseries.py funnel (r8): ordered conversion funnel.
Exact parity vs DuckDB is the funnel gate row (independent CTE-chain
derivation); here: step-order semantics, the within window, chain
nulling, and the single-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetro_spark.operators.timeseries import funnel


def _ev(spark, rows):
    # rows: (user, type, us)
    return spark.createDataFrame(
        [(u, t, us) for u, t, us in rows],
        "user_id long, event_type string, ts long")


def test_funnel_orders_and_nulls_forward(spark):
    ev = _ev(spark, [
        (1, "view", 100), (1, "click", 200), (1, "buy", 300),   # full
        (2, "click", 100), (2, "view", 200), (2, "buy", 300),   # click BEFORE view: step2 unmatched until after view? click@100 < view@200 -> no click after t0
        (3, "view", 100),                                       # view only
        (4, "buy", 50),                                         # never step0
    ])
    out = {r["user_id"]: r
           for r in funnel(ev, ["view", "click", "buy"]).collect()}
    assert out[1]["steps_completed"] == 3
    assert (out[1]["t0"], out[1]["t1"], out[1]["t2"]) == (100, 200, 300)
    # user 2: t0=200 (view), no click AFTER 200 -> chain stops at 1
    # even though a buy exists later (t1 null => t2 null)
    assert out[2]["steps_completed"] == 1
    assert out[2]["t1"] is None and out[2]["t2"] is None
    assert out[3]["steps_completed"] == 1
    assert out[4]["steps_completed"] == 0 and out[4]["t0"] is None


def test_funnel_strictly_after_and_earliest_match(spark):
    ev = _ev(spark, [
        (1, "view", 100), (1, "click", 100),   # same instant: NOT after
        (1, "click", 150), (1, "click", 120),  # earliest AFTER wins: 120
    ])
    out = funnel(ev, ["view", "click"]).collect()[0]
    assert out["t1"] == 120


def test_funnel_within_window(spark):
    ev = _ev(spark, [
        (1, "view", 100), (1, "click", 250),          # outside within=100
        (2, "view", 100), (2, "click", 180),          # inside
    ])
    out = {r["user_id"]: r
           for r in funnel(ev, ["view", "click"], within_us=100).collect()}
    assert out[1]["steps_completed"] == 1
    assert out[2]["steps_completed"] == 2 and out[2]["t1"] == 180


def test_funnel_validations_and_plan(spark):
    ev = _ev(spark, [(1, "view", 1), (1, "click", 2)])
    with pytest.raises(ValueError):
        funnel(ev, ["view"])
    plan = (funnel(ev, ["view", "click"])
            ._jdf.queryExecution().executedPlan().toString())
    # one groupBy exchange; no joins, no windows
    assert "Join" not in plan and "Window" not in plan
