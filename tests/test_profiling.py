"""Profiling operators (operators/profiling.py): discrete quantiles,
clamped histogram, per-column profile — golden expectations on tiny
frames; sf0.01 oracle rows cross-check against DuckDB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetro_spark.operators.profiling import group_quantiles, histogram, profile_table


@pytest.fixture(scope="module")
def vals(spark):
    rows = [("a", float(v)) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
    rows += [("b", 5.0), ("b", None), ("b", 15.0)]
    return spark.createDataFrame(rows, "k string, v double")


def test_group_quantiles_discrete_definition(vals):
    out = {r["k"]: r for r in
           group_quantiles(vals, "v", [0.0, 0.5, 1.0], keys=["k"]).collect()}
    # group a: n=10, sorted 10..100; q0=pos 0 → 10; q50=floor(9*.5)=4 → 50;
    # q100=pos 9 → 100
    assert (out["a"]["q0"], out["a"]["q50"], out["a"]["q100"]) == (10.0, 50.0, 100.0)
    # group b: null excluded → n=2 → q50 = pos 0 → 5.0
    assert (out["b"]["q0"], out["b"]["q50"], out["b"]["q100"]) == (5.0, 5.0, 15.0)


def test_group_quantiles_global(vals):
    out = group_quantiles(vals.filter(F.col("k") == "a"), "v", [0.25]).collect()
    assert len(out) == 1 and out[0]["q25"] == 30.0  # floor(9*.25)=2 → 30


def test_histogram_clamps_edges(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (99.0,), (None,)], "v double")
    out = {r["bin"]: (r["lo_edge"], r["hi_edge"], r["n"]) for r in
           histogram(df, "v", lo=0.0, hi=30.0, bins=3).collect()}
    # -5 clamps into bin 0; 99 clamps into bin 2; null dropped
    assert out[0] == (0.0, 10.0, 3)   # -5, 0, 9.9
    assert out[1] == (10.0, 20.0, 1)  # 10
    assert out[2] == (20.0, 30.0, 2)  # 25, 99 (clamped)


def test_histogram_validates(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        histogram(df, "v", lo=5.0, hi=5.0, bins=3)


def test_profile_table_long_format(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "id long, s string")
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert out["id"]["n"] == 3 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 2
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["id"]["min_str"] == "1" and out["id"]["max_str"] == "2"


def test_profile_table_approx_mode(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(1000)], "id long")
    out = profile_table(df, approx=True).collect()[0]
    assert 8 <= out["n_distinct"] <= 12  # HLL estimate of 10


def test_key_skew_shares(spark):
    from jetro_spark.operators.profiling import key_skew
    df = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "k string")
    out = [(r["key"], r["n"], r["share"]) for r in key_skew(df, "k").collect()]
    assert out == [("a", 8, 0.8), ("b", 2, 0.2)]


def test_sessionize_gaps_and_islands(spark):
    from jetro_spark.operators.timeseries import sessionize
    rows = [(1, "u", 0), (2, "u", 100), (3, "u", 2000), (4, "u", 2050),
            (5, "v", 0)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts long")
    out = {r["event_id"]: r["session_seq"] for r in
           sessionize(df, time_col="ts", gap_us=500, keys=["user_id"],
                      tiebreak="event_id").collect()}
    # u: gap 0→100 fine (session 0), 100→2000 breaks (session 1), 2050 joins
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_sessionize_matches_session_window_count(spark, tables):
    from jetro_spark.operators.timeseries import sessionize
    from jetro_spark.streaming import session_windowed
    ev = tables["events"]
    s = sessionize(ev, time_col="ts", gap_us=15 * 60 * 1_000_000,
                   keys=["user_id"], tiebreak="event_id")
    n_sessions = (s.select("user_id", "session_seq").distinct().count())
    agg = session_windowed(ev, "15 minutes", keys=["user_id"]).count()
    # same definition, two constructions: event-grain islands vs
    # session_window aggregate must find the same session count
    assert n_sessions == agg


def test_check_constraints(spark):
    from jetro_spark.operators.profiling import check_constraints
    df = spark.createDataFrame(
        [(1, 5.0), (1, -2.0), (2, None), (3, 9.0), (3, 1.0)],
        "k long, v double")
    out = {r["constraint"]: r["n_violations"] for r in check_constraints(
        df,
        {"v_positive": F.col("v") > 0, "k_small": F.col("k") < 10},
        unique=[["k"]],
    ).collect()}
    # null v counts as a violation (unevaluable != passing)
    assert out == {"v_positive": 2, "k_small": 0, "unique(k)": 2}


def test_group_quantiles_spread_matches_window_path(spark):
    """Keyed distributed prefix (low-cardinality scale path) must give
    byte-identical quantiles to the per-key window default."""
    from pyspark.sql import functions as F
    from jetro_spark.operators.profiling import group_quantiles

    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 37) % 1001).cast("double").alias("v"))
    a = group_quantiles(df, "v", [0.1, 0.5, 0.9], keys=["g"])
    b = group_quantiles(df, "v", [0.1, 0.5, 0.9], keys=["g"],
                        spread_keys=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_keyed_distributed_prefix_rank(spark):
    from pyspark.sql import functions as F
    from jetro_spark.operators.prefix import distributed_prefix

    df = spark.range(0, 1000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v"))
    out = distributed_prefix(df, ["v"], F.lit(1), keys=["g"],
                             out="rn", total="n")
    rows = out.collect()
    assert all(r["n"] == 500 for r in rows)
    for g in (0, 1):
        grp = sorted((r["v"], r["rn"]) for r in rows if r["g"] == g)
        assert [rn for _, rn in grp] == list(range(500))


def test_keyed_prefix_cardinality_guard(spark):
    """max_key_groups bounds the spread plan's offset broadcast: above
    the threshold the keyed prefix must fall back to the plain per-key
    window (no __pid/offset join in the plan), below it keep the spread
    plan — with identical values in both regimes."""
    from pyspark.sql import functions as F
    from jetro_spark.operators.prefix import distributed_prefix

    df = spark.range(0, 2000).select(
        (F.col("id") % 200).alias("g"), F.col("id").alias("v"))

    spread = distributed_prefix(df, ["v"], F.lit(1), keys=["g"], out="rn",
                                total="n", max_key_groups=None)
    guarded = distributed_prefix(df, ["v"], F.lit(1), keys=["g"], out="rn",
                                 total="n", max_key_groups=50)
    # 200 keys > 50 → plain window plan: no range-partition/offset join
    plan = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert "__pid" not in plan
    assert "__pid" in spread._jdf.queryExecution().optimizedPlan().toString()
    assert (sorted(map(tuple, spread.collect()))
            == sorted(map(tuple, guarded.collect())))
    # below the threshold the probe keeps the spread plan
    low = distributed_prefix(df, ["v"], F.lit(1), keys=["g"], out="rn",
                             max_key_groups=4096)
    assert "__pid" in low._jdf.queryExecution().optimizedPlan().toString()
    # a caller-supplied cardinality hint replaces the eager probe and
    # picks the same plans (lazy: no job at construction time)
    hinted_hi = distributed_prefix(df, ["v"], F.lit(1), keys=["g"],
                                   out="rn", max_key_groups=50,
                                   key_cardinality=200)
    hinted_lo = distributed_prefix(df, ["v"], F.lit(1), keys=["g"],
                                   out="rn", max_key_groups=4096,
                                   key_cardinality=200)
    assert "__pid" not in \
        hinted_hi._jdf.queryExecution().optimizedPlan().toString()
    assert "__pid" in \
        hinted_lo._jdf.queryExecution().optimizedPlan().toString()


def test_keyed_distributed_prefix_keeps_null_key_groups(spark):
    """Null keys must survive the offset/total joins (null-safe
    equality) — the quantile contract says spread_keys only changes
    the PLAN."""
    from pyspark.sql import functions as F
    from jetro_spark.operators.profiling import group_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("a", 3.0), (None, 4.0), (None, 6.0)],
        "g string, v double")
    a = group_quantiles(df, "v", [0.5], keys=["g"])
    b = group_quantiles(df, "v", [0.5], keys=["g"], spread_keys=True)
    sa = sorted(map(tuple, a.collect()), key=str)
    sb = sorted(map(tuple, b.collect()), key=str)
    assert sa == sb and len(sa) == 2
