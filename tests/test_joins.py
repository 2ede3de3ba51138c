"""Extended join surface (operators/joins.py): as-of, range, left/semi/anti.

Golden expectations are computed by hand on tiny frames (the reference
has no as-of/range joins — these are the documented Spark-native
extensions, SURVEY.md §7.2 M4); the sf0.01 oracle gate cross-checks
against DuckDB's native ASOF JOIN / IEJoin at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetro_spark.operators.joins import (
    anti_join,
    asof_join,
    left_join,
    range_join,
    semi_join,
)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("A", 35, 102.0),
         ("B", 15, 50.0), ("C", 5, 7.0)],
        "sym string, t long, px double")


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", 8, 99.5), ("A", 20, 100.5), ("A", 30, 101.5),
         ("B", 40, 49.0)],
        "sym string, t long, bid double")


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_backward_inclusive(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_time="t", right_time="t")
    # A@10→quote@8; A@20→quote@20 (inclusive); A@35→quote@30;
    # B@15→none (quote@40 is after) dropped by inner; C→no quotes.
    assert _rows(out, "sym", "t", "r_t", "r_bid") == [
        ("A", 10, 8, 99.5), ("A", 20, 20, 100.5), ("A", 35, 30, 101.5)]


def test_asof_left_keeps_unmatched(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_time="t", right_time="t",
                    how="left")
    assert _rows(out, "sym", "t", "r_t") == [
        ("A", 10, 8), ("A", 20, 20), ("A", 35, 30),
        ("B", 15, None), ("C", 5, None)]


def test_asof_forward(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_time="t", right_time="t",
                    direction="forward")
    # A@10→quote@20; A@20→quote@20 (inclusive); A@35→none; B@15→quote@40.
    assert _rows(out, "sym", "t", "r_t") == [
        ("A", 10, 20), ("A", 20, 20), ("B", 15, 40)]


def test_asof_nearest_tie_backward(spark, quotes):
    left = quotes.sparkSession.createDataFrame(
        [("A", 25)], "sym string, t long")
    out = asof_join(left, quotes, on=["sym"], left_time="t", right_time="t",
                    direction="nearest")
    # 25 is equidistant from quotes at 20 and 30 → tie goes backward (20).
    assert _rows(out, "sym", "t", "r_t") == [("A", 25, 20)]


def test_asof_right_tiebreak_min_wins(spark):
    """Duplicate right (on, time) rows: right_tiebreak resolves to the
    MINIMUM tiebreak value, equivalent to pre-deduping the right side
    with groupBy + min/min_by but without the extra shuffle — in every
    direction, and regardless of input partition order."""
    left = spark.createDataFrame(
        [("A", 20), ("A", 25)], "sym string, t long")
    right = spark.createDataFrame(
        [("A", 20, 7, 1.7), ("A", 20, 3, 1.3), ("A", 20, 9, 1.9),
         ("A", 30, 5, 2.5), ("A", 30, 2, 2.2)],
        "sym string, t long, eid long, v double").repartition(5)
    back = asof_join(left, right, on=["sym"], left_time="t",
                     right_time="t", right_tiebreak="eid")
    assert _rows(back, "sym", "t", "r_eid", "r_v") == [
        ("A", 20, 3, 1.3), ("A", 25, 3, 1.3)]
    fwd = asof_join(left, right, on=["sym"], left_time="t",
                    right_time="t", direction="forward",
                    right_tiebreak="eid")
    assert _rows(fwd, "sym", "t", "r_eid", "r_v") == [
        ("A", 20, 3, 1.3), ("A", 25, 2, 2.2)]
    near = asof_join(left, right, on=["sym"], left_time="t",
                     right_time="t", direction="nearest",
                     right_tiebreak="eid")
    assert _rows(near, "sym", "t", "r_eid", "r_v") == [
        ("A", 20, 3, 1.3), ("A", 25, 3, 1.3)]


def test_asof_tolerance(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_time="t", right_time="t",
                    tolerance=2)
    # gaps: A@10→2 (keep), A@20→0 (keep), A@35→5 (drop).
    assert _rows(out, "sym", "t", "r_t") == [("A", 10, 8), ("A", 20, 20)]


def test_asof_timestamp_axis(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:30")],
        "id long, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, "2024-01-01 10:00:00"), (8, "2024-01-01 10:00:31")],
        "rid long, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(left, right, on=[], left_time="ts", right_time="ts",
                    tolerance=F.expr("INTERVAL 45 SECONDS"))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["r_rid"] == 7
    # tolerance tighter than the 30 s gap → dropped
    out2 = asof_join(left, right, on=[], left_time="ts", right_time="ts",
                     tolerance=F.expr("INTERVAL 10 SECONDS"))
    assert out2.count() == 0


def test_asof_no_on_keys(spark, trades, quotes):
    # Global (keyless) as-of: every trade against the one quote stream.
    q = quotes.filter(F.col("sym") == "A").drop("sym")
    t = trades.filter(F.col("sym") == "A").drop("sym")
    out = asof_join(t, q, on=[], left_time="t", right_time="t")
    assert _rows(out, "t", "r_t") == [(10, 8), (20, 20), (35, 30)]


def test_range_join_half_open(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 19), (4, 20), (5, 250)], "pid long, p long")
    ivals = spark.createDataFrame(
        [(100, 10, 20), (200, 0, 6), (300, 240, 260), (400, 50, 50)],
        "iid long, s long, e long")
    out = range_join(pts, ivals, point="p", start="s", end="e", bin_width=8)
    # half-open: p=10 in [10,20); p=20 NOT in [10,20); p=5 in [0,6);
    # empty interval [50,50) matches nothing.
    assert _rows(out, "pid", "iid") == [(1, 200), (2, 100), (3, 100), (5, 300)]


def test_range_join_with_keys_and_bin_width_1(spark):
    pts = spark.createDataFrame([("u", 5), ("v", 5)], "k string, p long")
    ivals = spark.createDataFrame([("u", 0, 10), ("v", 6, 10)],
                                  "k string, s long, e long")
    out = range_join(pts, ivals, point="p", start="s", end="e",
                     on=["k"], bin_width=1)
    assert _rows(out, "k", "p", "s") == [("u", 5, 0)]


def test_range_join_timestamp_axis(spark):
    pts = spark.createDataFrame([(1, "2024-01-02 00:00:00")],
                                "pid long, p string") \
        .withColumn("p", F.col("p").cast("timestamp"))
    ivals = spark.createDataFrame(
        [(9, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
         (10, "2024-01-02 00:00:01", "2024-01-04 00:00:00")],
        "iid long, s string, e string") \
        .withColumn("s", F.col("s").cast("timestamp")) \
        .withColumn("e", F.col("e").cast("timestamp"))
    from jetro_spark.operators.joins import DAY_US
    out = range_join(pts, ivals, point="p", start="s", end="e",
                     bin_width=DAY_US)
    assert _rows(out, "pid", "iid") == [(1, 9)]


def test_left_semi_anti(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                 "k long, lv string")
    right = spark.createDataFrame([(1, "X"), (1, "Y"), (3, "Z")],
                                  "k long, rv string")
    lj = left_join(left, right.withColumnRenamed("k", "rk"), "k", "rk")
    # unmatched k=2 keeps left fields, right nulls; k=1 fans out ×2
    assert _rows(lj, "k", "lv", "rv") == [
        (1, "a", "X"), (1, "a", "Y"), (2, "b", None), (3, "c", "Z")]
    assert _rows(semi_join(left, right, "k", "k"), "k") == [(1,), (3,)]
    assert _rows(anti_join(left, right, "k", "k"), "k") == [(2,)]


def test_left_join_right_wins_on_collision(spark):
    left = spark.createDataFrame([(1, "keep", "loser")], "k long, a string, v string")
    right = spark.createDataFrame([(1, "winner")], "rk long, v string")
    out = left_join(left, right, "k", "rk")
    r = out.collect()[0]
    assert (r["a"], r["v"]) == ("keep", "winner")
    assert "k" in out.columns and "rk" in out.columns


def test_salted_join_equals_equi_join(spark):
    from jetro_spark.operators.joins import salted_join
    from jetro_spark.operators import equi_join
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d")] * 5, "k long, lv string")
    right = spark.createDataFrame([(1, "X"), (3, "Y")], "rk long, rv string")
    cols = ["k", "lv", "rv"]
    plain = sorted(tuple(r) for r in
                   equi_join(left, right.withColumnRenamed("rk", "k"),
                             "k", "k").select(*cols).collect())
    salted = sorted(tuple(r) for r in
                    salted_join(left, right, "k", "rk", salt=4)
                    .select(*cols).collect())
    # salting changes only physical distribution, never the answer:
    # full multiset equality on identically-selected columns (a mere
    # row-count check would let a column-merge bug through); null keys
    # drop in both (inner semantics)
    assert salted == plain
    assert len(salted) == 10 and {t[-1] for t in salted} == {"X"}
