"""rollup_gapfill (operators/timeseries.py) + deterministic sampling
(llm/sampling.py): golden expectations on tiny frames; the sf0.01 gate
cross-checks the md5 assignment and the dense grid against DuckDB.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jetro_spark.llm.sampling import (
    hash_fraction,
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from jetro_spark.operators.timeseries import rollup_gapfill


@pytest.fixture(scope="module")
def series(spark):
    # numeric axis, width 10: buckets 0,1,3 present; 2 is a gap for "a";
    # "b" only has bucket 0.
    return spark.createDataFrame(
        [("a", 5, 1.0), ("a", 12, 2.0), ("a", 33, 4.0),
         ("b", 7, 10.0)],
        "k string, t long, v double")


def _by_key_bucket(df):
    return {(r["k"], r["bucket"]): r for r in df.collect()}


def test_rollup_gapfill_dense_grid(spark, series):
    out = rollup_gapfill(series, time_col="t", width_us=10, keys=["k"],
                         aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
                         fill={"n": "zero", "s": "locf"})
    rows = _by_key_bucket(out)
    # global span 0..3 → 2 keys x 4 buckets = 8 rows
    assert len(rows) == 8
    assert rows[("a", 2)]["n"] == 0 and rows[("a", 2)]["s"] == 2.0  # locf from b1
    assert rows[("a", 3)]["s"] == 4.0
    assert rows[("b", 0)]["s"] == 10.0
    # "b" has nothing after bucket 0: zero-filled n, locf carries 10.0
    assert rows[("b", 3)]["n"] == 0 and rows[("b", 3)]["s"] == 10.0
    assert rows[("b", 1)]["bucket_start_us"] == 10


def test_rollup_gapfill_null_policy_and_no_keys(spark, series):
    out = rollup_gapfill(series, time_col="t", width_us=10, keys=[],
                         aggs={"s": F.sum("v")})  # default fill: null
    rows = {r["bucket"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[2]["s"] is None
    assert rows[0]["s"] == 11.0  # both keys folded together


def test_rollup_gapfill_rejects_unknown_fill(spark, series):
    with pytest.raises(ValueError):
        rollup_gapfill(series, time_col="t", width_us=10, keys=["k"],
                       aggs={"n": F.count(F.lit(1))}, fill={"nope": "zero"})


def _py_frac(key, seed):
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8], 16) / 16 ** 8


def test_hash_fraction_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "id long")
    got = {r["id"]: r["f"] for r in
           df.select("id", hash_fraction(F.col("id"), 42).alias("f")).collect()}
    for i in range(20):
        assert got[i] == pytest.approx(_py_frac(i, 42), abs=0.0)


def test_hash_split_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    # hash-uniformity at n=1000: loose bounds, deterministic values
    assert 700 < counts["train"] < 880
    assert counts == {r["split"]: r["n"] for r in
                      hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
                      .groupBy("split").agg(F.count("*").alias("n")).collect()}


def test_hash_split_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        hash_split(df, "id", {"a": 0.5, "b": 0.2})


def test_hash_sample_is_subset_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    kept = sorted(r["id"] for r in hash_sample(df, "id", 0.3).collect())
    again = sorted(r["id"] for r in hash_sample(df, "id", 0.3).collect())
    assert kept == again
    assert 100 < len(kept) < 200
    # python-side replay of the rule
    expect = sorted(i for i in range(500) if _py_frac(i, 42) < 0.3)
    assert kept == expect


def test_stratified_sample_respects_per_stratum_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = stratified_hash_sample(df, "id", "lang", {"en": 0.1}, seed=3,
                                 default_fraction=0.9)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] < 100   # ~50 of 500
    assert counts["de"] > 400   # ~450 of 500


def test_rollup_gapfill_grid_guard(spark, series):
    """r10: the densification grid (|keys| x |buckets|) is the
    operator's scale cliff — the guard pre-counts both sides and
    refuses past max_grid_rows with the actual numbers."""
    # series: 2 keys x 4 buckets = 8 grid rows → bound of 7 refuses
    with pytest.raises(ValueError, match=r"2 keys x 4 buckets = 8"):
        rollup_gapfill(series, time_col="t", width_us=10, keys=["k"],
                       aggs={"s": F.sum("v")}, max_grid_rows=7)
    # at the bound (or with the guard disabled) it runs
    out = rollup_gapfill(series, time_col="t", width_us=10, keys=["k"],
                         aggs={"s": F.sum("v")}, max_grid_rows=8)
    assert out.count() == 8
    out2 = rollup_gapfill(series, time_col="t", width_us=10, keys=["k"],
                          aggs={"s": F.sum("v")}, max_grid_rows=None)
    assert out2.count() == 8
