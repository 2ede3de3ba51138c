"""Bucketed tables (operators/bucketing): pre-shuffled layout so
repeated joins on the bucket key plan with NO Exchange on either side.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from jetro_spark.operators.bucketing import (
    assert_no_shuffle,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    d = tempfile.mkdtemp(prefix="jetro_buckets_")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_id"),
        (F.col("id") % 97).alias("cust"),
        (F.col("id") * 3 % 1000).cast("double").alias("amount"))
    cust = spark.range(0, 97).select(
        F.col("id").alias("cust"),
        F.concat(F.lit("c"), F.col("id")).alias("name"))
    write_bucketed(orders, "b_orders", ["cust"], 8,
                   path=os.path.join(d, "orders"))
    write_bucketed(cust, "b_cust", ["cust"], 8,
                   path=os.path.join(d, "cust"))
    yield "b_orders", "b_cust"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    lt, rt = bucketed_pair
    # disable auto-broadcast so the test proves BUCKETS removed the
    # shuffle, not a broadcast of the small side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, ["cust"])
        assert_no_shuffle(j)
        assert j.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_no_shuffle(spark, bucketed_pair):
    lt, _ = bucketed_pair
    g = (spark.table(lt).groupBy("cust")
         .agg(F.sum("amount").alias("total")))
    assert_no_shuffle(g)
    assert g.count() == 97


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    lt, rt = bucketed_pair
    j = bucketed_join(spark, lt, rt, ["cust"]).select("o_id", "name")
    plain = (spark.table(lt).join(spark.table(rt), "cust")
             .select("o_id", "name"))
    assert sorted(map(tuple, j.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_mismatched_bucket_counts_still_correct(spark, bucketed_pair, tmp_path):
    """A 2x bucket-count mismatch falls back to shuffling one side —
    correct, just not shuffle-free; the docstring contract."""
    lt, _ = bucketed_pair
    cust16 = spark.range(0, 97).select(
        F.col("id").alias("cust"), F.lit("x").alias("name"))
    write_bucketed(cust16, "b_cust16", ["cust"], 16,
                   path=str(tmp_path / "cust16"))
    try:
        j = bucketed_join(spark, lt, "b_cust16", ["cust"])
        assert j.count() == 2000
    finally:
        spark.sql("DROP TABLE IF EXISTS b_cust16")


def test_one_file_per_bucket(spark, bucketed_pair, tmp_path):
    p = str(tmp_path / "ofpb")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("b"))
    write_bucketed(df, "b_ofpb", ["b"], 4, path=p)
    try:
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        # at most one file per bucket (empty buckets write none) — not
        # the tasks x buckets blowup; the _000NN suffix is the bucket id
        assert 0 < len(files) <= 4
        buckets = [f.rsplit("_", 1)[1].split(".")[0] for f in files]
        assert len(buckets) == len(set(buckets))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_ofpb")
