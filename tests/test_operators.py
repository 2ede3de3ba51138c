"""Relational-operator tests on the sf0.001 driver tables + tiny fixtures
replicating jetro's equi_join semantics (reference: ops/array.rs:489-548)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jetro_spark.operators import (
    count_by,
    equi_join,
    explode_field,
    group_collect,
    implode,
    index_by,
    unique_by,
)


def test_equi_join_right_wins(spark):
    left = spark.createDataFrame(
        [(1, "l1", "Lname1"), (2, "l2", "Lname2"), (3, "l3", "Lname3")],
        "id long, lval string, name string",
    )
    right = spark.createDataFrame(
        [(1, "r1", "Rname1"), (2, "r2", "Rname2"), (9, "r9", "Rname9")],
        "rid long, rval string, name string",
    )
    j = equi_join(left, right, "id", "rid").orderBy("id")
    rows = j.collect()
    # inner: id 3 (no match) and rid 9 dropped
    assert [r["id"] for r in rows] == [1, 2]
    # right wins on 'name' collision
    assert [r["name"] for r in rows] == ["Rname1", "Rname2"]
    assert set(j.columns) == {"id", "lval", "rid", "rval", "name"}


def test_equi_join_null_keys_dropped(spark):
    """Default key mode (plain ==): nulls drop — the operator-level
    contract for callers with never-null keys; the ENGINE passes
    null_safe/canonical key kwargs for the val_to_key "null" bucket
    (see test_regressions.test_equi_join_null_key_matches_null_bucket).
    """
    left = spark.createDataFrame([(None, "a"), (1, "b")], "id long, v string")
    right = spark.createDataFrame([(None, "x"), (1, "y")], "rid long, w string")
    assert equi_join(left, right, "id", "rid").count() == 1


def test_count_by_stringified_key(spark, tables):
    out = {r["key"]: r["value"] for r in count_by(tables["orders"], "o_orderstatus").collect()}
    expected = {
        r["o_orderstatus"]: r["count"]
        for r in tables["orders"].groupBy("o_orderstatus").count().collect()
    }
    assert out == expected
    assert all(isinstance(k, str) for k in out)


def test_group_collect(spark, tables):
    g = group_collect(tables["region"], "r_regionkey")
    rows = g.collect()
    assert len(rows) == 5
    assert all(len(r["value"]) == 1 for r in rows)
    assert all(isinstance(r["key"], str) for r in rows)


def test_index_by_last_wins(spark):
    df = spark.createDataFrame([(1, "a", 10), (1, "b", 20), (2, "c", 30)], "k long, t string, o long")
    out = {r["key"]: r["value"]["t"] for r in index_by(df, "k", order="o").collect()}
    assert out == {"1": "b", "2": "c"}


def test_unique_by_first_wins(spark):
    df = spark.createDataFrame([(1, "a", 10), (1, "b", 20), (2, "c", 30)], "k long, t string, o long")
    out = sorted((r["k"], r["t"]) for r in unique_by(df, "k", order="o").collect())
    assert out == [(1, "a"), (2, "c")]


def test_explode_implode_roundtrip(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    im = implode(li, "l_quantity", ["l_orderkey"])
    ex = explode_field(im, "l_quantity")
    assert ex.count() == li.count()
    s1 = li.agg(F.sum("l_quantity")).first()[0]
    s2 = ex.agg(F.sum("l_quantity")).first()[0]
    assert abs(s1 - s2) < 1e-6
