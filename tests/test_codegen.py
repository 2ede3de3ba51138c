"""Whole-stage codegen must not silently fall back to interpreted eval.

``F.try_element_at`` wraps ElementAt in TryEval, whose generated Java
fails janino compilation in this Spark build ("Expression isNull_X is
not an rvalue") — correct results, but every expression tree containing
it drops its codegen unit to interpreted mode (a 10-100× per-row eval
slowdown at 100 TB). ``functions.core.elem_at`` is the when-guarded
replacement; these tests pin both its semantics and the no-fallback
property of the worst offender queries (``spark.sql.codegen.fallback=
false`` turns any janino failure into a hard error).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetro_spark.functions.core import elem_at
from jetro_spark.gate import all_queries

SF_DIR = "/root/testdata/sf0.001"


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_elem_at_matches_try_element_at_semantics(spark):
    arr = F.array(F.lit(10), F.lit(20), F.lit(30))
    assert one(spark, elem_at(arr, 1)) == 10
    assert one(spark, elem_at(arr, 3)) == 30
    assert one(spark, elem_at(arr, 4)) is None          # OOB → null
    assert one(spark, elem_at(arr, -1)) == 30
    assert one(spark, elem_at(arr, -3)) == 10
    assert one(spark, elem_at(arr, -4)) is None
    assert one(spark, elem_at(arr, 0)) is None          # 1-based: 0 invalid
    assert one(spark, elem_at(arr, F.lit(None).cast("int"))) is None
    null_arr = F.lit(None).cast("array<int>")
    assert one(spark, elem_at(null_arr, 1)) is None
    empty = F.array().cast("array<int>")
    assert one(spark, elem_at(empty, 1)) is None
    assert one(spark, elem_at(empty, -1)) is None
    # dynamic index column
    assert one(spark, elem_at(arr, F.lit(2))) == 20


@pytest.mark.parametrize("name", [
    # the queries whose expression shapes used to janino-fail: objrepr
    # field access, first()/last()/min_by/max_by, destructuring binds
    "path_ops", "obj_transform", "jql_patch", "deep_search",
    "hof_stream", "hof_shape", "jql_conv",
    "jql_window", "jql_window_chain", "jql_zscore",
])
def test_no_codegen_fallback(spark, name):
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        rows = all_queries()[name](spark, SF_DIR).collect()
        assert len(rows) > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
