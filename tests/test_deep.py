"""Tree transforms: walk/walk_pre, trace_path, schema, rec (§2.10).

Reference: ops/array.rs:693-806 (walk_apply, rec_apply, trace_path_apply),
ops/schema.rs:219 (schema_of). Deep search itself ($..x, deep_find) is
covered by test_jql.py Q5-Q9 and the deep_search oracle row.
"""

from __future__ import annotations

import pytest

from jetro_spark.jql.engine import Jetro


@pytest.fixture(scope="module")
def j(spark):
    return Jetro.from_value(spark, {
        "a": {"b": 2, "c": "x"},
        "arr": [{"b": 3}, {"b": 4}],
        "s": "hi",
    })


def test_walk_strings(j):
    got = j.collect("$.walk(x => x.upper() if x kind string else x)")
    assert got == {"a": {"b": 2, "c": "X"},
                   "arr": [{"b": 3}, {"b": 4}], "s": "HI"}


def test_walk_numbers(j):
    got = j.collect("$.walk(x => x * 2 if x kind number else x)")
    assert got == {"a": {"b": 4, "c": "x"},
                   "arr": [{"b": 6}, {"b": 8}], "s": "hi"}


def test_walk_pre(j):
    # pre-order applies before descending; for scalar-only λ the result
    # matches post-order
    got = j.collect("$.walk_pre(x => x + 1 if x kind number else x)")
    assert got == {"a": {"b": 3, "c": "x"},
                   "arr": [{"b": 4}, {"b": 5}], "s": "hi"}


def test_trace_path(j):
    got = j.collect("$.trace_path(v => v kind number)")
    # values cast to the unified scalar type (string here: doc mixes
    # long and string scalars)
    assert got == [
        {"path": "$.a.b", "value": "2"},
        {"path": "$.arr[0].b", "value": "3"},
        {"path": "$.arr[1].b", "value": "4"},
    ]


def test_schema(j):
    got = j.collect("$.a.schema()")
    assert got == {"type": "Object", "required": ["b", "c"],
                   "fields": {"b": {"type": "Int"}, "c": {"type": "Str"}}}
    arr_schema = j.collect("$.arr.schema()")
    assert arr_schema["type"] == "Array"
    assert arr_schema["items"]["fields"]["b"] == {"type": "Int"}


def test_rec_fixpoint(spark):
    j2 = Jetro.from_value(spark, {"n": 5})
    assert j2.collect("$.n.rec(x => x - 1 if x > 0 else x)") == 0
