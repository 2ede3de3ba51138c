"""Doc-mode explode/implode/pivot builtins (§2.3/§2.4 gap closed).

Expected values are the reference's own tests
(tests/unsafe_invariants.rs:260-299, src/tests/examples.rs:713-719);
semantics from ops/collection.rs:497-553 and ops/array.rs:550-596.
"""

from __future__ import annotations

from jetro_spark.jql.engine import Jetro


def J(spark, doc, expr):
    return Jetro.from_value(spark, doc).collect(expr)


def test_explode_basic(spark):
    doc = [{"g": "a", "xs": [1, 2, 3]}, {"g": "b", "xs": [9]}, {"g": "c"}]
    got = J(spark, doc, "$.explode(xs)")
    # static schema renders the reference's absent field as null
    assert got == [{"g": "a", "xs": 1}, {"g": "a", "xs": 2},
                   {"g": "a", "xs": 3}, {"g": "b", "xs": 9},
                   {"g": "c", "xs": None}]


def test_explode_empty_array_drops_item(spark):
    got = J(spark, [{"g": "a", "xs": []}, {"g": "b", "xs": [1]}],
            "$.explode(xs)")
    assert got == [{"g": "b", "xs": 1}]


def test_explode_non_array_field_is_identity(spark):
    doc = [{"g": "a", "x": 1}]
    assert J(spark, doc, "$.explode(x)") == doc


def test_implode_basic(spark):
    doc = [{"g": "a", "x": 1}, {"g": "a", "x": 2}, {"g": "b", "x": 3}]
    assert J(spark, doc, "$.implode(x)") == \
        [{"g": "a", "x": [1, 2]}, {"g": "b", "x": [3]}]


def test_explode_implode_roundtrip(spark):
    doc = [{"g": "a", "x": [1, 2]}, {"g": "b", "x": [3]}]
    assert J(spark, doc, "$.explode(x).implode(x)") == doc


def test_implode_moves_field_last(spark):
    # IndexMap shift_remove + insert puts the collected field LAST
    got = J(spark, [{"x": 1, "g": "a"}, {"x": 2, "g": "a"}], "$.implode(x)")
    assert got == [{"g": "a", "x": [1, 2]}]
    assert list(got[0].keys()) == ["g", "x"]


def test_implode_single_field(spark):
    assert J(spark, [{"x": 1}, {"x": 2}], "$.implode(x)") == [{"x": [1, 2]}]


def test_pivot_three_arg(spark):
    doc = {"pivot_data": [
        {"region": "north", "product": "A", "sales": 100},
        {"region": "south", "product": "A", "sales": 150},
        {"region": "north", "product": "B", "sales": 50}]}
    got = J(spark, doc, '$.pivot_data.pivot("region", "product", "sales")')
    assert got == {"north": {"A": 100, "B": 50}, "south": {"A": 150}}


def test_pivot_two_arg_last_wins_first_seen_order(spark):
    doc = [{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3}]
    got = J(spark, {"d": doc}, '$.d.pivot("k", "v")')
    assert got == {"a": 3, "b": 2}
    assert list(got.keys()) == ["a", "b"]


def test_pivot_expression_args(spark):
    # non-string args evaluate per item (mod.rs:2590-2597)
    doc = [{"k": "a", "v": 1}, {"k": "b", "v": 2}]
    got = J(spark, {"d": doc}, '$.d.pivot(x => x.k + "!", "v")')
    assert got == {"a!": 1, "b!": 2}
    got = J(spark, {"d": doc}, '$.d.pivot("k", x => x.v * 10)')
    assert got == {"a": 10, "b": 20}
