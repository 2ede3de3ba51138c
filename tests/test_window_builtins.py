"""Window builtins in the JQL LANGUAGE (§2.6) — doc mode (array HOFs)
and relational mode (Window lowering over the pipeline's sort order).

Expected values are the reference's own test cases
(jetro-core/tests/unsafe_invariants.rs:829-888) plus null-handling cases
derived from ops/collection.rs:89-343 (numeric_options coercion, null
skipping, cummax carry-through, zscore population stddev).
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from jetro_spark.jql.engine import Jetro, JetroTables


def J(spark, doc, expr):
    return Jetro.from_value(spark, doc).collect(expr)


# ------------------------------------------------------------- doc mode


@pytest.mark.parametrize("expr,doc,want", [
    ("$.rolling_avg(3)", [1, 2, 3, 4, 5], [None, None, 2.0, 3.0, 4.0]),
    ("$.rolling_sum(2)", [1, 2, 3, 4], [None, 3.0, 5.0, 7.0]),
    ("$.rolling_min(3)", [3, 1, 4, 1, 5, 9, 2],
     [None, None, 1.0, 1.0, 1.0, 1.0, 2.0]),
    ("$.rolling_max(3)", [3, 1, 4, 1, 5, 9, 2],
     [None, None, 4.0, 4.0, 5.0, 9.0, 9.0]),
    ("$.lag(1)", [10, 20, 30], [None, 10.0, 20.0]),
    ("$.lead(1)", [10, 20, 30], [20.0, 30.0, None]),
    ("$.diff_window()", [10, 13, 18, 12], [None, 3.0, 5.0, -6.0]),
    ("$.cummax()", [3, 1, 4, 1, 5], [3.0, 3.0, 4.0, 4.0, 5.0]),
    ("$.cummin()", [3, 1, 4, 1, 5], [3.0, 1.0, 1.0, 1.0, 1.0]),
    # cum_max/cum_min operator-spelling aliases
    ("$.cum_max()", [3, 1, 4, 1, 5], [3.0, 3.0, 4.0, 4.0, 5.0]),
    # int receiver coerces to f64 (numeric_options); nulls skipped by
    # rolling min/max, cummax carries the running best THROUGH a null
    ("$.cummax()", [1, None, 3], [1.0, 1.0, 3.0]),
    ("$.rolling_sum(2)", [None, None], [None, 0.0]),  # empty-set sum = 0.0
    ("$.rolling_avg(2)", [None, None], [None, None]),
    # non-numeric elements are null (numeric_options `_ => None`)
    ("$.cummax()", [1, "x", 3], [1.0, 1.0, 3.0]),
    # pct_change: zero previous → null (guarded, unlike the / operator)
    ("$.pct_change()", [5, 0, 10], [None, -1.0, None]),
    ("$.lag(2)", [1, 2, 3, 4], [None, None, 1.0, 2.0]),
    ("$.zscore()", [], []),
    ("$.zscore()", ["a", "b"], [None, None]),
    ("$.zscore()", [5, 5], [0.0, 0.0]),  # sd == 0 → 0.0, not null/NaN
])
def test_doc_mode(spark, expr, doc, want):
    assert J(spark, doc, expr) == want


def test_doc_mode_float_tolerance(spark):
    pc = J(spark, [100, 110, 99], "$.pct_change()")
    assert pc[0] is None and abs(pc[1] - 0.1) < 1e-9 and abs(pc[2] + 0.1) < 1e-3
    zs = J(spark, [1, 2, 3, 4, 5], "$.zscore()")
    assert abs(zs[2]) < 1e-9 and zs[0] < 0 and zs[4] > 0
    # population stddev: sd(1..5) = sqrt(2), z(1) = -sqrt(2)
    assert abs(zs[0] + 2.0 ** 0.5) < 1e-9


def test_doc_mode_chained_and_nested(spark):
    assert J(spark, {"s": [1, 2, 3, 4]}, "$.s.rolling_sum(2).lag(1)") == \
        [None, None, 3.0, 5.0]
    # inside a map over documents
    got = J(spark, {"rows": [{"xs": [1, 2, 3]}]},
            "$.rows.map(lambda r: r.xs.cummax())")
    assert got == [[1.0, 2.0, 3.0]]


def test_rolling_zero_window_is_error(spark):
    from jetro_spark.jql.compiler import CompileError
    with pytest.raises(CompileError):
        J(spark, [1, 2], "$.rolling_sum(0)")


# ------------------------------------------------------ relational mode


@pytest.fixture(scope="module")
def seq_tables(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2])],
        "k int, v double")
    return {"s": df}


def rel(spark, seq_tables, expr):
    with warnings.catch_warnings():
        # any _doc_fallback would warn — the lowering must be native
        warnings.simplefilter("error")
        out = JetroTables(spark, seq_tables).query(expr)
    return [r[0] for r in out.collect()], out.columns


@pytest.mark.parametrize("expr,want", [
    ("$.s.sort(k).map(v).rolling_min(3)",
     [None, None, 1.0, 1.0, 1.0, 1.0, 2.0]),
    ("$.s.sort(k).map(v).rolling_sum(2)",
     [None, 4.0, 5.0, 5.0, 6.0, 14.0, 11.0]),
    ("$.s.sort(k).map(v).lag(1)", [None, 3.0, 1.0, 4.0, 1.0, 5.0, 9.0]),
    ("$.s.sort(k).map(v).lead(1)", [1.0, 4.0, 1.0, 5.0, 9.0, 2.0, None]),
    ("$.s.sort(k).map(v).cummax()", [3.0, 3.0, 4.0, 4.0, 5.0, 9.0, 9.0]),
    ("$.s.sort(k).map(v).diff_window()",
     [None, -2.0, 3.0, -3.0, 4.0, 4.0, -7.0]),
    # descending pipeline order drives the window the same way
    ("$.s.sort(-k).map(v).rolling_max(2)",
     [None, 9.0, 9.0, 5.0, 4.0, 4.0, 3.0]),
    # chained window stages reuse the carried order
    ("$.s.sort(k).map(v).diff_window().cummax()",
     [None, -2.0, 3.0, 3.0, 4.0, 4.0, 4.0]),
    # filter between sort and window keeps the order live
    ("$.s.sort(k).filter(v > 1).map(v).lag(1)",
     [None, 3.0, 4.0, 5.0, 9.0]),
])
def test_relational(spark, seq_tables, expr, want):
    vals, cols = rel(spark, seq_tables, expr)
    assert vals == want
    assert cols == ["v"]  # hidden __ord carry columns are stripped


def test_relational_zscore(spark, seq_tables):
    vals, cols = rel(spark, seq_tables, "$.s.sort(k).map(v).zscore()")
    xs = [3, 1, 4, 1, 5, 9, 2]
    mean = sum(xs) / len(xs)
    sd = (sum((x - mean) ** 2 for x in xs) / len(xs)) ** 0.5
    for got, x in zip(vals, xs):
        assert abs(got - (x - mean) / sd) < 1e-9
    assert cols == ["v"]


def test_relational_unsorted_windows_follow_scan_order(spark, seq_tables):
    """r8: positional analytics on an UNSORTED pipeline lower off the
    scan-order surrogate (doc mode windows over document order — the
    scan order). r9: equi_join CARRIES the receiver's order through the
    join, so post-join windows ALSO lower relationally — no fallback,
    and the sequence is the doc-mode receiver order, not
    shuffle-arbitrary."""
    vals, _ = rel(spark, seq_tables, "$.s.map(v).lag(1)")
    assert vals == [None, 3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    import warnings as W

    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        out = JetroTables(spark, seq_tables).query(
            "$.s.equi_join($.s, 'k', 'k').map(v).lag(1)").collect()
    assert not any("no relational lowering" in str(w.message) for w in rec)
    got = [r[0] for r in out]
    assert got == [None, 3.0, 1.0, 4.0, 1.0, 5.0, 9.0]


def test_relational_matches_doc_mode(spark, seq_tables):
    """Same expression, same answer, both modes (the §7.1 invariant)."""
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
    doc = {"s": [{"k": i, "v": v} for i, v in enumerate(xs)]}
    for tail in ["rolling_avg(3)", "cummin()", "pct_change()", "lead(2)"]:
        expr = f"$.s.sort(k).map(v).{tail}"
        vals, _ = rel(spark, seq_tables, expr)
        assert vals == J(spark, doc, expr), expr
