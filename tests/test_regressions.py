"""Regression tests for round-1 review findings (ADVICE.md / VERDICT.md):

- F.sequence(start, stop) descends when stop < start — every index-sequence
  builtin must return empty/null-free results on empty or shorter-than-n
  arrays (reference ops/collection.rs:124-249 returns empty there).
- rolling() must skip nulls and divide avg by the non-null count
  (collection.rs rolling_sum/avg_apply).
- chars()/chars_of() must emit exactly one entry per character, full
  Unicode (string.rs:402-414).
- re_replace first-only must survive multiline inputs, capture groups and
  $-backreferences (regex.rs:124).
- pivot2 must be last-wins on duplicate keys, not DUPLICATED_MAP_KEY.
- index_by/unique_by without an order column must be deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetro_spark.functions import arrays as A
from jetro_spark.functions import strings as S
from jetro_spark.operators.relational import index_by, pivot2, unique_by


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _empty():
    return F.array().cast("array<long>")


def test_empty_array_windows(spark):
    EMPTY = _empty()
    # sequence(1,0) = [1,0] would emit phantom windows/elements
    assert one(spark, A.window(EMPTY, 3)) == []
    assert one(spark, A.chunk(EMPTY, 3)) == []
    assert one(spark, A.lag(EMPTY)) == []
    assert one(spark, A.lead(EMPTY)) == []
    assert one(spark, A.rolling(EMPTY, 2, "sum")) == []
    assert one(spark, A.cum_max(EMPTY)) == []
    assert one(spark, A.cum_min(EMPTY)) == []
    assert one(spark, A.diff_window(EMPTY)) == []
    assert one(spark, A.pct_change(EMPTY)) == []
    assert one(spark, A.enumerate_(EMPTY)) == []
    assert one(spark, A.accumulate(EMPTY, lambda a, x: a + x)) == []
    assert one(spark, A.unique_by(EMPTY, lambda x: x)) == []
    assert one(spark, A.find_index(EMPTY, lambda x: x > 0)) == -1
    assert one(spark, A.indices_where(EMPTY, lambda x: x > 0)) == []


def test_shorter_than_n_arrays(spark):
    two = F.array(F.lit(1), F.lit(2))
    # window([1,2], 3) previously threw SparkRuntimeException
    assert one(spark, A.window(two, 3)) == []
    assert one(spark, A.window(two, 2)) == [[1, 2]]
    assert one(spark, A.chunk(two, 3)) == [[1, 2]]
    assert one(spark, A.rolling(two, 3, "sum")) == [None, None]


def test_rolling_skips_nulls(spark):
    arr = F.array(F.lit(1), F.lit(None).cast("long"), F.lit(3), F.lit(None).cast("long"))
    # window [1,null] → sum skips null = 1.0; [null,3] → 3.0; [3,null] → 3.0
    assert one(spark, A.rolling(arr, 2, "sum")) == [None, 1.0, 3.0, 3.0]
    # avg divides by non-null count, not window size
    assert one(spark, A.rolling(arr, 2, "avg")) == [None, 1.0, 3.0, 3.0]
    all_null = F.array(F.lit(None).cast("long"), F.lit(None).cast("long"))  # noqa: F841
    # rolling_sum never gates on count: a full all-null window sums the
    # empty set to 0.0 (ops/collection.rs:124-147); avg stays null
    assert one(spark, A.rolling(all_null, 2, "sum")) == [None, 0.0]
    assert one(spark, A.rolling(all_null, 2, "avg")) == [None, None]


def test_chars_exact(spark):
    # no trailing empty string (previous pattern matched the end position)
    assert one(spark, S.chars(F.lit("ab"))) == ["a", "b"]
    assert one(spark, S.chars(F.lit("a"))) == ["a"]
    # newline-terminated: Java `$` matches before a final \n — must not skip
    assert one(spark, S.chars(F.lit("ab\n"))) == ["a", "b", "\n"]
    # non-ASCII
    assert one(spark, S.chars(F.lit("héø"))) == ["h", "é", "ø"]


def test_chars_of_unicode(spark):
    assert one(spark, S.chars_of(F.lit("ab"))) == [97, 98]
    # 2-byte (é U+00E9), 3-byte (€ U+20AC), 4-byte (😀 U+1F600) UTF-8
    assert one(spark, S.chars_of(F.lit("é"))) == [0xE9]
    assert one(spark, S.chars_of(F.lit("€"))) == [0x20AC]
    assert one(spark, S.chars_of(F.lit("😀"))) == [0x1F600]


def test_re_replace_first_only(spark):
    assert one(spark, S.re_replace(F.lit("a1b2c3"), r"\d", "#")) == "a#b2c3"
    # multiline: first match after a newline (broken under the old '.'-based rewrite)
    assert one(spark, S.re_replace(F.lit("abc\nx1y1"), r"\d", "#")) == "abc\nx#y1"
    # user pattern containing a capture group + $1 backreference
    assert one(spark, S.re_replace(F.lit("foo12bar34"), r"(\d)(\d)", "$2$1")) == "foo21bar34"
    # no match → unchanged
    assert one(spark, S.re_replace(F.lit("abc"), r"\d", "#")) == "abc"


def test_pivot2_duplicate_keys_last_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("b", 2, 2), ("a", 3, 3)], ["k", "v", "ord"]
    )
    row = pivot2(df, "k", "v", order="ord").first()
    assert row["pivot"] == {"a": 3, "b": 2}


def test_index_by_default_order_deterministic(spark, tables):
    o = tables["orders"]
    a = {r["key"]: r["value"]["o_orderkey"] for r in index_by(o, "o_custkey").collect()}
    b = {r["key"]: r["value"]["o_orderkey"] for r in index_by(o, "o_custkey").collect()}
    assert a == b


def test_unique_by_default_order_deterministic(spark, tables):
    o = tables["orders"]
    a = sorted(r["o_orderkey"] for r in unique_by(o, "o_custkey").collect())
    b = sorted(r["o_orderkey"] for r in unique_by(o, "o_custkey").collect())
    assert a == b


def test_truthy_requires_static_type(spark):
    # cast("boolean") would map "abc" -> null -> false where jetro says
    # non-empty string -> true (util.rs:63-74); guessing is forbidden.
    import pytest as _pytest
    from pyspark.sql import types as T
    from jetro_spark.functions.core import jt_truthy

    with _pytest.raises(TypeError):
        jt_truthy(F.lit("abc"))
    assert one(spark, jt_truthy(F.lit("abc"), T.StringType())) is True
    assert one(spark, jt_truthy(F.lit("false"), T.StringType())) is True
    assert one(spark, jt_truthy(F.lit(""), T.StringType())) is False


def test_first_last_nth_oob_yield_null_not_empty(spark):
    """Round-7 soak catch: the reference returns scalar Null for
    first()/last()/nth(i) on an empty/out-of-bounds pipeline
    (collection.rs first_apply/last_apply n==1 unwrap, value.rs
    get_index), but the relational limit/offset lowerings returned ZERO
    rows. The lowerings now pad with one null row (all-null for object
    pipelines — the documented row representation of scalar Null).
    Falsifying example preserved from the 2500-example differential
    soak."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = JetroTables(spark, {"s": spark.createDataFrame(
        [(r["k"], r["v"], r["g"]) for r in rows],
        "k long, v double, g string")})

    # the soak's falsifying example: 2 values -> 1 chunk -> nth(2) OOB
    e = "$.s.sort(k).take(9).filter(v > 40).map(v).chunk(4).nth(2)"
    assert jt.collect(e) is None
    assert [r["value"] for r in t.query(e).collect()] == [None]

    for sink in [".first()", ".last()", ".nth(0)", ".nth(-1)",
                 ".first(1)", ".last(1)"]:
        e = "$.s.sort(k).filter(v > 2000)" + sink
        assert jt.collect(e) is None, sink
        got = t.query(e).collect()
        assert len(got) == 1 and all(x is None for x in got[0]), sink

    # first(n>1)/last(n>1) keep ARRAY semantics: empty stays empty
    for sink in [".first(3)", ".last(2)"]:
        e = "$.s.sort(k).filter(v > 2000)" + sink
        assert jt.collect(e) == [], sink
        assert t.query(e).collect() == [], sink

    # in-bounds results unchanged
    e = "$.s.sort(k).nth(2)"
    assert jt.collect(e) == {"k": 2, "v": 74.0, "g": "g2"}
    assert [tuple(r) for r in t.query(e).collect()] == [(2, 74.0, "g2")]


def test_equality_probes_are_total(spark):
    """Round-7: the equality-probing builtins must be TOTAL like the
    reference — a cross-kind probe is an ordinary miss, never a type
    error (includes_apply ops/misc.rs:129-151, index_value_apply /
    indices_of_apply collection.rs:471-492, remove_value_apply
    collection.rs:392-404). Previously `[{...}].includes(74.0)` was a
    CompileError in both modes (and the relational mode additionally
    collapsed to the doc fallback before erroring)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    jt = Jetro.from_value(spark, {
        "s": rows, "o": {"a": 1, "b": None}, "arr": [1, None, 3],
        "txt": "hello"})

    for expr, want in [
        # array of objects probed with a scalar → false, not an error
        ("$.s.includes(74.0)", False),
        # struct probe matches by KEY SET, order-insensitively
        ("$.s.map({k: k, v: v}).includes({v: 74.0, k: 2})", True),
        ("$.s.map({k: k, v: v}).index_of({v: 74.0, k: 2})", 2),
        ("$.s.map({k: k}).includes({x: 3})", False),
        # null probe matches null elements (val_to_key(Null) == "null")
        ("$.arr.includes(null)", True),
        # object receiver: KEY membership; non-string probe is false
        ("$.o.includes('a')", True),
        ("$.o.includes(3)", False),
        ("$.s.count_by(g).includes('g0')", True),
        ("$.s.count_by(g).includes(3)", False),
        # string receiver: non-string needle unwraps to "" → true
        ("$.txt.includes(3)", True),
        # `has` desugars to the same totality
        ("$.s.filter(x => $.txt has 3).len()", 17),
        # index family: cross-kind probe → absent, not an error
        ("$.arr.index_of({x: 1})", -1),
        ("$.arr.indices_of({x: 1})", []),
        # remove: an object literal is a VALUE (BuiltinArgs::Val),
        # not a truthy per-element predicate
        ("$.arr.remove({x: 1})", [1, None, 3]),
        ("$.arr.remove(3)", [1, None]),
    ]:
        assert jt.collect(expr) == want, expr

    # relational mode agrees and does NOT fall back to doc mode
    import warnings
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    for expr, want in [
        ("$.s.sort(k).includes(74.0)", False),
        ("$.s.sort(k).includes({k: 2, v: 74.0, g: 'g2'})", True),
        ("$.s.sort(k).map(v).includes(74.0)", True),
        ("$.s.sort(k).map(v).index_of({x: 1})", -1),
    ]:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = JetroTables(spark, {"s": t}).query(expr).collect()
        assert not any("no relational lowering" in str(x.message)
                       for x in w), expr
        assert [r[0] for r in got] == [want], expr


def test_unique_ignores_hidden_order_columns(spark):
    """Round-7 fuzz catch: the relational unique() lowered to a plain
    df.distinct(), which also compared the hidden __ord columns an
    ordered pipeline carries — after .sort(k), EVERY row was "unique".
    unique must dedup on the visible value only and keep the FIRST
    occurrence in pipeline order (unique_arr_apply first-seen-order
    semantics, collection.rs:78-88)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = JetroTables(spark, {"s": spark.createDataFrame(
        [(r["k"], r["v"], r["g"]) for r in rows],
        "k long, v double, g string")})

    e = "$.s.sort(k).map(g).unique()"
    assert jt.collect(e) == ["g0", "g1", "g2"]
    assert sorted(r[0] for r in t.query(e).collect()) == ["g0", "g1", "g2"]
    # first-seen order survives downstream of the dedup
    e = "$.s.sort(-k).map(g).unique().first()"
    assert jt.collect(e) == "g1"  # k=16 → g1 first in reversed order
    assert [r[0] for r in t.query(e).collect()] == ["g1"]


def test_numeric_reducers_skip_non_numeric(spark):
    """num_fold (exec/pipeline/common.rs:15-29) folds Int/Float and
    silently SKIPS every other element — sum over strings is 0 and
    avg/min/max are Null in the reference, but our lowerings ANSI-cast
    and crashed with NumberFormatException (r7 fuzz catch)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "g": f"g{i % 3}"} for i in range(5)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = JetroTables(spark, {"s": spark.createDataFrame(
        [(r["k"], r["g"]) for r in rows], "k long, g string")})

    assert jt.collect("$.s.map(g).sum()") == 0.0
    assert jt.collect("$.s.map(g).avg()") is None
    assert jt.collect("$.s.map(g).min()") is None
    assert jt.collect("$.s.map(g).max()") is None
    assert [r[0] for r in
            t.query("$.s.sort(k).map(g).sum()").collect()] == [0.0]
    assert [r[0] for r in
            t.query("$.s.sort(k).map(g).min()").collect()] == [None]
    # numeric pipelines unchanged
    assert jt.collect("$.s.map(k).sum()") == 10.0


def test_ordered_comparison_of_incomparables_is_false(spark):
    """json_cmp_binop (util.rs:140-162): only number/number,
    string/string and bool/bool are order-comparable; anything else is
    FALSE — Spark's ANSI cast made string-vs-number comparisons throw
    NumberFormatException at runtime instead (r7 fuzz catch)."""
    from jetro_spark.jql.engine import Jetro

    rows = [{"k": i, "g": f"g{i % 3}"} for i in range(5)]
    jt = Jetro.from_value(spark, {"s": rows})
    assert jt.collect("$.s.filter(g > 40).count()") == 0
    assert jt.collect("$.s.filter(g >= 40).count()") == 0
    assert jt.collect("$.s.map(g).find_index(x => x > 40)") == -1
    assert jt.collect("$.s.filter(g > 'g0').count()") == 3
    assert jt.collect("$.s.filter(k > 2).count()") == 2


def test_relational_set_ops_dedup_and_keep_order(spark):
    """Round-7: relational diff/intersect/union lowered to Spark's
    subtract/intersect/unionByName — SQL set ops that dedup the
    receiver and lose the pipeline's physical order, while the
    reference's diff_apply/intersect_apply/union_apply filter the
    receiver by key membership (duplicates and order INTACT; union
    appends only values absent from the receiver)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "g": f"g{i % 3}"} for i in range(6)]
    sub = [{"k": i, "g": f"g{i % 3}"} for i in range(3)]
    jt = Jetro.from_value(spark, {"s": rows, "u": sub})
    t = spark.createDataFrame([(r["k"], r["g"]) for r in rows],
                              "k long, g string")
    t2 = spark.createDataFrame([(r["k"], r["g"]) for r in sub],
                               "k long, g string")

    def rel(e):
        return [tuple(r) for r in
                JetroTables(spark, {"s": t, "u": t2}).query(e).collect()]

    # union appends only values ABSENT from the receiver: all 3 of u's
    # rows are already present → 6; receiver duplicates survive
    assert jt.collect("$.s.union($.u).len()") == 6
    assert rel("$.s.union($.u).len()") == [(6,)]
    # s.map(g) has 6 values with duplicates ([g0,g1,g2]x2); u covers all
    # three g's, so union appends nothing and intersect keeps ALL SIX
    # receiver occurrences (array_intersect would have collapsed to 3)
    assert jt.collect("$.s.map(g).union($.u.map(g)).len()") == 6
    assert rel("$.s.map(g).union($.u.map(g)).len()") == [(6,)]
    assert jt.collect("$.s.map(g).intersect($.u.map(g)).len()") == 6
    assert rel("$.s.sort(k).map(g).intersect($.u.map(g)).len()") == [(6,)]
    assert jt.collect("$.s.map(g).union(['zz', 'zz']).len()") == 8
    # diff/intersect keep the receiver's pipeline order through the
    # anti/semi join for downstream position sinks
    assert rel("$.s.sort(-k).diff($.u).first()") == [(5, "g2")]
    assert rel("$.s.sort(-k).diff($.u).nth(1)") == [(4, "g1")]
    assert rel("$.s.sort(k).intersect($.u).last()") == [(2, "g2")]
    assert jt.collect("$.s.sort(-k).diff($.u).first()") == {"k": 5,
                                                            "g": "g2"}
    # self-diff is empty, not an ambiguous-column crash
    assert rel("$.s.diff($.s).count()") == [(0,)]


def test_unique_by_keeps_pipeline_order(spark):
    """Round-7: unique_by's min_by groupBy shuffles away the physical
    pipeline order, so position sinks downstream picked arbitrary rows
    (sort(-k).unique_by(g).first() returned a mid-pipeline row). The
    lowering now restores the order and keeps it for later stages."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")

    for e in ("$.s.sort(-k).unique_by(g).first()",
              "$.s.sort(-k).unique_by(g).nth(1)",
              "$.s.sort(k).unique_by(g).last()"):
        doc = jt.collect(e)
        got = [tuple(r) for r in
               JetroTables(spark, {"s": t}).query(e).collect()]
        assert got == [tuple(doc.values())], e


def test_equi_join_keeps_pipeline_order(spark):
    """Round-7, same class: the join shuffle destroyed the receiver's
    pipeline order; equi_join_apply walks the receiver in order
    (array.rs:489-548), so position sinks after a join must see it."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    dim = [{"g": f"g{i}", "label": f"L{i}"} for i in range(3)]
    jt = Jetro.from_value(spark, {"s": rows, "d": dim})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    d = spark.createDataFrame([(r["g"], r["label"]) for r in dim],
                              "g string, label string")

    for e in ('$.s.sort(-k).equi_join($.d, "g", "g").first()',
              '$.s.sort(-k).equi_join($.d, "g", "g").nth(2)',
              '$.s.sort(k).equi_join($.d, "g", "g").last()'):
        doc = jt.collect(e)
        got = [tuple(r) for r in
               JetroTables(spark, {"s": t, "d": d}).query(e).collect()]
        assert got == [tuple(doc.values())], e


def test_canonical_object_keys_and_union_widening(spark):
    """Round-7 val_to_key fidelity for keyed reducers and union:

    - group_by/count_by/index_by/pivot/group_shape key their output
      objects by val_to_key (util.rs:216-226): integral doubles render
      WITHOUT the trailing .0 and a null key renders as "null" — we
      rendered "74.0" and NULL.
    - union of cross-shape object arrays appends EVERYTHING (no shared
      canonical key, union_apply never errors); representable by
      widening both sides to the union struct (missing ≡ null).
    - the doc fallback no longer explodes a single array-valued ELEMENT
      result (pairwise().first() is ONE pair, not a rowset)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float(i % 3)} for i in range(6)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"]) for r in rows],
                              "k long, v double")

    assert jt.collect("$.s.count_by(v)") == {"0": 2, "1": 2, "2": 2}
    assert jt.collect("$.s.group_by(v).keys()") == ["0", "1", "2"]
    assert jt.collect("$.s.pivot(v, k)") == {"0": 3, "1": 4, "2": 5}
    assert jt.collect("$.s.pivot(v + 0.5, k)") == {"0.5": 3, "1.5": 4,
                                                   "2.5": 5}
    got = JetroTables(spark, {"s": t}).query("$.s.count_by(v)").collect()
    assert sorted((r["key"], r["value"]) for r in got) == [
        ("0", 2), ("1", 2), ("2", 2)]

    # widened union: receiver objects lack g → null → key "null"
    rows_u = [{"k": 9, "v": 1.0, "g": "gX"}]
    jt2 = Jetro.from_value(spark, {"s": rows, "u": rows_u})
    assert jt2.collect("$.s.map({k: k, v: v}).union($.u).count_by(g)") \
        == {"null": 6, "gX": 1}

    # element-shaped fallback results stay single array cells
    t2 = spark.createDataFrame([(9, 1.0)], "k long, v double")
    T = JetroTables(spark, {"s": t, "u": t2})
    out = T.query("$.s.sort(k).union($.u).map(v).pairwise().first()")
    cells = out.collect()
    assert len(cells) == 1 and cells[0][0] == [0.0, 1.0]


def test_ordered_union_lowers_relationally(spark):
    """Round-8: an ordered pipeline ending in `.union(table)` used to
    collapse to the single-task doc fallback (refused outright above
    the size ceiling). It now lowers: receiver rows first in pipeline
    order, appended rows after in the other table's own order —
    union_apply's exact sequence (collection.rs:611-626), including
    other-side duplicates (a_keys never grows)."""
    import warnings

    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "g": f"g{i % 3}"} for i in range(6)]
    # w has a dup value absent from s — appended TWICE, after s's rows
    extra = [{"k": 9, "g": "gx"}, {"k": 9, "g": "gx"}, {"k": 1, "g": "g1"}]
    jt = Jetro.from_value(spark, {"s": rows, "u": extra})
    t = spark.createDataFrame([(r["k"], r["g"]) for r in rows],
                              "k long, g string")
    t2 = spark.createDataFrame([(r["k"], r["g"]) for r in extra],
                               "k long, g string")
    tables = JetroTables(spark, {"s": t, "u": t2})

    def rel(e):
        with warnings.catch_warnings(record=True) as wl:
            warnings.simplefilter("always")
            df = tables.query(e)
            out = [tuple(r[c] for c in df.columns
                         if not c.startswith("__ord"))
                   for r in df.collect()]
        assert not any("fallback" in str(w.message) for w in wl), \
            f"{e!r} doc-fell-back"
        return out

    # ORDER-exact equivalence with doc mode, fallback-free
    for e in ["$.s.sort(-k).union($.u)",
              "$.s.sort(k).take(2).union($.u)",
              "$.s.sort(k).union($.u).union($.u)"]:
        doc = jt.collect(e)
        assert rel(e) == [(d["k"], d["g"]) for d in doc], e
    # position sinks see the combined order: appended dups come last
    assert rel("$.s.sort(-k).union($.u).last()") == [(9, "gx")]
    assert rel("$.s.sort(-k).union($.u).nth(6)") == [(9, "gx")]
    assert rel("$.s.sort(-k).union($.u).count()") == [(8,)]
    assert jt.collect("$.s.sort(-k).union($.u).count()") == 8


def test_relational_sort_is_stable(spark):
    """Round-8 fuzz catch (patch-stage vocab): doc mode's sort is a
    STABLE sort (Rust Vec::sort_by), so ties keep their prior pipeline
    order — but the relational orderBy broke ties arbitrarily. A patch
    stage collapsing half the values to 0.0 made the instability
    observable through order-sensitive sinks. The lowering now appends
    the carried order (or the scan order, as a partition-prefixed
    monotonic id on the first sort) as secondary sort keys."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 100), "g": f"g{i % 3}"}
            for i in range(24)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t})
    exprs = [
        # second sort with mass ties (the falsifying shape)
        "$.s.sort(k).map(patch @ {v: 0.0 when @.v > 40.0})"
        ".sort(x => -x.v).last()",
        # first sort already tied -> ties keep SCAN order
        "$.s.sort(g).first(7)",
        "$.s.sort(g).nth(10)",
        "$.s.sort(g).map(patch @ {v: 1.0 when @.v > 0.0}).sort(v).take(9)",
    ]
    for e in exprs:
        doc = jt.collect(e)
        got = [{c: r[c] for c in d.columns if not c.startswith("__ord")}
               for d in [tables.query(e)] for r in d.collect()]
        want = doc if isinstance(doc, list) else [doc]
        assert got == want, e


def test_min_by_max_by_tie_breaks_in_pipeline_order(spark):
    """Round-8 soak catch: extreme_by_apply (array.rs:341-371) takes
    strict improvements only, so TIES keep the first element in
    document order — but the relational lowering ordered by the key
    alone and let Spark break ties arbitrarily. A patch stage
    collapsing half the values to 0.0 falsified it. Ties now break on
    the carried pipeline order (or the scan-order surrogate)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 100), "g": f"g{i % 3}"}
            for i in range(24)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t})
    exprs = [
        # the falsifying shape: two sorts, then mass ties from a patch
        "$.s.sort(k).sort(-v).map(patch @ {v: 0.0 when @.v > 40.0})"
        ".min_by(v)",
        "$.s.sort(-k).map(patch @ {v: 1.0 when @.v > 10.0}).max_by(v)",
        # no prior sort: ties keep SCAN order
        "$.s.map(patch @ {v: 0.0 when @.v > 40.0}).min_by(v)",
        "$.s.min_by(g)",
        "$.s.max_by(g)",
    ]
    for e in exprs:
        doc = jt.collect(e)
        got = [{c: r[c] for c in d.columns if not c.startswith("__ord")}
               for d in [tables.query(e)] for r in d.collect()]
        assert got == [doc], e


def test_unsorted_pipelines_scan_order_fidelity(spark):
    """Round-8 scan-order surrogate catches (2500-example unsorted
    soak): (a) set ops on an UNSORTED pipeline keep the receiver's
    document order — diff's left_anti shuffle order used to leak into a
    downstream accumulate; (b) an EMPTY frame reaching a doc-fallback
    stage must produce zero rows, not the phantom null element
    explode_outer minted from the empty collected array; (c) no-arg
    numeric reducers over OBJECT rows num_fold-skip."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 100), "g": f"g{i % 3}"}
            for i in range(12)]
    extra = rows[:5] + [{"k": 99, "v": 7.5, "g": "g9"}]
    jt = Jetro.from_value(spark, {"s": rows, "u": extra})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    u = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in extra],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t, "u": u})

    def rel(e):
        df = tables.query(e)
        return [tuple(r[c] for c in df.columns
                      if not c.startswith("__ord")) for r in df.collect()]

    # (a) diff keeps receiver scan order: prefix sums are order-exact
    e = "$.s.diff($.u).map(v).accumulate((a, x) => a + x)"
    assert [r[0] for r in rel(e)] == jt.collect(e)
    # unsorted union appends in the other table's own order
    e2 = "$.s.take(3).union($.u).map(k)"
    assert [r[0] for r in rel(e2)] == jt.collect(e2)
    # (b) empty frame into a fallback stage -> zero rows
    e3 = "$.s.drop_while(x => x.k < 5).intersect($.u).map(v).remove(74.0)"
    assert jt.collect(e3) == []
    assert rel(e3) == []
    # (c) object-row reducers follow num_fold (sum [] = 0, min Null)
    assert rel("$.s.sum()") == [(0.0,)] and jt.collect("$.s.sum()") == 0.0
    assert rel("$.s.min()") == [(None,)]
    # order-dependent stages straight off the unsorted table
    for e4 in ["$.s.reverse().first()", "$.s.last()", "$.s.nth(-2)",
               "$.s.map(v).unique().first()",
               "$.s.take_while(x => x.k < 7).map(k)"]:
        doc = jt.collect(e4)
        got = rel(e4)
        want = doc if isinstance(doc, list) else [doc]
        flat = [r[0] if len(r) == 1 else dict(zip(["k", "v", "g"], r))
                for r in got]
        assert flat == want, e4


def test_post_join_ties_and_order_follow_doc_mode(spark):
    """Round-9 advice catch: min_by/max_by (and the stable-sort
    tie-break) minted a monotonically_increasing_id surrogate
    UNCONDITIONALLY, bypassing the _scan_ok gate — after an
    order-destroying stage the id numbers shuffle-arbitrary rows, so
    ties diverged from doc mode's deterministic pipeline order. Fixed
    two ways: equi_join now CARRIES the receiver's scan order through
    the join (each receiver row yields ≤1 output row), and the
    tie-break surrogates route through _maybe_scan_order so an
    order-broken pipeline falls back honestly instead of guessing."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 100), "g": f"g{i % 3}"}
            for i in range(24)]
    dim = [{"g": f"g{i}", "w": float(i)} for i in range(3)]
    jt = Jetro.from_value(spark, {"s": rows, "d": dim})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    d = spark.createDataFrame([(r["g"], r["w"]) for r in dim],
                              "g string, w double")
    tables = JetroTables(spark, {"s": t, "d": d})

    exprs = [
        # the advice's falsifying shape: post-join mass ties (every row
        # of a group carries the same w) — the winner must be the
        # FIRST receiver row in document order, in both modes
        '$.s.equi_join($.d, "g", "g").min_by(w)',
        '$.s.equi_join($.d, "g", "g").max_by(w)',
        # patch-collapsed ties after the join
        '$.s.equi_join($.d, "g", "g").map(patch @ {v: 0.0 when @.v > 30.0})'
        '.min_by(v)',
        # stable sort after the join: ties keep receiver order
        '$.s.equi_join($.d, "g", "g").sort(w).map(k)',
        # positional stages read the carried receiver order
        '$.s.equi_join($.d, "g", "g").take_while(x => x.k < 9).map(k)',
        '$.s.equi_join($.d, "g", "g").reverse().first()',
    ]
    for e in exprs:
        doc = jt.collect(e)
        df = tables.query(e)
        got = [{c: r[c] for c in df.columns if not c.startswith("__ord")}
               for r in df.collect()]
        flat = [r if len(r) > 1 else next(iter(r.values())) for r in got]
        want = doc if isinstance(doc, list) else [doc]
        assert flat == want, e


def test_equi_join_subpipeline_arg_keeps_receiver_order(spark):
    """Round-9 re-entrancy guard: a SUB-PIPELINE table arg
    ($.d.filter(...)) re-enters _pipeline, whose own last stage used to
    clobber the _is_last_stage hint before the equi_join handler read
    it — silently skipping the receiver-order sort mid-pipeline. The
    hint is now read before arg resolution and save/restored across
    nested pipelines."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 100), "g": f"g{i % 3}"}
            for i in range(24)]
    dim = [{"g": f"g{i}", "w": float(i)} for i in range(3)]
    jt = Jetro.from_value(spark, {"s": rows, "d": dim})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    d = spark.createDataFrame([(r["g"], r["w"]) for r in dim],
                              "g string, w double")
    tables = JetroTables(spark, {"s": t, "d": d})
    for e in ('$.s.equi_join($.d.filter(w >= 1.0), "g", "g").last()',
              '$.s.equi_join($.d.filter(w >= 0.0), "g", "g").min_by(w)',
              '$.s.equi_join($.d.sort(g).take(2), "g", "g")'
              '.take_while(x => x.k < 9).map(k)'):
        doc = jt.collect(e)
        df = tables.query(e)
        got = [{c: r[c] for c in df.columns if not c.startswith("__ord")}
               for r in df.collect()]
        flat = [r if len(r) > 1 else next(iter(r.values())) for r in got]
        want = doc if isinstance(doc, list) else [doc]
        assert flat == want, e


def test_keyed_reducers_keep_pipeline_order_across_mappers(spark):
    """Round-9: collect_list's element order is shuffle-ARRIVAL order —
    deterministic-looking on one mapper (every earlier probe), arbitrary
    under real multi-mapper exchanges — while doc mode keeps groups in
    pipeline order and last-wins reducers pick the pipeline-last row.
    group_by/index_by/implode/pivot/group_shape now sort collected
    elements by a doc-order surrogate; also pinned: hidden __ord carry
    columns no longer leak into group value structs. The 16-way
    repartition forces the multi-mapper shuffle that falsified the
    pre-r9 lowering."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 19997), "g": f"g{i % 3}"}
            for i in range(2000)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string").repartition(16)
    tables = JetroTables(spark, {"s": t})

    e = "$.s.sort(-v).group_by(g)"
    doc = jt.collect(e)
    rel = tables.query(e).collect()
    assert {k: [x["k"] for x in v] for k, v in doc.items()} == \
        {r["key"]: [x["k"] for x in r["value"]] for r in rel}

    e2 = "$.s.sort(-v).index_by(g)"
    doc2 = jt.collect(e2)
    rel2 = tables.query(e2).collect()
    assert {k: v["k"] for k, v in doc2.items()} == \
        {r["key"]: r["value"]["k"] for r in rel2}

    e3 = "$.s.sort(v).map({g: g, k: k}).implode(k)"
    doc3 = sorted((d["g"], tuple(d["k"])) for d in jt.collect(e3))
    rel3 = sorted((r["g"], tuple(r["k"]))
                  for r in tables.query(e3).collect())
    assert doc3 == rel3

    # hidden-carry leak: value structs stay (k, g) only
    sch = tables.query(
        '$.s.sort(-v).map({k: k, g: g}).group_by(g)').schema.simpleString()
    assert "__ord" not in sch


def test_pivot_and_group_shape_order_across_mappers(spark):
    """Round-9 companions to the keyed-reducer order fix: pivot's
    last-wins winner and group_shape's per-key sequence must be
    pipeline-order-exact under a multi-mapper shuffle."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 19997), "g": f"g{i % 3}"}
            for i in range(2000)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string").repartition(16)
    tables = JetroTables(spark, {"s": t})

    e = "$.s.sort(v).pivot(g, k)"
    doc = jt.collect(e)
    r = tables.query(e).collect()[0]
    assert doc == dict(r["pivot"])

    e2 = "$.s.sort(-v).group_shape(x => x.g, a => a.map(k))"
    doc2 = jt.collect(e2)
    rel2 = {row["key"]: list(row["value"])
            for row in tables.query(e2).collect()}
    assert {k: list(v) for k, v in doc2.items()} == rel2


def test_equi_join_duplicate_right_keys_keep_right_array_order(spark):
    """Round-10 advice: equi_join_apply emits EVERY right match per
    receiver row, in RIGHT-ARRAY order (array.rs:505-531) — not <=1 row
    as the r9 order carry assumed. With duplicate right keys the
    receiver-only sort left a row's matches tied (shuffle-arbitrary);
    a right-side doc-order surrogate now breaks ties by right-array
    position, matching doc mode exactly."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i % 4, "v": float(i)} for i in range(12)]
    # 3 right matches per key, interleaved so right-array order is not
    # any key- or value-sorted order
    dim = [{"k": (7 * i) % 4, "b": float(100 + i)} for i in range(12)]
    jt = Jetro.from_value(spark, {"s": rows, "d": dim})
    t = spark.createDataFrame([(r["k"], r["v"]) for r in rows],
                              "k long, v double").repartition(8)
    d = spark.createDataFrame([(r["k"], r["b"]) for r in dim],
                              "k long, b double")
    tables = JetroTables(spark, {"s": t, "d": d})
    for e in ('$.s.sort(v).equi_join($.d, "k", "k").map(b)',
              '$.s.sort(v).equi_join($.d, "k", "k").nth(4)',
              '$.s.sort(v).equi_join($.d, "k", "k")'
              '.take_while(x => x.b < 110.0).map(v)',
              '$.s.sort(v).equi_join($.d, "k", "k").reverse().first()',
              # nested second join: the inner join's output order is
              # NOT its doc-array order (no order materialized), so the
              # outer join must refuse the surrogate and doc-fallback
              # when a positional stage reads the order
              '$.s.sort(v).equi_join($.d.equi_join($.d, "k", "k"),'
              ' "k", "k").nth(4)'):
        from pyspark.sql import Row

        def canon(x):
            if isinstance(x, Row):
                return {k: canon(v2) for k, v2 in x.asDict().items()}
            return x

        doc = jt.collect(e)
        df = tables.query(e)
        got = [{c: canon(r[c]) for c in df.columns
                if not c.startswith("__ord")} for r in df.collect()]
        flat = [r if len(r) > 1 else next(iter(r.values())) for r in got]
        want = doc if isinstance(doc, list) else [doc]
        assert flat == want, e


def test_keyed_collects_over_variant_and_map_payloads(spark):
    """Round-10 advice: the r9 ordered collects sorted
    struct(order, payload) with the DEFAULT struct ordering, which
    Spark rejects when the payload holds VARIANT or MAP fields
    (DATATYPE_MISMATCH.INVALID_ORDERING_TYPE) — a one-sided analysis
    error vs doc mode for heterogeneous-doc tables. sort_by_field now
    compares ONLY the numeric order surrogate (comparator form)."""
    import json as _json

    from jetro_spark.jql.engine import JetroTables

    docs = [{"g": "a", "v": 1}, {"g": "b", "v": [2, 3]},
            {"g": "a", "v": {"x": 4}}, {"g": "b", "v": "s"}]
    t = (spark.createDataFrame(
            [(i, d["g"], _json.dumps(d["v"])) for i, d in enumerate(docs)],
            "i long, g string, vj string")
         .select("g", F.parse_json("vj").alias("v")))
    mt = spark.createDataFrame([("a", {"x": 1}), ("b", {"y": 2}),
                                ("a", {"z": 3})],
                               "g string, m map<string,int>")
    tables = JetroTables(spark, {"t": t, "mt": mt})

    # group_by: per-key sequences keep pipeline order, variant payload
    out = tables.query("$.t.sort(g).group_by(g)")
    rows = {r["key"]: j for r, j in zip(
        out.collect(),
        [r["j"] for r in out.select(
            F.to_json("value").alias("j")).collect()])}
    assert _json.loads(rows["a"]) == [{"g": "a", "v": 1},
                                      {"g": "a", "v": {"x": 4}}]
    assert _json.loads(rows["b"]) == [{"g": "b", "v": [2, 3]},
                                      {"g": "b", "v": "s"}]

    # implode / pivot / group_shape / chunk / partition / to_json over
    # the same variant (or map) payloads: all lower without the
    # one-sided INVALID_ORDERING_TYPE error
    assert tables.query("$.t.sort(g).implode(v)").count() == 2
    piv = tables.query("$.t.sort(g).pivot(g, v)").first()["pivot"]
    assert set(piv.keys()) == {"a", "b"}
    gs = {r["key"]: r["value"] for r in tables.query(
        "$.t.sort(g).group_shape(x => x.g, a => a.len())").collect()}
    assert gs == {"a": 2, "b": 2}
    assert tables.query("$.t.sort(g).map(v).chunk(2)").count() == 2
    part = tables.query('$.t.sort(g).partition(x => x.g == "a")').first()
    assert len(part["pass"]) == 2 and len(part["fail"]) == 2
    sunk = tables.query("$.t.sort(g).to_json()").first()["value"]
    assert _json.loads(sunk)[0]["g"] == "a"
    # map-typed payload through an ordered keyed collect
    mg = {r["key"]: r["value"] for r in
          tables.query("$.mt.sort(g).group_by(g)").collect()}
    assert [dict(e["m"]) for e in mg["a"]] == [{"x": 1}, {"z": 3}]


def test_min_max_skip_non_numeric_variant_kinds(spark):
    """Round-10 advice: m_min/m_max called array_min/array_max on
    array<variant>, which fails analysis, while num_fold (common.rs:
    25-58) silently SKIPS non-numeric kinds for Min/Max exactly like
    Sum/Avg. They now take the same _numfold_vals runtime leg."""
    from jetro_spark.jql.engine import Jetro

    j = Jetro.from_value(spark, {"v": [1, {"x": 5}, 2.5, "s", [9], True]})
    assert j.collect("$.v.min()") == 1.0
    assert j.collect("$.v.max()") == 2.5
    assert j.collect("$.v.sum()") == 3.5
    # all-non-numeric: n_obs == 0 -> op.empty() (Null), never an error
    j2 = Jetro.from_value(spark, {"v": [{"x": 1}, "s", [2]]})
    assert j2.collect("$.v.min()") is None
    assert j2.collect("$.v.max()") is None


def test_dedup_globals_null_text_keeps_zero_counts(spark):
    """Round-10 advice: the r9 row-local rebuilds returned NULL
    n_kept/n_lines/n_tokens for NULL text (F.size over a null array),
    silently flipping downstream `n_kept > 0` filters vs the r8
    contract of 0. Null text now coalesces to a 0-line/0-token doc."""
    from jetro_spark.llm.dedup import dedup_lines_global, dedup_spans_global

    df = spark.createDataFrame(
        [(1, "a\nb\na"), (2, None), (3, "a\nc")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines_global(df).collect()}
    assert out[2]["n_kept"] == 0 and out[2]["n_lines"] == 0
    assert out[2]["text_dedup"] == ""
    # the dedup itself is unchanged: "a" keeps only its first occurrence
    assert out[1]["n_kept"] == 2 and out[3]["n_kept"] == 1
    outs = {r["doc_id"]: r for r in dedup_spans_global(df, n=2).collect()}
    assert outs[2]["n_kept"] == 0 and outs[2]["n_tokens"] == 0


def test_ordered_union_untrusted_other_order_falls_back(spark):
    """r10: ordered union appends the other table's rows in the other
    ARRAY's order via a monotonic-id tag — when the other side is an
    order-destroying sub-pipeline (its physical order is not its doc
    order), the tag would number shuffle-arbitrary rows; the engine
    must doc-fallback instead, exactly matching doc mode's append
    order."""
    import warnings as W

    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float(i * 3 % 7), "g": f"g{i % 2}"}
            for i in range(8)]
    rows_u = [{"k": i + 6, "v": float(i), "g": f"g{i % 3}"}
              for i in range(6)]
    jt = Jetro.from_value(spark, {"s": rows, "u": rows_u})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    u = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows_u],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t, "u": u})
    e = ('$.s.sort(k).union($.u.equi_join($.u, "k", "k"))'
         '.map(k)')
    doc = jt.collect(e)
    with W.catch_warnings():
        W.simplefilter("ignore")
        out = tables.query(e)
        rel = [r[out.columns[0]] for r in out.collect()]
    assert rel == doc
    # trusted other side (plain scan) still lowers relationally
    e2 = "$.s.sort(k).union($.u).map(k)"
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        rel2 = [r["k"] for r in tables.query(e2).collect()]
    assert not any("single-task" in str(w.message) for w in rec)
    assert rel2 == jt.collect(e2)


def test_let_bound_subplans_keep_doc_order(spark):
    """r10: a let-bound sub-plan re-enters the body as a TABLE, and the
    body's positional stages read its scan order — which is only the
    binding's document order if the binding materialized it. Bindings
    now compile with demand_order (keyed reducers / joins restore
    their doc order at binding exit) and carry a per-table order-trust
    flag, so `let a = $.s.sort(-v).group_by(g) in a.first()` returns
    doc mode's first group instead of a shuffle-arbitrary one."""
    from pyspark.sql import Row

    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    rows_u = rows[:5] + [{"k": 99, "v": 7.5, "g": "g9"}]
    jt = Jetro.from_value(spark, {"s": rows, "u": rows_u})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string").repartition(8)
    u = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows_u],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t, "u": u})

    def canon(x):
        if isinstance(x, Row):
            return {k: canon(v) for k, v in x.asDict().items()}
        if isinstance(x, (list, tuple)):
            return [canon(e) for e in x]
        if isinstance(x, dict):
            return {k: canon(v) for k, v in x.items()}
        return x

    for e in ['let a = $.s.sort(-v).group_by(g) in a.first()',
              'let a = $.s.sort(-v).group_by(g) in a.keys()',
              'let a = $.s.sort(k).index_by(g) in a.first()',
              'let a = $.s.sort(k).count_by(g) in a.take(2)',
              'let a = $.s.sort(k).pivot(g, k) in a.keys()',
              'let d = $.u.equi_join($.u, "k", "k") in d.first()']:
        doc = canon(jt.collect(e))
        out = tables.query(e)
        cols = [c for c in out.columns if not c.startswith("__ord")]
        rel = [{c: canon(r[c]) for c in cols} if len(cols) > 1
               else canon(r[cols[0]]) for r in out.collect()]
        if isinstance(doc, list):
            want_opts = [doc]
        elif isinstance(doc, dict):
            # a dict is either ONE winner row (first()) or a keyed
            # OBJECT result → objrepr rows
            want_opts = [[doc],
                         [{"key": k, "value": v} for k, v in doc.items()]]
        else:
            want_opts = [[doc]]
        assert any(rel == w for w in want_opts), e


def test_comprehension_chaining_and_nested_loop_order(spark):
    """r10: method chains on a comprehension root were a one-sided
    'requires a table-rooted pipeline' CompileError; they now run as a
    pipeline over the comp output. Multi-generator comps reproduce the
    NESTED-LOOP document order by tagging each generator side with its
    scan position before the join; set comps keep first-seen insertion
    order — both only when an order-reading stage (or a let binding)
    demands it."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    rows_u = rows[:5] + [{"k": 99, "v": 7.5, "g": "g9"}]
    jt = Jetro.from_value(spark, {"s": rows, "u": rows_u})
    # NOT repartitioned: the comp's document order IS the table's scan
    # order, so a local-relation table must keep the list order for the
    # doc-mode comparison to be meaningful
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    u = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows_u],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t, "u": u})
    for e in ['[o.k for o in $.s if o.v > 40].first()',
              '[o.k for o in $.s].nth(2)',
              '[o.k for o in $.s if o.v > 40].reverse().take(3)',
              '{o.g for o in $.s}.count()',
              '{o.g for o in $.s}.first()',
              '{o.g for o in $.s}.reverse()',
              'let a = {o.g for o in $.s} in a.last()',
              '[[o.k, p.k] for o in $.s for p in $.u if o.g == p.g]'
              '.nth(4)',
              'let a = [[o.k, p.k] for o in $.s for p in $.u'
              ' if o.g == p.g] in a.take(3)']:
        doc = jt.collect(e)
        out = tables.query(e)
        cols = [c for c in out.columns if not c.startswith("__ord")]
        rel = [list(r[cols[0]]) if isinstance(r[cols[0]], list)
               else r[cols[0]] for r in out.collect()]
        want = doc if isinstance(doc, list) else [doc]
        # single array ELEMENT results (nth over array-valued comp)
        # stay one row holding the array
        if (want and isinstance(want[0], list)
                and not isinstance(doc, list)):
            pass
        if rel != want and len(rel) == 1 and rel[0] == doc:
            continue
        assert rel == want, e


def test_explode_source_comprehension_order(spark):
    """r10 companion: var-rooted generator sources (`for x in o.xs`)
    lower to posexplode under want_order — the element POSITION is the
    inner ordinal of the nested-loop document order."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    doc = {"t": [{"k": 1, "xs": [3, 1, 2]}, {"k": 2, "xs": [9, 8]},
                 {"k": 3, "xs": []}]}
    jt = Jetro.from_value(spark, doc)
    t = spark.createDataFrame([(1, [3, 1, 2]), (2, [9, 8]), (3, [])],
                              "k long, xs array<long>")
    tables = JetroTables(spark, {"t": t})
    for e in ['[[o.k, x] for o in $.t for x in o.xs].nth(3)',
              '[[o.k, x] for o in $.t for x in o.xs].take(4)',
              'let a = [[o.k, x] for o in $.t for x in o.xs]'
              ' in a.reverse().first()']:
        docv = jt.collect(e)
        out = tables.query(e)
        cols = [c for c in out.columns if not c.startswith("__ord")]
        rel = [list(r[cols[0]]) for r in out.collect()]
        want = docv if isinstance(docv[0], list) else [docv]
        assert rel == want, e


def test_let_bound_table_as_comprehension_source(spark):
    """r10: `for x in a` over a let-bound sub-plan was a one-sided
    'requires a table-rooted pipeline' CompileError; _table_of now
    resolves Ident sources, with the binding's order trust feeding the
    comp's own order contract."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t})
    for e in ['let a = $.s.filter(v > 40) in [x.k for x in a]',
              'let a = $.s.filter(v > 40) in [x.k for x in a].first()',
              'let a = $.s.sort(-k) in {x.g for x in a}.first()',
              'let a = $.s.sort(-v).group_by(g) in [x.key for x in a]']:
        doc = jt.collect(e)
        out = tables.query(e)
        rel = [r[out.columns[0]] for r in out.collect()]
        want = doc if isinstance(doc, list) else [doc]
        assert rel == want, e


def test_comp_over_untrusted_table_takes_warned_fallback(spark):
    """r11 advice: single-generator list/gen comps ignore want_order
    (no order is materialized — the output order IS the source table's
    scan order), so a positional sink over a comp whose source table is
    order-UNTRUSTED must take the warned doc fallback instead of
    silently certifying shuffle-arbitrary rows; _comp_multi/_set_body
    likewise must not mint monotonic-id doc-order tags over untrusted
    sources."""
    import warnings as W

    from jetro_spark.jql import parser as par
    from jetro_spark.jql.engine import JetroTables

    rows = [(i, float((i * 37) % 101), f"g{i % 3}") for i in range(17)]
    t = spark.createDataFrame(rows, "k long, v double, g string") \
             .repartition(8)
    u = spark.createDataFrame(rows[:5], "k long, v double, g string")

    # trust flags: the comp branch certifies order only for TRUSTED
    # sources, even under demand
    for trust in (True, False):
        jt2 = JetroTables(spark, {"s": t, "u": u},
                          ordered={"s": trust, "u": True})
        with W.catch_warnings():
            W.simplefilter("ignore")
            jt2.compile_node(par.parse("[x.k for x in $.s]"),
                             demand_order=True)
        assert getattr(jt2, "_pipe_end_ordered") is trust

    untrusted = JetroTables(spark, {"s": t, "u": u},
                            ordered={"s": False, "u": True})
    for e in ["[x.k for x in $.s].first()",
              "{x.g for x in $.s}.last()",
              "[[o.k, p.k] for o in $.s for p in $.u if o.g == p.g]"
              ".nth(2)"]:
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            out = untrusted.query(e)
            out.collect()
        assert any("single-task" in str(w.message) for w in rec), e

    # order-blind sinks over the same untrusted source stay relational
    for e in ["[x.k for x in $.s].count()",
              "{x.g for x in $.s}.count()"]:
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            untrusted.query(e).collect()
        assert not any("single-task" in str(w.message) for w in rec), e


def test_nested_let_threads_demand_order(spark):
    """r11 advice: compile_node(A.Let) dropped demand_order, so a
    NESTED binding (`let a = (let b = 1 in $.s.sort(-v).group_by(g))
    in a.first()`) compiled its keyed reducer without the binding-exit
    order demand — the sink read a shuffle-arbitrary group. The demand
    (and the child scope's end-of-pipeline trust) now thread through
    both _let branches."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string").repartition(8)
    tables = JetroTables(spark, {"s": t})
    for e in ['let a = (let b = 1 in $.s.sort(-v).group_by(g)) '
              'in a.first()',
              'let a = (let b = $.s.sort(-v).group_by(g) in b) '
              'in a.first()',
              'let a = (let b = 2 in $.s.sort(k).index_by(g)) '
              'in a.keys()']:
        doc = jt.collect(e)
        out = tables.query(e)
        cols = [c for c in out.columns if not c.startswith("__ord")]
        if isinstance(doc, dict) and "key" in out.columns:
            rel = [r["key"] for r in out.collect()]
            assert rel[:1] == [doc["key"]], e
        else:
            rel = [r[cols[0]] for r in out.collect()]
            want = doc if isinstance(doc, list) else [doc]
            assert rel == want, e


def test_equi_join_null_key_matches_null_bucket(spark):
    """r11 advice: the reference maps a PRESENT-but-null join key
    through val_to_key to the string "null" and MATCHES it
    (array.rs:505-531, util.rs:216-226) — only a MISSING key field
    skips. Spark's inner-join null==null never matches, so both modes
    previously dropped null-key rows one-sidedly. (Per-row missing
    fields are null after schema unification — the repo keys them
    "null" too, a documented ingestion-level conflation.)"""
    from jetro_spark.jql.engine import Jetro, JetroTables

    doc = {
        "orders": [{"oid": 1, "uid": 10}, {"oid": 2, "uid": None},
                   {"oid": 3, "uid": 11}],
        "users": [{"uid": None, "name": "ghost"},
                  {"uid": 10, "name": "ann"},
                  {"uid": None, "name": "ghost2"}],
    }
    jt = Jetro.from_value(spark, doc)
    got = jt.collect('$.orders.equi_join($.users, "uid", "uid")')
    # doc order: receiver order, right-array order within a key
    assert got == [
        {"oid": 1, "uid": 10, "name": "ann"},
        {"oid": 2, "uid": None, "name": "ghost"},
        {"oid": 2, "uid": None, "name": "ghost2"},
    ]

    o = spark.createDataFrame([(1, 10), (2, None), (3, 11)],
                              "oid long, uid long")
    u = spark.createDataFrame([(None, "ghost"), (10, "ann"),
                               (None, "ghost2")], "uid long, name string")
    tables = JetroTables(spark, {"orders": o, "users": u})
    out = tables.query('$.orders.equi_join($.users, "uid", "uid")')
    rel = sorted([(r["oid"], r["uid"], r["name"]) for r in out.collect()])
    assert rel == [(1, 10, "ann"), (2, None, "ghost"), (2, None, "ghost2")]
    # the relational plan must stay a hash-joinable equi join (the
    # eqNullSafe condition extracts as join keys — no BNLJ/cartesian)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_equi_join_string_null_key_collides_with_literal_null(spark):
    """r12 advice: val_to_key renders a present-null key as the STRING
    "null" (util.rs:216-226), which COLLIDES with a literal string key
    "null" (array.rs:505-531). String keys therefore must NOT take
    eqNullSafe (which keeps NULL and "null" distinct) — they route
    through the canonical coalesce(col, 'null') kwargs, like doc mode.
    Left k="null" matches BOTH right k="null" and right k=NULL."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    doc = {"o": [{"k": "null", "x": 1}, {"k": "a", "x": 2}],
           "u": [{"k": None, "y": 10}, {"k": "null", "y": 20},
                 {"k": "a", "y": 30}]}
    jt = Jetro.from_value(spark, doc)
    got = jt.collect('$.o.equi_join($.u, "k", "k")')
    assert got == [{"x": 1, "k": None, "y": 10},
                   {"x": 1, "k": "null", "y": 20},
                   {"x": 2, "k": "a", "y": 30}]

    o = spark.createDataFrame([("null", 1), ("a", 2)], "k string, x long")
    u = spark.createDataFrame([(None, 10), ("null", 20), ("a", 30)],
                              "k string, y long")
    tables = JetroTables(spark, {"o": o, "u": u})
    out = tables.query('$.o.equi_join($.u, "k", "k")')
    rel = sorted((r["x"], r["y"]) for r in out.collect())
    assert rel == [(1, 10), (1, 20), (2, 30)]
    # still a plain hash-joinable equi condition on the derived key
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bare_sort_null_elements_first_both_modes(spark):
    """r12 advice: bare ascending .sort() must place null ELEMENTS
    FIRST — the engine-wide null-first convention (keyed/desc
    comparator, relational (isNull, desc) entries). The old
    F.array_sort fast path pinned them LAST; sort_array is the native
    builtin with the right placement."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    doc = {"s": [{"k": 2, "v": 5.0}, {"k": None, "v": 6.0},
                 {"k": 1, "v": 7.0}]}
    jt = Jetro.from_value(spark, doc)
    assert jt.collect("$.s.map(k).sort()") == [None, 1, 2]
    # nulls stay first through a positional tail
    assert jt.collect("$.s.map(k).sort().first()") is None
    assert jt.collect("$.s.map(k).sort().reverse()") == [2, 1, None]

    s = spark.createDataFrame([(2, 5.0), (None, 6.0), (1, 7.0)],
                              "k long, v double")
    tables = JetroTables(spark, {"s": s})
    rel = [r[0] for r in tables.query("$.s.map(k).sort()").collect()]
    assert rel == [None, 1, 2]


def test_equi_join_cross_family_keys_render_canonically(spark):
    """Cross-kind keys match via val_to_key's STRING rendering: long 3
    joins string "3" and double 3.0 (both render "3"); a string key
    that isn't numeric never ANSI-throws."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    doc = {"l": [{"k": 3, "a": 1}, {"k": 4, "a": 2}],
           "r": [{"k": "3", "b": 10}, {"k": "x", "b": 20}]}
    jt = Jetro.from_value(spark, doc)
    got = jt.collect('$.l.equi_join($.r, "k", "k")')
    assert got == [{"a": 1, "k": "3", "b": 10}]

    ldf = spark.createDataFrame([(3, 1), (4, 2)], "k long, a long")
    rdf = spark.createDataFrame([("3", 10), ("x", 20)],
                                "k string, b long")
    tables = JetroTables(spark, {"l": ldf, "r": rdf})
    out = tables.query('$.l.equi_join($.r, "k", "k")')
    assert [(r["a"], r["k"], r["b"]) for r in out.collect()] \
        == [(1, "3", 10)]

    # double keys render without the trailing .0 ("74", not "74.0")
    ld2 = spark.createDataFrame([(3.0, 1), (4.5, 2)], "k double, a long")
    tables2 = JetroTables(spark, {"l": ld2, "r": rdf})
    out2 = tables2.query('$.l.equi_join($.r, "k", "k")')
    assert [(r["a"], r["b"]) for r in out2.collect()] == [(1, 10)]


def test_equi_join_missing_key_field_still_empty(spark):
    """A key field MISSING from the whole schema is a per-row None
    lookup (o.get → None → skip, array.rs:517-531): the join stays
    EMPTY — the synthesized null key must NOT ride the new "null"
    bucket into matching present-null right keys."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    jt = Jetro.from_value(spark, {
        "l": [{"a": 1}], "r": [{"k": None, "b": 10}, {"k": 3, "b": 20}]})
    assert jt.collect('$.l.equi_join($.r, "nope", "k")') == []

    ldf = spark.createDataFrame([(1,)], "a long")
    rdf = spark.createDataFrame([(None, 10), (3, 20)], "k long, b long")
    tables = JetroTables(spark, {"l": ldf, "r": rdf})
    assert tables.query('$.l.equi_join($.r, "nope", "k")').count() == 0


def test_sort_order_survives_right_wins_column_overwrite(spark):
    """r11 soak catch (duplicate-key d-table vocab): the carried sort
    order was a name-resolved Column expression, and equi_join's
    right-wins merge REBINDS those names — `sort(-v).equi_join(d,...)`
    re-sorted by the RIGHT side's v, interleaving each receiver row's
    matches wrongly. The order now rematerializes into hidden columns
    on the receiver before the merge (same class as _select_carry's
    map handling)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    rows_d = [
        {"k": 0, "v": 201.0, "g": "g1"}, {"k": 0, "v": 202.0, "g": "g2"},
        {"k": 3, "v": 203.0, "g": "g0"}, {"k": 3, "v": 204.0, "g": "g1"},
        {"k": 7, "v": 207.0, "g": "g7"},
    ]
    jt = Jetro.from_value(spark, {"s": rows, "d": rows_d})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string").repartition(8)
    d = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows_d],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t, "d": d})
    for e in ['$.s.sort(-v).equi_join($.d, "k", "k").first()',
              '$.s.sort(-v).equi_join($.d, "k", "k").take(4)',
              'let a = $.s.sort(-v).equi_join($.d, "k", "k") in '
              '$.s.sort(k).equi_join(a, "k", "k").take(3)']:
        doc = jt.collect(e)
        want = doc if isinstance(doc, list) else [doc]
        rel = [r.asDict() for r in tables.query(e).collect()]
        assert rel == want, e


def test_accumulate_null_elements_poison_like_doc_mode(spark):
    """r11 soak catch (null-key d-table vocab): the relational
    accumulate lowering was a window SUM, which SKIPS nulls, while doc
    mode's a + x fold null-PROPAGATES (a null element poisons every
    later position; the reference errors there — add_vals has no null
    arm — and the repo's distributed contract renders value-level type
    errors as null). The lowering now poisons from the first null term
    onward, and falls back for non-numeric terms (doc `+` on strings is
    concat, which the sum shape cannot express)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i} for i in range(5)] + [{"k": None}, {"k": 7}]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"],) for r in rows], "k long")
    tables = JetroTables(spark, {"s": t})
    e = "$.s.map(k).accumulate((a, x) => a + x, 0)"
    doc = jt.collect(e)
    assert doc == [0, 1, 3, 6, 10, None, None]
    out = tables.query(e)
    rel = [r[out.columns[0]] for r in out.collect()]
    assert rel == doc


def test_null_sort_keys_first_both_directions(spark):
    """r11: null sort keys place FIRST in both directions (doc-mode
    convention; the reference's null-equal comparator is non-transitive
    and unimplementable as a distributed total order) — encoded as an
    explicit isNull flag entry so reverse()'s flag flip and last/nth's
    inverted rendering move the nulls to the BACK exactly like
    reversing doc mode's sequence. Also pins last(n>=2) returning the
    tail in ORIGINAL order (the inverted limit emitted it reversed)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(6)]
    rows_d = [{"k": 0, "v": 201.0, "g": "g1"},
              {"k": None, "v": 205.0, "g": "gN"},
              {"k": None, "v": 206.0, "g": "gN2"},
              {"k": 7, "v": 207.0, "g": "g7"}]
    jt = Jetro.from_value(spark, {"s": rows, "d": rows_d})
    t = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string").repartition(8)
    d = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows_d],
                              "k long, v double, g string")
    tables = JetroTables(spark, {"s": t, "d": d})
    for e in ['$.s.union($.d).sort(k).map(g)',
              '$.s.union($.d).sort(-k).map(g)',
              '$.s.union($.d).sort(-k).last()',
              '$.s.union($.d).sort(k).reverse().map(g)',
              '$.s.union($.d).sort(-k).reverse().take(3)',
              '$.s.union($.d).sort(-k).nth(-2)',
              '$.s.sort(k).last(3).map(k)',
              '$.s.union($.d).sort(k).last(4)']:
        doc = jt.collect(e)
        want = doc if isinstance(doc, list) else [doc]
        out = tables.query(e)
        cols = [c for c in out.columns if not c.startswith("__ord")]
        rel = [r[cols[0]] if len(cols) == 1 else r.asDict()
               for r in out.collect()]
        assert rel == want, e


def test_set_ops_cross_family_fields_never_coerce(spark):
    """r12 soak catch (string-keyed join vocab): set-op membership over
    OBJECT rows whose same-named field has a different scalar family
    (k string vs k long) must never hand Spark an eqNullSafe to coerce
    — doc mode failed analysis and relational mode ANSI-crashed on the
    first non-numeric key. The reference keys members by val_to_key,
    where an object's key is its JSON serialization (quoted string
    fields never equal bare numbers): diff keeps everything, intersect
    keeps nothing, union appends everything (conflicting fields widen
    to VARIANT)."""
    from jetro_spark.jql.engine import Jetro, JetroTables, to_python

    doc = {"s": [{"k": "a", "v": 1.0}, {"k": "3", "v": 2.0}],
           "u": [{"k": 3, "v": 2.0}, {"k": 9, "v": 9.0}]}
    jt = Jetro.from_value(spark, doc)
    assert jt.collect("$.s.diff($.u)") == doc["s"]
    assert jt.collect("$.s.intersect($.u)") == []
    got = jt.collect("$.s.union($.u)")
    assert [e["k"] for e in got] == ["a", "3", 3, 9]

    s = spark.createDataFrame([("a", 1.0), ("3", 2.0)],
                              "k string, v double")
    u = spark.createDataFrame([(3, 2.0), (9, 9.0)], "k long, v double")
    import warnings as W
    with W.catch_warnings():
        W.simplefilter("ignore")
        tabs = JetroTables(spark, {"s": s, "u": u})
        assert [r["k"] for r in tabs.query("$.s.diff($.u)").collect()] \
            == ["a", "3"]
        assert tabs.query("$.s.intersect($.u)").collect() == []
        rel = [to_python(r["k"]) for r in
               JetroTables(spark, {"s": s, "u": u})
               .query("$.s.union($.u)").collect()]
        assert rel == ["a", "3", 3, 9]


def test_set_ops_cross_family_scalars_key_by_val_to_key(spark):
    """r12: BARE-scalar set ops key members by val_to_key
    (util.rs:216-226) — string "3" matches long 3 and removes it;
    non-numeric strings pass through; union's heterogeneous output
    widens to variant elements. Pre-fix all three ANSI-crashed in doc
    mode (string→bigint coercion inside the membership lambda) and the
    relational scalar path misfired its cross-shape arm on the
    incidental column-name mismatch."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    doc = {"s": [{"k": 1, "g": "3"}, {"k": 3, "g": "x"}],
           "u": [{"k": 3, "g": "y"}, {"k": 9, "g": "z"}]}
    jt = Jetro.from_value(spark, doc)
    assert jt.collect("$.s.map(g).diff($.u.map(k))") == ["x"]
    assert jt.collect("$.s.map(g).intersect($.u.map(k))") == ["3"]
    assert jt.collect("$.s.map(g).union($.u.map(k))") == ["3", "x", 9]

    s = spark.createDataFrame([(1, "3"), (3, "x")], "k long, g string")
    u = spark.createDataFrame([(3, "y"), (9, "z")], "k long, g string")
    import warnings as W
    with W.catch_warnings():
        W.simplefilter("ignore")
        for e, want in [("$.s.map(g).diff($.u.map(k))", ["x"]),
                        ("$.s.map(g).intersect($.u.map(k))", ["3"])]:
            got = [r[0] for r in
                   JetroTables(spark, {"s": s, "u": u}).query(e).collect()]
            assert got == want, e
        # union falls back to the doc lowering (variant elements)
        from jetro_spark.jql.engine import to_python
        got = [to_python(r[0]) for r in
               JetroTables(spark, {"s": s, "u": u})
               .query("$.s.map(g).union($.u.map(k))").collect()]
        assert got == ["3", "x", 9]
        # same-family scalars with mismatched incidental column names
        # flow the value path ("y"/"z" are absent, "x" stays)
        got = [r[0] for r in JetroTables(spark, {"s": s, "u": u})
               .query("$.s.map(g).diff($.u.map(x => x.g))").collect()]
        assert got == ["3", "x"]
        got = [r[0] for r in JetroTables(spark, {"s": s, "u": u})
               .query('$.s.map(g).intersect($.u.map(x => x.g))').collect()]
        assert got == []


def test_union_result_dtype_is_unified_element_type(spark):
    """r12 soak catch #3: doc-mode union's claimed result dtype was the
    RECEIVER's — but Spark's concat coerces (array<null> ++ array<long>
    → array<long>), so an all-null receiver made every downstream
    lambda compile against NullType and constant-fold (find_index over
    the appended longs returned -1). The dtype is now the UNIFIED
    element type."""
    from jetro_spark.jql.engine import Jetro

    doc = {"s": [{"k": 1}, {"k": 2}],
           "u": [{"k": 3, "v": 50.0}, {"k": 9, "v": 1.0}]}
    jt = Jetro.from_value(spark, doc)
    # receiver .map(g) over rows without g → all-null elements
    assert jt.collect(
        "$.s.map(g).union($.u.map(x => x.v)).find_index(x => x > 40)"
    ) == 2
    # long receiver ++ double other → folds in double; 1.0 is
    # SUPPRESSED by the receiver's 1 (val_to_key renders both "1",
    # and eqNullSafe compares them numerically — same verdict)
    assert jt.collect("$.s.map(k).union($.u.map(x => x.v)).sum()") == 53.0


def test_minby_padding_aqe_union_limit(spark):
    """r12 soak catch: Spark 4.1 AQE re-optimization can DROP a
    top-level Sort+GlobalLimit above a Union after one branch
    materializes empty (flaky, stage-order dependent) — collect()
    returned the min_by winner AND the scalar-null pad row while
    count() said 1. The priority-pick shapes (_pad_single_null, the
    min_by/max_by sink) now lower as ungrouped AGGREGATES (first /
    min_by over a struct), which are exactly-one-row by construction.
    This pins the exact soak expression; run it a few times — the
    original failure was stage-order dependent."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": i, "v": float((i * 37) % 101), "g": f"g{i % 3}"}
            for i in range(17)]
    rows_d = [
        {"k": 0, "v": 201.0, "g": "g1"}, {"k": 0, "v": 202.0, "g": "g2"},
        {"k": 3, "v": 203.0, "g": "g0"}, {"k": 3, "v": 204.0, "g": "g1"},
        {"k": None, "v": 205.0, "g": "gN"},
        {"k": None, "v": 206.0, "g": "gN"},
        {"k": 7, "v": 207.0, "g": "g7"},
    ]
    jt = Jetro.from_value(spark, {"s": rows, "d": rows_d})
    e = '$.s.sort(k).skip(4).equi_join($.d.sort(v), "k", "k").min_by(v)'
    want = jt.collect(e)
    assert want == {"k": 7, "v": 207.0, "g": "g7"}
    s = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows],
                              "k long, v double, g string")
    d = spark.createDataFrame([(r["k"], r["v"], r["g"]) for r in rows_d],
                              "k long, v double, g string")
    for _ in range(3):
        out = JetroTables(spark, {"s": s, "d": d}).query(e)
        got = [r.asDict() for r in out.collect()]
        assert got == [want], got
    # the empty-pipeline pad still yields exactly one all-null row
    out = JetroTables(spark, {"s": s, "d": d}).query(
        "$.s.filter(v > 9000).first()")
    got = out.collect()
    assert len(got) == 1 and all(x is None for x in got[0])


def test_extreme_by_null_keys_strict_improvement_fold(spark):
    """r11 probe catch: min_by/max_by are extreme_by_apply's
    strict-improvement FOLD (array.rs:341-375) — a null key compares
    EQUAL to everything (cmp_vals, util.rs:133), so null-keyed elements
    never improve and only win when the FIRST element's key is null
    (then nothing can beat it). The old sort-based forms crowned null
    keys on an end of the sort (doc: both directions; rel: min side)."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    a = [{"k": None, "v": 1.0}, {"k": 5, "v": 2.0}, {"k": 3, "v": 3.0},
         {"k": None, "v": 4.0}, {"k": 5, "v": 5.0}]
    b = [{"k": 5, "v": 2.0}, {"k": None, "v": 1.0}, {"k": 9, "v": 3.0},
         {"k": 9, "v": 4.0}]
    jt = Jetro.from_value(spark, {"a": a, "b": b})
    ta = spark.createDataFrame([(r["k"], r["v"]) for r in a],
                               "k long, v double")
    tb = spark.createDataFrame([(r["k"], r["v"]) for r in b],
                               "k long, v double")
    tables = JetroTables(spark, {"a": ta, "b": tb})
    want = {"$.a.min_by(k)": {"k": None, "v": 1.0},
            "$.a.max_by(k)": {"k": None, "v": 1.0},
            "$.b.min_by(k)": {"k": 5, "v": 2.0},
            "$.b.max_by(k)": {"k": 9, "v": 3.0}}
    for e, w in want.items():
        assert jt.collect(e) == w, ("doc", e)
        rel = [r.asDict() for r in tables.query(e).collect()]
        assert rel == [w], ("rel", e)


def test_find_first_no_match_pads_scalar_null(spark):
    """r13: find_first/find_one lower as filter(pred) + First
    (TerminalExprArg, defs.rs:975-1000) — the no-match case is the
    scalar Null, which relational mode represents as ONE all-null row
    (the _pad_single_null convention every other element sink already
    follows); pre-fix the empty rowset diverged from doc mode's None."""
    from jetro_spark.jql.engine import Jetro, JetroTables

    rows = [{"k": 1, "v": 10.0}, {"k": 2, "v": 20.0}]
    jt = Jetro.from_value(spark, {"s": rows})
    t = spark.createDataFrame([(r["k"], r["v"]) for r in rows],
                              "k long, v double")
    for e, doc_want in (("$.s.find_first(x => x.v > 9000.0)", None),
                        ("$.s.find_one(x => x.v > 15.0)",
                         {"k": 2, "v": 20.0})):
        assert jt.collect(e) == doc_want, ("doc", e)
        got = JetroTables(spark, {"s": t}).query(e).collect()
        assert len(got) == 1, ("rel rows", e)
        d = got[0].asDict()
        if doc_want is None:
            assert all(x is None for x in d.values()), ("rel pad", e)
        else:
            assert d == doc_want, ("rel", e)


# Pinned container build for the AQE Sort+GlobalLimit-above-Union drop
# (see scripts/aqe_repro.py and SCALE.md "AQE Sort+GlobalLimit-above-
# Union drop"). When this pin fails, the container's Spark changed:
# re-run `python scripts/aqe_repro.py 200` — if 0 runs leak, the
# upstream bug is fixed and the `_has_union` window guard
# (jql/engine.py _ordered_prefix and its call sites) can retire,
# restoring TakeOrderedAndProject to union+positional picks. Then
# update this pin and SCALE.md.
_AQE_BUG_SPARK_BUILD = (
    "4.1.2", "f0bb2e6a47d0ebda424ffd633fcea8644a597954")


def test_aqe_sentinel_spark_build_pinned(spark):
    """Deterministic half of the upstream-fix sentinel (r13 verdict
    item 2): fails the moment the container's Spark build changes, so
    the flaky-repro question ("can the window guard retire?") is
    re-asked exactly when it can have a new answer."""
    sc = spark.sparkContext
    mod = getattr(getattr(sc._jvm.org.apache.spark, "package$"),
                  "MODULE$")
    build = (spark.version, mod.SPARK_REVISION())
    assert build == _AQE_BUG_SPARK_BUILD, (
        "Spark build changed — re-run `python scripts/aqe_repro.py "
        "200`; if the drop no longer reproduces, retire the "
        "_has_union window guard (engine._ordered_prefix) and update "
        "this pin + SCALE.md. Observed build: %r" % (build,))


@pytest.mark.xfail(
    strict=False,
    reason="upstream Spark 4.1 AQE drops a Sort+GlobalLimit above a "
           "Union whose branch materializes empty (flaky, ~5-15%/run "
           "at 8 cores); XPASS across rounds on a NEW Spark build "
           "means the fix landed and the _has_union window guard can "
           "retire — see scripts/aqe_repro.py and SCALE.md")
def test_aqe_union_limit_drop_upstream_sentinel(spark):
    """Behavioral half of the sentinel: the r12 minimal repro RAW —
    the exact pre-fix min_by lowering plan rebuilt WITHOUT the window
    guard (scripts/aqe_repro.py replicates the f5a411b^ analyzed plan
    node-for-node; verified still firing 3/50 on the pinned build,
    2026-08-16). While the upstream bug reproduces this test flakily
    fails (= expected xfail); on a fixed Spark it passes every run."""
    import sys
    sys.path.insert(0, "/root/repo")
    from scripts.aqe_repro import run

    assert run(spark, 40, verbose=False) == 0
