"""Golden-value tests for jetro builtin Column builders, mirroring the
reference's fixture-driven exact-value test style (SURVEY.md §5:
assert_eq!(result, json!(...)))."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from jetro_spark.functions import arrays as A
from jetro_spark.functions import strings as S
from jetro_spark.functions.core import (
    jt_div,
    jt_element_at,
    jt_fuzzy_match,
    jt_slice,
    jt_truthy,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


# ------------------------------------------------------------- core shims


def test_let_binding(spark):
    """let_ must be value-transparent for every input kind: scalars,
    arrays, structs, and NULLs of each (null propagates into the body
    exactly as the unbound expression would see it)."""
    from jetro_spark.functions.core import let_

    assert one(spark, let_(F.lit(21), lambda x: x * 2)) == 42
    assert one(spark, let_(F.lit(None).cast("long"),
                           lambda x: x * 2)) is None
    assert one(spark, let_(F.array(F.lit(1), F.lit(2)),
                           lambda a: F.size(a) + F.element_at(a, 1))) == 3
    assert one(spark, let_(F.lit(None).cast("array<long>"),
                           lambda a: F.size(a))) in (None, -1)
    got = one(spark, let_(F.struct(F.lit(7).alias("k")), lambda s: s["k"]))
    assert got == 7
    # nested lets bind independently
    assert one(spark, let_(F.lit(2), lambda a: let_(
        F.lit(3), lambda b: a * b))) == 6


def test_truthiness(spark):
    # reference: jc/util.rs:63-74
    assert one(spark, jt_truthy(F.lit(None).cast("string"), T.StringType())) is False
    assert one(spark, jt_truthy(F.lit(0), T.LongType())) is False
    assert one(spark, jt_truthy(F.lit(3), T.LongType())) is True
    assert one(spark, jt_truthy(F.lit(""), T.StringType())) is False
    assert one(spark, jt_truthy(F.lit("x"), T.StringType())) is True
    assert one(spark, jt_truthy(F.array(), T.ArrayType(T.LongType()))) is False
    assert one(spark, jt_truthy(F.array(F.lit(1)), T.ArrayType(T.LongType()))) is True


def test_float_division(spark):
    # reference: jc/parse/ast.rs:368-370 — int/int is float division
    assert one(spark, jt_div(F.lit(7), F.lit(2))) == 3.5


def test_indexing(spark):
    arr = F.array(F.lit(10), F.lit(20), F.lit(30))
    assert one(spark, jt_element_at(arr, 0)) == 10
    assert one(spark, jt_element_at(arr, 2)) == 30
    assert one(spark, jt_element_at(arr, -1)) == 30
    assert one(spark, jt_element_at(arr, 5)) is None  # OOB → null


def test_slices(spark):
    # reference: half-open, open ends, negatives (SYNTAX.md:84-97)
    arr = F.array(*[F.lit(i) for i in range(5)])  # [0,1,2,3,4]
    assert one(spark, jt_slice(arr, 1, 3)) == [1, 2]
    assert one(spark, jt_slice(arr, None, 2)) == [0, 1]
    assert one(spark, jt_slice(arr, 3, None)) == [3, 4]
    assert one(spark, jt_slice(arr, -2, None)) == [3, 4]
    assert one(spark, jt_slice(arr, None, -1)) == [0, 1, 2, 3]
    assert one(spark, jt_slice(arr, 10, 20)) == []


def test_fuzzy(spark):
    assert one(spark, jt_fuzzy_match(F.lit("Hello World"), F.lit("WORLD"))) is True
    assert one(spark, jt_fuzzy_match(F.lit("Hello"), F.lit("xyz"))) is False


# --------------------------------------------------------------- strings


def test_cases(spark):
    assert one(spark, S.snake_case(F.lit("helloWorld Foo-bar"))) == "hello_world_foo_bar"
    assert one(spark, S.kebab_case(F.lit("helloWorld foo_bar"))) == "hello-world-foo-bar"
    assert one(spark, S.camel_case(F.lit("hello world_foo-bar"))) == "helloWorldFooBar"
    assert one(spark, S.pascal_case(F.lit("hello world"))) == "HelloWorld"
    assert one(spark, S.capitalize(F.lit("hello"))) == "Hello"
    assert one(spark, S.title_case(F.lit("hello world"))) == "Hello World"


def test_pad(spark):
    assert one(spark, S.pad_left(F.lit("ab"), 5, "*")) == "***ab"
    assert one(spark, S.pad_right(F.lit("ab"), 5, "*")) == "ab***"
    assert one(spark, S.pad_left(F.lit("abcdef"), 3, "*")) == "abcdef"  # no truncate
    assert one(spark, S.center(F.lit("ab"), 6, "-")) == "--ab--"


def test_affix(spark):
    assert one(spark, S.strip_prefix(F.lit("foobar"), "foo")) == "bar"
    assert one(spark, S.strip_prefix(F.lit("foobar"), "xxx")) == "foobar"
    assert one(spark, S.strip_suffix(F.lit("foobar"), "bar")) == "foo"
    assert one(spark, S.index_of(F.lit("hello"), "l")) == 2
    assert one(spark, S.index_of(F.lit("hello"), "z")) == -1


def test_replace_first_vs_all(spark):
    # reference: string.rs:100 — replace = first only, replace_all = all
    assert one(spark, S.replace(F.lit("a.a.a"), ".", "-")) == "a-a.a"
    assert one(spark, S.replace_all(F.lit("a.a.a"), ".", "-")) == "a-a-a"


def test_regex(spark):
    assert one(spark, S.re_match(F.lit("abc123"), r"\d+")) is True
    assert one(spark, S.re_match_first(F.lit("a1b22c333"), r"\d+")) == "1"
    assert one(spark, S.re_match_all(F.lit("a1b22c333"), r"\d+")) == ["1", "22", "333"]
    assert one(spark, S.re_replace(F.lit("a1b2"), r"\d", "X")) == "aXb2"
    assert one(spark, S.re_replace_all(F.lit("a1b2"), r"\d", "X")) == "aXbX"


def test_encoding_roundtrip(spark):
    assert one(spark, S.from_base64(S.to_base64(F.lit("héllo")))) == "héllo"
    assert one(spark, S.html_escape(F.lit('<a href="x">&'))) == "&lt;a href=&quot;x&quot;&gt;&amp;"
    assert one(spark, S.html_unescape(S.html_escape(F.lit('<a "b" & c>')))) == '<a "b" & c>'


def test_parse(spark):
    assert one(spark, S.parse_int(F.lit("42"))) == 42
    assert one(spark, S.parse_int(F.lit("nope"))) is None
    assert one(spark, S.parse_bool(F.lit("true"))) is True
    assert one(spark, S.parse_bool(F.lit("0"))) is False


# ---------------------------------------------------------------- arrays


def arr_lit(*vals):
    return F.array(*[F.lit(v) for v in vals])


def test_filter_map_hof(spark):
    a = arr_lit(1, 2, 3, 4)
    assert one(spark, A.filter_(a, lambda x: x > 2)) == [3, 4]
    assert one(spark, A.map_(a, lambda x: x * 10)) == [10, 20, 30, 40]
    assert one(spark, A.flat_map(F.array(arr_lit(1, 2), arr_lit(3)), lambda x: x)) == [1, 2, 3]


def test_take_drop_while(spark):
    a = arr_lit(1, 2, 5, 1, 2)
    assert one(spark, A.take_while(a, lambda x: x < 3)) == [1, 2]
    assert one(spark, A.drop_while(a, lambda x: x < 3)) == [5, 1, 2]


def test_find(spark):
    a = arr_lit(5, 8, 2, 8)
    assert one(spark, A.find_first(a, lambda x: x > 6)) == 8
    assert one(spark, A.find_index(a, lambda x: x > 6)) == 1
    assert one(spark, A.find_index(a, lambda x: x > 99)) == -1
    assert one(spark, A.indices_where(a, lambda x: x == 8)) == [1, 3]


def test_sort(spark):
    a = arr_lit(3, 1, 2)
    assert one(spark, A.sort(a)) == [1, 2, 3]
    assert one(spark, A.sort(a, desc=True)) == [3, 2, 1]
    structs = F.array(
        F.struct(F.lit("b").alias("k"), F.lit(2).alias("v")),
        F.struct(F.lit("a").alias("k"), F.lit(1).alias("v")),
    )
    assert one(spark, A.map_(A.sort(structs, key=lambda s: s["k"]), lambda s: s["v"])) == [1, 2]


def test_positional(spark):
    a = arr_lit(1, 2, 3, 4, 5)
    assert one(spark, A.first(a)) == 1
    assert one(spark, A.first(a, 2)) == [1, 2]
    assert one(spark, A.last(a)) == 5
    assert one(spark, A.last(a, 2)) == [4, 5]
    assert one(spark, A.nth(a, -2)) == 4
    assert one(spark, A.take(a, 3)) == [1, 2, 3]
    assert one(spark, A.skip(a, 3)) == [4, 5]


def test_windows(spark):
    a = arr_lit(1, 2, 3, 4)
    assert one(spark, A.pairwise(a)) == [[1, 2], [2, 3], [3, 4]]
    assert one(spark, A.window(a, 3)) == [[1, 2, 3], [2, 3, 4]]
    assert one(spark, A.chunk(a, 3)) == [[1, 2, 3], [4]]
    en = one(spark, A.enumerate_(arr_lit("a", "b")))
    assert [(e["index"], e["value"]) for e in en] == [(0, "a"), (1, "b")]


def test_set_ops(spark):
    a, b = arr_lit(1, 2, 3), arr_lit(2, 3, 4)
    assert one(spark, A.diff(a, b)) == [1]
    assert one(spark, A.intersect(a, b)) == [2, 3]
    assert one(spark, A.union(a, b)) == [1, 2, 3, 4]
    assert one(spark, A.includes(a, F.lit(2))) is True
    assert one(spark, A.index(a, F.lit(3))) == 2


def test_aggregates(spark):
    a = arr_lit(1.0, 2.0, 3.0)
    assert one(spark, A.sum_(a)) == 6.0
    assert one(spark, A.sum_(F.array().cast("array<double>"))) == 0.0  # sum([]) = 0
    assert one(spark, A.avg(a)) == 2.0
    assert one(spark, A.avg(F.array().cast("array<double>"))) is None  # avg([]) = null
    assert one(spark, A.min_(a)) == 1.0
    assert one(spark, A.max_(a)) == 3.0
    assert one(spark, A.count(a)) == 3
    assert one(spark, A.count(a, lambda x: x > 1.5)) == 2
    assert one(spark, A.any_(a, lambda x: x > 2.5)) is True
    assert one(spark, A.all_(a, lambda x: x > 0)) is True
    assert one(spark, A.all_(a, lambda x: x > 1)) is False


def test_group_by_doc_mode(spark):
    structs = F.array(
        F.struct(F.lit("x").alias("k"), F.lit(1).alias("v")),
        F.struct(F.lit("y").alias("k"), F.lit(2).alias("v")),
        F.struct(F.lit("x").alias("k"), F.lit(3).alias("v")),
    )
    g = one(spark, A.group_by(structs, lambda s: s["k"]))
    assert [e["key"] for e in g] == ["x", "y"]  # first-seen order
    assert [len(e["value"]) for e in g] == [2, 1]
    c = one(spark, A.count_by(structs, lambda s: s["k"]))
    assert [(e["key"], e["value"]) for e in c] == [("x", 2), ("y", 1)]
    i = one(spark, A.index_by(structs, lambda s: s["k"]))
    assert i[0]["value"]["v"] == 3  # last wins


def test_unique_by(spark):
    structs = F.array(
        F.struct(F.lit("x").alias("k"), F.lit(1).alias("v")),
        F.struct(F.lit("x").alias("k"), F.lit(2).alias("v")),
        F.struct(F.lit("y").alias("k"), F.lit(3).alias("v")),
    )
    u = one(spark, A.unique_by(structs, lambda s: s["k"]))
    assert [(e["k"], e["v"]) for e in u] == [("x", 1), ("y", 3)]  # first kept


def test_analytics_doc_mode(spark):
    a = arr_lit(1.0, 3.0, 2.0, 5.0)
    assert one(spark, A.lag(a, 1)) == [None, 1.0, 3.0, 2.0]
    assert one(spark, A.lead(a, 1)) == [3.0, 2.0, 5.0, None]
    assert one(spark, A.rolling(a, 2, "sum")) == [None, 4.0, 5.0, 7.0]
    assert one(spark, A.cum_max(a)) == [1.0, 3.0, 3.0, 5.0]
    assert one(spark, A.cum_min(a)) == [1.0, 1.0, 1.0, 1.0]
    assert one(spark, A.diff_window(a)) == [None, 2.0, -1.0, 3.0]
    pc = one(spark, A.pct_change(a))
    assert pc[0] is None and abs(pc[1] - 2.0) < 1e-12
    # population stddev (zscore_apply divides var by n): sd(1,2,3)=sqrt(2/3)
    zs = one(spark, A.zscore(arr_lit(1.0, 2.0, 3.0)))
    sd = (2.0 / 3.0) ** 0.5
    assert abs(zs[0] + 1.0 / sd) < 1e-12 and abs(zs[1]) < 1e-12 \
        and abs(zs[2] - 1.0 / sd) < 1e-12
    # sd == 0 → 0.0 for numeric positions (not null, not NaN)
    assert one(spark, A.zscore(arr_lit(5.0, 5.0))) == [0.0, 0.0]


def test_min_max_by(spark):
    structs = F.array(
        F.struct(F.lit("a").alias("k"), F.lit(5).alias("v")),
        F.struct(F.lit("b").alias("k"), F.lit(1).alias("v")),
    )
    assert one(spark, A.min_by(structs, lambda s: s["v"]))["k"] == "b"
    assert one(spark, A.max_by(structs, lambda s: s["v"]))["k"] == "a"


def test_accumulate(spark):
    a = arr_lit(1.0, 2.0, 3.0)
    assert one(spark, A.accumulate(a, lambda acc, x: acc + x)) == [1.0, 3.0, 6.0]


def test_partition_zip(spark):
    a = arr_lit(1, 5, 2, 8)
    p = one(spark, A.partition(a, lambda x: x > 3))
    assert p["pass"] == [5, 8] and p["fail"] == [1, 2]
    assert one(spark, A.zip_(arr_lit(1, 2, 3), arr_lit(4, 5))) == [[1, 4], [2, 5]]
    z = one(spark, A.zip_longest(arr_lit(1, 2, 3), arr_lit(4, 5)))
    assert z == [[1, 4], [2, 5], [3, None]]


# ------------------------------------------------------------ stragglers


def _scalar(spark, expr):
    from jetro_spark.jql.engine import Jetro
    return Jetro.from_value(spark, {}).collect(expr)


def test_scan(spark):
    assert _scalar(spark, '"abcabcab".scan("ab")') == ["ab", "ab", "ab"]
    assert _scalar(spark, '"xyz".scan("ab")') == []


def test_last_index_of_string(spark):
    assert _scalar(spark, '"abcabc".last_index_of("bc")') == 4
    assert _scalar(spark, '"abcabc".last_index_of("zz")') == -1


def test_indices_of_and_last_index_array(spark):
    from jetro_spark.jql.engine import Jetro
    jj = Jetro.from_value(spark, {"xs": [1, 2, 1, 3, 1]})
    assert jj.collect("$.xs.indices_of(1)") == [0, 2, 4]
    assert jj.collect("$.xs.last_index_of(1)") == 4
    assert jj.collect("$.xs.indices_of(9)") == []
    assert jj.collect("$.xs.last_index_of(9)") == -1


def test_to_bool(spark):
    assert _scalar(spark, '"true".to_bool()') is True
    assert _scalar(spark, '"false".to_bool()') is False
    assert _scalar(spark, '"yes".to_bool()') is None


def test_dedent(spark):
    from jetro_spark.jql.engine import Jetro
    jj = Jetro.from_value(spark, {"s": "    a\n      b\n    c"})
    assert jj.collect("$.s.dedent()") == "a\n  b\nc"


def test_bytes(spark):
    assert _scalar(spark, '"AB".bytes()') == [65, 66]
    assert _scalar(spark, '"".bytes()') == []
    # multi-byte UTF-8 (é = 0xC3 0xA9)
    assert _scalar(spark, '"é".bytes()') == [195, 169]


def test_zip_shape(spark):
    from jetro_spark.jql.engine import Jetro
    jj = Jetro.from_value(spark, {"n": 7})
    assert jj.collect("$.n.zip_shape(a: @ + 1, b: @ * 2)") == {"a": 8, "b": 14}


def test_group_shape(spark):
    from jetro_spark.jql.engine import Jetro
    from jetro_spark.jql.engine import objrepr_to_dict
    jj = Jetro.from_value(spark, {"xs": [
        {"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3}]})
    out = jj.collect("$.xs.group_shape(lambda x: x.k, lambda g: g.map(v).sum())")
    assert objrepr_to_dict(out) == {"a": 4.0, "b": 2.0}


# --------------------------------------------- JSON/CSV conversion (§2.1)


def test_to_json_scalars(spark):
    from jetro_spark.jql.engine import Jetro
    assert _scalar(spark, "5.to_json()") == "5"
    assert _scalar(spark, "true.to_json()") == "true"
    assert _scalar(spark, "null.to_json()") == "null"
    # string escaping is exact (quote in the value)
    jj = Jetro.from_value(spark, {"s": 'a"b'})
    assert jj.collect("$.s.to_json()") == '"a\\"b"'


def test_to_json_object_array(spark):
    from jetro_spark.jql.engine import Jetro
    jj = Jetro.from_value(spark, {"o": {"x": 1, "y": "z"}, "a": [1, 2]})
    assert jj.collect("$.o.to_json()") == '{"x":1,"y":"z"}'
    assert jj.collect("$.a.to_json()") == "[1,2]"


def test_from_json_roundtrip(spark):
    from jetro_spark.jql.engine import Jetro
    # regression.rs:954 from_json_to_json
    jj = Jetro.from_value(spark, {"s": '{"x":1}'})
    assert jj.collect("$.s.from_json()") == {"x": 1}
    assert '"x"' in jj.collect("$.s.from_json().to_json()")


def test_from_json_scalar_and_array(spark):
    from jetro_spark.jql.engine import Jetro
    jj = Jetro.from_value(spark, {"s": "[1,2,3]", "n": "42"})
    assert jj.collect("$.s.from_json()") == [1, 2, 3]
    assert jj.collect("$.n.from_json()") == 42


def test_from_json_invalid_try_else(spark):
    from jetro_spark.jql.engine import Jetro
    # regression.rs:1162: try catches the parse error
    jj = Jetro.from_value(spark, {"s": "bad"})
    assert jj.collect("try $.s.from_json() else null") is None


def test_to_csv(spark):
    from jetro_spark.jql.engine import Jetro
    jj = Jetro.from_value(spark, {"rows": [
        {"a": 1, "b": "x,y"}, {"a": 2, "b": "plain"}]})
    assert jj.collect("$.rows.to_csv()") == '1,"x,y"\n2,plain'
    assert jj.collect("$.rows.to_tsv()") == "1\tx,y\n2\tplain"


def test_to_csv_nested_and_scalar_rows(spark):
    from jetro_spark.jql.engine import Jetro
    jj = Jetro.from_value(spark, {"m": [[1, 2], [3, 4]], "xs": [1, 2]})
    assert jj.collect("$.m.to_csv()") == "1,2\n3,4"
    assert jj.collect("$.xs.to_csv()") == "1\n2"


def test_unique_keeps_first_occurrence_order(spark):
    """r11 mutation-audit hole: unique() dedups keeping FIRST occurrence
    in document order (ops/collection.rs:77 — IndexSet insertion order);
    no prior test pinned the ORDER, only the multiset."""
    arr = F.array(*[F.lit(i) for i in (2, 1, 2, 3, 1)])
    assert one(spark, A.unique(arr)) == [2, 1, 3]
