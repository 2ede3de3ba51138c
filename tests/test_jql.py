"""End-to-end JQL compiler tests.

The 13 bench_lock queries (reference jetro-core/examples/bench_lock.rs:20-46)
run as jetro expression strings over a small deterministic document with the
same structure as the reference's synth_doc (bench_lock.rs:48-137), and the
results are checked against an INDEPENDENT plain-Python evaluation — the
same differential pattern the reference uses against jaq (SURVEY.md §5.6).
"""

from __future__ import annotations

import pytest

from jetro_spark.benchdoc import synth_doc
from jetro_spark.jql.engine import Jetro, JetroTables, objrepr_to_dict


@pytest.fixture(scope="module")
def doc():
    return synth_doc(n_orders=120, items_per_order=3)


@pytest.fixture(scope="module")
def jt(spark, doc):
    return Jetro.from_value(spark, doc)


# ------------------------------------------------------ bench_lock queries


def test_q1_project_deep(jt, doc):
    got = jt.collect("$.orders.map(customer.address.city)")
    assert got == [o["customer"]["address"]["city"] for o in doc["orders"]]


def test_q2_project_unique(jt, doc):
    got = jt.collect("$.orders.map(customer.address.country_code).unique()")
    seen, want = set(), []
    for o in doc["orders"]:
        cc = o["customer"]["address"]["country_code"]
        if cc not in seen:
            seen.add(cc)
            want.append(cc)
    assert got == want


def test_q3_filter_project(jt, doc):
    got = jt.collect("$.orders.filter(total > 500).map(id)")
    assert got == [o["id"] for o in doc["orders"] if o["total"] > 500]


def test_q4_multi_cond_count(jt, doc):
    got = jt.collect('$.orders.filter(status == "shipped" and priority == "high").count()')
    assert got == sum(
        1 for o in doc["orders"]
        if o["status"] == "shipped" and o["priority"] == "high")


def test_q5_deep_find_broad(jt, doc):
    got = jt.collect('$..find(@.status == "shipped")')
    assert got == [o for o in doc["orders"] if o["status"] == "shipped"]


def test_q6_deep_find_narrow(jt, doc):
    got = jt.collect('$..find(@.sku == "SKU-00042")')
    want = [it for o in doc["orders"] for it in o["items"] if it["sku"] == "SKU-00042"]
    assert got == want


def test_q7_deep_multi_pred(jt, doc):
    got = jt.collect('$..find(@.status == "shipped", @.priority == "urgent")')
    assert got == [o for o in doc["orders"]
                   if o["status"] == "shipped" and o["priority"] == "urgent"]


def test_q8_deep_total_sum(jt, doc):
    got = jt.collect("$..total.sum()")
    assert got == pytest.approx(sum(o["total"] for o in doc["orders"]))


def test_q9_deep_sku(jt, doc):
    got = jt.collect("$..sku")
    assert got == [it["sku"] for o in doc["orders"] for it in o["items"]]


def test_q10_group_by(jt, doc):
    got = objrepr_to_dict(jt.collect("$.orders.group_by(status)"))
    want: dict[str, list] = {}
    for o in doc["orders"]:
        want.setdefault(o["status"], []).append(o)
    assert list(got) == list(want)  # first-seen key order
    assert got == want


def test_q11_map_total_sum(jt, doc):
    got = jt.collect("$.orders.map(total).sum()")
    assert got == pytest.approx(sum(o["total"] for o in doc["orders"]))


def test_q12_map_total_max(jt, doc):
    got = jt.collect("$.orders.map(total).max()")
    assert got == max(o["total"] for o in doc["orders"])


def test_q13_list_comp(jt, doc):
    got = jt.collect("[o.id for o in $.orders if o.total > 1000]")
    assert got == [o["id"] for o in doc["orders"] if o["total"] > 1000]


# --------------------------------------------------- language constructs


def test_headline_books(spark):
    # README.md:43-62 headline query shape
    j = Jetro.from_value(spark, {
        "store": {"books": [
            {"title": "A", "price": 5.0, "tags": ["x"]},
            {"title": "B", "price": 15.0, "tags": ["sci-fi"]},
            {"title": "C", "price": 25.0, "tags": ["sci-fi", "x"]},
            {"title": "D", "price": 12.0, "tags": []},
        ]}})
    got = j.collect("$.store.books.filter(price > 10).sort(-price).map({title, price}).take(2)")
    assert got == [{"title": "C", "price": 25.0}, {"title": "B", "price": 15.0}]
    assert j.collect('$.store.books.filter(lambda b: b.tags.includes("sci-fi")).map(title)') \
        == ["B", "C"]
    assert j.collect("$.store.books[* if price > 10] => {title}") \
        == [{"title": "B"}, {"title": "C"}, {"title": "D"}]


def test_let_pipe_bind(jt, doc):
    got = jt.collect(
        "let top = $.orders.filter(total > 1500) in "
        "{count: top.len(), ids: top.map(id)}")
    want_ids = [o["id"] for o in doc["orders"] if o["total"] > 1500]
    assert got == {"count": len(want_ids), "ids": want_ids}
    assert jt.collect("$.orders -> os | os.count()") == len(doc["orders"])
    assert jt.collect("$.orders | filter(total > 1500) | map(id) | count()") \
        == len(want_ids)


def test_scalars_and_ops(spark):
    j = Jetro.from_value(spark, {"name": "  Ada ", "n": 7, "s": "42", "arr": [3, 1, 2]})
    assert j.collect("$.name.trim().upper()") == "ADA"
    assert j.collect("$.n / 2") == 3.5
    assert j.collect("$.s.parse_int() + 1") == 43
    assert j.collect("$.arr.sort()") == [1, 2, 3]
    assert j.collect("$.missing ?? 'dflt'") == "dflt"
    assert j.collect("'yes' if $.n > 5 else 'no'") == "yes"
    assert j.collect("try $.nope.deeper else 0") == 0
    assert j.collect("$.n kind number") is True
    assert j.collect("$.s as int") == 42
    assert j.collect("not $.missing") is True
    assert j.collect('f"n={$.n}, pi={3.14159:.2f}"') == "n=7, pi=3.14"
    assert j.collect("$.arr[-1]") == 2
    assert j.collect("$.arr[0:2]") == [3, 1]
    assert j.collect('$.name ~= "ada"') is True


def test_index_by_lookup(spark):
    # SYNTAX.md §9 join-via-index pattern
    j = Jetro.from_value(spark, {
        "users": [{"id": 1, "name": "ann"}, {"id": 2, "name": "bo"}],
        "orders": [{"user_id": 2, "total": 7.0}, {"user_id": 1, "total": 3.0}],
    })
    got = j.collect(
        "let idx = $.users.index_by(id) in "
        "$.orders.map({total, user: idx[(user_id).to_string()].name})")
    assert got == [{"total": 7.0, "user": "bo"}, {"total": 3.0, "user": "ann"}]


def test_doc_equi_join(spark):
    j = Jetro.from_value(spark, {
        "orders": [{"oid": 1, "uid": 10}, {"oid": 2, "uid": 11}, {"oid": 3, "uid": None}],
        "users": [{"uid": 10, "name": "ann"}, {"uid": 11, "name": "bo"}],
    })
    got = j.collect('$.orders.equi_join($.users, "uid", "uid")')
    # right wins on uid collision; the null-key row probes the "null"
    # bucket (val_to_key) and finds no match — dropped (array.rs:489-548)
    assert got == [{"oid": 1, "uid": 10, "name": "ann"},
                   {"oid": 2, "uid": 11, "name": "bo"}]


def test_comprehension_forms(jt, doc):
    got = jt.collect("{o.region for o in $.orders}")
    assert sorted(got) == sorted({o["region"] for o in doc["orders"]})
    d = objrepr_to_dict(jt.collect(
        "{o.id: o.total for o in $.orders if o.total > 1500}"))
    assert d == {str(o["id"]): o["total"] for o in doc["orders"] if o["total"] > 1500}


# ------------------------------------------------------- relational mode


@pytest.fixture(scope="module")
def rel(spark, tables):
    return JetroTables(spark, tables)


def test_rel_filter_map(rel, tables):
    df = rel.query("$.orders.filter(o_totalprice > 100000)"
                   ".map({id: o_orderkey, total: o_totalprice})")
    want = (tables["orders"].filter("o_totalprice > 100000")
            .selectExpr("o_orderkey id", "o_totalprice total"))
    assert df.columns == ["id", "total"]
    assert sorted(r["id"] for r in df.collect()) == sorted(r["id"] for r in want.collect())


def test_rel_sort_take(rel, tables):
    df = rel.query("$.orders.sort(-o_totalprice).take(5).map(o_orderkey)")
    want = [r["o_orderkey"] for r in
            tables["orders"].orderBy("o_totalprice", ascending=False).limit(5).collect()]
    assert [r["o_orderkey"] for r in df.collect()] == want


def test_rel_aggregates(rel, tables):
    n = tables["orders"].count()
    assert rel.query("$.orders.count()").first()["value"] == n
    got = rel.query("$.orders.map(o_totalprice).sum()").first()["value"]
    import pyspark.sql.functions as F
    want = tables["orders"].agg(F.sum("o_totalprice")).first()[0]
    assert got == pytest.approx(want)
    assert rel.query('$.orders.count(o_orderstatus == "F")').first()["value"] \
        == tables["orders"].filter("o_orderstatus = 'F'").count()


def test_rel_group_count_by(rel, tables):
    got = {r["key"]: r["value"] for r in
           rel.query("$.orders.count_by(o_orderstatus)").collect()}
    want = {r["o_orderstatus"]: r["count"] for r in
            tables["orders"].groupBy("o_orderstatus").count().collect()}
    assert got == want


def test_rel_comprehension(rel, tables):
    df = rel.query("[o.o_orderkey for o in $.orders if o.o_totalprice > 200000]")
    want = tables["orders"].filter("o_totalprice > 200000").count()
    assert df.count() == want


def test_rel_equi_join(rel, tables):
    df = rel.query('$.orders.equi_join($.customer, "o_custkey", "c_custkey")')
    assert df.count() == tables["orders"].join(
        tables["customer"],
        tables["orders"].o_custkey == tables["customer"].c_custkey).count()
    assert "c_name" in df.columns and "o_orderkey" in df.columns


def test_rel_doc_fallback_warns(rel, tables):
    import warnings as W

    # r8: unsorted reverse() LOWERS via the scan-order surrogate — no
    # fallback warning, same reversed-scan-order result
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        df = rel.query("$.nation.map(n_name).reverse()")
        rows = df.collect()
    assert not any("single-task" in str(w.message) for w in rec)
    want = [r["n_name"] for r in tables["nation"].collect()]
    assert [r["n_name"] for r in rows] == list(reversed(want))
    # a genuinely unlowerable stage (general accumulate fold) still
    # takes the warned single-task path
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        rel.query("$.nation.map(n_nationkey)"
                  ".accumulate((a, x) => a * x)").collect()
    assert any("single-task" in str(w.message) for w in rec)


# ------------------------------- multi-generator comprehensions (§2.5)


def test_comp_multi_gen_doc(spark):
    j = Jetro.from_value(spark, {"orders": [
        {"id": 1, "status": "paid",
         "items": [{"sku": "a", "qty": 2}, {"sku": "b", "qty": 1}]},
        {"id": 2, "status": "open", "items": [{"sku": "c", "qty": 5}]},
        {"id": 3, "status": "paid", "items": []},
    ], "tags": ["x", "y"]})
    got = j.collect('[{oid: o.id, sku: it.sku} for o in $.orders '
                    'for it in o.items if o.status == "paid"]')
    assert got == [{"oid": 1, "sku": "a"}, {"oid": 1, "sku": "b"}]
    # independent generators = cartesian product
    got = j.collect("[o.id for o in $.orders for t in $.tags]")
    assert got == [1, 1, 2, 2, 3, 3]
    # set comp dedups across the product
    got = j.collect("{t for o in $.orders for t in o.items.map(sku)}")
    assert sorted(got) == ["a", "b", "c"]


def test_comp_multi_gen_relational_join_plan(rel, tables):
    df = rel.query(
        "[{ok: o.o_orderkey, cname: c.c_name}"
        " for o in $.orders for c in $.customer"
        " if o.o_custkey == c.c_custkey and o.o_totalprice > 400000]")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the `if` equality must become a hash-join key, not an NLJ filter
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan
    want = (tables["orders"].filter("o_totalprice > 400000")
            .join(tables["customer"],
                  tables["orders"].o_custkey == tables["customer"].c_custkey)
            .count())
    assert df.count() == want


def test_comp_multi_gen_relational_explode(rel, tables):
    # second generator rooted at an earlier var → explode, not a join
    df = rel.query(
        "[{id: d.doc_id, w: word}"
        " for d in $.documents for word in d.text.words()]")
    total = df.count()
    import pyspark.sql.functions as F
    want = (tables["documents"]
            .select(F.explode(F.filter(
                F.split(F.trim("text"), r"\s+"),
                lambda w: F.length(w) > 0)))
            .count())
    assert total == want


def test_filter_pushdown_reaches_parquet(rel):
    df = rel.query("$.orders.filter(o_totalprice > 300000).map(o_orderkey)")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(o_totalprice,300000" in plan  # PushedFilters


# --------------------- quantifiers & dynamic object literals (§2.2/§2.12)


def test_quantifiers(spark):
    j = Jetro.from_value(spark, {
        "xs": [3, 1, 2],
        "books": [{"t": "a", "p": 5.0}, {"t": "b", "p": 15.0}]})
    # `?` on array → first-or-null (vm/exec.rs:776-780)
    assert j.collect("$.xs?") == 3
    assert j.collect("$.books.filter(p > 99)?") is None
    # `!` → unwrap exactly-one, error on 0 or >1 (vm/exec.rs:781-790)
    assert j.collect('$.books{t == "b"}!.p') == 15.0
    with pytest.raises(Exception, match="exactly one"):
        j.collect("$.books{p > 0}!")


def test_objlit_dynamic_key_set(spark):
    j = Jetro.from_value(spark, {"u": {"name": "Ada", "age": 37}, "maybe": None})
    # conditional fields genuinely DROP the key (SYNTAX.md §13)
    assert objrepr_to_dict(j.collect("{a?: $.maybe, b: 1}")) == {"b": 1}
    assert objrepr_to_dict(
        j.collect("{a: 1 when $.u.age > 99, b: 2}")) == {"b": 2}
    assert objrepr_to_dict(
        j.collect("{a: 1 when $.u.age > 9, b: 2}")) == {"a": 1, "b": 2}
    # dynamic keys, insertion order preserved
    assert j.collect("{[$.u.name]: 1, x: 2}.keys()") == ["Ada", "x"]
    # static dup last-wins even through the dynamic path
    assert objrepr_to_dict(
        j.collect("{a?: $.u.age, a: 9, b: 1}")) == {"a": 9, "b": 1}


def test_objlit_deep_spread(spark):
    j = Jetro.from_value(spark, {"d": {"x": {"y": 1, "z": 9}}})
    got = j.collect("{x: {y: 0, w: 2}, ...**$.d}")
    assert got == {"x": {"y": 1, "w": 2, "z": 9}}
    # shallow spread replaces wholesale
    got = j.collect("{x: {y: 0, w: 2}, ...$.d}")
    assert got == {"x": {"y": 1, "z": 9}}


def test_rel_let_bindings(rel, tables):
    # table-rooted binding = named sub-plan (no materialization)
    got = rel.query(
        "let top = $.orders.filter(o_totalprice > 300000) in top.count()"
    ).first()["value"]
    want = tables["orders"].filter("o_totalprice > 300000").count()
    assert got == want
    # scalar binding folds into every row scope
    got = rel.query(
        "let thr = 100000 * 3 in "
        "$.orders.filter(o_totalprice > thr).count()").first()["value"]
    assert got == want
    # bound sub-plan continues as a pipeline
    df = rel.query("let top = $.orders.sort(-o_totalprice).take(5) in "
                   "top.map({id: o_orderkey})")
    assert df.count() == 5 and df.columns == ["id"]


# ------------------------------- multi-document engine (JetroEngine analog)


def test_jetro_docs_per_row(spark):
    from jetro_spark.jql.engine import JetroDocs
    import json as _json

    docs = [
        {"id": 1, "user": {"name": "Ann"}, "items": [{"q": 2}, {"q": 3}]},
        {"id": 2, "user": {"name": "Bo"}, "items": [{"q": 5}]},
        {"id": 3, "user": {"name": "Cy"}, "items": []},
    ]
    df = spark.createDataFrame([(_json.dumps(d),) for d in docs], ["js"])
    jd = JetroDocs.from_json_strings(spark, df, "js")
    out = {r["value"] for r in jd.frame("$.items.map(q).sum()").collect()}
    assert out == {5.0, 5.0, 0.0} or out == {5, 0}  # sum([])=0 rule
    rows = jd.with_result("$.user.name.upper()", "uname") \
        .select("uname").collect()
    assert sorted(r["uname"] for r in rows) == ["ANN", "BO", "CY"]
    # ONE compiled plan, N documents — plan cache hit on repeat
    assert jd._compile("$.id") is jd._compile("$.id")


def test_chained_pipelines_stay_linear(spark):
    """Canary for the HOF no-CSE hazard (r6): builtins that reference
    their input inside a per-element lambda must let_-bind it, or a
    chained pipeline re-evaluates its upstream per element — the
    unbound zscore chain was O(n³) and could not finish 2,000 elements
    in 10 MINUTES. Bound, 20,000 elements run in well under a second;
    the 60 s ceiling leaves two orders of magnitude of machine-noise
    margin while still failing hard on any quadratic-or-worse
    reintroduction."""
    import time

    jt = Jetro.from_value(spark, synth_doc(20_000, 1))
    t0 = time.time()
    for expr in ("$.orders.map(total).zscore().last()",
                 "$.orders.map(total).rolling_avg(20).last()",
                 "$.orders.map(total).window(100).count()",
                 "$.orders.map(total).accumulate((a, x) => a + x).last()",
                 "$.orders.group_by(status).count()"):
        jt.execute(expr)
    assert time.time() - t0 < 60, "chained doc pipelines no longer linear"
