"""Patches & chain-writes (§2.11) — goldens ported from the reference's
jc/tests/chain_write.rs (652 LoC). Semantics: sequential clauses, `when`
guards against the pre-patch doc, `@` = pre-write leaf, DELETE sentinel,
chain-write desugar on document roots, Phase-B pipe/object/let fusion."""

from __future__ import annotations

import pytest

from jetro_spark.jql.compiler import CompileError
from jetro_spark.jql.engine import Jetro


@pytest.fixture(scope="module")
def J(spark):
    def run(doc, expr):
        return Jetro.from_value(spark, doc).collect(expr)
    return run


# ---------------------------------------------------------- patch blocks


def test_patch_simple_field_replace(J):
    assert J({"name": "Alice", "age": 30}, 'patch $ { name: "Bob" }') == \
        {"name": "Bob", "age": 30}


def test_patch_nested_field_replace(J):
    assert J({"user": {"name": "Alice", "age": 30}},
             'patch $ { user.name: "Bob" }') == \
        {"user": {"name": "Bob", "age": 30}}


def test_patch_delete_field(J):
    assert J({"name": "Alice", "tmp": "remove-me", "age": 30},
             "patch $ { tmp: DELETE }") == {"name": "Alice", "age": 30}


def test_patch_add_new_field(J):
    assert J({"name": "Alice"}, "patch $ { age: 42 }") == \
        {"name": "Alice", "age": 42}


def test_patch_wildcard_array(J):
    doc = {"users": [{"name": "Alice", "seen": False},
                     {"name": "Bob", "seen": False}]}
    assert J(doc, "patch $ { users[*].seen: true }") == \
        {"users": [{"name": "Alice", "seen": True},
                   {"name": "Bob", "seen": True}]}


def test_patch_wildcard_filter(J):
    doc = {"users": [{"name": "Alice", "active": True, "role": "user"},
                     {"name": "Bob", "active": False, "role": "user"},
                     {"name": "Cara", "active": True, "role": "user"}]}
    assert J(doc, 'patch $ { users[* if active].role: "admin" }') == \
        {"users": [{"name": "Alice", "active": True, "role": "admin"},
                   {"name": "Bob", "active": False, "role": "user"},
                   {"name": "Cara", "active": True, "role": "admin"}]}


def test_patch_uses_current_value(J):
    doc = {"users": [{"name": "Alice", "email": "ALICE@X"},
                     {"name": "Bob", "email": "BOB@X"}]}
    assert J(doc, "patch $ { users[*].email: @.lower() }") == \
        {"users": [{"name": "Alice", "email": "alice@x"},
                   {"name": "Bob", "email": "bob@x"}]}


def test_patch_conditional_when_truthy(J):
    assert J({"count": 5, "enabled": True},
             "patch $ { count: @ + 1 when $.enabled }") == \
        {"count": 6, "enabled": True}


def test_patch_conditional_when_falsy_skips(J):
    assert J({"count": 5, "enabled": False},
             "patch $ { count: @ + 1 when $.enabled }") == \
        {"count": 5, "enabled": False}


def test_patch_multiple_ops_in_order(J):
    assert J({"a": 1, "b": 2, "c": 3}, "patch $ { a: 10, b: DELETE, c: 30 }") \
        == {"a": 10, "c": 30}


def test_patch_index_access(J):
    assert J({"items": [10, 20, 30]}, "patch $ { items[1]: 99 }") == \
        {"items": [10, 99, 30]}


def test_patch_negative_index(J):
    assert J({"items": [10, 20, 30]}, "patch $ { items[-1]: 99 }") == \
        {"items": [10, 20, 99]}


def test_patch_delete_from_wildcard(J):
    doc = {"users": [{"name": "Alice", "active": True},
                     {"name": "Bob", "active": False},
                     {"name": "Cara", "active": True}]}
    assert J(doc, "patch $ { users[* if not active]: DELETE }") == \
        {"users": [{"name": "Alice", "active": True},
                   {"name": "Cara", "active": True}]}


def test_patch_composes_pipe(J):
    assert J({"name": "Alice", "age": 30},
             'patch $ { name: "Bob" } | @.name') == "Bob"


def test_patch_composes_method_chain(J):
    keys = J({"name": "Alice", "age": 30}, 'patch $ { name: "Bob" }.keys()')
    assert sorted(keys) == ["age", "name"]


def test_patch_composes_nested_in_object(J):
    assert J({"name": "Alice"}, '{result: patch $ { name: "Bob" }}') == \
        {"result": {"name": "Bob"}}


def test_patch_composes_let_binding(J):
    assert J({"name": "Alice", "age": 30},
             'let x = patch $ { name: "Bob" } in x.name') == "Bob"


def test_patch_composes_nested_patch(J):
    assert J({"name": "Alice", "age": 30},
             'patch (patch $ { name: "Bob" }) { age: 99 }') == \
        {"name": "Bob", "age": 99}


def test_patch_composes_inside_map(J):
    assert J({"users": [{"n": 1}, {"n": 2}, {"n": 3}]},
             "$.users.map(patch @ { n: @ * 10 })") == \
        [{"n": 10}, {"n": 20}, {"n": 30}]


def test_delete_mark_outside_patch_errors(J):
    with pytest.raises(CompileError):
        J({}, "DELETE")


# ------------------------------------------------- batched-trie semantics


def test_batched_three_disjoint_writes(J):
    assert J({"a": 0, "b": 0, "c": 0, "d": 0}, "patch $ { a: 1, b: 2, c: 3 }") \
        == {"a": 1, "b": 2, "c": 3, "d": 0}


def test_batched_sibling_writes_share_parent(J):
    assert J({"user": {"name": "?", "role": "?"}},
             'patch $ { user.name: "alice", user.role: "admin" }') == \
        {"user": {"name": "alice", "role": "admin"}}


def test_batched_nested_overlap_last_wins(J):
    assert J({"a": 1}, "patch $ { a: {x: 1}, a.x: 2 }") == {"a": {"x": 2}}


def test_batched_array_index_writes(J):
    assert J({"items": [0, 0, 0]}, "patch $ { items[0]: 10, items[1]: 20 }") \
        == {"items": [10, 20, 0]}


def test_batched_delete_and_replace(J):
    assert J({"a": 0, "b": 0}, "patch $ { a: DELETE, b: 1 }") == {"b": 1}


def test_batched_insert_missing_field(J):
    assert J({"name": "Alice"},
             'patch $ { meta.role: "admin", meta.active: true }') == \
        {"name": "Alice", "meta": {"role": "admin", "active": True}}


def test_batched_modify_uses_old_value(J):
    assert J({"a": 5, "b": 10}, "patch $ { a: @ + 1, b: @ * 2 }") == \
        {"a": 6, "b": 20}


def test_conditional_add_mixed_truthiness(J):
    assert J({"role": "admin", "id": 7},
             'patch $ { active: true when $.role == "admin", '
             "banned: true when $.id < 0 }") == \
        {"role": "admin", "id": 7, "active": True}


def test_conditional_existing_field_truthy(J):
    assert J({"role": "admin", "active": False},
             'patch $ { active: true when $.role == "admin" }') == \
        {"role": "admin", "active": True}


def test_conditional_existing_field_falsy(J):
    assert J({"role": "user", "active": False},
             'patch $ { active: true when $.role == "admin" }') == \
        {"role": "user", "active": False}


def test_conditional_guard_reads_prebatch_doc(J):
    # guard `$.id > 5` sees the PRE-batch id (0), not the rolled 7
    assert J({"id": 0, "flag": False},
             "patch $ { id: 7, flag: true when $.id > 5 }") == \
        {"id": 7, "flag": False}


def test_conditional_delete_falsy_keeps_field(J):
    assert J({"a": 1, "b": 2}, "patch $ { a: DELETE when $.b > 100 }") == \
        {"a": 1, "b": 2}


def test_conditional_delete_truthy_removes_field(J):
    assert J({"a": 1, "b": 2, "c": 3},
             "patch $ { a: DELETE when $.b > 1, c: 99 }") == \
        {"b": 2, "c": 99}


def test_wildcard_alongside_plain_write(J):
    assert J({"users": [{"n": 1}, {"n": 2}], "tag": "x"},
             'patch $ { users[*].n: @ + 100, tag: "y" }') == \
        {"users": [{"n": 101}, {"n": 102}], "tag": "y"}


# ------------------------------------------------------------ chain-writes


def test_chain_set_single(J):
    assert J({"a": 0, "k": "hi"}, "$.a.set(1)") == {"a": 1, "k": "hi"}


def test_chain_pipe_fuses_three_root_writes(J):
    assert J({}, "$.a.set(1) | $.b.set(2) | $.c.set(3)") == \
        {"a": 1, "b": 2, "c": 3}


def test_chain_pipe_fuses_at_rooted_stages(J):
    assert J({}, "$.a.set(1) | @.b.set(2) | @.c.set(3)") == \
        {"a": 1, "b": 2, "c": 3}


def test_chain_read_between_writes(J):
    r = J({"a": 5}, "$.a.set(10) | $.a + 100 | $.b.set(@)")
    assert "b" in r


def test_chain_object_field_writes_fuse(J):
    r = J({"x": 0, "y": 0}, "{a: $.x.set(1), b: $.y.set(2), c: 3}")
    assert r["a"]["x"] == 1 and r["a"]["y"] == 2
    assert r["b"]["x"] == 1 and r["b"]["y"] == 2
    assert r["c"] == 3


def test_chain_object_root_read_skips_fusion(J):
    r = J({"x": 0, "y": 0, "meta": "hi"},
          "{a: $.x.set(1), b: $.y.set(2), m: $.meta}")
    assert r["m"] == "hi"
    assert r["a"]["x"] == 1


def test_chain_let_init_body_fuses_via_alias(J):
    assert J({}, "let x = $.a.set(1) in x.b.set(2)") == {"a": 1, "b": 2}


def test_chain_lambda_body_writes_dont_leak(J):
    assert J({"list": [{"id": 1}, {"id": 2}]},
             "$.list.map(lambda o: o.id.set(99))") == [99, 99]


def test_chain_deep_overlap_source_order(J):
    assert J({}, "$.a.set({x: 1}) | $.a.x.set(2)") == {"a": {"x": 2}}


def test_chain_sibling_writes(J):
    assert J({"user": {"name": "X", "role": "u"}},
             '$.user.name.set("Alice") | $.user.role.set("admin")') == \
        {"user": {"name": "Alice", "role": "admin"}}


def test_chain_let_pure_read_body(J):
    assert J({"a": 0, "k": "hi"}, "let x = $.a.set(1) in x.k") == "hi"


def test_chain_object_three_writes_one_other_field(J):
    r = J({"x": 0, "y": 0, "z": 0},
          '{a: $.x.set(1), b: $.y.set(2), c: $.z.set(3), tag: "lit"}')
    assert r["tag"] == "lit"
    assert r["a"]["x"] == 1 and r["a"]["y"] == 2 and r["a"]["z"] == 3


def test_chain_modify(J):
    assert J({"n": 10}, "$.n.modify(lambda x: x * 3)") == {"n": 30}


def test_chain_delete(J):
    assert J({"a": 1, "b": 2}, "$.a.delete()") == {"b": 2}


def test_chain_unset(J):
    assert J({"user": {"name": "A", "tmp": 1}}, '$.user.unset("tmp")') == \
        {"user": {"name": "A"}}


def test_chain_merge(J):
    assert J({"cfg": {"a": 1}}, "$.cfg.merge({b: 2})") == \
        {"cfg": {"a": 1, "b": 2}}


def test_patch_untouched_subtrees_survive(J):
    doc = {"touched": {"x": 1, "y": 2},
           "untouched": {"a": [1, 2, 3], "b": "string", "c": {"deep": True}}}
    assert J(doc, "patch $ { touched.x: 99, touched.y: 100 }") == \
        {"touched": {"x": 99, "y": 100},
         "untouched": {"a": [1, 2, 3], "b": "string", "c": {"deep": True}}}


def test_chain_dynamic_index_set(J):
    # regression.rs:3043 tier1 chain write with a dynamic index
    assert J({"xs": [10, 20, 30, 40], "i": 2}, "$.xs[$.i].set(99)") == \
        {"xs": [10, 20, 99, 40], "i": 2}


def test_patch_dynamic_index(J):
    assert J({"xs": [10, 20, 30], "i": 1}, "patch $ { xs[$.i]: 77 }") == \
        {"xs": [10, 77, 30], "i": 1}


def test_patch_over_jetro_docs_corpus(spark):
    """One compiled patch program over a DataFrame of documents —
    guarded add, modify, and DELETE per document, in parallel."""
    from pyspark.sql import functions as F
    from jetro_spark.jql.engine import JetroDocs

    js = spark.createDataFrame(
        [(f'{{"id": {i}, "total": {i * 100}.0, "tmp": "x"}}',)
         for i in range(1, 6)], "js string")
    jd = JetroDocs.from_json_strings(spark, js, "js")
    out = jd.frame(
        'patch $ {big: $.total >= 300.0, total: $.total * 2.0, tmp: DELETE}')
    rows = sorted(out.select("value.*").collect(), key=lambda r: r["id"])
    assert "tmp" not in rows[0].__fields__
    assert [r["total"] for r in rows] == [200.0, 400.0, 600.0, 800.0, 1000.0]
    assert [r["big"] for r in rows] == [False, False, True, True, True]
