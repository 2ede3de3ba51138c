"""Differential parity vs the reference's regression corpus.

(doc, expression, expected) triples restate observable behaviour from
jetro-core/src/tests/regression.rs (the books() fixture in
tests/common.rs plus per-test json! docs) — WHAT each expression
computes, replayed through OUR document mode. Docs and expectations are
JSON strings (parsed at run time). Mixed-type positions and bare `$..`
node sets ride Spark's VariantType (the dynamic escape hatch from
static schemas), so the full corpus holds.
"""

from __future__ import annotations

import json

import pytest

from jetro_spark.jql.engine import Jetro

BOOKS_JSON = """{"store": {"books": [{"title": "Dune", "price": 12.99, "rating": 4.8, "genre": "sci-fi", "tags": ["sci-fi", "classic"]}, {"title": "Foundation", "price": 9.99, "rating": 4.5, "genre": "sci-fi", "tags": ["sci-fi", "series"]}, {"title": "Neuromancer", "price": 11.5, "rating": 4.2, "genre": "cyberpunk", "tags": ["sci-fi", "cyberpunk"]}, {"title": "1984", "price": 7.99, "rating": 4.6, "genre": "dystopia", "tags": ["classic", "dystopia"]}]}, "user": {"name": "Alice", "age": 30, "score": 85}}"""

CASES = [
    # (doc-json or "BOOKS", expr, want-json, xfail-reason)
    ("BOOKS", '$.user.name', '"Alice"', ''),
    ("BOOKS", '$..books[0].filter(title == "1984")[0].title', '"1984"', ''),
    ("BOOKS", '$.store.books[0].title', '"Dune"', ''),
    ("BOOKS", '$.store.books[-1].title', '"1984"', ''),
    ("BOOKS", '$.store.books[0:2].map(title)', '["Dune", "Foundation"]', ''),
    ('{"user": {"name": "Bob"}}', '$.user?.email', 'null', ''),
    ('{"user": null}', '$.user?.name', 'null', ''),
    ("BOOKS", '$.store.books.map(title)', '["Dune", "Foundation", "Neuromancer", "1984"]', ''),
    ("BOOKS", '$.store.books.len()', '4', ''),
    ('{"nums": [1, 2, 3, 4]}', '$.nums.sum()', '10', ''),
    ('{"items": [{"v": 1}, {"v": 2}, {"v": 3}]}', '$.items.sum(v)', '6', ''),
    ("BOOKS", '$.store.books.first().title', '"Dune"', ''),
    ("BOOKS", '$.store.books.last().title', '"1984"', ''),
    ("BOOKS", '$.store.books.first(2).map(title)', '["Dune", "Foundation"]', ''),
    ('{"user": {}}', '$.user.name.or("anon")', '"anon"', ''),
    ('{"user": {"name": "Alice", "email": "a@b.com"}}', '$.user.has("email")', 'true', ''),
    ('{"user": {"name": "Alice", "email": "a@b.com"}}', '$.user.has("phone")', 'false', ''),
    ('{"user": {"name": "Alice"}}', '$.user.missing("phone")', 'true', ''),
    ('{"vals": [1, null, 2, null, 3]}', '$.vals.compact()', '[1, 2, 3]', ''),
    ('{"items": [{"v": 1}, {"v": "x"}, {"v": null}]}', '$.items.filter(v kind number)', '[{"v": 1}]', ''),
    ('{"items": [{"v": 1}, {"v": null}]}', '$.items.filter(v kind not null)', '[{"v": 1}]', ''),
    ("BOOKS", '[b.title for b in $.store.books]', '["Dune", "Foundation", "Neuromancer", "1984"]', ''),
    ("BOOKS", '[b.title for b in $.store.books if b.price > 10]', '["Dune", "Neuromancer"]', ''),
    ('{"prices": [10, 20, 30]}', '$.prices.map(lambda p: p * 2)', '[20, 40, 60]', ''),
    ('{"vals": [1, 2, 3, 4]}', '$.vals.pairwise()', '[[1, 2], [2, 3], [3, 4]]', ''),
    ('{"vals": [1, 2, 3, 4, 5]}', '$.vals.window(3)', '[[1, 2, 3], [2, 3, 4], [3, 4, 5]]', ''),
    ('{"vals": [1, 2, 3, 4, 5]}', '$.vals.chunk(2)', '[[1, 2], [3, 4], [5]]', ''),
    ('{"vals": [1, 2, 3, 4]}', '$.vals.accumulate(lambda acc, x: acc + x)', '[1, 3, 6, 10]', ''),
    ('{"vals": [1, 2, 3, 4, 5]}', '$.vals.takewhile(lambda v: v < 4)', '[1, 2, 3]', ''),
    ('{"vals": [1, 2, 3, 4, 5]}', '$.vals.dropwhile(lambda v: v < 3)', '[3, 4, 5]', ''),
    ('{"xs": [1, 2, 2, 3, 3, 3]}', '$.xs.map(lambda v: v * 2).unique()', '[2, 4, 6]', ''),
    ('{"a": null, "b": null, "c": 42}', 'coalesce($.a, $.b, $.c)', '42', ''),
    ('{"a": null, "b": null, "c": 42}', 'coalesce($.a, $.b, 99)', '99', ''),
    ('{"a": [1, 2], "b": [3, 4]}', 'chain($.a, $.b)', '[1, 2, 3, 4]', ''),
    ('{"a": [1, 2, 3], "b": ["x", "y", "z"]}', 'zip($.a, $.b)', '[[1, "x"], [2, "y"], [3, "z"]]', ''),
    ('{"books": [{"t": "x"}, {"t": "y"}], "another": {"field": 42}, "deep": {"a": {"b": {"c": "leaf"}}}}', '{a: $.books, b: {c: $.another.field}}', '{"a": [{"t": "x"}, {"t": "y"}], "b": {"c": 42}}', ''),
    ("BOOKS", '$.store.books | len', '4', ''),
    ('{"a": null, "b": 42}', '$.a ?| $.b', '42', ''),
    ('{"a": 1, "b": 99}', '$.a ?| $.b', '1', ''),
    ('{"a": null, "b": null, "c": "found"}', '$.a ?| $.b ?| $.c', '"found"', ''),
    ('{"obj": {"a": 1, "b": 2, "c": 3}}', '$.obj -> {a, ...rest} | rest.len()', '2', ''),
    ('{"nums": [10, 20, 30]}', '$.nums -> [x, y, z] | x + y + z', '60', ''),
    ('{"a": [1, 2], "b": [3, 4]}', '[...$.a, ...$.b]', '[1, 2, 3, 4]', ''),
    ('{"items": [2, 3]}', '[1, ...$.items, 4]', '[1, 2, 3, 4]', ''),
    ('{"user": {"name": "Alice", "age": 30}}', 'f"Hello {$.user.name}!"', '"Hello Alice!"', ''),
    ('{"user": {"name": "Bob", "score": 95}}', 'f"{$.user.name} scored {$.user.score}"', '"Bob scored 95"', ''),
    ('{"name": "alice"}', 'f"Hello {$.name|upper}!"', '"Hello ALICE!"', ''),
    ('{"s": "Hello World"}', '$.s.upper()', '"HELLO WORLD"', ''),
    ('{"s": "Hello World"}', '$.s.lower()', '"hello world"', ''),
    ('{"s": "  hello  "}', '$.s.trim()', '"hello"', ''),
    ('{"s": "  hello  "}', '$.s.trim_left()', '"hello  "', ''),
    ('{"s": "  hello  "}', '$.s.trim_right()', '"  hello"', ''),
    ('{"s": "hi"}', '$.s.pad_left(5)', '"   hi"', ''),
    ('{"s": "hi"}', '$.s.pad_right(5)', '"hi   "', ''),
    ('{"s": "hi"}', '$.s.pad_left(5, "0")', '"000hi"', ''),
    ('{"s": "hello world"}', '$.s.starts_with("hello")', 'true', ''),
    ('{"s": "hello world"}', '$.s.ends_with("world")', 'true', ''),
    ('{"s": "hello world"}', '$.s.starts_with("world")', 'false', ''),
    ('{"s": "foo foo foo"}', '$.s.replace("foo", "bar")', '"bar foo foo"', ''),
    ('{"s": "foo foo foo"}', '$.s.replace_all("foo", "bar")', '"bar bar bar"', ''),
    ('{"s": "a,b,c"}', '$.s.split(",")', '["a", "b", "c"]', ''),
    ('{"s": "hello world"}', '$.s.index_of("world")', '6', ''),
    ('{"s": "hello world"}', '$.s.index_of("xyz")', '-1', ''),
    ('{"s": "hello"}', '$.s.slice(1, 4)', '"ell"', ''),
    ('{"s": "hello"}', '$.s.slice(2)', '"llo"', ''),
    ('{"s": "ab"}', '$.s.repeat(3)', '"ababab"', ''),
    ('{"s": "foobar"}', '$.s.strip_prefix("foo")', '"bar"', ''),
    ('{"s": "foobar"}', '$.s.strip_suffix("bar")', '"foo"', ''),
    ('{"s": "42"}', '$.s.to_number()', '42', ''),
    ('{"s": "<b>Hello & World</b>"}', '$.s.html_escape()', '"&lt;b&gt;Hello &amp; World&lt;/b&gt;"', ''),
    ('{"s": "a b\\nc d"}', '$.s.lines()', '["a b", "c d"]', ''),
    ('{"s": "a b\\nc d"}', '$.s.words()', '["a", "b", "c", "d"]', ''),
    ('{"s": "hello world"}', '$.s.capitalize()', '"Hello world"', ''),
    ('{"s": "hello world"}', '$.s.title_case()', '"Hello World"', ''),
    ('{"a": {"b": {"c": 42}}}', '$.get_path("a.b.c")', '42', ''),
    ('{"a": {"b": {"c": 1}}}', '$.has_path("a.b.c")', 'true', ''),
    ('{"a": {"b": {"c": 1}}}', '$.has_path("a.x.y")', 'false', ''),
    ('{"a": [1, 2, 3, 4], "b": [2, 4]}', '$.a.diff($.b)', '[1, 3]', ''),
    ('{"a": [1, 2, 3], "b": [2, 3, 4]}', '$.a.intersect($.b)', '[2, 3]', ''),
    ('{"n": 42, "s": "hello", "a": [1], "o": {}, "b": true, "z": null}', '$.n.type()', '"number"', ''),
    ('{"n": 42, "s": "hello", "a": [1], "o": {}, "b": true, "z": null}', '$.s.type()', '"string"', ''),
    ('{"n": 42, "s": "hello", "a": [1], "o": {}, "b": true, "z": null}', '$.a.type()', '"array"', ''),
    ('{"n": 42, "s": "hello", "a": [1], "o": {}, "b": true, "z": null}', '$.o.type()', '"object"', ''),
    ('{"n": 42, "s": "hello", "a": [1], "o": {}, "b": true, "z": null}', '$.b.type()', '"bool"', ''),
    ('{"n": 42, "s": "hello", "a": [1], "o": {}, "b": true, "z": null}', '$.z.type()', '"null"', ''),
    ("BOOKS", '$.store..{title == "1984"}!.title', '"1984"', ''),
    ('{"xs": [3, 1, 4, 1, 5, 9, 2, 6]}', '$.xs.sort().len()', '8', ''),
    ('{"xs": [3, 1, 4, 1, 5, 9, 2, 6]}', '$.xs.reverse().count()', '8', ''),
    ('{"xs": [3, 1, 4, 1, 5, 9, 2, 6]}', '$.xs.map(@ * 2).len()', '8', ''),
    ('{"xs": [1, 2, 3, 4, 5]}', '$.xs.map(@ * 2).filter(@ > 5)', '[6, 8, 10]', ''),
    ('{"items": [{"a": {"b": {"c": 42}}}]}', '$.items.first()?.a?.b?.c', '42', ''),
    ('{"items": [{"a": {"b": {"c": 42}}}]}', '$.items.first().a.b.c', '42', ''),
    ('[{"id": 1, "name": "A"}, {"id": 2}]', "$.map({id, name: try name else 'anon'})", '[{"id": 1, "name": "A"}, {"id": 2, "name": "anon"}]', ''),
    ('[{"tags": ["a"]}, {}]', '[try x.tags else [] for x in $]', '[["a"], []]', ''),
    ('{"nums": [5, 3, 1, 4, 2, 9, 7]}', '$.nums.sort()[0:3]', '[1, 2, 3]', ''),
    ('{"xs": [3, 1, 2, 1, 3]}', '$.xs.reverse().reverse()', '[3, 1, 2, 1, 3]', ''),
    ('{"id": 1, "child": {"id": 2, "grand": {"id": 3}}, "siblings": [{"id": 4}, {"id": 5}]}', '$..id.first()', '1', ''),
    ('{"a": null, "b": null, "c": 7}', '$.a ?? $.b ?? $.c', '7', ''),
    ("BOOKS", 'let a = 2, b = 3 in a + b', '5', ''),
    ("BOOKS", 'let a = 10, b = a * 2 in b', '20', ''),
    ('{"nums": [1, 2, 3, 4]}', '$.nums.map((x) => x * 2)', '[2, 4, 6, 8]', ''),
    ('{"nums": [3, 1, 4, 1, 5, 9, 2, 6]}', '$.nums.sort((a, b) => a < b)', '[1, 1, 2, 3, 4, 5, 6, 9]', ''),
    ('{"s": "42"}', '$.s as int', '42', ''),
    ('{"n": 3}', '$.n as float', '3.0', ''),
    ('{"n": 42}', '$.n as string', '"42"', ''),
    ('{"n": 1}', '$.n as bool', 'true', ''),
    ('{"s": "10"}', '$.s as int * 2', '20', ''),
    ('{"user": {"name": "Alice", "age": 30}}', 'let k = "name" in $.user.{k}', '"Alice"', ''),
    ('{"items": [10, 20, 30]}', 'let i = 1 in $.items.{i}', '20', ''),
    ('{"prefix_name": "hello", "key": "name"}', '$.{"prefix_" + $.key}', '"hello"', ''),
    ('{"name": "Alice", "email": "a@x.com", "verified": true}', '{name, email: $.email when $.verified}', '{"name": "Alice", "email": "a@x.com"}', ''),
    ('{"name": "Alice", "email": "a@x.com", "verified": false}', '{name, email: $.email when $.verified}', '{"name": "Alice"}', ''),
    ('{"name": "Bob"}', '{name, email: "default" when $.verified}', '{"name": "Bob"}', ''),
    ('{"score": 85, "threshold": 70}', '{grade: "pass" when score > threshold}', '{"grade": "pass"}', ''),
    ("BOOKS", '$.store.books.find(price > 10).map(title)', '["Dune", "Neuromancer"]', ''),
    ('{"x": 42}', '$.x.collect()', '[42]', ''),
    ('{"xs": [1, 2, 3]}', '$.xs.collect()', '[1, 2, 3]', ''),
    ('{"x": null}', '$.x.collect()', '[]', ''),
    ('{"user": {"name": "Alice", "age": 30, "score": 85}}', '$.user.pick(name, age)', '{"name": "Alice", "age": 30}', ''),
    ('{"user": {"name": "Alice", "age": 30}}', '$.user.pick(name, years: age)', '{"name": "Alice", "years": 30}', ''),
    ('{"user": {"name": "Alice", "age": 30}}', '$.user.name.set("Bob")', '{"user": {"name": "Bob", "age": 30}}', ''),
    ('{"counts": {"n": 5}}', '$.counts.n.modify(@ * 2)', '{"counts": {"n": 10}}', ''),
    ('{"user": {"name": "Alice", "age": 30}}', '$.user.age.delete()', '{"user": {"name": "Alice"}}', ''),
    ('{"user": {"name": "Alice", "age": 30}}', '$.user.unset("age")', '{"user": {"name": "Alice"}}', ''),
    ('{"a": {"b": {"c": 1}}}', '$.a.b.set({x: 42})', '{"a": {"b": {"x": 42}}}', ''),
    ('{"a": {"id": 1, "b": {"id": 2, "c": {"id": 3}}}}', '$..id.delete()', '{"a": {"b": {"c": {}}}}', ''),
    ('{"config": {"host": "a", "port": 80}}', '$.config.merge({port: 443, tls: true})', '{"config": {"host": "a", "port": 443, "tls": true}}', ''),
    ('{"a": {"b": {"x": 1}}}', '$.a.deep_merge({b: {y: 2}})', '{"a": {"b": {"x": 1, "y": 2}}}', ''),
    ('{"counts": {"n": 5}}', '$.counts.n.modify(lambda x: x * 3)', '{"counts": {"n": 15}}', ''),
    ('{"x": 1}', '$.x | set(99)', '99', ''),
    ('{}', 'range(5)', '[0, 1, 2, 3, 4]', ''),
    ('{}', 'range(2, 5)', '[2, 3, 4]', ''),
    ('{}', 'range(0, 10, 2)', '[0, 2, 4, 6, 8]', ''),
    ('{}', 'range(10, 0, -2)', '[10, 8, 6, 4, 2]', ''),
    ('{}', 'range(5, 0, 1)', '[]', ''),
    ('{}', 'range(0, 5, -1)', '[]', ''),
    ('{}', 'range(0, 5, 0)', '[]', ''),
    ('{"x": 3.3, "y": 3.7, "z": 3.5, "n": -2.4}', '$.x.ceil()', '4', ''),
    ('{"x": 3.3, "y": 3.7, "z": 3.5, "n": -2.4}', '$.x.floor()', '3', ''),
    ('{"x": 3.3, "y": 3.7, "z": 3.5, "n": -2.4}', '$.y.floor()', '3', ''),
    ('{"x": 3.3, "y": 3.7, "z": 3.5, "n": -2.4}', '$.y.round()', '4', ''),
    ('{"x": 3.3, "y": 3.7, "z": 3.5, "n": -2.4}', '$.z.round()', '4', ''),
    ('{"x": 3.3, "y": 3.7, "z": 3.5, "n": -2.4}', '$.n.ceil()', '-2', ''),
    ('{"x": 3.3, "y": 3.7, "z": 3.5, "n": -2.4}', '$.n.floor()', '-3', ''),
    ('{"x": 42}', '$.x.ceil()', '42', ''),
    ('{"x": 42}', '$.x.floor()', '42', ''),
    ('{"x": 42}', '$.x.round()', '42', ''),
    ('{"a": -3.5, "b": 7}', '$.a.abs()', '3.5', ''),
    ('{"a": -3.5, "b": 7}', '$.b.abs()', '7', ''),
    ('{}', 'range(1, 10).sum()', '45', ''),

    # chain_write.rs / deep_search.rs / complex_payload.rs extracts
    ('{"name": "Alice", "age": 30}', 'patch $ { name: "Bob" }', '{"name": "Bob", "age": 30}', ''),
    ('{"user": {"name": "Alice", "age": 30}}', 'patch $ { user.name: "Bob" }', '{"user": {"name": "Bob", "age": 30}}', ''),
    ('{"name": "Alice", "tmp": "remove-me", "age": 30}', 'patch $ { tmp: DELETE }', '{"name": "Alice", "age": 30}', ''),
    ('{"name": "Alice"}', 'patch $ { age: 42 }', '{"name": "Alice", "age": 42}', ''),
    ('{"users": [{"name": "Alice", "seen": false}, {"name": "Bob", "seen": false}]}', 'patch $ { users[*].seen: true }', '{"users": [{"name": "Alice", "seen": true}, {"name": "Bob", "seen": true}]}', ''),
    ('{"users": [{"name": "Alice", "active": true, "role": "user"}, {"name": "Bob", "active": false, "role": "user"}, {"name": "Cara", "active": true, "role": "user"}]}', 'patch $ { users[* if active].role: "admin" }', '{"users": [{"name": "Alice", "active": true, "role": "admin"}, {"name": "Bob", "active": false, "role": "user"}, {"name": "Cara", "active": true, "role": "admin"}]}', ''),
    ('{"users": [{"name": "Alice", "email": "ALICE@X"}, {"name": "Bob", "email": "BOB@X"}]}', 'patch $ { users[*].email: @.lower() }', '{"users": [{"name": "Alice", "email": "alice@x"}, {"name": "Bob", "email": "bob@x"}]}', ''),
    ('{"count": 5, "enabled": true}', 'patch $ { count: @ + 1 when $.enabled }', '{"count": 6, "enabled": true}', ''),
    ('{"count": 5, "enabled": false}', 'patch $ { count: @ + 1 when $.enabled }', '{"count": 5, "enabled": false}', ''),
    ('{"a": 1, "b": 2, "c": 3}', 'patch $ { a: 10, b: DELETE, c: 30 }', '{"a": 10, "c": 30}', ''),
    ('{"items": [10, 20, 30]}', 'patch $ { items[1]: 99 }', '{"items": [10, 99, 30]}', ''),
    ('{"users": [{"name": "Alice", "active": true}, {"name": "Bob", "active": false}, {"name": "Cara", "active": true}]}', 'patch $ { users[* if not active]: DELETE }', '{"users": [{"name": "Alice", "active": true}, {"name": "Cara", "active": true}]}', ''),
    ('{"name": "Alice", "age": 30}', 'patch $ { name: "Bob" } | @.name', '"Bob"', ''),
    ('{"name": "Alice"}', '{result: patch $ { name: "Bob" }}', '{"result": {"name": "Bob"}}', ''),
    ('{"name": "Alice", "age": 30}', 'let x = patch $ { name: "Bob" } in x.name', '"Bob"', ''),
    ('{"name": "Alice", "age": 30}', 'patch (patch $ { name: "Bob" }) { age: 99 }', '{"name": "Bob", "age": 99}', ''),
    ('{"users": [{"n": 1}, {"n": 2}, {"n": 3}]}', '$.users.map(patch @ { n: @ * 10 })', '[{"n": 10}, {"n": 20}, {"n": 30}]', ''),
    ('{"a": 0, "b": 0, "c": 0, "d": 0}', 'patch $ { a: 1, b: 2, c: 3 }', '{"a": 1, "b": 2, "c": 3, "d": 0}', ''),
    ('{"a": 1}', 'patch $ { a: {x: 1}, a.x: 2 }', '{"a": {"x": 2}}', ''),
    ('{"items": [0, 0, 0]}', 'patch $ { items[0]: 10, items[1]: 20 }', '{"items": [10, 20, 0]}', ''),
    ('{"a": 0, "b": 0}', 'patch $ { a: DELETE, b: 1 }', '{"b": 1}', ''),
    ('{"a": 5, "b": 10}', 'patch $ { a: @ + 1, b: @ * 2 }', '{"a": 6, "b": 20}', ''),
    ('{"users": [{"n": 1}, {"n": 2}], "tag": "x"}', 'patch $ { users[*].n: @ + 100, tag: "y" }', '{"users": [{"n": 101}, {"n": 102}], "tag": "y"}', ''),

]


_ENGINES: dict = {}


def _engine(spark, doc_json):
    if doc_json not in _ENGINES:
        src = BOOKS_JSON if doc_json == "BOOKS" else doc_json
        _ENGINES[doc_json] = Jetro.from_value(spark, json.loads(src))
    return _ENGINES[doc_json]


@pytest.mark.parametrize(
    "doc,expr,want,xfail", CASES,
    ids=[f"{i}_{c[1][:45]}" for i, c in enumerate(CASES)])
def test_regression_parity(spark, doc, expr, want, xfail):
    if xfail:
        pytest.xfail(xfail)
    assert _engine(spark, doc).collect(expr) == json.loads(want)
