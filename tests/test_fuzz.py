"""Fuzz / property tests for the JQL front-end, mirroring the reference's
cargo-fuzz targets (parse, plan, collect: "must not panic on any UTF-8
input" — jetro-core/fuzz/fuzz_targets/{parse,plan,collect}.rs).

Contract under test: for ARBITRARY input the pipeline either succeeds or
raises one of the language's own error types (LexError/ParseError/
CompileError, all ValueError) — never an uncontrolled exception
(IndexError, KeyError, AttributeError, RecursionError, ...) that would
leak internals or crash a server embedding the engine.

Algebraic properties run against a compiled document: identities the
reference's optimizer relies on (reverse∘reverse = id, take-bounds,
filter(true) = id) must hold observably.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

from jetro_spark.jql.compiler import CompileError
from jetro_spark.jql.engine import Jetro
from jetro_spark.jql.lexer import LexError, tokenize
from jetro_spark.jql.parser import ParseError, parse

CONTROLLED = (LexError, ParseError, CompileError)

pytestmark = pytest.mark.skipif(not HAVE_HYPOTHESIS,
                                reason="hypothesis not installed")

# JETRO_FUZZ_EXAMPLES scales the budget for soak runs (CI default 300)
import os as _os

_N = int(_os.environ.get("JETRO_FUZZ_EXAMPLES", "300"))
_FUZZ = settings(max_examples=_N, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

# Bounded length keeps worst-case parser recursion far from Python's
# recursion limit (the grammar recurses per nesting level, not per char).
_any_text = st.text(max_size=80)

# Grammar-adjacent soup: fragments that individually tokenize, shuffled
# into mostly-invalid programs — exercises deeper parser states than
# uniform unicode noise (which usually dies in the lexer).
_frag = st.sampled_from([
    "$", ".", "..", "items", "filter", "(", ")", "[", "]", "{", "}",
    "=>", "->", "|", "|>", "?", "??", ":", ",", "==", "!=", ">=", "and",
    "or", "not", "1", "2.5", "-3", "'s'", '"t"', "true", "null", "@",
    "map", "sum", "take", "if", "else", "for", "in", "let", "f'", "*",
    "+", "/", "%", "include", "..=", "{<", ">}", "$..", "e", " ",
])
_soup = st.lists(_frag, min_size=1, max_size=25).map("".join)


@_FUZZ
@given(_any_text)
def test_lexer_total_on_unicode(src):
    try:
        tokenize(src)
    except CONTROLLED:
        pass


@_FUZZ
@given(_any_text)
def test_parser_total_on_unicode(src):
    try:
        parse(src)
    except CONTROLLED:
        pass


@_FUZZ
@given(_soup)
def test_parser_total_on_token_soup(src):
    try:
        parse(src)
    except CONTROLLED:
        pass


DOC = {
    "items": [
        {"id": 1, "price": 10.0, "tags": ["a", "b"]},
        {"id": 2, "price": 5.5, "tags": []},
        {"id": 3, "price": 7.25, "tags": ["c"]},
        {"id": 4, "price": 1.0, "tags": ["a"]},
    ],
    "name": "fuzzdoc",
    "meta": {"version": 3, "flags": {"x": True, "y": False}},
}


@pytest.fixture(scope="module")
def jt(spark):
    return Jetro.from_value(spark, DOC)


# compile+collect totality over mostly-valid programs: build random
# pipelines from stages that are all individually legal on DOC.
_stage = st.sampled_from([
    ".filter(price > 5)", ".filter(id != 2)", ".map(price)", ".map(id)",
    ".sort(price)", ".sort(-id)", ".take(2)", ".skip(1)", ".reverse()",
    ".unique()", ".count()", ".sum()", ".first()", ".last()",
    ".map({id, price})", ".min()", ".max()", ".avg()",
])


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_stage, min_size=0, max_size=5).map(lambda s: "$.items" + "".join(s)))
def test_collect_total_on_random_pipelines(spark, src):
    jt = Jetro.from_value(spark, DOC)
    try:
        jt.collect(src)
    except CONTROLLED:
        # e.g. .map(price) after .count() — type error, controlled
        pass


def test_reverse_reverse_identity(jt):
    assert jt.collect("$.items.reverse().reverse().map(id)") == \
        jt.collect("$.items.map(id)")


def test_take_bounds(jt):
    for n in (0, 1, 3, 4, 99):
        got = jt.collect(f"$.items.take({n}).count()")
        assert got == min(n, 4)


def test_filter_true_identity(jt):
    assert jt.collect("$.items.filter(true).map(id)") == [1, 2, 3, 4]


def test_sort_then_first_is_min(jt):
    assert jt.collect("$.items.sort(price).first().price") == \
        jt.collect("$.items.map(price).min()")
