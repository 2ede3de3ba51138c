"""Rust→Java regex dialect audit (functions/redialect.py): every
documented delta is pinned here — the translation legs against LIVE
Spark evaluation, the audit legs against dialect_warnings. Closes the
round-5 'no automated dialect audit' gap; round 7 adds the Unicode
perl-class rewrites (\\w \\d \\s exact to the regex crate's UTS#18
definitions) and fixes nested-character-class pass-through."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from jetro_spark.functions.redialect import dialect_warnings, rust_to_java
from jetro_spark.functions.strings import (
    is_numeric,
    re_captures,
    re_match,
    re_match_all,
    re_match_first,
    re_replace_all,
)

W = r"\p{IsAlphabetic}\p{M}\p{Nd}\p{Pc}\p{IsJoin_Control}"


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


# ------------------------------------------------------- pure translation


def test_named_group_spelling():
    assert rust_to_java(r"(?P<y>\d{4})-(?P<m>\d{2})") == \
        rf"(?<y>\p{{Nd}}{{4}})-(?<m>\p{{Nd}}{{2}})"
    # literal "(?P<" inside a class is untouched
    assert rust_to_java(r"[(?P<]") == r"[(?P<]"


def test_posix_classes_translate():
    assert rust_to_java(r"[[:alpha:]]+") == r"[\p{Alpha}]+"
    assert rust_to_java(r"[[:digit:][:space:]]") == r"[\p{Digit}\p{Space}]"
    assert rust_to_java(r"[[:^alpha:]]") == r"[\P{Alpha}]"
    assert rust_to_java(r"[[:ascii:]]") == r"[\x00-\x7f]"


def test_dot_and_dollar_translate():
    assert rust_to_java(r"a.c$") == r"a[^\n]c\z"
    # escaped/class/dotall/multiline forms untouched
    assert rust_to_java(r"a\.c\$") == r"a\.c\$"
    assert rust_to_java(r"[.$]") == r"[.$]"
    assert rust_to_java(r"(?s)a.c") == r"(?s)a.c"
    assert rust_to_java(r"(?m)^x$") == r"(?m)^x$"
    # an ESCAPED paren before flag-like text is not a flag group
    assert rust_to_java(r"\(?s)a.c") == r"\(?s)a[^\n]c"


def test_nested_classes_pass_through():
    # the regex crate supports nested classes and && intersection with
    # Java-identical semantics — they must NOT be mangled (r6 escaped
    # the inner '[', breaking [0-9&&[^4]]; the r7 fix)
    assert rust_to_java(r"[0-9&&[^4]]") == r"[0-9&&[^4]]"
    assert rust_to_java(r"[x[^xyz]]") == r"[x[^xyz]]"
    assert rust_to_java(r"[a-z[0-9]]+") == r"[a-z[0-9]]+"
    # . and $ inside the NESTED class still untouched
    assert rust_to_java(r"[a[.$]]") == r"[a[.$]]"
    # leading ] in a nested class is a literal member → escaped for Java
    assert rust_to_java(r"[a[]b]]") == r"[a[\]b]]"


def test_perl_classes_rewritten_to_rust_unicode():
    assert rust_to_java(r"\d+") == r"\p{Nd}+"
    assert rust_to_java(r"\D") == r"\P{Nd}"
    assert rust_to_java(r"\s*") == r"\p{IsWhite_Space}*"
    assert rust_to_java(r"\S") == r"\P{IsWhite_Space}"
    assert rust_to_java(r"\w+") == rf"[{W}]+"
    assert rust_to_java(r"\W") == rf"[^{W}]"
    # inside a class: members spliced / nested-negated
    assert rust_to_java(r"[\w-]") == rf"[{W}-]"
    assert rust_to_java(r"[\W.]") == rf"[[^{W}].]"
    assert rust_to_java(r"[^\d ]") == r"[^\p{Nd} ]"
    # opt-out leaves Java ASCII semantics
    assert rust_to_java(r"\w\d\s", unicode_perl=False) == r"\w\d\s"
    # Rust's (?-u) ASCII mode auto-disables the rewrite
    assert rust_to_java(r"(?-u)\w+") == r"(?-u)\w+"
    # escaped backslash before the class letter is a literal, untouched
    assert rust_to_java(r"\\d") == r"\\d"


# ------------------------------------- live Spark behavior after translation


def test_named_group_pattern_works_in_spark(spark):
    # untranslated (?P< throws PatternSyntaxException in Java
    got = _one(spark, re_captures(F.lit("2024-07"), r"(?P<y>\d{4})"))
    assert got == "2024"


def test_posix_class_pattern_works_in_spark(spark):
    got = _one(spark, re_match_all(F.lit("ab1 cd2"), r"[[:alpha:]]+"))
    assert got == ["ab", "cd"]


def test_dollar_is_end_of_haystack(spark):
    # Java's bare $ would match "a\n"; the Rust dialect does not
    assert _one(spark, re_match(F.lit("a"), r"^a$")) is True
    assert _one(spark, re_match(F.lit("a\n"), r"^a$")) is False
    assert _one(spark, is_numeric(F.lit("123\n"))) is False
    assert _one(spark, is_numeric(F.lit("123"))) is True


def test_dot_excludes_only_newline(spark):
    # Java's bare . also excludes \r; the Rust dialect matches it
    assert _one(spark, re_match(F.lit("a\rb"), r"^a.b\z")) is True
    assert _one(spark, re_match(F.lit("a\nb"), r"^a.b\z")) is False


def test_replace_and_first_with_translated_patterns(spark):
    assert _one(spark, re_replace_all(
        F.lit("x1 y2"), r"[[:digit:]]", "#")) == "x# y#"
    assert _one(spark, re_match_first(F.lit("a\rb"), r"a.b")) == "a\rb"


def test_nested_class_set_difference_in_spark(spark):
    # the ADVICE regression case: digits-except-4 must match 0-3,5-9
    got = _one(spark, re_match_all(F.lit("1 4 7"), r"[0-9&&[^4]]"))
    assert got == ["1", "7"]


def test_unicode_word_matches_rust_semantics(spark):
    """Fixtures hand-derived from the regex crate's UTS#18 definition
    of \\w (Alphabetic + M + Nd + Pc + Join_Control) — the Rust ground
    truth a reference user sees on non-ASCII text."""
    # accented Latin + combining mark: é (U+00E9) and e+U+0301 both word
    assert _one(spark, re_match_all(F.lit("héllo wörld"), r"\w+")) == \
        ["héllo", "wörld"]
    assert _one(spark, re_match(F.lit("é"), r"^\w+\z")) is True
    # Arabic-Indic digits are \d and \w in Rust, not in Java ASCII
    assert _one(spark, re_match(F.lit("٣٤"), r"^\d+\z")) is True
    assert _one(spark, re_match(F.lit("42"), r"^\d+\z")) is True
    # Roman numeral Ⅻ (U+216B, category Nl, Alphabetic): \w but NOT \d
    assert _one(spark, re_match(F.lit("Ⅻ"), r"^\w\z")) is True
    assert _one(spark, re_match(F.lit("Ⅻ"), r"^\d\z")) is False
    # superscript ² (U+00B2, category No): NOT \w and NOT \d in Rust
    assert _one(spark, re_match(F.lit("²"), r"^\w\z")) is False
    assert _one(spark, re_match(F.lit("²"), r"^\d\z")) is False
    # ZWJ (U+200D, Join_Control) is \w in Rust
    assert _one(spark, re_match(F.lit("‍"), r"^\w\z")) is True
    # NBSP and ideographic space are \s (White_Space) in Rust
    assert _one(spark, re_match(F.lit(" "), r"^\s\z")) is True
    assert _one(spark, re_match(F.lit("　"), r"^\s\z")) is True
    assert _one(spark, re_replace_all(
        F.lit("a b"), r"\s+", " ")) == "a b"
    # \S / \W / \D negations agree
    assert _one(spark, re_match(F.lit(" "), r"^\S\z")) is False
    assert _one(spark, re_match(F.lit("é"), r"^\W\z")) is False
    assert _one(spark, re_match(F.lit("٣"), r"^\D\z")) is False


def test_unicode_rewrite_agrees_with_python_re_on_common_ground():
    """Cross-check the rewrite against Python's re module (Unicode
    mode) on fixtures where Python's and Rust's definitions coincide —
    an independent engine implementing the same UTS#18 core."""
    # Python re has no \p classes; the Java-target pattern is validated
    # live in the spark test above. Here assert the PYTHON ground truth
    # matches the Rust definition our fixtures encode (guards fixture
    # rot) on text where the two engines' \w definitions coincide.
    for text in ["héllo wörld", "a_b c-d", "٣٤ 42", "汉字 kanji"]:
        assert re.findall(r"\w+", text) == text.replace("-", " ").split()


# ------------------------------------------------------------------ audit


def test_warnings_flag_unrewritable_deltas():
    assert any("property" in w for w in dialect_warnings(r"\p{Greek}"))
    assert any(r"\r\n" in w for w in dialect_warnings(r"(?m)^x$"))
    assert any("(?-u)" in w for w in dialect_warnings(r"(?-u)\w+"))
    assert any("scoped" in w for w in dialect_warnings(r"(?s:a.b)c.d"))
    # \w \d \s are REWRITTEN now — no longer warned as unhandled
    assert dialect_warnings(r"\w+\d\s") == []
    assert dialect_warnings(r"^[0-9]+\z") == []
    # r8: \b and class set ops are rewritten — no longer warned
    assert dialect_warnings(r"\bfoo\b") == []
    assert dialect_warnings(r"[a-z--aeiou]") == []
    assert dialect_warnings(r"[0-9~~4-6]") == []
    # ... unless the structural translator declined the shape (a negated
    # mixed run containing \W has no safe Java spelling)
    assert any("resisted" in w for w in dialect_warnings(r"[^\W.--a]"))


# ------------------------------------------- r8: \b / class set rewrites

W_CLS = f"[{W}]"
B_UNI = f"(?:(?<={W_CLS})(?!{W_CLS})|(?<!{W_CLS})(?={W_CLS}))"


def test_word_boundary_rewritten_to_lookaround():
    assert rust_to_java(r"\bfoo") == B_UNI + "foo"
    # \B flips the inner lookahead polarity
    assert "(?=" in rust_to_java(r"\Bx") and rust_to_java(r"\Bx") != \
        rust_to_java(r"\bx")
    # (?-u) ASCII mode: Java's native ASCII \b already matches Rust
    assert rust_to_java(r"(?-u)\bfoo") == r"(?-u)\bfoo"
    assert rust_to_java(r"\bx", unicode_perl=False) == r"\bx"
    # inside a class \b stays (Java backspace; Rust rejects the pattern)
    assert rust_to_java(r"[\b]") == r"[\b]"
    # escaped backslash + b is a literal
    assert rust_to_java(r"\\b") == r"\\b"


def test_class_set_ops_translated():
    assert rust_to_java(r"[a-z--aeiou]", unicode_perl=False) == \
        r"[[a-z]&&[^aeiou]]"
    assert rust_to_java(r"[0-9~~4-6]", unicode_perl=False) == \
        r"[[[0-9]&&[^4-6]][[4-6]&&[^0-9]]]"
    # left-associative like the regex crate: (a-z -- m-p) -- x
    assert rust_to_java(r"[a-z--m-p--x]", unicode_perl=False) == \
        r"[[[a-z]&&[^m-p]]&&[^x]]"
    # negation is pushed through De Morgan (Java misparses [^ X&&Y ]):
    # ¬(a-z ∖ m) = ¬(a-z) ∪ {m}
    assert rust_to_java(r"[^a-z--m]", unicode_perl=False) == r"[[^a-z][m]]"
    # a negated union CONTAINING a nested class is also Java-misparsed
    # ([^a[b]] matches 'b' in Java!) — structurally rewritten since r8
    assert rust_to_java(r"[^a[b]]", unicode_perl=False) == r"[[^a]&&[^b]]"
    assert rust_to_java(r"[^a&&b]", unicode_perl=False) == r"[[^a][^b]]"
    # [^\W] would splice to the Java-misparsed [^[^...]] — flipped
    assert rust_to_java(r"[^\W]") == rf"[{W}]"
    # Java-legal shapes stay byte-identical
    assert rust_to_java(r"[0-9&&[^4]]") == r"[0-9&&[^4]]"
    assert rust_to_java(r"[x[^xyz]]") == r"[x[^xyz]]"
    assert rust_to_java(r"[^\d ]") == r"[^\p{Nd} ]"


def test_word_boundary_unicode_in_spark(spark):
    # Java's native \b is ASCII: "\bwörld" would split at ö. The
    # lookaround rewrite reproduces the crate's Unicode boundary.
    assert _one(spark, re_match_all(F.lit("héllo wörld"), r"\b\w+\b")) == \
        ["héllo", "wörld"]
    # Arabic-Indic digits are word chars: no boundary inside ٣٤
    assert _one(spark, re_match_all(F.lit("٣٤x y"), r"\b\w+\b")) == \
        ["٣٤x", "y"]
    # \B: position inside a word
    assert _one(spark, re_match(F.lit("ab"), r"^a\Bb")) is True
    assert _one(spark, re_match(F.lit("a b"), r"a\B b")) is False


def test_class_set_ops_in_spark(spark):
    got = _one(spark, re_match_all(F.lit("b a n a n a"), r"[a-z--aeiou]"))
    assert got == ["b", "n", "n"]
    got = _one(spark, re_match_all(F.lit("0 4 5 9"), r"[0-9~~4-6]"))
    assert got == ["0", "9"]
    # Unicode operands compose with the perl rewrite: word-but-not-digit
    got = _one(spark, re_match_all(F.lit("é ٣ x 9"), r"[\w--\d]"))
    assert got == ["é", "x"]


# ------------------------------------------------- property-based audit

import os

from hypothesis import given, settings, strategies as st

_N_PROP = int(os.environ.get("JETRO_FUZZ_EXAMPLES", "120"))

# Pattern fragments valid in BOTH dialects' source language (the Rust
# side of the translation): literals, perl classes, classes with
# nesting/POSIX/negation, quantifiers, groups (incl. named + flags),
# alternation, anchors.
_LITERAL = st.sampled_from(list("abcXYZ019 _%-"))
_PERL = st.sampled_from([r"\w", r"\d", r"\s", r"\W", r"\D", r"\S"])
_CLASS = st.sampled_from([
    "[abc]", "[^xyz]", "[a-f0-3]", "[[:alpha:]]", "[[:^digit:]]",
    "[x[^xyz]]", "[0-9&&[^4]]", r"[\w.]", r"[^\d ]", "[]a]", "[a[0-9]]",
])
_SETCLS = st.sampled_from([
    "[a-z--aeiou]", "[0-9~~4-6]", "[a-z--m-p--x]", "[^a-z--m]",
    "[a-f&&c-z--d]", "[^a[b]]", "[^a&&b]", r"[\w--\d]", r"[^\W]",
    "[[a-f]--[c-d]]", "[^[a-f]--[c-d]]", "[a-c~~b-d]", "[^a-c~~b-d]",
    "[]a--a]", r"[^\d--5]", "[0-9--[4[6]]]",
])
_ATOM = st.one_of(_LITERAL, _PERL, _CLASS, _SETCLS,
                  st.sampled_from([".", r"\."]))
_QUANT = st.sampled_from(["", "*", "+", "?", "{1,3}"])


@st.composite
def _patterns(draw):
    n = draw(st.integers(1, 6))
    parts = []
    for _ in range(n):
        atom = draw(_ATOM)
        parts.append(atom + draw(_QUANT))
    body = "".join(parts)
    wrap = draw(st.integers(0, 3))
    if wrap == 1:
        body = f"(?:{body})"
    elif wrap == 2:
        body = f"(?P<g>{body})"
    if draw(st.booleans()):
        body = "^" + body
    if draw(st.booleans()):
        body = r"\b" + body  # r8: boundary atoms flow through too
    if wrap == 3:
        # global flags go first: Python re (the ASCII stand-in) rejects
        # mid-pattern global flags since 3.11; Rust/Java accept both
        body = f"(?i){body}"
    return body


@settings(max_examples=_N_PROP, deadline=None)
@given(_patterns())
def test_translation_always_compiles_in_java(spark, pattern):
    """Whatever the translator emits must be a LEGAL Java pattern —
    a translation that throws PatternSyntaxException at query time is
    worse than no translation. Exercised against live Spark."""
    java = rust_to_java(pattern)
    # compiles and evaluates (value irrelevant)
    _one(spark, F.lit("probe string 123").rlike(java))


@settings(max_examples=_N_PROP, deadline=None)
@given(_patterns(), st.text(alphabet="abcXYZ019 _%-.\r", max_size=12))
def test_translation_matches_python_re_on_ascii(spark, pattern, text):
    """On ASCII haystacks the translated Java semantics must agree with
    Python re (whose `.`-excludes-only-\\n and Unicode-mode perl
    classes coincide with the Rust dialect there) for every generated
    pattern. `$`-anchored behavior is pinned separately by unit tests
    (Python's $ matches before a trailing newline, Rust's does not)."""
    # plain nested classes and Rust set ops have no Python-re spelling —
    # those are pinned by the dedicated unit tests and the V1-vs-Java
    # membership property; everything else maps to a Python-legal
    # equivalent below
    if any(tok in pattern for tok in
           ("[a[0-9]]", "[x[^xyz]]", "--", "~~", "[^a[b]]", "[^a&&b]",
            r"[^\W]")):
        return
    py = re.compile(pattern
                    .replace("[[:alpha:]]", "[a-zA-Z]")
                    .replace("[[:^digit:]]", "[^0-9]")
                    .replace("[0-9&&[^4]]", "[0-35-9]"))
    java = rust_to_java(pattern)
    expect = py.search(text) is not None
    got = _one(spark, F.lit(text).rlike(java))
    assert got is expect, (pattern, java, text)


# ------------------------- r8: V1-vs-Java membership property (set ops)

import pytest

_regex = pytest.importorskip("regex")

# codepoints spanning every membership-relevant category the operand
# vocabulary touches: ASCII, Latin accents, combining mark, Arabic-Indic
# digit, CJK, ZWJ (Join_Control), NBSP/ideographic space, Nl, No
_MEMBER_ALPHA = ([chr(c) for c in range(0x20, 0x7F)] +
                 ["é", "́", "٣", "中", "‍", "\xa0", "　",
                  "Ⅻ", "²", "ö", "ß"])


@settings(max_examples=_N_PROP, deadline=None)
@given(st.sampled_from([
    "[a-z--aeiou]", "[0-9~~4-6]", "[a-z--m-p--x]", "[a-z~~m-p~~x]",
    "[^a-z--m]", "[a-f&&c-z--d]", "[^a[b]]", "[^a&&b]", r"[\w--\d]",
    r"[^\W]", "[[a-f]--[c-d]]", "[^[a-f]--[c-d]]", "[a-c~~b-d]",
    "[^a-c~~b-d]", "[]a--a]", r"[^\d--5]", "[0-9--[4[6]]]",
    r"[\w~~\d]", r"[a-z--\d]", "[^x[^xyz]]", r"[[:alpha:]--aeiou]",
]), st.sampled_from(_MEMBER_ALPHA))
def test_set_class_membership_java_matches_rust_semantics(spark, pattern, ch):
    """Per-codepoint membership of every translated class, evaluated by
    REAL java.util.regex against the Python `regex` module in V1 mode —
    an independent engine implementing the crate's set-op semantics
    (negation over the whole set expression, left-assoc operators).
    V1 is the ORACLE side only: the translated spelling must run under
    Java because V1 misparses `[[^a][^b]]`-style juxtapositions.
    POSIX atoms are spelled out in their ASCII definitions on the
    oracle side: the Rust crate defines `[:alpha:]` as `[A-Za-z]`
    (regex syntax docs, "ASCII character classes") — Java's default
    `\\p{Alpha}` agrees — while V1's POSIX classes are Unicode-wide."""
    expect = _regex.compile(pattern.replace("[:alpha:]", "A-Za-z"),
                            _regex.V1).fullmatch(ch) is not None
    java = rust_to_java(pattern)
    got = (spark._jvm.java.util.regex.Pattern.compile(java)
           .matcher(ch).matches())
    assert got is expect, (pattern, java, hex(ord(ch)))


@settings(max_examples=_N_PROP, deadline=None)
@given(st.text(alphabet="ab_9 .-é٣中‍\xa0²Ⅻ", max_size=10),
       st.sampled_from([r"\b\w+", r"\w+\b", r"a\Bb", r"\B.", r"\bé"]))
def test_word_boundary_property_matches_regex_module(spark, text, pattern):
    """\\b/\\B lookaround rewrite vs the `regex` module's Unicode word
    boundary (same UTS#18 word definition as the Rust crate) on
    non-ASCII haystacks — find-first equivalence."""
    m = _regex.search(pattern, text)
    java = rust_to_java(pattern)
    jm = (spark._jvm.java.util.regex.Pattern.compile(java)
          .matcher(text))
    found = jm.find()
    assert found is (m is not None), (pattern, java, text)
    if found:
        assert jm.group() == m.group(), (pattern, java, text)
