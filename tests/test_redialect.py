"""Rust→Java regex dialect audit (functions/redialect.py): every
documented delta is pinned here — the translation legs against LIVE
Spark evaluation, the audit legs against dialect_warnings. Closes the
round-5 'no automated dialect audit' gap."""

from __future__ import annotations

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


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


# ------------------------------------------------------- pure translation


def test_named_group_spelling():
    assert rust_to_java(r"(?P<y>\d{4})-(?P<m>\d{2})") == \
        r"(?<y>\d{4})-(?<m>\d{2})"
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


def test_literal_bracket_in_class_escaped():
    # Rust: [a[b] is the set {a,[,b}; Java would nest-and-drop the [
    assert rust_to_java(r"[a[b]") == r"[a\[b]"


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


# ------------------------------------------------------------------ audit


def test_warnings_flag_unrewritable_deltas():
    assert any("Unicode" in w for w in dialect_warnings(r"\w+"))
    assert any("property" in w for w in dialect_warnings(r"\p{Greek}"))
    assert any(r"\r\n" in w for w in dialect_warnings(r"(?m)^x$"))
    assert any("--" in w for w in dialect_warnings(r"[a-z--aeiou]"))
    assert dialect_warnings(r"^[0-9]+\z") == []
