"""String / regex / encoding / math scalar builtins (SURVEY.md §2.9).

All element-wise and vectorisable (the reference marks these ``is_element``,
jetro-core/src/builtins/registry.rs:594-616). Implementations compose
``pyspark.sql.functions`` only — they stay inside whole-stage codegen.

Reference implementations: jetro-core/src/builtins/ops/string.rs (line
numbers cited per function) and ops/regex.rs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- case/shape


def upper(c: Column) -> Column:  # string.rs:126
    return F.upper(c)


def lower(c: Column) -> Column:  # string.rs:140
    return F.lower(c)


def capitalize(c: Column) -> Column:
    """First char upper, rest unchanged. Reference: string.rs:172."""
    return F.concat(F.upper(F.substring(c, 1, 1)), c.substr(F.lit(2), F.length(c)))


def title_case(c: Column) -> Column:
    """Every word capitalised. Reference: string.rs:188."""
    return F.initcap(c)


def snake_case(c: Column) -> Column:
    """camelCase / kebab / spaces → snake_case. Reference: string.rs:324."""
    s = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2")
    s = F.regexp_replace(s, r"[\s\-]+", "_")
    return F.lower(s)


def kebab_case(c: Column) -> Column:
    """Reference: string.rs:332."""
    s = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1-$2")
    s = F.regexp_replace(s, r"[\s_]+", "-")
    return F.lower(s)


def camel_case(c: Column) -> Column:
    """snake/kebab/space-separated → camelCase. Reference: string.rs:340."""
    words = F.split(F.lower(c), r"[\s_\-]+")
    head = F.element_at(words, 1)
    tail = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    return F.concat(head, F.array_join(F.transform(tail, F.initcap), ""))


def pascal_case(c: Column) -> Column:
    """Reference: string.rs:357."""
    words = F.split(F.lower(c), r"[\s_\-]+")
    return F.array_join(F.transform(words, F.initcap), "")


def reverse_str(c: Column) -> Column:  # string.rs:370
    return F.reverse(c)


# ----------------------------------------------------------------- trim/pad


def trim(c: Column) -> Column:  # string.rs:154
    return F.trim(c)


def trim_left(c: Column) -> Column:  # string.rs:160 (alias lstrip)
    return F.ltrim(c)


def trim_right(c: Column) -> Column:  # string.rs:166
    return F.rtrim(c)


def pad_left(c: Column, width: int, fill: str = " ") -> Column:
    """Pad to width (never truncates — jetro keeps longer strings intact).
    Reference: string.rs:571."""
    return F.when(F.length(c) >= width, c).otherwise(F.lpad(c, width, fill))


def pad_right(c: Column, width: int, fill: str = " ") -> Column:
    """Reference: string.rs:583."""
    return F.when(F.length(c) >= width, c).otherwise(F.rpad(c, width, fill))


def center(c: Column, width: int, fill: str = " ") -> Column:
    """Center-pad (left gets the smaller half). Reference: string.rs:595."""
    total = F.greatest(F.lit(width) - F.length(c), F.lit(0))
    left = F.floor(total / 2).cast("int")
    return F.rpad(F.lpad(c, (F.length(c) + left).cast("int"), fill), width, fill)


def indent(c: Column, prefix: str) -> Column:
    """Prefix every line. Reference: string.rs:617."""
    return F.concat(F.lit(prefix), F.regexp_replace(c, r"\n", "\n" + prefix))


def repeat(c: Column, n: int) -> Column:  # string.rs:545
    return F.repeat(c, n)


# --------------------------------------------------------------- split/join


def split(c: Column, sep: str) -> Column:
    """Literal (non-regex) split. Reference: string.rs:70."""
    import re

    return F.split(c, re.escape(sep))


def lines(c: Column) -> Column:  # string.rs:382
    return F.split(c, r"\r?\n")


def words(c: Column) -> Column:
    """Whitespace-separated, empties dropped. Reference: string.rs:390."""
    return F.filter(F.split(c, r"\s+"), lambda w: F.length(w) > 0)


def chars(c: Column) -> Column:
    """String → array of single-char strings. Reference: string.rs:402.

    regexp_extract_all('(?s).') rather than a zero-width split: Java `.`
    matches a full code point (surrogate pairs stay whole, unlike split
    which can cut between surrogates), (?s) keeps newlines, and '' → []."""
    return F.regexp_extract_all(c, F.lit("(?s)."), F.lit(0))


def _codepoint(ch: Column) -> Column:
    """Unicode code point of a single-character string, decoded from its
    UTF-8 bytes with pure JVM expressions (Spark has chr() but no inverse)."""
    b = F.encode(ch, "UTF-8")
    n = F.octet_length(b)

    def byte(i: int) -> Column:
        return F.conv(F.hex(F.substring(b, i, 1)), 16, 10).cast("long")

    b1 = byte(1)
    return (
        F.when(n == 1, b1)
        .when(n == 2, (b1 % 32) * 64 + byte(2) % 64)
        .when(n == 3, (b1 % 16) * 4096 + (byte(2) % 64) * 64 + byte(3) % 64)
        .otherwise((b1 % 8) * 262144 + (byte(2) % 64) * 4096 + (byte(3) % 64) * 64 + byte(4) % 64)
    )


def chars_of(c: Column) -> Column:
    """Code points (full Unicode, not first-byte). Reference: string.rs:414."""
    return F.transform(chars(c), _codepoint)


def byte_len(c: Column) -> Column:  # string.rs:428
    return F.octet_length(c).cast("long")


def join(arr: Column, sep: str) -> Column:
    """Array of strings → joined string. Reference: ops/collection.rs:421."""
    return F.array_join(arr, sep)


# ------------------------------------------------------------- affix/search


def starts_with(c: Column, p: str | Column) -> Column:
    return c.startswith(p)


def ends_with(c: Column, p: str | Column) -> Column:
    return c.endswith(p)


def strip_prefix(c: Column, p: str) -> Column:
    """Remove prefix if present. Reference: string.rs:551."""
    return F.when(c.startswith(p), c.substr(F.lit(len(p) + 1), F.length(c))).otherwise(c)


def strip_suffix(c: Column, s: str) -> Column:
    """Reference: string.rs:561."""
    return F.when(
        c.endswith(s), F.substring(c, 1, (F.length(c) - len(s)).cast("int"))
    ).otherwise(c)


def index_of(c: Column, sub: str) -> Column:
    """0-based first index, -1 when absent. Reference: vm dispatch /
    ops/collection.rs:471-496."""
    return (F.instr(c, sub) - 1).cast("long")


def matches(c: Column, sub: str | Column) -> Column:
    """Substring containment test. Reference: mod.rs:368-369."""
    return F.contains(c, F.lit(sub) if isinstance(sub, str) else sub)


def str_slice(c: Column, start: int | None, stop: int | None) -> Column:
    """Python-style half-open string slice with negatives. Reference: string.rs:8."""
    n = F.length(c)

    def norm(i: int) -> Column:
        v = F.lit(i) + n if i < 0 else F.lit(i)
        return F.greatest(F.lit(0), F.least(v, n))

    lo = norm(start) if start is not None else F.lit(0)
    hi = norm(stop) if stop is not None else n
    return F.substring(c, (lo + 1).cast("int"), F.greatest(hi - lo, F.lit(0)).cast("int"))


# ------------------------------------------------------------------ replace


def replace(c: Column, old: str, new: str) -> Column:
    """Replace FIRST occurrence only (instr + splice, not regex — literal).
    Reference: string.rs:100."""
    pos = F.instr(c, old)
    return F.when(
        pos > 0,
        F.concat(
            F.substring(c, 1, (pos - 1).cast("int")),
            F.lit(new),
            c.substr(pos + len(old), F.length(c)),
        ),
    ).otherwise(c)


def replace_all(c: Column, old: str, new: str) -> Column:
    """Replace all occurrences (literal). Reference: string.rs:100."""
    return F.replace(c, F.lit(old), F.lit(new))


# -------------------------------------------------------------------- regex
# ⚠ Dialect: the reference takes Rust `regex` patterns (no lookaround,
# no backreferences) while Spark evaluates Java `Pattern`. Every re_*
# builtin routes the pattern through redialect.rust_to_java, which
# rewrites the constructs that are valid Rust but invalid or
# differently-behaved Java ((?P<name>, POSIX classes, `.` vs \r, `$`
# vs final newline, literal [ in classes); the non-rewritable deltas
# (\w Unicode breadth, \p{} names, (?m)$ on \r\n, class -- / ~~) are
# enumerated by redialect.dialect_warnings and pinned by
# tests/test_redialect.py against live Spark behavior.


def _rx(pattern: str) -> str:
    from jetro_spark.functions.redialect import rust_to_java

    return rust_to_java(pattern)


def re_match(c: Column, pattern: str) -> Column:  # regex.rs:11
    return c.rlike(_rx(pattern))


def re_match_first(c: Column, pattern: str) -> Column:
    """First match or null. Reference: regex.rs:27."""
    ext = F.regexp_extract(c, f"({_rx(pattern)})", 1)
    return F.when(ext == "", F.lit(None)).otherwise(ext)


def re_match_all(c: Column, pattern: str) -> Column:  # regex.rs:47
    return F.regexp_extract_all(c, F.lit(f"({_rx(pattern)})"), F.lit(1))


def re_captures(c: Column, pattern: str, group: int = 1) -> Column:  # regex.rs:67
    ext = F.regexp_extract(c, _rx(pattern), group)
    return F.when(ext == "", F.lit(None)).otherwise(ext)


def re_captures_all(c: Column, pattern: str, group: int = 1) -> Column:  # regex.rs:96
    return F.regexp_extract_all(c, F.lit(_rx(pattern)), F.lit(group))


def re_split(c: Column, pattern: str) -> Column:  # regex.rs:162
    return F.split(c, _rx(pattern))


def re_replace(c: Column, pattern: str, new: str) -> Column:
    """Replace first regex match. Reference: regex.rs:124.

    Spark's regexp_replace replaces all; locate the first match with
    regexp_instr/regexp_substr and splice. Group backreferences ($1) in
    ``new`` still work: the replacement is applied to just the matched
    substring re-anchored with the original pattern (non-capturing wrap
    keeps group numbering). Handles multiline inputs and patterns with
    capture groups — unlike a prefix-group rewrite."""
    pattern = _rx(pattern)
    pos = F.regexp_instr(c, F.lit(pattern))  # 1-based start, 0 when no match
    m = F.regexp_substr(c, F.lit(pattern))  # first matched substring
    head = F.substring(c, 1, (pos - 1).cast("int"))
    repl = F.regexp_replace(m, f"(?s)\\A(?:{pattern})\\z", new)
    tail = c.substr(pos + F.length(m), F.length(c))
    return F.when(pos > 0, F.concat(head, repl, tail)).otherwise(c)


def re_replace_all(c: Column, pattern: str, new: str) -> Column:  # regex.rs:141
    return F.regexp_replace(c, _rx(pattern), new)


def contains_any(c: Column, patterns: list[str]) -> Column:  # regex.rs:179
    return c.rlike("|".join(f"(?:{_rx(p)})" for p in patterns))


def contains_all(c: Column, patterns: list[str]) -> Column:  # regex.rs:187-193
    out = None
    for p in patterns:
        t = c.rlike(_rx(p))
        out = t if out is None else (out & t)
    return out if out is not None else F.lit(True)


# --------------------------------------------------------------- predicates


# \z not $: Java $ also matches before a FINAL newline, so "123\n"
# would count as numeric — the reference's Rust $ (end of haystack)
# does not (redialect module, delta 4)
def is_blank(c: Column) -> Column:  # mod.rs:306
    return c.rlike(r"^\s*\z")


def is_numeric(c: Column) -> Column:  # mod.rs:308
    return c.rlike(r"^[0-9]+\z")


def is_alpha(c: Column) -> Column:  # mod.rs:310
    return c.rlike(r"^[A-Za-z]+\z")


def is_ascii(c: Column) -> Column:  # mod.rs:312
    return ~c.rlike(r"[^\x00-\x7F]")


# ------------------------------------------------------------ parse/convert


def parse_int(c: Column) -> Column:  # string.rs:509
    return c.try_cast("long")


def parse_float(c: Column) -> Column:  # string.rs:517
    return c.try_cast("double")


def parse_bool(c: Column) -> Column:  # string.rs:526
    return (
        F.when(F.lower(c).isin("true", "1", "yes"), F.lit(True))
        .when(F.lower(c).isin("false", "0", "no"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def to_number(c: Column) -> Column:
    return c.try_cast("double")


def to_string(c: Column) -> Column:  # misc.rs:42
    return c.cast("string")


# ----------------------------------------------------------------- encoding


def to_base64(c: Column) -> Column:  # string.rs:293
    return F.base64(c.cast("binary"))


def from_base64(c: Column) -> Column:  # string.rs:536
    return F.unbase64(c).cast("string")


def url_encode(c: Column) -> Column:  # string.rs:244
    return F.url_encode(c)


def url_decode(c: Column) -> Column:  # string.rs:265
    return F.try_url_decode(c)


def html_escape(c: Column) -> Column:
    """&, <, >, ", ' → entities. Reference: string.rs:213."""
    s = F.replace(c, F.lit("&"), F.lit("&amp;"))
    s = F.replace(s, F.lit("<"), F.lit("&lt;"))
    s = F.replace(s, F.lit(">"), F.lit("&gt;"))
    s = F.replace(s, F.lit('"'), F.lit("&quot;"))
    return F.replace(s, F.lit("'"), F.lit("&#x27;"))


def html_unescape(c: Column) -> Column:
    """Reference: string.rs:232."""
    s = F.replace(c, F.lit("&lt;"), F.lit("<"))
    s = F.replace(s, F.lit("&gt;"), F.lit(">"))
    s = F.replace(s, F.lit("&quot;"), F.lit('"'))
    s = F.replace(s, F.lit("&#x27;"), F.lit("'"))
    return F.replace(s, F.lit("&amp;"), F.lit("&"))


# --------------------------------------------------------------------- math


def ceil(c: Column) -> Column:  # string.rs:437
    return F.ceil(c).cast("long")


def floor(c: Column) -> Column:  # string.rs:455
    return F.floor(c).cast("long")


def round_(c: Column, digits: int = 0) -> Column:  # string.rs:473
    return F.round(c, digits)


def abs_(c: Column) -> Column:  # string.rs:491
    return F.abs(c)




# ------------------------------------------------------------- stragglers


def scan(c: Column, sub: str) -> Column:
    """Every non-overlapping occurrence of the LITERAL `sub` → array of
    the matched strings (all equal to `sub`). Reference: string.rs:630
    scan_apply (count via length delta — exact for literal,
    non-overlapping matches)."""
    if not sub:
        return F.array().cast("array<string>")
    count = ((F.length(c) - F.length(F.replace(c, F.lit(sub), F.lit(""))))
             / F.lit(len(sub))).cast("int")
    return F.array_repeat(F.lit(sub), count)


def last_index_of(c: Column, sub: str) -> Column:
    """0-based CHAR index of the last occurrence, -1 when absent.
    Reference: mod.rs:2099,2113-2123 str_index_of(last=true).
    rfind via the reverse trick: instr(reverse(s), reverse(sub))."""
    rpos = F.instr(F.reverse(c), F.reverse(F.lit(sub)))
    return F.when(rpos > 0,
                  (F.length(c) - rpos + 1 - F.lit(len(sub))).cast("long")) \
        .otherwise(F.lit(-1).cast("long"))


def dedent(c: Column) -> Column:
    """Remove the common leading-whitespace prefix length (min over
    non-blank lines) from every line. Reference: string.rs:624-645
    dedent_apply."""
    ls = lines(c)
    non_blank = F.filter(ls, lambda l: F.length(F.trim(l)) > 0)
    min_indent = F.coalesce(
        F.array_min(F.transform(non_blank,
                                lambda l: F.length(l) - F.length(F.ltrim(l)))),
        F.lit(0))
    return F.array_join(
        F.transform(
            ls,
            lambda l: F.when(F.length(l) >= min_indent,
                             F.substr(l, min_indent + 1, F.length(l)))
            .otherwise(l)),
        "\n")


def bytes_of(c: Column) -> Column:
    """UTF-8 bytes of the string as array<long>. Reference: string.rs:428
    bytes_of_apply. Built-in only: hex-encode then decode pairs."""
    h = F.hex(F.encode(c, "UTF-8"))
    # sequence(1, 0) would be DESCENDING (the F.sequence trap): guard empty
    return F.when(
        F.length(h) >= 2,
        F.transform(
            F.sequence(F.lit(1), (F.length(h) / 2).cast("long")),
            lambda i: F.conv(F.substring(h, (i * 2 - 1).cast("int"), 2), 16, 10)
            .cast("long"))
    ).otherwise(F.array().cast("array<long>"))


def to_bool(c: Column) -> Column:
    """'true'→true, 'false'→false, anything else→null (distinct from
    parse_bool). Reference: mod.rs:2076-2080."""
    return F.when(c == "true", F.lit(True)) \
        .when(c == "false", F.lit(False)) \
        .otherwise(F.lit(None).cast("boolean"))
