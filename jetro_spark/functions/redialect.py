r"""Rust-regex → Java-Pattern dialect translation and audit.

The reference's regex builtins take Rust ``regex``-crate patterns
(jetro-core/src/builtins/ops/regex.rs); Spark evaluates Java
``java.util.regex.Pattern``. Lookaround and backreferences don't exist
in Rust, so every reference-legal pattern is syntactically *almost*
Java-legal — but four concrete dialect deltas remain for patterns that
ARE valid Rust (the round-5 audit gap):

1. ``(?P<name>...)`` — Rust accepts both ``(?P<name>)`` and
   ``(?<name>)``; Java throws ``PatternSyntaxException`` on ``(?P<``.
   TRANSLATED: ``(?P<`` → ``(?<``.
2. POSIX classes ``[[:alpha:]]`` etc. — valid inside Rust classes,
   a syntax error in Java (which spells them ``\\p{Alpha}``).
   TRANSLATED per the table below (both dialects define them as ASCII).
3. ``.`` — Rust: any char except ``\n``. Java: any char except ALL
   line terminators (``\n \r \u0085 \u2028 \u2029``). TRANSLATED:
   unescaped ``.`` outside classes → ``[^\n]`` (skipped when the
   pattern enables DOTALL ``(?s)``, where both dialects agree).
4. ``$`` — Rust: end of haystack only. Java: ALSO before a final line
   terminator. TRANSLATED: unescaped ``$`` outside classes → ``\z``
   (skipped in MULTILINE ``(?m)`` patterns, where both mean
   end-of-line; Java's CR/LF nuances there are flagged, not rewritten).

DuckDB's regexp functions (RE2) agree with Rust on 3 and 4, so the
translation also aligns the Spark legs of the oracle gate with their
DuckDB counterparts.

Remaining SEMANTIC deltas that cannot be mechanically rewritten are
reported by :func:`dialect_warnings` (consumed by tests and available
to callers):

- ``\w \d \s \b`` — Unicode-wide in Rust, ASCII in Java (without
  ``(?U)``; adding ``(?U)`` globally would also widen POSIX classes,
  so it is NOT applied automatically).
- ``\p{...}`` — the dialects accept different property-name sets
  (e.g. Rust ``\p{Alphabetic}`` vs Java ``\p{IsAlphabetic}``).
- ``(?m)`` + ``$`` — Java treats ``\r\n`` sequences specially.
"""

from __future__ import annotations

# Rust/RE2 POSIX classes → the Java \p spellings (ASCII in both).
_POSIX = {
    "alpha": r"\p{Alpha}", "digit": r"\p{Digit}", "alnum": r"\p{Alnum}",
    "upper": r"\p{Upper}", "lower": r"\p{Lower}", "space": r"\p{Space}",
    "blank": r"\p{Blank}", "cntrl": r"\p{Cntrl}", "graph": r"\p{Graph}",
    "print": r"\p{Print}", "punct": r"\p{Punct}", "xdigit": r"\p{XDigit}",
    "ascii": r"\x00-\x7f", "word": r"\w",
}


def _flag_enabled(pattern: str, flag: str) -> bool:
    """Crude but adequate probe for an inline flag group anywhere in the
    pattern (reference queries use whole-pattern ``(?s)``/``(?m)``
    prefixes; scoped flag groups are rare enough that treating any
    occurrence as pattern-wide only ever SKIPS a rewrite, never makes a
    wrong one)."""
    i = pattern.find("(?")
    while i != -1:
        j = pattern.find(")", i)
        head = pattern[i + 2:j if j != -1 else len(pattern)]
        head = head.split(":", 1)[0]
        if "-" in head:
            head = head.split("-", 1)[0]
        if flag in head and all(c in "imsxuU" for c in head):
            return True
        i = pattern.find("(?", i + 2)
    return False


def rust_to_java(pattern: str) -> str:
    """Translate a Rust-dialect pattern to the Java pattern with the
    same meaning (see module docstring for exactly what is rewritten).
    Pure string scan: tracks escapes and (nested) character classes so
    literals inside ``[...]`` and after ``\\`` are never touched."""
    dotall = _flag_enabled(pattern, "s")
    multiline = _flag_enabled(pattern, "m")
    out: list[str] = []
    i, n = 0, len(pattern)
    depth = 0  # character-class nesting (Java classes nest; Rust's don't)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if depth and ch == "[" and pattern.startswith("[:", i):
            end = pattern.find(":]", i + 2)
            name = pattern[i + 2:end] if end != -1 else ""
            neg = name.startswith("^")
            if end != -1 and name.lstrip("^") in _POSIX:
                body = _POSIX[name.lstrip("^")]
                if neg:
                    # [[:^alpha:]] → nested negated class
                    out.append(f"[^{body}]" if not body.startswith("\\p")
                               else body.replace(r"\p", r"\P", 1))
                else:
                    out.append(body)
                i = end + 2
                continue
        if ch == "[" and depth:
            # a bare [ inside a Rust class is a LITERAL; Java would open
            # a nested class and silently drop it — escape it
            out.append(r"\[")
            i += 1
            continue
        if ch == "[":
            depth += 1
            out.append(ch)
            # leading ] or ^] are literal members in both dialects
            i += 1
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            if i < n and pattern[i] == "]":
                out.append(r"\]")  # literal member; Java needs the escape
                i += 1
            continue
        if ch == "]" and depth:
            depth -= 1
            out.append(ch)
            i += 1
            continue
        if not depth:
            if pattern.startswith("(?P<", i):
                out.append("(?<")
                i += 4
                continue
            if ch == "." and not dotall:
                out.append(r"[^\n]")
                i += 1
                continue
            if ch == "$" and not multiline:
                out.append(r"\z")
                i += 1
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def dialect_warnings(pattern: str) -> list[str]:
    """Non-rewritable semantic deltas present in ``pattern`` — the
    audit half of the translation (each entry names the construct and
    the divergence)."""
    import re as _re

    warns = []
    # strip classes/escapes crudely for the \w\d\s\b probe: an escape is
    # what we are looking for, so only double-backslash needs care
    if _re.search(r"\\[wdsb]", pattern, _re.IGNORECASE):
        warns.append(
            r"\w/\d/\s/\b are Unicode-wide in the Rust dialect but ASCII "
            r"in Java; add (?U) if non-ASCII text must match")
    if _re.search(r"\\[pP]\{", pattern):
        warns.append(
            r"\p{...} property names differ between dialects; verify the "
            r"name exists in java.util.regex.Pattern")
    if _flag_enabled(pattern, "m") and "$" in pattern:
        warns.append(
            "(?m)$ before \\r\\n: Java matches before the \\r, the Rust "
            "dialect before the \\n")
    if _re.search(r"\[[^\]]*(--|~~)", pattern):
        warns.append(
            "class set operations -- (difference) / ~~ (symmetric "
            "difference) exist only in the Rust dialect; rewrite as "
            "[X&&[^Y]] for Java")
    return warns
