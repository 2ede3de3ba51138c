r"""Rust-regex → Java-Pattern dialect translation and audit.

The reference's regex builtins take Rust ``regex``-crate patterns
(jetro-core/src/builtins/ops/regex.rs); Spark evaluates Java
``java.util.regex.Pattern``. Lookaround and backreferences don't exist
in Rust, so every reference-legal pattern is syntactically *almost*
Java-legal — the concrete dialect deltas for patterns that ARE valid
Rust:

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
5. ``\w \d \s`` (and ``\W \D \S``) — Unicode-wide in the Rust dialect
   (UTS#18: ``\w`` = Alphabetic + M + Nd + Pc + Join_Control, ``\d`` =
   Nd, ``\s`` = White_Space), ASCII in Java. TRANSLATED to the exact
   Java ``\p``-class equivalents (Java supports the binary properties
   ``IsAlphabetic``/``IsJoin_Control``/``IsWhite_Space`` and the
   general categories ``M``/``Nd``/``Pc``, so the rewrite is exact,
   not the looser ``\p{L}\p{N}`` approximation). Skipped when the
   pattern uses Rust's ``(?-u)`` ASCII mode, where Java's native ASCII
   semantics are already correct.

Character classes NEST in both dialects with identical semantics
(``[x[^xyz]]``, ``[0-9&&[^4]]``): an unescaped inner ``[`` opens a
nested class and is passed through unchanged. (Round 6 wrongly escaped
it as a literal — ``[a[b]`` is a parse error in the regex crate, not
the set ``{a,[,b}``; the round-7 fix restores the pass-through.)

DuckDB's regexp functions (RE2) agree with Rust on 3 and 4, so the
translation also aligns the Spark legs of the oracle gate with their
DuckDB counterparts. (RE2's perl classes are ASCII like Java's; oracle
rows exercising ``\w``-style patterns on non-ASCII text must spell the
DuckDB leg with explicit ``\p`` categories.)

Remaining SEMANTIC deltas that cannot be mechanically rewritten are
reported by :func:`dialect_warnings` (consumed by tests and available
to callers):

- ``\b`` — Java's word boundary is defined against Java's ASCII
  ``\w`` regardless of any class rewriting; Rust's is Unicode-wide.
  No Java spelling reproduces it (lookaround around a ``\p`` class
  changes width semantics), so it is flagged, not rewritten.
- ``\p{...}`` — the dialects accept different property-name sets
  (e.g. Rust ``\p{Alphabetic}`` vs Java ``\p{IsAlphabetic}``).
- ``(?m)`` + ``$`` — Java treats ``\r\n`` sequences specially.
- ``(?-u)`` — Rust's ASCII-mode flag; Java parses ``u`` as
  UNICODE_CASE, a different meaning. Perl-class rewrites are skipped
  (Java's ASCII default matches Rust's ``(?-u)`` semantics) but the
  flag itself is flagged for caller review.
- Scoped inline-flag groups ``(?s:...)`` — the translator treats any
  inline flag as pattern-wide (it only ever SKIPS a rewrite, never
  makes a wrong one), so a scoped group suppresses the ``.``/``$``
  rewrites outside its scope too; flagged so the delta is surfaced.
- Class set operations ``--`` / ``~~`` — Rust-only syntax.
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

# Rust's Unicode perl classes, spelled in Java \p properties. Exact per
# the regex crate (UTS#18 annex C): \w = [\p{Alphabetic}\p{M}\p{Nd}
# \p{Pc}\p{Join_Control}], \d = \p{Nd}, \s = \p{White_Space}. Java
# exposes the binary properties as Is-prefixed names.
_W_MEMBERS = r"\p{IsAlphabetic}\p{M}\p{Nd}\p{Pc}\p{IsJoin_Control}"
_PERL_OUT = {  # outside a character class
    "w": f"[{_W_MEMBERS}]", "W": f"[^{_W_MEMBERS}]",
    "d": r"\p{Nd}", "D": r"\P{Nd}",
    "s": r"\p{IsWhite_Space}", "S": r"\P{IsWhite_Space}",
}
_PERL_IN = {  # spliced into / nested inside an enclosing class
    "w": _W_MEMBERS, "W": f"[^{_W_MEMBERS}]",
    "d": r"\p{Nd}", "D": r"\P{Nd}",
    "s": r"\p{IsWhite_Space}", "S": r"\P{IsWhite_Space}",
}


def _scan_flags(pattern: str, flag: str) -> tuple[bool, bool]:
    r"""Escape-aware probe for inline flag groups: returns
    ``(enabled, scoped)`` where ``enabled`` is True if ``flag`` appears
    in the enabling half of any inline group (``(?s)``, ``(?s-m)``,
    ``(?s:...)``) and ``scoped`` is True if that group was the scoped
    ``(?s:...)`` form. Treating a scoped flag as pattern-wide only ever
    SKIPS a rewrite, never makes a wrong one; the scoped case is
    additionally surfaced by dialect_warnings. A ``(?`` preceded by an
    unescaped backslash (e.g. ``\(?s)``) is a literal paren + optional
    quantifier, not a flag group, and is skipped."""
    enabled = scoped = False
    i, n = 0, len(pattern)
    while i < n:
        if pattern[i] == "\\":
            i += 2
            continue
        if pattern.startswith("(?", i):
            j = i + 2
            head_end = j
            while head_end < n and pattern[head_end] in "imsxuU-":
                head_end += 1
            if head_end < n and pattern[head_end] in "):":
                head = pattern[j:head_end].split("-", 1)[0]
                if flag in head:
                    enabled = True
                    if pattern[head_end] == ":":
                        scoped = True
            i = head_end
            continue
        i += 1
    return enabled, scoped


def _flag_enabled(pattern: str, flag: str) -> bool:
    return _scan_flags(pattern, flag)[0]


def rust_to_java(pattern: str, unicode_perl: bool = True) -> str:
    r"""Translate a Rust-dialect pattern to the Java pattern with the
    same meaning (see module docstring for exactly what is rewritten).
    Pure string scan: tracks escapes and (nested) character classes so
    literals after ``\\`` are never touched and ``.``/``$`` rewrites
    stay outside ``[...]``.

    ``unicode_perl=False`` leaves ``\w \d \s`` at Java's ASCII
    semantics (automatic when the pattern carries Rust's ``(?-u)``)."""
    dotall = _flag_enabled(pattern, "s")
    multiline = _flag_enabled(pattern, "m")
    if "(?-" in pattern and "u" in pattern.split("(?-", 1)[1].split(")", 1)[0]:
        unicode_perl = False  # Rust ASCII mode == Java's native classes
    out: list[str] = []
    i, n = 0, len(pattern)
    depth = 0  # character-class nesting (identical semantics both dialects)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            esc = pattern[i + 1]
            if unicode_perl and esc in "wWdDsS":
                out.append((_PERL_IN if depth else _PERL_OUT)[esc])
            else:
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
        if ch == "[":
            # opens a (possibly nested) class — both dialects nest with
            # identical semantics, so pass through and track depth
            depth += 1
            out.append(ch)
            i += 1
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            if i < n and pattern[i] == "]":
                out.append(r"\]")  # leading ] is a literal member; Java
                i += 1             # needs the escape
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
    if _re.search(r"(?<!\\)(\\\\)*\\b", pattern):
        warns.append(
            r"\b word boundary is anchored to Java's ASCII \w even with "
            r"unicode_perl rewriting; Rust's is Unicode-wide")
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
    if "(?-" in pattern and "u" in pattern.split("(?-", 1)[1].split(")", 1)[0]:
        warns.append(
            "(?-u) is Rust's ASCII-mode flag; Java parses u as "
            "UNICODE_CASE — perl-class rewrites are skipped but strip "
            "the flag before compiling in Java")
    for f in ("s", "m"):
        enabled, scoped = _scan_flags(pattern, f)
        if enabled and scoped and (("." in pattern and f == "s")
                                   or ("$" in pattern and f == "m")):
            warns.append(
                f"scoped inline flag (?{f}:...) suppresses the "
                f"{'.' if f == 's' else '$'} rewrite across the WHOLE "
                "pattern, not just its scope — review manually")
    return warns
