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

Two deltas that were flagged-only through round 7 are now TRANSLATED:

6. ``\b`` / ``\B`` — Unicode-wide in the Rust dialect (defined against
   the UTS#18 ``\w``), ASCII in Java. Java supports lookaround and the
   Rust regex crate does NOT — so no valid reference pattern can
   collide with the lookaround emulation, making
   ``(?:(?<=X)(?!X)|(?<!X)(?=X))`` (X = the Unicode word class) a
   collision-free exact rewrite (``\B`` is the same with the inner
   look-aheads' polarity flipped). Skipped under ``(?-u)`` where
   Java's native ASCII ``\b`` already matches Rust's semantics.
7. Class set operations ``--`` (difference) / ``~~`` (symmetric
   difference) — Rust-only syntax, a PatternSyntaxException in Java.
   Translated structurally (a small set-algebra AST, not string
   splices): ``[A--B]`` → ``[A&&[^B]]``, ``[A~~B]`` →
   ``[[A&&[^B]][B&&[^A]]]``, with complements pushed through De
   Morgan because Java mis-parses a nested class under a negated
   union (``[^a[b]]`` matches ``b``). Shapes the structural
   translator can't prove safe are left untouched and keep their
   dialect warning.

Remaining SEMANTIC deltas that cannot be mechanically rewritten are
reported by :func:`dialect_warnings` (consumed by tests and available
to callers):

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
- Class set operations ``--`` / ``~~`` in a shape the structural
  translator declines (see 7 above).
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

# Rust's Unicode \b, emulated with Java lookaround (which the Rust
# crate forbids, so no valid reference pattern collides with it): a
# word boundary is any position where is-word flips between the
# preceding and following character; \B is any position where it
# doesn't. Lookbehind here is fixed-width 1, always Java-legal, and
# (?<!X) succeeds at the start of input exactly like the crate's \b.
_WCLS = f"[{_W_MEMBERS}]"
_B_UNI = f"(?:(?<={_WCLS})(?!{_WCLS})|(?<!{_WCLS})(?={_WCLS}))"
_NOT_B_UNI = f"(?:(?<={_WCLS})(?={_WCLS})|(?<!{_WCLS})(?!{_WCLS}))"


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


class _SetFallback(Exception):
    """Raised when a class-set shape can't be proven safe in Java —
    the class is left untouched and keeps its dialect warning."""


def _scan_class(pattern: str, i: int) -> int:
    """``pattern[i] == '['``: return the index just past the matching
    ``]`` (escape-aware, nesting-aware, POSIX ``[:...:]`` atoms opaque,
    leading ``]`` after ``[``/``[^`` literal per the regex crate)."""
    n = len(pattern)
    j = i + 1
    if j < n and pattern[j] == "^":
        j += 1
    if j < n and pattern[j] == "]":
        j += 1  # literal leading ]
    depth = 1
    while j < n:
        ch = pattern[j]
        if ch == "\\":
            j += 2
            continue
        if pattern.startswith("[:", j):
            end = pattern.find(":]", j + 2)
            if end != -1:
                j = end + 2
                continue
        if ch == "[":
            depth += 1
            j += 1
            if j < n and pattern[j] == "^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            continue
        if ch == "]":
            depth -= 1
            j += 1
            if depth == 0:
                return j
            continue
        j += 1
    raise _SetFallback("unterminated class")


# Class-set AST: ('union', [('run', text) | node, ...]) — a run is a
# maximal stretch of simple items (literals/ranges/escapes/POSIX) —
# ('op', '--'|'~~'|'&&', left, right), ('not', node).


def _parse_class_body(body: str):
    """Parse a class body (outer brackets and leading ``^`` already
    stripped) into the set AST, left-associative on the operators —
    ``x--y--z`` is ``(x--y)--z``, matching the regex crate."""
    parts: list = []          # union members of the current operand
    run: list[str] = []
    pending: list[tuple] = []  # [(op, left_node), ...] in source order

    def flush_run():
        if run:
            parts.append(("run", "".join(run)))
            run.clear()

    def close_union():
        flush_run()
        if not parts:
            raise _SetFallback("empty operand")
        node = ("union", list(parts))
        parts.clear()
        return node

    i, n = 0, len(body)
    first = True
    while i < n:
        ch = body[i]
        if ch == "\\":
            run.append(body[i:i + 2])
            i += 2
            first = False
            continue
        if body.startswith("[:", i):
            end = body.find(":]", i + 2)
            if end != -1:
                run.append(body[i:end + 2])
                i = end + 2
                first = False
                continue
        if ch == "]" and first:
            run.append("]")
            i += 1
            first = False
            continue
        if ch == "[":
            j = _scan_class(body, i)
            flush_run()
            inner = body[i + 1:j - 1]
            neg = inner.startswith("^")
            node = _parse_class_body(inner[1:] if neg else inner)
            parts.append(("not", node) if neg else node)
            i = j
            first = False
            continue
        if ch in "-~&" and i + 1 < n and body[i + 1] == ch:
            op = {"-": "--", "~": "~~", "&": "&&"}[ch]
            pending.append((op, close_union()))
            i += 2
            first = False  # mirror _scan_class: only [ / [^ make ] literal
            continue
        run.append(ch)
        i += 1
        first = False
    node = close_union()
    if pending:
        acc = pending[0][1]
        rights = [left for _, left in pending[1:]] + [node]
        for (op, _), right in zip(pending, rights):
            acc = ("op", op, acc, right)
        node = acc
    return node


# Uppercase perl escapes splice (in the main pass) to a NESTED NEGATED
# class — safe in a positive union, Java-misparsed under [^...]; a run
# containing one can only be negated when it is exactly that escape
# (flip its case) or via fallback.
_NEG_PERL = {r"\W": r"\w", r"\D": r"\d", r"\S": r"\s",
             r"\w": r"\W", r"\d": r"\D", r"\s": r"\S",
             r"\P": r"\p", r"\p": r"\P"}


def _run_has_upper_perl(text: str) -> bool:
    i, n = 0, len(text)
    while i < n:
        if text[i] == "\\" and i + 1 < n:
            if text[i + 1] in "WDS":
                return True
            i += 2
            continue
        i += 1
    return False


def _emit_set(node) -> str:
    """Render a set-AST node as a bracketed Java class. Invariant kept
    throughout: a nested class NEVER appears directly inside a negated
    union (Java parses ``[^a[b]]`` as ``[^a]∪[b]``, not ``¬(a∪b)``) —
    negation is pushed through De Morgan instead."""
    kind = node[0]
    if kind == "union":
        out = []
        for p in node[1]:
            out.append(p[1] if p[0] == "run" else _emit_set(p))
        return "[" + "".join(out) + "]"
    if kind == "not":
        return _emit_not(node[1])
    _, op, left, right = node
    if op == "&&":
        return f"[{_emit_set(left)}&&{_emit_set(right)}]"
    if op == "--":  # l ∩ ¬r
        return f"[{_emit_set(left)}&&{_emit_not(right)}]"
    # ~~: (l ∩ ¬r) ∪ (r ∩ ¬l)
    return (f"[[{_emit_set(left)}&&{_emit_not(right)}]"
            f"[{_emit_set(right)}&&{_emit_not(left)}]]")


def _emit_not(node) -> str:
    """Render the COMPLEMENT of a set-AST node as a bracketed Java
    class, De-Morganing so no nested class lands under a ``[^``."""
    kind = node[0]
    if kind == "not":
        return _emit_set(node[1])
    if kind == "union":
        runs = [p[1] for p in node[1] if p[0] == "run"]
        nested = [p for p in node[1] if p[0] != "run"]
        run_text = "".join(runs)
        if not nested:
            if _run_has_upper_perl(run_text):
                # [^\W] is Java-misparsed after the perl splice; a pure
                # single-escape run flips case instead
                if run_text in _NEG_PERL:
                    return f"[{_NEG_PERL[run_text]}]"
                raise _SetFallback(r"\W \D \S in a negated mixed run")
            return f"[^{run_text}]"
        # ¬(runs ∪ n1 ∪ n2 ...) = ¬runs ∩ ¬n1 ∩ ¬n2 ...
        terms = []
        if run_text:
            terms.append(_emit_not(("union", [("run", run_text)])))
        terms.extend(_emit_not(p) for p in nested)
        return "[" + "&&".join(terms) + "]" if len(terms) > 1 else terms[0]
    _, op, left, right = node
    if op == "&&":   # ¬(l ∩ r) = ¬l ∪ ¬r
        return f"[{_emit_not(left)}{_emit_not(right)}]"
    if op == "--":   # ¬(l ∩ ¬r) = ¬l ∪ r
        return f"[{_emit_not(left)}{_emit_set(right)}]"
    # ¬(l ~~ r) = (l ∩ r) ∪ (¬l ∩ ¬r)
    return (f"[[{_emit_set(left)}&&{_emit_set(right)}]"
            f"[{_emit_not(left)}&&{_emit_not(right)}]]")


def _class_needs_set_rewrite(cls: str) -> bool:
    """True when Java would misparse this class as written: Rust-only
    ``--``/``~~`` operators anywhere inside it, or a negated class
    whose body contains nesting or ``&&`` (both Java-misparsed under
    ``[^``)."""
    body = cls[1:-1]
    neg = body.startswith("^")
    if neg:
        body = body[1:]
    has_op = has_nest = False
    i, n = 0, len(body)
    first = True
    while i < n:
        ch = body[i]
        if ch == "\\":
            if neg and i + 1 < n and body[i + 1] in "WDS":
                # the perl splice would nest a negated class under [^
                has_op = True
            i += 2
            first = False
            continue
        if body.startswith("[:", i):
            end = body.find(":]", i + 2)
            if end != -1:
                i = end + 2
                first = False
                continue
        if ch == "]" and first:
            i += 1
            first = False
            continue
        if ch == "[":
            has_nest = True
            j = _scan_class(body, i)
            if _class_needs_set_rewrite(body[i:j]):
                has_op = True
            i = j
            first = False
            continue
        if ch in "-~" and i + 1 < n and body[i + 1] == ch:
            has_op = True
            i += 2
            first = False
            continue
        if ch == "&" and i + 1 < n and body[i + 1] == "&":
            if neg:
                has_op = True  # [^a&&b] needs structural negation
            i += 2
            first = False
            continue
        i += 1
        first = False
    return has_op or (neg and has_nest)


def _rewrite_class_sets(pattern: str) -> str:
    """Pre-pass over the whole pattern: classes Java would misparse
    (see :func:`_class_needs_set_rewrite`) are re-emitted through the
    set AST; all other text — including op-free classes — is copied
    VERBATIM so the main-pass behaviors are undisturbed. Any
    un-translatable shape leaves its class untouched (the dialect
    warning stays)."""
    out: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if ch == "[":
            try:
                j = _scan_class(pattern, i)
            except _SetFallback:
                out.append(pattern[i:])
                return "".join(out)
            cls = pattern[i:j]
            if _class_needs_set_rewrite(cls):
                try:
                    body = cls[1:-1]
                    neg = body.startswith("^")
                    ast = _parse_class_body(body[1:] if neg else body)
                    cls = _emit_not(ast) if neg else _emit_set(ast)
                except _SetFallback:
                    pass  # leave as-is; dialect_warnings keeps flagging
            out.append(cls)
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


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
    if "--" in pattern or "~~" in pattern or "[^" in pattern:
        pattern = _rewrite_class_sets(pattern)
    out: list[str] = []
    i, n = 0, len(pattern)
    depth = 0  # character-class nesting (identical semantics both dialects)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            esc = pattern[i + 1]
            if unicode_perl and esc in "wWdDsS":
                out.append((_PERL_IN if depth else _PERL_OUT)[esc])
            elif unicode_perl and esc in "bB" and not depth:
                out.append(_B_UNI if esc == "b" else _NOT_B_UNI)
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
    if _re.search(r"\\[pP]\{", pattern):
        warns.append(
            r"\p{...} property names differ between dialects; verify the "
            r"name exists in java.util.regex.Pattern")
    if _flag_enabled(pattern, "m") and "$" in pattern:
        warns.append(
            "(?m)$ before \\r\\n: Java matches before the \\r, the Rust "
            "dialect before the \\n")
    if _re.search(r"\[[^\]]*(--|~~)", pattern):
        # set ops are structurally translated since r8 — warn only when
        # the translator declined the shape (the op survives the pre-pass)
        if _re.search(r"\[[^\]]*(--|~~)", _rewrite_class_sets(pattern)):
            warns.append(
                "class set operations -- (difference) / ~~ (symmetric "
                "difference) exist only in the Rust dialect and this "
                "shape resisted structural translation; rewrite as "
                "[X&&[^Y]] for Java manually")
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
