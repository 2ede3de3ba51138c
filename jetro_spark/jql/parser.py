"""JQL recursive-descent parser.

Mirrors the reference PEG (jetro-core/src/grammar.pest) rule-for-rule; the
precedence ladder follows grammar.pest's expression hierarchy:

    cond (ternary/try) → pipe → coalesce → or → and → not → kind →
    has → cmp → add → mul → cast(as) → unary-neg → postfix → primary

Parser-level desugarings replicated from the reference
(jc/parse/parser.rs): multi-`let` → nested Let (parser.rs desugars),
`lhs has rhs` stays a Has node (compiled as `.includes`, parser.rs:306-322),
f-string interpolations parsed here (parser.rs:839-885).
"""

from __future__ import annotations

from jetro_spark.jql import ast as A
from jetro_spark.jql.lexer import Token, tokenize

KIND_TYPES = {"number", "string", "array", "object", "bool", "null"}
CAST_TYPES = KIND_TYPES | {"int", "float"}
CMP_OPS = {"~=", "==", "!=", ">=", "<=", ">", "<"}


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks: list[Token] = tokenize(src)
        self.i = 0

    # ------------------------------------------------------------ helpers

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, kind: str, value: str | None = None, k: int = 0) -> bool:
        t = self.peek(k)
        return t.kind == kind and (value is None or t.value == value)

    def at_punct(self, value: str, k: int = 0) -> bool:
        return self.at("punct", value, k)

    def at_kw(self, value: str, k: int = 0) -> bool:
        return self.at("kw", value, k)

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None) -> Token:
        t = self.peek()
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError(
                f"expected {value or kind}, got {t.value!r} at {t.pos} in {self.src!r}"
            )
        return self.next()

    def eat_punct(self, value: str) -> bool:
        if self.at_punct(value):
            self.next()
            return True
        return False

    def eat_kw(self, value: str) -> bool:
        if self.at_kw(value):
            self.next()
            return True
        return False

    # ----------------------------------------------------------- entry

    def parse(self) -> A.Node:
        e = self.expr()
        if not self.at("eof"):
            t = self.peek()
            raise ParseError(f"trailing input {t.value!r} at {t.pos} in {self.src!r}")
        return e

    def expr(self) -> A.Node:
        return self.cond_expr()

    # cond_expr = try_expr | pipe_expr (if pipe_expr else cond_expr)?
    def cond_expr(self) -> A.Node:
        if self.at_kw("try"):
            self.next()
            if self.at_punct("("):
                save = self.i
                self.next()
                try:
                    body = self.expr()
                    self.expect("punct", ")")
                except ParseError:
                    self.i = save
                    body = self.pipe_expr()
            else:
                body = self.pipe_expr()
            self.expect("kw", "else")
            return A.Try(body, self.cond_expr())
        e = self.pipe_expr()
        if self.at_kw("if"):
            self.next()
            cond = self.pipe_expr()
            self.expect("kw", "else")
            return A.Ternary(cond, e, self.cond_expr())
        return e

    # pipe_expr = coalesce_expr pipe_step*
    def pipe_expr(self) -> A.Node:
        e = self.coalesce_expr()
        steps: list[A.Node] = []
        while True:
            if self.at_punct("|>") or self.at_punct("|"):
                self.next()
                if self.at("ident") and self.at_punct("(", 1):
                    name = self.next().value
                    self.next()
                    args = self.arg_list()
                    self.expect("punct", ")")
                    steps.append(A.PipeForward(A.GlobalCall(name, args)))
                else:
                    steps.append(A.PipeForward(self.coalesce_expr()))
            elif self.at_punct("->"):
                self.next()
                steps.append(self.bind_target())
            else:
                break
        return A.Pipe(e, steps) if steps else e

    def bind_target(self) -> A.PipeBind:
        if self.at_punct("{"):
            self.next()
            names, rest = [], None
            while not self.at_punct("}"):
                if self.at_punct("..."):
                    self.next()
                    rest = self.expect("ident").value
                else:
                    names.append(self.expect("ident").value)
                if not self.eat_punct(","):
                    break
            self.expect("punct", "}")
            return A.PipeBind("obj", names, rest)
        if self.at_punct("["):
            self.next()
            names = [self.expect("ident").value]
            while self.eat_punct(","):
                names.append(self.expect("ident").value)
            self.expect("punct", "]")
            return A.PipeBind("arr", names)
        return A.PipeBind("ident", [self.expect("ident").value])

    def coalesce_expr(self) -> A.Node:
        e = self.or_expr()
        while self.at_punct("??") or self.at_punct("?|"):
            self.next()
            e = A.Coalesce(e, self.or_expr())
        return e

    def or_expr(self) -> A.Node:
        e = self.and_expr()
        while self.at_kw("or"):
            self.next()
            e = A.Binary("or", e, self.and_expr())
        return e

    def and_expr(self) -> A.Node:
        e = self.not_expr()
        while self.at_kw("and"):
            self.next()
            e = A.Binary("and", e, self.not_expr())
        return e

    def not_expr(self) -> A.Node:
        if self.at_kw("not"):
            self.next()
            return A.Not(self.not_expr())
        return self.kind_expr()

    def kind_expr(self) -> A.Node:
        e = self.contains_expr()
        if self.at_kw("kind") or self.at_kw("is"):
            self.next()
            negated = self.eat_kw("not")
            t = self.peek()
            if (t.kind in ("ident", "kw")) and t.value in KIND_TYPES:
                self.next()
                return A.KindCheck(e, t.value, negated)
            raise ParseError(f"expected kind type, got {t.value!r} at {t.pos}")
        return e

    def contains_expr(self) -> A.Node:
        e = self.cmp_expr()
        if self.at_kw("has"):
            self.next()
            return A.Has(e, self.cmp_expr())
        return e

    def cmp_expr(self) -> A.Node:
        e = self.add_expr()
        t = self.peek()
        if t.kind == "punct" and t.value in CMP_OPS:
            self.next()
            return A.Binary(t.value, e, self.add_expr())
        return e

    def add_expr(self) -> A.Node:
        e = self.mul_expr()
        while self.at_punct("+") or self.at_punct("-"):
            op = self.next().value
            e = A.Binary(op, e, self.mul_expr())
        return e

    def mul_expr(self) -> A.Node:
        e = self.cast_expr()
        while self.at_punct("*") or self.at_punct("/") or self.at_punct("%"):
            op = self.next().value
            e = A.Binary(op, e, self.cast_expr())
        return e

    def cast_expr(self) -> A.Node:
        e = self.unary_expr()
        while self.at_kw("as"):
            self.next()
            t = self.peek()
            if (t.kind in ("ident", "kw")) and t.value in CAST_TYPES:
                self.next()
                e = A.Cast(e, t.value)
            else:
                raise ParseError(f"expected cast type, got {t.value!r} at {t.pos}")
        return e

    def unary_expr(self) -> A.Node:
        if self.at_punct("-"):
            self.next()
            return A.Neg(self.unary_expr())
        return self.postfix_expr()

    # --------------------------------------------------------- postfix

    def postfix_expr(self) -> A.Node:
        # leading `.field` / `..x` is shorthand for `@.field` (SYNTAX.md
        # try/else examples: `try .first_name + ' ' + .last_name else .name`)
        if self.at_punct(".") or self.at_punct(".."):
            base: A.Node = A.Current()
        else:
            base = self.primary()
        steps: list[A.Node] = []
        while True:
            step = self.postfix_step()
            if step is None:
                break
            steps.append(step)
        return A.Path(base, steps) if steps else base

    def postfix_step(self) -> A.Node | None:
        # deep_method / descendant
        if self.at_punct(".."):
            self.next()
            if self.at("ident") or (self.at("kw") and self.peek().value not in ()):
                t = self.peek()
                if t.kind == "ident":
                    name = self.next().value
                    if self.at_punct("("):
                        self.next()
                        args = self.arg_list()
                        self.expect("punct", ")")
                        return A.DeepMethod(name, args)
                    return A.Descendant(name)
            return A.Descendant(None)
        # method / dyn field / field
        if self.at_punct("."):
            if self.at_punct("{", 1):
                self.next()
                self.next()
                e = self.expr()
                self.expect("punct", "}")
                return A.DynField(e)
            self.next()
            t = self.peek()
            if t.kind not in ("ident", "kw"):
                raise ParseError(f"expected field name after '.', got {t.value!r} at {t.pos}")
            name = self.next().value
            if self.at_punct("("):
                self.next()
                args = self.arg_list()
                self.expect("punct", ")")
                return A.Method(name, args)
            return A.Field(name)
        # index / slice / map_into_shape
        if self.at_punct("["):
            if self.at_punct("*", 1):
                self.next()
                self.next()
                pred = None
                if self.eat_kw("if"):
                    pred = self.expr()
                self.expect("punct", "]")
                self.expect("punct", "=>")
                return A.MapShape(pred, self.expr())
            self.next()
            step = self.bracket_inner()
            self.expect("punct", "]")
            return step
        # inline filter
        if self.at_punct("{"):
            save = self.i
            self.next()
            try:
                e = self.expr()
                self.expect("punct", "}")
                return A.InlineFilter(e)
            except ParseError:
                self.i = save
                return None
        # quantifier
        if self.at_punct("?"):
            self.next()
            return A.Quantifier("?")
        if self.at_punct("!"):
            self.next()
            return A.Quantifier("!")
        return None

    def bracket_inner(self) -> A.Node:
        # slice forms (idx_val only) else expr index
        def try_int(k: int) -> tuple[int | None, int]:
            """Return (value, tokens consumed) if an idx_val starts at k."""
            if self.at_punct("-", k) and self.at("int", None, k + 1):
                return -int(self.peek(k + 1).value), 2
            if self.at("int", None, k):
                return int(self.peek(k).value), 1
            return None, 0

        v, used = try_int(0)
        if used and self.at_punct(":", used):
            self.i += used + 1
            hi, used2 = try_int(0)
            self.i += used2
            return A.Slice(v, hi)
        if self.at_punct(":"):
            self.next()
            hi, used2 = try_int(0)
            if used2 == 0:
                raise ParseError(f"expected slice end at {self.peek().pos}")
            self.i += used2
            return A.Slice(None, hi)
        return A.Index(self.expr())

    # --------------------------------------------------------- arguments

    def arg_list(self) -> list[A.Arg]:
        args: list[A.Arg] = []
        if self.at_punct(")"):
            return args
        while True:
            if self.at("ident") and self.at_punct(":", 1):
                name = self.next().value
                self.next()
                args.append(A.Arg(self.expr(), name))
            else:
                args.append(A.Arg(self.expr()))
            if not self.eat_punct(","):
                break
        return args

    # ----------------------------------------------------------- primary

    def primary(self) -> A.Node:
        t = self.peek()
        if t.kind == "kw":
            if t.value == "patch":
                return self.patch_block()
            if t.value == "let":
                return self.let_expr()
            if t.value == "lambda":
                self.next()
                params = [self.expect("ident").value]
                while self.eat_punct(","):
                    params.append(self.expect("ident").value)
                self.expect("punct", ":")
                return A.Lambda(params, self.expr())
            if t.value == "DELETE":
                self.next()
                return A.Delete()
            if t.value == "null":
                self.next()
                return A.Literal(None)
            if t.value == "true":
                self.next()
                return A.Literal(True)
            if t.value == "false":
                self.next()
                return A.Literal(False)
            raise ParseError(f"unexpected keyword {t.value!r} at {t.pos} in {self.src!r}")
        if t.kind == "punct":
            if t.value == "$":
                self.next()
                return A.Root()
            if t.value == "@":
                self.next()
                return A.Current()
            if t.value == "(":
                return self.paren_or_lambda_or_gen()
            if t.value == "[":
                return self.list_comp_or_array()
            if t.value == "{":
                return self.obj_or_comp()
        if t.kind == "int":
            self.next()
            return A.Literal(int(t.value))
        if t.kind == "float":
            self.next()
            return A.Literal(float(t.value))
        if t.kind == "str":
            self.next()
            return A.Literal(t.value)
        if t.kind == "fstr":
            self.next()
            return self.parse_fstring(t.value)
        if t.kind == "ident":
            # arrow lambda `x => e`
            if self.at_punct("=>", 1):
                name = self.next().value
                self.next()
                return A.Lambda([name], self.expr())
            # global call `name(args)`
            if self.at_punct("(", 1):
                name = self.next().value
                self.next()
                args = self.arg_list()
                self.expect("punct", ")")
                return A.GlobalCall(name, args)
            self.next()
            return A.Ident(t.value)
        raise ParseError(f"unexpected token {t.value!r} at {t.pos} in {self.src!r}")

    def let_expr(self) -> A.Node:
        self.expect("kw", "let")
        bindings: list[tuple[str, A.Node]] = []
        while True:
            name = self.expect("ident").value
            self.expect("punct", "=")
            bindings.append((name, self.expr()))
            if not self.eat_punct(","):
                break
        self.expect("kw", "in")
        body = self.expr()
        # multi-let desugars to nested Let (reference parser.rs)
        for name, value in reversed(bindings):
            body = A.Let(name, value, body)
        return body

    def paren_or_lambda_or_gen(self) -> A.Node:
        # `(a, b) => e` | `(e for x in s)` | `(e)`
        save = self.i
        self.next()  # (
        # try arrow params
        params: list[str] = []
        ok = True
        if self.at_punct(")"):
            pass
        else:
            while True:
                if self.at("ident"):
                    params.append(self.next().value)
                else:
                    ok = False
                    break
                if self.at_punct(","):
                    self.next()
                    continue
                break
        if ok and self.at_punct(")") and self.at_punct("=>", 1):
            self.next()
            self.next()
            return A.Lambda(params, self.expr())
        self.i = save
        self.next()  # (
        e = self.expr()
        if self.at_kw("for"):
            comp = self.comp_tail("gen", None, e)
            self.expect("punct", ")")
            return comp
        self.expect("punct", ")")
        return e

    def list_comp_or_array(self) -> A.Node:
        self.expect("punct", "[")
        if self.at_punct("]"):
            self.next()
            return A.ArrLit([])
        elems: list[A.ArrElem] = []
        if self.at_punct("..."):
            self.next()
            elems.append(A.ArrElem(self.expr(), spread=True))
        else:
            first = self.expr()
            if self.at_kw("for"):
                comp = self.comp_tail("list", None, first)
                self.expect("punct", "]")
                return comp
            elems.append(A.ArrElem(first))
        while self.eat_punct(","):
            if self.at_punct("]"):
                break
            if self.at_punct("..."):
                self.next()
                elems.append(A.ArrElem(self.expr(), spread=True))
            else:
                elems.append(A.ArrElem(self.expr()))
        self.expect("punct", "]")
        return A.ArrLit(elems)

    def obj_or_comp(self) -> A.Node:
        save = self.i
        try:
            return self.obj_construct()
        except ParseError:
            self.i = save
        # dict comp {k: v for ...} or set comp {e for ...}
        self.expect("punct", "{")
        first = self.expr()
        if self.at_punct(":"):
            self.next()
            value = self.expr()
            comp = self.comp_tail("dict", first, value)
        else:
            comp = self.comp_tail("set", None, first)
        self.expect("punct", "}")
        return comp

    def comp_tail(self, kind: str, key: A.Node | None, value: A.Node) -> A.Comp:
        gens: list[tuple[list[str], A.Node]] = []
        while True:
            self.expect("kw", "for")
            vars_ = [self.expect("ident").value]
            if self.eat_punct(","):
                vars_.append(self.expect("ident").value)
            self.expect("kw", "in")
            # pipe_expr, not expr: the comprehension's `if` guard must not
            # be swallowed as a ternary on the source (parenthesize for
            # ternaries)
            gens.append((vars_, self.pipe_expr()))
            if not self.at_kw("for"):
                break
        cond = None
        if self.eat_kw("if"):
            cond = self.expr()
        return A.Comp(kind, key, value, gens[0][0], gens[0][1], cond, gens)

    def obj_construct(self) -> A.ObjLit:
        self.expect("punct", "{")
        fields: list[A.ObjField] = []
        if self.eat_punct("}"):
            return A.ObjLit(fields)
        while True:
            fields.append(self.obj_field())
            if self.eat_punct(","):
                if self.at_punct("}"):
                    break
                continue
            break
        self.expect("punct", "}")
        return A.ObjLit(fields)

    def obj_field(self) -> A.ObjField:
        if self.at_punct("...**"):
            self.next()
            return A.ObjField("spread_deep", value=self.expr())
        if self.at_punct("..."):
            self.next()
            return A.ObjField("spread", value=self.expr())
        if self.at_punct("["):
            self.next()
            key = self.expr()
            self.expect("punct", "]")
            self.expect("punct", ":")
            return A.ObjField("dyn", key=key, value=self.expr())
        t = self.peek()
        if t.kind in ("ident", "str") or (t.kind == "kw" and self.at_punct(":", 1)):
            key = self.next().value
            if self.at_punct("?"):
                self.next()
                if self.at_punct(":"):
                    self.next()
                    return A.ObjField("opt_v", key=key, value=self.expr())
                return A.ObjField("opt", key=key)
            if self.at_punct(":"):
                self.next()
                value = self.expr()
                guard = None
                if self.eat_kw("when"):
                    guard = self.expr()
                return A.ObjField("kv", key=key, value=value, guard=guard)
            if t.kind == "ident":
                # shorthand — but only if followed by , or }
                if self.at_punct(",") or self.at_punct("}"):
                    return A.ObjField("short", key=key)
            raise ParseError(f"bad object field at {t.pos} in {self.src!r}")
        raise ParseError(f"bad object field at {t.pos} in {self.src!r}")

    # ------------------------------------------------------------ patch

    def patch_block(self) -> A.Patch:
        self.expect("kw", "patch")
        target = self.coalesce_expr()
        self.expect("punct", "{")
        clauses: list[A.PatchClause] = []
        while not self.at_punct("}"):
            root = self.expect("ident").value
            steps: list[A.PatchStep] = []
            while True:
                if self.at_punct("."):
                    self.next()
                    steps.append(A.PatchStep("field", name=self.expect("ident").value))
                elif self.at_punct(".."):
                    self.next()
                    steps.append(A.PatchStep("descendant", name=self.expect("ident").value))
                elif self.at_punct("["):
                    if self.at_punct("*", 1):
                        self.next()
                        self.next()
                        if self.eat_kw("if"):
                            pred = self.expr()
                            self.expect("punct", "]")
                            steps.append(A.PatchStep("wild_if", pred=pred))
                        else:
                            self.expect("punct", "]")
                            steps.append(A.PatchStep("wild"))
                    elif self.peek(1).kind == "int" and self.at_punct("]", 2):
                        self.next()
                        idx = int(self.expect("int").value)
                        self.expect("punct", "]")
                        steps.append(A.PatchStep("index", index=idx))
                    elif (self.at_punct("-", 1) and self.peek(2).kind == "int"
                          and self.at_punct("]", 3)):
                        self.next()
                        self.next()
                        idx = int(self.expect("int").value)
                        self.expect("punct", "]")
                        steps.append(A.PatchStep("index", index=-idx))
                    else:
                        # dynamic index expression (PathStep::DynIndex,
                        # parser.rs:531-535): `patch $ { xs[$.i]: v }`
                        self.next()
                        e = self.expr()
                        self.expect("punct", "]")
                        steps.append(A.PatchStep("index", dyn=e))
                else:
                    break
            self.expect("punct", ":")
            value = self.expr()
            guard = None
            if self.eat_kw("when"):
                guard = self.expr()
            clauses.append(A.PatchClause(root, steps, value, guard))
            if not self.eat_punct(","):
                break
        self.expect("punct", "}")
        return A.Patch(target, clauses)

    # ---------------------------------------------------------- f-string

    def parse_fstring(self, raw: str) -> A.FString:
        parts: list = []
        buf: list[str] = []
        i, n = 0, len(raw)
        while i < n:
            c = raw[i]
            if c == "{" and i + 1 < n and raw[i + 1] == "{":
                buf.append("{")
                i += 2
                continue
            if c == "}" and i + 1 < n and raw[i + 1] == "}":
                buf.append("}")
                i += 2
                continue
            if c == "{":
                depth, j = 1, i + 1
                while j < n and depth:
                    if raw[j] == "{":
                        depth += 1
                    elif raw[j] == "}":
                        depth -= 1
                    j += 1
                if depth:
                    raise ParseError(f"unbalanced brace in f-string {raw!r}")
                inner = raw[i + 1 : j - 1]
                if buf:
                    parts.append("".join(buf))
                    buf = []
                parts.append(self.parse_interp(inner))
                i = j
                continue
            buf.append(c)
            i += 1
        if buf:
            parts.append("".join(buf))
        return A.FString(parts)

    def parse_interp(self, inner: str) -> tuple:
        """`expr`, `expr:spec`, `expr | pipe` → (Node, spec|None)."""
        # try split at a top-level ':' (format spec); expr itself may
        # contain ':' only inside brackets/strings
        depth = 0
        in_str: str | None = None
        for k, ch in enumerate(inner):
            if in_str:
                if ch == in_str:
                    in_str = None
                continue
            if ch in "\"'":
                in_str = ch
            elif ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            elif ch == ":" and depth == 0:
                expr_src, spec = inner[:k], inner[k + 1 :]
                return (Parser(expr_src).parse(), spec)
        return (Parser(inner).parse(), None)


def parse(src: str) -> A.Node:
    return Parser(src).parse()
