"""JQL AST — mirrors the reference's Expr tree (jetro-core/src/parse/ast.rs)
shape-for-shape, so semantics documented against ast.rs line numbers carry
over directly. Pure dataclasses; no Spark imports."""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


# ---------------------------------------------------------------- primaries


@dataclass
class Literal(Node):  # ast.rs:259-275
    value: object  # None | bool | int | float | str


@dataclass
class FString(Node):  # parser.rs:839-885
    # parts: str (literal) | (expr, format_spec|None)
    parts: list


@dataclass
class Root(Node):  # `$`
    pass


@dataclass
class Current(Node):  # `@`
    pass


@dataclass
class Ident(Node):
    name: str


@dataclass
class Delete(Node):  # patch DELETE sentinel, ast.rs:176-178
    pass


# ------------------------------------------------------------------- unary


@dataclass
class Neg(Node):
    expr: Node


@dataclass
class Not(Node):
    expr: Node


# ------------------------------------------------------------------ binary


@dataclass
class Binary(Node):  # ast.rs:360-391; op in + - * / % == != < <= > >= ~= and or
    op: str
    left: Node
    right: Node


@dataclass
class Has(Node):  # `lhs has rhs` ⇔ lhs.includes(rhs), parser.rs:306-322
    left: Node
    right: Node


@dataclass
class Coalesce(Node):  # `a ?? b`, ast.rs:53-54
    left: Node
    right: Node


@dataclass
class KindCheck(Node):  # `x kind number`, `x is not null`, ast.rs:43-51
    expr: Node
    kind: str
    negated: bool


@dataclass
class Cast(Node):  # `x as int`, ast.rs:211-230
    expr: Node
    target: str


@dataclass
class Ternary(Node):  # `a if c else b`, right-assoc, ast.rs (INDEPTH.md:205)
    cond: Node
    then: Node
    other: Node


@dataclass
class Try(Node):  # `try BODY else DEFAULT`, ast.rs:143-150
    body: Node
    default: Node


# ------------------------------------------------------------------- paths


@dataclass
class Field(Node):  # `.name`
    name: str


@dataclass
class DynField(Node):  # `.{expr}`
    expr: Node


@dataclass
class Index(Node):  # `[n]` / `[expr]`
    expr: Node  # Literal(int) for static


@dataclass
class Slice(Node):  # `[a:b]`, half-open, open ends
    start: int | None
    stop: int | None


@dataclass
class InlineFilter(Node):  # `{pred}` postfix
    pred: Node


@dataclass
class Descendant(Node):  # `..name` / bare `..`
    name: str | None


@dataclass
class Method(Node):  # `.name(args)`
    name: str
    args: list["Arg"]


@dataclass
class DeepMethod(Node):  # `..name(args)` — deep_find/deep_shape/...
    name: str
    args: list["Arg"]


@dataclass
class MapShape(Node):  # `[* if p] => shape` ≡ filter+map, grammar.pest:86
    pred: Node | None
    shape: Node


@dataclass
class Quantifier(Node):  # `?` null-safe/first-of-array, `!` exactly-one
    mark: str


@dataclass
class Path(Node):  # primary + postfix steps
    base: Node
    steps: list[Node]


@dataclass
class Arg(Node):
    value: Node
    name: str | None = None


# ------------------------------------------------------------ constructors


@dataclass
class ObjField(Node):
    # kinds: kv, short, opt (k?), opt_v (k?: v), dyn ([e]: v), spread, spread_deep
    kind: str
    key: object = None  # str or Node for dyn
    value: Node | None = None
    guard: Node | None = None  # `when` guard


@dataclass
class ObjLit(Node):  # ast.rs:336-357
    fields: list[ObjField]


@dataclass
class ArrElem(Node):
    expr: Node
    spread: bool = False


@dataclass
class ArrLit(Node):  # ast.rs:279-285
    elems: list[ArrElem]


# ------------------------------------------------------- binding constructs


@dataclass
class Let(Node):  # ast.rs:124-132 (multi desugars to nested)
    name: str
    value: Node
    body: Node


@dataclass
class Lambda(Node):  # lambda x: e / x => e / (a,b) => e
    params: list[str]
    body: Node


@dataclass
class Comp(Node):  # list/dict/set/gen comprehensions, ast.rs:69-114
    kind: str  # list | dict | set | gen
    key: Node | None  # dict only
    value: Node
    vars: list[str]  # first generator's vars (compat accessor)
    source: Node  # first generator's source (compat accessor)
    cond: Node | None  # trailing `if`, evaluated with ALL vars bound
    # every generator, in order: [(vars, source), ...]. Multiple entries =
    # cartesian product (cross-join via nested comprehensions,
    # reference INDEPTH.md:260-279). None ⇒ single generator (legacy).
    gens: list[tuple[list[str], Node]] | None = None


@dataclass
class GlobalCall(Node):  # free-function form of any builtin, SYNTAX.md:503-521
    name: str
    args: list[Arg]


# ---------------------------------------------------------------- pipeline


@dataclass
class PipeForward(Node):  # `| expr` / `|> expr` / `| method(args)`
    expr: Node


@dataclass
class PipeBind(Node):  # `-> name`, `-> {a, b, ...rest}`, `-> [a, b]`
    kind: str  # ident | obj | arr
    names: list[str]
    rest: str | None = None


@dataclass
class Pipe(Node):  # ast.rs:61-67
    base: Node
    steps: list[Node]


# ------------------------------------------------------------------- patch


@dataclass
class PatchStep(Node):
    # kinds: field, index, wild, wild_if, descendant
    kind: str
    name: str | None = None
    index: int | None = None
    pred: Node | None = None
    dyn: Node | None = None  # dynamic index expression (PathStep::DynIndex)


@dataclass
class PatchClause(Node):
    root: str  # leading ident of patch_key
    steps: list[PatchStep]
    value: Node  # Delete() for DELETE
    guard: Node | None = None


@dataclass
class Patch(Node):  # SYNTAX.md:406-499
    target: Node
    clauses: list[PatchClause] = field(default_factory=list)
