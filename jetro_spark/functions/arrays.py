"""Array-pipeline builtins as higher-order-function Column builders
(document mode — SURVEY.md §2.3-2.7).

These operate on ``array<T>`` columns via Spark HOFs (filter/transform/
aggregate/exists/forall/zip_with), matching the reference's per-element
algorithms (jetro-core/src/builtins/ops/array.rs, ops/collection.rs) while
staying JVM-side. Relational-mode equivalents (whole-DataFrame) live in
``jetro_spark.operators``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from jetro_spark.functions.core import elem_at, let_  # noqa: F401 (let_
# re-exported: most callers import it from here; it lives in core so the
# index/slice shims can use it without a cycle)

Lambda = Callable[[Column], Column]


def _seq1(n: Column) -> Column:
    """1..n ascending, ``[]`` when n <= 0.

    ``F.sequence(1, n)`` DESCENDS when n < 1 (sequence(1,0) = [1,0]), which
    would emit phantom indices for empty/short arrays; the reference returns
    empty results there (ops/collection.rs:124-249)."""
    return F.filter(F.sequence(F.lit(1), F.greatest(n, F.lit(1))), lambda i: i <= n)


def _seq0(n: Column) -> Column:
    """0..n-1 ascending, ``[]`` when n <= 0 (see :func:`_seq1`)."""
    return F.filter(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))), lambda i: i < n)


# ------------------------------------------------------- filter/map streams


def filter_(arr: Column, pred: Lambda) -> Column:
    """Keep elements whose predicate is truthy; null pred → drop.
    Reference: ops/array.rs:10-62 (aliases find/find_all)."""
    return F.filter(arr, lambda x: F.coalesce(pred(x), F.lit(False)))


def map_(arr: Column, fn: Lambda) -> Column:
    """Reference: ops/array.rs:64-111."""
    return F.transform(arr, fn)


def flat_map(arr: Column, fn: Lambda) -> Column:
    """map + flatten one level. Reference: ops/array.rs:113-143."""
    return F.flatten(F.transform(arr, fn))


def take(arr: Column, n: int) -> Column:
    """Reference: mod.rs:127."""
    return F.slice(arr, 1, n)


def skip(arr: Column, n: int) -> Column:
    """Reference: mod.rs:129. Input let_-bound (slice + size)."""
    return let_(arr, lambda a: F.slice(
        a, n + 1, F.greatest(F.size(a) - n, F.lit(0))))


def take_while(arr: Column, pred: Lambda) -> Column:
    """Longest truthy prefix. Reference: ops/array.rs:865-926.

    No direct HOF: compute the first failing index via aggregate over
    (element, still-true) state, then slice. Input let_-bound: it is
    referenced by both the aggregate and the slice, and in a chained
    pipeline each bare reference re-evaluates the whole upstream
    expression (HOFs have no CSE)."""

    def _body(a: Column) -> Column:
        idx = F.aggregate(
            a,
            F.struct(F.lit(0).alias("n"), F.lit(True).alias("go")),
            lambda acc, x: F.struct(
                F.when(acc["go"] & F.coalesce(pred(x), F.lit(False)),
                       acc["n"] + 1)
                .otherwise(acc["n"])
                .alias("n"),
                (acc["go"] & F.coalesce(pred(x), F.lit(False))).alias("go"),
            ),
            lambda acc: acc["n"],
        )
        return F.slice(a, 1, idx)

    return let_(arr, _body)


def drop_while(arr: Column, pred: Lambda) -> Column:
    """Drop the longest truthy prefix. Reference: ops/array.rs:865-926.
    Input let_-bound (see take_while)."""

    def _body(a: Column) -> Column:
        idx = F.aggregate(
            a,
            F.struct(F.lit(0).alias("n"), F.lit(True).alias("go")),
            lambda acc, x: F.struct(
                F.when(acc["go"] & F.coalesce(pred(x), F.lit(False)),
                       acc["n"] + 1)
                .otherwise(acc["n"])
                .alias("n"),
                (acc["go"] & F.coalesce(pred(x), F.lit(False))).alias("go"),
            ),
            lambda acc: acc["n"],
        )
        return F.slice(a, idx + 1, F.greatest(F.size(a) - idx, F.lit(0)))

    return let_(arr, _body)


def find_first(arr: Column, pred: Lambda) -> Column:
    """First match else null. Reference: mod.rs:154 (lowering filter→First,
    registry.rs:488-492)."""
    return elem_at(filter_(arr, pred), 1)


def find_index(arr: Column, pred: Lambda) -> Column:
    """0-based index of first match, -1 if none. Reference: ops/array.rs:293.
    Input let_-bound (referenced by zip_with AND its size)."""
    hit = elem_at(
        F.filter(
            let_(arr, lambda a: F.zip_with(
                a,
                _seq0(F.size(a)),
                lambda x, i: F.struct(i.alias("i"), F.coalesce(pred(x), F.lit(False)).alias("m")),
            )),
            lambda s: s["m"],
        ),
        F.lit(1),
    )
    return F.coalesce(hit["i"].cast("long"), F.lit(-1).cast("long"))


def indices_where(arr: Column, pred: Lambda) -> Column:
    """All 0-based match indices. Reference: ops/array.rs:293-340.
    Input let_-bound (see find_index)."""
    return F.transform(
        F.filter(
            let_(arr, lambda a: F.zip_with(
                a,
                _seq0(F.size(a)),
                lambda x, i: F.struct(i.alias("i"), F.coalesce(pred(x), F.lit(False)).alias("m")),
            )),
            lambda s: s["m"],
        ),
        lambda s: s["i"].cast("long"),
    )


# ------------------------------------------------------------ order/dedupe


def sort(arr: Column, key: Lambda | None = None, desc: bool = False) -> Column:
    """Natural or keyed sort; stable for equal keys (array_sort is stable).
    Reference: ops/array.rs:144-229.

    Bare ascending sort takes ``sort_array`` (r12 advice): null ELEMENTS
    go FIRST — the engine-wide null-first convention the keyed/desc
    comparator below and the relational (isNull, desc) order entries
    already follow. ``array_sort`` (the old fast path) pins nulls LAST
    and diverged from doc mode on nullable elements; ``sort_array`` is
    the native codegen'd builtin with the right placement, so the fix
    costs nothing."""
    if key is None and not desc:
        return F.sort_array(arr)
    k = key or (lambda x: x)

    def cmp(a: Column, b: Column) -> Column:
        ka, kb = k(a), k(b)
        lt, gt = (1, -1) if desc else (-1, 1)
        return (
            F.when(ka.isNull() & kb.isNull(), 0)
            .when(ka.isNull(), -1)
            .when(kb.isNull(), 1)
            .when(ka < kb, lt)
            .when(ka > kb, gt)
            .otherwise(0)
        )

    return F.array_sort(arr, cmp)


def reverse(arr: Column) -> Column:  # ops/collection.rs:45
    return F.reverse(arr)


def unique(arr: Column) -> Column:
    """Dedup keeping first occurrence (array_distinct preserves first).
    Reference: ops/collection.rs:77 (alias distinct)."""
    return F.array_distinct(arr)


def unique_by(arr: Column, key: Lambda) -> Column:
    """Keep first element per key. Reference: ops/array.rs:273-292.

    The indexed array is let_-bound: it is referenced INSIDE the
    per-element keep lambda, which without binding re-evaluates the
    whole upstream pipeline once per element (O(n) re-evals on top of
    the O(n²) earlier-duplicate scan)."""

    def _keep(with_idx: Column) -> Column:
        return F.transform(
            F.filter(
                with_idx,
                lambda s: F.size(
                    F.filter(with_idx,
                             lambda t: (t["i"] < s["i"])
                             & key(t["v"]).eqNullSafe(key(s["v"])))
                ) == 0,
            ),
            lambda s: s["v"])

    return let_(
        let_(arr, lambda a: F.zip_with(
            a, _seq0(F.size(a)),
            lambda x, i: F.struct(x.alias("v"), i.alias("i")))),
        _keep)


def compact(arr: Column) -> Column:  # ops/collection.rs:23
    return F.array_compact(arr)


def flatten(arr: Column) -> Column:  # ops/collection.rs:35
    return F.flatten(arr)


# --------------------------------------------------------------- positional


def first(arr: Column, n: int | None = None) -> Column:
    """first() → element; first(n) → prefix array. Negative n from end.
    Reference: ops/collection.rs:344-377."""
    if n is None:
        return elem_at(arr, 1)
    if n >= 0:
        return F.slice(arr, 1, n)
    return let_(arr, lambda a: F.slice(
        a, 1, F.greatest(F.size(a) + n, F.lit(0))))


def last(arr: Column, n: int | None = None) -> Column:
    """Reference: ops/collection.rs:344-377."""
    if n is None:
        return elem_at(arr, -1)
    if n >= 0:
        return let_(arr, lambda a: F.slice(
            a, F.greatest(F.size(a) - n + 1, F.lit(1)), n))
    return let_(arr, lambda a: F.slice(
        a, F.lit(1 - n), F.greatest(F.size(a) + n, F.lit(0))))


def nth(arr: Column, i: int) -> Column:
    """0-based, negative ok, OOB → null. Reference: ops/collection.rs:344."""
    from jetro_spark.functions.core import jt_element_at

    return jt_element_at(arr, i)


# ----------------------------------------------------------- element edits


def append(arr: Column, v: Column) -> Column:  # ops/collection.rs:379
    return F.array_append(arr, v)


def prepend(arr: Column, v: Column) -> Column:  # ops/collection.rs:390
    return F.array_prepend(arr, v)


def remove(arr: Column, pred: Lambda) -> Column:
    """Remove elements matching predicate. Reference: ops/array.rs:230-248."""
    return F.filter(arr, lambda x: ~F.coalesce(pred(x), F.lit(False)))


# ------------------------------------------------------- windows over arrays


def enumerate_(arr: Column) -> Column:
    """→ [{index, value}]. Reference: ops/collection.rs:409.
    Input let_-bound (zip_with input + size)."""
    return let_(arr, lambda a: F.zip_with(
        _seq0(F.size(a)),
        a,
        lambda i, x: F.struct(i.cast("long").alias("index"), x.alias("value")),
    ))


def pairwise(arr: Column) -> Column:
    """Overlapping pairs. Reference: ops/collection.rs:556.
    Input let_-bound (two slices + two sizes)."""
    return let_(arr, lambda a: F.zip_with(
        F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0))),
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
        lambda x, y: F.array(x, y),
    ))


def window(arr: Column, n: int) -> Column:
    """Sliding windows of size n. Reference: ops/collection.rs:556-595.
    Input let_-bound: the per-position slice lambda would otherwise
    re-evaluate the whole upstream pipeline once per WINDOW."""
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a) - n + 1), lambda i: F.slice(a, i, n)))


def chunk(arr: Column, n: int) -> Column:
    """Fixed chunks (last may be short; alias batch). Reference:
    ops/string.rs:85. Input let_-bound (see window)."""
    return let_(arr, lambda a: F.transform(
        _seq0(F.ceil(F.size(a) / F.lit(n)).cast("int")),
        lambda i: F.slice(a, i * n + 1, n)))


def accumulate(arr: Column, fn: Callable[[Column, Column], Column], init: Column | None = None) -> Column:
    """Running fold producing intermediate array. Reference: mod.rs:160-161.

    Implemented as prefix-slices folded with aggregate (O(n²) on tiny
    in-document arrays; relational mode uses a running window instead).
    Input let_-bound: the per-prefix slice would otherwise re-evaluate
    the upstream pipeline once per PREFIX on top of the O(n²) fold."""
    seed = init
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)),
        lambda i: F.aggregate(
            F.slice(a, 1, i),
            seed if seed is not None else F.lit(0).cast("double"),
            fn,
        ),
    ))


def partition(arr: Column, pred: Lambda) -> Column:
    """→ {pass, fail}. Reference: ops/array.rs:928-946.
    Input let_-bound (two independent filters)."""
    return let_(arr, lambda a: F.struct(
        filter_(a, pred).alias("pass"),
        F.filter(a, lambda x: ~F.coalesce(pred(x), F.lit(False))).alias("fail"),
    ))


def zip_(a: Column, b: Column) -> Column:
    """Pairwise zip, truncating to shorter. Reference: ops/array.rs:388-433.
    Both inputs let_-bound (each referenced by a slice and two sizes)."""
    return let_(a, lambda aa: let_(b, lambda bb: F.zip_with(
        F.slice(aa, 1, F.least(F.size(aa), F.size(bb))),
        F.slice(bb, 1, F.least(F.size(aa), F.size(bb))),
        lambda x, y: F.array(x, y))))


def zip_longest(a: Column, b: Column) -> Column:
    """Zip padding shorter side with null. Reference: util.rs:399-420."""
    return F.zip_with(a, b, lambda x, y: F.array(x, y))


def fanout(recv: Column, *exprs: Column) -> Column:
    """Apply N expressions to one receiver → array. Reference: ops/array.rs:807."""
    return F.array(*exprs)


def collect(v: Column, is_array: bool) -> Column:
    """scalar→[scalar], array→id, null→[]. Reference: ops/array.rs:376-387."""
    if is_array:
        return F.coalesce(v, F.array())
    return F.when(v.isNull(), F.array()).otherwise(F.array(v))


# ------------------------------------------------------------------ set ops


def diff(a: Column, b: Column) -> Column:
    """Elements of ``a`` whose value is NOT in ``b`` — keeping ``a``'s
    DUPLICATES and order (diff_apply, ops/collection.rs:629-646, filters
    by key membership without deduplicating the receiver; array_except
    would collapse a's duplicates — r7 fix)."""
    return let_(b, lambda bb: F.filter(
        a, lambda x: ~F.coalesce(F.exists(bb, lambda o: o.eqNullSafe(x)),
                                 F.lit(False))))


def intersect(a: Column, b: Column) -> Column:
    """Elements of ``a`` whose value IS in ``b`` — duplicates and order
    of ``a`` preserved (intersect_apply, ops/collection.rs:594-609)."""
    return let_(b, lambda bb: F.filter(
        a, lambda x: F.coalesce(F.exists(bb, lambda o: o.eqNullSafe(x)),
                                F.lit(False))))


def union(a: Column, b: Column) -> Column:
    """All of ``a`` (duplicates intact) plus the elements of ``b`` whose
    value is not in ``a`` — b-internal duplicates of a NEW value are all
    appended, exactly like union_apply (ops/collection.rs:611-627, the
    membership probe checks the RECEIVER's key set only)."""
    return let_(a, lambda aa: F.concat(aa, F.filter(
        b, lambda o: ~F.coalesce(F.exists(aa, lambda x: x.eqNullSafe(o)),
                                 F.lit(False)))))


def includes(arr: Column, v: Column) -> Column:
    """Membership (`has` / `in` desugar here). Reference: ops/misc.rs:129."""
    return F.array_contains(arr, v)


def index(arr: Column, v: Column) -> Column:
    """0-based first index of value, -1 when absent (array_position is
    1-based, 0 when absent). Reference: ops/collection.rs:471-496."""
    return (F.array_position(arr, v) - 1).cast("long")


def indices_of(arr: Column, v: Column) -> Column:
    """ALL 0-based indices where the value appears.
    Reference: ops/collection.rs:481-492 indices_of_apply.
    Input let_-bound (per-index F.get would re-evaluate upstream)."""
    return let_(arr, lambda a: F.filter(
        _seq0(F.size(a)),
        lambda i: F.get(a, i).eqNullSafe(v)).cast("array<long>"))


# -------------------------------------------------------------- aggregates


def sum_(arr: Column, fn: Lambda | None = None) -> Column:
    """sum([]) = 0 (jetro), unlike SQL sum → null.
    Reference: pipeline.rs:320-329."""
    vals = F.transform(arr, fn) if fn else arr
    return F.aggregate(
        F.array_compact(vals), F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")
    )


def avg(arr: Column, fn: Lambda | None = None) -> Column:
    """avg([]) = null. Reference: pipeline.rs:320-329.
    Compacted values let_-bound (referenced by sum and twice by size)."""
    return let_(
        F.array_compact(F.transform(arr, fn) if fn else arr),
        lambda vals: F.when(F.size(vals) > 0,
                            sum_(vals) / F.size(vals)).otherwise(F.lit(None)))


def min_(arr: Column, fn: Lambda | None = None) -> Column:
    vals = F.transform(arr, fn) if fn else arr
    return F.array_min(vals)


def max_(arr: Column, fn: Lambda | None = None) -> Column:
    vals = F.transform(arr, fn) if fn else arr
    return F.array_max(vals)


def count(arr: Column, pred: Lambda | None = None) -> Column:
    """Length or predicate-count. Reference: mod.rs:20-21."""
    if pred is None:
        return F.size(arr).cast("long")
    return F.size(filter_(arr, pred)).cast("long")


def any_(arr: Column, pred: Lambda) -> Column:
    """∃ (alias exists). Reference: ops/array.rs:874-891."""
    return F.exists(arr, lambda x: F.coalesce(pred(x), F.lit(False)))


def all_(arr: Column, pred: Lambda) -> Column:
    """∀. Reference: ops/array.rs:874-891."""
    return F.forall(arr, lambda x: F.coalesce(pred(x), F.lit(False)))


def _extreme_by(arr: Column, key: Lambda, better) -> Column:
    """extreme_by_apply's strict-improvement FOLD (array.rs:341-375):
    best starts at element 0; a candidate replaces it only when its key
    is STRICTLY better, and a comparison against a null key on either
    side is never an improvement (cmp_vals yields Equal for Null,
    util.rs:133) — so null-keyed elements never win unless the FIRST
    element's key is null, in which case nothing can beat it. The old
    sort-based implementation put null keys at an END of the sort and
    crowned them (r11 probe catch). The (seen, best) accumulator keeps
    a null FIRST ELEMENT as best (a bare null-best sentinel could not
    tell "unseeded" from "best is a null element")."""
    def step(acc: Column, x: Column) -> Column:
        take = F.struct(F.lit(True).alias("s"), x.alias("b"))
        return (F.when(~acc["s"], take)
                .when(F.coalesce(better(key(x), key(acc["b"])),
                                 F.lit(False)), take)
                .otherwise(acc))

    return let_(arr, lambda a: F.aggregate(
        a,
        F.struct(F.lit(False).alias("s"),
                 elem_at(F.filter(a, lambda _x: F.lit(False)), 1)
                 .alias("b")),
        step)["b"])


def min_by(arr: Column, key: Lambda) -> Column:
    """Element with minimal key. Reference: ops/array.rs:341-375."""
    return _extreme_by(arr, key, lambda kx, ka: kx < ka)


def max_by(arr: Column, key: Lambda) -> Column:
    """Reference: ops/array.rs:341-375."""
    return _extreme_by(arr, key, lambda kx, ka: kx > ka)


def group_by(arr: Column, key: Lambda) -> Column:
    """{key_str: [items]} as insertion-ordered array<struct<key,value>>
    keyed by STRINGIFIED key, first-seen order.
    Reference: ops/array.rs:947-965, util.rs:216-226.
    Input let_-bound: it is referenced inside the per-KEY lambda (the
    member filter), which would otherwise re-evaluate the upstream
    pipeline once per distinct key."""
    return let_(arr, lambda a: F.transform(
        unique(F.transform(a, lambda x: key(x).cast("string"))),
        lambda k: F.struct(
            k.alias("key"),
            F.filter(a, lambda x: key(x).cast("string").eqNullSafe(k)).alias("value"),
        ),
    ))


def count_by(arr: Column, key: Lambda) -> Column:
    """{key_str: n}. Reference: ops/array.rs:966-987.
    Input let_-bound (see group_by)."""
    return let_(arr, lambda a: F.transform(
        unique(F.transform(a, lambda x: key(x).cast("string"))),
        lambda k: F.struct(
            k.alias("key"),
            F.size(F.filter(a, lambda x: key(x).cast("string").eqNullSafe(k)))
            .cast("long")
            .alias("value"),
        ),
    ))


def index_by(arr: Column, key: Lambda) -> Column:
    """{key_str: item} last-wins. Reference: ops/array.rs:988-1004.
    Input let_-bound (see group_by)."""
    return let_(arr, lambda a: F.transform(
        unique(F.transform(a, lambda x: key(x).cast("string"))),
        lambda k: F.struct(
            k.alias("key"),
            F.element_at(
                F.filter(a, lambda x: key(x).cast("string").eqNullSafe(k)), -1
            ).alias("value"),
        ),
    ))


# --------------------------------------------------- positional analytics
# (document-mode forms of SURVEY §2.6; relational forms in operators/)


def lag(arr: Column, n: int = 1) -> Column:
    """Shift right with null fill. Reference: ops/collection.rs:227-249.
    Input let_-bound (per-index element_at would re-evaluate upstream)."""
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)),
        lambda i: F.when(i > n, F.element_at(a, i - n)).otherwise(F.lit(None)),
    ))


def lead(arr: Column, n: int = 1) -> Column:
    """Shift left with null fill. Reference: ops/collection.rs:227-249.
    Input let_-bound (see lag)."""
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)),
        lambda i: F.when(i + n <= F.size(a), F.element_at(a, i + n)).otherwise(F.lit(None)),
    ))


def rolling(arr: Column, n: int, agg: str) -> Column:
    """rolling_{sum,avg,min,max}(n): first n-1 outputs null; null elements
    are SKIPPED (avg divides by the non-null count; all-null window → null).
    Reference: ops/collection.rs:124-226.
    Input let_-bound (per-position slice would re-evaluate upstream)."""
    def reduce(w: Column) -> Column:
        cw = F.array_compact(w)
        k = F.size(cw)
        if agg == "sum":
            # full window always emits a sum; an all-null window sums the
            # empty set to 0.0 (rolling_sum_apply never gates on count —
            # ops/collection.rs:124-147)
            return F.aggregate(cw, F.lit(0.0), lambda a, x: a + x.cast("double"))
        if agg == "avg":
            return F.when(
                k > 0,
                F.aggregate(cw, F.lit(0.0), lambda a, x: a + x.cast("double")) / k,
            ).otherwise(F.lit(None))
        if agg == "min":
            return F.array_min(w)  # array_min skips nulls natively
        if agg == "max":
            return F.array_max(w)
        raise ValueError(agg)

    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)),
        lambda i: F.when(i >= n,
                         reduce(F.slice(a, i - n + 1, n))).otherwise(F.lit(None)),
    ))


def cum_max(arr: Column) -> Column:
    """Reference: ops/collection.rs:278-321. Input let_-bound (see rolling)."""
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)), lambda i: F.array_max(F.slice(a, 1, i))))


def cum_min(arr: Column) -> Column:
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)), lambda i: F.array_min(F.slice(a, 1, i))))


def diff_window(arr: Column) -> Column:
    """First differences; first output null. Reference: ops/collection.rs:250.
    Input let_-bound (see lag)."""
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)),
        lambda i: F.when(i > 1, F.element_at(a, i) - F.element_at(a, i - 1)).otherwise(
            F.lit(None)
        ),
    ))


def pct_change(arr: Column) -> Column:
    """Reference: ops/collection.rs:264-277. Unlike the `/` operator
    (which errors on zero, vm/exec.rs:866-873), pct_change guards
    `p != 0.0` → null — hence try_divide, not bare ANSI division.
    Input let_-bound (see lag)."""
    return let_(arr, lambda a: F.transform(
        _seq1(F.size(a)),
        lambda i: F.when(
            i > 1,
            F.try_divide(
                (F.element_at(a, i) - F.element_at(a, i - 1)).cast("double"),
                F.element_at(a, i - 1).cast("double"),
            ),
        ).otherwise(F.lit(None)),
    ))


def zscore(arr: Column) -> Column:
    """(x - mean) / population-stddev over the non-null elements; sd == 0
    gives 0.0 for numeric positions; null elements stay null; an array
    with no numerics is all null. Reference: ops/collection.rs:321-343
    (zscore_apply: var divides by n, not n-1).

    Everything is let_-bound: without binding, ``mean`` (itself an O(n)
    aggregate) sat inside the variance fold's per-element lambda and
    ``sd`` (O(n²) then) inside the final per-element transform — O(n³)
    evaluation of what is mathematically one pass."""
    def _z(a: Column) -> Column:
        def with_nums(nums: Column) -> Column:
            n = F.size(nums)  # n == 0 (no numerics) must not ANSI-throw
            mean_e = F.try_divide(
                F.aggregate(nums, F.lit(0.0),
                            lambda acc, x: acc + x.cast("double")), n)

            def with_mean(mean: Column) -> Column:
                sd_e = F.sqrt(F.try_divide(
                    F.aggregate(
                        nums, F.lit(0.0),
                        lambda acc, x: acc + (x.cast("double") - mean)
                        * (x.cast("double") - mean),
                    ), n))
                return let_(sd_e, lambda sd: F.transform(
                    a,
                    lambda x: F.when(x.isNull() | (n == 0),
                                     F.lit(None).cast("double"))
                    .when(sd > 0, (x.cast("double") - mean) / sd)
                    .otherwise(F.lit(0.0)),
                ))

            return let_(mean_e, with_mean)

        return let_(F.array_compact(a), with_nums)

    return let_(arr, _z)
