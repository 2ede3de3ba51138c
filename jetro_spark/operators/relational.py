"""Relational forms of jetro's keyed/merging operators (SURVEY.md §2.4-2.5).

Scale notes (100 TB design intent):
- ``equi_join`` leaves strategy choice to Catalyst/AQE (broadcast for small
  sides, sort-merge otherwise, skew-join splitting under AQE). Callers can
  pass ``broadcast_right=True`` when the right side is a dimension table.
- ``group_collect``/``count_by``/``index_by`` are single-shuffle groupBys
  with map-side partial aggregation (Spark does this automatically for
  count/min/max/first-last style aggregates).
- ``unique_by`` uses a groupBy+min_by rather than a window over the whole
  key partition, avoiding a full sort per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def orderable(dt) -> bool:
    """Does Spark's lexicographic ordering accept this type? VARIANT
    and MAP (at any nesting depth) are rejected
    (DATATYPE_MISMATCH.INVALID_ORDERING_TYPE)."""
    if isinstance(dt, T.MapType):
        return False
    if hasattr(T, "VariantType") and isinstance(dt, T.VariantType):
        return False
    if isinstance(dt, T.StructType):
        return all(orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return orderable(dt.elementType)
    return True


def sort_by_field(coll: Column, field: str = "__o",
                  payload_dt: T.DataType | None = None) -> Column:
    """``array_sort`` of collected (order, payload) structs, comparing
    ONLY the order field.

    The default lexicographic struct ordering rejects VARIANT / MAP
    payload fields (DATATYPE_MISMATCH.INVALID_ORDERING_TYPE), which
    turned group_by/implode/pivot/group_shape over heterogeneous-doc
    tables (infer_schema unifies conflicting leaves to variant) into a
    one-sided analysis error doc mode doesn't have (r10 advice). The
    order field is always a non-null DISTINCT numeric surrogate
    (monotonic id / row_number), so ties never reach the payload —
    callers that know the payload dtype pass it, and ORDERABLE payloads
    keep Spark's native codegen'd sort (the comparator lambda is an
    interpreted CodegenFallback — the 100 TB hot-group path should not
    pay it when the plain sort type-checks)."""
    if payload_dt is not None and orderable(payload_dt):
        return F.array_sort(coll)
    return F.array_sort(
        coll,
        lambda l, r: F.when(l[field] < r[field], F.lit(-1))
                      .when(l[field] > r[field], F.lit(1))
                      .otherwise(F.lit(0)))


def equi_join(
    left: DataFrame,
    right: DataFrame,
    lkey: str,
    rkey: str,
    broadcast_right: bool = False,
    null_safe: bool = False,
    lkey_col: Column | None = None,
    rkey_col: Column | None = None,
) -> DataFrame:
    """Jetro ``equi_join``: INNER hash equi-join of two arrays of objects;
    merged output object = left fields then right fields, with the RIGHT
    side winning on column-name collision.

    Key matching follows the reference's val_to_key convention
    (util.rs:216-226): a PRESENT-but-null key renders as the string
    "null" and IS indexed/matched (array.rs:505-531) — only a key field
    MISSING from the object drops the row. Callers pick the cheapest
    faithful condition:

    - default (``==``): nulls drop — for keys the caller knows are
      never null, or synthesized missing-field keys (where the faithful
      result is the empty join);
    - ``null_safe``: ``eqNullSafe`` — null keys match each other,
      exactly val_to_key's "null" bucket for SAME-family atomic keys
      (Spark extracts EqualNullSafe as an equi-join key, so this stays
      a hash/broadcast join, never a BNLJ);
    - ``lkey_col``/``rkey_col``: prepared join-key EXPRESSIONS (the
      engine passes val_to_key canonical strings) matched with
      ``eqNullSafe`` for cross-family / variant / complex keys; output
      columns are unchanged.

    Reference: jetro-core/src/builtins/ops/array.rs:489-548,
    jetro-core/src/builtins/mod.rs:395-397.
    """
    if lkey_col is not None:
        left = left.withColumn("__jk_eq", lkey_col)
        right = right.withColumn("__jk_eq", rkey_col)
    r = F.broadcast(right) if broadcast_right else right
    l_aliased = left.alias("__l")
    r_aliased = r.alias("__r")
    if lkey_col is not None:
        cond = F.col("__l.__jk_eq").eqNullSafe(F.col("__r.__jk_eq"))
    elif null_safe:
        cond = F.col(f"__l.{lkey}").eqNullSafe(F.col(f"__r.{rkey}"))
    else:
        cond = F.col(f"__l.{lkey}") == F.col(f"__r.{rkey}")
    joined = l_aliased.join(r_aliased, cond, "inner")
    right_cols = set(right.columns)
    out: list[Column] = []
    for c in left.columns:
        if c not in right_cols and c != "__jk_eq":  # right wins on collision
            out.append(F.col(f"__l.{c}").alias(c))
    for c in right.columns:
        if c != "__jk_eq":
            out.append(F.col(f"__r.{c}").alias(c))
    return joined.select(*out)


def group_collect(df: DataFrame, key: str | Column, key_alias: str = "key",
                  order: str | Column | None = None,
                  payload_cols: list[str] | None = None,
                  emit_order: str | None = None) -> DataFrame:
    """Relational ``group_by``: one row per key with the collected group.
    Key is STRINGIFIED to match jetro's object-key semantics
    (reference: jc/util.rs:216-226, ops/array.rs:947-965).

    ``order`` (r9): collect_list's element order is shuffle-ARRIVAL
    order — deterministic-looking on one mapper, arbitrary under real
    multi-mapper exchanges — while doc mode keeps groups in pipeline
    order. Pass an order column (the engine passes a scan-order
    surrogate) to sort each collected group exactly; ``payload_cols``
    restricts the collected struct (the engine passes the visible
    columns so hidden ``__ord`` carries never leak into group values).

    SCALE NOTE: collect_list materializes every row-struct of a group on
    ONE executor — jetro-faithful, but a hot key at 100 TB OOMs that
    task. When the downstream only aggregates, push the aggregate into
    the groupBy instead (see gate's q_group_collect projection); keep
    full-group collection for genuinely small groups."""
    k = F.col(key) if isinstance(key, str) else key
    cols = payload_cols if payload_cols is not None else list(df.columns)
    payload = F.struct(*[F.col(c) for c in cols])
    if order is None:
        return (
            df.groupBy(k.cast("string").alias(key_alias))
            .agg(F.collect_list(payload).alias("value"))
        )
    o = F.col(order) if isinstance(order, str) else order
    pdt = T.StructType([df.schema[c2] for c2 in cols])
    arr = F.transform(
        sort_by_field(F.collect_list(F.struct(o.alias("__o"),
                                              payload.alias("__p"))),
                      payload_dt=pdt),
        lambda s: s["__p"])
    aggs = [arr.alias("value")]
    if emit_order is not None:
        # doc group_by keys an IndexMap: group ROW order is first-seen
        # key order, doc-observable by downstream navigation (r10) —
        # emit min(order) per key so the caller can restore it
        aggs.append(F.min(o).alias(emit_order))
    return (df.groupBy(k.cast("string").alias(key_alias))
            .agg(*aggs))


def count_by(df: DataFrame, key: str | Column, key_alias: str = "key",
             order: str | Column | None = None,
             emit_order: str | None = None) -> DataFrame:
    """Relational ``count_by`` → (key_str, n). ``order``/``emit_order``
    (r10): emit min(order) per key so the caller can restore the doc
    IndexMap's first-seen key order when navigation follows.
    Reference: ops/array.rs:966-987."""
    k = F.col(key) if isinstance(key, str) else key
    aggs = [F.count(F.lit(1)).alias("value")]
    if emit_order is not None and order is not None:
        o = F.col(order) if isinstance(order, str) else order
        aggs.append(F.min(o).alias(emit_order))
    return df.groupBy(k.cast("string").alias(key_alias)).agg(*aggs)


def index_by(df: DataFrame, key: str | Column, order: str | Column | None = None,
             key_alias: str = "key",
             payload_cols: list[str] | None = None,
             emit_order: str | None = None) -> DataFrame:
    """Relational ``index_by``: one row per key, LAST occurrence wins.

    Jetro's "last" is positional (document order). Relationally the caller
    supplies ``order`` (a column defining that order); max_by gives the
    winner in one shuffle. ``payload_cols`` (r9) restricts the winner
    struct so hidden ``__ord`` carries never leak into the value.
    Reference: ops/array.rs:988-1004."""
    k = F.col(key) if isinstance(key, str) else key
    if order is None:
        # Jetro's "last" is document order; synthesize a stable surrogate
        # (monotonically_increasing_id follows partition/file row order for a
        # parquet scan) instead of F.last over an unordered group, which is
        # nondeterministic across partitionings/AQE re-runs.
        df = df.withColumn("__doc_ord", F.monotonically_increasing_id())
        order = "__doc_ord"
        cols = payload_cols if payload_cols is not None else \
            [c for c in df.columns if c != "__doc_ord"]
    else:
        cols = payload_cols if payload_cols is not None else list(df.columns)
    payload = F.struct(*[F.col(c) for c in cols])
    o = F.col(order) if isinstance(order, str) else order
    aggs = [F.max_by(payload, o).alias("value")]
    if emit_order is not None:
        # first-seen key order, like group_collect (r10)
        aggs.append(F.min(o).alias(emit_order))
    return df.groupBy(k.cast("string").alias(key_alias)).agg(*aggs)


def unique_by(df: DataFrame, key: str | Column, order: str | Column | None = None) -> DataFrame:
    """Dedup keeping FIRST occurrence per key (jetro keeps first).

    With an ``order`` column this is an exact, deterministic min_by per key
    — a single shuffle with map-side partials (no per-key sort, unlike a
    row_number window). Without one, a document-order surrogate
    (monotonically_increasing_id = partition/file row order) keeps the
    "first occurrence" deterministic, unlike dropDuplicates.
    Reference: ops/array.rs:273-292."""
    out_cols = list(df.columns)
    if order is None:
        df = df.withColumn("__doc_ord", F.monotonically_increasing_id())
        order = "__doc_ord"
    k = F.col(key) if isinstance(key, str) else key
    o = F.col(order) if isinstance(order, str) else order
    winner = df.groupBy(k.alias("__key")).agg(F.min_by(F.struct(*out_cols), o).alias("__w"))
    return winner.select("__w.*")


def pivot2(df: DataFrame, key: str, value: str, order: str | Column | None = None) -> DataFrame:
    """``pivot(k, v)``: array-of-objects → single flat object
    {row[k]: row[v]} (LAST wins). Relationally: one row of key→value map.

    Duplicate keys are deduped BEFORE map_from_entries (Spark's default
    spark.sql.mapKeyDedupPolicy=EXCEPTION throws on duplicates, and
    last-wins is pivot's primary use case — reference array.rs pivot_apply
    IndexMap::insert). The per-key max_by shuffles by key (scalable,
    map-side partials); only the final distinct-key map assembly is a
    single task — document-mode-faithful single-object output, so keep
    key cardinality small or use pivot3 for grids.
    Reference: ops/array.rs:550-618."""
    o = (F.col(order) if isinstance(order, str) else order) if order is not None \
        else F.monotonically_increasing_id()
    d = df.withColumn("__ord", o)
    winners = d.groupBy(F.col(key).alias("__k")).agg(
        F.max_by(F.col(value), F.col("__ord")).alias("__v"),
        # doc pivot keys an IndexMap: entry ORDER is first-seen key
        # order (r9 — collect_list arrival order was arbitrary)
        F.min(F.col("__ord")).alias("__fo"),
    )
    entries = F.transform(
        sort_by_field(F.collect_list(F.struct("__fo", "__k", "__v")), "__fo",
                      payload_dt=winners.schema["__v"].dataType),
        lambda s: F.struct(s["__k"].alias("__k"), s["__v"].alias("__v")))
    return winners.groupBy().agg(
        F.map_from_entries(entries).alias("pivot")
    )


def pivot2_rows(df: DataFrame, key: str, value: str,
                order: str | Column | None = None,
                emit_order: str | None = None) -> DataFrame:
    """``pivot(k, v)`` in ordered-object ROW form: (key, value) rows,
    last value wins per key, rows in first-seen key order via
    ``emit_order`` (min order per key) — the same objrepr convention as
    count_by/group_by. Used when NAVIGATION follows the pivot (r10):
    the aggregate stays a relational groupBy and only |keys| rows ever
    reach a downstream doc fallback, instead of collapsing the whole
    pivot INPUT into one task. Reference: ops/array.rs:550-618."""
    o = (F.col(order) if isinstance(order, str) else order) \
        if order is not None else F.monotonically_increasing_id()
    d = df.withColumn("__ord", o)
    aggs = [F.max_by(F.col(value), F.col("__ord")).alias("value")]
    if emit_order is not None:
        aggs.append(F.min(F.col("__ord")).alias(emit_order))
    out = d.groupBy(F.col(key).alias("key")).agg(*aggs)
    return out


def pivot3(df: DataFrame, row: str, col: str, val: str, values: list | None = None,
           order: str | Column | None = None) -> DataFrame:
    """``pivot(row, col, val)`` → grid, first value per cell.
    Reference: ops/array.rs:550-618. Relational = Spark's native pivot;
    pass ``values`` when known to skip the extra distinct-scan job.
    ``order`` (r9): "first per cell" is DOCUMENT order — F.first over a
    shuffled group is arbitrary; with an order column the cell winner
    is an exact min_by."""
    p = df.groupBy(row).pivot(col, values) if values else df.groupBy(row).pivot(col)
    if order is None:
        return p.agg(F.first(val))
    o = F.col(order) if isinstance(order, str) else order
    return p.agg(F.min_by(F.col(val), o))


def explode_field(df: DataFrame, field: str, alias: str | None = None) -> DataFrame:
    """``explode(field)``: one row per array element, other columns kept.
    Reference: ops/collection.rs:497-524."""
    alias = alias or field
    others = [c for c in df.columns if c != field]
    return df.select(*others, F.explode(F.col(field)).alias(alias))


def implode(df: DataFrame, field: str, group_cols: list[str] | None = None,
            order: str | Column | None = None,
            emit_order: str | None = None) -> DataFrame:
    """``implode(field)``: inverse of explode — collapse rows sharing all
    other columns back into an array. ``order`` (r9): sort each
    collected array by the given column — collect_list arrival order is
    arbitrary under multi-mapper shuffles, doc mode keeps pipeline
    order. ``emit_order`` additionally outputs min(order) per group so
    the caller can restore the doc-observable first-occurrence GROUP
    order. Reference: ops/collection.rs:525-555."""
    group_cols = group_cols or [c for c in df.columns
                                if c != field and not c.startswith("__ord")]
    if order is None:
        return df.groupBy(*group_cols).agg(
            F.collect_list(F.col(field)).alias(field))
    o = F.col(order) if isinstance(order, str) else order
    # null elements wrap to a null STRUCT so collect_list still drops
    # them — identical null semantics to the unordered path
    wrapped = F.when(F.col(field).isNotNull(),
                     F.struct(o.alias("__o"), F.col(field).alias("__v")))
    arr = F.transform(
        sort_by_field(F.collect_list(wrapped),
                      payload_dt=df.schema[field].dataType),
        lambda s: s["__v"])
    aggs = [arr.alias(field)]
    if emit_order is not None:
        aggs.append(F.min(o).alias(emit_order))
    return df.groupBy(*group_cols).agg(*aggs)
