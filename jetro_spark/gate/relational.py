"""Gate queries: navigation/filter/map/sort/group/join/set operators
(SURVEY.md §2.2-2.5) in relational mode over the driver's tables.

Each query exercises a jetro builtin through jetro_spark.operators /
functions; the oracle is plain ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.operators import (
    count_by,
    equi_join,
    explode_field,
    group_collect,
    implode,
    index_by,
    pivot3,
    unique_by,
)
from jetro_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    dfs = load_tables(spark, sf_dir, register=False)
    return [dfs[n] for n in names]


# --- filter + map (jetro: $.lineitem.filter(l_quantity > 45).map({...})) ---
def q_filter_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 45)
        .select(
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            # raw double: per-row IEEE arithmetic is bit-identical across
            # engines, unlike round() whose half-up path differs
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# --- sort(-key).take(n): TakeOrderedAndProject top-k, no full sort ---------
def q_sort_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


# --- group_by + sum/avg/min/max/count sinks (TPC-H Q1 shape) ---------------
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    # money sums go through exact decimal (order-insensitive), then back to
    # double — both engines produce the identical IEEE value
    net_dec = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
            F.sum(net_dec).cast("double").alias("revenue"),
            F.avg("l_quantity").alias("avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- equi_join: jetro inner hash join, right-wins merge --------------------
def q_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    # dimension side broadcast — at 100 TB the fact side never shuffles
    j = equi_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "o_custkey",
                  broadcast_right=True)
    return j.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


# --- 3-way join + group + topk (flagship: TPC-H Q3/Q5 shape) ---------------
def q_join3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    net_dec = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("c_nationkey")
        .agg(
            F.sum(net_dec).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- count_by (stringified key) --------------------------------------------
def q_count_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    return count_by(o, "o_orderstatus")


# --- group_by materializing groups: derived scalar output ------------------
def q_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    g = group_collect(o, "o_orderpriority")
    # project group arrays to scalars so the oracle is SQL-expressible;
    # decimal accumulator keeps the fold order-insensitive
    return g.select(
        "key",
        F.size("value").alias("group_size"),
        F.aggregate(
            F.col("value"),
            F.lit(0).cast("decimal(38,2)"),
            lambda a, x: a + x["o_totalprice"].cast("decimal(18,2)"),
        ).cast("double").alias("group_total"),
    )


# --- index_by: last-wins per stringified key --------------------------------
def q_index_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    # o_orderkey is unique → deterministic "last" per customer
    ix = index_by(o, "o_custkey", order="o_orderkey")
    return ix.select(
        "key",
        F.col("value.o_orderkey").alias("last_orderkey"),
        F.col("value.o_totalprice").alias("last_totalprice"),
    )


# --- unique / unique_by ------------------------------------------------------
def q_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_unique_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    u = unique_by(o, "o_custkey", order="o_orderkey")
    return u.select("o_custkey", "o_orderkey", "o_totalprice")


# --- min_by / max_by (global extreme element) -------------------------------
def q_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(1)
        .select("o_orderkey", "o_totalprice")
    )


# --- any / all per group (exists / forall) ----------------------------------
def q_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.bool_or(F.col("l_discount") > 0.05).alias("any_discounted"),
        F.bool_and(F.col("l_quantity") < 49).alias("all_small"),
    )


# --- count with predicate ----------------------------------------------------
def q_count_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        F.sum("l_quantity").alias("total_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
         / F.count(F.lit(1))).alias("avg_price"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_tax").alias("max_tax"),
    )


# --- pivot(row, col, val) ----------------------------------------------------
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
    )
    return p.select(
        "o_orderpriority",
        F.col("O").alias("total_O"),
        F.col("F").alias("total_F"),
        F.col("P").alias("total_P"),
    )


# --- explode / implode (array column round-trip) -----------------------------
def q_implode(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    im = implode(li.select("l_orderkey", "l_quantity"), "l_quantity", ["l_orderkey"])
    return im.select(
        "l_orderkey",
        F.size("l_quantity").alias("n_items"),
        F.aggregate("l_quantity", F.lit(0.0), lambda a, x: a + x).alias("qty_sum"),
    )


def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # direct array input (no implode round-trip: the bench line should
    # measure explode itself, not groupBy+collect_list+explode)
    (li,) = _t(spark, sf_dir, "lineitem")
    arr = li.select(
        "l_orderkey", "l_linenumber",
        F.array("l_quantity", "l_discount", "l_tax").alias("vals"),
    )
    ex = explode_field(arr, "vals", alias="val")
    return ex.select("l_orderkey", "l_linenumber", "val")


# --- set ops: diff / intersect / union (relational) --------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    # ONE corpus pass (r14): a partkey is in `a` iff some row has
    # l_returnflag='R', in `b` iff some row has l_linestatus='O' — so
    # both memberships fold into one groupBy(l_partkey) and
    # intersect/diff become filters over the same aggregate. The old
    # a.intersect(b) ∪ a.subtract(b) scanned lineitem FOUR times (each
    # set op scans both branches; plan subtrees are never shared) with
    # a distinct-exchange per branch; this is one scan + one exchange,
    # reused by both consumers. Semantics are preserved exactly:
    # INTERSECT/EXCEPT emit DISTINCT keys (the groupBy does), treat
    # NULL keys as equal (a NULL partkey groups like any value), and
    # membership is existential (bool_or; coalesce false = "no
    # qualifying row", matching the filters that defined a and b).
    # Oracle SQL unchanged — equivalence is hash-proven.
    flags = (li.groupBy("l_partkey").agg(
        F.coalesce(F.bool_or(F.col("l_returnflag") == "R"),
                   F.lit(False)).alias("__a"),
        F.coalesce(F.bool_or(F.col("l_linestatus") == "O"),
                   F.lit(False)).alias("__b")))
    return (flags.filter(F.col("__a") & F.col("__b"))
            .select("l_partkey").withColumn("op", F.lit("intersect"))
            .unionAll(flags.filter(F.col("__a") & ~F.col("__b"))
                      .select("l_partkey").withColumn("op", F.lit("diff"))))


# --- approx_count_distinct (HLL, tolerance verdict emitted in-plan) ----------
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate vs the 5% error contract (Spark's default rsd), with
    the verdict AS DATA so the driver's exact hash-compare covers it: the
    row is (exact_parts, within_tol); the oracle recomputes exact_parts
    and asserts within_tol via `true`. DuckDB cannot replay Spark's HLL
    sketch, so the estimate itself is not emitted — the in-plan exact
    distinct (gate-scale verification only; production callers use the
    HLL path alone) anchors the comparison; within_tol embeds the whole
    error-bound contract, so a drifting estimate flips the hash."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (F.abs(F.approx_count_distinct("l_partkey").cast("double")
               - F.countDistinct("l_partkey"))
         / F.countDistinct("l_partkey") <= F.lit(0.05)).alias("within_tol"))


QUERIES = {
    "filter_map": q_filter_map,
    "sort_take": q_sort_take,
    "group_agg": q_group_agg,
    "equi_join": q_equi_join,
    "join3_revenue": q_join3_revenue,
    "count_by": q_count_by,
    "group_collect": q_group_collect,
    "index_by": q_index_by,
    "unique": q_unique,
    "unique_by": q_unique_by,
    "max_by": q_max_by,
    "any_all": q_any_all,
    "count_pred": q_count_pred,
    "pivot": q_pivot,
    "implode": q_implode,
    "explode": q_explode,
    "set_ops": q_set_ops,
    "approx_count_distinct": q_approx_count_distinct,
}

ORACLES = {
    "filter_map": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem WHERE l_quantity > 45
    """,
    "sort_take": """
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "group_agg": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               avg(l_quantity) AS avg_qty,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "equi_join": """
        SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "join3_revenue": """
        SELECT c_nationkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY c_nationkey
    """,
    "count_by": """
        SELECT CAST(o_orderstatus AS VARCHAR) AS key, count(*) AS value
        FROM orders GROUP BY o_orderstatus
    """,
    "group_collect": """
        SELECT CAST(o_orderpriority AS VARCHAR) AS key,
               CAST(count(*) AS INTEGER) AS group_size,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS group_total
        FROM orders GROUP BY o_orderpriority
    """,
    "index_by": """
        SELECT CAST(o_custkey AS VARCHAR) AS key,
               max_by(o_orderkey, o_orderkey) AS last_orderkey,
               max_by(o_totalprice, o_orderkey) AS last_totalprice
        FROM orders GROUP BY o_custkey
    """,
    "unique": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "unique_by": """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderkey) AS rn
              FROM orders) WHERE rn = 1
    """,
    "max_by": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
    """,
    "any_all": """
        SELECT l_orderkey,
               bool_or(l_discount > 0.05) AS any_discounted,
               bool_and(l_quantity < 49) AS all_small
        FROM lineitem GROUP BY l_orderkey
    """,
    "count_pred": """
        SELECT count(*) AS n_rows,
               count(*) FILTER (l_returnflag = 'R') AS n_returned,
               sum(l_quantity) AS total_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS avg_price,
               min(l_discount) AS min_disc,
               max(l_tax) AS max_tax
        FROM lineitem
    """,
    "pivot": """
        SELECT o_orderpriority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (o_orderstatus = 'O') AS DOUBLE) AS total_O,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (o_orderstatus = 'F') AS DOUBLE) AS total_F,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (o_orderstatus = 'P') AS DOUBLE) AS total_P
        FROM orders GROUP BY o_orderpriority
    """,
    "implode": """
        SELECT l_orderkey, CAST(count(*) AS INTEGER) AS n_items,
               sum(l_quantity) AS qty_sum
        FROM lineitem GROUP BY l_orderkey
    """,
    "explode": """
        SELECT l_orderkey, l_linenumber,
               unnest([l_quantity, l_discount, l_tax]) AS val
        FROM lineitem
    """,
    "set_ops": """
        SELECT l_partkey, 'intersect' AS op FROM
          (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'
           INTERSECT
           SELECT DISTINCT l_partkey FROM lineitem WHERE l_linestatus = 'O')
        UNION ALL
        SELECT l_partkey, 'diff' AS op FROM
          (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'
           EXCEPT
           SELECT DISTINCT l_partkey FROM lineitem WHERE l_linestatus = 'O')
    """,
    # approx_count_distinct: the HLL estimate itself has no cross-engine
    # replica; the oracle pins the exact side and asserts the in-plan
    # tolerance verdict (within_tol must hash-match `true`).
    "approx_count_distinct": """
        SELECT count(DISTINCT l_partkey) AS exact_parts,
               true AS within_tol
        FROM lineitem
    """,
}
