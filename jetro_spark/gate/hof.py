"""Gate queries: document-mode array HOFs with DuckDB oracles.

Round-1 verdict item #10: ~40 doc-mode builtins had only pytest goldens.
These rows build REAL array columns (per-order sorted quantity lists via
groupBy+collect) and push them through the arrays.py higher-order
builtins, checked against closed-form DuckDB expressions over the same
ordered lists. Sorting by the emitted value itself makes the arrays
deterministic on both engines (ties contribute identical elements).

Scale note: one shuffle (the groupBy) builds the arrays; every HOF after
that is row-local whole-stage-codegen work — the 100 TB shape for
in-document pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.functions import arrays as AR
from jetro_spark.functions.core import elem_at
from jetro_spark.session import load_tables


def _qty_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, register=False)["lineitem"]
    return (li.groupBy("l_orderkey")
            .agg(F.array_sort(F.collect_list(F.col("l_quantity").cast("double")))
                 .alias("qs")))


def q_hof_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take_while/drop_while/chunk/window/pairwise/accumulate/partition/
    zip/lag/rolling over per-order sorted quantity arrays."""
    d = _qty_arrays(spark, sf_dir)
    a = F.col("qs")
    lt30 = lambda x: x < 30  # noqa: E731
    return d.select(
        F.col("l_orderkey").alias("okey"),
        F.size(AR.take_while(a, lt30)).cast("long").alias("tw"),
        F.size(AR.drop_while(a, lt30)).cast("long").alias("dw"),
        F.size(AR.chunk(a, 3)).cast("long").alias("nchunk"),
        F.size(AR.window(a, 3)).cast("long").alias("nwin"),
        F.size(AR.pairwise(a)).cast("long").alias("npair"),
        elem_at(AR.accumulate(a, lambda acc, x: acc + x), -1)
        .alias("acc_last"),
        F.size(AR.partition(a, lambda x: x > 25)["pass"]).cast("long")
        .alias("npass"),
        F.size(AR.zip_(a, AR.reverse(a))).cast("long").alias("nzip"),
        elem_at(AR.lag(a, 1), 2).alias("lag2"),
        elem_at(AR.rolling(a, 2, "sum"), -1).alias("roll_last"),
    )


def q_hof_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unique/first/last/nth/flatten/compact/includes/count_by (document
    mode) over the same arrays."""
    d = _qty_arrays(spark, sf_dir)
    a = F.col("qs")
    return d.select(
        F.col("l_orderkey").alias("okey"),
        F.size(AR.unique(a)).cast("long").alias("nuniq"),
        AR.first(a).alias("fst"),
        AR.last(a).alias("lst"),
        AR.nth(a, -1).alias("nth_neg"),
        F.size(AR.flatten(F.array(a, a))).cast("long").alias("nflat"),
        F.size(AR.compact(F.array_append(a, F.lit(None).cast("double"))))
        .cast("long").alias("ncompact"),
        AR.includes(a, F.lit(50.0).cast("double")).alias("has50"),
        # doc-mode count_by over stringified bucket (q >= 25)
        F.size(AR.count_by(a, lambda x: x >= 25)).cast("long").alias("nbuckets"),
    )


QUERIES = {
    "hof_stream": q_hof_stream,
    "hof_shape": q_hof_shape,
}

_L = "list_sort(list(CAST(l_quantity AS DOUBLE)))"

ORACLES = {
    # closed forms over the sorted list: sorted ⇒ take_while(<30) =
    # count(<30); accumulate-last = sum; window/pairwise/chunk counts are
    # size arithmetic (reference ops/collection.rs:124-249 null-until-full
    # and empty-array rules are covered because size-1 and size-2 orders
    # exist in the data)
    "hof_stream": f"""
        WITH t AS (
          SELECT l_orderkey AS okey, {_L} AS l FROM lineitem GROUP BY l_orderkey
        )
        SELECT okey,
               len(list_filter(l, x -> x < 30))::BIGINT AS tw,
               (len(l) - len(list_filter(l, x -> x < 30)))::BIGINT AS dw,
               CAST(ceil(len(l) / 3.0) AS BIGINT) AS nchunk,
               greatest(len(l) - 2, 0)::BIGINT AS nwin,
               greatest(len(l) - 1, 0)::BIGINT AS npair,
               CASE WHEN len(l) > 0 THEN list_sum(l) END AS acc_last,
               len(list_filter(l, x -> x > 25))::BIGINT AS npass,
               len(l)::BIGINT AS nzip,
               CASE WHEN len(l) >= 2 THEN l[1] END AS lag2,
               CASE WHEN len(l) >= 2 THEN l[-1] + l[-2]
                    WHEN len(l) = 1 THEN NULL END AS roll_last
        FROM t
    """,
    "hof_shape": f"""
        WITH t AS (
          SELECT l_orderkey AS okey, {_L} AS l FROM lineitem GROUP BY l_orderkey
        )
        SELECT okey,
               len(list_distinct(l))::BIGINT AS nuniq,
               l[1] AS fst,
               l[-1] AS lst,
               l[-1] AS nth_neg,
               (2 * len(l))::BIGINT AS nflat,
               len(l)::BIGINT AS ncompact,
               list_contains(l, 50.0) AS has50,
               len(list_distinct(list_transform(l, x -> x >= 25)))::BIGINT
                 AS nbuckets
        FROM t
    """,
}
