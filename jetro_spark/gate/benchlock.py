"""Gate queries: the reference's bench_lock workload in DOCUMENT mode.

The 13 locked queries (jetro-core/examples/bench_lock.rs:20-46,
BASELINE.md) run as jetro expression strings through the document-mode
compiler over the deterministic synthetic document. Because the document
is pure arithmetic in (i, j) (benchdoc.synth_doc), DuckDB can REGENERATE
it with generate_series and check the query output value-for-value —
document-mode answers get the same hard oracle as relational rows.

Order-sensitive outputs (arrays) compare via ordered list() aggregation;
fold-order-sensitive sums use list_sum over an ORDERED list, which folds
sequentially exactly like our F.aggregate lowering, so doubles match
bit-for-bit.

The four queries whose outputs are arrays of full nested order/item
structs (Q5, Q6, Q7, Q10) stay out of the oracle gate — their semantics
are covered by the differential tests in tests/test_jql.py — leaving 9
oracled rows.

Gate-scale doc: 2,000 orders × 6 items (bench.py times the full 20k×6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jetro_spark.benchdoc import (
    BENCH_QUERIES,
    CCODES,
    CITIES,
    STATUSES,
    synth_doc,
)

N_ORDERS = 2_000
ITEMS = 6

_ENGINES: dict = {}


def _jt(spark: SparkSession):
    key = id(spark)
    if key not in _ENGINES:
        from jetro_spark.jql.engine import Jetro

        _ENGINES[key] = Jetro.from_value(spark, synth_doc(N_ORDERS, ITEMS))
    return _ENGINES[key]


def _q(name: str):
    expr = BENCH_QUERIES[name]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _jt(spark).frame(expr)

    fn.__doc__ = f"bench_lock doc-mode: {expr}"
    return fn


QUERIES = {
    f"doc_{name}": _q(name)
    for name in ("bl_q1", "bl_q2", "bl_q3", "bl_q4", "bl_q8", "bl_q9",
                 "bl_q11", "bl_q12", "bl_q13")
}


def _sql_list(xs: list[str]) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


# regenerate the document: one row per order i, derived columns mirror
# benchdoc.synth_doc's arithmetic exactly (sequential double folds)
_ORDERS_CTE = f"""
    WITH o AS (
      SELECT i,
             100000 + i AS id,
             {_sql_list(STATUSES)}[(i % 5) + 1] AS status,
             {_sql_list(CITIES)}[(i % 6) + 1] AS city,
             {_sql_list(CCODES)}[(i % 6) + 1] AS country_code,
             floor(list_sum([((i * 7 + j * 13) % 500 + 9.99)
                             * ((i + j) % 5 + 1)
                             for j in generate_series(0, {ITEMS - 1})])
                   * 100 + 0.5) / 100 AS total
      FROM generate_series(0, {N_ORDERS - 1}) AS g(i)
    )
"""

ORACLES = {
    # $.orders.map(customer.address.city) → one row, ordered array
    "doc_bl_q1": _ORDERS_CTE + """
        SELECT list(city ORDER BY i) AS value FROM o
    """,
    # .unique() keeps first-seen order
    "doc_bl_q2": _ORDERS_CTE + """
        , firsts AS (
          SELECT country_code, min(i) AS mi FROM o GROUP BY country_code
        )
        SELECT list(country_code ORDER BY mi) AS value FROM firsts
    """,
    "doc_bl_q3": _ORDERS_CTE + """
        SELECT coalesce(list(id ORDER BY i) FILTER (total > 500), [])
               AS value
        FROM o
    """,
    "doc_bl_q4": _ORDERS_CTE + """
        SELECT count(*) FILTER (status = 'shipped'
                                AND (i // 3) % 4 = 2) AS value
        FROM o
    """,
    # $..total.sum() — sequential fold over document order
    "doc_bl_q8": _ORDERS_CTE + """
        SELECT list_sum(list(total ORDER BY i)) AS value FROM o
    """,
    # $..sku — every item sku in (order, item) document order
    "doc_bl_q9": f"""
        SELECT list(printf('SKU-%05d', (i * {ITEMS} + j) % 9973)
                    ORDER BY i, j) AS value
        FROM generate_series(0, {N_ORDERS - 1}) AS g(i),
             generate_series(0, {ITEMS - 1}) AS h(j)
    """,
    "doc_bl_q11": _ORDERS_CTE + """
        SELECT list_sum(list(total ORDER BY i)) AS value FROM o
    """,
    "doc_bl_q12": _ORDERS_CTE + """
        SELECT max(total) AS value FROM o
    """,
    "doc_bl_q13": _ORDERS_CTE + """
        SELECT coalesce(list(id ORDER BY i) FILTER (total > 1000), [])
               AS value
        FROM o
    """,
}
