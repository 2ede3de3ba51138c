"""Gate queries: extended join surface (operators/joins.py) — as-of,
range, left/semi/anti joins over the driver's tables.

Oracles: DuckDB has NATIVE ASOF JOIN (backward = ``l.t >= r.t``, forward
= ``l.t <= r.t``) and plans range predicates with IEJoin, so every row
here gets a full value-hash oracle. Timestamps are never output raw
(gate convention) — epoch_us longs on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.operators.joins import (
    DAY_US,
    anti_join,
    asof_join,
    left_join,
    range_join,
    salted_join,
    semi_join,
)
from jetro_spark.session import load_tables
from jetro_spark.timeutil import ts_to_timestamp


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Tables with every time column normalized to TimestampType —
    representation-safe across testdata generations (bigint nano-epochs
    under nanosAsLong, or plain µs timestamps). Joins/tolerances here
    use timestamp arithmetic (INTERVAL literals), which a raw bigint
    axis would break."""
    dfs = load_tables(spark, sf_dir, register=False)
    out = []
    for n in names:
        df = dfs[n]
        for tc in ("ts", "o_orderdate", "l_shipdate"):
            dt = dict(df.dtypes).get(tc)
            if dt is not None:
                df = df.withColumn(tc, ts_to_timestamp(F.col(tc), dt))
        out.append(df)
    return out


def _us(c: F.Column) -> F.Column:
    return F.unix_micros(c.cast("timestamp"))


# --- as-of backward: each click → latest purchase by the same user -----------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts", "value")
    # asof_join's determinism contract: with duplicate (user_id, ts)
    # both a bare window pick and DuckDB's native ASOF pick are
    # arbitrary and may disagree. right_tiebreak="event_id" resolves
    # ties to the min event_id INSIDE the window sort (one extra sort
    # key — no pre-aggregation shuffle, which is what regressed the r5
    # bench number), equivalent to the oracle's arg_min dedup.
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    j = asof_join(clicks, purchases, on=["user_id"],
                  left_time="ts", right_time="ts",
                  right_tiebreak="event_id")
    return j.select(
        "event_id", "user_id",
        _us(F.col("ts")).alias("click_us"),
        F.col("r_event_id").alias("p_event_id"),
        _us(F.col("r_ts")).alias("purchase_us"),
        F.round("r_value", 4).alias("p_value"),
    )


# --- as-of LEFT: every click kept, unmatched ones with null purchase --------
def q_asof_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    # deterministic tie rule — see q_asof_join
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    j = asof_join(clicks, purchases, on=["user_id"],
                  left_time="ts", right_time="ts", how="left",
                  right_tiebreak="event_id")
    return j.select("event_id", "user_id",
                    F.col("r_event_id").alias("p_event_id"))


# --- as-of forward + tolerance: next signup within 12h of each error --------
def q_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error") \
        .select("event_id", "user_id", "ts")
    # deterministic tie rule — see q_asof_join
    signups = ev.filter(F.col("event_type") == "signup") \
        .select("event_id", "user_id", "ts")
    j = asof_join(errors, signups, on=["user_id"],
                  left_time="ts", right_time="ts", direction="forward",
                  tolerance=F.expr("INTERVAL 12 HOURS"),
                  right_tiebreak="event_id")
    # floor-divide on BOTH sides: Spark's double→long cast truncates while
    # DuckDB's rounds, so never cast a fractional quotient
    return j.select(
        "event_id", "user_id",
        F.col("r_event_id").alias("s_event_id"),
        F.floor((_us(F.col("r_ts")) - _us(F.col("ts"))) / F.lit(1_000_000))
        .cast("long").alias("gap_sec"),
    )


# --- range join: high-qty shipments inside big-order 3-day windows ----------
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = _t(spark, sf_dir, "lineitem", "orders")
    pts = li.filter(F.col("l_quantity") >= 49) \
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    ivals = o.filter(F.col("o_totalprice") > 400000) \
        .select(F.col("o_orderkey").alias("w_orderkey"),
                F.col("o_orderdate").alias("w_start"),
                (F.col("o_orderdate").cast("timestamp")
                 + F.expr("INTERVAL 3 DAYS")).alias("w_end"))
    j = range_join(pts, ivals, point="l_shipdate", start="w_start",
                   end="w_end", bin_width=3 * DAY_US)
    return j.select(
        "l_orderkey", "l_linenumber",
        _us(F.col("l_shipdate")).alias("ship_us"),
        "w_orderkey",
        _us(F.col("w_start")).alias("w_start_us"),
    )


# --- left / semi / anti over customer ⋈ big orders --------------------------
def _big_orders(o: DataFrame) -> DataFrame:
    return o.filter(F.col("o_totalprice") > 450000)


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    big = _big_orders(o).select(F.col("o_custkey").alias("k"), "o_orderkey",
                                "o_totalprice")
    j = left_join(c.select("c_custkey", "c_name", "c_mktsegment"), big,
                  "c_custkey", "k", broadcast_right=True)
    return j.select("c_custkey", "c_name", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice"))


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    return semi_join(c, _big_orders(o), "c_custkey", "o_custkey") \
        .select("c_custkey", "c_name", "c_mktsegment")


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    return anti_join(c, _big_orders(o), "c_custkey", "o_custkey") \
        .select("c_custkey", "c_name", "c_mktsegment")


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join must produce EXACTLY the plain equi-join
    answer (salting only changes the physical row distribution) — the
    oracle is the same SQL as a plain join."""
    o, c = _t(spark, sf_dir, "orders", "customer")
    j = salted_join(o, c.withColumnRenamed("c_custkey", "k"),
                    "o_custkey", "k", salt=8, broadcast_right=True)
    return j.select("o_orderkey", "o_custkey", "c_name",
                    F.round("o_totalprice", 2).alias("o_totalprice"))


# --- bucketed co-located join: layout pays the shuffle once at write ---------
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders+customer bucketed by custkey, join with ZERO shuffle
    (asserted — the plan contract, not just the values), return the same
    rows a plain SQL join gives. operators/bucketing.py scale notes."""
    import os
    import tempfile

    from jetro_spark.operators.bucketing import (
        assert_no_shuffle,
        bucketed_join,
        write_bucketed,
    )

    o, c = _t(spark, sf_dir, "orders", "customer")
    # stable per-sf location + overwrite mode: re-runs REUSE the
    # directory instead of leaking a fresh mkdtemp per invocation
    base = os.path.join(
        tempfile.gettempdir(),
        f"jetro_gate_buckets_{os.path.basename(sf_dir.rstrip('/'))}")
    write_bucketed(o.filter(F.col("o_totalprice") > 400000)
                   .select("o_orderkey", "o_custkey", "o_totalprice"),
                   "gate_b_orders", ["o_custkey"], 8,
                   path=os.path.join(base, "orders"))
    write_bucketed(c.select(F.col("c_custkey").alias("o_custkey"),
                            "c_name"),
                   "gate_b_cust", ["o_custkey"], 8,
                   path=os.path.join(base, "cust"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "gate_b_orders", "gate_b_cust",
                          ["o_custkey"])
        assert_no_shuffle(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return j.select("o_orderkey", "o_custkey", "c_name",
                    F.round("o_totalprice", 2).alias("o_totalprice"))


QUERIES = {
    "asof_join": q_asof_join,
    "asof_left": q_asof_left,
    "salted_join": q_salted_join,
    "asof_forward_tol": q_asof_forward_tol,
    "range_join": q_range_join,
    "join_left": q_join_left,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "bucketed_join": q_bucketed_join,
}

ORACLES = {
    "bucketed_join": """
        SELECT o.o_orderkey, o.o_custkey, c.c_name,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "salted_join": """
        SELECT o.o_orderkey, o.o_custkey, c.c_name,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "asof_join": """
        WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
                        WHERE event_type = 'click'),
             purch AS (SELECT user_id, ts, min(event_id) AS p_event_id,
                              arg_min(value, event_id) AS p_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts)
        SELECT c.event_id, c.user_id,
               epoch_us(c.ts) AS click_us,
               p.p_event_id,
               epoch_us(p.ts) AS purchase_us,
               round(p.p_value, 4) AS p_value
        FROM clicks c ASOF JOIN purch p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "asof_left": """
        WITH clicks AS (SELECT event_id, user_id, ts FROM events
                        WHERE event_type = 'click'),
             purch AS (SELECT user_id, ts, min(event_id) AS p_event_id
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts)
        SELECT c.event_id, c.user_id, p.p_event_id
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "asof_forward_tol": """
        WITH err AS (SELECT event_id, user_id, ts FROM events
                     WHERE event_type = 'error'),
             sgn AS (SELECT user_id, ts, min(event_id) AS s_event_id
                     FROM events WHERE event_type = 'signup'
                     GROUP BY user_id, ts),
        matched AS (
          SELECT e.event_id, e.user_id, s.s_event_id,
                 epoch_us(s.ts) - epoch_us(e.ts) AS gap_us
          FROM err e ASOF JOIN sgn s
            ON e.user_id = s.user_id AND e.ts <= s.ts)
        SELECT event_id, user_id, s_event_id,
               CAST(gap_us // 1000000 AS BIGINT) AS gap_sec
        FROM matched WHERE gap_us <= 43200000000
    """,
    "range_join": """
        WITH pts AS (SELECT l_orderkey, l_linenumber, l_shipdate
                     FROM lineitem WHERE l_quantity >= 49),
             iv AS (SELECT o_orderkey AS w_orderkey,
                           o_orderdate AS w_start,
                           o_orderdate + INTERVAL 3 DAY AS w_end
                    FROM orders WHERE o_totalprice > 400000)
        SELECT p.l_orderkey, p.l_linenumber,
               epoch_us(p.l_shipdate) AS ship_us,
               iv.w_orderkey,
               epoch_us(iv.w_start) AS w_start_us
        FROM pts p JOIN iv
          ON p.l_shipdate >= iv.w_start AND p.l_shipdate < iv.w_end
    """,
    "join_left": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM customer c LEFT JOIN
             (SELECT * FROM orders WHERE o_totalprice > 450000) o
          ON c.c_custkey = o.o_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
    """,
    "join_anti": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 450000)
    """,
}
