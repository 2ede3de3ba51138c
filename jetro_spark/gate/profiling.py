"""Gate queries: data-profiling operators (operators/profiling.py).

Quantiles use the discrete nearest-lower-rank definition so results are
actual data values (hash-comparable across engines; interpolation FP
order is engine-specific). Profile min/max are stringified — column
choices here keep Spark and DuckDB string renderings identical (integers,
plain doubles, midnight timestamps, strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.operators.profiling import (
    check_constraints,
    group_quantiles,
    histogram,
    key_skew,
    profile_table,
)
from jetro_spark.operators.timeseries import funnel, sessionize
from jetro_spark.session import load_tables


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, register=False)["lineitem"]


def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return group_quantiles(_li(spark, sf_dir), "l_extendedprice",
                           [0.25, 0.5, 0.75, 0.99],
                           keys=["l_returnflag"])


def q_group_quantiles_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same values as group_quantiles, different PLAN: the keyed
    distributed prefix spreads each l_returnflag group over many
    partitions (the 100 TB low-cardinality-keys path) — oracled against
    the identical SQL to prove plan != answer."""
    return group_quantiles(_li(spark, sf_dir), "l_extendedprice",
                           [0.25, 0.5, 0.75, 0.99],
                           keys=["l_returnflag"], spread_keys=True)


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return histogram(_li(spark, sf_dir), "l_extendedprice",
                     lo=0.0, hi=110_000.0, bins=22)


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(_li(spark, sf_dir),
                         ["l_orderkey", "l_quantity", "l_returnflag",
                          "l_shipdate"])


def q_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profile mode: approx_count_distinct per column (one
    pass, no expand). The HLL estimate has no cross-engine replica, so
    the error contract is computed IN-PLAN and emitted as the row (same
    pattern as approx_count_distinct, r6): exact_distinct anchors the
    hash compare against DuckDB's exact count, within_tol asserts the
    estimate sits within 5% of it (rsd=1%, so the bound is wide), and
    the remaining stats are exact. The production operator stays
    profile_table(approx=True) — the exact side here is gate-scale
    verification only."""
    li = _li(spark, sf_dir)
    out = None
    # one agg PER column: multiple countDistinct columns in a single agg
    # plan an Expand (row multiplication per distinct set — measured 10x
    # on this row); per-column single-distinct aggs stay expand-free
    for c in ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"):
        col = F.col(c)
        exact = F.countDistinct(col)
        approx = F.approx_count_distinct(col, 0.01)
        one = li.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(col.isNull(), 1)).alias("n_null"),
            exact.cast("long").alias("exact_distinct"),
            (F.abs(approx.cast("double") - exact)
             / F.greatest(exact, F.lit(1)) <= F.lit(0.05))
            .alias("within_tol"),
            F.min(col).cast("string").alias("min_str"),
            F.max(col).cast("string").alias("max_str"))
        out = one if out is None else out.unionByName(one)
    return out


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, register=False)["orders"]
    return key_skew(o, "o_orderpriority", top=5).select(
        "key", "n", F.round("share", 6).alias("share"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, register=False)["events"]
    # normalize ts to TimestampType (representation-safe across testdata
    # generations; sessionize numeric axes are raw µs, never raw nanos)
    from jetro_spark.timeutil import ts_to_timestamp
    ev = ev.withColumn("ts", ts_to_timestamp(
        F.col("ts"), dict(ev.dtypes).get("ts", "")))
    out = sessionize(ev, time_col="ts", gap_us=15 * 60 * 1_000_000,
                     keys=["user_id"], tiebreak="event_id")
    return out.select("event_id", "user_id", "session_seq")


def q_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-gate contract over lineitem: range/nullability row checks
    plus key-uniqueness — note (l_orderkey, l_linenumber) is genuinely
    NOT unique in the synthetic data, so that constraint reports real
    violations rather than a trivial zero."""
    li = load_tables(spark, sf_dir, register=False)["lineitem"]
    return check_constraints(
        li,
        {
            "qty_in_range": (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
            "price_positive": F.col("l_extendedprice") > 0,
            "orderkey_not_null": F.col("l_orderkey").isNotNull(),
            "discount_unit_interval": (F.col("l_discount") >= 0)
                                      & (F.col("l_discount") <= 1),
        },
        unique=[["l_orderkey", "l_linenumber"]],
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel per user, later steps bound
    to one day of the step-0 match. One pushdown-filtered scan + one
    groupBy(user) + a row-local first-after-previous array fold; the
    oracle derives each step INDEPENDENTLY as a chain of min()-after-
    previous CTE joins — two different formulations of the same
    semantics."""
    ev = load_tables(spark, sf_dir, register=False)["events"]
    # representation-safe ts normalization, like q_sessionize
    from jetro_spark.timeutil import ts_to_timestamp
    ev = ev.withColumn("ts", ts_to_timestamp(
        F.col("ts"), dict(ev.dtypes).get("ts", "")))
    out = funnel(ev, ["view", "click", "purchase"],
                 within_us=86_400_000_000)
    return out.select("user_id", "steps_completed", "t0", "t1", "t2")


def q_funnel_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 funnel variant: PER-STEP conversion windows — every step must
    land within 6 h of the PREVIOUS step's match (within="step"), not
    of the funnel start."""
    ev = load_tables(spark, sf_dir, register=False)["events"]
    from jetro_spark.timeutil import ts_to_timestamp
    ev = ev.withColumn("ts", ts_to_timestamp(
        F.col("ts"), dict(ev.dtypes).get("ts", "")))
    out = funnel(ev, ["view", "click", "purchase"],
                 within_us=21_600_000_000, within="step")
    return out.select("user_id", "steps_completed", "t0", "t1", "t2")


def q_funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 funnel variant: any-order SET COMPLETION — a step matches at
    the user's earliest event of that type within one day of their
    first funnel-type event; steps_completed counts matched steps, not
    an ordered prefix."""
    ev = load_tables(spark, sf_dir, register=False)["events"]
    from jetro_spark.timeutil import ts_to_timestamp
    ev = ev.withColumn("ts", ts_to_timestamp(
        F.col("ts"), dict(ev.dtypes).get("ts", "")))
    out = funnel(ev, ["view", "click", "purchase"],
                 within_us=86_400_000_000, mode="unordered")
    return out.select("user_id", "steps_completed", "t0", "t1", "t2")


QUERIES = {
    "group_quantiles": q_group_quantiles,
    "group_quantiles_spread": q_group_quantiles_spread,
    "histogram": q_histogram,
    "profile_table": q_profile_table,
    "profile_approx": q_profile_approx,
    "key_skew": q_key_skew,
    "sessionize": q_sessionize,
    "funnel": q_funnel,
    "funnel_step": q_funnel_step,
    "funnel_unordered": q_funnel_unordered,
    "check_constraints": q_check_constraints,
}


def _quantile_sql(ps: list[float]) -> str:
    cells = ",\n               ".join(
        f"max(CASE WHEN rn = floor((n - 1) * {p}) THEN l_extendedprice END)"
        f" AS q{int(round(p * 100))}" for p in ps)
    return f"""
        WITH r AS (
          SELECT l_returnflag, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice) - 1 AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem WHERE l_extendedprice IS NOT NULL)
        SELECT l_returnflag,
               {cells}
        FROM r GROUP BY l_returnflag
    """


def _profile_col_sql(col: str) -> str:
    return f"""
        SELECT '{col}' AS "column",
               count(*)::BIGINT AS n,
               count(CASE WHEN {col} IS NULL THEN 1 END)::BIGINT AS n_null,
               count(DISTINCT {col})::BIGINT AS n_distinct,
               min({col})::VARCHAR AS min_str,
               max({col})::VARCHAR AS max_str
        FROM lineitem
    """


_FUNNEL_SQL = """
    WITH f AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), s0 AS (
      SELECT user_id, min(us) AS t0 FROM f
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT f.user_id, min(us) AS t1
      FROM f JOIN s0 USING (user_id)
      WHERE event_type = 'click' AND us > t0
        AND us <= t0 + 86400000000 GROUP BY f.user_id
    ), s2 AS (
      SELECT f.user_id, min(us) AS t2
      FROM f JOIN s0 USING (user_id) JOIN s1 USING (user_id)
      WHERE event_type = 'purchase' AND us > t1
        AND us <= t0 + 86400000000 GROUP BY f.user_id
    )
    SELECT u.user_id,
           CAST(CASE WHEN t2 IS NOT NULL THEN 3
                     WHEN t1 IS NOT NULL THEN 2
                     WHEN t0 IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS steps_completed,
           t0, t1, t2
    FROM (SELECT DISTINCT user_id FROM f) u
    LEFT JOIN s0 USING (user_id)
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
"""

_FUNNEL_STEP_SQL = """
    WITH f AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), s0 AS (
      SELECT user_id, min(us) AS t0 FROM f
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT f.user_id, min(us) AS t1
      FROM f JOIN s0 USING (user_id)
      WHERE event_type = 'click' AND us > t0
        AND us <= t0 + 21600000000 GROUP BY f.user_id
    ), s2 AS (
      SELECT f.user_id, min(us) AS t2
      FROM f JOIN s1 USING (user_id)
      WHERE event_type = 'purchase' AND us > t1
        AND us <= t1 + 21600000000 GROUP BY f.user_id
    )
    SELECT u.user_id,
           CAST(CASE WHEN t2 IS NOT NULL THEN 3
                     WHEN t1 IS NOT NULL THEN 2
                     WHEN t0 IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS steps_completed,
           t0, t1, t2
    FROM (SELECT DISTINCT user_id FROM f) u
    LEFT JOIN s0 USING (user_id)
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
"""

_FUNNEL_UNORDERED_SQL = """
    WITH f AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), a AS (
      SELECT user_id, min(us) AS anchor FROM f GROUP BY user_id
    ), s0 AS (
      SELECT f.user_id, min(us) AS t0 FROM f JOIN a USING (user_id)
      WHERE event_type = 'view' AND us <= anchor + 86400000000
      GROUP BY f.user_id
    ), s1 AS (
      SELECT f.user_id, min(us) AS t1 FROM f JOIN a USING (user_id)
      WHERE event_type = 'click' AND us <= anchor + 86400000000
      GROUP BY f.user_id
    ), s2 AS (
      SELECT f.user_id, min(us) AS t2 FROM f JOIN a USING (user_id)
      WHERE event_type = 'purchase' AND us <= anchor + 86400000000
      GROUP BY f.user_id
    )
    SELECT u.user_id,
           CAST((t0 IS NOT NULL)::INT + (t1 IS NOT NULL)::INT
                + (t2 IS NOT NULL)::INT AS INTEGER) AS steps_completed,
           t0, t1, t2
    FROM (SELECT DISTINCT user_id FROM f) u
    LEFT JOIN s0 USING (user_id)
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
"""

ORACLES = {
    "funnel": _FUNNEL_SQL,
    "funnel_step": _FUNNEL_STEP_SQL,
    "funnel_unordered": _FUNNEL_UNORDERED_SQL,
    "group_quantiles": _quantile_sql([0.25, 0.5, 0.75, 0.99]),
    "group_quantiles_spread": _quantile_sql([0.25, 0.5, 0.75, 0.99]),
    "histogram": """
        WITH b AS (
          SELECT CAST(least(greatest(floor(l_extendedprice / 5000.0), 0), 21)
                      AS BIGINT) AS bin
          FROM lineitem WHERE l_extendedprice IS NOT NULL)
        SELECT bin,
               bin * 5000.0 AS lo_edge,
               (bin + 1) * 5000.0 AS hi_edge,
               count(*) AS n
        FROM b GROUP BY bin
    """,
    "profile_table": " UNION ALL ".join(
        _profile_col_sql(c) for c in
        ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")),
    # profile_approx: exact side recomputed by DuckDB; within_tol must
    # hash-match `true` (the in-plan HLL error-bound verdict)
    "profile_approx": " UNION ALL ".join(f"""
        SELECT '{c}' AS "column",
               count(*)::BIGINT AS n,
               count(CASE WHEN {c} IS NULL THEN 1 END)::BIGINT AS n_null,
               count(DISTINCT {c})::BIGINT AS exact_distinct,
               true AS within_tol,
               min({c})::VARCHAR AS min_str,
               max({c})::VARCHAR AS max_str
        FROM lineitem
    """ for c in ("l_orderkey", "l_quantity", "l_returnflag",
                  "l_shipdate")),
    "key_skew": """
        WITH c AS (
          SELECT o_orderpriority::VARCHAR AS key, count(*) AS n
          FROM orders GROUP BY 1),
        t AS (SELECT sum(n) AS total FROM c)
        SELECT key, n, round(n / total, 6) AS share
        FROM c, t ORDER BY n DESC, key ASC LIMIT 5
    """,
    "check_constraints": """
        SELECT 'qty_in_range' AS constraint,
               sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, false)
                        THEN 1 ELSE 0 END)::BIGINT AS n_violations FROM lineitem
        UNION ALL
        SELECT 'price_positive',
               sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false)
                        THEN 1 ELSE 0 END)::BIGINT FROM lineitem
        UNION ALL
        SELECT 'orderkey_not_null',
               sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        FROM lineitem
        UNION ALL
        SELECT 'discount_unit_interval',
               sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, false)
                        THEN 1 ELSE 0 END)::BIGINT FROM lineitem
        UNION ALL
        SELECT 'unique(l_orderkey,l_linenumber)',
               coalesce(sum(n - 1), 0)::BIGINT
        FROM (SELECT count(*) AS n FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    """,
    # strict `> gap` break, 0-based session index per user — mirrors the
    # win_session oracle's gaps-and-islands construction at event grain
    "sessionize": """
        WITH o AS (
          SELECT event_id, user_id, epoch_us(ts) AS tus,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 900000000
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        )
        SELECT event_id, user_id,
               CAST(sum(brk) OVER (PARTITION BY user_id
                                   ORDER BY tus, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1
                    AS BIGINT) AS session_seq
        FROM o
    """,
}
