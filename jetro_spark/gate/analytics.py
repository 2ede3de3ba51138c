"""Gate queries: window/analytics builtins (SURVEY.md §2.6) in relational
mode — lag/lead/rolling/cum/diff/pct_change/zscore/enumerate over events
and lineitem, partitioned + ordered deterministically (ties broken by id)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jetro_spark.operators import (
    with_cum_extreme,
    with_diff,
    with_lag,
    with_lead,
    with_pct_change,
    with_rolling,
    with_zscore,
)
from jetro_spark.session import load_tables
from jetro_spark.timeutil import ts_to_nanos


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, register=False)["events"]
    return ev.select("event_id", "ts", "user_id", "event_type", "value")


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    df = with_lag(ev, "value", 1, order="event_id", partition=["user_id"], alias="prev_value")
    df = with_lead(df, "value", 1, order="event_id", partition=["user_id"], alias="next_value")
    return df.select("event_id", "user_id", "value", "prev_value", "next_value")


def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    df = with_rolling(ev, "value", 3, "avg", order="event_id", partition=["user_id"], alias="ravg")
    df = with_rolling(df, "value", 3, "sum", order="event_id", partition=["user_id"], alias="rsum")
    df = with_rolling(df, "value", 5, "max", order="event_id", partition=["user_id"], alias="rmax")
    return df.select(
        "event_id",
        "user_id",
        F.round("ravg", 4).alias("ravg"),
        F.round("rsum", 4).alias("rsum"),
        F.round("rmax", 4).alias("rmax"),
    )


def q_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    df = with_cum_extreme(ev, "value", "max", order="event_id", partition=["user_id"], alias="cmax")
    df = with_cum_extreme(df, "value", "min", order="event_id", partition=["user_id"], alias="cmin")
    return df.select("event_id", "user_id", "cmax", "cmin")


def q_diff_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    df = with_diff(ev, "value", order="event_id", partition=["user_id"], alias="dv")
    df = with_pct_change(df, "value", order="event_id", partition=["user_id"], alias="pct")
    # dv/pct are SINGLE IEEE ops on parquet doubles — bit-identical in
    # any engine, so they compare raw. Rounding would only reintroduce
    # the Spark-HALF_UP-vs-DuckDB-float divergence on half-way values
    # (hit at sf0.1). Aggregate-derived doubles (win_zscore) still round.
    return df.select("event_id", "user_id", "dv", "pct")


def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    df = with_zscore(ev, "value", partition=["user_id"], alias="z")
    return df.select("event_id", "user_id", F.round("z", 6).alias("z"))


def q_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """enumerate → row index per partition (0-based like jetro)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id", "user_id", (F.row_number().over(w) - 1).cast("long").alias("index")
    )


def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window (batch form): hourly buckets from
    nanosecond epochs — representation-safe across engines AND across
    testdata generations (ts has shipped as both bigint nanos and
    timestamp_ntz; timeutil normalizes either to a nano epoch, matching
    DuckDB's epoch_ns)."""
    ev = _events(spark, sf_dir)
    ns = ts_to_nanos(F.col("ts"), dict(ev.dtypes).get("ts", ""))
    hour = F.floor(ns / F.lit(3_600_000_000_000)).cast("long")
    return ev.groupBy(hour.alias("hour_bucket"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
    )


QUERIES = {
    "win_lag_lead": q_lag_lead,
    "win_rolling": q_rolling,
    "win_cum": q_cum,
    "win_diff_pct": q_diff_pct,
    "win_zscore": q_zscore,
    "win_enumerate": q_enumerate,
    "time_bucket": q_time_bucket,
}

ORACLES = {
    "win_lag_lead": """
        SELECT event_id, user_id, value,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    "win_rolling": """
        SELECT event_id, user_id,
               round(CASE WHEN rn >= 3 THEN avg(value) OVER w3 END, 4) AS ravg,
               round(CASE WHEN rn >= 3 THEN sum(value) OVER w3 END, 4) AS rsum,
               round(CASE WHEN rn >= 5 THEN max(value) OVER w5 END, 4) AS rmax
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
              FROM events)
        WINDOW w3 AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               w5 AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    "win_cum": """
        SELECT event_id, user_id,
               max(value) OVER w AS cmax,
               min(value) OVER w AS cmin
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "win_diff_pct": """
        SELECT event_id, user_id,
               value - lag(value) OVER w AS dv,
               (value - lag(value) OVER w) / nullif(lag(value) OVER w, 0) AS pct
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    "win_zscore": """
        SELECT event_id, user_id,
               round((value - avg(value) OVER w)
                     / nullif(stddev_samp(value) OVER w, 0), 6) AS z
        FROM events WINDOW w AS (PARTITION BY user_id)
    """,
    "win_enumerate": """
        SELECT event_id, user_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
                    AS BIGINT) AS index
        FROM events
    """,
    "time_bucket": """
        SELECT CAST(floor(epoch_ns(ts) / 3600000000000) AS BIGINT) AS hour_bucket,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
}
