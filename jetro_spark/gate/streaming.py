"""Gate queries: streaming-surface operators in their batch form.

Structured Streaming transformations are batch/stream-agnostic, so the
DuckDB oracle checks the windowing SEMANTICS here; the streaming
execution path (readStream → availableNow → memory sink, watermarks,
applyInPandasWithState) is covered by tests/test_streaming.py
batch-parity assertions.

The reference has no streaming surface to match (SURVEY.md §2.13) —
oracles below encode the standard definitions: tumbling = epoch
division, sliding = union of hops covering the event, session =
gaps-and-islands with a strict `> gap` break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from jetro_spark.session import load_tables
from jetro_spark.streaming import (
    dedup_within_watermark,
    interval_join_streams,
    running_agg_batch,
    session_windowed,
    sliding_windowed,
    tumbling_windowed,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, register=False)["events"]


def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_windowed(_events(spark, sf_dir), "1 hour",
                             keys=["event_type"])


def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_windowed(_events(spark, sf_dir), "2 hours", "1 hour",
                            keys=["event_type"])


def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windowed(_events(spark, sf_dir), "15 minutes",
                            keys=["user_id"])


def q_stream_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stateful running aggregate (the streaming form's
    final micro-batch output equals this — asserted in tests)."""
    return running_agg_batch(_events(spark, sf_dir))


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the watermark-bounded streaming dedup; the
    deterministic surface is the surviving key set (see operator
    docstring), so the gate projects the keys. Streaming-path parity:
    tests/test_streaming.py."""
    out = dedup_within_watermark(_events(spark, sf_dir),
                                 ["user_id", "event_type"])
    return out.select("user_id", "event_type")


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the two-sided-watermark stream-stream interval
    join: each click paired with same-user purchases in the preceding
    hour. Streaming-path parity: tests/test_streaming.py."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    j = interval_join_streams(clicks, purchases, on="user_id",
                              lower="INTERVAL 1 HOUR",
                              upper="INTERVAL 0 SECONDS")
    return j.select("event_id", "user_id",
                    F.col("r_event_id").alias("p_event_id"))


QUERIES = {
    "stream_interval_join": q_stream_interval_join,
    "win_tumbling": q_win_tumbling,
    "win_sliding": q_win_sliding,
    "win_session": q_win_session,
    "stream_state": q_stream_state,
    "stream_dedup": q_stream_dedup,
}

ORACLES = {
    "win_tumbling": """
        SELECT epoch(date_trunc('hour', ts))::BIGINT AS win_start,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2
    """,
    # every event belongs to the hops starting at trunc(ts) and
    # trunc(ts) - 1h (width 2h, slide 1h ⇒ 2 windows per event)
    "win_sliding": """
        SELECT epoch(date_trunc('hour', ts) - i * INTERVAL 1 HOUR)::BIGINT
                 AS win_start,
               event_type,
               count(*) AS n
        FROM events, generate_series(0, 1) AS g(i)
        GROUP BY 1, 2
    """,
    # gaps-and-islands: a session breaks when the gap to the previous
    # event (per user) exceeds 15 minutes; session start = first event
    "win_session": """
        WITH o AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 15 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        )
        SELECT epoch_us(min(ts)) AS sess_start, user_id, count(*) AS n
        FROM s GROUP BY user_id, sid
    """,
    "stream_state": """
        SELECT user_id, count(*) AS n, sum(value) AS total,
               max(value) AS vmax
        FROM events GROUP BY user_id
    """,
    "stream_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "stream_interval_join": """
        SELECT c.event_id, c.user_id, p.event_id AS p_event_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts - INTERVAL 1 HOUR
         AND p.ts <= c.ts
    """,
}
