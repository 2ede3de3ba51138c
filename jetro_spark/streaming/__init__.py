"""Structured Streaming surface (SURVEY.md §2.13, M8).

The reference is strictly batch/single-document — it has NO streaming
semantics to match (its "streaming pipelines" are pull-based row
streaming inside one query, jetro-core/README.md:130). This module is
the Spark-native extension the brief asks for: event-time windowed
aggregation (tumbling/sliding/session), watermark-based late-data
policy, and a custom stateful operator via applyInPandasWithState.

Every transformation here is defined once and works on BOTH batch and
streaming DataFrames (the Structured Streaming contract): the gate rows
run the batch form against DuckDB oracles; tests/test_streaming.py runs
the same pipelines through readStream → availableNow → memory sink and
checks they agree with batch.

Scale: windowed aggs shuffle once on (window, keys) with partial
aggregation map-side; session windows shuffle on keys; state store
size is bounded by the watermark horizon.
"""

from jetro_spark.streaming.ops import (
    dedup_within_watermark,
    event_time,
    interval_join_streams,
    read_event_stream,
    read_table_stream,
    running_agg_batch,
    running_agg_state,
    session_windowed,
    sliding_windowed,
    tumbling_windowed,
)

__all__ = [
    "dedup_within_watermark",
    "event_time",
    "interval_join_streams",
    "read_event_stream",
    "read_table_stream",
    "running_agg_batch",
    "running_agg_state",
    "session_windowed",
    "sliding_windowed",
    "tumbling_windowed",
]
