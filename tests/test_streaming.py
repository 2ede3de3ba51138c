"""Streaming execution path: the same pipelines the gate checks in batch
run here through readStream → Trigger.AvailableNow → memory sink, and
must agree with the batch answer (Structured Streaming batch-parity).
Also covers watermark config and the applyInPandasWithState operator."""

from __future__ import annotations

import uuid

import pytest

from jetro_spark.session import load_tables
from jetro_spark.streaming import (
    read_event_stream,
    running_agg_batch,
    running_agg_state,
    session_windowed,
    tumbling_windowed,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(sdf, name: str, mode: str = "complete"):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_tables(spark, SF, register=False)["events"]


def _rows(spark, name):
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_stream_tumbling_parity(spark, events_batch):
    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, SF)
    out = tumbling_windowed(stream, "1 hour", keys=["event_type"],
                            watermark="2 hours")
    _run_to_memory(out, name)
    batch = {tuple(r) for r in
             tumbling_windowed(events_batch, "1 hour",
                               keys=["event_type"]).collect()}
    assert _rows(spark, name) == batch
    assert len(batch) > 0


def test_stream_session_parity(spark, events_batch):
    name = f"s_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, SF)
    out = session_windowed(stream, "15 minutes", keys=["user_id"],
                           watermark="1 hour")
    _run_to_memory(out, name)
    batch = {tuple(r) for r in
             session_windowed(events_batch, "15 minutes",
                              keys=["user_id"]).collect()}
    assert _rows(spark, name) == batch


def test_stream_stateful_running_agg(spark, events_batch):
    name = f"st_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, SF)
    out = running_agg_state(stream)
    _run_to_memory(out, name, mode="update")
    # the LAST update per key equals the batch aggregate; with a single
    # availableNow batch over one file there is exactly one update per key
    got = {r["user_id"]: (r["n"], round(r["total"], 6), r["vmax"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {r["user_id"]: (r["n"], round(r["total"], 6), r["vmax"])
            for r in running_agg_batch(events_batch).collect()}
    assert got == want
    assert len(want) > 0


def test_watermark_is_set(spark):
    stream = read_event_stream(spark, SF)
    out = tumbling_windowed(stream, "1 hour", watermark="30 minutes")
    # watermark node present in the analyzed streaming plan
    assert "watermark" in out._jdf.queryExecution().analyzed().toString().lower()


def test_stream_dedup_parity_and_bounded_state(spark, events_batch):
    from jetro_spark.streaming import dedup_within_watermark
    name = f"d_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, SF)
    out = dedup_within_watermark(stream, ["user_id", "event_type"],
                                 watermark="2 hours")
    # append mode: dropDuplicatesWithinWatermark emits each key once
    _run_to_memory(out.select("user_id", "event_type"), name, mode="append")
    got = _rows(spark, name)
    batch = {(r["user_id"], r["event_type"]) for r in
             dedup_within_watermark(events_batch, ["user_id", "event_type"])
             .select("user_id", "event_type").collect()}
    assert got == batch and len(batch) > 0


def test_stream_interval_join_parity(spark, events_batch):
    from pyspark.sql import functions as F
    from jetro_spark.streaming import interval_join_streams

    def split(df):
        c = df.filter(F.col("event_type") == "click") \
            .select("event_id", "user_id", "ts")
        p = df.filter(F.col("event_type") == "purchase") \
            .select("event_id", "user_id", "ts")
        return c, p

    name = f"ij_{uuid.uuid4().hex[:8]}"
    sc, sp = split(read_event_stream(spark, SF))
    out = interval_join_streams(sc, sp, on="user_id",
                                lower="INTERVAL 1 HOUR",
                                upper="INTERVAL 0 SECONDS")
    _run_to_memory(out.select("event_id", "r_event_id"), name, mode="append")
    got = _rows(spark, name)
    bc, bp = split(events_batch)
    batch = {(r["event_id"], r["r_event_id"]) for r in
             interval_join_streams(bc, bp, on="user_id",
                                   lower="INTERVAL 1 HOUR",
                                   upper="INTERVAL 0 SECONDS")
             .select("event_id", "r_event_id").collect()}
    assert got == batch and len(batch) > 0


def test_stream_quality_filters_parity(spark):
    """The round-7 corpus-quality operators are row-local expression
    maps, so the SAME plan must run unchanged under readStream and
    agree with batch exactly — the stream-safe contract for scan-time
    corpus filtering (no state, no watermark needed)."""
    from pyspark.sql import functions as F

    from jetro_spark.llm import text as TX
    from jetro_spark.streaming import read_table_stream

    def pipeline(df):
        g = TX.gopher_rules(F.col("text"))
        return df.select(
            "doc_id",
            g.getField("passes").alias("gopher_pass"),
            TX.top_ngram_char_mass(F.col("text"), 2).alias("top2"),
            TX.dup_ngram_char_mass(F.col("text"), 2).alias("dup2"),
        )

    batch = pipeline(load_tables(spark, SF, register=False)["documents"])
    name = f"qf_{uuid.uuid4().hex[:8]}"
    _run_to_memory(pipeline(read_table_stream(spark, SF, "documents")),
                   name, mode="append")
    got = _rows(spark, name)
    want = {tuple(r) for r in batch.collect()}
    assert got == want
