"""Gate queries: time-series rollup/gap-fill (operators/timeseries.py)
and deterministic sampling/splits (llm/sampling.py).

The sampling oracles reproduce Spark's md5-bucket assignment in DuckDB
digit-by-digit (both engines emit identical md5 hex; the hex→int decode
is a strpos polynomial, same trick as the LSH oracle in gate/llm.py), so
split/sample membership is hash-checked exactly — the property that makes
these splits trustworthy across engines is itself what the gate verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.llm.packing import pack_by_cumsum
from jetro_spark.llm.sampling import (cap_per_key, hash_split,
                                      weighted_hash_sample,
                                      stratified_hash_sample)
from jetro_spark.operators.timeseries import HOUR_US, rollup_gapfill
from jetro_spark.session import load_tables
from jetro_spark.timeutil import ts_to_timestamp


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Tables with events.ts normalized to TimestampType —
    representation-safe across testdata generations (bigint nano-epochs
    under nanosAsLong, or µs timestamps); the timeseries operators take
    timestamps or raw-µs axes, never raw nanos."""
    dfs = load_tables(spark, sf_dir, register=False)
    out = []
    for n in names:
        df = dfs[n]
        dt = dict(df.dtypes).get("ts")
        if dt is not None:
            df = df.withColumn("ts", ts_to_timestamp(F.col("ts"), dt))
        out.append(df)
    return out


# --- hourly rollup per event_type, zero-filled counts + locf'd totals -------
def q_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _t(spark, sf_dir, "events")
    out = rollup_gapfill(
        ev,
        time_col="ts",
        width_us=HOUR_US,
        keys=["event_type"],
        aggs={
            "n": F.count(F.lit(1)),
            "total": F.sum(F.col("value").cast("decimal(28,6)")).cast("double"),
        },
        fill={"n": "zero", "total": "locf"},
    )
    return out.select(
        "event_type", "bucket", "bucket_start_us",
        F.col("n").cast("long").alias("n"),
        F.round("total", 4).alias("total"),
    )


# --- deterministic train/val/test split of documents ------------------------
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _t(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42)
    return out.select("doc_id", "lang", "split")


# --- per-source stratified downsampling -------------------------------------
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _t(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        docs, "doc_id", "lang",
        {"en": 0.25, "zh": 0.75}, seed=7, default_fraction=0.5)
    return out.select("doc_id", "lang", "source")


# --- per-source document cap (host-cap corpus policy) -----------------------
def q_cap_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep ≤10 documents per source, chosen by md5 rank — the
    C4/RefinedWeb-style host cap as a deterministic per-group uniform
    sample (llm/sampling.py cap_per_key). The oracle replays the md5
    ranking verbatim, so WHICH rows survive is hash-checked, not just
    how many."""
    (docs,) = _t(spark, sf_dir, "documents")
    out = cap_per_key(docs, "source", 10, id_col="doc_id", seed=42)
    return out.select("doc_id", "source", "lang")


# --- weighted sampling (Efraimidis-Spirakis A-ES, hash-derived) -------------
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 documents per language drawn WITHOUT replacement with
    probability proportional to length (llm/sampling.py
    weighted_hash_sample): rank by ln(u)/w with u md5-derived. The
    oracle recomputes the A-ES keys from the same md5 stream and
    re-ranks — WHICH rows are drawn is hash-checked exactly."""
    (docs,) = _t(spark, sf_dir, "documents")
    out = weighted_hash_sample(docs, 20, "n_chars",
                               strata_col="lang", seed=42)
    return out.select("doc_id", "lang", "n_chars")


# --- sequence packing (cumsum strategy; n_chars as the token proxy) ---------
def q_pack_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _t(spark, sf_dir, "documents")
    out = pack_by_cumsum(docs, "n_chars", 8192, order="doc_id")
    return out.select("doc_id", "n_chars", "pack_id", "pack_offset")


QUERIES = {
    "rollup_gapfill": q_rollup_gapfill,
    "hash_split": q_hash_split,
    "stratified_sample": q_stratified_sample,
    "cap_per_key": q_cap_per_key,
    "weighted_sample": q_weighted_sample,
    "pack_cumsum": q_pack_cumsum,
}

# frac = first-8-hex-chars(md5("{key}:{seed}")) / 16^8, decoded via a
# strpos polynomial (DuckDB has no hex→int conv); exact for 32-bit values.
_FRAC = """(CAST(list_sum([(strpos('0123456789abcdef',
                     substr(substr(md5(doc_id::VARCHAR || ':{seed}'), 1, 8), i, 1)) - 1)
                     * 16**(8-i) for i in generate_series(1, 8)]) AS BIGINT)
            / 4294967296.0)"""

ORACLES = {
    "rollup_gapfill": """
        WITH b AS (
          SELECT event_type,
                 CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket,
                 count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
          FROM events GROUP BY 1, 2),
        span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b),
        grid AS (
          SELECT et.event_type, gs.bucket
          FROM (SELECT DISTINCT event_type FROM events) et
          CROSS JOIN (SELECT unnest(generate_series(
                        (SELECT lo FROM span), (SELECT hi FROM span))) AS bucket) gs),
        dense AS (
          SELECT grid.event_type, grid.bucket, b.n, b.total
          FROM grid LEFT JOIN b USING (event_type, bucket))
        SELECT event_type, bucket,
               bucket * 3600000000 AS bucket_start_us,
               CAST(coalesce(n, 0) AS BIGINT) AS n,
               round(last_value(total IGNORE NULLS)
                     OVER (PARTITION BY event_type ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     4) AS total
        FROM dense
    """,
    "hash_split": f"""
        SELECT doc_id, lang,
               CASE WHEN {_FRAC.format(seed=42)} < 0.8 THEN 'train'
                    WHEN {_FRAC.format(seed=42)} < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_FRAC.format(seed=7)} <
              CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.75 ELSE 0.5 END
    """,
    # rank within source by the md5 fraction (same order as the integer
    # bucket Spark ranks by — a positive constant divisor), doc_id ties
    "cap_per_key": f"""
        SELECT doc_id, source, lang FROM (
          SELECT doc_id, source, lang,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY {_FRAC.format(seed=42)} ASC,
                                             doc_id ASC) AS rn
          FROM documents)
        WHERE rn <= 10
    """,
    # A-ES key ln(u)/w with u = (md5int+1)/2^32 — both the +1 shift and
    # the power-of-two division are float-EXACT, so the only inexact
    # step (ln) sees identical doubles in both engines; ranking (not
    # rounding) tolerates the residual 1-ulp libm divergence
    "weighted_sample": f"""
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ln(({_FRAC.format(seed=42)}
                                * 4294967296.0 + 1) / 4294967296.0)
                            / CAST(n_chars AS DOUBLE) DESC,
                            doc_id ASC) AS rn
          FROM documents
          WHERE n_chars IS NOT NULL AND n_chars > 0)
        WHERE rn <= 20
    """,
    "pack_cumsum": """
        SELECT doc_id, n_chars,
               CAST(coalesce(sum(n_chars) OVER w, 0) // 8192 AS BIGINT)
                 AS pack_id,
               CAST(coalesce(sum(n_chars) OVER w, 0) % 8192 AS BIGINT)
                 AS pack_offset
        FROM documents
        WINDOW w AS (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
}
