"""Representation-agnostic event-time helpers.

The driver's events table has shipped with two different physical types
for ``ts`` across testdata generations: TIMESTAMP(NANOS) (surfacing as
bigint nano-epochs under spark.sql.legacy.parquet.nanosAsLong) and plain
microsecond TIMESTAMP (surfacing as timestamp_ntz). Operators must not
care — these helpers normalize either representation.

Session timezone is pinned to UTC (session.get_spark), so casting
timestamp_ntz → timestamp is value-identity, which keeps Spark's wall
clock aligned with DuckDB's epoch()/epoch_ns() oracle functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NS_PER_US = 1_000


def _dtype(df: DataFrame, col: str) -> str:
    return dict(df.dtypes).get(col, "")


def ts_to_timestamp(c: Column, dtype: str) -> Column:
    """Any ts representation → TimestampType (LTZ, UTC session).

    bigint nano-epochs use decimal division (nanos ~1.7e18 exceed a
    double's 53-bit mantissa; `/ 1000.0` would round the last µs)."""
    if dtype == "bigint":
        return F.timestamp_micros(
            (c.cast("decimal(38,0)") / F.lit(_NS_PER_US)).cast("long"))
    if dtype == "timestamp_ntz":
        return c.cast("timestamp")
    return c


def ts_to_micros(c: Column, dtype: str) -> Column:
    """Any ts representation → bigint microsecond epoch. bigint input is
    NANOS by repo convention (nanosAsLong) — decimal division, not `/`,
    which would round through double above 2^53."""
    if dtype == "bigint":
        return (c.cast("decimal(38,0)") / F.lit(_NS_PER_US)).cast("long")
    if dtype == "timestamp_ntz":
        c = c.cast("timestamp")
    return F.unix_micros(c)


def ts_to_nanos(c: Column, dtype: str) -> Column:
    """Any ts representation → bigint nanosecond epoch (what DuckDB's
    epoch_ns() reports; sub-µs residue is zero for µs-precision data)."""
    if dtype == "bigint":
        return c
    if dtype == "timestamp_ntz":
        c = c.cast("timestamp")
    return F.unix_micros(c) * F.lit(_NS_PER_US)


def with_event_timestamp(df: DataFrame, col: str, alias: str) -> DataFrame:
    """Attach `alias` = TimestampType view of `col` (any representation)."""
    return df.withColumn(alias, ts_to_timestamp(F.col(col), _dtype(df, col)))
