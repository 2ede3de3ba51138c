"""Correctness-gate query registry.

Each gate module contributes ``QUERIES: dict[str, Callable[(spark, sf_dir)
-> DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the
driver's pre-registered views). ``__spark_entry__.py`` aggregates them.

Conventions (driver compare = row-count + schema + order-insensitive
value-hash, columns sorted by name):
- every computed column aliased IDENTICALLY in Spark and SQL;
- doubles rounded (2-4 dp) on BOTH sides so floating-point accumulation
  order can't flip the hash;
- DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT);
- timestamps never output raw — derive epoch longs / formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from jetro_spark.gate import (
        analytics,
        benchlock,
        hof,
        joins,
        jql,
        llm,
        profiling,
        relational,
        scalars,
        streaming,
        timeseries,
    )

    return (relational, joins, scalars, analytics, timeseries, profiling,
            jql, llm, hof, streaming, benchlock)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
