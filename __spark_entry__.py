"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``    — one entry per implemented operator (SURVEY.md §2),
                   each callable (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — per-query DuckDB ANSI SQL equivalents.

Implementations live in ``jetro_spark.gate`` (one module per operator
family); this file only aggregates.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-way join + group + aggregate (TPC-H Q3/Q5 shape) through
    jetro_spark operators on /root/testdata/sf0.001."""
    from jetro_spark.gate.relational import q_join3_revenue

    return q_join3_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jetro_spark.gate import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from jetro_spark.gate import all_oracles

    return all_oracles()
