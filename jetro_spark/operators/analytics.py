"""Relational window analytics (SURVEY.md §2.6).

Jetro's analytics builtins are positional over one array; relationally they
become Spark ``Window`` functions partitioned by a caller-chosen key and
ordered by a caller-chosen column — which is exactly how they scale: each
partition's window state stays on one executor, no driver materialisation.

Reference implementations: jetro-core/src/builtins/ops/collection.rs
(lag/lead :227-249, rolling :124-226, cum :278-321, diff :250-263,
pct_change :264-277, zscore :322-343).
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _win(partition: list[str] | None, order: str | Column):
    o = F.col(order) if isinstance(order, str) else order
    if not partition:
        # A global Window.orderBy funnels the whole input through ONE task —
        # fine for a small document array, a scale-killer on a table. Callers
        # on table-backed data must pass `partition`.
        warnings.warn(
            "unpartitioned window: all rows flow through a single task; "
            "pass partition=[...] for table-scale inputs",
            stacklevel=3,
        )
        return Window.orderBy(o)
    return Window.partitionBy(*partition).orderBy(o)


def with_lag(df: DataFrame, col: str, n: int = 1, *, order: str,
             partition: list[str] | None = None, alias: str | None = None) -> DataFrame:
    return df.withColumn(alias or f"{col}_lag{n}", F.lag(col, n).over(_win(partition, order)))


def with_lead(df: DataFrame, col: str, n: int = 1, *, order: str,
              partition: list[str] | None = None, alias: str | None = None) -> DataFrame:
    return df.withColumn(alias or f"{col}_lead{n}", F.lead(col, n).over(_win(partition, order)))


def with_rolling(df: DataFrame, col: str, n: int, agg: str, *, order: str,
                 partition: list[str] | None = None, alias: str | None = None) -> DataFrame:
    """rolling_{sum,avg,min,max}(n): null until the window is full
    (jetro emits null for the first n-1 rows, collection.rs:124-226)."""
    w = _win(partition, order).rowsBetween(-(n - 1), 0)
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[agg]
    rn = F.row_number().over(_win(partition, order))
    val = F.when(rn >= n, fn(F.col(col)).over(w)).otherwise(F.lit(None))
    return df.withColumn(alias or f"{col}_rolling_{agg}{n}", val)


def with_cum_extreme(df: DataFrame, col: str, agg: str, *, order: str,
                     partition: list[str] | None = None, alias: str | None = None) -> DataFrame:
    """cum_max / cum_min. Reference: collection.rs:278-321."""
    w = _win(partition, order).rowsBetween(Window.unboundedPreceding, 0)
    fn = {"max": F.max, "min": F.min}[agg]
    return df.withColumn(alias or f"{col}_cum_{agg}", fn(F.col(col)).over(w))


def with_diff(df: DataFrame, col: str, *, order: str,
              partition: list[str] | None = None, alias: str | None = None) -> DataFrame:
    """First differences. Reference: collection.rs:250-263."""
    w = _win(partition, order)
    return df.withColumn(alias or f"{col}_diff", F.col(col) - F.lag(col, 1).over(w))


def with_pct_change(df: DataFrame, col: str, *, order: str,
                    partition: list[str] | None = None, alias: str | None = None) -> DataFrame:
    """Reference: collection.rs:264-277. try_divide, not `/`: the
    reference guards prev == 0 → null (the doc-mode builtin already
    does), and bare division ANSI-throws on a zero previous value —
    caught at sf0.1 where the events table actually contains one."""
    w = _win(partition, order)
    prev = F.lag(col, 1).over(w)
    return df.withColumn(
        alias or f"{col}_pct_change",
        F.try_divide((F.col(col) - prev).cast("double"), prev.cast("double")),
    )


def with_zscore(df: DataFrame, col: str, *, partition: list[str] | None = None,
                alias: str | None = None) -> DataFrame:
    """(x-mean)/sample-stddev over the partition (whole frame if none).
    Reference: collection.rs:322-343."""
    if partition:
        w = Window.partitionBy(*partition)
    else:
        warnings.warn(
            "unpartitioned window: all rows flow through a single task; "
            "pass partition=[...] for table-scale inputs",
            stacklevel=2,
        )
        w = Window.partitionBy()
    mean = F.avg(col).over(w)
    sd = F.stddev_samp(col).over(w)
    # try_divide: an all-equal partition has sd = 0 and bare division
    # ANSI-throws; NULL matches the SQL oracle's divide-by-zero result
    return df.withColumn(alias or f"{col}_zscore",
                         F.try_divide(F.col(col) - mean, sd))
