"""Distributed global prefix aggregation — the scale-safe replacement
for ``Window.partitionBy(F.lit(1))``.

A single-partition window funnels the ENTIRE dataset through one task: a
guaranteed straggler at 100 TB. The classic fix (what RDD
``zipWithIndex`` does with a driver collect, here kept fully lazy and
plan-side) is a two-level prefix:

1. range-repartition by the order key — Spark's RangePartitioner
   guarantees partition ``i`` holds keys ≤ partition ``i+1``'s, so the
   physical partition id IS the coarse global order;
2. a per-partition window (parallel across ``spark.sql.shuffle.
   partitions`` tasks) computes the local running value;
3. per-partition totals — at most P rows, P = shuffle partitions, i.e.
   METADATA, not data — get their own prefix via the only un-partitioned
   window in the plan, ordered by ``__pid``. The plan audit
   (tests/test_plan_audit.py) recognizes exactly this shape: a global
   window is legal only when it orders by ``__pid``;
4. broadcast-join the P-row offset table back and add.

Cost: one range shuffle + one broadcast, instead of one
shuffle-everything-to-one-task. Ties in the order key stay inside one
partition (RangePartitioner never splits equal keys), so callers that
guarantee a unique order key get a fully deterministic prefix.

The KEYED variant (``keys=[...]``) solves the other straggler: a
``Window.partitionBy(key)`` with few distinct keys is one task per key
regardless of cluster size. Range-partitioning on (keys, order) spreads
each key group across many partitions; the per-(partition, key) offset
table is still metadata-sized (≤ P × keys-touching-that-partition rows)
and its prefix window partitions by the keys, so no un-partitioned
window exists in the keyed plan at all.

The spread plan is only right for LOW-cardinality keys, though: the
offset table is up to P × distinct-keys rows, so a high-cardinality key
turns the "metadata" broadcast into gigabytes. There the plain
``Window.partitionBy(keys)`` is the better plan anyway — many distinct
keys means many small groups, i.e. natural parallelism with no
straggler. ``max_key_groups`` guards the boundary: an HLL probe (one
partial-aggregate scan, no shuffle) picks the plain per-key window when
the estimated key count exceeds it. Callers that know their cardinality
skip the probe with ``max_key_groups=None`` (always spread — the
group_quantiles use case: a handful of huge groups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_prefix(
    df: DataFrame,
    order: list[str | Column],
    value: Column,
    *,
    keys: list[str] | None = None,
    out: str = "__prefix",
    inclusive: bool = False,
    total: str | None = None,
    max_key_groups: int | None = 4096,
    key_cardinality: int | None = None,
) -> DataFrame:
    """Add ``out`` = running sum of ``value`` over ``order`` — globally,
    or per key group when ``keys`` is given — without any
    single-task-per-group window (exclusive by default: the sum of
    strict predecessors, 0 for the first row). With ``total`` set, also
    attach the (per-group) grand total as a column of that name.

    ``max_key_groups`` (keyed variant only) bounds the spread plan's
    offset-table broadcast: above it, fall back to the plain per-key
    window — the better plan at high key cardinality (see module
    docstring). ``None`` skips the probe and always spreads.

    ⚠ EAGER PROBE: with ``keys`` and the default ``max_key_groups``,
    this function runs a Spark job AT CALL TIME (one
    ``approx_count_distinct`` partial-aggregate pass over ``df``) to
    pick the plan — for an uncached ``df`` with expensive lineage the
    upstream plan is computed twice. Callers that know their key
    cardinality should pass ``key_cardinality`` (uses the hint, no job)
    or ``max_key_groups=None`` (always spread, no job); otherwise cache
    ``df`` first if its lineage is expensive.
    """
    kcols = [F.col(k) for k in (keys or [])]
    knames = list(keys or [])
    ocols = [F.col(o) if isinstance(o, str) else o for o in order]
    if knames and max_key_groups is not None:
        n_keys = key_cardinality if key_cardinality is not None else df.agg(
            F.approx_count_distinct(F.struct(*kcols)).alias("n")).first()["n"]
        if n_keys > max_key_groups:
            w = (Window.partitionBy(*knames).orderBy(*ocols)
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow if inclusive else -1))
            d = df.withColumn(out, F.coalesce(F.sum(value).over(w),
                                              F.lit(0)))
            if total is not None:
                d = d.withColumn(total, F.sum(value).over(
                    Window.partitionBy(*knames)))
            return d
    d = df.repartitionByRange(*kcols, *ocols).withColumn(
        "__pid", F.spark_partition_id())
    wl = (Window.partitionBy("__pid", *knames).orderBy(*ocols)
          .rowsBetween(Window.unboundedPreceding,
                       Window.currentRow if inclusive else -1))
    d = d.withColumn("__local",
                     F.coalesce(F.sum(value).over(wl), F.lit(0)))
    totals = d.groupBy("__pid", *knames).agg(F.sum(value).alias("__t"))
    wo = (Window.partitionBy(*knames).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)
          if knames else
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(wo), F.lit(0)))
    # name-list joins use null-UNSAFE equality — a NULL key group would
    # silently drop every row; join null-safe and re-project
    o = F.broadcast(offs.select(F.col("__pid").alias("__o_pid"),
                                *[F.col(k).alias(f"__o_{k}") for k in knames],
                                "__off"))
    cond = F.col("__pid") == F.col("__o_pid")
    for k in knames:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__o_{k}"))
    d = (d.join(o, cond)
         .withColumn(out, F.col("__off") + F.col("__local"))
         .drop("__pid", "__local", "__off", "__o_pid",
               *[f"__o_{k}" for k in knames]))
    if total is not None:
        if knames:
            grand = F.broadcast(offs.groupBy(*knames).agg(
                F.coalesce(F.sum("__t"), F.lit(0)).alias(total))
                .select(*[F.col(k).alias(f"__g_{k}") for k in knames], total))
            gcond = F.lit(True)
            for k in knames:
                gcond = gcond & F.col(k).eqNullSafe(F.col(f"__g_{k}"))
            d = d.join(grand, gcond).drop(*[f"__g_{k}" for k in knames])
        else:
            grand = offs.agg(F.coalesce(F.sum("__t"), F.lit(0)).alias(total))
            d = d.crossJoin(F.broadcast(grand))
    return d
