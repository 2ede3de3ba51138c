"""Data-profiling operators: quantiles, histograms, per-column profiles.

Training-data pipelines gate ingests on distribution checks ("did the
quality score distribution shift?", "are lengths sane?") — these are the
one-pass building blocks, all expression-only and engine-replayable.

Determinism notes:
- ``group_quantiles`` uses the DISCRETE (nearest-lower-rank) definition:
  the value at 0-based sorted position floor((n-1)*p). No interpolation
  arithmetic → the result is an actual data value, bit-identical across
  engines (linear interpolation orders its FP ops differently per engine
  and cannot be hash-compared). One window sort per key group.
- ``histogram`` is a floor-divide bucket + count: one shuffle with
  map-side partials. Out-of-range values clamp into the edge buckets so
  mass is never silently dropped.
- ``profile_table`` aggregates per-column stats in ONE pass over the
  data (count/nulls/min/max + exact distinct per column). Exact distinct
  across C columns costs Spark an expand (C rows per input row) — fine
  for a profile job; at 100 TB flip ``approx=True`` to HLL sketches
  (single pass, no expand) and lose oracle exactness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    *,
    keys: list[str] | None = None,
    tiebreak: str | Column | None = None,
    spread_keys: bool = False,
) -> DataFrame:
    """One row per key group with a column per requested quantile
    (``q{percent}``), discrete definition (see module docstring).
    Nulls are excluded from the ranking. ``tiebreak`` orders equal
    values deterministically (defaults to the value alone — equal values
    are interchangeable for a quantile, so ties never change results).

    ``spread_keys=True`` switches the keyed rank to the keyed
    distributed prefix (operators/prefix): same values, but each key
    group spreads across many partitions instead of one task per key —
    use it when keys are LOW-cardinality over BIG data (a 3-value
    status column at 100 TB makes the default per-key window a 3-task
    straggler). With many small groups the default per-key window is
    the better plan (one shuffle, no offset join)."""
    keys = keys or []
    order = [F.col(value_col).asc()]
    if tiebreak is not None:
        order.append((F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak).asc())
    d = df.filter(F.col(value_col).isNotNull())
    if keys and spread_keys:
        from jetro_spark.operators.prefix import distributed_prefix
        # spread_keys is the caller's explicit low-cardinality
        # declaration — skip the prefix's HLL cardinality probe
        d = distributed_prefix(d, order, F.lit(1), keys=keys,
                               out="__rn", total="__n",
                               max_key_groups=None)
    elif keys:
        w = Window.partitionBy(*keys).orderBy(*order)
        d = (d.withColumn("__rn", F.row_number().over(w) - 1)
             .withColumn("__n", F.count(F.lit(1)).over(
                 Window.partitionBy(*keys))))
    else:
        # global quantiles: two-level distributed rank (range-partition +
        # local window + metadata-sized offsets) — never a
        # single-partition window over the data
        from jetro_spark.operators.prefix import distributed_prefix
        d = distributed_prefix(d, order, F.lit(1), out="__rn", total="__n")
    aggs = []
    for p in ps:
        pos = F.floor((F.col("__n") - 1) * F.lit(p))
        name = f"q{int(round(p * 100))}"
        aggs.append(F.max(F.when(F.col("__rn") == pos, F.col(value_col)))
                    .alias(name))
    return d.groupBy(*keys).agg(*aggs)


def histogram(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Fixed-range histogram: (bin, lo_edge, hi_edge, n). Values below
    ``lo`` land in bin 0, at/above ``hi`` in bin ``bins-1`` (clamped —
    no silent drops); nulls are excluded. Single shuffle."""
    if hi <= lo or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("long")
    return (df.filter(F.col(value_col).isNotNull())
            .groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bin",
                    (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo_edge"),
                    (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi_edge"),
                    "n"))


def check_constraints(
    df: DataFrame,
    checks: dict[str, Column],
    *,
    unique: list[list[str]] | None = None,
) -> DataFrame:
    """Data-contract validation: one output row per constraint with its
    violation count — the ingest gate a pipeline runs before accepting a
    batch. ``checks`` maps name → boolean Column that must hold per row
    (nulls count as violations — an unevaluable constraint is not a
    passing one); ``unique`` lists key tuples that must be unique
    (violations = rows beyond the first per duplicated key).

    Row checks aggregate in ONE pass; when uniqueness checks are
    requested the row checks RIDE the first uniqueness groupBy (r14):
    each violation count distributes exactly over key groups (integer
    sums), so per-group partials re-aggregate to the same totals and
    the row-check pass costs no separate corpus scan — plan subtrees
    are never shared, so the old independent 1-row aggregate re-read
    the whole input. Each further uniqueness tuple keeps its own
    groupBy (one pass per extra tuple)."""
    def _viol(cond: Column) -> Column:
        return F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1)
                     .otherwise(0)).cast("long")

    def _dup_rows(keys: list[str]):
        name = "unique(" + ",".join(keys) + ")"
        return (F.lit(name).alias("constraint"),
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                .cast("long").alias("n_violations"))

    uniq = list(unique or [])
    if uniq:
        # per-group partials for every row check + the group size, one
        # corpus pass total; the outer re-aggregate sees |groups| rows
        # with map-side combine (never a single-task pass)
        per = df.groupBy(*uniq[0]).agg(
            F.count(F.lit(1)).alias("__n"),
            *[_viol(cond).alias(f"__v{i}")
              for i, cond in enumerate(checks.values())])
        rows = [
            F.struct(F.lit(name).alias("constraint"),
                     F.sum(F.col(f"__v{i}")).cast("long")
                     .alias("n_violations"))
            for i, name in enumerate(checks)
        ]
        uname, uviol = _dup_rows(uniq[0])
        rows.append(F.struct(uname, uviol))
        out = per.agg(F.array(*rows).alias("p")) \
            .select(F.explode("p").alias("p")).select("p.*")
    else:
        rows = [
            F.struct(F.lit(name).alias("constraint"),
                     _viol(cond).alias("n_violations"))
            for name, cond in checks.items()
        ]
        out = df.agg(F.array(*rows).alias("p")) \
            .select(F.explode("p").alias("p")).select("p.*")
    for keys in uniq[1:]:
        grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        uname, uviol = _dup_rows(keys)
        dup = grouped.agg(uviol).select(uname, "n_violations")
        out = out.unionByName(dup)
    return out


def key_skew(
    df: DataFrame,
    key: str | Column,
    *,
    top: int = 20,
) -> DataFrame:
    """Skew diagnosis for a prospective shuffle key: the ``top`` heaviest
    keys with count and share of total. Read with salted_join /
    AQE-skew-join in mind: a top share near 1/shuffle_partitions means a
    straggler task. One count shuffle + a broadcast 1-row total."""
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("share", F.col("n") / F.col("__total"))
            .drop("__total")
            .orderBy(F.col("n").desc(), F.col("key").asc())
            .limit(top))


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """Long-format per-column profile: (column, n, n_null, n_distinct,
    min_str, max_str). min/max are stringified so heterogeneous column
    types fit one output schema (profile output is for humans/monitors,
    not further math). ``approx=True`` swaps exact distinct for
    approx_count_distinct — the 100 TB mode (no expand, one pass).
    ``rsd`` is the HLL relative standard deviation (default 1%, tighter
    than Spark's 5% default: a profile job runs once, the extra sketch
    memory is irrelevant next to a mis-read distinct count)."""
    cols = cols or df.columns
    distinct = ((lambda c: F.approx_count_distinct(c, rsd)) if approx
                else F.countDistinct)
    profiles = []
    for c in cols:
        col = F.col(c)
        profiles.append(F.struct(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(col.isNull(), 1)).alias("n_null"),
            distinct(col).cast("long").alias("n_distinct"),
            F.min(col).cast("string").alias("min_str"),
            F.max(col).cast("string").alias("max_str"),
        ))
    one = df.agg(F.array(*profiles).alias("p"))
    return one.select(F.explode("p").alias("p")).select("p.*")
