"""Hypertable-style rollup with gap filling (continuous-aggregate shape).

``rollup_gapfill`` buckets an event-time axis to fixed windows, aggregates
per (keys, bucket), then densifies: every key gets a row for EVERY bucket
in the observed span, with missing buckets filled by policy — ``null``
(default), ``zero``, or ``locf`` (last observation carried forward).

Scale design (100 TB intent):
- The rollup is one shuffle (groupBy keys+bucket with map-side partials).
- The dense grid is |distinct keys| x |buckets| — metadata-sized relative
  to the input (the whole point of a rollup); it builds from a distinct
  on the keys and ONE global min/max aggregate (broadcast, 1 row), then a
  ``sequence``+explode — no driver collect.
- The grid→rollup join keys on (keys, bucket): Catalyst broadcasts the
  grid when small, otherwise shuffles both sides on the same key — never
  the raw events again.
- ``locf`` adds one window (same key partitioning as the rollup shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from jetro_spark.operators.joins import DAY_US, HOUR_US, MINUTE_US, SECOND_US  # noqa: F401 (re-export)
from jetro_spark.timeutil import ts_to_micros


def time_bucket(c: Column, dtype: str, width_us: int) -> Column:
    """Bucket index (long) of a time value: floor(epoch_micros / width).

    Timestamp columns convert to epoch micros; NUMERIC columns are taken
    as a raw MICROSECOND axis as-is. A bigint nano-epoch column (the
    nanosAsLong parquet representation) must be normalized first —
    timeutil.ts_to_micros / with_event_timestamp — as the gate queries
    do; feeding raw nanos here buckets 1000x too fine."""
    if dtype.startswith("timestamp"):
        return F.floor(ts_to_micros(c, dtype) / F.lit(width_us)).cast("long")
    return F.floor(c / F.lit(width_us)).cast("long")


def sessionize(
    df: DataFrame,
    *,
    time_col: str,
    gap_us: int,
    keys: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign a session id to EVERY EVENT (gaps-and-islands): a new
    session starts when the gap to the key's previous event exceeds
    ``gap_us``. Complements the session_window AGGREGATE (which emits one
    row per session) when downstream needs event-grained session joins —
    e.g. "attach the session's first utm tag to each event".

    Output adds ``session_seq`` (0-based per key, by time) — sessions are
    one window pass over the key partitioning: lag → break flag → running
    sum. Deterministic given (time, tiebreak) uniqueness per key."""
    dt = dict(df.dtypes).get(time_col, "")
    # µs epoch: timestamps convert; numeric axes taken as µs (see
    # time_bucket docstring — normalize bigint nano-epochs upstream)
    t = time_bucket(F.col(time_col), dt, 1)
    order = [t.asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(t).over(w)
    brk = F.when(prev.isNull() | ((t - prev) > F.lit(gap_us)), 1).otherwise(0)
    run = (Window.partitionBy(*keys).orderBy(*order)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # two projections: a window function (lag) can't nest inside another
    # window aggregate's argument — same partitioning, so still one sort
    return (df.withColumn("__brk", brk)
            .withColumn("session_seq",
                        (F.sum("__brk").over(run) - 1).cast("long"))
            .drop("__brk"))


def rollup_gapfill(
    df: DataFrame,
    *,
    time_col: str,
    width_us: int,
    keys: list[str],
    aggs: dict[str, Column],
    fill: dict[str, str] | None = None,
    max_grid_rows: int | None = 100_000_000,
) -> DataFrame:
    """Windowed rollup densified over the observed span.

    ``aggs`` maps output name → aggregate Column; ``fill`` maps output
    name → 'null' | 'zero' | 'locf'. Output columns: *keys, ``bucket``
    (long index), ``bucket_start_us`` (epoch µs), then the aggregates.
    The span is GLOBAL (min..max bucket over the whole input), matching
    a dashboard's contiguous x-axis; keys absent near the edges still
    get edge rows (null/zero/locf-filled).

    ``max_grid_rows`` (r10): the densification grid is
    |distinct keys| × |buckets| by DEFINITION — gapfill materializes a
    row per (key, bucket) cell whether or not data exists there. That
    grid is this operator's scale cliff: high-cardinality keys over a
    long span silently build a huge intermediate. The guard counts both
    sides up front (one cheap distinct-count + one min/max aggregate —
    metadata-sized, SCALE.md 'declared collects') and REFUSES past the
    bound with the actual numbers, so a forgotten user-id-keyed gapfill
    over a year of events fails loudly instead of OOMing the cluster.
    Pass ``None`` to disable (the cardinality pre-count too).
    """
    fill = fill or {}
    bad = set(fill) - set(aggs)
    if bad:
        raise ValueError(f"fill policies for unknown aggregates: {sorted(bad)}")
    if max_grid_rows is not None:
        dt0 = dict(df.dtypes).get(time_col, "")
        b0 = df.select(time_bucket(F.col(time_col), dt0, width_us)
                       .alias("__b"))
        parts = [F.countDistinct(*[F.col(k) for k in keys]).alias("__nk")] \
            if keys else [F.lit(1).alias("__nk")]
        stats = b0.agg((F.max("__b") - F.min("__b") + 1).alias("__nb")) \
            .crossJoin(df.agg(*parts)).first()
        n_grid = (stats["__nb"] or 0) * (stats["__nk"] or 0)
        if n_grid > max_grid_rows:
            raise ValueError(
                f"rollup_gapfill grid is {stats['__nk']} keys x "
                f"{stats['__nb']} buckets = {n_grid} rows, over the "
                f"max_grid_rows bound ({max_grid_rows}); widen the "
                "bucket, reduce key cardinality, or raise/disable the "
                "bound explicitly")

    dt = dict(df.dtypes).get(time_col, "")
    bucketed = df.withColumn("bucket", time_bucket(F.col(time_col), dt, width_us))
    rolled = bucketed.groupBy(*keys, "bucket").agg(
        *[c.alias(name) for name, c in aggs.items()])

    span = bucketed.agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
    buckets = span.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket"))
    grid = df.select(*keys).distinct().crossJoin(buckets) if keys else buckets

    dense = grid.join(rolled, [*keys, "bucket"], "left")

    out_cols: dict[str, Column] = {}
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1)))
    w = w.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for name in aggs:
        c = F.col(name)
        policy = fill.get(name, "null")
        if policy == "zero":
            out_cols[name] = F.coalesce(c, F.lit(0))
        elif policy == "locf":
            out_cols[name] = F.last(c, ignorenulls=True).over(w)
        elif policy == "null":
            out_cols[name] = c
        else:
            raise ValueError(f"unknown fill policy {policy!r} for {name!r}")

    return dense.select(
        *keys,
        F.col("bucket"),
        (F.col("bucket") * F.lit(width_us)).alias("bucket_start_us"),
        *[c.alias(name) for name, c in out_cols.items()],
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    within_us: int | None = None,
    within: str = "start",
    mode: str = "ordered",
) -> DataFrame:
    """Conversion funnel: per user, step i matches at the EARLIEST
    event of ``steps[i]`` strictly after step i-1's matched time
    (step 0 = the user's earliest step-0 event). The standard
    product-analytics funnel (strictly-increasing-time variant).

    ``within_us`` bounds later steps; ``within`` picks the anchor (r9):
    - ``"start"``: every later step lands within ``within_us`` of the
      STEP-0 match (the whole funnel fits one window);
    - ``"step"``: every step lands within ``within_us`` of the
      PREVIOUS step's match (per-step conversion windows).

    ``mode="unordered"`` (r9) is set-completion instead: step i
    matches at the user's earliest event of ``steps[i]`` regardless of
    order; ``steps_completed`` counts matched steps (not a prefix
    chain); with ``within_us``, a step only counts inside
    ``within_us`` of the user's FIRST funnel-type event (``within``
    is ignored — there is no step chain to anchor on).

    Returns one row per user having at least one event of a funnel
    type: ``(user_col, steps_completed, t0..t{k-1})`` — ti = matched
    epoch micros (ordered mode: null from the first unmatched step
    on; unordered mode: null per absent step).

    Scale: events filter to the funnel types FIRST (a pushdown-able
    predicate — at 100 TB the scan prunes everything else), then ONE
    groupBy(user) collects each step's sorted time list; the
    first-after-previous scan is a row-local array fold. State per user
    is its funnel-type event times only. No joins, no per-step passes,
    no window over an unpartitioned axis.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if within not in ("start", "step"):
        raise ValueError(f"within must be 'start' or 'step', got {within!r}")
    if mode not in ("ordered", "unordered"):
        raise ValueError(
            f"mode must be 'ordered' or 'unordered', got {mode!r}")
    dt = dict(events.dtypes).get(time_col, "")
    # same axis convention as time_bucket: timestamps → epoch micros,
    # NUMERIC columns taken as a raw µs axis as-is (bigint nano-epochs
    # normalize upstream via timeutil, as the gate queries do)
    us = (ts_to_micros(F.col(time_col), dt)
          if dt.startswith("timestamp") else F.col(time_col).cast("long"))
    ev = events.filter(F.col(type_col).isin(*steps))
    grouped = ev.groupBy(user_col).agg(*[
        F.sort_array(F.collect_list(
            F.when(F.col(type_col) == s, us))).alias(f"__a{i}")
        for i, s in enumerate(steps)])
    if mode == "unordered":
        # set completion: earliest event per step, independent of
        # order; the optional window anchors on the user's FIRST
        # funnel-type event (the min over every step's earliest)
        anchor = F.least(*[F.get(f"__a{i}", 0) for i in range(len(steps))])
        out = grouped
        for i in range(len(steps)):
            t = F.get(f"__a{i}", 0)
            if within_us is not None:
                t = F.get(F.filter(
                    F.col(f"__a{i}"),
                    (lambda a: (lambda x: x <= a + within_us))(anchor)), 0)
            out = out.withColumn(f"__t{i}", t)
        done: Column = sum(
            (F.col(f"__t{j}").isNotNull().cast("int")
             for j in range(len(steps))), F.lit(0))
        return out.select(
            F.col(user_col),
            done.cast("int").alias("steps_completed"),
            *[F.col(f"__t{i}").alias(f"t{i}") for i in range(len(steps))])
    # F.get: null on empty/out-of-range (element_at THROWS under ANSI)
    out = grouped.withColumn("__t0", F.get("__a0", 0))
    for i in range(1, len(steps)):
        prev = F.col(f"__t{i - 1}")
        cond = (lambda p: (lambda x: x > p))(prev)
        if within_us is not None:
            bound = (F.col("__t0") if within == "start" else prev)
            cond = (lambda p, b: (lambda x: (x > p)
                    & (x <= b + within_us)))(prev, bound)
        out = out.withColumn(
            f"__t{i}",
            F.get(F.filter(F.col(f"__a{i}"), cond), 0))
    # deepest matched step wins; the chain nulls forward (t_j non-null
    # implies t_0..t_j all matched), so test from the last step down
    done = F.lit(0)
    for j in range(len(steps)):
        done = F.when(F.col(f"__t{j}").isNotNull(), j + 1).otherwise(done)
    return out.select(
        F.col(user_col),
        done.cast("int").alias("steps_completed"),
        *[F.col(f"__t{i}").alias(f"t{i}") for i in range(len(steps))])
