"""Extended join surface: as-of, range, left/semi/anti (SURVEY.md §7.2 M4).

The reference's only join is the inner hash ``equi_join``
(jetro-core/src/builtins/ops/array.rs:489-548); these are the documented
Spark-native extensions a time-series / training-data pipeline needs.

Scale design (100 TB intent):

- ``asof_join`` is the union+window formulation: tag the two sides, union
  them, and resolve each left row's match with ``last(..., ignorenulls)``
  over a window ordered by (time, side). ONE shuffle on the equality keys
  and one sort — no range-condition join, no per-row probe explosion, no
  broadcast requirement on either side. This is the sort-merge shape a
  1000-executor cluster wants; skewed keys fall under AQE like any other
  window.
- ``range_join`` is the binned interval join: each interval replicates to
  the fixed-width bins it spans, each point maps to exactly ONE bin, and
  the pair resolves through an equi-join on (bin [, keys]) plus an exact
  residual predicate. Catalyst would otherwise plan a point-in-interval
  predicate as BroadcastNestedLoopJoin (all-pairs); binning makes it a
  hash join whose replication factor is interval_len / bin_width — pick
  bin_width near the typical interval length. No dedup pass is needed:
  a (point, interval) pair meets in exactly one bin (the point's).
- ``left_join``/``semi_join``/``anti_join`` delegate strategy to
  Catalyst/AQE (broadcast for dimension sides, shuffled hash / sort-merge
  otherwise) and only add jetro's merge semantics on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Convenience units for numeric bin widths over unix_micros() time axes.
SECOND_US = 1_000_000
MINUTE_US = 60 * SECOND_US
HOUR_US = 60 * MINUTE_US
DAY_US = 24 * HOUR_US


def _merge_right_wins(joined: DataFrame, left_cols: list[str],
                      right_cols: list[str], lref: str, rref: str) -> DataFrame:
    """jetro equi_join merge: left fields then right fields, right wins
    on name collision (ops/array.rs:489-548)."""
    out: list[Column] = []
    rset = set(right_cols)
    for c in left_cols:
        if c not in rset:
            out.append(F.col(f"{lref}.{c}").alias(c))
    for c in right_cols:
        out.append(F.col(f"{rref}.{c}").alias(c))
    return joined.select(*out)


def left_join(left: DataFrame, right: DataFrame, lkey: str, rkey: str,
              broadcast_right: bool = False) -> DataFrame:
    """LEFT OUTER variant of jetro's equi_join merge: unmatched left rows
    keep their fields with the right side null; right wins on collision."""
    r = F.broadcast(right) if broadcast_right else right
    j = left.alias("__l").join(
        r.alias("__r"), F.col(f"__l.{lkey}") == F.col(f"__r.{rkey}"), "left")
    return _merge_right_wins(j, left.columns, right.columns, "__l", "__r")


def semi_join(left: DataFrame, right: DataFrame, lkey: str, rkey: str) -> DataFrame:
    """Left rows having at least one key match on the right; left columns
    only — the right side never materializes into the output (Spark plans
    a build-side-only hash join, broadcastable when small)."""
    return left.join(right, left[lkey] == right[rkey], "left_semi")


def anti_join(left: DataFrame, right: DataFrame, lkey: str, rkey: str) -> DataFrame:
    """Left rows with NO key match on the right (NOT EXISTS)."""
    return left.join(right, left[lkey] == right[rkey], "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    lkey: str,
    rkey: str,
    *,
    salt: int = 8,
    broadcast_right: bool = False,
) -> DataFrame:
    """equi_join for SKEWED keys: the left (fact) side adds a
    deterministic row-local salt in [0, salt), the right (dimension) side
    replicates x salt, and the join keys on (key, salt) — a hot key's
    rows spread over ``salt`` reducers instead of one straggler task.

    AQE's skew-join split handles most cases post-shuffle; explicit
    salting still wins when the skewed aggregation FOLLOWS the join (AQE
    can't split a groupBy's hot key) or when AQE is off. The salt derives
    from a hash of the whole left row (not rand()), so retried tasks
    salt identically — nondeterministic salting breaks speculative
    execution and stage retries. Output: jetro right-wins merge, same as
    equi_join; null keys drop (inner semantics).
    """
    lsalt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])),
                   F.lit(salt)).cast("int")
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    if broadcast_right:
        r = F.broadcast(r)
    j = l.alias("__l").join(
        r.alias("__r"),
        (F.col(f"__l.{lkey}") == F.col(f"__r.{rkey}"))
        & (F.col("__l.__salt") == F.col("__r.__salt")),
        "inner")
    return _merge_right_wins(j, left.columns, right.columns, "__l", "__r")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    right_prefix: str = "r_",
    how: str = "inner",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single closest right row sharing
    the ``on`` keys — at-or-before (``backward``, the default), at-or-after
    (``forward``), or closest-either-way (``nearest``, ties broken
    backward).

    Output = every left column, plus every non-key right column renamed
    ``{right_prefix}{name}`` (the right time column included, so callers
    can compute the gap). ``tolerance`` (same units as the time axis:
    an INTERVAL Column for timestamps, a number for numeric axes) drops
    matches farther than the bound. ``how='left'`` keeps unmatched left
    rows with null right fields; ``'inner'`` drops them.

    Determinism: right rows must be unique per (on, right_time), OR
    ``right_tiebreak`` must name a right column unique within duplicate
    timestamps — the row with the MINIMUM tiebreak value wins then
    (implemented as one extra window sort key: no pre-aggregation, no
    extra shuffle). Without either, the winner among equal timestamps is
    partition-order dependent (same contract as the reference's
    right-wins equi_join merge, which keeps whichever duplicate arrives
    last).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left: {how}")

    rpay_cols = [c for c in right.columns if c not in on]
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    rpay = F.struct(*[F.col(c) for c in rpay_cols]).alias("__r")

    l_t = F.col(left_time)
    r_t = F.col(right_time)
    ltyped = left.select(*on, l_t.alias("__t"), F.lit(1).alias("__side"), lpay)
    rtyped = right.select(*on, r_t.alias("__t"), F.lit(0).alias("__side"), rpay)
    # unionByName(allowMissingColumns) nulls the absent payload struct on
    # each side with the correct struct type — no manual null literals.
    u = ltyped.unionByName(rtyped, allowMissingColumns=True)

    def resolved(desc: bool) -> Column:
        # side orders right (0) before left (1) at equal timestamps in
        # BOTH directions, so "at-or-before"/"at-or-after" include equality.
        order = [F.col("__t").desc() if desc else F.col("__t").asc(),
                 F.col("__side").asc()]
        if right_tiebreak is not None:
            # last() picks the final row of the frame, so DESCENDING
            # tiebreak makes the minimum win among duplicate timestamps;
            # nulls_first so a null tiebreak can never win (left rows'
            # null __r makes their tiebreak null — ordering among left
            # rows is irrelevant, each frame ends at the row itself)
            order.append(F.col(f"__r.{right_tiebreak}").desc_nulls_first())
        w = (Window.partitionBy(*on).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return F.last("__r", ignorenulls=True).over(w)

    if direction == "backward":
        u = u.withColumn("__m", resolved(desc=False))
    elif direction == "forward":
        u = u.withColumn("__m", resolved(desc=True))
    else:  # nearest: both passes share the partitioning; pick the closer
        u = (u.withColumn("__mb", resolved(desc=False))
             .withColumn("__mf", resolved(desc=True)))
        back_gap = F.col("__t") - F.col("__mb")[right_time]
        fwd_gap = F.col("__mf")[right_time] - F.col("__t")
        u = u.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(fwd_gap < back_gap, F.col("__mf"))
            .otherwise(F.col("__mb")),  # tie → backward
        )

    out = u.filter(F.col("__side") == 1)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        gap = F.abs(F.col("__t") - F.col("__m")[right_time]) if direction == "nearest" else (
            F.col("__m")[right_time] - F.col("__t") if direction == "forward"
            else F.col("__t") - F.col("__m")[right_time])
        out = out.withColumn("__m", F.when(gap <= tol, F.col("__m")))
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())

    cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rpay_cols]
    return out.select(*cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    on: list[str] | None = None,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: pair each points row with every intervals
    row where ``start <= point < end`` (and the optional ``on`` keys
    match). Time axes may be numeric or timestamp (timestamps compare on
    unix_micros; ``bin_width`` is then in microseconds — see the
    SECOND_US/HOUR_US/DAY_US constants).

    Intervals with ``end <= start`` are empty by the half-open contract
    and are dropped (they would otherwise make F.sequence run backward).
    Output = point columns then interval columns, right wins on collision
    (equi_join merge semantics).
    """
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    on = on or []

    def axis(df: DataFrame, colname: str) -> Column:
        dt = dict(df.dtypes).get(colname, "")
        c = F.col(colname)
        if dt.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp"))
        return c

    p_num = axis(points, point)
    s_num = axis(intervals, start)
    e_num = axis(intervals, end)

    pts = points.withColumn("__bin", F.floor(p_num / F.lit(bin_width)))
    ivl = (intervals
           .filter(e_num > s_num)
           .withColumn("__bins", F.sequence(F.floor(s_num / F.lit(bin_width)),
                                            F.floor(e_num / F.lit(bin_width)))))
    ivl = ivl.select(*intervals.columns, F.explode("__bins").alias("__bin"))

    j = pts.alias("__p").join(ivl.alias("__i"), ["__bin", *on], "inner")
    # Residual predicate on the original columns (exact, bins are only a
    # pruning key). Re-derive numeric forms against the joined frame.
    p_j = F.col(f"__p.{point}")
    s_j = F.col(f"__i.{start}")
    e_j = F.col(f"__i.{end}")
    if dict(points.dtypes).get(point, "").startswith("timestamp"):
        p_j = F.unix_micros(p_j.cast("timestamp"))
    if dict(intervals.dtypes).get(start, "").startswith("timestamp"):
        s_j = F.unix_micros(s_j.cast("timestamp"))
    if dict(intervals.dtypes).get(end, "").startswith("timestamp"):
        e_j = F.unix_micros(e_j.cast("timestamp"))
    j = j.filter((s_j <= p_j) & (p_j < e_j))
    return _merge_right_wins(j, points.columns, [c for c in intervals.columns],
                             "__p", "__i")
