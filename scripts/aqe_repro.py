"""Raw (engine-free) repro of the Spark 4.1 AQE Sort+GlobalLimit-above-
Union drop (the r12 soak catch). Replicates, in raw DataFrame calls,
the ANALYZED PLAN the pre-r12 engine (commit f5a411b^) produced for

    $.s.sort(k).skip(4).equi_join($.d.sort(v), "k", "k").min_by(v)

— the expression whose collect() flakily returned the min_by winner AND
the scalar-null pad row while count() said 1, because AQE
re-optimization dropped the top-level Sort+GlobalLimit above the Union
after the first-element-null probe branch materialized empty.

Shape (all ingredients required; removing any one made the r12 repro
pass): receiver sorted null-first on (k, monotonic id) with an Offset
ABOVE the sort; eqNullSafe broadcast-eligible join against a side
sorted on (v, monotonic id) that adds a second post-sort monotonic id;
right-wins merge; per-branch re-derived subtrees (union dedup
renumbers); nested union-of-limits — [probe: sort x2 -> limit 1 ->
filter isnull(v) (EMPTY at runtime)] U [extreme: sort(v nulls-last,
sec) -> limit 1] -> sort(pri) -> limit 1, then the scalar-null pad
union with a second sort(pri) -> limit 1 on top.

Correct output: exactly one row {k:7, v:207.0, g:"g7"}. The bug leaks
the pad row too. Reproduction is flaky / stage-order dependent —
observed ~5-15% of runs at 8 cores on the 2026-08-16 container build.
"""
import sys

from pyspark.sql import functions as F

ROWS_S = [(i, float((i * 37) % 101), f"g{i % 3}") for i in range(17)]
ROWS_D = [(0, 201.0, "g1"), (0, 202.0, "g2"), (3, 203.0, "g0"),
          (3, 204.0, "g1"), (None, 205.0, "gN"), (None, 206.0, "gN"),
          (7, 207.0, "g7")]


def build(spark):
    s = spark.createDataFrame(ROWS_S, "k long, v double, g string")
    d = spark.createDataFrame(ROWS_D, "k long, v double, g string")
    # $.s.sort(k): null-first stable sort + scan-order surrogate,
    # .skip(4) = Offset above the sort; order keys rematerialized into
    # __ord slots exactly like the pre-r12 engine did
    left = (s.withColumn("__ord_sc1", F.monotonically_increasing_id())
             .orderBy(F.isnull("k").cast("int").desc(),
                      F.col("k").asc(), F.col("__ord_sc1").asc())
             .offset(4)
             .select("k", "v", "g",
                     F.isnull("k").cast("int").alias("__ord0"),
                     F.col("k").alias("__ord1"),
                     F.col("__ord_sc1").alias("__ord2"))
             .alias("__l"))
    # $.d.sort(v): the other side's monotonic-id sort, plus a SECOND
    # post-sort monotonic id (the join's right-order tiebreak)
    right = (d.withColumn("__ord_sc2", F.monotonically_increasing_id())
              .orderBy(F.isnull("v").cast("int").desc(),
                       F.col("v").asc(), F.col("__ord_sc2").asc())
              .select("k", "v", "g")
              .withColumn("__ord_rt3", F.monotonically_increasing_id())
              .alias("__r"))
    # equi_join: eqNullSafe (long keys), right-wins merge keeps right's
    # k/v/g, receiver order carried through the __ord slots
    sec = [F.col("__ord0").desc(), F.col("__ord1").asc(),
           F.col("__ord2").asc(), F.col("__ord_rt3").asc()]
    j = (left.join(right, F.col("__l.k").eqNullSafe(F.col("__r.k")),
                   "inner")
             .select(F.col("__l.__ord0").alias("__ord0"),
                     F.col("__l.__ord1").alias("__ord1"),
                     F.col("__l.__ord2").alias("__ord2"),
                     F.col("__r.k").alias("k"),
                     F.col("__r.v").alias("v"),
                     F.col("__r.g").alias("g"),
                     F.col("__r.__ord_rt3").alias("__ord_rt3"))
             .orderBy(*sec))
    # min_by(v), pre-r12 lowering: first-element-null probe branch —
    # empty at RUNTIME (no null v survives the limit-1 filter)
    first_null = (j.orderBy(*sec).limit(1)
                   .filter(F.col("v").isNull())
                   .withColumn("__xb_pri", F.lit(0)))
    extreme = (j.orderBy(F.col("v").asc_nulls_last(), *sec).limit(1)
                .withColumn("__xb_pri", F.lit(1)))
    win = (first_null.unionByName(extreme)
           .orderBy(F.col("__xb_pri").asc()).limit(1)
           .drop("__xb_pri"))
    # pre-r12 _pad_single_null: literal null row union + pri sort
    null_row = win.sparkSession.range(1).select(
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in win.schema.fields])
    padded = (win.withColumn("__pri", F.lit(0))
              .unionByName(null_row.withColumn("__pri", F.lit(1)))
              .orderBy("__pri").limit(1).drop("__pri"))
    return padded.select("k", "v", "g")


def run(spark, n_runs=20, verbose=True):
    """Return how many of n_runs leaked extra rows (0 = no drop)."""
    bad = 0
    for i in range(n_runs):
        got = build(spark).collect()
        if len(got) != 1:
            bad += 1
            if verbose:
                print(f"run {i}: DROP reproduced — {len(got)} rows: "
                      f"{got}", flush=True)
    return bad


if __name__ == "__main__":
    from jetro_spark.session import get_spark
    spark = get_spark("aqe-repro", cpus=8)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    bad = run(spark, n)
    print(f"{bad}/{n} runs leaked extra rows")
    spark.stop()
