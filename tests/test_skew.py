"""Skew stress: SCALE.md claims the salted join and the LSH bucket cap
neutralize hot keys — this generates REAL skew (one key owning 50% of
rows) and pins (a) value identity between the skew-hardened and plain
plans, (b) the salt / bucket-cap machinery visibly in the plan.

The salted_join leg runs at 10^6 left rows; outputs are compared by a
distributed checksum (count + sum of row hashes), not a driver collect —
the comparison itself must not funnel a million rows through the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jetro_spark.llm.dedup import minhash_lsh_pairs
from jetro_spark.operators.joins import salted_join
from jetro_spark.operators.relational import equi_join


def _checksum(df):
    """Order-insensitive distributed fingerprint: (row count, sum of
    per-row xxhash64 over the name-sorted columns)."""
    cols = [F.col(c) for c in sorted(df.columns)]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: 10^6 64-bit hashes can overflow a
        # long sum under ANSI
        F.sum(F.xxhash64(F.struct(*cols)).cast("decimal(38,0)"))
        .alias("h")).first()
    return row["n"], row["h"]


def test_salted_join_hot_key_value_identity(spark):
    """One key = 50% of 10^6 fact rows; salted and plain inner joins
    must be value-identical, and the salted plan must carry the
    replicate-and-salt machinery."""
    n, n_dim, hot = 1_000_000, 10_000, 7
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(hot))
        .otherwise(F.col("id") % n_dim).alias("k"),
        (F.col("id") * 3 % 1000).alias("v"))
    dim = spark.range(n_dim).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("dim-"), F.col("id")).alias("label"))

    plain = equi_join(fact, dim, "k", "dk")
    salted = salted_join(fact, dim, "k", "dk", salt=8)

    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan          # salt key present in the join
    assert "pmod" in plan.lower()    # deterministic row-local salt
    assert "explode" in plan.lower()  # right side replicated x salt
    assert "__salt" not in salted.columns  # machinery dropped from output

    assert sorted(plain.columns) == sorted(salted.columns)
    assert _checksum(plain) == _checksum(salted)


def test_salted_join_spreads_hot_key_partitions(spark):
    """The point of salting: the hot key's rows land in `salt` distinct
    shuffle partitions instead of one straggler task."""
    n, hot, salt = 100_000, 7, 8
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(hot))
        .otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("v"))
    lsalt = F.pmod(F.xxhash64(F.struct(F.col("k"), F.col("v"))),
                   F.lit(salt)).cast("int")
    used = (fact.filter(F.col("k") == hot)
            .select(lsalt.alias("s")).distinct().count())
    assert used == salt  # 50k hot rows hash across all salt values


def test_minhash_bucket_cap_hot_bucket(spark):
    """50% of the corpus is ONE duplicated text (a degenerate LSH
    bucket). With the cap above the bucket size the capped and uncapped
    plans are value-identical; with the cap below it the degenerate
    bucket's pairs drop while unrelated near-dup pairs survive — and
    the cap machinery (bucket-size filter) is visible in the plan."""
    n = 800  # 400 identical docs -> C(400,2) = 79_800 hot pairs
    base = spark.range(n)
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0,
               F.lit("the quick brown fox jumps over the lazy dog "
                     "again and again and again"))
        .otherwise(F.concat(
            F.lit("unique document body number "), F.col("id"),
            F.lit(" with enough distinct text to shingle cleanly "),
            F.col("id") * 17)).alias("text"))

    uncapped = minhash_lsh_pairs(docs, max_bucket=10_000)
    capped_hi = minhash_lsh_pairs(docs, max_bucket=500)
    capped_lo = minhash_lsh_pairs(docs, max_bucket=100)

    plan = capped_lo._jdf.queryExecution().optimizedPlan().toString()
    assert "count" in plan.lower()   # bucket-size aggregate feeds a filter
    assert "100" in plan             # the cap constant reaches the plan

    # cap above every bucket (the degenerate one holds 400 docs, the
    # near-dup template docs bucket below that): identical output
    assert _checksum(uncapped) == _checksum(capped_hi)

    # cap below the degenerate bucket: all C(400,2) hot-hot pairs
    # (even doc_ids) are gone...
    hot_pairs = 400 * 399 // 2
    n_uncapped, _ = _checksum(uncapped)
    assert n_uncapped >= hot_pairs
    hot_in_lo = capped_lo.filter(
        (F.col("a_id") % 2 == 0) & (F.col("b_id") % 2 == 0)).count()
    assert hot_in_lo == 0
    # ...and everything that survives is a subset of the uncapped truth
    # (the cap only ever DROPS candidates, never invents them)
    missing = (capped_lo.select("a_id", "b_id")
               .exceptAll(uncapped.select("a_id", "b_id")).count())
    assert missing == 0
