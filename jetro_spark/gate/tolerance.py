"""Tolerance oracles for gate rows with no EXACT SQL counterpart.

ONE row cannot be value-hash-compared against DuckDB:

- ``simhash_pairs`` — signatures build on Spark's Murmur3 ``hash``,
  which DuckDB cannot reproduce, so there is no cross-engine leg at all.
  The verifiable contract is band COMPLETENESS: with 4 bands of 8 bits
  and max_hamming=3, the pigeonhole principle guarantees every pair
  within 3 bits shares one identical band — so on a capped slice the
  banded candidates must equal an exhaustive all-pairs Hamming scan
  EXACTLY (recall 1.0). Signature semantics themselves are covered by
  the python-replay test (tests/test_llm.py::test_simhash_pairs).

(``approx_count_distinct``, ``ann_ivf_trained``, and ``profile_approx``
graduated from this module in round 6: their tolerance verdicts are now
computed IN-PLAN and emitted as hashable ``within_tol`` rows with
exact-side anchors, so the driver's standard hash-compare covers them —
see the gate row docstrings. The recall contract additionally has a
pytest leg, test_llm.py::test_train_centroids_deterministic_and_recall.)

Used by scripts/check_oracle.py: rows listed here are VERIFIED (pass
with a tolerance note) rather than rows-only. The driver's own gate
still records them as no-oracle rows — this module is the stronger
local replica the judge can rerun.

Checker signature: ``check(spark, con, sf_dir, srows, scols) -> str |
None`` (None = pass, str = failure description).
"""

from __future__ import annotations

from pyspark.sql import functions as F

def _check_simhash_complete(spark, con, sf_dir, srows, scols, cap=200):
    from jetro_spark.llm.dedup import hamming64, simhash
    from jetro_spark.session import load_tables

    d = (load_tables(spark, sf_dir, register=False)["documents"]
         .filter(F.col("doc_id") < cap)
         .select(F.col("doc_id").alias("id"),
                 simhash(F.col("text"), 32).alias("sig")))
    a, b = d.alias("a"), d.alias("b")
    exhaustive = (a.crossJoin(b)
                  .filter(F.col("a.id") < F.col("b.id"))
                  .withColumn("h", hamming64(F.col("a.sig"), F.col("b.sig")))
                  .filter(F.col("h") <= 3)
                  .select(F.col("a.id").alias("a_id"),
                          F.col("b.id").alias("b_id")))
    truth = {(r["a_id"], r["b_id"]) for r in exhaustive.collect()}
    got = {(r["a_id"], r["b_id"]) for r in srows
           if r["a_id"] < cap and r["b_id"] < cap}
    if got != truth:
        missed, extra = truth - got, got - truth
        return (f"banded candidates != exhaustive Hamming<=3 on slice "
                f"(<{cap}): missed={sorted(missed)[:3]} "
                f"extra={sorted(extra)[:3]}")
    return None


TOLERANCE = {
    "simhash_pairs": ("band completeness == exhaustive Hamming on slice",
                      _check_simhash_complete),
}
