"""weighted_hash_sample (llm/sampling.py, r8): Efraimidis-Spirakis A-ES
with md5-derived randomness. Exact draw parity vs DuckDB is the
weighted_sample gate row; here: inclusion-probability behavior,
determinism, weight guards, and the scale-shape plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from jetro_spark.llm.sampling import weighted_hash_sample


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w double, g string")


def test_weighted_draw_is_deterministic_and_k_sized(spark):
    d = _df(spark, [(i, float(1 + i % 5), "a") for i in range(100)])
    a = sorted(r["doc_id"] for r in weighted_hash_sample(d, 10, "w").collect())
    b = sorted(r["doc_id"] for r in weighted_hash_sample(d, 10, "w").collect())
    assert a == b and len(a) == 10


def test_heavier_rows_drawn_more_often(spark):
    # one row with 50x the weight of 99 others: across 40 independent
    # seeds it must appear in the k=5 draw far more often than a
    # uniform row would (expected ~0.95+ vs ~0.05)
    d = _df(spark, [(0, 50.0, "a")] + [(i, 1.0, "a") for i in range(1, 100)])
    hits = sum(
        1 for seed in range(40)
        if 0 in {r["doc_id"]
                 for r in weighted_hash_sample(d, 5, "w", seed=seed).collect()})
    assert hits >= 25, hits


def test_nonpositive_and_null_weights_never_drawn(spark):
    d = spark.createDataFrame(
        [(0, None, "a"), (1, 0.0, "a"), (2, -3.0, "a"), (3, 1.0, "a"),
         (4, 1.0, "a")],
        "doc_id long, w double, g string")
    got = {r["doc_id"] for r in weighted_hash_sample(d, 10, "w").collect()}
    assert got == {3, 4}


def test_stratified_draw_caps_per_group(spark):
    d = _df(spark, [(i, 1.0 + i, "g%d" % (i % 3)) for i in range(60)])
    out = weighted_hash_sample(d, 4, "w", strata_col="g").collect()
    per = {}
    for r in out:
        per[r["g"]] = per.get(r["g"], 0) + 1
    assert per == {"g0": 4, "g1": 4, "g2": 4}


def test_global_draw_plans_take_ordered(spark):
    """The 100 TB shape: a global weighted draw must plan as
    TakeOrderedAndProject (per-partition top-k heaps), never a global
    sort or a single-partition window."""
    d = _df(spark, [(i, 1.0, "a") for i in range(50)])
    plan = (weighted_hash_sample(d, 5, "w")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_leakage_safe_split_keeps_clusters_together(spark):
    """llm/sampling.py leakage_safe_split (r8): every member of a
    duplicate cluster must land in the same split; isolated docs form
    singleton clusters and still follow the hash_split fractions."""
    from jetro_spark.llm.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string")
    # 0-1-2 chained (transitive closure), 3-4 pair, rest isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "a_id long, b_id long")
    out = leakage_safe_split(docs, pairs, {"train": 0.5, "val": 0.5},
                             seed=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 40
    assert {rows[i]["component"] for i in (0, 1, 2)} == {0}
    assert {rows[i]["split"] for i in (0, 1, 2)} == {rows[0]["split"]}
    assert rows[3]["split"] == rows[4]["split"]
    assert rows[7]["component"] == 7            # singleton keeps its id
    assert {r["split"] for r in rows.values()} == {"train", "val"}
