"""Unit tests for llm/ranking.py (BM25, DSIR, PMI) and
operators/layout.py (Z-order) — semantic properties on tiny in-memory
corpora plus the plan-shape contracts the 100 TB story depends on.
Exact-value correctness vs DuckDB is the oracle gate's job
(gate/ranking.py rows bm25_topk / dsir_weights / pmi_colloc /
zorder_key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetro_spark.llm import ranking as RK
from jetro_spark.operators.layout import (zorder_key, zorder_key_sql,
                                          zorder_layout)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


# ------------------------------------------------------------------ BM25

def test_bm25_orders_by_relevance(spark):
    d = _docs(spark, [
        "spark spark spark fast engine",        # 0: heavy on both terms
        "spark is one word here among many many many words to dilute",
        "nothing relevant at all in this one",   # 2: no hit -> absent
        "fast fast fast fast",                   # 3: one term only
    ])
    out = RK.bm25_scores(d, ["spark", "fast"])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 2 not in rows                       # no matching term, no row
    assert rows[0]["n_terms"] == 2 and rows[3]["n_terms"] == 1
    assert rows[0]["score"] > rows[1]["score"] > 0
    # rarer term ("fast": df=2 of 4) outweighs the commoner "spark"
    # at equal tf — idf monotonicity
    assert rows[3]["score"] > 0


def test_bm25_top_k_deterministic_tiebreak(spark):
    d = _docs(spark, ["tie word", "tie word", "tie word", "other text"])
    out = RK.bm25_scores(d, ["tie"], top_k=2).collect()
    assert [r["doc_id"] for r in out] == [0, 1]  # ties break on doc_id


def test_bm25_empty_terms_raises(spark):
    with pytest.raises(ValueError):
        RK.bm25_scores(_docs(spark, ["x"]), [])


def test_bm25_length_normalization(spark):
    # same tf, longer doc -> lower score (the b*dl/avgdl term)
    d = _docs(spark, ["query term here",
                      "query term here " + "pad " * 40])
    rows = {r["doc_id"]: r["score"]
            for r in RK.bm25_scores(d, ["query"]).collect()}
    assert rows[0] > rows[1]


# ------------------------------------------------------------------ DSIR

def test_dsir_weights_prefer_target_like_docs(spark):
    on = "alpha beta gamma delta epsilon zeta"
    off = "uno dos tres cuatro cinco seis"
    raw = _docs(spark, [on, on + " alpha beta", off, off + " uno dos"])
    target = _docs(spark, [on, "alpha beta gamma", "delta epsilon zeta"])
    w = {r["doc_id"]: r["dsir_weight"]
         for r in RK.dsir_weights(raw, target, n_buckets=64).collect()}
    assert len(w) == 4
    assert min(w[0], w[1]) > max(w[2], w[3])


def test_dsir_scoring_pass_is_zero_shuffle(spark):
    """The 100 TB contract: once the 256-bucket model is embedded as a
    literal map, scoring is a narrow projection — NO Exchange anywhere
    in the scoring plan."""
    raw = _docs(spark, ["a b c", "c d e", "e f g h"])
    target = _docs(spark, ["a b", "b c"])
    out = RK.dsir_weights(raw, target, n_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ------------------------------------------------------------------ PMI

def test_pmi_finds_the_collocation(spark):
    # "hong kong" always adjacent; fillers scattered independently
    rows = [f"hong kong w{i % 3} x{i % 5} hong kong y{i % 2}"
            for i in range(30)]
    out = RK.pmi_collocations(_docs(spark, rows), min_count=3, top_k=5)
    top = out.collect()[0]
    assert (top["w1"], top["w2"]) == ("hong", "kong")
    assert top["pmi"] > 0


def test_pmi_min_count_filters(spark):
    rows = ["a b", "a b", "c d"]
    out = RK.pmi_collocations(_docs(spark, rows), min_count=2, top_k=None)
    pairs = {(r["w1"], r["w2"]) for r in out.collect()}
    assert ("a", "b") in pairs and ("c", "d") not in pairs


def test_pmi_unigram_joins_broadcast(spark):
    out = RK.pmi_collocations(_docs(spark, ["a b c", "b c d"]),
                              min_count=1, top_k=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # unigram-count lookups ride broadcast HASH joins; the only nested
    # loop permitted is the 1-row corpus-totals attach (Catalyst folds
    # the literal-key equality), whose build side test_plan_audit pins
    # to a grouping-key-free aggregate
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


# --------------------------------------------------------------- Z-order

def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 137, 1023) for y in (0, 2, 77, 1023)],
        "x long, y long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zorder_key(["x", "y"], bits=10).alias("z"))
           .collect()}
    for (x, y), z in got.items():
        assert z == _py_morton([x, y], 10), (x, y)


def test_zorder_key_sql_agrees_with_column_builder(spark):
    """The SQL spelling and the Column builder must be the same
    function — evaluated here through Spark's OWN SQL parser (DuckDB
    agreement is the oracle row's job)."""
    df = spark.createDataFrame([(3, 9), (512, 7), (1000, 1000)],
                               "x long, y long")
    sql = zorder_key_sql(["x", "y"], bits=10)
    both = df.select(
        zorder_key(["x", "y"], bits=10).alias("a"),
        F.expr(sql).alias("b")).collect()
    assert all(r["a"] == r["b"] for r in both)


def test_zorder_key_validations():
    with pytest.raises(ValueError):
        zorder_key([])
    with pytest.raises(ValueError):
        zorder_key([F.lit(1)] * 4, bits=16)   # 64 bits > signed long


def test_zorder_layout_partitions_are_key_ranges(spark):
    """After zorder_layout, every output partition owns a contiguous,
    non-overlapping z-range — the property that keeps per-file min/max
    stats tight (data skipping) at write time."""
    df = spark.range(2000).select(
        (F.col("id") % 45).alias("x"),
        ((F.col("id") * 7) % 45).alias("y"))
    out = zorder_layout(df, ["x", "y"], bits=6, n_partitions=8,
                        keep_key=True)
    parts = (out.withColumn("p", F.spark_partition_id())
             .groupBy("p").agg(F.min("__zorder").alias("lo"),
                               F.max("__zorder").alias("hi"))
             .orderBy("lo").collect())
    assert len(parts) > 1
    for prev, cur in zip(parts, parts[1:]):
        assert prev["hi"] <= cur["lo"]


def test_zorder_layout_improves_file_skipping(spark, tmp_path):
    """Write the same table linearly and z-clustered; the z-clustered
    layout must let parquet row-group pruning (via per-file min/max on
    BOTH dimensions) touch fewer files for a selective 2-D predicate.
    Measured through Spark's own scan metrics proxy: count of files
    whose min/max range intersects the predicate box."""
    # x/y decorrelated from the insertion order, so the linear layout
    # has no accidental clustering on either dimension
    df = spark.range(4096).select(
        ((F.col("id") * 7) % 64).alias("x"),
        ((F.col("id") * 13) % 64).alias("y"),
        F.col("id").alias("payload"))
    lin, zed = str(tmp_path / "lin"), str(tmp_path / "zed")
    df.repartitionByRange(16, "payload").write.parquet(lin)
    zorder_layout(df, ["x", "y"], bits=6,
                  n_partitions=16).write.parquet(zed)

    import pyarrow.parquet as pq
    import glob as g

    def touched(path):
        n = 0
        for f in g.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                cols = {md.row_group(rg).column(i).path_in_schema:
                        md.row_group(rg).column(i).statistics
                        for i in range(md.row_group(rg).num_columns)}
                sx, sy = cols["x"], cols["y"]
                if sx.min <= 3 and sx.max >= 0 and sy.min <= 3 and sy.max >= 0:
                    n += 1
                    break
        return n

    assert touched(zed) < touched(lin)


# ---------------------------------------------------------- n-gram LM

def test_ngram_lm_scores_indistribution_higher(spark):
    common = "the quick brown fox jumps over the lazy dog"
    rows = [common] * 8 + ["zq xv qj kk pw yy zz aa bb cc"]
    out = {r["doc_id"]: r
           for r in RK.ngram_lm_score(_docs(spark, rows)).collect()}
    indist = [out[i]["lm_score"] for i in range(8)]
    assert all(s == indist[0] for s in indist)      # identical docs tie
    assert out[8]["lm_score"] < indist[0]           # gibberish is rarer


def test_ngram_lm_short_docs_score_null(spark):
    out = {r["doc_id"]: r
           for r in RK.ngram_lm_score(
               _docs(spark, ["single", "two words here", "x"])).collect()}
    assert out[0]["lm_score"] is None and out[0]["n_bigrams"] == 0
    assert out[2]["lm_score"] is None
    assert out[1]["n_bigrams"] == 2


def test_ngram_lm_external_train_measures_target_similarity(spark):
    train = _docs(spark, ["alpha beta gamma delta"] * 5)
    raw = _docs(spark, ["alpha beta gamma", "uno dos tres"])
    out = {r["doc_id"]: r["lm_score"]
           for r in RK.ngram_lm_score(raw, train=train).collect()}
    assert out[0] > out[1]   # target-like text scores higher


# ------------------------------------------------- hashed embeddings

def test_hashed_embedding_is_unit_norm_and_similarity_ordered(spark):
    from jetro_spark.llm.similarity import cosine, hashed_embedding

    d = _docs(spark, [
        "spark shuffles data across the cluster",
        "spark shuffles data across the big cluster",   # near-dup of 0
        "bananas oranges apples pears grapes melons",   # unrelated
    ])
    e = hashed_embedding(d, dim=64)
    rows = {r["doc_id"]: r["embedding"] for r in e.collect()}
    for v in rows.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9
    a = e.alias("a").filter(F.col("doc_id") == 0) \
        .select(F.col("embedding").alias("ea"))
    pairs = a.crossJoin(e.filter(F.col("doc_id") > 0)
                        .select("doc_id", "embedding"))
    sims = {r["doc_id"]: r["s"]
            for r in pairs.select(
                "doc_id",
                cosine(F.col("ea"), F.col("embedding")).alias("s")).collect()}
    assert sims[1] > 0.9 > sims[2]


def test_hashed_embedding_empty_text_zero_vector(spark):
    from jetro_spark.llm.similarity import hashed_embedding

    d = _docs(spark, ["", "some words"])
    rows = {r["doc_id"]: r["embedding"]
            for r in hashed_embedding(d, dim=16).collect()}
    assert rows[0] == [0.0] * 16
    assert any(x != 0.0 for x in rows[1])


def test_hashed_embedding_composes_with_semantic_dedup(spark):
    """Model-free text SemDeDup: hashed_embedding feeds semantic_dedup
    directly, so near-duplicate TEXT drops with no learned embedder
    anywhere — the composition the embedding exists for."""
    from jetro_spark.llm.dedup import semantic_dedup
    from jetro_spark.llm.similarity import hashed_embedding, seed_centroids

    base = "spark shuffles data across the cluster nodes every stage"
    # ids 0/1 seed the two k-means cells (seed_centroids takes lowest
    # ids), so the near-dup PAIR (2, 3) lands together in one cell —
    # SemDeDup only compares within a cell
    d = _docs(spark, [
        "bananas oranges apples pears grapes melons fruit bowl salad",
        "compilers lower typed expressions into machine code today",
        base,
        base + " now",                                  # near-dup of 2
    ])
    emb = hashed_embedding(d, dim=64)
    cents = seed_centroids(emb, 2, id_col="doc_id", vec_col="embedding")
    kept = semantic_dedup(emb, cents, id_col="doc_id",
                          vec_col="embedding", threshold=0.9)
    ids = {r["doc_id"] for r in kept.collect()}
    assert len({2, 3} & ids) == 1      # one of the near-dup pair dropped
    assert {0, 1} <= ids               # distinct texts survive


def test_linear_score_literal_model_and_bias(spark):
    """r10: hashed-feature linear scorer — logit = bias + tf·w with a
    literal weight vector; token-less docs get the bare bias; sigmoid
    is monotone in the logit."""
    import math

    from jetro_spark.llm.ranking import linear_score
    from jetro_spark.llm.sampling import hash_bucket
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, None), (4, "beta")],
        "doc_id long, text string")
    dim = 8
    w = [0.5 if i % 2 == 0 else -0.25 for i in range(dim)]
    out = {r["doc_id"]: r for r in
           linear_score(docs, w, bias=0.3).collect()}
    # empty / null text → bare bias
    assert out[2]["logit"] == 0.3 and out[3]["logit"] == 0.3
    assert out[2]["score"] == round(1 / (1 + math.exp(-0.3)), 6)
    # hand-computed logit for doc 1: buckets of alpha (tf ln(1+2)) and
    # beta (ln(1+1)), weights looked up in the literal vector
    b = {t: spark.range(1).select(
            (hash_bucket(F.lit(t), 9) % dim).cast("int").alias("b")
         ).first()["b"] for t in ("alpha", "beta")}
    expect = 0.3 + round(math.log(3), 6) * w[b["alpha"]] \
        + round(math.log(2), 6) * w[b["beta"]]
    assert out[1]["logit"] == round(expect, 8)
    assert out[4]["score"] == round(
        1 / (1 + math.exp(-out[4]["logit"])), 6)
