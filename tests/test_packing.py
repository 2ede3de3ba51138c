"""Sequence packing (llm/packing.py): cumsum strategy vs a python replay,
greedy strategy's reset semantics, Arrow-batch-boundary state survival.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetro_spark.llm.packing import pack_by_cumsum, pack_greedy


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 900 + 100) for i in range(200)]  # 100..999 tokens
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_by_cumsum_matches_python_replay(docs):
    out = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_by_cumsum(docs, "n_tokens", 4096,
                                   order="doc_id").collect()}
    run = 0
    for i, n in sorted((r["doc_id"], r["n_tokens"]) for r in docs.collect()):
        assert out[i] == (run // 4096, run % 4096)
        run += n


def test_pack_by_cumsum_sharded(docs):
    d = docs.withColumn("shard", (F.col("doc_id") % 4).cast("int"))
    out = pack_by_cumsum(d, "n_tokens", 4096, order="doc_id", shard="shard")
    # exclusive cumsum restarts per shard: each shard has a 0-offset doc
    firsts = (out.groupBy("shard").agg(F.min("pack_offset").alias("mn"))
              .collect())
    assert all(r["mn"] == 0 for r in firsts) and len(firsts) == 4


def test_pack_greedy_never_overflows(docs):
    out = pack_greedy(docs, "doc_id", "n_tokens", 2048, n_shards=4)
    sums = (out.filter(~F.col("oversize"))
            .groupBy("shard", "pack_id").agg(F.sum("n_tokens").alias("s"))
            .collect())
    assert len(sums) > 0
    assert all(r["s"] <= 2048 for r in sums)
    # every input doc appears exactly once
    assert out.count() == 200
    assert out.select("id").distinct().count() == 200


def test_pack_greedy_exact_fold_semantics(spark):
    # single shard → deterministic walk in id order; replay in python
    rows = [(i, n) for i, n in enumerate([1000, 1000, 100, 1000, 2000, 50, 3000, 10])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["id"]: (r["pack_id"], r["oversize"])
           for r in pack_greedy(df, "doc_id", "n_tokens", 2048,
                                n_shards=1).collect()}
    pack, acc, expect = 0, 0, {}
    for i, n in rows:
        if acc > 0 and acc + n > 2048:
            pack, acc = pack + 1, 0
        expect[i] = (pack, n > 2048)
        acc += n
    assert out == expect


def test_pack_greedy_state_survives_arrow_batches(spark):
    # tiny arrow batches force the per-partition fold to span many
    # batches; a per-batch accumulator reset would change pack ids
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        rows = [(i, 100) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_greedy(df, "doc_id", "n_tokens", 1000, n_shards=1)
        per_pack = {r["pack_id"]: r["n"] for r in
                    out.groupBy("pack_id").agg(F.count("*").alias("n")).collect()}
        # 100-token docs, 1000 budget → exactly 10 docs per pack, 30 packs
        assert len(per_pack) == 30
        assert all(n == 10 for n in per_pack.values())
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
