#!/usr/bin/env python
"""r15 (VERDICT r14 item 2): re-measure pmi_colloc and
check_constraints OLD vs NEW shapes at the sf1.0 upscale — the scale
the r14 single-pass adoptions appeal to. Interleaved same-session
warm best-of-N per variant; also runs both at sf0.1 for the local
cost, and times the gate-identical call paths.

Old shapes are the literal pre-r14 implementations (git
f527ba7^ / eecb18d^), reconstructed inline.

Usage: python scripts/r15_scale_ab.py [iters] [pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/sfprobe1.0"


def old_check_constraints(df, checks, unique=None):
    from pyspark.sql import functions as F
    rows = [
        F.struct(F.lit(name).alias("constraint"),
                 F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1)
                       .otherwise(0)).cast("long").alias("n_violations"))
        for name, cond in checks.items()
    ]
    out = df.agg(F.array(*rows).alias("p")) \
        .select(F.explode("p").alias("p")).select("p.*")
    for keys in unique or []:
        dup = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
               .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                    .cast("long").alias("n_violations"))
               .select(F.lit("unique(" + ",".join(keys) + ")")
                       .alias("constraint"), "n_violations"))
        out = out.unionByName(dup)
    return out


def old_pmi(docs, text_col="text", *, min_count=5, top_k=50):
    from pyspark.sql import functions as F

    from jetro_spark.functions.arrays import let_
    from jetro_spark.llm.ranking import _toks
    toks = docs.select(_toks(text_col).alias("__tk"))
    uni = (toks.select(F.explode("__tk").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    bi = (toks.select(F.explode(
        let_(F.col("__tk"),
             lambda tk: F.zip_with(
                 F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
                 F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
                 lambda a, bb: F.struct(a.alias("w1"), bb.alias("w2"))))
    ).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count")))
    tot = (toks.agg(
        F.sum(F.size("__tk")).alias("tu"),
        F.sum(F.greatest(F.size("__tk") - 1, F.lit(0))).alias("tb"))
        .withColumn("__k", F.lit(1)))
    j = (bi.filter(F.col("pair_count") >= min_count)
         .join(F.broadcast(uni.withColumnRenamed("cw", "c1")
                           .withColumnRenamed("w", "w1")), "w1")
         .join(F.broadcast(uni.withColumnRenamed("cw", "c2")
                           .withColumnRenamed("w", "w2")), "w2")
         .withColumn("__k", F.lit(1))
         .join(F.broadcast(tot), "__k"))
    pmi = F.round(F.log(
        (F.col("pair_count") / F.col("tb"))
        / ((F.col("c1") / F.col("tu")) * (F.col("c2") / F.col("tu")))), 6)
    out = j.select("w1", "w2", "pair_count", pmi.alias("pmi"))
    if top_k is not None:
        out = out.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")) \
            .limit(top_k)
    return out


def checks_for(li):
    from pyspark.sql import functions as F
    return {
        "qty_in_range": (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
        "price_positive": F.col("l_extendedprice") > 0,
        "orderkey_not_null": F.col("l_orderkey").isNotNull(),
        "discount_unit_interval": (F.col("l_discount") >= 0)
        & (F.col("l_discount") <= 1),
    }


def bench(spark, name, df):
    samples = []
    spark.sparkContext.setJobDescription(name)
    df.write.format("noop").mode("overwrite").save()  # warm
    for _ in range(ITERS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[0], samples[len(samples) // 2]


def main() -> None:
    from pyspark.sql import functions as F

    from jetro_spark.llm.ranking import pmi_collocations
    from jetro_spark.operators.profiling import check_constraints
    from jetro_spark.session import get_spark
    import scripts.scale_probe as sp

    spark = get_spark("r15_scale_ab")
    sp.build_probe_data(spark)

    for sf_dir in (SF01, SF10):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        uniq = [["l_orderkey", "l_linenumber"]]
        variants = {
            "cc_new": check_constraints(li, checks_for(li), unique=uniq),
            "cc_old": old_check_constraints(li, checks_for(li), unique=uniq),
            "pmi_new": pmi_collocations(docs),
            "pmi_old": old_pmi(docs),
        }
        print(f"--- {sf_dir} ---", flush=True)
        for p in range(PAIRS):
            order = list(variants) if p % 2 == 0 else list(variants)[::-1]
            for nm in order:
                mn, md = bench(spark, f"{nm}@{sf_dir}", variants[nm])
                print(f"  [{p}] {nm:8s} min={mn:.3f} med={md:.3f}",
                      flush=True)


if __name__ == "__main__":
    main()
