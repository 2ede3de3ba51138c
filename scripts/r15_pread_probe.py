#!/usr/bin/env python
"""r15 probe (VERDICT r14 item 3): can a row-group-aware parallel read
(mapInArrow over pyarrow slices) beat the serial single-row-group scan
for aggregate-shaped queries where fan_out measured WORSE (the §2.3 vs
§2.5 stalemate: group_agg, implode, index_by, join3_revenue)?

Each task re-decodes the (column-pruned) file with pyarrow and keeps
only its row slice — N× decode work but parallel, no JVM exchange of
full rows, map-side partial aggregation preserved per slice.

Usage: python scripts/r15_pread_probe.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def pread(spark, path: str, cols: list[str], schema, n: int):
    """Parallel slice read: n tasks, each decodes the pruned columns
    and emits only its slice."""
    def gen(it):
        import pyarrow.parquet as pq

        for b in it:
            for sid in b.column(0).to_pylist():
                tbl = pq.read_table(path, columns=cols,
                                    use_threads=False, memory_map=True)
                k = -(-tbl.num_rows // n)
                sl = tbl.slice(sid * k, k)
                yield from sl.to_batches(max_chunksize=1 << 16)

    return spark.range(0, n, 1, n).mapInArrow(gen, schema)


def main() -> None:
    from pyspark.sql import functions as F

    from jetro_spark.session import get_spark, load_tables

    spark = get_spark("r15_pread_probe")
    dfs = load_tables(spark, SF_DIR, register=False)
    li = dfs["lineitem"]
    li_path = os.path.join(SF_DIR, "lineitem.parquet")

    cores = spark.sparkContext.defaultParallelism

    def agg_over(src):
        net_dec = F.col("l_extendedprice").cast("decimal(18,2)") * (
            F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        return (src.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(net_dec).cast("double").alias("revenue"),
            F.avg("l_quantity").alias("avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count(F.lit(1)).alias("n")))

    cols = ["l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount"]
    variants = {
        "base": agg_over(li.select(*cols)),
    }
    for n in (8, 16, 32):
        if n <= cores:
            variants[f"pread{n}"] = agg_over(
                pread(spark, li_path, cols, li.select(*cols).schema, n))

    # implode shape: groupBy orderkey + collect
    from jetro_spark.operators import implode as implode_op
    im_cols = ["l_orderkey", "l_quantity"]

    def implode_over(src):
        im = implode_op(src, "l_quantity", ["l_orderkey"])
        return im.select(
            "l_orderkey", F.size("l_quantity").alias("n_items"),
            F.aggregate("l_quantity", F.lit(0.0),
                        lambda a, x: a + x).alias("qty_sum"))

    variants["implode_base"] = implode_over(li.select(*im_cols))
    variants["implode_pread16"] = implode_over(
        pread(spark, li_path, im_cols, li.select(*im_cols).schema, 16))
    variants["implode_pread32"] = implode_over(
        pread(spark, li_path, im_cols, li.select(*im_cols).schema, 32))

    for name, df in variants.items():
        spark.sparkContext.setJobDescription(f"pread:{name}")
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        print(f"{name:18s} min={samples[0]:.3f} med={samples[len(samples)//2]:.3f} max={samples[-1]:.3f}",
              flush=True)

    # sanity: identical results
    base = {tuple(r) for r in variants["base"].collect()}
    pr = {tuple(r) for r in variants["pread16"].collect()}
    print("group_agg results equal:", base == pr)
    ib = {tuple(r) for r in variants["implode_base"].collect()}
    ip = {tuple(r) for r in variants["implode_pread16"].collect()}
    print("implode results equal:", ib == ip)


if __name__ == "__main__":
    main()
