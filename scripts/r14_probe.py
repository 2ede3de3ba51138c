#!/usr/bin/env python
"""r14 optimization probes: verify where bench time goes.

Modes:
  python scripts/r14_probe.py scanpar   # scan parallelism of each table
  python scripts/r14_probe.py stage <q> # per-variant timing for a query
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jetro_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(df, n=5):
    noop(df)
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        noop(df)
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "scanpar"
    spark = get_spark("r14_probe")
    tables = load_tables(spark, SF_DIR, register=False)

    if mode == "scanpar":
        # how many scan tasks actually carry rows?
        for name, df in tables.items():
            parts = (df.groupBy(F.spark_partition_id().alias("p"))
                     .count().collect())
            print(f"{name}: scan_partitions_with_rows={len(parts)} "
                  f"rows={sorted((r['count'] for r in parts), reverse=True)[:5]}")
        return

    if mode == "stage":
        qname = sys.argv[2]
        from jetro_spark.gate import all_queries
        fn = all_queries()[qname]
        df = fn(spark, SF_DIR)
        t = timed(df)
        print(f"{qname}: best {t:.4f}s")
        return


if __name__ == "__main__":
    main()
