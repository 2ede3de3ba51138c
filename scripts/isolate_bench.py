#!/usr/bin/env python
"""Isolate-bench a subset of gate queries: warm + best-of-N noop-sink
timings for the row names given on the command line (guide §1.4).

Usage: python scripts/isolate_bench.py [-n ITERS] name [name ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from jetro_spark.session import get_spark
    from jetro_spark.gate import all_queries

    args = sys.argv[1:]
    iters = 5
    if args and args[0] == "-n":
        iters = int(args[1])
        args = args[2:]
    spark = get_spark("jetro_spark_isolate")
    queries = all_queries()
    queries["count_by"](spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()
    for name in args:
        df = queries[name](spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        print(f"{name:22s} min={samples[0]:.3f} med={samples[len(samples)//2]:.3f} max={samples[-1]:.3f}",
              flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
