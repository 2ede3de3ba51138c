#!/usr/bin/env python
"""r14 experiment: time every headline row with base tables round-robin
repartitioned right after the scan (restoring the parallelism the
single-row-group bench files deny — guide §2.5), vs the committed base.

Purely a measurement harness; results decide which gate queries adopt
the adaptive fan-out. Usage:
  python scripts/r14_fan_experiment.py <nparts> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NPARTS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ONLY = set(sys.argv[2:])

# tables worth fanning (dims excluded)
FAN_TABLES = {"documents", "embeddings", "lineitem", "orders", "events",
              "customer", "part"}


def main() -> None:
    import jetro_spark.session as S
    from jetro_spark.session import get_spark

    spark = get_spark("r14_fan_experiment")
    orig = S.load_tables

    def fanned(spark, sf_dir=S.DEFAULT_SF_DIR, register=True):
        dfs = orig(spark, sf_dir, register=register)
        out = {}
        for name, df in dfs.items():
            out[name] = df.repartition(NPARTS) if name in FAN_TABLES else df
        return out

    # rebind in every module that did `from jetro_spark.session import
    # load_tables`
    S.load_tables = fanned
    for mod in list(sys.modules.values()):
        if mod and getattr(mod, "load_tables", None) is orig:
            mod.load_tables = fanned

    from jetro_spark.gate import all_queries
    import bench

    queries = all_queries()
    timings = {}
    for name in bench.HEADLINE:
        if ONLY and name not in ONLY:
            continue
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(5):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(min(samples), 4)
        except Exception as e:  # noqa: BLE001 — record and continue
            timings[name] = f"ERR {type(e).__name__}"
        print(name, timings[name], flush=True)
    with open(f"/tmp/fan_experiment_{NPARTS}.json", "w") as fh:
        json.dump(timings, fh, indent=1)


if __name__ == "__main__":
    main()
