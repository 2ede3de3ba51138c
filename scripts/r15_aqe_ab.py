#!/usr/bin/env python
"""r15 AQE-floor adjudication (VERDICT r14 item 1): interleaved
PROCESS-LEVEL A/B of SPARK_GRAFT_AQE_MIN_PART values over the regressed
small-row cluster plus the 64k-floor beneficiaries as controls.

Each variant runs in its own process (the conf is session-level), and
variants alternate A,B,B,A,A,B,... so box drift and JIT position bias
cancel. Reports per-row minima per variant.

Usage: python scripts/r15_aqe_ab.py [rounds] [floorA floorB]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    # regressed cluster (PERF_r14): sub-0.2 s scan-light rows
    "jql_filter_map", "jql_sort_take", "jql_equi_join", "jql_count_by",
    "histogram", "doc_mixture", "count_by", "funnel",
    # the larger unexplained mover
    "group_quantiles",
    # controls: the documented 64k-floor beneficiaries — a revert must
    # not lose these
    "semantic_keep", "win_rolling", "any_all", "win_zscore",
]

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(here)r)
from jetro_spark.session import get_spark
from jetro_spark.gate import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
rows = %(rows)r
spark = get_spark("r15_aqe_ab")
qs = all_queries()
qs["count_by"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
out = {}
for name in rows:
    df = qs[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    out[name] = round(best, 4)
print("RESULT " + json.dumps(out))
"""


def run_variant(floor: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_AQE_MIN_PART"] = floor
    code = WORKER % {"here": HERE, "rows": ROWS}
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1200)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"variant {floor} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fa = sys.argv[2] if len(sys.argv) > 2 else "64k"
    fb = sys.argv[3] if len(sys.argv) > 3 else "1m"
    mins: dict[str, dict[str, float]] = {fa: {}, fb: {}}
    # ABBA ordering per round-pair to cancel position bias
    seq = []
    for i in range(rounds):
        seq += [fa, fb] if i % 2 == 0 else [fb, fa]
    for i, fl in enumerate(seq):
        res = run_variant(fl)
        for k, v in res.items():
            cur = mins[fl].get(k)
            mins[fl][k] = v if cur is None or v < cur else cur
        print(f"[{i+1}/{len(seq)}] floor={fl}: " + json.dumps(res), flush=True)
    print("\n=== minima ===")
    print(f"{'row':22s} {fa:>10s} {fb:>10s}  {fb}/{fa}")
    for k in ROWS:
        a, b = mins[fa].get(k), mins[fb].get(k)
        if a and b:
            print(f"{k:22s} {a:10.4f} {b:10.4f}  {b/a:6.2f}")


if __name__ == "__main__":
    main()
