#!/usr/bin/env python
"""Self-check harness replicating the driver's correctness gate:
run every queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compare row-count + schema-width + order-insensitive value
multiset (columns sorted by name, doubles canonicalised).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py --sweep [query ...]

--sweep is the 10x gate mode: runs the gate at sf0.1 (override with
SPARK_GRAFT_SWEEP_DIR) with the all-pairs-oracle rows auto-skipped —
their DUCKDB legs are quadratic by design (exhaustive-pair ground
truth), so at 10x they dominate wall-clock without adding signal; the
Spark legs stay linear and are smoke-covered by pytest. The sweep has
caught real bugs sf0.01 missed (ANSI divide-by-zero, round() half-way
divergence), so run it before claiming a scale-sensitive change done.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# Rows whose DuckDB oracle is an exhaustive all-pairs replay too slow
# for the sweep. r9 promoted dedup_lsh / dedup_cluster / leak_split
# (Bayardo prefix-filter candidate join) and simhash_pairs (pigeonhole
# band bucket join) to BANDED oracles; r10 unskipped embed_neardup —
# its pair count is inherent (dense unit vectors defeat prefix
# filtering) but native list_dot_product + per-vector norm CTE makes
# the exhaustive replay sweep-fast (0.1 s at sf0.1). Empty: every gate
# row sweep-runs.
ALL_PAIRS_ORACLES: set[str] = set()

args = sys.argv[1:]
SWEEP = "--sweep" in args
if SWEEP:
    args = [a for a in args if a != "--sweep"]
    SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_DIR", "/root/testdata/sf0.1")
    ONLY = set(args)
else:
    SF_DIR = args[0] if args else "/root/testdata/sf0.01"
    ONLY = set(args[1:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return int(v)
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from jetro_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    try:
        # DuckDB >= 1.1 defaults ieee_floating_point_ops=true (float x/0
        # -> inf/nan); pin the NULL semantics the oracles are written
        # against. Unknown setting on the pinned 1.0.0 -> ignore.
        con.execute("SET ieee_floating_point_ops=false")
    except duckdb.Error:
        pass
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    n_skip = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if SWEEP and name in ALL_PAIRS_ORACLES:
            print(f"SKIP {name}: all-pairs oracle (quadratic) at sweep scale")
            n_skip += 1
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            from jetro_spark.gate.tolerance import TOLERANCE
            tol = TOLERANCE.get(name)
            if tol is None:
                print(f"weak {name}: rows={len(srows)} (no oracle) "
                      f"[{time.time()-t0:.1f}s]")
                n_weak += 1
                continue
            desc, check = tol
            try:
                problem = check(spark, con, SF_DIR, srows, scols)
            except Exception as e:
                problem = f"tolerance checker error: {type(e).__name__}: {e}"
            if problem:
                print(f"FAIL {name}: {problem}")
                n_fail += 1
            else:
                print(f"PASS {name} rows={len(srows)} (tolerance: {desc}) "
                      f"[{time.time()-t0:.1f}s]")
                n_pass += 1
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = rel.columns
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(c.lower() for c in dcols) and sorted(
            c.lower() for c in scols
        ) != sorted(c.lower() for c in dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            ms, md = multiset(srows, scols), multiset(drows, dcols)
            if ms != md:
                diff = [k for k in ms if ms[k] != md.get(k, 0)][:3]
                diffd = [k for k in md if md[k] != ms.get(k, 0)][:3]
                problems.append(f"values differ; spark-only≈{diff} duck-only≈{diffd}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    skip_note = f", {n_skip} skipped (all-pairs @ sweep)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), "
          f"{n_fail} fail{skip_note}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
