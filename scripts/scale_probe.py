#!/usr/bin/env python
"""sf1.0 scale probe — r11 verdict item 5.

One 10x step beyond the sweep for the five heaviest gate rows
(dedup_spans, tfidf_embed, gram_overlap, ngram_lm, semantic_dedup):
confirm the PLAN SHAPES hold — same exchange count, same join
strategies, no new shuffle — before anyone trusts the 100 TB story.

The driver testdata tops out at sf0.1 (read-only), so this script
synthesizes a 10x documents/embeddings upscale into /tmp/sfprobe1.0:
each source row is replicated 10x with perturbed ids; 3 of 10 text
replicas get a per-replica suffix token so dedup operators see both
EXACT duplicate mass (realistic at corpus scale, and adversarial for
the dedup rows — more duplicate work, not less) and near-duplicate
tails. Deterministic (seeded) so runs are comparable.

Usage: python scripts/scale_probe.py [--times]   # plan diff always;
                                                 # --times also reports
                                                 # wall-clock per row
Writes nothing outside /tmp; results are summarized by hand into
SCALE.md (r11 section).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_DIR = "/tmp/sfprobe1.0"
DEEP_DIR = "/tmp/sfprobe3.0"
SRC_DIR = "/root/testdata/sf0.1"
ROWS = ["dedup_spans", "tfidf_embed", "gram_overlap", "ngram_lm",
        "semantic_dedup",
        # r12 (verdict item 5): the pre-collapsed retention row, the
        # remaining heavy embed row, and an ordered-collect row — the
        # other single-reducer-risk family
        "semantic_keep", "hash_embed", "implode"]
# r12: one decade FURTHER for the rows whose doc_id LeftOuter flipped
# broadcast→SMJ at sf1.0 — confirm post-flip stability (no second
# strategy change) by comparing sf1.0 vs the 30x sf3-equivalent
DEEP_ROWS = ["tfidf_embed", "ngram_lm", "hash_embed"]


def build_probe_data(spark) -> None:
    from pyspark.sql import functions as F

    # marker v2: r12 added the lineitem upscale (implode row) — a
    # stale r11 probe dir must rebuild
    if os.path.exists(os.path.join(PROBE_DIR, "_built3")):
        return
    docs = spark.read.parquet(f"{SRC_DIR}/documents.parquet")
    n_docs = docs.count()
    reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    up = (docs.select("*", reps)
          .select(
              (F.col("doc_id") + F.col("rep") * F.lit(n_docs))
              .alias("doc_id"),
              # reps 0-6: byte-exact duplicates; reps 7-9: a suffix
              # token makes near-dups (span/gram overlap, not equality)
              F.when(F.col("rep") < 7, F.col("text"))
              .otherwise(F.concat_ws(" ", F.col("text"),
                                     F.concat(F.lit("rep"),
                                              F.col("rep").cast("string"))))
              .alias("text"),
              "lang", "source", "n_chars"))
    up.repartition(32).write.mode("overwrite") \
        .parquet(f"{PROBE_DIR}/documents.parquet")

    emb = spark.read.parquet(f"{SRC_DIR}/embeddings.parquet")
    n_emb = emb.count()
    up_e = (emb.select("*", reps)
            .select(
                (F.col("vec_id") + F.col("rep") * F.lit(n_emb))
                .alias("vec_id"),
                # r12: match the documents recipe — reps 0-6 BYTE-EXACT
                # duplicates (the mass the retention pre-collapse must
                # absorb; the r11 all-perturbed upscale gave the
                # collapse nothing to collapse), reps 7-9 near-dups via
                # a tiny first-component perturbation
                F.when(F.col("rep") < 7, F.col("embedding"))
                .otherwise(F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == 0, x + F.col("rep").cast("float") / 1000.0)
                    .otherwise(x))).alias("embedding"),
                "label"))
    up_e.repartition(8).write.mode("overwrite") \
        .parquet(f"{PROBE_DIR}/embeddings.parquet")
    # implode reads lineitem: replicate 10x with disjoint orderkeys so
    # the ordered-collect groupBy really sees 10x the groups
    li = spark.read.parquet(f"{SRC_DIR}/lineitem.parquet")
    kmax = li.agg(F.max("l_orderkey")).first()[0] + 1
    up_l = (li.select("*", reps)
            .withColumn("l_orderkey",
                        F.col("l_orderkey") + F.col("rep") * F.lit(kmax))
            .drop("rep"))
    up_l.repartition(32).write.mode("overwrite") \
        .parquet(f"{PROBE_DIR}/lineitem.parquet")

    # remaining tables: link so any incidental load resolves
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "events"):
        dst = f"{PROBE_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC_DIR}/{t}.parquet", dst)
    open(os.path.join(PROBE_DIR, "_built3"), "w").write("ok")


def build_deep_data(spark) -> None:
    """30x documents-only upscale (the DEEP_ROWS read documents): same
    replication recipe as the 10x build — 70% byte-exact, 30% suffixed
    near-dups — three decades above the sweep."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DEEP_DIR, "_built")):
        return
    docs = spark.read.parquet(f"{SRC_DIR}/documents.parquet")
    n_docs = docs.count()
    reps = F.explode(F.sequence(F.lit(0), F.lit(29))).alias("rep")
    up = (docs.select("*", reps)
          .select(
              (F.col("doc_id") + F.col("rep") * F.lit(n_docs))
              .alias("doc_id"),
              F.when(F.col("rep") % 10 < 7, F.col("text"))
              .otherwise(F.concat_ws(" ", F.col("text"),
                                     F.concat(F.lit("rep"),
                                              F.col("rep").cast("string"))))
              .alias("text"),
              "lang", "source", "n_chars"))
    up.repartition(32).write.mode("overwrite") \
        .parquet(f"{DEEP_DIR}/documents.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        dst = f"{DEEP_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC_DIR}/{t}.parquet", dst)
    open(os.path.join(DEEP_DIR, "_built"), "w").write("ok")


def plan_shape(df) -> list[str]:
    """Physical plan → structural signature: one line per operator node,
    ids/sizes/paths stripped, Exchange/Join/Aggregate kinds kept."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in txt.splitlines():
        m = re.match(r"^[\s:+\-*()]*([A-Za-z]+[A-Za-z0-9]*)", line)
        if not m:
            continue
        node = m.group(1)
        if node in ("Exchange", "BroadcastExchange", "Sort", "HashAggregate",
                    "ObjectHashAggregate", "SortAggregate", "SortMergeJoin",
                    "BroadcastHashJoin", "ShuffledHashJoin", "Scan",
                    "FileScan", "Generate", "Window", "MapInPandas",
                    "CartesianProduct", "BroadcastNestedLoopJoin"):
            detail = ""
            if node == "Exchange":
                detail = " hashpartitioning" if "hashpartitioning" in line \
                    else (" rangepartitioning" if "rangepartitioning" in line
                          else " single")
            out.append(node + detail)
    return out


def neardup_probe(spark) -> int:
    """r13 (verdict item 4): near-dup-heavy retention probe. The r12
    probe's duplicate mass was 70% byte-exact — which the retention
    pre-collapse absorbs, so the quadratic pair join never saw the hot
    cell. Here the hot cell is N PERTURBED near-identical vectors
    (every byte distinct — the pre-collapse absorbs NOTHING) plus a
    spread background; retention runs unbounded and with the
    sqrt-of-pair-budget max_cell, reporting wall and survivors for
    SCALE.md. Semantics note: a capped cell is EXCLUDED from pairing
    (documented drop) — its members all survive; the cap trades
    within-cell dedup for a bounded pair join."""
    import math

    from pyspark.sql import functions as F

    from jetro_spark.llm.dedup import semantic_dedup

    dim, n_hot, n_bg = 16, 8000, 10000
    base = [1.0] + [0.0] * (dim - 1)
    cents = []
    for c in range(8):
        v = [0.0] * dim
        v[2 * c % dim] = math.cos(c)
        v[(2 * c + 1) % dim] = math.sin(c) + 0.1
        cents.append((c, v))
    cents[0] = (0, base)
    hot = spark.range(n_hot).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(i == 1, F.col("id").cast("double") / 1e9)
            .otherwise(F.when(i == 0, F.lit(1.0)).otherwise(F.lit(0.0)))
        ).alias("embedding"))
    bg = spark.range(n_bg).select(
        (F.col("id") + n_hot).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.sin(F.col("id").cast("double") * (i + 1) * 0.37)
        ).alias("embedding"))
    df = hot.unionByName(bg).repartition(32).localCheckpoint(eager=True)
    budget = 1_000_000  # affordable within-cell comparisons per cell
    cap = int(math.sqrt(2 * budget))  # n(n-1)/2 <= budget → n ~ sqrt(2B)
    print(f"near-dup probe: hot cell n={n_hot} "
          f"(~{n_hot * (n_hot - 1) // 2:,} unbounded pairs), "
          f"background n={n_bg}, max_cell=sqrt(2·{budget:,})={cap}")
    for label, mc in (("unbounded", None), (f"max_cell={cap}", cap)):
        t0 = time.time()
        out = semantic_dedup(df, cents, threshold=0.95, max_cell=mc)
        survivors = out.count()
        wall = time.time() - t0
        print(f"  retention {label:18} wall={wall:7.2f}s "
              f"survivors={survivors}")
    return 0


def union_take_probe(spark) -> int:
    """r14 (verdict item 6): the window guard's price at scale. A
    `$.s.union($.u).sort(v).take(10)` pipeline marks _has_union, so
    the positional pick lowers through engine._ordered_prefix (a
    row_number window with no partitionBy — a single-partition global
    sort) instead of orderBy().limit()'s TakeOrderedAndProject top-n
    heap. This measures the SAME engine pipeline with the guard on
    (production lowering) and with _ordered_prefix monkeypatched to
    the raw offset/limit form (the shape AQE can mis-drop), reporting
    wall clock + exchange/sort counts over a 500k+500k-row union —
    numbers for SCALE.md's "the re-derived pushdown limit restores
    most of the pruning" claim."""
    from pyspark.sql import functions as F

    from jetro_spark.jql import engine as E

    n = 500_000
    s = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2654435761 % 1000003).cast("double").alias("v"))
    u = spark.range(n).select(
        (F.col("id") + n).alias("k"),
        ((F.col("id") + n) * 2654435761 % 1000003 + 0.5).cast("double")
        .alias("v"))
    s = s.localCheckpoint(eager=True)
    u = u.localCheckpoint(eager=True)
    expr = "$.s.union($.u).sort(v).take(10)"

    def raw_prefix(self, df, order, k, offset=0):
        out = df.orderBy(*E._order_by(order))
        if offset:
            out = out.offset(offset)
        return out if k is None else out.limit(k)

    orig = E.JetroTables._ordered_prefix
    for label, impl in (("window-guard (production)", orig),
                        ("raw orderBy().limit()", raw_prefix)):
        E.JetroTables._ordered_prefix = impl
        try:
            df = E.JetroTables(spark, {"s": s, "u": u}).query(expr)
            df.write.format("noop").mode("overwrite").save()  # warm
            walls = []
            for _ in range(3):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            shape = plan_shape(df)
            n_ex = sum(1 for x in shape if x.startswith("Exchange"))
            n_sort = sum(1 for x in shape if x == "Sort")
            print(f"  {label:28} wall(best of 3)={min(walls):6.2f}s "
                  f"exchanges={n_ex} sorts={n_sort}")
            print(f"    shape: {shape}")
        finally:
            E.JetroTables._ordered_prefix = orig
    return 0


def main() -> int:
    times = "--times" in sys.argv
    if "--neardup" in sys.argv:
        from jetro_spark.session import get_spark  # noqa: PLC0415
        return neardup_probe(get_spark())
    if "--uniontake" in sys.argv:
        from jetro_spark.session import get_spark  # noqa: PLC0415
        return union_take_probe(get_spark())
    from jetro_spark.session import get_spark  # noqa: PLC0415

    try:
        spark = get_spark()
    except Exception:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .config("spark.sql.shuffle.partitions", "32")
                 .config("spark.driver.memory", "48g")
                 .config("spark.sql.legacy.parquet.nanosAsLong", "true")
                 .config("spark.ui.enabled", "false").getOrCreate())
    os.makedirs(PROBE_DIR, exist_ok=True)
    build_probe_data(spark)

    from jetro_spark.gate import all_queries  # noqa: PLC0415
    qs = all_queries()
    failures = 0
    for name in ROWS:
        fn = qs[name]
        shapes, wall = {}, {}
        for label, d in (("sf0.1", SRC_DIR), ("sf1.0", PROBE_DIR)):
            df = fn(spark, d)
            t0 = time.time()
            # noop sink like bench.py: count() would PRUNE projections
            # and measure a different (often trivial) plan
            df.write.format("noop").mode("overwrite").save()
            wall[label] = time.time() - t0
            shapes[label] = plan_shape(df)
            print(f"{name} @ {label}"
                  + (f" wall={wall[label]:.2f}s" if times else ""),
                  flush=True)
        if shapes["sf0.1"] == shapes["sf1.0"]:
            print(f"{name}: plan shape IDENTICAL "
                  f"({len(shapes['sf0.1'])} tracked nodes)")
        else:
            failures += 1
            print(f"{name}: PLAN SHAPE DIVERGED")
            a, b = shapes["sf0.1"], shapes["sf1.0"]
            for i in range(max(len(a), len(b))):
                l1 = a[i] if i < len(a) else "<missing>"
                l2 = b[i] if i < len(b) else "<missing>"
                mark = " " if l1 == l2 else "!"
                print(f"  {mark} {l1:40} | {l2}")
    print(f"\n{len(ROWS) - failures}/{len(ROWS)} rows shape-stable at sf1.0")

    # deep leg: sf1.0 vs sf3.0 for the SMJ-flipped rows — the flip
    # already happened by sf1.0, so these must be shape-IDENTICAL
    build_deep_data(spark)
    deep_failures = 0
    for name in DEEP_ROWS:
        fn = qs[name]
        shapes, wall = {}, {}
        for label, d in (("sf1.0", PROBE_DIR), ("sf3.0", DEEP_DIR)):
            df = fn(spark, d)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall[label] = time.time() - t0
            shapes[label] = plan_shape(df)
            print(f"{name} @ {label}"
                  + (f" wall={wall[label]:.2f}s" if times else ""),
                  flush=True)
        if shapes["sf1.0"] == shapes["sf3.0"]:
            print(f"{name}: deep plan shape IDENTICAL "
                  f"({len(shapes['sf1.0'])} tracked nodes)")
        else:
            deep_failures += 1
            print(f"{name}: DEEP PLAN SHAPE DIVERGED (sf1.0 -> sf3.0)")
            a, b = shapes["sf1.0"], shapes["sf3.0"]
            for i in range(max(len(a), len(b))):
                l1 = a[i] if i < len(a) else "<missing>"
                l2 = b[i] if i < len(b) else "<missing>"
                mark = " " if l1 == l2 else "!"
                print(f"  {mark} {l1:40} | {l2}")
    print(f"{len(DEEP_ROWS) - deep_failures}/{len(DEEP_ROWS)} deep rows "
          f"shape-stable at sf3.0")
    return 1 if (failures or deep_failures) else 0


if __name__ == "__main__":
    sys.exit(main())
