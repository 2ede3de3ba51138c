"""LocalRelation fold (jetro_spark.localrel): the document-mode zero-job
path. One document = one row, so Catalyst's ConvertToLocalRelation rule
should evaluate Project-shaped doc queries eagerly on the driver.
"""

from __future__ import annotations

import pytest

from jetro_spark.jql.engine import Jetro
from jetro_spark.localrel import fresh_execute, is_local_plan, to_local_relation


DOC = {"orders": [{"id": i, "total": 100.0 * i, "status": "shipped" if i % 2 else "new"}
                  for i in range(1, 21)]}


def test_doc_frame_folds_to_local_relation(spark):
    jt = Jetro.from_value(spark, DOC)
    # The base frame itself is LocalRelation-backed...
    assert is_local_plan(jt.df)
    # ...and a Project-shaped query over it folds too: the optimized plan
    # is again a bare LocalRelation, i.e. zero Spark jobs at collect().
    df = jt.frame("$.orders.filter(total > 500).map(id)")
    assert is_local_plan(df)
    assert jt.collect("$.orders.filter(total > 500).map(id)") == [
        i for i in range(6, 21)]


def test_checkpoint_superseded_by_local_fold(spark):
    # Explicit checkpoint=True with local=True: the LocalRelation fold
    # already embeds the materialized rows — checkpoint is skipped and
    # the frame still folds.
    jt = Jetro.from_value(spark, DOC, checkpoint=True, local=True)
    assert is_local_plan(jt.df)


def test_checkpointed_path_still_correct(spark):
    # local=False keeps the distributed path (checkpoint truncates
    # lineage); results must match the folded path exactly.
    jt = Jetro.from_value(spark, DOC, checkpoint=True, local=False)
    assert not is_local_plan(jt.df)
    assert jt.collect("$.orders.map(total).sum()") == sum(
        100.0 * i for i in range(1, 21))


def test_fresh_execute_counts_rows(spark):
    jt = Jetro.from_value(spark, DOC)
    assert fresh_execute(jt.frame("$.orders.count()")) == 1


def test_fresh_execute_propagates_evaluation_errors(spark):
    # A genuine JVM-side evaluation error must raise, not be silently
    # rerouted to the distributed fallback (ADVICE r03).
    df = spark.range(1).selectExpr("assert_true(id > 0) as v")
    with pytest.raises(Exception) as exc_info:
        fresh_execute(df)
    assert exc_info.value is not None


def test_warm_query_counts_match_fresh(spark):
    # The warm compile-once handle must agree with the fresh-QueryExecution
    # path on every bench_lock query shape (count protocol: execute()).
    from jetro_spark.benchdoc import BENCH_QUERIES, synth_doc
    from jetro_spark.localrel import compile_warm

    jt = Jetro.from_value(spark, synth_doc(200, 3))
    for name, expr in BENCH_QUERIES.items():
        wq = compile_warm(jt.frame(expr))
        assert wq is not None, f"{name}: warm path unavailable"
        fresh = fresh_execute(jt.frame(expr))
        assert wq.run() == fresh, name
        # second run re-evaluates (same pinned rows → same count)
        assert wq.run() == fresh, name


def test_warm_query_reevaluates_not_caches_results(spark):
    # Two documents sharing one expression string must produce different
    # counts through their own warm handles — the handle pins rows, not
    # results, and evaluation happens per run().
    a = Jetro.from_value(spark, {"xs": [{"v": i} for i in range(4)]})
    b = Jetro.from_value(spark, {"xs": [{"v": i} for i in range(9)]})
    expr = "$.xs.filter(v >= 0).map(v)"
    assert a.execute(expr) == 1 and b.execute(expr) == 1
    assert a.collect(expr) == [0, 1, 2, 3]
    assert b.collect(expr) == list(range(9))


def test_warm_query_nondeterministic_falls_back(spark):
    # A nondeterministic projection must not get a warm handle (it would
    # need per-run initialization the py4j name-cache pitfall prevents).
    from jetro_spark.localrel import compile_warm
    import pyspark.sql.functions as F

    jt = Jetro.from_value(spark, DOC)
    df = jt.df.select((F.rand() * 10).alias("value"))
    assert compile_warm(df) is None


def test_to_local_relation_roundtrip(spark):
    df = spark.range(5).selectExpr("id", "id * 2 as dbl")
    lr = to_local_relation(df)
    assert lr is not None
    assert is_local_plan(lr)
    assert [(r["id"], r["dbl"]) for r in lr.collect()] == [
        (i, 2 * i) for i in range(5)]
