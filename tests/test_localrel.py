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


# ---------------------------------------------- Spark Connect degradation
#
# The classic py4j surface (_jvm/_jdf) is absent under Spark Connect.
# Every localrel entry point must degrade to None there, and doc mode
# must stay CORRECT through its documented fallbacks (RDD-backed frames,
# noop-sink execute). The degraded path is simulated by making
# _jvm_bits raise the same surface-missing error Connect raises; the
# real-Connect-session test runs when grpcio is available, and otherwise
# asserts the capability gap itself (never a skip — see its docstring).


def _break_jvm_surface(monkeypatch):
    import jetro_spark.localrel as L

    def boom(df):
        raise AttributeError("'SparkSession' object has no attribute '_jvm'")
    monkeypatch.setattr(L, "_jvm_bits", boom)


def test_capability_probe(spark):
    from jetro_spark.localrel import has_classic_surface
    assert has_classic_surface(spark) is True

    class FakeConnectSession:
        pass
    assert has_classic_surface(FakeConnectSession()) is False


def test_degraded_entry_points_return_none(spark, monkeypatch):
    from jetro_spark import localrel as L
    _break_jvm_surface(monkeypatch)
    df = spark.range(3)
    assert L.to_local_relation(df) is None
    assert L.compile_warm(df) is None
    assert L.fresh_execute(df) is None


def test_doc_mode_correct_without_classic_surface(spark, monkeypatch):
    """collect() results must be identical through the degraded path —
    only the zero-job fold is lost, not semantics."""
    _break_jvm_surface(monkeypatch)
    jt = Jetro.from_value(spark, DOC)
    assert jt.collect("$.orders.filter(total > 500).map(id)") == \
        list(range(6, 21))
    assert jt.collect("$.orders.map(total).sum()") == 21000.0
    # execute(): warm handle unavailable -> noop-sink materialization,
    # row count unknowable without a second run -> -1 by contract
    assert jt.execute("$.orders.map(id)") == -1


def test_relational_fallback_size_check_degrades(spark, monkeypatch):
    """The doc-fallback size refusal needs a plan-size estimate; without
    one (Spark Connect) it must warn-and-continue, not crash — even with
    a tiny ceiling configured."""
    import jetro_spark.jql.engine as E
    monkeypatch.setenv("JETRO_FALLBACK_MAX_BYTES", "10")
    monkeypatch.setattr(E, "plan_size_estimate", lambda df: None)
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "k long, v double")
    jt = E.JetroTables(spark, {"s": df})
    with pytest.warns(UserWarning, match="no relational lowering"):
        out = jt.query("$.s.sort(k).map(v).accumulate((a, x) => a * x, 1.0)")
        assert [r["v"] for r in out.collect()] == [2.0, 6.0]


def _grpc_available() -> bool:
    try:
        import grpc  # noqa: F401
        return True
    except ImportError:
        return False


def test_doc_mode_over_real_connect_session_or_probe():
    """Both legs of the Connect matrix, never a skip: with grpcio
    importable, stand up a real local Connect session and run doc mode
    over it; without it, ASSERT the gap is precisely the grpcio
    capability (pyspark's own Connect package present, failing with its
    PACKAGE_NOT_INSTALLED grpcio error) — so a packaging regression
    (Connect module missing/broken for any other reason) fails the test
    instead of hiding behind a skip. The degradation semantics
    themselves are covered by the simulated tests above, which exercise
    the exact surface-missing path a Connect session takes.

    Blocker status (r8): grpcio is absent here and package installation
    is prohibited in this build environment (no pip/apt by policy), so
    the live leg stays environment-blocked, not code-blocked — any
    environment that ships grpcio runs it with no code change."""
    if not _grpc_available():
        with pytest.raises(ImportError, match="grpcio"):
            import pyspark.sql.connect.session  # noqa: F401
        return
    from pyspark.sql import SparkSession
    remote = SparkSession.builder.remote("local[2]").getOrCreate()
    try:
        from jetro_spark.localrel import has_classic_surface
        assert has_classic_surface(remote) is False
        jt = Jetro.from_value(remote, DOC)
        assert jt.collect("$.orders.filter(total > 500).map(id)") == \
            list(range(6, 21))
    finally:
        remote.stop()


def test_local_doc_frame_zero_job_and_values(spark):
    """The r7 zero-job ingest: builds a LocalRelation without any Spark
    job (no data-bearing task), value-identical to the createDataFrame
    path, UnsafeRow-backed."""
    from pyspark.sql import functions as F

    from jetro_spark.localrel import is_local_plan, local_doc_frame
    from jetro_spark.jql.engine import infer_schema

    doc = {"a": [1, 2, 3], "b": {"x": "y"}, "c": 1.5, "d": None}
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = local_doc_frame(spark, doc, infer_schema(doc))
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert df is not None
    assert after == before          # construction launched NO job
    assert is_local_plan(df)
    row = df.first()["__doc"]
    assert list(row["a"]) == [1, 2, 3]
    assert row["b"]["x"] == "y"
    assert row["c"] == 1.5
    assert row["d"] is None


def test_local_doc_frame_falls_back_on_variant(spark):
    from pyspark.sql import types as T

    from jetro_spark.localrel import local_doc_frame

    schema = T.StructType([T.StructField("v", T.VariantType())])
    assert local_doc_frame(spark, {"v": 1}, schema) is None


def test_local_doc_frame_falls_back_on_unserializable(spark):
    from jetro_spark.localrel import local_doc_frame
    from jetro_spark.jql.engine import infer_schema

    ok = {"a": 1}
    assert local_doc_frame(spark, {"a": object()},
                           infer_schema(ok)) is None


def test_eval_local_project_rejects_non_project(spark):
    from jetro_spark.localrel import eval_local_project

    # an aggregate over a table scan is not Project-over-OneRow/Local
    df = spark.range(10).groupBy().count()
    assert eval_local_project(df) is None
