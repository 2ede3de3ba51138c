"""Driver-local execution for small documents via LocalRelation folding.

Document-mode queries operate on ONE row (the document), so distributing
them buys nothing: a single-task Spark job costs ~40-80 ms of scheduler
dispatch regardless of the work inside. Catalyst already has the right
tool — the ``ConvertToLocalRelation`` optimizer rule evaluates
Project/Filter plans over a ``LocalRelation`` eagerly on the driver, so
``collect()``/``executeCollect()`` return without launching a single job.

PySpark's ``createDataFrame`` builds a ``LogicalRDD`` (data enters through
an RDD of pickled rows), which that rule cannot see.  ``to_local_relation``
materializes a DataFrame once and rebuilds it as a true JVM
``LocalRelation``, flipping every downstream Project-shaped query onto the
zero-job path.  Table-scale data must NOT go through here — this is the
single-node small-data path; the distributed path (parquet scans,
checkpointed docs) is unchanged.  Reference parity: jetro evaluates the
whole document in-process on one thread (jc/lib.rs:477 collect); this is
the Spark-idiomatic equivalent for data that fits in one hand.

Uses py4j access to Spark-internal classes (stable across Spark 4.x
classic; absent under Spark Connect) — every entry point degrades
gracefully to ``None`` so callers can fall back to the RDD-backed path.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

try:  # py4j ships with classic pyspark; absent under pure Spark Connect
    from py4j.protocol import Py4JError, Py4JJavaError
except ImportError:  # pragma: no cover
    class Py4JJavaError(Exception):  # type: ignore[no-redef]
        pass

    class Py4JError(Exception):  # type: ignore[no-redef]
        pass

# Surface-availability failures only: a missing _jvm/_jdf attribute
# (Spark Connect), a wrong-arity internal API (version drift), or a py4j
# protocol error that is NOT a JVM-side exception. A Py4JJavaError means
# the JVM call ran and threw — that is a genuine query-evaluation error
# (AnalysisException, codegen failure, ...) and must propagate, not be
# silently rerouted to a distributed re-run with its context lost.
_UNAVAILABLE = (AttributeError, TypeError, Py4JError)


def _surface_missing(exc: Exception) -> bool:
    return isinstance(exc, _UNAVAILABLE) and not isinstance(exc, Py4JJavaError)


def has_classic_surface(spark) -> bool:
    """Capability probe: True when the session exposes the classic py4j
    JVM surface (`_jvm` / `_jsparkSession`) that the LocalRelation fold
    and warm-query paths need. False under Spark Connect, where every
    caller takes its documented degradation:

    - ``to_local_relation`` → None (doc frames stay RDD-backed; queries
      run as regular 1-row distributed jobs — correct, ~40-80 ms/job)
    - ``compile_warm`` / ``fresh_execute`` → None (``execute()`` times a
      noop-sink materialization and reports -1 rows)
    - the doc-fallback size refusal degrades to warn-only (no plan
      statistics without a QueryExecution handle)
    """
    try:
        return (getattr(spark, "_jvm", None) is not None
                and getattr(spark, "_jsparkSession", None) is not None)
    except Exception:
        return False


def _jvm_bits(df: DataFrame):
    spark = df.sparkSession
    jvm = spark._jvm  # type: ignore[attr-defined]
    jspark = spark._jsparkSession  # type: ignore[attr-defined]
    return spark, jvm, jspark


def to_local_relation(df: DataFrame) -> DataFrame | None:
    """Execute ``df`` once and rebuild it as a LocalRelation-backed frame.

    Returns None when the JVM surface is unavailable (Spark Connect,
    future version drift) — callers fall back to the distributed path.
    """
    try:
        spark, jvm, jspark = _jvm_bits(df)
        qe = df._jdf.queryExecution()  # type: ignore[attr-defined]
        rows = qe.executedPlan().executeCollect()
        attrs = qe.optimizedPlan().output()
        jlist = jvm.java.util.ArrayList()
        for r in rows:
            jlist.add(r.copy())
        seq = jvm.org.apache.spark.api.python.PythonUtils.toSeq(jlist)
        local_relation = jvm.org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        stream_none = getattr(local_relation, "apply$default$4")()
        lr = local_relation(attrs, seq, False, stream_none)
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(jspark, lr)
        return DataFrame(jdf, spark)
    except Exception as exc:
        if _surface_missing(exc):
            return None
        raise


def local_doc_frame(spark, value, schema) -> DataFrame | None:
    """Build the one-row ``__doc`` frame as a LocalRelation WITHOUT a
    Spark job or a data-bearing task.

    ``to_local_relation`` on a ``createDataFrame`` frame must run one
    job whose single task embeds the whole pickled document — harmless
    semantically, but a multi-MB task (TaskSetManager warns above
    1000 KiB) that ships the doc through the scheduler instead of the
    driver evaluating it in place. This path keeps the document
    driver-side end to end: serialize to JSON, plan
    ``from_json(lit(json), schema)`` over ``SELECT 1``'s
    OneRowRelation, and evaluate that Project's expressions directly
    (``eval_local_project``) — the JSON parse happens in the JVM on
    the driver thread, zero jobs, zero tasks.

    FAILFAST + a null check guard fidelity: the JSON round-trip is
    exact for the document value space (documents ARE parsed JSON), and
    any parse surprise raises or returns null → caller falls back to
    the createDataFrame path. Returns None when the value doesn't
    JSON-serialize, the schema contains VariantType (from_json's
    variant handling is not bit-pinned against our _to_row), or the
    classic JVM surface is unavailable.
    """
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _has_variant(dt) -> bool:
        if isinstance(dt, T.StructType):
            return any(_has_variant(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _has_variant(dt.elementType)
        if isinstance(dt, T.MapType):
            return _has_variant(dt.keyType) or _has_variant(dt.valueType)
        return dt.typeName() == "variant"

    if _has_variant(schema):
        return None
    try:
        js = _json.dumps(value)
    except (TypeError, ValueError):
        return None
    try:
        one = spark.sql("SELECT 1")
        df = one.select(F.from_json(F.lit(js), schema,
                                    {"mode": "FAILFAST"}).alias("__doc"))
        return eval_local_project(df, reject_all_null=True)
    except Exception as exc:
        if _surface_missing(exc):
            return None
        raise


def eval_local_project(df: DataFrame,
                       reject_all_null: bool = False) -> DataFrame | None:
    """Evaluate a Project over OneRowRelation/1-row-LocalRelation
    DRIVER-SIDE (interpreted expression eval, no job) and rebuild the
    result as a LocalRelation frame. Returns None when the plan isn't
    that shape, the surface is missing, or (``reject_all_null``) every
    output value evaluated to null — the from_json-sentinel for a
    parse the FAILFAST mode didn't catch."""
    try:
        spark, jvm, jspark = _jvm_bits(df)
        qe = df._jdf.queryExecution()  # type: ignore[attr-defined]
        plan = qe.optimizedPlan()
        if plan.nodeName() != "Project":
            return None
        child = plan.child()
        if child.nodeName() == "OneRowRelation":
            input_row = jvm.org.apache.spark.sql.catalyst.expressions \
                .GenericInternalRow(
                    spark._sc._gateway.new_array(jvm.java.lang.Object, 0))
        elif child.nodeName() == "LocalRelation" and child.data().size() == 1:
            input_row = child.data().apply(0)
        else:
            return None
        pl = plan.projectList()
        n = pl.size()
        arr = spark._sc._gateway.new_array(jvm.java.lang.Object, n)
        all_null = True
        for i in range(n):
            v = pl.apply(i).eval(input_row)
            if v is not None:
                all_null = False
            arr[i] = v
        if reject_all_null and all_null:
            return None
        out_row = jvm.org.apache.spark.sql.catalyst.expressions \
            .GenericInternalRow(arr)
        jlist = jvm.java.util.ArrayList()
        jlist.add(out_row)
        seq = jvm.org.apache.spark.api.python.PythonUtils.toSeq(jlist)
        # Convert the generic row (Jackson-built GenericInternalRow /
        # GenericArrayData trees for from_json) to the compact UnsafeRow
        # layout executeCollect would have produced — downstream
        # expression eval over UnsafeArrayData is substantially faster
        # (bl_q10 measured 72 ms unsafe vs 130 ms generic). The
        # projection is passed as an ARGUMENT to Seq.map (a stable-class
        # receiver) and never invoked through py4j directly — see the
        # generated-class name-cache pitfall on WarmQuery.
        outs = plan.output()
        dts = spark._sc._gateway.new_array(
            jvm.org.apache.spark.sql.types.DataType, n)
        for i in range(n):
            dts[i] = outs.apply(i).dataType()
        uproj = jvm.org.apache.spark.sql.catalyst.expressions \
            .UnsafeProjection.create(dts)
        # strict map over a 1-row List; the projection's reused output
        # buffer is safe at size 1 (nothing reapplies it)
        seq = seq.map(uproj)
        local_relation = jvm.org.apache.spark.sql.catalyst.plans.logical \
            .LocalRelation
        stream_none = getattr(local_relation, "apply$default$4")()
        lr = local_relation(plan.output(), seq, False, stream_none)
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(jspark, lr)
        return DataFrame(jdf, spark)
    except Exception as exc:
        if _surface_missing(exc):
            return None
        raise


def plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate in bytes; None when the
    estimate is unavailable (Spark Connect: no QueryExecution handle) or
    is the >= 2^60 "unknown" sentinel (spark.sql.defaultSizeInBytes =
    Long.Max for local/unstatted relations) — only a REAL estimate (e.g.
    from file-source statistics) is returned."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()  # type: ignore[attr-defined]
                  .stats().sizeInBytes())
        return est if est < (1 << 60) else None
    except Exception as exc:
        if _surface_missing(exc):
            return None
        raise


def is_local_plan(df: DataFrame) -> bool:
    """True when the optimized plan folded to a bare LocalRelation —
    i.e. the query evaluates driver-side with no job."""
    try:
        opt = df._jdf.queryExecution().optimizedPlan()  # type: ignore[attr-defined]
        return opt.nodeName() == "LocalRelation"
    except Exception as exc:
        if _surface_missing(exc):
            return False
        raise


class WarmQuery:
    """Compile-once / evaluate-per-call handle for a doc-mode query.

    ``run()`` re-evaluates the FULL optimized expression tree over the
    pinned input rows — the work the reference re-does per iteration
    under its warm plan cache (bench_lock.rs:11-18) — while analysis,
    optimization, and projection codegen were paid once at build time.

    py4j pitfall: every generated projection class is named
    ``GeneratedClass$SpecificSafeProjection`` and py4j's reflection
    cache is keyed by class NAME, so calling a method on a *second*
    generated instance dispatches through the first instance's Method
    objects (IllegalArgumentException: object is not an instance of
    declaring class). Never invoke the projection directly — pass it as
    an ARGUMENT to a stable-class receiver: ``rows.map(projection)`` on
    the Scala Seq evaluates the projection against every row JVM-side.
    """

    def __init__(self, jproj, jrows):
        self._proj = jproj
        self._rows = jrows
        # Project is 1:1, so the result count equals the pinned input
        # count — computed once here, saving a py4j roundtrip per run.
        self._n = jrows.size()

    def run(self) -> int:
        """Evaluate the projection over the pinned rows; row count.

        ``data()`` is a strict Scala List; ``foreach`` evaluates the
        projection against every row eagerly without building a result
        List. The generated projection reuses one mutable output row
        across apply() calls — fine here (the result rows are never
        read; the evaluation itself is the product for execute()'s
        count-only contract)."""
        self._rows.foreach(self._proj)
        return self._n


# Catalyst evaluates Project-over-LocalRelation at OPTIMIZATION time via
# this rule — excluded during warm compile so the optimized plan keeps
# the (simplified) expression tree instead of the pre-computed answer.
_FOLD_RULE = "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"
_WARM_COMPILE_LOCK = threading.Lock()


def compile_warm(df: DataFrame) -> WarmQuery | None:
    """Build the warm-execution handle for a Project-over-LocalRelation
    frame: optimize once with the local-fold rule excluded (all
    expression-level rules still run; nothing is pre-evaluated), then
    codegen a SafeProjection from the optimized project list.

    Returns None — callers fall back to ``fresh_execute`` — when the
    JVM surface is missing (Spark Connect), the optimized plan is not a
    bare Project over LocalRelation, or any expression is
    nondeterministic (re-evaluating those warm would need per-run
    initialization, which the py4j name-cache pitfall above prevents).
    """
    try:
        spark, jvm, jspark = _jvm_bits(df)
        key = "spark.sql.optimizer.excludedRules"
        # the conf is session-global: serialize the set/optimize/restore
        # so concurrent compile_warm calls can't restore a stale value
        # (leaving the fold rule permanently excluded) or re-enable the
        # rule mid-optimize for each other
        with _WARM_COMPILE_LOCK:
            prev = spark.conf.get(key, None)
            spark.conf.set(key,
                           _FOLD_RULE if not prev else f"{prev},{_FOLD_RULE}")
            try:
                jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    jspark, df._jdf.logicalPlan())  # type: ignore[attr-defined]
                opt = jdf.queryExecution().optimizedPlan()
            finally:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
        if opt.nodeName() != "Project":
            return None
        child = opt.children().head()
        if child.nodeName() != "LocalRelation":
            return None
        exprs = opt.projectList()
        if not all(exprs.apply(i).deterministic()
                   for i in range(exprs.size())):
            return None
        proj = jvm.org.apache.spark.sql.catalyst.expressions.SafeProjection \
            .create(exprs, child.output())
        return WarmQuery(proj, child.data())
    except Exception as exc:
        if _surface_missing(exc):
            return None
        raise


def fresh_execute(df: DataFrame) -> int | None:
    """Re-run ``df`` end-to-end under a brand-new QueryExecution and
    materialize the result JVM-side; returns the row count.

    ``Dataset.collect()`` on a memoized Dataset reuses its (already
    folded) QueryExecution, which would amount to caching *results*, not
    plans.  This forces analysis + optimization + evaluation to happen
    again — the honest per-iteration cost for benchmarking — while still
    letting expression compilation (the Python-side plan cache) be reused,
    mirroring the reference's warm plan cache protocol
    (bench_lock.rs:11-18).  Returns None when the JVM surface is missing.
    """
    try:
        spark, jvm, jspark = _jvm_bits(df)
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            jspark, df._jdf.logicalPlan())  # type: ignore[attr-defined]
        return len(jdf.queryExecution().executedPlan().executeCollect())
    except Exception as exc:
        if _surface_missing(exc):
            return None
        raise
