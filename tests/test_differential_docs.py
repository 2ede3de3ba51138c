"""Multi-document differential: JetroDocs (one compiled plan over a
DataFrame of documents) must produce, per row, exactly what
single-document Jetro produces for that document alone — the Spark-scale
analog of the reference's JetroEngine-vs-Jetro equivalence (same plan
cache semantics, jc/lib.rs:155-284).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jetro_spark.jql.engine import Jetro, JetroDocs

DOCS = [
    {"name": "a", "items": [{"p": 10.0, "q": 2}, {"p": 5.0, "q": 7}],
     "meta": {"x": 1}},
    {"name": "b", "items": [{"p": 99.5, "q": 1}], "meta": {"x": 2}},
    {"name": "c", "items": [], "meta": {"x": 3}},
    {"name": "d", "items": [{"p": 1.0, "q": 0}, {"p": 2.0, "q": 1},
                            {"p": 3.0, "q": 5}], "meta": {"x": 4}},
]

EXPRS = [
    "$.name",
    "$.items.count()",
    "$.items.map(p).sum()",
    "$.items.filter(q > 1).map(p)",
    "$.items.sort(-p).first()?.p",
    "$.meta.x * 10",
    "$.items.map({p: p, big: p > 4})",
    "$..p",
    # r12: bare ascending sort (null-first convention) and the
    # original-order last(n) tail through the multi-doc plan
    "$.items.map(q).sort()",
    "$.items.sort(-p).last(2)",
]


@pytest.fixture(scope="module")
def docs_engine(spark):
    df = spark.createDataFrame([(i, json.dumps(d)) for i, d in enumerate(DOCS)],
                               "i long, js string")
    return JetroDocs.from_json_strings(spark, df, "js")


@pytest.mark.parametrize("expr", EXPRS)
def test_jetrodocs_matches_per_document_jetro(spark, docs_engine, expr):
    batch = [r["value"] for r in
             docs_engine.with_result(expr).orderBy("i").collect()]
    from jetro_spark.jql.engine import to_python
    batch = [to_python(v) for v in batch]
    single = [Jetro.from_value(spark, d).collect(expr) for d in DOCS]
    assert batch == single, expr
