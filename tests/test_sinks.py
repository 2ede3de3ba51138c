"""§2.1 sinks: relational to_csv/to_tsv lowering, the distributed
write_csv file sink (round-trip), and the streaming JetroDocs variant.
"""

from __future__ import annotations

import shutil
import uuid

import pyspark.sql.functions as F

from jetro_spark.jql.engine import Jetro, JetroDocs, JetroTables
from jetro_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def test_relational_to_csv_lines(spark, tables):
    t = JetroTables(spark, tables)
    out = t.query('$.region.map({k: r_regionkey, n: r_name}).to_csv()')
    assert out.columns == ["line"]
    lines = sorted(r["line"] for r in out.collect())
    exp = sorted(f"{r['r_regionkey']},{r['r_name']}"
                 for r in tables["region"].collect())
    assert lines == exp


def test_relational_to_tsv_quoting_matches_doc_mode(spark, tables):
    # a cell containing the separator gets quoted exactly like the
    # doc-mode string builder (helpers.rs:130-139)
    t = JetroTables(spark, {"x": spark.createDataFrame(
        [(1, 'a,b'), (2, 'plain')], "k long, s string")})
    lines = {r["line"] for r in t.query("$.x.to_csv()").collect()}
    assert lines == {'1,"a,b"', "2,plain"}
    doc = Jetro.from_value(
        spark, [{"k": 1, "s": "a,b"}, {"k": 2, "s": "plain"}]
    ).collect("$.to_csv()")
    assert set(doc.split("\n")) == lines


def test_write_csv_roundtrip(spark, tables):
    path = f"/tmp/jetro_csv_{uuid.uuid4().hex[:8]}"
    try:
        t = JetroTables(spark, tables)
        t.write_csv(
            "$.orders.filter(o_totalprice > 200000)"
            ".map({okey: o_orderkey, tot: o_totalprice})", path)
        back = spark.read.option("header", True).csv(path)
        assert back.columns == ["okey", "tot"]
        got = {(int(r["okey"]), float(r["tot"])) for r in back.collect()}
        exp = {(r["o_orderkey"], r["o_totalprice"])
               for r in tables["orders"]
               .filter(F.col("o_totalprice") > 200000).collect()}
        assert got == exp and got
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_streaming_jetro_docs_batch_parity(spark):
    src = f"/tmp/jetro_docs_src_{uuid.uuid4().hex[:8]}"
    try:
        o = load_tables(spark, SF, register=False)["orders"]
        js = o.select(F.to_json(F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("status"))).alias("value"))
        js.write.mode("overwrite").text(src)
        expr = "{id: $.id, flag: $.status.lower()}"
        batch_jd = JetroDocs.from_json_strings(spark, js, "value")
        batch = {tuple(r) for r in
                 batch_jd.frame(expr).select("value.*").collect()}
        stream = spark.readStream.format("text").load(src)
        jd = JetroDocs.from_json_strings(spark, stream, "value",
                                         schema=batch_jd.schema)
        name = f"docs_{uuid.uuid4().hex[:8]}"
        q = (jd.frame(expr).select("value.*")
             .writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.table(name).collect()}
        assert got == batch and got
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_without_schema_raises(spark):
    import pytest
    stream = (spark.readStream.format("rate").load()
              .select(F.col("value").cast("string").alias("js")))
    with pytest.raises(ValueError, match="schema"):
        JetroDocs.from_json_strings(spark, stream, "js")


def test_write_parquet_partitioned_roundtrip(spark, tables, tmp_path):
    from jetro_spark.jql.engine import JetroTables
    import os
    t = JetroTables(spark, tables)
    out = str(tmp_path / "orders_pq")
    t.write_parquet("$.orders.map({k: o_orderkey, st: o_orderstatus, "
                    "total: o_totalprice})", out,
                    partition_by=["st"], target_files=2)
    # hive-style dirs exist per status value
    assert any(d.startswith("st=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    src = tables["orders"]
    assert back.count() == src.count()
    # a filter on the partition column scans only that directory
    one = back.filter(back.st == "F").select("k").count()
    assert one == src.filter(src.o_orderstatus == "F").count()


def test_write_parquet_clustered_stats(spark, tables, tmp_path):
    from jetro_spark.jql.engine import JetroTables
    t = JetroTables(spark, tables)
    out = str(tmp_path / "li_clustered")
    t.write_parquet("$.lineitem.map({ok: l_orderkey, qty: l_quantity})",
                    out, cluster_by=["ok"], target_files=2)
    back = spark.read.parquet(out)
    assert back.count() == tables["lineitem"].count()
    # clustering is observable: each file's ok values are sorted
    import pyarrow.parquet as pq
    import glob
    for f in glob.glob(out + "/part-*.parquet"):
        col = pq.read_table(f, columns=["ok"])["ok"].to_pylist()
        assert col == sorted(col)


def test_partitioned_read_prunes_directories(spark, tables, tmp_path):
    """A filter on the hive-partition column must reach the scan as a
    PartitionFilter (whole directories skipped) — the layout contract
    write_parquet(partition_by=...) promises."""
    from jetro_spark.jql.engine import JetroTables
    import pyspark.sql.functions as F

    p = str(tmp_path / "orders_by_status")
    t = JetroTables(spark, tables)
    t.write_parquet("$.orders.map({k: o_orderkey, st: o_orderstatus, "
                    "total: o_totalprice})", p, partition_by=["st"])
    rd = spark.read.parquet(p).filter(F.col("st") == "O")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition predicate must be IN the partition filters (pruning),
    # not a post-scan data Filter
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "st" in m.group(1)
    # and values come back right
    n_o = rd.count()
    want = tables["orders"].filter(F.col("o_orderstatus") == "O").count()
    assert n_o == want


def test_write_orc_partitioned_roundtrip(spark, tables, tmp_path):
    """ORC shares write_parquet's layout machinery: hive partitioning,
    clustering, and a value-exact round-trip through Spark's native ORC
    reader (partition pruning applies the same way)."""
    from jetro_spark.jql.engine import JetroTables

    t = JetroTables(spark, tables)
    out = str(tmp_path / "orc_orders")
    t.write_orc("$.orders.map({k: o_orderkey, st: o_orderstatus, "
                "tot: o_totalprice})",
                out, partition_by=["st"], target_files=2)
    back = spark.read.orc(out)
    want = {(r["k"], r["st"], float(r["tot"])) for r in t.query(
        "$.orders.map({k: o_orderkey, st: o_orderstatus, "
        "tot: o_totalprice})").collect()}
    got = {(r["k"], r["st"], float(r["tot"])) for r in back.collect()}
    assert got == want
    # hive layout: one directory per status value
    import glob as _g
    assert _g.glob(out + "/st=*")
