"""jetro_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mitghi/jetro (reference: /root/reference).

This is NOT a port of jetro's Rust engine. Jetro's bytecode VM, tape views,
demand propagation, and columnar kernels are what Spark's Catalyst/Tungsten
already provide. What this package replicates is the *language and operator
semantics* (reference: jetro-core/src/builtins/mod.rs:18-401 — the ~190
builtin catalog), re-expressed as:

- ``jetro_spark.functions``  — builtin scalar/array functions as Column
  builders (JVM-side, codegen-friendly; no Python UDFs in the hot path).
- ``jetro_spark.operators``  — relational-mode pipeline operators
  (filter/map/sort/group_by/equi_join/window analytics/pivot/...) as
  DataFrame transformations that inherit shuffle, spill, and AQE.
- ``jetro_spark.jql``        — the jetro expression language: parser +
  compiler to Spark Columns (document mode over array<struct> via
  higher-order functions) and DataFrames (relational mode).
- ``jetro_spark.pipelines``  — large-scale training-data ops: dedup
  (exact/minhash-LSH/simhash/ngram-jaccard/embedding), similarity search,
  text analysis, multimodal column plumbing.
- ``jetro_spark.streaming``  — Structured Streaming surface (tumbling/
  sliding/session windows, watermarks) — a Spark-native extension; the
  reference is strictly batch (SURVEY.md §2.13).
"""

from jetro_spark.session import get_spark, load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "__version__"]
