"""Bucketed tables: pre-shuffled storage for zero-shuffle repeated joins.

The reference evaluates joins in-process over one document
(jetro-core/src/builtins/ops/array.rs:489-548 equi_join), so it has no
notion of physical layout. At cluster scale, layout IS the join cost:
a fact-to-fact equi-join shuffles both sides every query. Writing the
tables bucketed by the join key (Spark's ``bucketBy`` — hash-partitioned
files plus bucket metadata in the catalog) pays that shuffle ONCE at
write time; every later join or aggregation on the bucket key reads the
co-located buckets directly, and Catalyst plans a SortMergeJoin with no
Exchange on either side.

100 TB design notes:

- Both sides must use the SAME bucket count (Spark only aligns equal
  counts; a 2x mismatch falls back to shuffling one side). Pick the
  count once per subject area — e.g. 4096 for a 100 TB fact table keeps
  buckets ~25 GB pre-split (the scan still parallelizes by file inside
  a bucket; one bucket = one or more files per writing task, so write
  with a sensible task count to avoid the many-small-files trap —
  repartition(n_buckets, keys) before the bucketed write makes exactly
  one file per bucket).
- ``sortBy`` the bucket key at write time: the merge phase of the
  join then streams pre-sorted runs (no per-task sort at read).
- Bucket pruning: equality filters on the bucket key scan 1/n of the
  files (``spark.sql.sources.bucketing.enabled``, on by default).
- This is a DataSource-table feature: requires ``saveAsTable`` (the
  catalog carries the bucket spec); plain ``.parquet(path)`` writes
  lose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, *, path: str | None = None,
                   sort: bool = True, one_file_per_bucket: bool = True) -> None:
    """Write ``df`` as a bucketed parquet DataSource table.

    ``path`` makes it an external table (data at ``path``, bucket spec in
    the catalog); default is the session warehouse. ``one_file_per_bucket``
    pre-repartitions on the bucket keys so each bucket is exactly one
    file — without it, every write task emits a file per bucket it
    touches (the small-files trap at high task counts).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if one_file_per_bucket:
        df = df.repartition(n_buckets, *[F.col(k) for k in keys])
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    When both tables are bucketed on ``on`` with equal bucket counts,
    the physical plan has NO Exchange on either side (verify with
    ``assert_no_shuffle``) — the join cost is a co-located streamed
    merge, independent of table size. This is the layout every
    repeatedly-joined 100 TB fact table should have.
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on=on, how=how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange — the
    CI-enforceable contract that a bucketed join stayed co-located.
    (Under Spark Connect the plan string comes from ``explain``;
    both paths are covered.)"""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except AttributeError:  # Spark Connect
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        plan = buf.getvalue()
    if "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan:
        raise AssertionError(
            "bucketed join plan contains a shuffle Exchange:\n" + plan)
