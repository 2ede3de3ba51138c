"""SparkSession factory + test-table loading.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions sized to cores (not the 200 default), AQE enabled for runtime
re-planning and skew-join handling, Arrow enabled for the pandas-UDF path.
At cluster scale the same code runs unchanged — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from jetro_spark.timeutil import with_event_timestamp

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def get_spark(app_name: str = "jetro_spark", cpus: int | None = None) -> SparkSession:
    """Build (or get) a SparkSession tuned for local[N] testing.

    The config choices are scale-first: AQE + coalesce + skew-join are what
    a 1000-executor run wants too; shuffle partitions are overridable via
    spark.sql.shuffle.partitions at submit time on a real cluster.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Scan-split sizing is a LOCAL-HARNESS setting: the sf0.1 bench tables
    # are single ~10-40 MB parquet files, so Spark's 128 MB default splits
    # them into ~3 input partitions and leaves 29 of 32 cores idle through
    # the scan + map-side-combine stage (measured 2x on group_agg). 4 MB
    # restores scan parallelism here. A real cluster run should keep the
    # 128 MB default (4 MB at 100 TB would be 25M tasks) — override via
    # SPARK_GRAFT_MAX_PARTITION_BYTES at submit time; many-file production
    # tables parallelize by file count anyway.
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.files.maxPartitionBytes", mpb)
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables; optionally register temp views.

    Results are memoized per (session, sf_dir): re-reading parquet footers
    and re-inferring schemas added ~0.1-0.3 s of fixed cost to EVERY gate
    query (each calls load_tables) — the cached DataFrames are lazy plans,
    so reuse is free and safe.

    The driver's parquet carries nanosecond timestamps (TIMESTAMP(NANOS));
    Spark reads those only with the legacy nanosAsLong conf, under which
    they surface as timestamp_ntz — set it on whatever session we're given.
    """
    key = (id(spark), sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        if register:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
        return dict(cached)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events":
            # events.ts has shipped as TIMESTAMP(NANOS) (bigint nanos
            # under the legacy conf) and as plain µs timestamp across
            # testdata generations. Keep ts raw (what DuckDB sees too) and
            # add a normalized TimestampType column for window/streaming
            # operators regardless of the physical representation.
            df = with_event_timestamp(df, "ts", "event_time")
        dfs[name] = df
        if register:
            df.createOrReplaceTempView(name)
    _TABLE_CACHE[key] = dict(dfs)
    return dfs
