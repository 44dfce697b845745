"""Query registry: every engine operator that the driver's correctness
gate exercises registers here as a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) a DuckDB oracle SQL string.

The registry is the single source for ``__spark_entry__.queries()`` /
``oracle_sql()``. Column names are aliased identically on both sides —
the driver hash-compares after sorting columns by name.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: Dict[str, QueryFn] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Register a query callable, optionally with its DuckDB oracle."""

    def decorator(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return decorator


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from almost_any_file_to_pandas_spark.plans import relational  # noqa: F401
    from almost_any_file_to_pandas_spark.plans import parity  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import dedup  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import similarity  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import textstats  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import multimodal  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import temporal  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import funnel  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import pq  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import linkage  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import bloom  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import pipeline  # noqa: F401
    from almost_any_file_to_pandas_spark.streaming import events  # noqa: F401


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md schema).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` (set in
    :func:`~almost_any_file_to_pandas_spark.session.apply_engine_conf`)
    it arrives as nanosecond longs — convert to a microsecond
    timestamp with integer division (``DIV`` keeps the arithmetic in
    64-bit; a double division would lose precision at 1e18 magnitudes)
    matching DuckDB's nanos→micros truncation.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def fan_out_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Guarantee a scan feeds at least ``defaultParallelism`` tasks.

    Parquet splits at row-group granularity, so a small single-file
    table (the local testdata shape: one row group per file) plans as
    ONE split and serializes every downstream narrow stage — shingle
    explosion, Arrow batch kernels, per-row scoring — onto one core.
    The guard repartitions ONLY in that under-parallel case, moving
    the (tiny) scan output through one round-robin exchange. At
    production scale a 100 TB scan plans orders of magnitude more
    splits than cores, the branch is not taken, and the plan carries
    no extra Exchange. Catalyst still pushes filters and column
    pruning through the Repartition into the scan.

    Use it on scans that feed compute-heavy narrow stages; leave
    pure-relational queries (whose first shuffle is their aggregation
    or join anyway) on the bare scan.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    return int("".join(ch for ch in raw if ch.isdigit()) or "134217728")


def table_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """:func:`table` + the fan-out guard, decided by an O(1) driver
    ``stat`` of the parquet file instead of compiling the physical
    plan (``df.rdd`` costs a full plan compile per call — measurably
    ~0.3-0.5 s of driver time per query at bench scale). Estimated
    split count = ``bytes / maxPartitionBytes``; below
    ``defaultParallelism`` the scan is under-parallel (the local
    testdata shape) and gets one round-robin exchange. At 100 TB the
    estimate is ≫ cores and the guard is a no-op.
    """
    df = table(spark, sf_dir, name)
    try:
        import os

        size = os.path.getsize(f"{sf_dir}/{name}.parquet")
    except OSError:
        return fan_out_scan(df, spark)
    target = spark.sparkContext.defaultParallelism
    if size // _max_partition_bytes(spark) < target:
        return df.repartition(target)
    return df


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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view, making the whole
    engine surface reachable from ``spark.sql(...)`` — the same
    normalized frames (events.ts nanos→timestamp) the DataFrame
    callables read, so SQL and DataFrame results are interchangeable.
    """
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
