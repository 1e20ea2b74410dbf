"""SparkSession construction and table loading.

Scale notes: every session enables AQE (runtime re-planning, skew-join
splitting, partition coalescing) and Arrow for the Python boundary.
``shuffle.partitions`` defaults small for local runs; on a real cluster
this is overridden to ~2-3x total cores (or left to AQE's coalescing
with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import TABLES

# UTC everywhere: parquet timestamps must mean the same instants in
# Spark and in any oracle engine (DuckDB) reading the same files.
_BASE_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 64 MiB scan splits: good parallelism without tiny-task overhead.
    "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
    # events.parquet carries INT64 TIMESTAMP(NANOS), which Spark's
    # vectorized reader rejects; read as long and convert (see
    # load_table). DuckDB coerces the same column to µs TIMESTAMP, so
    # truncating ns -> µs keeps both engines value-identical.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
}


def build_session(
    app_name: str = "flink_connectors_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession with the engine's scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # local mode runs every task inside the driver JVM; the 1g default
    # heap mis-sizes a 32-core box (found via a 50k-vector LSH stress
    # OOM). Max-heap is reserved lazily, so a generous cap is free.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
    )
    for k, v in _BASE_CONF.items():
        b = b.config(k, v)
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Per-process metadata caches (r14, guide §1/§6: the driver should do
# almost no per-query work). Schema inference reads parquet footers on
# EVERY spark.read.parquet call — ~0.1 s of driver time per table per
# query, paid 2-6x by most of the 161 headliners. The schema and the
# on-disk byte size of a table are catalog metadata (exactly what a
# metastore would hold), not query results: data is still scanned from
# parquet by every execution. Keyed on the resolved path, so different
# SF dirs never collide.
_SCHEMA_CACHE: dict = {}
_SIZE_CACHE: dict[str, int] = {}


def _table_bytes(path: str) -> int:
    """On-disk size of a parquet table (file or directory of parts)."""
    sz = _SIZE_CACHE.get(path)
    if sz is None:
        if os.path.isdir(path):
            sz = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
                if not f.startswith(("_", "."))
            )
        else:
            sz = os.path.getsize(path)
        _SIZE_CACHE[path] = sz
    return sz


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with per-process SCHEMA caching — the
    artifact-relation twin of :func:`load_table`'s cache. Only the
    first read of a path pays footer-based schema inference; file
    LISTING is still performed by every read (an appended partition
    is visible immediately — the schema of a relation never changes
    within a process, its file set does)."""
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain ``spark.read.parquet`` so Catalyst keeps
    full pushdown/pruning freedom (filters and projections reach the
    parquet scan as PushedFilters / ReadSchema). The inferred schema is
    cached per (process, path) and replayed via ``.schema(...)`` so
    only the first read of a table pays footer inference.

    The ``events`` table stores ts as INT64 TIMESTAMP(NANOS): it is
    read under the nanosAsLong conf (set here so it also applies on a
    driver-owned session) and converted ns -> µs TimestampType, which
    matches DuckDB's µs coercion of the same file bit-for-bit."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, name)
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df._fcs_table_path = path  # type: ignore[attr-defined]
    return df


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure a DataFrame has at least cluster-parallelism partitions
    before a CPU-bound narrow pipeline (hashing, shingling, vector
    math).

    Why: a small table stored as one parquet file scans as ONE input
    split, so every per-row transform downstream runs serially on a
    single core no matter how many executors exist. At real scale the
    scan produces splits >> cores (64 MiB each) and this is a no-op —
    the round-robin shuffle only ever pays for itself on under-split
    inputs.

    The under-split check is driver-cheap: for a frame fresh off
    :func:`load_table` the split count is estimated from the cached
    on-disk size / ``maxPartitionBytes`` (the same arithmetic Spark's
    FilePartition packing applies), which costs a dict lookup instead
    of the physical planning ``df.rdd`` used to force per call
    (~0.1-0.3 s of driver time per query). Frames without a known
    source path keep the exact RDD-partition check."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    path = getattr(df, "_fcs_table_path", None)
    if path is not None:
        max_pb = int(_BASE_CONF["spark.sql.files.maxPartitionBytes"])
        est = max(1, -(-_table_bytes(path) // max_pb))
        if est < target:
            return df.repartition(target)
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view so plans can be written in
    Spark SQL as well as the DataFrame API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
