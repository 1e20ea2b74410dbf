"""Batch read helpers: explicit-schema readers for the formats the
reference's host engine assumes upstream (SURVEY.md §2.2).

Schema is always passed explicitly for text formats — schema
inference means an extra full scan of 100 TB. Parquet carries its own
schema; CSV/JSON must be told."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC carries its own schema, same pushdown/pruning as parquet."""
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options,
) -> DataFrame:
    """JDBC scan. Always pass the partition-column quartet for any
    table of size — without it Spark reads the whole table through ONE
    connection. Requires the vendor driver jar on the classpath (none
    ships in this environment; exercised only against in-memory
    JDBC-less stubs in tests)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source: the readStream smoke/load generator
    (timestamp, value) — the Spark analogue of Flink's datagen."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def register_table(
    spark: SparkSession, df: DataFrame, name: str, cache: bool = False
) -> DataFrame:
    """Expose a DataFrame on the Spark SQL surface (temp view)."""
    if cache:
        df = df.cache()
    df.createOrReplaceTempView(name)
    return df


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "dt",
    mode: str = "overwrite",
) -> None:
    """Write a fact table hive-partitioned by event DATE — the layout
    that makes time-ranged scans at 100 TB read days, not the corpus:
    a `WHERE dt >= X` predicate prunes whole directories at planning
    time (PartitionFilters in the scan, pinned in
    tests/test_sources.py), which no row-group statistic can match.
    The partition value is a string date (stable lexicographic
    order). The date is the event date in the SESSION timezone
    (`date_format` renders in `spark.sql.session.timeZone`): pin the
    session tz (UTC in `build_session`) across writers or the same
    instant can land in different day directories."""
    from pyspark.sql import functions as F

    (
        df.withColumn(
            partition_col, F.date_format(F.col(ts_col), "yyyy-MM-dd")
        )
        .write.partitionBy(partition_col)
        .mode(mode)
        .parquet(path)
    )


def read_date_partitioned(
    spark: SparkSession, path: str, partition_col: str = "dt"
) -> DataFrame:
    """Read a :func:`write_date_partitioned` layout with the partition
    column typed STRING, honoring the write side's contract.

    Spark's partition type inference (on by default) would parse the
    yyyy-MM-dd directory values as DATE — a type the writer never
    promised, and one whose parse runs in the session timezone. The
    inferred schema is fetched once (footers + directory listing,
    planning-time cost only) and re-applied with the partition column
    overridden to string; a user-supplied schema disables inference
    for that column while directory pruning on string predicates
    (``dt >= '2024-01-01'``, stable lexicographic order) still shows
    as PartitionFilters in the scan."""
    from pyspark.sql.types import StringType, StructField, StructType

    inferred = spark.read.parquet(path).schema
    schema = StructType(
        [
            StructField(
                f.name,
                StringType() if f.name == partition_col else f.dataType,
                f.nullable,
            )
            for f in inferred
        ]
    )
    return spark.read.schema(schema).parquet(path)


def write_bucketed_table(
    df: "DataFrame",
    table_name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as a Spark BUCKETED AND SORTED parquet table —
    the co-located-join layout: rows are hash-distributed into
    ``n_buckets`` files by ``key`` and sorted within each bucket, so
    a join between two tables bucketed the same way needs NO exchange
    (and with sortBy, no sort) at read time — the single biggest
    shuffle eliminator for a fact-fact join that repeats every run
    (at 100 TB you pay the layout once at ingest, then every
    downstream join of the day is exchange-free).

    ``saveAsTable`` is required (bucket metadata lives in the
    catalog, not the files); ``path`` makes it an external table so
    the caller owns the location and its cleanup.

    The pre-write ``repartition(n_buckets, key)`` aligns write tasks
    with buckets so each bucket lands in ONE file (many small files
    per bucket otherwise — task_count x bucket_count). Honest scope
    note: the EXCHANGE is what the layout eliminates; open-source
    Spark re-sorts bucket files under a merge join regardless of
    ``sortBy`` (SPARK-19256 — the reader never trusts written sort
    order), so the within-bucket sort buys locality/compression, not
    a plan change."""
    from pyspark.sql import functions as F

    (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )
