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


def register_table(
    spark: SparkSession, df: DataFrame, name: str, cache: bool = False
) -> DataFrame:
    """Expose a DataFrame on the Spark SQL surface (temp view)."""
    if cache:
        df = df.cache()
    df.createOrReplaceTempView(name)
    return df
