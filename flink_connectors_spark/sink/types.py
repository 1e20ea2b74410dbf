"""Spark <-> ClickHouse type mapping (reference §1.3 type lattice).

Mirrors the supported-type set of the reference's row converter
(`table/internal/converter/ClickHouseRowConverter.java:98-230` both
directions) and its JDBC type table
(`table/internal/utils/JdbcTypeUtil.java:24-59`), expressed as a
Spark-DataType -> ClickHouse-DDL mapping:

- TIME has no Spark type; the reference writes it as millis-of-day
  int (`ClickHouseRowConverter.java:207-211`) — map IntegerType with
  a `time_millis` hint.
- ARRAY is properly supported here (the reference throws,
  `ClickHouseRowConverter.java:144-145`; SURVEY flags it as a fix —
  the test corpus has array<float> embeddings).
- MAP/STRUCT stay unsupported, matching the reference's explicit
  UnsupportedOperationException.
"""

from __future__ import annotations

from pyspark.sql import types as T

_SIMPLE = {
    T.BooleanType: "UInt8",
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.StringType: "String",
    T.BinaryType: "String",  # ClickHouse String is bytes
    T.DateType: "Date32",
    T.TimestampType: "DateTime64(6)",
    T.TimestampNTZType: "DateTime64(6)",
    T.DayTimeIntervalType: "Int64",  # millis, like the reference's long
    T.YearMonthIntervalType: "Int32",  # months, like the reference's int
}


def clickhouse_type_for(dtype: T.DataType, nullable: bool = False) -> str:
    """ClickHouse DDL type for a Spark DataType; raises for types the
    lattice does not admit (MAP/STRUCT — same boundary as the
    reference)."""
    if isinstance(dtype, T.DecimalType):
        base = f"Decimal({dtype.precision}, {dtype.scale})"
    elif isinstance(dtype, T.ArrayType):
        base = f"Array({clickhouse_type_for(dtype.elementType)})"
        # ClickHouse forbids Nullable(Array(...)); nullability applies
        # to elements only.
        return base
    elif type(dtype) in _SIMPLE:
        base = _SIMPLE[type(dtype)]
    else:
        raise TypeError(
            f"unsupported type for ClickHouse sink: {dtype.simpleString()} "
            "(MAP/STRUCT are outside the reference's converter lattice)"
        )
    return f"Nullable({base})" if nullable else base


def ddl_columns(schema: T.StructType) -> list[tuple[str, str]]:
    return [
        (f.name, clickhouse_type_for(f.dataType, f.nullable)) for f in schema
    ]


def create_table_statement(
    table: str,
    schema: T.StructType,
    engine: str = "MergeTree",
    order_by: tuple[str, ...] = (),
) -> str:
    """CREATE TABLE DDL for the sink target (convenience for tests and
    bootstrap; the reference assumes the table pre-exists)."""
    cols = ", ".join(f"`{n}` {t}" for n, t in ddl_columns(schema))
    order = ", ".join(f"`{c}`" for c in order_by) or "tuple()"
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) "
        f"ENGINE = {engine} ORDER BY ({order})"
    )
