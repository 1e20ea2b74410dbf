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
- MAP/STRUCT are supported as of r6, extending past reference parity
  (the reference throws for both at
  `ClickHouseRowConverter.java:144-145,227-228`; SURVEY §1.3 lists
  the extension as a stretch goal): MapType -> `Map(K, V)` (keys
  must be non-Nullable — ClickHouse rejects Nullable map keys),
  StructType -> named `Tuple(name T, ...)`. Like Array, neither
  composes with Nullable at the outer level, so outer nullability is
  dropped; field/value nullability maps to Nullable inner types.
  The Arrow write path carries both natively (round-trip proven by
  the registered `sink_map_struct_roundtrip` query).
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
    lattice does not admit."""
    if isinstance(dtype, T.DecimalType):
        base = f"Decimal({dtype.precision}, {dtype.scale})"
    elif isinstance(dtype, T.ArrayType):
        # Elements map non-Nullable: Spark defaults containsNull=True
        # on every parquet-read array, so honoring it would wrap all
        # numeric vector columns in Nullable and defeat ClickHouse's
        # dense array layout. ClickHouse forbids Nullable(Array(...));
        # outer nullability is dropped.
        return f"Array({clickhouse_type_for(dtype.elementType)})"
    elif isinstance(dtype, T.MapType):
        # ClickHouse Map keys must be non-Nullable; values may be.
        key = clickhouse_type_for(dtype.keyType, nullable=False)
        val = clickhouse_type_for(
            dtype.valueType, nullable=dtype.valueContainsNull
        )
        return f"Map({key}, {val})"  # Nullable(Map) is forbidden too
    elif isinstance(dtype, T.StructType):
        fields = ", ".join(
            f"`{f.name}` {clickhouse_type_for(f.dataType, f.nullable)}"
            for f in dtype.fields
        )
        return f"Tuple({fields})"  # named tuple; Nullable(Tuple) forbidden
    elif type(dtype) in _SIMPLE:
        base = _SIMPLE[type(dtype)]
    else:
        raise TypeError(
            f"unsupported type for ClickHouse sink: {dtype.simpleString()}"
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
