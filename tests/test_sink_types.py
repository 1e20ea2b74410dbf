"""Type lattice unit tests (SURVEY.md §1.3).

Checks the Spark -> ClickHouse DDL mapping mirrors the reference
converter's supported set (`table/internal/converter/
ClickHouseRowConverter.java:98-230`): every type the reference can
write maps, ARRAY is supported (deliberate fix — the reference
throws), and MAP/STRUCT stay outside the lattice.
"""

import pytest
from pyspark.sql import types as T

from flink_connectors_spark.sink.types import (
    clickhouse_type_for,
    create_table_statement,
    ddl_columns,
)


@pytest.mark.parametrize(
    "dtype,expected",
    [
        (T.BooleanType(), "UInt8"),
        (T.ByteType(), "Int8"),
        (T.ShortType(), "Int16"),
        (T.IntegerType(), "Int32"),
        (T.LongType(), "Int64"),
        (T.FloatType(), "Float32"),
        (T.DoubleType(), "Float64"),
        (T.StringType(), "String"),
        (T.BinaryType(), "String"),
        (T.DateType(), "Date32"),
        (T.TimestampType(), "DateTime64(6)"),
        (T.TimestampNTZType(), "DateTime64(6)"),
        (T.DecimalType(15, 2), "Decimal(15, 2)"),
    ],
)
def test_simple_types(dtype, expected):
    assert clickhouse_type_for(dtype) == expected
    assert clickhouse_type_for(dtype, nullable=True) == f"Nullable({expected})"


def test_array_supported_not_nullable_wrapped():
    # ClickHouse forbids Nullable(Array(...)); nullability is dropped.
    assert clickhouse_type_for(T.ArrayType(T.FloatType())) == "Array(Float32)"
    assert (
        clickhouse_type_for(T.ArrayType(T.FloatType()), nullable=True)
        == "Array(Float32)"
    )
    assert (
        clickhouse_type_for(T.ArrayType(T.ArrayType(T.LongType())))
        == "Array(Array(Int64))"
    )


@pytest.mark.parametrize(
    "dtype,expected",
    [
        # extension past reference parity (the reference throws for
        # both, ClickHouseRowConverter.java:144-145,227-228)
        (
            T.MapType(T.StringType(), T.LongType(), valueContainsNull=False),
            "Map(String, Int64)",
        ),
        (
            T.MapType(T.StringType(), T.DoubleType(), valueContainsNull=True),
            "Map(String, Nullable(Float64))",
        ),
        (
            # map keys are always non-Nullable in ClickHouse
            T.MapType(T.IntegerType(), T.ArrayType(T.FloatType())),
            "Map(Int32, Array(Float32))",
        ),
        (
            T.StructType(
                [
                    T.StructField("n", T.LongType(), False),
                    T.StructField("total", T.DoubleType(), True),
                ]
            ),
            "Tuple(`n` Int64, `total` Nullable(Float64))",
        ),
        (
            # nested: struct inside map value, array inside struct
            T.MapType(
                T.StringType(),
                T.StructType([T.StructField("v", T.ArrayType(T.LongType()), False)]),
                valueContainsNull=False,
            ),
            "Map(String, Tuple(`v` Array(Int64)))",
        ),
    ],
)
def test_map_struct_supported(dtype, expected):
    assert clickhouse_type_for(dtype) == expected
    # Nullable(Map)/Nullable(Tuple) are forbidden in ClickHouse —
    # outer nullability drops, same rule as Array
    assert clickhouse_type_for(dtype, nullable=True) == expected


def test_truly_unsupported_types_still_raise():
    with pytest.raises(TypeError, match="unsupported type"):
        clickhouse_type_for(T.NullType())


def test_create_table_statement_roundtrips_through_duckdb_shape():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    assert ddl_columns(schema) == [
        ("id", "Int64"),
        ("name", "Nullable(String)"),
        ("score", "Nullable(Float64)"),
    ]
    ddl = create_table_statement("t", schema, order_by=("id",))
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS t (")
    assert "`id` Int64" in ddl and "ENGINE = MergeTree ORDER BY (`id`)" in ddl
    assert create_table_statement("t2", schema).endswith("ORDER BY (tuple())")
