"""Python Data Source path: format('clickhouse_sink') batch write."""

from __future__ import annotations

import glob

import duckdb

from flink_connectors_spark.sink import datasource as ds
from tests.test_sink_writer import CHANGELOG, SCHEMA


def test_datasource_batch_write(spark, tmp_path):
    ds.register(spark)
    df = spark.createDataFrame(CHANGELOG, SCHEMA)
    (
        df.write.format(ds.FORMAT_NAME)
        .mode("append")
        .option("url", f"parquet://{tmp_path}/dsink")
        .option("table-name", "t1")
        .option("write-mode", "collapsing")
        .save()
    )
    files = glob.glob(f"{tmp_path}/dsink/t1/*.parquet")
    assert files
    con = duckdb.connect()
    rows = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
    cols = [d[0] for d in con.description]
    con.close()
    assert "sign" in cols and "op" not in cols
    assert len(rows) == len(CHANGELOG)
    signs = [r[cols.index("sign")] for r in rows]
    assert sorted(set(signs)) == [-1, 1]


def test_ddl_create_table_options_do_not_propagate_yet(spark, tmp_path):
    """KNOWN DIVERGENCE (documented in COVERAGE.md): the reference
    exposes the sink through SQL DDL (`CREATE TABLE ... WITH (...)`,
    README.md:4-28). Spark 4.1's Python Data Source accepts
    `CREATE TABLE ... USING clickhouse_sink OPTIONS (...)` but passes
    an EMPTY options dict to the writer, so the sink's required
    options never arrive and our option validation raises its clear
    'url is required' error. This test pins that behavior: when a
    Spark upgrade starts forwarding catalog-table options, the
    error-match below breaks and the DDL surface can be turned on."""
    import pytest

    from flink_connectors_spark.sink import datasource as ds

    ds.register(spark)
    spark.sql("DROP TABLE IF EXISTS ddl_sink_probe")
    spark.sql(
        f"""
        CREATE TABLE ddl_sink_probe (name STRING, grade INT)
        USING {ds.FORMAT_NAME}
        OPTIONS (
          url 'parquet://{tmp_path}/ddl_sink',
          `table-name` 'ddl_t',
          `write-mode` 'insert_only')
        """
    )
    with pytest.raises(Exception, match="url.*required|PYTHON_DATA_SOURCE"):
        spark.sql("INSERT INTO ddl_sink_probe VALUES ('alice', 1)")
    spark.sql("DROP TABLE IF EXISTS ddl_sink_probe")
