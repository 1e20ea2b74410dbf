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
