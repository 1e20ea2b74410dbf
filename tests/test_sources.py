"""Source-side coverage: csv/json explicit-schema readers round-trip,
and the changelog-replay streaming source end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_connectors_spark.session import load_table
from flink_connectors_spark.sources import readers, replay


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = f"{tmp_path}/nation_csv"
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = readers.read_csv(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )
    assert back.count() == nation.count()
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )


def test_json_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    path = f"{tmp_path}/region_json"
    region.write.mode("overwrite").json(path)
    back = readers.read_json(spark, path, "r_regionkey int, r_name string")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, region.collect())
    )


def test_register_table_sql_surface(spark, sf_dir):
    df = load_table(spark, sf_dir, "region")
    readers.register_table(spark, df, "region_view")
    n = spark.sql("SELECT COUNT(*) AS n FROM region_view").collect()[0]["n"]
    assert n == df.count()


def test_changelog_replay_stream(spark, sf_dir, tmp_path):
    # µs-timestamp snapshot (see session.load_table ns handling)
    snap_dir = f"{tmp_path}/events_snap"
    events = load_table(spark, sf_dir, "events").orderBy("event_id")
    events.coalesce(1).write.mode("overwrite").parquet(snap_dir)
    import glob

    snap = glob.glob(f"{snap_dir}/*.parquet")[0]

    replay.register(spark)
    stream = (
        spark.readStream.format("changelog_replay")
        .option("path", snap)
        .option("order_by", "event_id")
        .option("rows_per_batch", "300")
        .load()
    )
    # processingTime trigger: the source advances its offset one
    # rows_per_batch chunk per micro-batch (availableNow would snapshot
    # latestOffset once and stop after a single chunk).
    q = (
        stream.writeStream.format("memory")
        .queryName("replayed")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    total = events.count()
    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.table("replayed").count() >= total:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.table("replayed")
    # full replay: same rows, same schema, no duplicates
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total
    assert set(got.columns) == set(events.columns)
    # micro-batching actually happened (>= total/rows_per_batch batches)
    assert len(q.recentProgress) >= 2


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from flink_connectors_spark.sources.readers import read_orc

    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_jdbc_reader_validates_partition_bounds(spark):
    from flink_connectors_spark.sources.readers import read_jdbc

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(
            spark, "jdbc:x://h/db", "t", partition_column="id"
        )


def test_rate_stream_produces_rows(spark):
    from flink_connectors_spark.sources.readers import rate_stream

    stream = rate_stream(spark, rows_per_second=500)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time as _time

        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            if spark.table("t_rate").count() > 0:
                break
            _time.sleep(0.5)
        assert spark.table("t_rate").count() > 0
        assert spark.table("t_rate").columns == ["timestamp", "value"]
    finally:
        q.stop()


def test_date_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """A dt-range predicate must prune at the DIRECTORY level
    (PartitionFilters), not merely push down to row groups — the
    difference between reading 2 days and scanning the corpus."""
    import io
    from contextlib import redirect_stdout

    from flink_connectors_spark.session import load_table
    from flink_connectors_spark.sources.readers import (
        read_date_partitioned,
        write_date_partitioned,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    out = f"{tmp_path}/events_by_day"
    write_date_partitioned(ev, out, "ts")

    back = read_date_partitioned(spark, out)
    # the write-side contract, honored against partition type
    # inference: dt is a STRING date, not an inferred DATE
    assert dict(back.dtypes)["dt"] == "string"
    days = sorted(r["dt"] for r in back.select("dt").distinct().collect())
    assert len(days) >= 3, f"need multiple day partitions, got {days}"
    assert all(isinstance(d, str) for d in days)

    q = read_date_partitioned(spark, out).filter(F.col("dt") == days[0])
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "dt" in plan.split("PartitionFilters", 1)[1][:200], (
        "dt predicate must appear in PartitionFilters"
    )
    # row counts agree with the unpartitioned filter
    want = ev.filter(
        F.date_format(F.col("ts"), "yyyy-MM-dd") == days[0]
    ).count()
    assert q.count() == want
