"""End-to-end changelog loop: incremental aggregation emits
I/UB/UA, the sink's modes consume them, and the compacted result
must equal the direct batch aggregate — the full
`INSERT INTO sink SELECT ... GROUP BY` scenario the reference is
built for (README.md:11), Spark-native on both sides."""

from __future__ import annotations

import glob

import duckdb
import pytest

from pyspark.sql import functions as F

from flink_connectors_spark.session import load_table
from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink.writer import write_batch
from flink_connectors_spark.streaming.incremental import merge_aggregate_delta


@pytest.fixture()
def batches(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    return [
        ev.filter(F.col("event_id") % 3 == i) for i in range(3)
    ], ev


def test_incremental_state_matches_batch_aggregate(spark, batches):
    parts, ev = batches
    state = None
    for b in parts:
        state, _ = merge_aggregate_delta(
            state, b, ["event_type"], {"total_cents": "v_cents"}
        )
        state = state.localCheckpoint(eager=True)
    got = {
        r["event_type"]: (r["n"], r["total_cents"])
        for r in state.collect()
    }
    want = {
        r["event_type"]: (r["n"], r["total_cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_cents").alias("total_cents"),
        )
        .collect()
    }
    assert got == want


def test_changelog_ops_shape(spark, batches):
    parts, _ = batches
    state, cl1 = merge_aggregate_delta(
        None, parts[0], ["event_type"], {"total_cents": "v_cents"}
    )
    state = state.localCheckpoint(eager=True)
    assert {r["op"] for r in cl1.collect()} == {"I"}
    _, cl2 = merge_aggregate_delta(
        state, parts[1], ["event_type"], {"total_cents": "v_cents"}
    )
    rows = cl2.collect()
    # every group existed after batch 1 => only UB/UA pairs, UB first
    assert {r["op"] for r in rows} == {"UB", "UA"}
    by_key = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r["op"])
    assert all(ops == ["UB", "UA"] for ops in by_key.values())


def test_changelog_through_replacing_sink_reproduces_state(
    spark, batches, tmp_path
):
    """The loop: aggregate incrementally -> emit changelog -> write
    every epoch through the REPLACING sink -> MergeTree-style
    compaction of what landed == the final aggregate state."""
    parts, ev = batches
    opts = SinkOptions(
        url=f"parquet://{tmp_path}/sink",
        table_name="agg_t",
        write_mode="replacing",
        primary_key=("event_type",),
    )
    state = None
    for epoch, b in enumerate(parts):
        state, cl = merge_aggregate_delta(
            state, b, ["event_type"], {"total_cents": "v_cents"}
        )
        state = state.localCheckpoint(eager=True)
        versioned = cl.withColumn(
            "ver",
            F.lit(epoch * 10)
            + F.when(F.col("op") == "UB", 0).otherwise(1),
        )
        write_batch(versioned, opts)

    files = glob.glob(f"{tmp_path}/sink/agg_t/*.parquet")
    con = duckdb.connect()
    compacted = con.execute(
        f"""
        SELECT event_type, n, total_cents FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY ver DESC) AS rn
          FROM read_parquet({files!r}))
        WHERE rn = 1 AND deleted = 0
        """
    ).fetchall()
    con.close()
    got = {t: (n, c) for t, n, c in compacted}
    want = {
        r["event_type"]: (r["n"], r["total_cents"])
        for r in state.collect()
    }
    assert got == want


def test_changelog_producer_drives_upsert_sink_end_to_end(
    spark, batches, tmp_path
):
    """Producer -> sink -> mutated store, tested TOGETHER (r2 verdict
    item #6): each micro-batch's changelog from merge_aggregate_delta
    goes through foreach_batch_writer into a DuckDB backend in upsert
    mode (I -> INSERT, UA -> keyed UPDATE, UB dropped), and the final
    mutated table must equal the direct batch aggregate."""
    from flink_connectors_spark.sink.backends import DuckDBBackendFactory
    from flink_connectors_spark.sink.writer import foreach_batch_writer

    parts, ev = batches
    db = f"{tmp_path}/cdc_upsert.db"
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE agg_state("
        "event_type VARCHAR, n BIGINT, total_cents BIGINT)"
    )
    con.close()
    opts = SinkOptions(
        url=f"duckdb://{db}",
        table_name="agg_state",
        write_mode="upsert",
        primary_key=("event_type",),
        batch_size=100,
    )
    write = foreach_batch_writer(
        opts, backend_factory=DuckDBBackendFactory(db)
    )
    state = None
    for epoch, b in enumerate(parts):
        state, changelog = merge_aggregate_delta(
            state, b, ["event_type"], {"total_cents": "v_cents"}
        )
        state = state.localCheckpoint(eager=True)
        # single partition => single writer => DuckDB single-writer safe
        write(changelog.repartition(1), epoch)

    con = duckdb.connect(db)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT event_type, n, total_cents FROM agg_state"
        ).fetchall()
    }
    con.close()
    want = {
        r["event_type"]: (r["n"], r["total_cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_cents").alias("total_cents"),
        )
        .collect()
    }
    assert got == want
