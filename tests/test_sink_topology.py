"""Topology discovery tests (SURVEY.md §2.1 S14): the reference's two
system queries run against a DuckDB-backed fake `system` schema; the
port probe and Distributed-engine parses are pure-function tested."""

from __future__ import annotations

import pytest

from flink_connectors_spark.sink.backends import DuckDBBackend
from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink.topology import (
    discover_shards,
    parse_distributed_engine,
    parse_http_port,
    shard_addresses,
    table_engine,
)


@pytest.fixture()
def system_backend(tmp_path):
    b = DuckDBBackend(str(tmp_path / "sys.db"))
    b.execute("CREATE SCHEMA system")
    b.execute(
        "CREATE TABLE system.clusters("
        "cluster VARCHAR, shard_num INT, replica_num INT, "
        "host_address VARCHAR, port INT)"
    )
    for row in [
        ("c1", 1, 1, "10.0.0.1", 9000),
        ("c1", 1, 2, "10.0.0.2", 9000),  # replica 2: must be excluded
        ("c1", 2, 1, "10.0.0.3", 9000),
        ("other", 1, 1, "10.9.9.9", 9000),
    ]:
        b.execute(
            "INSERT INTO system.clusters VALUES (?, ?, ?, ?, ?)", row
        )
    b.execute(
        "CREATE TABLE system.tables(database VARCHAR, name VARCHAR, "
        "engine_full VARCHAR)"
    )
    b.execute(
        "INSERT INTO system.tables VALUES (?, ?, ?)",
        (
            "default",
            "dist_events",
            "Distributed('c1', 'default', 'events_local', rand())",
        ),
    )
    yield b
    b.close()


def test_discover_shards_one_node_per_shard(system_backend):
    nodes = discover_shards(system_backend, "c1")
    assert [(n.shard_num, n.address) for n in nodes] == [
        (1, "10.0.0.1:9000"),
        (2, "10.0.0.3:9000"),
    ]


def test_configured_nodes_win_over_discovery():
    opts = SinkOptions(
        url="duckdb://x",
        table_name="t",
        local_nodes=("n1:8123", "n2:8123"),
    )
    # no backend passed at all — discovery must not be attempted
    assert shard_addresses(opts) == ["n1:8123", "n2:8123"]


def test_discovery_fallback(system_backend):
    opts = SinkOptions(url="duckdb://x", table_name="t")
    assert shard_addresses(opts, system_backend, "c1") == [
        "10.0.0.1:9000",
        "10.0.0.3:9000",
    ]
    with pytest.raises(ValueError, match="write-local-nodes"):
        shard_addresses(opts)


def test_table_engine_lookup_and_distributed_parse(system_backend):
    engine = table_engine(system_backend, "default", "dist_events")
    assert parse_distributed_engine(engine) == (
        "c1",
        "default",
        "events_local",
    )
    with pytest.raises(LookupError):
        table_engine(system_backend, "default", "nope")
    with pytest.raises(ValueError, match="Distributed"):
        parse_distributed_engine("MergeTree ORDER BY id")


def test_parse_http_port():
    msg = (
        "Port 9000 is for clickhouse-client program. "
        "You must use port 8123 for HTTP."
    )
    assert parse_http_port(msg) == 8123
    assert parse_http_port("connection refused") is None
