"""Cluster topology discovery (SURVEY.md §2.1 S14).

Re-expresses `table/internal/connection/ClickHouseConnectionProvider
.java`'s discovery flow on the backend protocol:

- configured node list wins (`sink.write-local-nodes` honored before
  any discovery, reference `:85-93`);
- otherwise the shard list comes from the reference's exact query
  over ``system.clusters`` (`:98`): one node per shard
  (``replica_num = 1``);
- the table's engine string comes from ``system.tables``
  (`:158-171`, SQL at `:161`) — used to pick the Distributed table's
  underlying cluster + local table;
- ``parse_http_port``: the reference probes a node's real HTTP port
  by issuing a request to the TCP port and regex-parsing the server's
  "port 8123 for HTTP" error message (`:31`, `:118-135`); the parse
  is a pure function here so it is unit-testable without a server.

Spark usage: this all runs DRIVER-side during sink setup; the
resulting shard list sizes the ``repartition(n_shards, keys)`` that
replaces the reference's in-task row routing (SURVEY.md §3 EP3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .options import SinkOptions

# Reference `ClickHouseConnectionProvider.java:98`.
CLUSTERS_SQL = (
    "SELECT shard_num, host_address, port FROM system.clusters "
    "WHERE cluster = ? AND replica_num = 1 ORDER BY shard_num"
)
# Reference `ClickHouseConnectionProvider.java:161`.
ENGINE_SQL = (
    "SELECT engine_full FROM system.tables "
    "WHERE database = ? AND name = ?"
)
# Reference `ClickHouseConnectionProvider.java:31`: the server answers
# non-HTTP ports with e.g. "... You must use port 8123 for HTTP."
_PORT_RE = re.compile(r"port (\d+) for HTTP")
# Distributed(cluster, database, table[, sharding_key]) engine string.
_DISTRIBUTED_RE = re.compile(
    r"Distributed\('?([^',]+)'?\s*,\s*'?([^',]+)'?\s*,\s*'?([^',)]+)'?"
)


@dataclass(frozen=True)
class ShardNode:
    shard_num: int
    host: str
    port: int

    @property
    def address(self) -> str:
        return f"{self.host}:{self.port}"


def parse_http_port(error_message: str) -> int | None:
    """Extract the advertised HTTP port from the server's wrong-port
    error message (reference `:118-135`)."""
    m = _PORT_RE.search(error_message)
    return int(m.group(1)) if m else None


def parse_distributed_engine(engine_full: str) -> tuple[str, str, str]:
    """(cluster, database, local_table) from a Distributed engine
    string, mirroring the README.md:43-47 flow. Raises on non-
    Distributed engines — write-local mode requires one."""
    m = _DISTRIBUTED_RE.search(engine_full)
    if not m:
        raise ValueError(
            f"not a Distributed table engine: {engine_full!r}; "
            "write-local mode needs a Distributed target"
        )
    return m.group(1), m.group(2), m.group(3)


def table_engine(backend, database: str, table: str) -> str:
    rows = backend.query(ENGINE_SQL, (database, table))
    if not rows:
        raise LookupError(f"table {database}.{table} not found")
    return rows[0][0]


def discover_shards(backend, cluster: str) -> list[ShardNode]:
    """One node per shard from system.clusters (replica_num = 1)."""
    return [
        ShardNode(int(num), str(host), int(port))
        for num, host, port in backend.query(CLUSTERS_SQL, (cluster,))
    ]


def shard_addresses(opts: SinkOptions, backend=None, cluster: str | None = None) -> list[str]:
    """The node list the shard writer fans out over: configured
    ``write-local-nodes`` first (reference `:85-93`), discovery only
    as the fallback."""
    if opts.local_nodes:
        return list(opts.local_nodes)
    if backend is None or cluster is None:
        raise ValueError(
            "no write-local-nodes configured; pass a backend and "
            "cluster name for discovery"
        )
    return [n.address for n in discover_shards(backend, cluster)]
