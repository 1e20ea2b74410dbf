"""The ClickHouse-style sink connector, PySpark-native.

Re-expresses the reference connector's machinery (SURVEY.md §2.1
S1-S15) on Spark's execution model:

- ``options``     : immutable options model + validation (S1/S15)
- ``statements``  : SQL statement generation (S12)
- ``partitioner`` : shard routing strategies as repartition plans
                    (S4-S7 — routing is a shuffle, not per-row loops)
- ``writer``      : per-partition batched writer with count/time
                    triggers, retry with backoff, and the three
                    changelog->MergeTree translation modes (S3, S8-S11)
- ``backends``    : pluggable transport — DuckDB-backed local table
                    (testable without a ClickHouse server) and a
                    clickhouse-connect HTTP backend (import-gated)
- ``datasource``  : Python Data Source (`format("clickhouse_sink")`)
                    + a foreachBatch writer for Structured Streaming

Guarantee note (deliberate divergence, SURVEY.md §2.1 quirks): the
reference flushes asynchronously on a background thread and can lose
a buffered batch on crash; here flushes are synchronous within the
task / epoch, so Spark task retries + foreachBatch epoch semantics
give at-least-once without a lossy window.
"""

from .options import SinkOptions
from .partitioner import apply_partitioning
from .topology import discover_shards, shard_addresses
from .types import clickhouse_type_for, create_table_statement, ddl_columns
from .writer import write_batch

__all__ = [
    "SinkOptions",
    "apply_partitioning",
    "clickhouse_type_for",
    "create_table_statement",
    "ddl_columns",
    "discover_shards",
    "shard_addresses",
    "write_batch",
]
