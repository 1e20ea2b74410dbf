"""Changelog-replay streaming source (Python Data Source reader).

The source-side twin of the sink connector: replays a parquet
changelog in a stable order as micro-batches, with real offset
bookkeeping — the machinery a Kafka/CDC source needs (monotone
offsets, offset->partition planning, per-partition reads, commit),
demonstrated over a local file so it is testable here.

Usage:
    spark.dataSource.register(ChangelogReplayDataSource)
    stream = (spark.readStream.format("changelog_replay")
              .option("path", "/data/changelog.parquet")
              .option("order_by", "event_id")
              .option("rows_per_batch", "500")
              .load())

Scale note: this implementation plans row-ranges over one sorted
snapshot, which is the right shape for a bounded replay. An unbounded
production source would instead track (file, row-group) offsets from
parquet footers per micro-batch; the offset/partition/read/commit
protocol below is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_PA_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "date32[day]": "date",
}


def _ddl_for(path: str) -> str:
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    parts = []
    for f in schema:
        t = str(f.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t.startswith("list<item: float>") or t == "list<element: float>":
            ddl = "array<float>"
        elif t.startswith("list"):
            inner = t.split(" ", 1)[1].rstrip(">")
            ddl = f"array<{_PA_TO_DDL.get(inner, 'string')}>"
        else:
            ddl = _PA_TO_DDL.get(t)
            if ddl is None:
                raise ValueError(f"unsupported parquet type {t} for {f.name}")
        parts.append(f"{f.name} {ddl}")
    return ", ".join(parts)


@dataclass
class _RangePartition(InputPartition):
    path: str
    order_by: str
    start_row: int
    end_row: int
    n_slices: int
    slice_id: int


class ChangelogReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("option 'path' is required")
        self.order_by = options.get("order_by", "event_id")
        self.rows_per_batch = int(options.get("rows_per_batch", "1000"))
        self.n_slices = int(options.get("read_parallelism", "4"))
        import pyarrow.parquet as pq

        self.total_rows = pq.read_metadata(self.path).num_rows
        self._emitted = 0

    # -- offset protocol ---------------------------------------------------
    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # advance by one micro-batch worth of rows, clamped to EOF
        self._emitted = min(self._emitted + self.rows_per_batch, self.total_rows)
        return {"row": self._emitted}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return []
        return [
            _RangePartition(
                self.path, self.order_by, lo, hi, self.n_slices, i
            )
            for i in range(self.n_slices)
        ]

    def commit(self, end: dict) -> None:
        # replay source: nothing to clean up; a CDC source would ack here
        return None

    # -- data path ---------------------------------------------------------
    def read(self, partition: _RangePartition):
        from datetime import datetime, timezone

        import pyarrow.parquet as pq

        t = pq.read_table(partition.path)
        t = t.sort_by(partition.order_by)
        t = t.slice(
            partition.start_row, partition.end_row - partition.start_row
        )

        def fix(v):
            # Spark's Python DataSource row path requires tz-aware
            # timestamps (naive ones fail Arrow conversion).
            if isinstance(v, datetime) and v.tzinfo is None:
                return v.replace(tzinfo=timezone.utc)
            return v

        # round-robin slice for executor parallelism within the batch
        for i, row in enumerate(t.to_pylist()):
            if i % partition.n_slices == partition.slice_id:
                yield tuple(fix(v) for v in row.values())


class ChangelogReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "changelog_replay"

    def schema(self) -> str:
        return _ddl_for(self.options["path"])

    def streamReader(self, schema) -> ChangelogReplayStreamReader:
        return ChangelogReplayStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ChangelogReplayDataSource)
