"""Python Data Source registration for the sink
(`format("clickhouse_sink")`), the Spark-4 equivalent of the
reference's SPI factory registration
(`META-INF/services/org.apache.flink.table.factories.Factory:16` +
`ClickHouseDynamicTableFactory.java:122-136`).

Batch: ``df.write.format("clickhouse_sink").options(**...).save()``
Stream: ``df.writeStream.format("clickhouse_sink")...`` (simple
commit/abort; exactly-once effect comes from replacing-mode versions,
as the reference's README suggests for ReplacingMergeTree).

The changelog translation happens row-wise here (the writer sits
after planning, like the reference's OutputFormat after the Flink
planner); for plan-level translation use
``flink_connectors_spark.sink.writer.write_batch`` instead, which
keeps it declarative.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

from .backends import backend_factory_for
from .options import SinkOptions
from .writer import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    _flush_with_retry,
)

FORMAT_NAME = "clickhouse_sink"


@dataclass
class _Commit(WriterCommitMessage):
    rows_written: int = 0


class _RowTranslatingWriter:
    """Shared write loop for batch and streaming writers: row-wise
    changelog translation + count-triggered batched flushes."""

    def __init__(self, opts: SinkOptions, columns: list[str]) -> None:
        self.opts = opts
        self.columns = columns

    def _translate(self, row: tuple, op_idx: int | None):
        opts = self.opts
        if op_idx is None:
            return row
        kind = row[op_idx]
        data = tuple(v for i, v in enumerate(row) if i != op_idx)
        if opts.write_mode == "insert_only":
            return data if kind in (OP_INSERT, OP_UPDATE_AFTER) else None
        if opts.write_mode == "collapsing":
            return data + ((1 if kind in (OP_INSERT, OP_UPDATE_AFTER) else -1),)
        if opts.write_mode == "replacing":
            return data + ((0 if kind in (OP_INSERT, OP_UPDATE_AFTER) else 1),)
        raise ValueError(
            f"DataSource path supports append modes; got {opts.write_mode}"
        )

    def out_columns(self) -> list[str]:
        opts = self.opts
        cols = [c for c in self.columns if c != opts.op_column]
        if opts.op_column in self.columns:
            if opts.write_mode == "collapsing":
                cols.append(opts.sign_column)
            elif opts.write_mode == "replacing":
                cols.append(opts.deleted_column)
        return cols

    def write_rows(self, iterator) -> int:
        opts = self.opts
        op_idx = (
            self.columns.index(opts.op_column)
            if opts.op_column in self.columns
            else None
        )
        backend = backend_factory_for(opts)()
        out_cols = self.out_columns()
        written = 0
        buf: list[tuple] = []
        try:
            def flush() -> None:
                nonlocal buf, written
                if buf:
                    batch = buf
                    _flush_with_retry(
                        lambda: backend.insert_rows(
                            opts.table_name, out_cols, batch
                        ),
                        opts,
                    )
                    written += len(batch)
                    buf = []

            for row in iterator:
                t = self._translate(tuple(row), op_idx)
                if t is not None:
                    buf.append(t)
                if len(buf) >= opts.batch_size:
                    flush()
            flush()
        finally:
            backend.close()
        return written


class ClickHouseSinkBatchWriter(DataSourceWriter):
    def __init__(self, opts: SinkOptions, columns: list[str]) -> None:
        self.inner = _RowTranslatingWriter(opts, columns)

    def write(self, iterator) -> _Commit:
        return _Commit(self.inner.write_rows(iterator))

    def commit(self, messages) -> None:
        return None

    def abort(self, messages) -> None:
        return None


class ClickHouseSinkStreamWriter(DataSourceStreamWriter):
    def __init__(self, opts: SinkOptions, columns: list[str]) -> None:
        self.inner = _RowTranslatingWriter(opts, columns)

    def write(self, iterator) -> _Commit:
        return _Commit(self.inner.write_rows(iterator))

    def commit(self, messages, batchId) -> None:
        return None

    def abort(self, messages, batchId) -> None:
        return None


class ClickHouseSinkDataSource(DataSource):
    """`'connector'='clickhouse'` equivalent. Option validation runs
    at construction, like the factory's validate (reference
    `ClickHouseDynamicTableFactory.java:138-184`)."""

    def __init__(self, options) -> None:
        super().__init__(options)
        self.opts = SinkOptions.from_dict(dict(options))

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        # Sink-only source; schema comes from the written DataFrame.
        return "ignored string"

    def writer(self, schema, overwrite: bool) -> ClickHouseSinkBatchWriter:
        return ClickHouseSinkBatchWriter(self.opts, list(schema.fieldNames()))

    def streamWriter(self, schema, overwrite: bool) -> ClickHouseSinkStreamWriter:
        return ClickHouseSinkStreamWriter(self.opts, list(schema.fieldNames()))


def register(spark) -> None:
    """Register the data source on a session (idempotent)."""
    spark.dataSource.register(ClickHouseSinkDataSource)
