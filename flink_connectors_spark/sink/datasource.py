"""Python Data Source registration for the sink
(`format("clickhouse_sink")`), the Spark-4 equivalent of the
reference's SPI factory registration
(`META-INF/services/org.apache.flink.table.factories.Factory:16` +
`ClickHouseDynamicTableFactory.java:122-136`).

Batch: ``df.write.format("clickhouse_sink").options(**...).save()``
Stream: ``df.writeStream.format("clickhouse_sink")...`` (simple
commit/abort; exactly-once effect comes from replacing-mode versions,
as the reference's README suggests for ReplacingMergeTree).

Writers are Arrow-based (`DataSourceArrowWriter`): record batches
cross the JVM boundary vectorized, the changelog translation
(SURVEY.md §2.1 S8-S10 sign/flag synthesis) runs as pyarrow.compute
kernels over whole batches, and flushes go through the backends'
`insert_arrow` fast path — no per-row Python anywhere, mirroring
``sink.writer.write_batch``'s mapInArrow path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

from .backends import backend_factory_for
from .options import SinkOptions
from .writer import (
    OP_INSERT,
    OP_UPDATE_AFTER,
    _flush_with_retry,
)

FORMAT_NAME = "clickhouse_sink"


@dataclass
class _Commit(WriterCommitMessage):
    rows_written: int = 0


class _ArrowTranslatingWriter:
    """Shared write loop for batch and streaming writers: vectorized
    changelog translation + count-triggered batched flushes."""

    def __init__(self, opts: SinkOptions, columns: list[str]) -> None:
        if opts.write_mode not in ("insert_only", "collapsing", "replacing"):
            raise ValueError(
                f"DataSource path supports append modes; got "
                f"{opts.write_mode} (use writer.write_batch for upsert)"
            )
        self.opts = opts
        self.columns = columns

    def _translate(self, rb):
        """RecordBatch -> translated RecordBatch (drop op column,
        filter retractions or append sign/flag), all Arrow kernels."""
        import pyarrow as pa
        import pyarrow.compute as pc

        opts = self.opts
        if opts.op_column not in self.columns:
            return rb
        op = rb.column(self.columns.index(opts.op_column))
        keep_mask = pc.is_in(
            op, value_set=pa.array([OP_INSERT, OP_UPDATE_AFTER])
        )
        data = rb.drop_columns([opts.op_column])
        if opts.write_mode == "insert_only":
            return data.filter(keep_mask)
        if opts.write_mode == "collapsing":
            extra = pc.if_else(keep_mask, pa.scalar(1), pa.scalar(-1))
            return data.append_column(opts.sign_column, extra)
        extra = pc.if_else(keep_mask, pa.scalar(0), pa.scalar(1))
        return data.append_column(opts.deleted_column, extra)

    def write_batches(self, iterator) -> int:
        import pyarrow as pa

        opts = self.opts
        backend = backend_factory_for(opts)()
        written = 0
        buf: list = []
        buffered = 0
        try:
            def flush() -> None:
                nonlocal buf, buffered, written
                if buffered:
                    table = pa.Table.from_batches(buf)
                    _flush_with_retry(
                        lambda: backend.insert_arrow(opts.table_name, table),
                        opts,
                    )
                    written += buffered
                    buf, buffered = [], 0

            for rb in iterator:
                out = self._translate(rb)
                start = 0
                while start < out.num_rows:
                    take = min(
                        out.num_rows - start, opts.batch_size - buffered
                    )
                    buf.append(out.slice(start, take))
                    buffered += take
                    start += take
                    if buffered >= opts.batch_size:
                        flush()
            flush()
        finally:
            backend.close()
        return written


class ClickHouseSinkBatchWriter(DataSourceArrowWriter):
    def __init__(self, opts: SinkOptions, columns: list[str]) -> None:
        self.inner = _ArrowTranslatingWriter(opts, columns)

    def write(self, iterator) -> _Commit:
        return _Commit(self.inner.write_batches(iterator))

    def commit(self, messages) -> None:
        return None

    def abort(self, messages) -> None:
        return None


class ClickHouseSinkStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, opts: SinkOptions, columns: list[str]) -> None:
        self.inner = _ArrowTranslatingWriter(opts, columns)

    def write(self, iterator) -> _Commit:
        return _Commit(self.inner.write_batches(iterator))

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
