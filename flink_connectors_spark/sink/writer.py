"""The sink writer: changelog translation + per-partition batched
writes with count/time triggers and retry.

Reference mapping (SURVEY.md §2.1):
- S3  batch output format -> ``_write_partition`` (buffer, count
      trigger `ClickHouseBatchOutputFormat.java:45-52`, final flush on
      close `:64-93`)
- S8  insert-only executor -> ``translate_changelog('insert_only')``
      (kind filter `ClickHouseBatchExecutor.java:49-53`) — with
      `ignore_delete` actually honored (the reference parses it at
      `ClickHouseDynamicTableFactory.java:115-120` but never reads it)
- S9  collapsing -> sign column +1/-1
      (`ClickHouseRowConverter.java:71-82`)
- S10 replacing -> deleted flag 0/1 + version
      (`ClickHouseRowConverter.java:83-94`)
- S11 upsert (reference dead code, fixed here) -> split by op: insert
      batch, per-key UPDATE / DELETE mutations
      (`ClickHouseUpsertExecutor.java:60-79`)
- retry w/ backoff -> ``_flush_with_retry``
      (`ClickHouseBatchExecutor.java:103-123`; backoff kept linear
      1s*attempt to match, but synchronous — see package docstring)

Time-triggered flush: in batch/micro-batch execution the epoch IS the
time trigger (trigger interval == the reference's flush-interval,
SURVEY.md §3 EP2); a wall-clock check is still kept in the partition
loop so a slow upstream iterator can't hold a buffer indefinitely.
"""

from __future__ import annotations

import itertools
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import statements
from .backends import backend_factory_for, shard_backend_factories
from .options import SinkOptions
from .partitioner import SHARD_COLUMN, apply_partitioning, with_shard_column

# RowKind codes, matching the reference's four kinds
# (`ClickHouseDynamicTableSink.java:26-31`).
OP_INSERT = "I"
OP_UPDATE_BEFORE = "UB"
OP_UPDATE_AFTER = "UA"
OP_DELETE = "D"
_UPSERT_KINDS = (OP_INSERT, OP_UPDATE_AFTER, OP_DELETE)


def translate_changelog(df: DataFrame, opts: SinkOptions) -> DataFrame:
    """Apply the write-mode's changelog translation declaratively (so
    Catalyst folds it into the upstream plan — no row loop)."""
    op = F.col(opts.op_column)
    has_op = opts.op_column in df.columns
    if opts.write_mode == "insert_only":
        if not has_op:
            return df
        if not opts.ignore_delete:
            # The reference parses sink.ignore-delete but never honors
            # it (SURVEY.md §2.1 quirks); here False is an explicit
            # config error steering users to a delete-capable mode.
            raise ValueError(
                "insert_only cannot apply deletes; set ignore_delete=true "
                "or use write_mode 'replacing'/'upsert'"
            )
        return df.filter(op.isin(OP_INSERT, OP_UPDATE_AFTER)).drop(opts.op_column)
    if not has_op:
        raise ValueError(
            f"write mode '{opts.write_mode}' requires an "
            f"'{opts.op_column}' changelog column"
        )
    if opts.write_mode == "collapsing":
        sign = F.when(op.isin(OP_INSERT, OP_UPDATE_AFTER), 1).otherwise(-1)
        return df.withColumn(opts.sign_column, sign).drop(opts.op_column)
    if opts.write_mode == "replacing":
        deleted = F.when(op.isin(OP_INSERT, OP_UPDATE_AFTER), 0).otherwise(1)
        if opts.version_column not in df.columns:
            raise ValueError(
                f"replacing mode requires version column "
                f"'{opts.version_column}'"
            )
        return df.withColumn(opts.deleted_column, deleted).drop(opts.op_column)
    # upsert keeps the op column; the writer splits on it
    return df.filter(op.isin(*_UPSERT_KINDS))


def precompact_changelog(df: DataFrame, opts: SinkOptions) -> DataFrame:
    """Within-micro-batch changelog pre-compaction (SURVEY.md §4:
    "within a micro-batch can pre-compact with Window last-by-key").
    The reference ships every changelog row and lets the MergeTree
    engine compact at merge time; at scale a hot key touched 10,000
    times in one batch ships 10,000 rows whose net effect is ONE. We
    drop superseded rows BEFORE the wire:

    - replacing/upsert (keyed, versioned): a batch's effect on the
      store is decided by the LAST op per key in version order. Which
      rows are candidates is MODE-dependent: in replacing mode a UB
      writes deleted=1 at its version like a delete (reference
      converter `ClickHouseRowConverter.java:83-94`), so UB rows stay
      last-row candidates — dropping them would resurrect a key whose
      changelog ends in a dangling UB (found by the hypothesis
      equivalence property). In upsert mode UB never mutates state
      (the executor drops it, `ClickHouseUpsertExecutor.java:60-79`),
      so only the final I/UA/D row per key survives.
    - collapsing (unkeyed, sign-summed): identical (row, +1)/(row, -1)
      pairs cancel; net sign per distinct row value survives (exploded
      |net| times for the pathological multi-count case). CAVEAT: this
      path argues NET-STATE equivalence only. The groupBy reorders the
      batch and re-emits synthesized ops, and CollapsingMergeTree is
      order-sensitive within a part (a -1 arriving before its +1 in
      the rewritten stream is kept, not collapsed), so PRE-merge part
      contents and reads without ``FINAL`` / merge-complete guarantees
      can differ from the raw stream more than the replacing path
      does. Don't enable collapsing precompaction on sinks whose
      readers skip FINAL.
    - insert_only: append-only, nothing to compact — returned as-is.

    **Version-tie determinism** (replacing/upsert): within a batch the
    winner per key is max version, tie-broken by batch arrival order
    (``monotonically_increasing_id`` captured before the window) —
    matching ReplacingMergeTree's keep-last-inserted-on-equal-version
    rule for the raw path's per-partition insert order. With ties
    split ACROSS Spark partitions the raw path itself is
    nondeterministic (concurrent partition writers race the insert
    order); the compacted path is then deterministic-but-arbitrary
    among the tied rows. For strict raw==compacted equivalence keep
    the version unique per key within a batch.

    Runs BEFORE :func:`translate_changelog`, on the raw op-column
    changelog. One keyed shuffle — the same key the sharded write path
    repartitions by next, so the exchange is typically reused.
    Equivalence (compacted vs raw final store state) is pinned in
    tests/test_sink_writer.py.
    """
    has_op = opts.op_column in df.columns
    if opts.write_mode == "insert_only" or not has_op:
        return df
    op = F.col(opts.op_column)
    if opts.write_mode in ("replacing", "upsert"):
        if opts.version_column not in df.columns:
            raise ValueError(
                f"precompaction in '{opts.write_mode}' mode needs version "
                f"column '{opts.version_column}' to order ops within the "
                "batch"
            )
        w = Window.partitionBy(*opts.primary_key).orderBy(
            F.desc(opts.version_column), F.desc("__arr__")
        )
        cand = df.withColumn("__arr__", F.monotonically_increasing_id())
        if opts.write_mode == "upsert":
            cand = cand.filter(op != OP_UPDATE_BEFORE)
        return (
            cand.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__", "__arr__")
        )
    if opts.write_mode == "collapsing":
        sign = F.when(op.isin(OP_INSERT, OP_UPDATE_AFTER), 1).otherwise(-1)
        value_cols = [c for c in df.columns if c != opts.op_column]
        return (
            df.withColumn("__s__", sign)
            .groupBy(*value_cols)
            .agg(F.sum("__s__").alias("__net__"))
            .filter(F.col("__net__") != 0)
            .withColumn(
                "__i__",
                F.explode(F.sequence(F.lit(1), F.abs(F.col("__net__")))),
            )
            .withColumn(
                opts.op_column,
                F.when(F.col("__net__") > 0, F.lit(OP_INSERT)).otherwise(
                    F.lit(OP_DELETE)
                ),
            )
            .select(*value_cols, opts.op_column)
        )
    return df


def _flush_with_retry(flush_fn, opts: SinkOptions) -> None:
    """Retry loop mirroring `ClickHouseBatchExecutor.java:103-123`
    (linear 1s*attempt backoff, max_retries attempts) but synchronous
    in the task so Spark's own task retry is the outer layer."""
    last = None
    for attempt in range(1, opts.max_retries + 1):
        try:
            flush_fn()
            return
        except Exception as e:  # noqa: BLE001 - transport errors vary
            last = e
            if attempt < opts.max_retries:
                time.sleep(min(1.0 * attempt, 10.0))
    raise RuntimeError(
        f"sink flush failed after {opts.max_retries} attempts"
    ) from last


class _PartitionWriter:
    """Per-task writer closure: picklable config, lazy connection.

    With ``shard_factories`` set (write-local mode), each row carries
    a shard id column and is routed to THAT shard's backend — one
    lazy connection + buffer per shard id seen in the partition
    (after the shard repartition that is almost always exactly one).
    Routing keys off the row's shard column, never the Spark
    partition id: hash-repartitioning does not map shard id i to
    partition i, so partition-id routing would mis-deliver."""

    def __init__(
        self,
        opts: SinkOptions,
        columns: list[str],
        factory,
        shard_factories: list | None = None,
    ) -> None:
        self.opts = opts
        self.columns = columns
        self.factory = factory
        self.shard_factories = shard_factories

    def __call__(self, rows_iter) -> None:
        opts = self.opts
        if self.shard_factories is not None:
            self._write_sharded(rows_iter)
            return
        backend = self.factory()
        try:
            if opts.write_mode == "upsert":
                self._write_upsert(backend, rows_iter)
            else:
                self._write_append(backend, rows_iter)
        finally:
            backend.close()

    def _write_sharded(self, rows_iter) -> None:
        """Row path with per-shard routing: strip the shard column,
        buffer per shard id, flush each shard's buffer through its own
        backend with the same count/time triggers."""
        opts = self.opts
        sid_idx = self.columns.index(SHARD_COLUMN)
        keep_idx = [i for i, c in enumerate(self.columns) if c != SHARD_COLUMN]
        data_cols = [c for c in self.columns if c != SHARD_COLUMN]
        upsert = opts.write_mode == "upsert"
        backends: dict[int, object] = {}
        bufs: dict[int, list[tuple]] = {}
        last: dict[int, float] = {}

        def flush(sid: int) -> None:
            buf = bufs[sid]
            if buf:
                batch, bufs[sid] = buf, []
                backend = backends[sid]
                if upsert:
                    _apply_upsert_chunk(backend, opts, data_cols, batch)
                else:
                    _flush_with_retry(
                        lambda: backend.insert_rows(
                            opts.table_name, data_cols, batch
                        ),
                        opts,
                    )
            last[sid] = time.monotonic()

        try:
            for row in rows_iter:
                r = tuple(row)
                sid = int(r[sid_idx])
                if sid not in backends:
                    backends[sid] = self.shard_factories[sid]()
                    bufs[sid] = []
                    last[sid] = time.monotonic()
                bufs[sid].append(tuple(r[i] for i in keep_idx))
                if (
                    len(bufs[sid]) >= opts.batch_size
                    or time.monotonic() - last[sid] >= opts.flush_interval_s
                ):
                    flush(sid)
            for sid in backends:
                flush(sid)
        finally:
            for b in backends.values():
                b.close()

    def _write_append(self, backend, rows_iter) -> None:
        opts = self.opts
        buf: list[tuple] = []
        last_flush = time.monotonic()

        def flush() -> None:
            nonlocal buf, last_flush
            if buf:
                batch = buf
                _flush_with_retry(
                    lambda: backend.insert_rows(
                        opts.table_name, self.columns, batch
                    ),
                    opts,
                )
                buf = []
            last_flush = time.monotonic()

        for row in rows_iter:
            buf.append(tuple(row))
            if (
                len(buf) >= opts.batch_size
                or time.monotonic() - last_flush >= opts.flush_interval_s
            ):
                flush()
        flush()

    def _write_upsert(self, backend, rows_iter) -> None:
        """Split-by-op upsert (fixed S11): inserts batched, updates/
        deletes as keyed mutations — three buffers like the
        reference's `ClickHouseUpsertExecutor.java:46-48`."""
        opts = self.opts
        for chunk in _chunks(rows_iter, opts.batch_size):
            _apply_upsert_chunk(
                backend, opts, self.columns, [tuple(r) for r in chunk]
            )


def _apply_upsert_chunk(
    backend, opts: SinkOptions, cols: list[str], chunk: list[tuple]
) -> None:
    """One upsert batch against one backend: inserts batched,
    updates/deletes as keyed mutations (`ClickHouseUpsertExecutor
    .java:60-79`). ``cols`` names the positions in ``chunk`` rows and
    must still contain the op column."""
    op_idx = cols.index(opts.op_column)
    data_cols = [c for c in cols if c != opts.op_column]
    keep_idx = [i for i, c in enumerate(cols) if c != opts.op_column]
    key_cols = list(opts.primary_key)
    val_cols = [c for c in data_cols if c not in set(key_cols)]
    upd_sql = statements.update_statement(opts.table_name, data_cols, key_cols)
    del_sql = statements.delete_statement(opts.table_name, key_cols)
    col_pos = {c: i for i, c in enumerate(cols)}

    inserts: list[tuple] = []
    mutations: list[tuple[str, tuple]] = []
    for r in chunk:
        kind = r[op_idx]
        if kind == OP_INSERT:
            inserts.append(tuple(r[i] for i in keep_idx))
        elif kind == OP_UPDATE_AFTER:
            params = tuple(r[col_pos[c]] for c in val_cols) + tuple(
                r[col_pos[c]] for c in key_cols
            )
            mutations.append((upd_sql, params))
        elif kind == OP_DELETE:
            params = tuple(r[col_pos[c]] for c in key_cols)
            mutations.append((del_sql, params))
        # UPDATE_BEFORE dropped (reference `:60-79`)
    if inserts:
        _flush_with_retry(
            lambda b=inserts: backend.insert_rows(
                opts.table_name, data_cols, b
            ),
            opts,
        )
    for sql, params in mutations:
        _flush_with_retry(lambda s=sql, p=params: backend.execute(s, p), opts)


def _chunks(it, size: int):
    it = iter(it)
    while True:
        chunk = list(itertools.islice(it, size))
        if not chunk:
            return
        yield chunk


class _ArrowPartitionWriter:
    """Arrow-batched append writer: rows cross the JVM->Python
    boundary as Arrow record batches (vectorized), get sliced/stacked
    to the configured batch size, and land in the backend through
    `insert_arrow` — no per-row Python anywhere. ~10x the row-iterator
    path; used for all append-shaped modes (insert_only / collapsing /
    replacing). The count trigger applies at row granularity via
    batch slicing; the wall-clock flush guard is kept (package
    docstring, EP2)."""

    def __init__(
        self, opts: SinkOptions, factory, shard_factories: list | None = None
    ) -> None:
        self.opts = opts
        self.factory = factory
        self.shard_factories = shard_factories

    def _sharded(self, batches):
        """Arrow path with per-shard routing: split each record batch
        by its shard-id column (vectorized filter — no per-row
        Python), strip the column, and run the count/time-triggered
        buffer per shard backend. After the shard repartition a task
        usually sees exactly one shard id, so the split is a no-op
        mask in the common case."""
        import pyarrow as pa
        import pyarrow.compute as pc

        opts = self.opts
        backends: dict[int, object] = {}
        bufs: dict[int, list] = {}
        counts: dict[int, int] = {}
        last: dict[int, float] = {}

        def flush(sid: int) -> None:
            if counts[sid]:
                table = pa.Table.from_batches(bufs[sid])
                backend = backends[sid]
                _flush_with_retry(
                    lambda: backend.insert_arrow(opts.table_name, table),
                    opts,
                )
                bufs[sid], counts[sid] = [], 0
            last[sid] = time.monotonic()

        try:
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                sid_arr = rb.column(rb.schema.get_field_index(SHARD_COLUMN))
                data_names = [
                    f.name for f in rb.schema if f.name != SHARD_COLUMN
                ]
                for sid_val in pc.unique(sid_arr).to_pylist():
                    sid = int(sid_val)
                    sub = rb.filter(pc.equal(sid_arr, sid_val)).select(
                        data_names
                    )
                    if sid not in backends:
                        backends[sid] = self.shard_factories[sid]()
                        bufs[sid], counts[sid] = [], 0
                        last[sid] = time.monotonic()
                    start = 0
                    while start < sub.num_rows:
                        take = min(
                            sub.num_rows - start,
                            opts.batch_size - counts[sid],
                        )
                        bufs[sid].append(sub.slice(start, take))
                        counts[sid] += take
                        start += take
                        if (
                            counts[sid] >= opts.batch_size
                            or time.monotonic() - last[sid]
                            >= opts.flush_interval_s
                        ):
                            flush(sid)
            for sid in backends:
                flush(sid)
        finally:
            for b in backends.values():
                b.close()
        yield pa.RecordBatch.from_pydict({"rows_written": [0]})

    def __call__(self, batches):
        import pyarrow as pa

        if self.shard_factories is not None:
            yield from self._sharded(batches)
            return

        opts = self.opts
        backend = self.factory()
        buf: list = []
        buffered = 0
        last_flush = time.monotonic()

        def flush() -> None:
            nonlocal buf, buffered, last_flush
            if buffered:
                table = pa.Table.from_batches(buf)
                _flush_with_retry(
                    lambda: backend.insert_arrow(opts.table_name, table),
                    opts,
                )
                buf, buffered = [], 0
            last_flush = time.monotonic()

        try:
            for rb in batches:
                start = 0
                while start < rb.num_rows:
                    take = min(
                        rb.num_rows - start, opts.batch_size - buffered
                    )
                    buf.append(rb.slice(start, take))
                    buffered += take
                    start += take
                    if (
                        buffered >= opts.batch_size
                        or time.monotonic() - last_flush
                        >= opts.flush_interval_s
                    ):
                        flush()
            flush()
        finally:
            backend.close()
        yield pa.RecordBatch.from_pydict({"rows_written": [0]})


def write_batch(
    df: DataFrame,
    opts: SinkOptions,
    n_shards: int = 0,
    backend_factory=None,
    shard_factories: list | None = None,
) -> None:
    """Write a (batch or foreachBatch micro-batch) DataFrame through
    the sink: changelog translation -> optional shard repartitioning
    -> per-partition batched writes.

    Append-shaped modes take the Arrow path (`mapInArrow`); upsert
    keeps the row path — its updates/deletes are inherently per-key
    statements (`ClickHouseUpsertExecutor.java:60-79`).

    Write-local routing (`ClickHouseShardOutputFormat.java:72-81`):
    when per-shard backends are known — ``shard_factories`` passed
    explicitly, or derivable from configured ``write-local-nodes`` —
    every row is delivered to ITS shard's backend: the shard id
    becomes a column, the repartition co-locates each shard's rows in
    one task, and the task writes through that shard's connection.
    With ``n_shards`` alone (no node list) the shuffle still shapes
    one-partition-per-shard but all partitions write the single
    configured url — layout-only, kept for single-endpoint targets
    (e.g. a load balancer in front of the cluster)."""
    if opts.precompact:
        df = precompact_changelog(df, opts)
    out = translate_changelog(df, opts)
    if opts.write_local and shard_factories is None and opts.local_nodes:
        shard_factories = shard_backend_factories(
            opts, list(opts.local_nodes)
        )
    if shard_factories:
        n = len(shard_factories)
        out = with_shard_column(out, opts, n)
        out = out.repartition(n, F.col(SHARD_COLUMN))
        if opts.write_mode == "upsert":
            out.foreachPartition(
                _PartitionWriter(
                    opts, list(out.columns), None, shard_factories
                )
            )
            return
        arrow_writer = _ArrowPartitionWriter(opts, None, shard_factories)
        out.mapInArrow(arrow_writer, "rows_written long").write.format(
            "noop"
        ).mode("overwrite").save()
        return
    if opts.write_local and n_shards > 0:
        out = apply_partitioning(out, opts, n_shards)
    factory = backend_factory or backend_factory_for(opts)
    if opts.write_mode == "upsert":
        writer = _PartitionWriter(opts, list(out.columns), factory)
        out.foreachPartition(writer)
        return
    arrow_writer = _ArrowPartitionWriter(opts, factory)
    out.mapInArrow(arrow_writer, "rows_written long").write.format(
        "noop"
    ).mode("overwrite").save()


def foreach_batch_writer(
    opts: SinkOptions, n_shards: int = 0, backend_factory=None
):
    """Adapter for Structured Streaming:
    ``stream.writeStream.foreachBatch(foreach_batch_writer(opts))`` —
    the micro-batch trigger interval plays the reference's
    flush-interval role (SURVEY.md §3 EP2). Delivery is at-least-once
    (a retried epoch re-appends); combine with replacing-mode versions
    for the effectively-once the reference README recommends, or use
    ``idempotent_foreach_batch_writer`` for append-only exactness."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        write_batch(batch_df, opts, n_shards, backend_factory)

    return write


def idempotent_foreach_batch_writer(opts: SinkOptions):
    """Exactly-once APPEND sink for parquet-dir targets: each epoch
    lands in its own subdirectory written with mode=overwrite, so a
    retried epoch REPLACES its own partial output instead of
    double-appending. This is the standard foreachBatch idempotency
    recipe (epoch id as the write key); the reference has no
    equivalent — its async flush can both lose and (on retry) repeat
    batches (SURVEY.md §2.1 quirks).

    Only meaningful for the ``parquet://`` transport, where an epoch
    directory is atomic-by-rename; SQL backends get exactness from
    replacing-mode versions instead."""
    if not opts.url.startswith("parquet://"):
        raise ValueError(
            "idempotent epoch writes need a parquet:// target; use "
            "replacing-mode versions for SQL backends"
        )
    root = opts.url[len("parquet://"):]

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        out = translate_changelog(batch_df, opts)
        (
            out.write.mode("overwrite").parquet(
                f"{root}/{opts.table_name}/epoch={epoch_id}"
            )
        )

    return write
