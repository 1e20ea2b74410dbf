"""Changelog -> table-state translation: the reference connector's
core semantics (SURVEY.md §2.1 S8-S11), expressed as verifiable batch
queries.

The reference consumes a Flink changelog stream where each row carries
a RowKind in {INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE} (reference
`table/ClickHouseDynamicTableSink.java:24-32`) and translates it for a
ClickHouse MergeTree engine:

- insert-only (`table/internal/executor/ClickHouseBatchExecutor.java:49-53`):
  keep I/UA, drop UB/D.
- collapsing (`table/internal/executor/ClickHouseCollapsingExecutor.java:45-64`,
  sign append `table/internal/converter/ClickHouseRowConverter.java:71-82`):
  append every row with sign = +1 (I/UA) or -1 (UB/D); the engine
  collapses rows whose per-key sign-sum cancels.
- replacing (`table/internal/executor/ClickHouseReplacingExecutor.java:45-64`,
  flag append `ClickHouseRowConverter.java:83-94`): append with
  deleted-flag 0 (I/UA) / 1 (UB/D) + a version; last version wins.
- upsert (the reference's dead code path,
  `table/internal/executor/ClickHouseUpsertExecutor.java:60-79`, fixed
  here): apply ops in order; final state is the last I/UA per key,
  absent if the last op was D.

Here we derive a deterministic changelog from the `events` table
(op := event_type mapping, version := event_id) and express each
mode's *resulting table state* as a DataFrame plan, so the driver's
oracle can check the semantics exactly. The runtime writer lives in
``flink_connectors_spark.sink``; these plans are its semantic spec.

Scale note: compaction is one shuffle on the primary key; the
replacing/upsert "last version wins" uses max_by-style aggregation
(single agg) rather than a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import load_table

_TMP_CLEANUPS: set[str] = set()


def _register_tmp_cleanup(path: str) -> None:
    """Remove ``path`` at interpreter exit (once per path — repeated
    plan builds re-use the same session-scoped directory)."""
    if path in _TMP_CLEANUPS:
        return
    import atexit
    import shutil

    _TMP_CLEANUPS.add(path)
    atexit.register(shutil.rmtree, path, ignore_errors=True)

# event_type -> RowKind op code (I / UB / UA / D), chosen so every kind
# appears: signup=I, click/view=UA, error=D, purchase=UB.
_OP_SQL = """
    CASE event_type WHEN 'signup' THEN 'I'
                    WHEN 'error' THEN 'D'
                    WHEN 'purchase' THEN 'UB'
                    ELSE 'UA' END
"""

_CHANGELOG_SQL = f"""
    SELECT user_id AS pk, event_id AS ver, value AS payload,
           {_OP_SQL} AS op
    FROM events
"""


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "purchase", "UB")
        .otherwise("UA")
    )
    return e.select(
        F.col("user_id").alias("pk"),
        F.col("event_id").alias("ver"),
        F.col("value").alias("payload"),
        op.alias("op"),
    )


@register(
    "sink_insert_only",
    oracle=f"""
    WITH changelog AS ({_CHANGELOG_SQL})
    SELECT pk, ver, payload FROM changelog WHERE op IN ('I', 'UA')
    """,
    tags=("sink", "changelog"),
)
def sink_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-only mode: UB/D silently dropped (reference
    `ClickHouseBatchExecutor.java:49-53`)."""
    return _changelog(spark, sf_dir).filter(F.col("op").isin("I", "UA")).select(
        "pk", "ver", "payload"
    )


@register(
    "sink_collapsing_state",
    oracle=f"""
    WITH changelog AS ({_CHANGELOG_SQL}),
    signed AS (
      SELECT pk, CASE WHEN op IN ('I','UA') THEN 1 ELSE -1 END AS sign
      FROM changelog)
    SELECT pk, CAST(SUM(sign) AS BIGINT) AS sign_sum
    FROM signed GROUP BY pk HAVING SUM(sign) <> 0
    """,
    tags=("sink", "changelog", "collapsing"),
)
def sink_collapsing_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree state: sign = +1/-1 per row (reference
    `ClickHouseRowConverter.java:71-82`); surviving keys have non-zero
    sign-sum. One shuffle, map-side partial sums."""
    cl = _changelog(spark, sf_dir)
    signed = cl.select(
        "pk", F.when(F.col("op").isin("I", "UA"), 1).otherwise(-1).alias("sign")
    )
    return (
        signed.groupBy("pk")
        .agg(F.sum("sign").alias("sign_sum"))
        .filter(F.col("sign_sum") != 0)
    )


@register(
    "sink_replacing_state",
    oracle=f"""
    WITH changelog AS ({_CHANGELOG_SQL}),
    flagged AS (
      SELECT pk, ver, payload,
             CASE WHEN op IN ('I','UA') THEN 0 ELSE 1 END AS deleted
      FROM changelog),
    latest AS (
      SELECT pk, MAX(ver) AS ver FROM flagged GROUP BY pk)
    SELECT f.pk, f.ver, f.payload
    FROM flagged f JOIN latest l ON f.pk = l.pk AND f.ver = l.ver
    WHERE f.deleted = 0
    """,
    tags=("sink", "changelog", "replacing"),
)
def sink_replacing_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree state: deleted-flag 0/1 + version (reference
    `ClickHouseRowConverter.java:83-94`); last version per key wins,
    surviving only if deleted=0."""
    cl = _changelog(spark, sf_dir)
    flagged = cl.select(
        "pk",
        "ver",
        "payload",
        F.when(F.col("op").isin("I", "UA"), 0).otherwise(1).alias("deleted"),
    )
    w = Window.partitionBy("pk").orderBy(F.desc("ver"))
    return (
        flagged.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("deleted") == 0))
        .select("pk", "ver", "payload")
    )


@register(
    "sink_upsert_state",
    oracle=f"""
    WITH changelog AS ({_CHANGELOG_SQL}),
    applied AS (SELECT pk, ver, payload, op FROM changelog WHERE op <> 'UB'),
    latest AS (SELECT pk, MAX(ver) AS ver FROM applied GROUP BY pk)
    SELECT a.pk, a.ver, a.payload
    FROM applied a JOIN latest l ON a.pk = l.pk AND a.ver = l.ver
    WHERE a.op <> 'D'
    """,
    tags=("sink", "changelog", "upsert"),
)
def sink_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed upsert mode (reference's unreachable S11 path,
    `ClickHouseUpsertExecutor.java:60-79`): UB ignored; ops applied in
    version order; key absent if last op was DELETE."""
    cl = _changelog(spark, sf_dir).filter(F.col("op") != "UB")
    w = Window.partitionBy("pk").orderBy(F.desc("ver"))
    return (
        cl.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("pk", "ver", "payload")
    )


@register(
    "sink_precompact_batch",
    oracle=f"""
    WITH cl AS ({_CHANGELOG_SQL}),
    last AS (
      SELECT pk, ver, payload, op,
             ROW_NUMBER() OVER (PARTITION BY pk ORDER BY ver DESC) AS rn
      FROM cl)
    SELECT pk, ver, payload, op FROM last WHERE rn = 1
    """,
    tags=("sink", "changelog", "precompact"),
    since=3,
)
def sink_precompact_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-batch changelog pre-compaction for the keyed sink modes
    (SURVEY.md §4): ship ONE surviving row per primary key — the last
    I/UA/D in version order — instead of the key's full in-batch
    update history. Final store state is provably unchanged
    (equivalence pinned in tests/test_sink_writer.py); the win is
    wire/write volume on hot keys. One key shuffle, reused by the
    sharded write path that partitions on the same key next."""
    from ..sink.options import SinkOptions
    from ..sink.writer import precompact_changelog

    opts = SinkOptions(
        url="duckdb://:memory:", table_name="t", write_mode="replacing",
        primary_key=("pk",), version_column="ver",
    )
    return precompact_changelog(_changelog(spark, sf_dir), opts)


@register(
    "sink_map_struct_roundtrip",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_order,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_open
    FROM orders GROUP BY o_custkey
    """,
    tags=("sink", "types", "roundtrip"),
    since=6,
)
def sink_map_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP/STRUCT columns through the REAL sink write path — the r6
    extension past reference parity (the reference's converter throws
    UnsupportedOperationException for both,
    `ClickHouseRowConverter.java:144-145,227-228`).

    Per-customer order stats are packed into a struct column
    (``summary``: n_orders + first order timestamp) and a map column
    (``counts``: {'all','open'} -> count), written through the batched
    Arrow writer into the parquet backend, read back, and unpacked —
    so the driver's oracle (the same stats computed directly from
    ``orders``) verifies the nested values survived the
    changelog-translate -> Arrow-batch -> backend round trip intact.

    Scale shape: one key shuffle for the aggregate; the write itself
    is the sink's streaming-batched Arrow path (no driver collect);
    the readback scans only what the sink wrote."""
    import os
    import shutil
    import tempfile

    from ..sink.options import SinkOptions
    from ..sink.writer import write_batch

    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.sum(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("n_open"),
        )
    )
    packed = agg.select(
        "o_custkey",
        F.struct(
            F.col("n_orders").alias("n"), F.col("first_order").alias("first")
        ).alias("summary"),
        F.create_map(
            F.lit("all"), F.col("n_orders"), F.lit("open"), F.col("n_open")
        ).alias("counts"),
    )
    # PROCESS-scoped directory, rewritten per build: repeated plan
    # builds (registry sweeps, bench runs) must not accumulate parquet
    # copies in /tmp, and the readback below stays valid for this
    # invocation's lifetime (cleaned at interpreter exit). The PID in
    # the name keeps concurrent sessions (a bench at one SF plus a
    # pytest run at another) from rmtree'ing each other's live
    # directory mid-scan — a lazy readback can otherwise silently read
    # the other process's data — and avoids the predictable-/tmp-name
    # symlink hazard of a fixed path.
    out_dir = os.path.join(
        tempfile.gettempdir(), f"fcs_map_struct_roundtrip_{os.getpid()}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    _register_tmp_cleanup(out_dir)
    opts = SinkOptions(
        url=f"parquet://{out_dir}", table_name="order_stats"
    )
    write_batch(packed, opts)
    back = spark.read.parquet(f"{out_dir}/order_stats")
    return back.select(
        "o_custkey",
        F.col("summary.n").alias("n_orders"),
        F.col("summary.first").alias("first_order"),
        F.col("counts")["open"].alias("n_open"),
    )


@register(
    "sink_shard_routing_compat",
    oracle="""
    WITH h AS (
      SELECT user_id,
             xor((31 + hc) & 4294967295, 2147483648) - 2147483648 AS h
      FROM (
        SELECT user_id,
               CASE WHEN user_id IS NULL THEN 0 ELSE
                 xor(xor(user_id, (user_id >> 32) & 4294967295)
                     & 4294967295, 2147483648) - 2147483648
               END AS hc
        FROM events))
    SELECT CAST(((h % 8) + 8) % 8 AS INTEGER) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(user_id) AS min_user,
           MAX(user_id) AS max_user
    FROM h GROUP BY 1
    """,
    tags=("sink", "sharding", "compat"),
    since=6,
)
def sink_shard_routing_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-EXACT shard routing, driver-verified: the r6
    'hash-compat' partition strategy reproduces the reference's
    `HashPartitioner.java:18-25` bit for bit — ArrayList hashCode
    (h = 31*h + Long.hashCode(v), 32-bit overflow arithmetic) then
    `(h % n + n) % n` — so a deployment migrating from the reference
    keeps every row on the shard the old writer chose (shard-local
    replacing/collapsing state stays consistent mid-migration).

    The oracle rebuilds the same hash in DuckDB integer bit math
    (including the null-element rule: a NULL key hashes 0, so a NULL
    user_id routes to shard (31 % n), same as the Spark expression);
    per-shard row/user counts + key extrema hash-match only if every
    single row routed identically in both engines.

    Scale shape: the shard id is a codegen'd projection (no UDF); the
    per-shard aggregate is one bounded-key shuffle (n_shards groups).
    In the real writer this expression feeds `repartition(n, shard)`
    — one exchange, then each task holds exactly one shard's rows."""
    from ..sink.options import SinkOptions
    from ..sink.partitioner import SHARD_COLUMN, with_shard_column

    ev = load_table(spark, sf_dir, "events").select("user_id")
    opts = SinkOptions(
        url="parquet:///tmp/unused", table_name="t",
        partition_strategy="hash-compat", partition_key=("user_id",),
    )
    routed = with_shard_column(ev, opts, 8)
    return routed.groupBy(F.col(SHARD_COLUMN).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )
