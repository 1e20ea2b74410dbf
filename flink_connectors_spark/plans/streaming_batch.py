"""Batch-expressible streaming semantics over the `events` table:
tumbling/sliding windows, session windows (gap-based), streaming
dedup, watermark late-data horizon.

The reference's host engine provides these upstream of the sink
(SURVEY.md §2.2 streaming rows); the live Structured Streaming
pipelines are in ``flink_connectors_spark.streaming`` — these batch
twins pin the exact semantics so the driver can oracle-check them.

Window starts are emitted as epoch **seconds BIGINT**, not timestamps:
Spark's `window()` struct and DuckDB's `time_bucket` use different
bucket origins and tz-ness, while `floor(epoch/width)*width` is
unambiguous in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import load_table
from . import _util as U
from ._util import dec, dsum


def _epoch(col: str = "ts"):
    # unix_timestamp truncates to seconds; fine for bucketing.
    return F.unix_timestamp(F.col(col))


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "tumbling"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window aggregate — the batch twin of
    `groupBy(F.window(ts, '10 minutes'), event_type)`. One shuffle on
    (bucket, type); map-side partial aggregation applies."""
    e = load_table(spark, sf_dir, "events")
    bucket = (F.floor(_epoch() / 600) * 600).cast("bigint")
    return (
        e.groupBy(bucket.alias("window_start_s"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value")).alias("sum_value"),
        )
    )


@register(
    "stream_sliding_window",
    oracle="""
    WITH ev AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type FROM events),
    assigned AS (
      SELECT (es // 300) * 300 AS window_start_s, event_type FROM ev
      UNION ALL
      SELECT (es // 300) * 300 - 300 AS window_start_s, event_type FROM ev
    )
    SELECT window_start_s, event_type, COUNT(*) AS n_events
    FROM assigned GROUP BY 1, 2
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes: each event lands in
    exactly two windows (start = floor(es/300)*300 and that minus 300)
    — the batch twin of `F.window(ts, '10 minutes', '5 minutes')`,
    expressed as an explicit 2-way window assignment."""
    e = load_table(spark, sf_dir, "events").select(
        F.floor(_epoch()).cast("bigint").alias("es"), "event_type"
    )
    base = (F.floor(F.col("es") / 300) * 300).cast("bigint")
    assigned = e.select(base.alias("window_start_s"), "event_type").unionAll(
        e.select((base - 300).alias("window_start_s"), "event_type")
    )
    return assigned.groupBy("window_start_s", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS is_start
      FROM ordered),
    sessions AS (
      SELECT user_id, ts, event_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-min gap) via lag + running sum of
    session starts — the batch twin of `F.session_window(ts, '30
    minutes')`. Two window passes over one shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((_epoch("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sessions = marked.withColumn(
        "session_id", F.sum("is_start").over(wrun).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(F.unix_timestamp(F.min("ts"))).cast("bigint").alias("session_start_s"),
    )


@register(
    "stream_dedup_first_event",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT user_id, event_type, event_id, ts FROM ranked WHERE rn = 1
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user, event_type) — batch twin of
    streaming `dropDuplicates(['user_id','event_type'])` with an
    event-time tiebreak so the result is deterministic."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .transform(lambda d: U.ntz(d, "ts"))
    )


@register(
    "stream_watermark_horizon",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events)
    SELECT e.event_id, e.user_id, e.ts
    FROM events e, mx
    WHERE e.ts >= mx.max_ts - INTERVAL 24 HOUR
    """,
    tags=("streaming", "watermark"),
)
def stream_watermark_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, batch twin: rows within the 24h horizon of
    max event time survive; older rows are 'late' and dropped —
    mirrors `withWatermark('ts', '24 hours')` admission."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("max_ts"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .select("event_id", "user_id", "ts")
        .transform(lambda d: U.ntz(d, "ts"))
    )


@register(
    "stream_rollup_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "rollup", "hypertable"),
)
def stream_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of CONTINUOUS rollup maintenance: the hourly
    summary built with the streaming `window()` TVF — exactly the
    aggregation a `readStream ... groupBy(window(ts, '1 hour'))`
    pipeline runs incrementally under a watermark (live path
    exercised in tests/test_streaming.py). Produces the same summary
    schema `operators/rollup.build_rollup` emits, proving the
    streaming maintenance path and the batch backfill path agree."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("v_cents"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            "n",
            "v_cents",
        )
    )


@register(
    "stream_topk_heavy_hitters",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)
               AS window_start_s,
             event_type, user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2, 3),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY window_start_s, event_type
               ORDER BY n_events DESC, user_id) AS rnk
      FROM c)
    SELECT window_start_s, event_type, user_id, n_events, rnk
    FROM r WHERE rnk <= 3
    """,
    tags=("streaming", "window", "topk", "heavy-hitters"),
    since=7,
)
def stream_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per (10-minute window, event_type) — the batch
    twin of the streaming heavy-hitters pipeline
    (`streaming.pipelines.windowed_heavy_hitters`, an
    applyInPandasWithState Space-Saving sketch with bounded state
    and a reported per-key error; with capacity >= distinct keys it
    is exact and equals THIS query — the live pytest pins that).
    Batch shape: one keyed count + one rank window whose partition
    key is a prefix of the agg key, with the rank pruned partial
    (WindowGroupLimit ships <= 3 rows per group per partition).
    Ties break to the smaller user_id on both engines."""
    e = load_table(spark, sf_dir, "events")
    bucket = (F.floor(_epoch() / 600) * 600).cast("bigint")
    counts = e.groupBy(
        bucket.alias("window_start_s"),
        F.col("event_type"),
        F.col("user_id"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("window_start_s", "event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "stream_left_interval_join",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, ts AS click_ts, user_id AS c_user
      FROM events WHERE event_type = 'click'),
    e AS (
      SELECT event_id AS error_id, ts AS error_ts, user_id AS e_user
      FROM events WHERE event_type = 'error'),
    m AS (
      SELECT c.click_id, c.click_ts, c.c_user, e.error_id, e.error_ts
      FROM c JOIN e ON c.c_user = e.e_user
        AND e.error_ts > c.click_ts
        AND e.error_ts <= c.click_ts + INTERVAL 30 MINUTE),
    wm AS (
      SELECT least((SELECT MAX(click_ts) FROM c),
                   (SELECT MAX(error_ts) FROM e))
             - INTERVAL 1 HOUR AS w),
    um AS (
      SELECT c.click_id, c.click_ts, c.c_user,
             CAST(NULL AS BIGINT) AS error_id,
             CAST(NULL AS TIMESTAMP) AS error_ts
      FROM c, wm
      WHERE c.click_id NOT IN (SELECT click_id FROM m)
        AND c.click_ts + INTERVAL 30 MINUTE < wm.w)
    SELECT * FROM m UNION ALL SELECT * FROM um
    """,
    tags=("streaming", "join", "interval", "outer", "watermark"),
    since=8,
)
def stream_left_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream LEFT OUTER interval join
    (`streaming.pipelines.clicks_left_outer_errors_stream`), horizon
    and all: matched (click, error-within-30min) pairs plus null
    rows for unmatched clicks — but a null row only exists when the
    final watermark (min of both sides' max event time, minus the 1
    hour delay) has passed the click's join window, exactly the
    state-eviction rule the live join applies (verified empirically:
    the no-data final batch flushes precisely this set). Clicks
    newer than the horizon are withheld — the honest semantic
    difference between a batch left join and its streaming twin.

    Scale: the interval join shuffles each side once on user_id; the
    horizon is a one-row broadcast; the unmatched check is a keyed
    anti-join on click_id."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        F.col("user_id").alias("e_user"),
    )
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") > F.col("click_ts"))
        & (
            F.col("error_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        )
    )
    # result-sized, read by BOTH the output union and the unmatched
    # anti-join: checkpoint or the interval join recomputes per
    # branch (scan-ceiling audit caught the re-inline)
    matched = (
        clicks.join(errors, cond, "inner")
        .select("click_id", "click_ts", "c_user", "error_id", "error_ts")
        .localCheckpoint(eager=True)
    )
    wm = (
        clicks.agg(F.max("click_ts").alias("mc"))
        .crossJoin(errors.agg(F.max("error_ts").alias("me")))
        .select(
            (
                F.least(F.col("mc"), F.col("me"))
                - F.expr("INTERVAL 1 HOUR")
            ).alias("w")
        )
    )
    unmatched = (
        clicks.join(matched.select("click_id"), "click_id", "left_anti")
        .crossJoin(F.broadcast(wm))
        .filter(
            F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            < F.col("w")
        )
        .select(
            "click_id",
            "click_ts",
            "c_user",
            F.lit(None).cast("long").alias("error_id"),
            F.lit(None).cast(matched.schema["error_ts"].dataType).alias(
                "error_ts"
            ),
        )
    )
    return matched.unionByName(unmatched)


@register(
    "stream_dedup_within_watermark",
    oracle="""
    WITH base AS (
      SELECT event_id, ts, user_id, event_type FROM events),
    mx AS (SELECT MAX(ts) AS m FROM base),
    live AS (
      SELECT event_id, ts, user_id, event_type,
             'live' AS phase
      FROM base),
    tick AS (
      SELECT CAST(-1 AS BIGINT) AS event_id,
             m + INTERVAL 1 MINUTE AS ts,
             CAST(-1 AS BIGINT) AS user_id,
             'tick' AS event_type, 'tick' AS phase
      FROM mx),
    replay AS (
      SELECT event_id,
             m + (event_id % 7 + 2) * INTERVAL 1 MINUTE AS ts,
             user_id, event_type, 'replay' AS phase
      FROM base, mx
      WHERE event_id % 5 = 0
        AND ts <= m - INTERVAL 14 DAY)
    SELECT * FROM live
    UNION ALL SELECT * FROM tick
    UNION ALL SELECT * FROM replay
    """,
    tags=("streaming", "dedup", "watermark", "state"),
    since=9,
)
def stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the watermark-bounded streaming dedup
    (`streaming.pipelines.dedup_events_within_watermark`,
    `dropDuplicatesWithinWatermark` with a 7-day delay — the
    weekly re-ingest dedup shape; the 30-day event span then
    splits the replay set non-trivially at every SF), eviction
    horizon and all, over a three-phase replay:

    1. LIVE: the events table plus exact-copy retry redeliveries
       (at-least-once duplicates are byte-identical) for
       event_id % 3 == 0 — copies collapse to one value-identical
       emission per key.
    2. TICK: one synthetic heartbeat row 1 minute after the stream's
       max event time (its only job in the live run is to exist as a
       batch so the end-of-batch cleanup runs with the advanced
       watermark).
    3. REPLAY: the same event_id re-occurs with a fresh timestamp
       (max + (id % 7 + 2) minutes) for event_id % 5 == 0.

    Which replay rows re-emit is the empirically pinned eviction
    rule (probed on Spark 4.1, three availableNow microbatches): a
    key's state row is evicted at the END of batch N with the
    watermark IN EFFECT during batch N (expiresAt <= wm), and the
    duplicate check treats present-but-expired state as present — so
    a replay in batch 3 re-emits iff first_ts + delay <= max_live -
    delay, i.e. first_ts <= max_live - 2*delay (14 days). Keys
    newer than that horizon still hold state and their replays are
    silently dropped — the documented tradeoff of bounded-state
    dedup. `tests/test_streaming.py` replays exactly this three-file
    stream through the LIVE operator and matches this twin row for
    row.

    Scale: two events scans (live + replay candidates), the horizon
    is a one-row broadcast — no shuffle anywhere; the live operator
    keeps state bounded by the delay window instead of one row per
    key forever (the plain dropDuplicates failure mode)."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    mx = base.agg(F.max("ts").alias("m"))
    live = base.withColumn("phase", F.lit("live"))
    tick = mx.select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("m") + F.expr("INTERVAL 1 MINUTE")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("tick").alias("event_type"),
        F.lit("tick").alias("phase"),
    )
    replay = (
        base.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("event_id") % 5 == 0)
            & (F.col("ts") <= F.col("m") - F.expr("INTERVAL 14 DAYS"))
        )
        .select(
            "event_id",
            (
                F.col("m")
                + (F.col("event_id") % 7 + 2)
                * F.expr("INTERVAL 1 MINUTE")
            ).alias("ts"),
            "user_id",
            "event_type",
            F.lit("replay").alias("phase"),
        )
    )
    return live.unionByName(tick).unionByName(replay)
