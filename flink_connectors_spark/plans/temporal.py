"""Temporal join operators over the events stream table: as-of join,
interval (range) join, and a pivoted time-bucket rollup.

The reference's host engine (Flink SQL 1.12 blink planner,
`pom.xml:60-72`) exposes interval joins and temporal/as-of semantics
upstream of the sink (`README.md:4-28` assumes arbitrary Flink SQL
feeding it); Spark has no built-in as-of join, so it is re-expressed
here as compositions of shuffle-once primitives (SURVEY.md §2.3
"custom operators": composition of DataFrame ops before any UDF).

Scale notes (100 TB):
- as-of join: union + one window over the join key — events shuffle
  ONCE on user_id; no per-row lookups, no broadcast of the build side
  needed, skew handled by AQE.
- interval join: equi-join on the key with the time range as a join
  predicate — one shuffle per side on user_id. For extreme per-key
  cardinality, pre-bucket both sides by (key, time_bucket) so the
  range only scans two buckets; at this corpus's fan-out the plain
  keyed join is the better plan (no row duplication).
- pivot: fixed pivot-value list (no discovery pass over the data),
  conditional map-side partial aggregation, single shuffle on the
  day bucket.

Determinism: window order is the total order (ts, event_id);
`value` is 2-dp money so sums use exact int64 hundredths
(_util.cents); gap seconds computed in whole microseconds-to-seconds
integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from . import _util as U
from ._util import sql_cents

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "join_asof_last_view",
    oracle="""
    WITH tagged AS (
      SELECT event_id, ts, user_id, event_type,
             last_value(CASE WHEN event_type = 'view' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS view_id,
             last_value(CASE WHEN event_type = 'view' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS view_ts
      FROM events
      WHERE event_type IN ('view', 'click')
    )
    SELECT event_id AS click_id, ts AS click_ts, user_id,
           view_id, view_ts,
           CAST(floor(date_part('epoch', ts) )
                - floor(date_part('epoch', view_ts)) AS BIGINT) AS gap_s
    FROM tagged WHERE event_type = 'click'
    """,
    tags=("temporal", "asof", "window"),
)
def join_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the same user's most recent
    view at-or-before it (total order: ts, then event_id). Expressed
    as union + running last_value(ignorenulls) — the distributed
    as-of formulation: ONE shuffle of events on user_id, no point
    lookups. Clicks with no prior view keep NULL (left as-of)."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("view_id"),
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("view_ts"),
    )
    gap = (
        F.floor(F.unix_timestamp("ts"))
        - F.floor(F.unix_timestamp("view_ts"))
    ).cast("bigint")
    out = tagged.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
        "view_id",
        "view_ts",
        gap.alias("gap_s"),
    )
    return U.ntz(out, "click_ts", "view_ts")


@register(
    "join_asof_tolerance",
    oracle="""
    WITH tagged AS (
      SELECT event_id, ts, user_id, event_type,
             last_value(CASE WHEN event_type = 'view' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS raw_view_id,
             last_value(CASE WHEN event_type = 'view' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS raw_view_ts
      FROM events
      WHERE event_type IN ('view', 'click')
    ),
    gapped AS (
      SELECT event_id, ts, user_id, raw_view_id,
             CAST(floor(date_part('epoch', ts))
                  - floor(date_part('epoch', raw_view_ts)) AS BIGINT) AS g
      FROM tagged WHERE event_type = 'click')
    SELECT event_id AS click_id, ts AS click_ts, user_id,
           CASE WHEN g <= 600 THEN raw_view_id END AS view_id,
           CASE WHEN g <= 600 THEN g END AS gap_s,
           CAST(CASE WHEN raw_view_id IS NOT NULL AND g > 600
                THEN 1 ELSE 0 END AS BIGINT) AS stale_match
    FROM gapped
    """,
    tags=("temporal", "asof", "tolerance", "window"),
    since=4,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas merge_asof's ``tolerance=``,
    QuestDB/kdb asof semantics): each click takes the same user's
    most recent view only if it happened within the last 600 s;
    older matches are voided to NULL and counted as ``stale_match``
    instead — attribution windows, sensor-staleness joins. Same
    single user-keyed shuffle as join_asof_last_view (the tolerance
    is a post-window filter, never a second join); at 100 TB the
    window state per key is one row."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("raw_view_id"),
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("raw_view_ts"),
    )
    g = (
        F.floor(F.unix_timestamp("ts"))
        - F.floor(F.unix_timestamp("raw_view_ts"))
    ).cast("bigint")
    in_tol = g <= 600
    out = tagged.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
        F.when(in_tol, F.col("raw_view_id")).alias("view_id"),
        F.when(in_tol, g).alias("gap_s"),
        (F.col("raw_view_id").isNotNull() & (g > 600))
        .cast("long")
        .alias("stale_match"),
    )
    return U.ntz(out, "click_ts")


@register(
    "join_interval_clicks_before_error",
    oracle="""
    SELECT e.event_id AS error_id, e.ts AS error_ts, e.user_id,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events e
    JOIN events c
      ON e.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL 30 MINUTE
     AND c.ts < e.ts
    WHERE e.event_type = 'error'
    """,
    tags=("temporal", "interval", "join"),
)
def join_interval_clicks_before_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval (range) join: clicks within the 30 minutes before
    each same-user error — the batch analogue of a Flink stream
    interval join. Planned as an equi-join on user_id with the time
    range as join predicate: each side shuffles once on the key; the
    range never degenerates into a cross product."""
    ev = _events(spark, sf_dir)
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        "user_id",
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user_id"),
    )
    out = e.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (
            F.col("click_ts")
            >= F.col("error_ts") - F.expr("INTERVAL 30 MINUTES")
        )
        & (F.col("click_ts") < F.col("error_ts")),
    ).select("error_id", "error_ts", "user_id", "click_id", "click_ts")
    return U.ntz(out, "error_ts", "click_ts")


@register(
    "join_interval_bucketed",
    oracle="""
    SELECT e.event_id AS error_id, e.ts AS error_ts, e.user_id,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events e
    JOIN events c
      ON e.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL 30 MINUTE
     AND c.ts < e.ts
    WHERE e.event_type = 'error'
    """,
    tags=("temporal", "interval", "join", "bucketed"),
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB formulation of the same interval join: quantize
    event time into buckets the width of the interval (30 min) and
    equi-join on (user_id, bucket) — each error probes its own bucket
    and the previous one (a click at most 30 min earlier can only
    live there), then the exact range predicate filters within the
    tiny candidate set.

    Why it matters at scale: the plain formulation joins on user_id
    alone with time as a post-condition, so a power user's whole
    multi-year history lands in one task and the per-key candidate
    set is O(clicks_per_user x errors_per_user). Bucketing puts TIME
    into the shuffle key: candidates are bounded by activity within
    two 30-minute windows regardless of history length — the same
    windowing trick Flink's stream-stream interval join applies via
    state retention. Identical results to
    `join_interval_clicks_before_error` (same oracle)."""
    bucket_s = 1800
    ev = _events(spark, sf_dir)
    e = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
            "user_id",
            F.floor(F.unix_timestamp("ts") / bucket_s).alias("b"),
        )
        .withColumn("bkt", F.explode(F.array(F.col("b"), F.col("b") - 1)))
        .drop("b")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user_id"),
        F.floor(F.unix_timestamp("ts") / bucket_s).alias("cbkt"),
    )
    out = (
        e.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("bkt") == F.col("cbkt"))
            & (
                F.col("click_ts")
                >= F.col("error_ts") - F.expr("INTERVAL 30 MINUTES")
            )
            & (F.col("click_ts") < F.col("error_ts")),
        )
        .select("error_id", "error_ts", "user_id", "click_id", "click_ts")
    )
    return U.ntz(out, "error_ts", "click_ts")


@register(
    "funnel_signup_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_signup
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id)
    SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
           (s3.t_purchase IS NOT NULL) AS completed
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    tags=("temporal", "funnel", "agg", "join"),
)
def funnel_signup_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered-sequence funnel: signup -> first click strictly after
    it -> first purchase strictly after that, per user. Three keyed
    aggregations + left joins, all hashed on user_id — the exchanges
    reuse one partitioning, and per-stage state is one timestamp per
    user (bounded, streaming-friendly)."""
    ev = _events(spark, sf_dir)

    def stage(etype: str, prev: DataFrame, prev_t: str, out: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select(
            F.col("user_id").alias("u"), "ts"
        )
        return (
            e.join(prev, e.u == prev.user_id)
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("u")
            .agg(F.min("ts").alias(out))
            .withColumnRenamed("u", "user_id")
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = stage("click", s1, "t_signup", "t_click")
    s3 = stage("purchase", s2, "t_click", "t_purchase")
    return (
        s1.join(s2, "user_id", "left_outer")
        .join(s3, "user_id", "left_outer")
        .select(
            "user_id",
            "t_signup",
            "t_click",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("completed"),
        )
        .transform(lambda d: U.ntz(d, "t_signup", "t_click", "t_purchase"))
    )


_PIVOT_SQL = ",\n           ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN "
    f"{sql_cents('value')} ELSE 0 END) AS DOUBLE) / 100.0 AS {t}_value"
    for t in _EVENT_TYPES
)


@register(
    "pivot_daily_event_values",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS day,
           {_PIVOT_SQL}
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    tags=("temporal", "pivot", "agg"),
)
def pivot_daily_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily value totals pivoted into one column per event type.
    The pivot value list is fixed up front (no extra discovery scan);
    partial aggregation happens map-side, one shuffle on the day
    bucket. Money sums in exact int64 hundredths."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    pivoted = (
        ev.groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.sum("value_c"))
    )
    out = [F.col("day")] + [
        (F.coalesce(F.col(t), F.lit(0)).cast("double") / F.lit(100.0)).alias(
            f"{t}_value"
        )
        for t in _EVENT_TYPES
    ]
    return pivoted.select(*out)


@register(
    "resample_gapfill_hourly",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM events WHERE event_type = 'purchase'),
    grid AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) AS v_cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1)
    SELECT g.bucket,
           COALESCE(a.n, 0) AS n_events,
           CAST(COALESCE(a.v_cents, 0) AS DOUBLE) / 100.0 AS total_value
    FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket
    """,
    tags=("temporal", "resample", "gapfill"),
)
def resample_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resampling: hourly purchase totals with
    zero-filled gaps. The bucket grid is generated with sequence()
    from the (tiny, broadcast) min/max bounds — never collected to
    the driver — and outer-joined to the hourly aggregate. At scale:
    one keyed shuffle for the aggregate; the grid side is O(hours),
    broadcast."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    agg = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "v_cents"
            ),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    return (
        grid.join(agg, "bucket", "left_outer")
        .select(
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            (
                F.coalesce(F.col("v_cents"), F.lit(0)).cast("double")
                / F.lit(100.0)
            ).alias("total_value"),
        )
        .transform(lambda d: U.ntz(d, "bucket"))
    )


_HOUR_SUMS_SQL = ", ".join(
    f"CAST(SUM(CASE WHEN CAST(hour(ts) AS INT) = {h} THEN 1 ELSE 0 END) AS BIGINT)"
    for h in range(24)
)
_TS_DOT = (
    "CAST(list_sum(list_transform(list_zip(a.v, b.v), "
    "p -> p[1] * p[2])) AS DOUBLE)"
)
_TS_NRM = (
    "sqrt(CAST(list_sum(list_transform({s}.v, x -> x * x)) AS DOUBLE))"
)


@register(
    "timeseries_user_similarity",
    oracle=f"""
    WITH hist AS (
      SELECT user_id, [{_HOUR_SUMS_SQL}] AS v
      FROM events GROUP BY user_id),
    scored AS (
      SELECT a.user_id, b.user_id AS similar_user,
             round({_TS_DOT} / ({_TS_NRM.format(s='a')} * {_TS_NRM.format(s='b')}), 6) AS score
      FROM hist a JOIN hist b ON a.user_id <> b.user_id)
    SELECT user_id, similar_user, score, CAST(rn AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY score DESC, similar_user) AS rn
      FROM scored) t
    WHERE rn <= 3
    """,
    tags=("temporal", "timeseries", "similarity", "topk"),
)
def timeseries_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the distributed-streams shape of
    'Time Series Similarity Search for Streaming Data in Distributed
    Systems', EDBT 2019): each user's activity becomes a 24-dim hourly
    histogram vector — ONE aggregate with 24 conditional sums, no
    pivot shuffle — and the top-3 most similar users are ranked by
    cosine. Counts are exact integers, so dots and norms are
    bit-identical cross-engine; the one float division is IEEE-
    deterministic. The pair stage reuses the brute-force pattern
    (fine for |users|; swap in the sign-LSH bucketing from
    operators/similarity for web-scale user counts)."""
    ev = _events(spark, sf_dir)
    hod = F.hour("ts")
    hist = ev.groupBy("user_id").agg(
        F.array(
            *[
                F.sum(F.when(hod == h, 1).otherwise(0)).cast("long")
                for h in range(24)
            ]
        ).alias("v")
    )
    a = hist.alias("a")
    b = hist.select(
        F.col("user_id").alias("similar_user"), F.col("v").alias("bv")
    ).alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("bv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    scored = (
        a.join(b, F.col("user_id") != F.col("similar_user"))
        .withColumn(
            "score",
            F.round(F.try_divide(dot, nrm(F.col("v")) * nrm(F.col("bv"))), 6),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("similar_user")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "similar_user", "score", "rnk")
    )


@register(
    "trajectory_user_similarity",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS traj
      FROM events GROUP BY user_id),
    grams AS (
      SELECT user_id, traj,
             CASE WHEN len(traj) >= 2
                  THEN list_distinct(list_transform(range(1, len(traj)),
                       i -> substr(traj, CAST(i AS INT), 2)))
                  ELSE [] END AS g
      FROM seqs),
    pairs AS (
      SELECT a.user_id AS u1, b.user_id AS u2,
             round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                   / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE), 6)
               AS sim
      FROM grams a JOIN grams b
        ON a.user_id < b.user_id
       AND len(a.g) > 0 AND len(b.g) > 0)
    SELECT u1, u2, sim FROM pairs WHERE sim >= 0.999999
    """,
    tags=("temporal", "trajectory", "similarity"),
)
def trajectory_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity (the distributed-trajectory-search shape
    of REPOSE, ICDE 2021, over behavioral rather than spatial
    trajectories): each user's ordered event-type sequence becomes a
    compact symbol string — one shuffle on user_id with an
    order-deterministic string_agg — and users with IDENTICAL
    transition structure (bigram-set Jaccard == 1.0) are paired.
    The bigram-set representation is the trajectory analogue of
    shingling, so the full MinHash-LSH machinery from
    operators/dedup drops in when |users| outgrows the blocked
    self-join used here."""
    ev = _events(spark, sf_dir)
    seqs = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("sym")).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["sym"]
                ),
            ).alias("traj")
        )
    )
    idx = F.sequence(F.lit(1), F.length("traj") - 1)
    grams = seqs.select(
        "user_id",
        F.when(
            F.length("traj") >= 2,
            F.array_distinct(
                F.transform(idx, lambda i: F.col("traj").substr(i, F.lit(2)))
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    # g is array_distinct output -> the union-free identity applies
    from ..functions import jaccard_distinct

    sim = F.round(jaccard_distinct(F.col("a.g"), F.col("b.g")), 6)
    return (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.size("a.g") > 0)
            & (F.size("b.g") > 0),
        )
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("b.user_id").alias("u2"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= 0.999999)
    )


@register(
    "anomaly_value_zscore",
    oracle="""
    WITH stats AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id,
           round(CAST(e.value AS DOUBLE), 2) AS value,
           round(
             (CAST(n AS DOUBLE) * CAST(round(e.value * 100) AS BIGINT)
              - CAST(s1 AS DOUBLE))
             / sqrt(CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))),
             6) AS zscore
    FROM events e JOIN stats USING (user_id)
    WHERE n >= 8
      AND (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) > 0
      AND abs(
            (CAST(n AS DOUBLE) * CAST(round(e.value * 100) AS BIGINT)
             - CAST(s1 AS DOUBLE))
            / sqrt(CAST(n AS DOUBLE)
                   * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))) > 2.5
    """,
    tags=("temporal", "anomaly", "agg", "join"),
)
def anomaly_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value-anomaly flagging: events whose z-score against
    their user's population mean/std exceeds 2.5 (users with >= 8
    events and non-zero variance).

    Determinism discipline: the sufficient statistics (n, Σx, Σx²)
    are EXACT int64 sums over cents, so the z-score
    (n·x − Σx) / sqrt(n·(n·Σx² − Σx²)) — the population-σ form scaled
    by n — is a few IEEE float ops over identical integers in every
    engine; a float mean/std pipeline would diverge in the last ulp
    and flip rows at the threshold. Two passes expressed as one agg +
    one broadcastable join back; at 100 TB the stats table is
    users-sized, tiny next to events."""
    ev = _events(spark, sf_dir)
    c = F.round(F.col("value") * 100).cast("long")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    nd = F.col("n").cast("double")
    num = nd * c.cast("double") - F.col("s1").cast("double")
    disc = nd * F.col("s2").cast("double") - (
        F.col("s1").cast("double") * F.col("s1").cast("double")
    )
    # try_divide: a zero-variance user (disc == 0) must not raise under
    # ANSI mode — Catalyst may evaluate abs(z) > 2.5 before the
    # disc > 0 conjunct after optimization (conjunct order is not
    # guaranteed); null z rows are dropped by the filter anyway
    z = F.try_divide(num, F.sqrt(nd * disc))
    return (
        ev.join(stats, "user_id")
        .filter((F.col("n") >= 8) & (disc > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value").cast("double"), 2).alias("value"),
            F.round(z, 6).alias("zscore"),
        )
    )


@register(
    "rollup_daily_from_hourly",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("temporal", "rollup", "hypertable", "agg"),
)
def rollup_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup (continuous-aggregate pattern): build the
    HOURLY summary table — the one pass over facts — then answer the
    DAILY question from the summary alone. The oracle aggregates the
    fact table directly, so the driver's hash check proves rollup
    additivity end-to-end: hour buckets nest in days and the int64
    cent partials add exactly. At 100 TB the daily query reads
    |hours x event_types| rows instead of the fact table."""
    from ..operators import rollup as R

    ev = _events(spark, sf_dir)
    hourly = R.build_rollup(ev, grain="hour")
    daily = R.answer_from_rollup(hourly, grain="day")
    return R.finalize(daily)


@register(
    "rollup_sketch_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
    tags=("temporal", "rollup", "sketch", "approx", "hypertable"),
)
def rollup_sketch_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The NON-additive half of the hypertable rollup: distinct
    counts don't add across buckets, so the summary row carries a
    mergeable HLL sketch (DataSketches hll_sketch_agg) instead of a
    number. Daily per-type sketches are built first (the rollup
    pass), then UNIONED across days (the coarser-grain query) and
    estimated — the checkable output is the error-bound predicate
    |estimate - exact| / exact < 0.05 per event type, which the
    oracle asserts, plus the exact count for reference. This is how
    a 100 TB summary table answers 'distinct users last quarter'
    without a fact-table scan."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                < 0.05
            ).alias("within_bound"),
        )
    )


@register(
    "rollup_merge_day",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("temporal", "rollup", "hypertable", "incremental"),
    since=3,
)
def rollup_merge_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup REFRESH: the standing hourly summary (built
    from facts before 2024-01-25) absorbs the rollup of the new
    ingest window (facts from the 25th on) via merge_rollup — union +
    re-aggregate over summary-sized data. The oracle aggregates ALL
    facts directly, so the driver's hash check proves merge == rebuild
    exactly (additive COUNT / int64-cent partials). This is the
    nightly continuous-aggregate job at 100 TB: old facts are never
    rescanned; the refresh cost is |delta buckets x dims|."""
    from ..operators import rollup as R

    ev = _events(spark, sf_dir)
    cut = F.to_timestamp(F.lit("2024-01-25 00:00:00"))
    standing = R.build_rollup(ev.filter(F.col("ts") < cut), grain="hour")
    delta = R.build_rollup(ev.filter(F.col("ts") >= cut), grain="hour")
    return R.finalize(R.merge_rollup(standing, delta))


def _hll_users_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure a deterministic-HLL register artifact that has lived an
    ingest day: base built on events before the 25th, the newer
    window APPENDED transactionally (only the batch hashed). The
    same user_id appears on BOTH sides of the cut — deliberately:
    register MAX is idempotent, so overlapping batches are exactly
    what the distinct-count sketch family must absorb (a user seen
    on two days maxes into the same register). Contract in
    `operators.artifacts.ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact
    from ..operators.scale import hll_append, hll_build_artifact

    def build(path: str) -> None:
        ev = _events(spark, sf_dir)
        cut = F.to_timestamp(F.lit("2024-01-25 00:00:00"))
        hll_build_artifact(
            ev.filter(F.col("ts") < cut), path, "user_id", p=6
        )
        hll_append(
            ev.filter(F.col("ts") >= cut), path, "ingest1",
            "user_id", p=6,
        )

    return ensure_artifact(spark, "hll_users", sf_dir, build)


@register(
    "rollup_hll_append_probe",
    oracle="""
    WITH t AS (
      SELECT CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 64 AS reg,
             CAST(concat('0x', substr(h, 9, 8)) AS BIGINT) AS x
      FROM (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events))
    SELECT reg,
           CAST(MAX(CASE WHEN x = 0 THEN 33
                         ELSE strpos(lpad(bin(x), 32, '0'), '1')
                    END) AS INT) AS rho
    FROM t GROUP BY reg
    """,
    tags=("temporal", "rollup", "sketch", "hll", "incremental"),
    since=14,
)
def rollup_hll_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest for the distinct-count sketch — the
    MAX-monoid member of the shared transactional protocol (r14).
    Unlike the built-in DataSketches HLL (opaque binary, so its
    rollup rows carry error-bound oracles), this register table is
    fully deterministic — reg = first md5 word mod 2^p, rho = first
    set bit of the second word's 32-bit slice via pure
    integer/string ops — so the DuckDB oracle replays the FULL event
    stream's registers and the driver value-hashes them EXACTLY. The
    probed artifact was built on events before the ingest cut and
    the newer window appended transactionally; the uncompacted read
    MAX-merges the committed register partitions, so a MATCH proves
    max(reg(old), reg(delta)) == reg(all) register-for-register —
    the mergeability that lets a 100 TB summary answer 'distinct
    users last quarter' without a fact scan, now with the same
    crash-safe append/compact lifecycle as every other standing
    artifact."""
    from ..operators.scale import read_hll_registers

    return read_hll_registers(
        spark, _hll_users_artifact_path(spark, sf_dir), p=6
    )


@register(
    "rollup_hll_distinct_estimate",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events
    """,
    tags=("temporal", "rollup", "sketch", "hll", "approx"),
    since=14,
)
def rollup_hll_distinct_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The consumer half of the deterministic-HLL lifecycle: estimate
    corpus-wide distinct users from the PERSISTED register artifact
    alone (standard HLL: E = alpha_m * m^2 / sum(2^-rho) with
    missing registers contributing 2^0, plus the small-range
    linear-counting correction E = m*ln(m/V) when E <= 2.5m and
    empty registers remain) and gate it against the exact count. At
    m = 64 the expected relative error is 1.04/sqrt(64) ~= 13%; the
    md5 register derivation is deterministic, so the estimate is a
    FIXED value per dataset (measured 13.9% / 1.0% / 16.0% across
    the three SFs) and the 25%-bound predicate can never flake. The
    fact-table side of the audit is the exact count the oracle
    hashes — at 100 TB the register table (<= 2^p rows) answers this
    without any fact scan, which is the entire point of carrying the
    sketch in the rollup."""
    from ..operators.scale import read_hll_registers

    m = 64
    regs = read_hll_registers(
        spark, _hll_users_artifact_path(spark, sf_dir), p=6
    )
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("hs_nz"),
    ).select(
        "n_regs",
        "hs_nz",
        (F.lit(m) - F.col("n_regs")).cast("double").alias("v_zero"),
    )
    est_raw = F.lit(0.709 * m * m) / (F.col("hs_nz") + F.col("v_zero"))
    est = F.when(
        (est_raw <= 2.5 * m) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
    ).otherwise(est_raw)
    exact = _events(spark, sf_dir).agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        exact.crossJoin(F.broadcast(agg.select(est.alias("__est__"))))
        .select(
            "n_exact",
            (
                F.abs(F.col("__est__") - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                < 0.25
            ).alias("within_bound"),
        )
    )


@register(
    "rollup_quantile_histogram",
    oracle="""
    WITH h AS (
      SELECT date_trunc('month', ts) AS bucket, event_type,
             least(greatest(CAST(round(value * 100) AS BIGINT), 0),
                   63999) // 1000 AS hbucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events
      GROUP BY 1, 2, 3),
    c AS (
      SELECT bucket, event_type, hbucket, cnt,
             SUM(cnt) OVER (PARTITION BY bucket, event_type
                            ORDER BY hbucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY bucket, event_type) AS n
      FROM h)
    SELECT CAST(bucket AS TIMESTAMP) AS bucket, event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum * 100 >= n * 50
                    THEN (hbucket + 1) * 1000 END) AS BIGINT)
             AS p50_ub_cents,
           CAST(MIN(CASE WHEN cum * 100 >= n * 95
                    THEN (hbucket + 1) * 1000 END) AS BIGINT)
             AS p95_ub_cents,
           CAST(MIN(CASE WHEN cum * 100 >= n * 99
                    THEN (hbucket + 1) * 1000 END) AS BIGINT)
             AS p99_ub_cents
    FROM c GROUP BY bucket, event_type
    """,
    tags=("temporal", "rollup", "histogram", "quantile"),
    since=3,
)
def rollup_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles over rollups — the third continuous-
    aggregate summary kind (additive count/sum, HLL distinct, and now
    fixed-bucket value histograms): daily 64x10.00-unit histograms
    merge additively to month, and P50/P95/P99 upper bounds read off
    the merged buckets with pure integer math (cum*100 >= n*q — no
    float near the cut, bucket-resolution guarantee). Facts are
    scanned once at the fine grain; every coarser quantile query
    touches only summary rows. Merge == rebuild is inherent (integer
    bucket counts add exactly); the oracle builds monthly directly
    while the plan merges daily summaries — equality IS the proof."""
    from ..operators.rollup import (
        build_value_histogram,
        histogram_quantiles,
        merge_histogram,
    )
    from ..session import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = build_value_histogram(ev, grain="day")
    monthly = merge_histogram(daily, "month")
    out = histogram_quantiles(monthly)
    return out.withColumn("bucket", F.col("bucket").cast("timestamp_ntz"))


@register(
    "window_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS es,
             300 * (1 + user_id % 3) AS gap_s
      FROM events),
    flagged AS (
      SELECT user_id, es, gap_s,
             CASE WHEN es - lag(es) OVER (PARTITION BY user_id
                                          ORDER BY es, event_id)
                       > gap_s
                  OR lag(es) OVER (PARTITION BY user_id
                                   ORDER BY es, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM g),
    sessioned AS (
      SELECT user_id, es,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY es
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(es) - MIN(es) AS BIGINT) AS duration_s
    FROM sessioned GROUP BY user_id, session_seq
    """,
    tags=("temporal", "session", "dynamic-gap", "window"),
    since=4,
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a PER-USER inactivity gap (300/600/900 s by
    user tier — Spark's session_window supports a dynamic gap
    expression; this is its batch twin, and the lag+cumsum
    formulation is how the same semantics run over historical data):
    one user-keyed shuffle reused by both window passes, exact
    integer epoch-second math, sessions summarized as (n_events,
    duration_s). The fixed-gap variant is sql_text_window_sessions;
    the dynamic gap is what real products need (engagement tiers,
    device classes)."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        (F.lit(300) * (F.lit(1) + F.col("user_id") % 3)).alias("gap_s"),
    )
    wo = Window.partitionBy("user_id").orderBy("es", "event_id")
    prev = F.lag("es").over(wo)
    flagged = ev.select(
        "user_id",
        "es",
        (prev.isNull() | ((F.col("es") - prev) > F.col("gap_s")))
        .cast("int")
        .alias("is_start"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessioned = flagged.select(
        "user_id",
        "es",
        F.sum("is_start").over(wc).cast("long").alias("session_seq"),
    )
    return sessioned.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("es") - F.min("es")).cast("long").alias("duration_s"),
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
      SELECT event_id, ts, user_id, event_type,
             last_value(CASE WHEN event_type = 'view' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS b_id,
             last_value(CASE WHEN event_type = 'view' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS b_ts,
             first_value(CASE WHEN event_type = 'view' THEN event_id END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS f_id,
             first_value(CASE WHEN event_type = 'view' THEN ts END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS f_ts
      FROM events
      WHERE event_type IN ('view', 'click')
    ),
    gapped AS (
      SELECT event_id, ts, user_id, b_id, f_id,
             CAST(floor(date_part('epoch', ts))
                  - floor(date_part('epoch', b_ts)) AS BIGINT) AS gb,
             CAST(floor(date_part('epoch', f_ts))
                  - floor(date_part('epoch', ts)) AS BIGINT) AS gf
      FROM tagged WHERE event_type = 'click'),
    chosen AS (
      SELECT event_id, ts, user_id,
             CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf)
                  THEN b_id ELSE f_id END AS raw_view_id,
             CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf)
                  THEN 'backward' ELSE 'forward' END AS raw_direction,
             CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf)
                  THEN gb ELSE gf END AS raw_gap
      FROM gapped)
    SELECT event_id AS click_id, ts AS click_ts, user_id,
           CASE WHEN raw_gap <= 300 THEN raw_view_id END AS view_id,
           CASE WHEN raw_gap <= 300 THEN raw_direction END AS direction,
           CASE WHEN raw_gap <= 300 THEN raw_gap END AS gap_s
    FROM chosen
    """,
    tags=("temporal", "asof", "nearest", "window"),
    since=4,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction='nearest' (pandas merge_asof's third
    direction): each click matches the CLOSEST view in time — before
    or after — within a 300 s tolerance, ties broken backward. Both
    direction candidates come from the SAME user-keyed sort: a
    running last_value(ignorenulls) frame looking back and a
    first_value frame looking forward share one Window sort, so the
    plan still pays exactly ONE shuffle of the stream (pin: the
    rows-frame pair collapses into a single Window operator). The
    sensor-fusion / quote-matching join where the nearest reading
    wins regardless of side."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click")
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(wb)
        .alias("b_id"),
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(wb)
        .alias("b_ts"),
        F.first(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(wf)
        .alias("f_id"),
        F.first(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(wf)
        .alias("f_ts"),
    )
    gb = (
        F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp("b_ts"))
    ).cast("bigint")
    gf = (
        F.floor(F.unix_timestamp("f_ts")) - F.floor(F.unix_timestamp("ts"))
    ).cast("bigint")
    clicks = tagged.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "b_id", "f_id",
        gb.alias("gb"), gf.alias("gf"),
    )
    take_back = F.col("gb").isNotNull() & (
        F.col("gf").isNull() | (F.col("gb") <= F.col("gf"))
    )
    raw_id = F.when(take_back, F.col("b_id")).otherwise(F.col("f_id"))
    raw_dir = F.when(take_back, F.lit("backward")).otherwise(
        F.lit("forward")
    )
    raw_gap = F.when(take_back, F.col("gb")).otherwise(F.col("gf"))
    in_tol = raw_gap <= 300
    out = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
        F.when(in_tol, raw_id).alias("view_id"),
        F.when(in_tol, raw_dir).alias("direction"),
        F.when(in_tol, raw_gap).alias("gap_s"),
    )
    return U.ntz(out, "click_ts")


@register(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    grp AS (
      SELECT user_id, d,
             CAST(d - CAST(row_number() OVER (PARTITION BY user_id
                                              ORDER BY d) AS INT)
                  AS DATE) AS anchor
      FROM days),
    streaks AS (
      SELECT user_id, anchor,
             CAST(COUNT(*) AS BIGINT) AS len,
             MIN(d) AS start_day
      FROM grp GROUP BY user_id, anchor)
    SELECT user_id,
           MAX(len) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           MIN(start_day) AS first_active_day
    FROM streaks GROUP BY user_id
    """,
    tags=("temporal", "streaks", "gaps-islands", "analytics"),
    since=4,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    GAPS-AND-ISLANDS shape: consecutive dates collapse to one island
    because date minus row_number is constant within a run. ONE
    user-keyed shuffle (distinct + window + both aggregates all share
    the user partitioning); island anchors are exact date arithmetic,
    so engine-portable with no session-timezone hazard (dates derive
    from the same naive timestamps in both engines)."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("start_day"),
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min("start_day").alias("first_active_day"),
    )


@register(
    "events_rfm_segments",
    oracle="""
    WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
    base AS (
      SELECT user_id,
             CAST(date_diff('day', MAX(CAST(ts AS DATE)),
                            (SELECT h FROM horizon)) AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS monetary
      FROM events GROUP BY user_id),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary,
             ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
             ntile(5) OVER (ORDER BY frequency, user_id) AS f_score,
             ntile(5) OVER (ORDER BY monetary, user_id) AS m_score
      FROM base)
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
    FROM scored
    """,
    tags=("temporal", "rfm", "segmentation", "analytics"),
    since=4,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the standard behavioral-segmentation table: per-user days since
    last event (against the corpus horizon), event count, and exact
    int64-cents value sum, each scored into quintiles. ntile is made
    deterministic by the user_id tie-break (a bare ntile over a
    measure with ties is partition-order-dependent — untestable
    cross-engine). One user-keyed aggregate; the quintile windows run
    over the user-count-sized summary. Higher score = better on every
    axis (recent, frequent, high-value), so rfm=555 is the best
    segment."""
    ev = _events(spark, sf_dir)
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("h"))
    base = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("__last__"),
        F.count(F.lit(1)).alias("frequency"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / 100.0
        ).alias("monetary"),
    )
    base = base.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.datediff(F.col("h"), F.col("__last__"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    wr = Window.orderBy(F.desc("recency_days"), F.asc("user_id"))
    wf = Window.orderBy(F.asc("frequency"), F.asc("user_id"))
    wm = Window.orderBy(F.asc("monetary"), F.asc("user_id"))
    scored = base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(wr).alias("r_score"),
        F.ntile(5).over(wf).alias("f_score"),
        F.ntile(5).over(wm).alias("m_score"),
    )
    return scored.select(
        "*",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        )
        .cast("long")
        .alias("rfm"),
    )


@register(
    "rollup_sketch_user_overlap",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM du a JOIN du b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    tags=("temporal", "rollup", "sketch", "approx", "setop"),
    since=4,
)
def rollup_sketch_user_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch SET OPERATIONS over the rollup table: 'how many users
    did BOTH type A and type B' answered from the per-type HLL
    sketches alone via inclusion-exclusion
    (|A∩B| = est(A) + est(B) - est(A ∪ B), the union being
    ``hll_union`` of the two stored sketches) — no fact-table
    re-scan, which is the whole point of keeping sketches in the
    summary row at 100 TB. Inclusion-exclusion error compounds
    (three estimates), so the checkable output is the 5%-bound
    predicate per pair against the exact pairwise overlap, which the
    oracle asserts; the pair table is |types|² rows, so the
    cross-pairing and the audit joins are summary-sized. The exact
    side (the audit) self-joins DISTINCT (type, user) rows — at
    production scale you run it on a user sample or drop it and keep
    only the sketch math."""
    ev = _events(spark, sf_dir)
    # |types|-sized sketch table read by BOTH pairing sides;
    # the (type, user) distinct below is read by both audit sides —
    # checkpoint each so the corpus pays one scan per table, not one
    # per join side
    per_type = (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.countDistinct("user_id").cast("bigint").alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n").alias("n_a"),
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("type_a") < F.col("type_b")
    ).select(
        "type_a",
        "type_b",
        (
            F.hll_sketch_estimate("sk_a")
            + F.hll_sketch_estimate("sk_b")
            - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
        ).alias("est_overlap"),
    )
    du = (
        ev.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    exact = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    return exact.join(pairs, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_exact",
        (
            F.abs(F.col("est_overlap") - F.col("n_exact"))
            / F.greatest(F.col("n_exact"), F.lit(1)).cast("double")
            < 0.05
        ).alias("within_bound"),
    )


@register(
    "rollup_bitmap_merge_day",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
    tags=("temporal", "rollup", "bitmap", "distinct", "mergeable"),
    since=4,
)
def rollup_bitmap_merge_day(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT distinct-user rollup maintained incrementally: daily
    per-(type, bucket) bitmaps OR-merge to the full-range bitmap,
    and the total is the sum of per-bucket popcounts — the exact
    counterpart of the HLL/CMS/quantile merge-day proofs
    (`rollup_merge_day` family), closing the mergeable-summary set:
    additive, HLL, CMS, quantile histogram, and now exact bitmap.
    The oracle is plain COUNT(DISTINCT) over the whole range, so the
    green row proves merge == rebuild with zero estimation error.

    Scale shape: the daily pass map-side-combines user ids into
    32k-bit bucket bitmaps (shuffle rows = days x types x occupied
    buckets, never one row per event or per user); the merge pass
    ORs bitmaps of the SAME (type, bucket) across days — summary-
    sized, the nightly-refresh cost at 100 TB. bitmap_or_agg may
    only merge same-bucket bitmaps: bit positions repeat across
    buckets (the agg_bitmap_distinct lesson, encoded here in the
    grouping keys)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("__b__"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "__bm__"
        )
    )
    merged = daily.groupBy("event_type", "__b__").agg(
        F.expr("bitmap_or_agg(__bm__)").alias("__m__")
    )
    return merged.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(__m__)")).cast("long").alias("n_distinct")
    )


@register(
    "rollup_forecast_holt",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1),
    ord AS (SELECT y, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily),
    holt(t, l, b) AS (
      -- anchor types fix the recursion's column types: a bare 0.0
      -- would type b as DECIMAL(2,1) and quantize the trend to 0.1
      SELECT t, y, CAST(0.0 AS DOUBLE) FROM ord WHERE t = 1
      UNION ALL
      SELECT o.t,
             0.5 * o.y + 0.5 * (h.l + h.b),
             0.3 * ((0.5 * o.y + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
      FROM holt h JOIN ord o ON o.t = h.t + 1),
    fin AS (SELECT l, b FROM holt ORDER BY t DESC LIMIT 1)
    SELECT CAST(g.h AS BIGINT) AS horizon,
           round(fin.l + g.h * fin.b, 6) AS forecast
    FROM fin CROSS JOIN
         (SELECT unnest(generate_series(1, 7)) AS h) g
    """,
    tags=("temporal", "rollup", "forecast", "iterative"),
    since=4,
)
def rollup_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast off the daily rollup — the
    'forecast next week's volume' read a summary table serves
    without touching the fact table. The smoothing recursion
    (alpha=0.5 level, beta=0.3 trend, l1=y1/b1=0 init) is inherently
    sequential, but over DAYS, not rows: the fold length is bounded
    by the calendar (365 elements/year), so it runs as a sequential
    aggregate over the day-ordered array of daily counts — one
    distributed aggregate to build the 30-row series, then O(days)
    scalar work. The oracle replays the identical recursion with a
    recursive CTE, value-for-value (literals written identically —
    0.7, not 1-0.3 — so both engines execute the same IEEE ops in
    the same order). Output: 7 forecast horizons."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    arr = F.array_sort(F.collect_list(F.struct("day", "y")))
    init = F.struct(
        F.lit(float("nan")).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(True).alias("first"),
    )

    def step(acc, p):
        lnew = F.lit(0.5) * p["y"] + F.lit(0.5) * (acc["l"] + acc["b"])
        bnew = (
            F.lit(0.3) * (lnew - acc["l"]) + F.lit(0.7) * acc["b"]
        )
        return F.when(
            acc["first"],
            F.struct(
                p["y"].alias("l"),
                F.lit(0.0).alias("b"),
                F.lit(False).alias("first"),
            ),
        ).otherwise(
            F.struct(
                lnew.alias("l"), bnew.alias("b"), F.lit(False).alias("first")
            )
        )

    fin = daily.agg(F.aggregate(arr, init, step).alias("hb"))
    return fin.select(
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"), "hb"
    ).select(
        F.col("h").cast("long").alias("horizon"),
        F.round(
            F.col("hb.l") + F.col("h") * F.col("hb.b"), 6
        ).alias("forecast"),
    )


@register(
    "events_dau_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events),
    dau AS (
      SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM du GROUP BY day),
    cover AS (
      SELECT CAST(g.d AS DATE) AS day, du.user_id
      FROM du,
           LATERAL (SELECT unnest(generate_series(du.day,
                        du.day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS d) g),
    wau AS (
      SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM cover GROUP BY day)
    SELECT d.day, d.dau, w.wau
    FROM dau d JOIN wau w USING (day)
    """,
    tags=("temporal", "analytics", "distinct", "window"),
    since=4,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day distinct active users (DAU/WAU) —
    the standard engagement panel, computed EXACTLY with the
    bounded fan-out trick: each (day, user) activity row covers the
    7 report days it contributes to (an explode of 7, bounded by
    the WINDOW length, never by data), then one distinct-count per
    report day. This replaces the naive per-day range self-join
    (whose candidate volume is days x activity) and stays exact
    where sliding-window sketches would approximate; for 30/90-day
    windows at 100 TB you either accept the x30/x90 fan-out on the
    already-deduplicated (day, user) table — tiny relative to raw
    events — or switch to the HLL rollup
    (`rollup_sketch_distinct_users`). Report days with no 7-day
    history are still reported (partial windows, standard panel
    semantics); days beyond the data's end are clipped by the join
    with the DAU side."""
    ev = _events(spark, sf_dir)
    # the deduplicated (day, user) table is the working set both the
    # DAU and the fan-out/WAU branches read — checkpoint it so the
    # corpus scan + distinct run once, not once per branch
    du = (
        ev.select(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    dau = du.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    cover = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), 6),
            )
        ).alias("day"),
        "user_id",
    )
    wau = cover.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return dau.join(wau, "day")


@register(
    "anomaly_daily_seasonal",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1),
    wd AS (
      SELECT day, y, CAST(dayofweek(day) AS BIGINT) AS dow FROM daily),
    base AS (
      SELECT dow,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM wd GROUP BY dow),
    resid AS (
      SELECT w.day, w.y, w.dow,
             CAST(w.y AS DOUBLE)
               - CAST(b.sy AS DOUBLE) / CAST(b.c AS DOUBLE) AS r
      FROM wd w JOIN base b ON b.dow = w.dow),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             list_sum(list(r ORDER BY day)) AS sr,
             list_sum(list(r * r ORDER BY day)) AS srr
      FROM resid)
    SELECT r.day, r.y, round(r.r, 6) AS residual
    FROM resid r CROSS JOIN stats s
    WHERE r.r * r.r
          > 4.0 * ((s.srr - s.sr * s.sr / s.n) / s.n)
    """,
    tags=("temporal", "anomaly", "seasonal"),
    since=4,
)
def anomaly_daily_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted volume anomalies: daily counts compared
    to their WEEKDAY baseline (Monday vs Mondays), flagging days
    whose residual exceeds 2 residual-sigmas — the detector that
    doesn't page on every weekend dip, completing the anomaly family
    next to the global z-score and the robust MAD. Decision is
    squared-residual vs 4*variance — no sqrt at the boundary; the
    residual moment sums fold in DAY order on both engines
    (array_sort fold / list_sum ORDER BY day) — the calendar-bounded
    series makes the fold cheap, and the ordering removes the one
    ulp-drift hazard that could flip a boundary day. Everything after the daily rollup
    is calendar-sized."""
    ev = _events(spark, sf_dir)
    # calendar-sized after the one corpus aggregate; THREE consumers
    # (weekday base, residuals, the final filter's second read) would
    # each re-inline the events scan without this checkpoint — the
    # plan audit read 8 parquet scans for a query whose data volume
    # is |days| rows after stage one
    daily = (
        ev.groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .localCheckpoint(eager=True)
    )
    wd = daily.select(
        "day", "y", F.dayofweek("day").cast("long").alias("dow")
    )
    base = wd.groupBy("dow").agg(
        F.sum("y").cast("long").alias("sy"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    resid = wd.join(F.broadcast(base), "dow").select(
        "day",
        "y",
        (
            F.col("y").cast("double")
            - F.col("sy").cast("double") / F.col("c").cast("double")
        ).alias("r"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("day", "r")))
    stats = resid.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x["r"]).alias(
            "sr"
        ),
        F.aggregate(
            ordered, F.lit(0.0), lambda a, x: a + x["r"] * x["r"]
        ).alias("srr"),
    )
    return (
        resid.crossJoin(F.broadcast(stats))
        .filter(
            F.col("r") * F.col("r")
            > F.lit(4.0)
            * (
                (F.col("srr") - F.col("sr") * F.col("sr") / F.col("n"))
                / F.col("n")
            )
        )
        .select("day", "y", F.round("r", 6).alias("residual"))
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH tagged AS (
      SELECT event_id, ts, user_id, event_type,
             first_value(CASE WHEN event_type = 'view' THEN event_id END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS view_id,
             first_value(CASE WHEN event_type = 'view' THEN ts END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS view_ts
      FROM events
      WHERE event_type IN ('view', 'click')
    )
    SELECT event_id AS click_id, ts AS click_ts, user_id,
           view_id, view_ts,
           CAST(floor(date_part('epoch', view_ts))
                - floor(date_part('epoch', ts)) AS BIGINT) AS gap_s
    FROM tagged WHERE event_type = 'click'
    """,
    tags=("temporal", "asof", "window"),
    since=4,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction (pandas merge_asof
    direction='forward'): each click matched to the same user's
    FIRST view at-or-after it — the "what did they do next"
    attribution read, completing the direction set next to backward
    (join_asof_last_view), nearest, and tolerance. Same single
    user-keyed shuffle; the forward lookup is a first_value over the
    FOLLOWING frame of the identical window sort, so adding the
    direction costs no extra exchange. Clicks with no later view
    keep NULL."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.first(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("view_id"),
        F.first(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("view_ts"),
    )
    gap = (
        F.floor(F.unix_timestamp("view_ts"))
        - F.floor(F.unix_timestamp("ts"))
    ).cast("bigint")
    out = tagged.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
        "view_id",
        "view_ts",
        gap.alias("gap_s"),
    )
    return U.ntz(out, "click_ts", "view_ts")


@register(
    "events_pareto_share",
    oracle="""
    WITH ue AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id),
    rk AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS r
      FROM ue),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n) AS BIGINT) AS total_events,
             CAST(SUM(CASE WHEN r * 10 <= (SELECT COUNT(*) FROM ue)
                      THEN n ELSE 0 END) AS BIGINT) AS top_events,
             CAST(SUM(CASE WHEN r * 10 <= (SELECT COUNT(*) FROM ue)
                      THEN 1 ELSE 0 END) AS BIGINT) AS top_users
      FROM rk)
    SELECT n_users, top_users, total_events, top_events,
           round(CAST(top_events AS DOUBLE)
                 / CAST(total_events AS DOUBLE), 6) AS top_decile_share
    FROM s
    """,
    tags=("temporal", "analytics", "stats"),
    since=4,
)
def events_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of user activity: what share of all
    events do the top-decile users generate (the 80/20 check that
    decides whether per-user skew handling — salting, hot-key
    isolation — is worth wiring in). The decile boundary is pure
    integer arithmetic (rank * 10 <= user count, rank desc with
    user_id tie-break), counts are exact, and the single division
    rounds at 6. One user-keyed aggregate + a user-sized rank."""
    ev = _events(spark, sf_dir)
    from pyspark.sql.window import Window as W

    ue = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rk = ue.select(
        "n",
        F.row_number()
        .over(W.orderBy(F.desc("n"), F.asc("user_id")))
        .alias("r"),
    )
    n_users_count = ue.count()
    top = F.col("r") * 10 <= F.lit(n_users_count)
    s = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(top, 1).otherwise(0)).cast("long").alias("top_users"),
        F.sum("n").cast("long").alias("total_events"),
        F.sum(F.when(top, F.col("n")).otherwise(0))
        .cast("long")
        .alias("top_events"),
    )
    return s.select(
        "n_users",
        "top_users",
        "total_events",
        "top_events",
        F.round(
            F.col("top_events").cast("double")
            / F.col("total_events").cast("double"),
            6,
        ).alias("top_decile_share"),
    )


@register(
    "events_first_touch_attribution",
    oracle="""
    WITH ft AS (
      SELECT user_id, event_type AS channel FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) t WHERE rn = 1),
    purch AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT f.channel,
           CAST(SUM(p.n_purchases) AS BIGINT) AS n_purchases,
           CAST(SUM(p.revenue_cents) AS BIGINT) AS revenue_cents
    FROM purch p JOIN ft f ON f.user_id = p.user_id
    GROUP BY f.channel
    """,
    tags=("temporal", "analytics", "attribution", "window"),
    since=4,
)
def events_first_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution: every user's purchase revenue
    credits the channel (event type) of their FIRST-ever event —
    the marketing-analytics read that pairs with the funnel and
    cohort queries. Money in exact int64 cents; the first touch is
    a deterministic row_number over the (ts, event_id) total order.
    One user-keyed window + one user-keyed purchase aggregate,
    joined user-sized, output channel-sized."""
    ev = _events(spark, sf_dir)
    from pyspark.sql.window import Window as W

    ft = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number()
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("channel"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
    return (
        purch.join(ft, "user_id")
        .groupBy("channel")
        .agg(
            F.sum("n_purchases").cast("long").alias("n_purchases"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


@register(
    "events_user_type_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY user_id, event_type),
    t AS (
      SELECT user_id, CAST(SUM(k) AS BIGINT) AS n FROM c GROUP BY user_id)
    SELECT c.user_id,
           CAST(MIN(t.n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           round(-list_sum(list(
                   (CAST(k AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * ln(CAST(k AS DOUBLE) / CAST(t.n AS DOUBLE))
                 ORDER BY c.event_type)) + 0.0, 6) AS entropy_nats
    FROM c JOIN t ON t.user_id = c.user_id
    GROUP BY c.user_id
    """,
    tags=("temporal", "analytics", "entropy"),
    since=4,
)
def events_user_type_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy (nats) of each
    user's event-type distribution — near zero flags single-action
    bots/scrapers, high values are organically mixed usage; the
    per-user cousin of the corpus-level token entropy gate. The
    per-user fold runs over at most |event_types| terms in TYPE
    order on both engines (the token-entropy discipline), counts are
    exact, and `+ 0.0` normalizes the single-type -0.0 to 0.0 the
    same way text_token_entropy does. One (user, type) aggregate;
    the entropy reduce reuses its partitioning."""
    ev = _events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    w = Window.partitionBy("user_id")
    rows = c.withColumn("n", F.sum("k").over(w))
    p = F.col("k").cast("double") / F.col("n").cast("double")
    terms = rows.select(
        "user_id",
        "event_type",
        "n",
        (p * F.log(p)).alias("term"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("event_type", "term")))
    return (
        terms.groupBy("user_id")
        .agg(
            F.min("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.round(
                -F.aggregate(
                    ordered, F.lit(0.0), lambda a, x: a + x["term"]
                )
                + F.lit(0.0),
                6,
            ).alias("entropy_nats"),
        )
    )


@register(
    "events_interarrival_burstiness",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(floor(date_part('epoch', ts))
                  - floor(date_part('epoch',
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)))
                  AS BIGINT) AS gap
      FROM events),
    gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS sg,
             CAST(SUM(gap * gap) AS BIGINT) AS sgg
      FROM gg GROUP BY user_id)
    SELECT user_id, n AS n_gaps,
           round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_s,
           round((sqrt((CAST(sgg AS DOUBLE)
                        - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                          / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                  - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
                 / (sqrt((CAST(sgg AS DOUBLE)
                          - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                            / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                    + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)),
                 6) AS burstiness
    FROM s WHERE n >= 2
    """,
    tags=("temporal", "analytics", "stats"),
    since=4,
)
def events_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-arrival burstiness per user (Goh & Barabasi's
    B = (sigma - mu)/(sigma + mu) over the gap distribution):
    B -> -1 is metronome-regular automation, B ~ 0 Poisson-like
    organic activity, B -> 1 extreme bursts — the timing-based bot
    signal complementing the type-entropy one. Gaps are exact
    integer seconds off ONE user-keyed window sort; mean/sigma come
    from exact integer sufficient statistics (sum, sum-of-squares)
    so no accumulation-order hazard exists, and the closing
    expression is written token-identically in both engines."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.floor(F.unix_timestamp("ts"))
            - F.floor(F.unix_timestamp(F.lag("ts").over(w)))
        )
        .cast("long")
        .alias("gap"),
    ).filter(F.col("gap").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap").cast("long").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("sgg"),
    )
    nd = F.col("n").cast("double")
    sgd = F.col("sg").cast("double")
    sggd = F.col("sgg").cast("double")
    mu = sgd / nd
    sigma = F.sqrt((sggd - sgd * sgd / nd) / nd)
    return s.filter(F.col("n") >= 2).select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.round(mu, 6).alias("mean_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-shape event pattern matching (r7)
# ---------------------------------------------------------------------------

_SYM_SQL = """CASE event_type WHEN 'signup' THEN 's'
                    WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' ELSE 'e' END"""
_PATTERN = "s[vc]*p"


@register(
    "events_pattern_match",
    oracle=f"""
    WITH sym AS (
      SELECT user_id, {_SYM_SQL} AS sy, ts, event_id FROM events),
    seq AS (
      SELECT user_id,
             string_agg(sy, '' ORDER BY ts, event_id) AS s
      FROM sym GROUP BY user_id)
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(s, '{_PATTERN}')) AS BIGINT)
             AS n_matches,
           regexp_extract(s, '{_PATTERN}') AS first_match
    FROM seq
    """,
    tags=("events", "pattern", "match_recognize", "temporal"),
    since=7,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-shape row-pattern matching — the Flink SQL
    1.12 surface feature (`MATCH_RECOGNIZE PATTERN (S V* P)`) Spark
    SQL lacks natively, emulated exactly: each user's event history
    becomes an ordered symbol string (one char per event, ordered by
    (ts, event_id) so ties are deterministic), and the pattern
    signup -> (view|click)* -> purchase compiles to the regex
    's[vc]*p' evaluated per user — n_matches is the non-overlapping
    left-to-right match count (MATCH_RECOGNIZE AFTER MATCH SKIP PAST
    LAST ROW semantics), first_match the first matched symbol run.

    Scale shape: ONE user-keyed shuffle builds the per-user sequence
    (array_sort of (ts, event_id, sym) structs — no window, no
    second exchange), then the regex is a codegen'd per-row scalar
    over strings whose length is the user's event count. At 100 TB
    this is the same cost class as sessionization: the sequence
    build IS the shuffle, pattern evaluation is free. Greedy-regex
    semantics are engine-identical here because the quantified class
    [vc] excludes both anchors."""
    from ..operators.sequence import match_recognize

    ev = load_table(spark, sf_dir, "events")
    return match_recognize(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        symbol=F.expr(_SYM_SQL),
        pattern=_PATTERN,
    )


@register(
    "anomaly_changepoint_cusum",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    pre AS (
      SELECT event_type, day, ts, event_id, cents,
             CAST(COUNT(*) OVER (PARTITION BY event_type, day)
                  AS BIGINT) AS n,
             CAST(SUM(cents) OVER (PARTITION BY event_type, day)
                  AS BIGINT) AS s_all,
             CAST(SUM(cents) OVER (PARTITION BY event_type, day
                    ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
             CAST(row_number() OVER (PARTITION BY event_type, day
                    ORDER BY ts, event_id) AS BIGINT) AS i
      FROM s),
    c AS (SELECT *, abs(n * p - i * s_all) AS abs_c FROM pre),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type, day
               ORDER BY abs_c DESC, ts, event_id) AS rnk
      FROM c)
    SELECT event_type, day, n AS n_events, ts AS cp_ts,
           CAST(abs_c AS BIGINT) AS max_abs_cusum,
           round(CAST(i AS DOUBLE) / n, 6) AS split_frac,
           round(p / (100.0 * i), 6) AS mean_before,
           CASE WHEN n > i
                THEN round((s_all - p) / (100.0 * (n - i)), 6)
           END AS mean_after
    FROM r WHERE rnk = 1
    """,
    tags=("temporal", "anomaly", "changepoint", "cusum"),
    since=7,
)
def anomaly_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per (event_type, day) series —
    the third member of the anomaly family (z-score: global outlier;
    MAD: robust outlier; THIS: level SHIFT — where in the day a
    metric's mean moved, the page a rollout/incident review reads).
    The statistic is the scaled CUSUM C_i = n*P_i - i*S (P_i = cents
    prefix sum, S = series total): identical argmax to the textbook
    sum of (x_j - mean) but computed entirely in exact int64 cents —
    no float accumulation anywhere near the argmax decision, so the
    reported changepoint is value-exact across engines (the two
    reported means are single exact-int divisions rounded once).
    Overflow bound: |C_i| <= n * |S|, safe in int64 while
    rows x total-cents < 9e18 per series — series are day-bounded by
    construction, which is also the scale story: all four windows
    share ONE partitioning key (event_type, day), so the whole
    detector is a single bounded-key shuffle followed by map work,
    at any corpus size. Ties (equal |C_i|) break to the earliest
    (ts, event_id) on both engines."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w0 = Window.partitionBy("event_type", "day")
    word = w0.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = base.select(
        "event_type",
        "day",
        "ts",
        F.count(F.lit(1)).over(w0).cast("long").alias("n"),
        F.sum("cents").over(w0).cast("long").alias("s_all"),
        F.sum("cents").over(word).cast("long").alias("p"),
        F.row_number()
        .over(w0.orderBy("ts", "event_id"))
        .cast("long")
        .alias("i"),
        "event_id",
    )
    c = pre.withColumn(
        "abs_c",
        F.abs(F.col("n") * F.col("p") - F.col("i") * F.col("s_all")),
    )
    r = c.withColumn(
        "rnk",
        F.row_number().over(
            w0.orderBy(F.desc("abs_c"), F.asc("ts"), F.asc("event_id"))
        ),
    )
    return r.filter(F.col("rnk") == 1).select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        F.col("ts").alias("cp_ts"),
        F.col("abs_c").cast("long").alias("max_abs_cusum"),
        F.round(F.col("i").cast("double") / F.col("n"), 6).alias(
            "split_frac"
        ),
        F.round(F.col("p") / (F.lit(100.0) * F.col("i")), 6).alias(
            "mean_before"
        ),
        F.when(
            F.col("n") > F.col("i"),
            F.round(
                (F.col("s_all") - F.col("p"))
                / (F.lit(100.0) * (F.col("n") - F.col("i"))),
                6,
            ),
        ).alias("mean_after"),
    )


# ---------------------------------------------------------------------------
# Round-8: SCD2 dimension build from the event stream
# ---------------------------------------------------------------------------


@register(
    "pipeline_scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type),
    versioned AS (
      SELECT user_id, event_type AS attr, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
                  AS BIGINT) AS version
      FROM changes)
    SELECT user_id, attr, valid_from, valid_to, version,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
    FROM versioned
    """,
    tags=("temporal", "scd2", "dimension", "changelog"),
    since=8,
)
def pipeline_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension type 2 build: fold each user's event
    stream into versioned validity intervals of their tracked
    attribute (event_type) — consecutive events with an unchanged
    attribute collapse into one interval; a change closes the open
    interval at the new row's timestamp and opens the next version.
    This is the dimension-table construct every warehouse keeps for
    point-in-time joins (the as-of join's natural build-side input —
    `join_asof_last_view` probes exactly this shape).

    Spark-first: change detection is one lag() over the (ts,
    event_id) total order, interval close is one lead() over the
    change rows, version is a row_number — three windows sharing ONE
    user_id partitioning, so the whole build costs a single keyed
    shuffle at any corpus size. Returns (user_id, attr, valid_from,
    valid_to, version, is_current) with valid_to NULL on the open
    version."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return chg.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    ).withColumn(
        "is_current",
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("long"),
    )


@register(
    "anomaly_distribution_drift",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN event_type = 'error'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN event_type = 'signup'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(SUM(CASE WHEN event_type = 'view'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c4,
             CAST(COUNT(*) AS BIGINT) AS total
      FROM events GROUP BY 1),
    l AS (
      SELECT day, c0, c1, c2, c3, c4, total,
             lag(c0) OVER (ORDER BY day) AS p0,
             lag(c1) OVER (ORDER BY day) AS p1,
             lag(c2) OVER (ORDER BY day) AS p2,
             lag(c3) OVER (ORDER BY day) AS p3,
             lag(c4) OVER (ORDER BY day) AS p4,
             lag(total) OVER (ORDER BY day) AS pt
      FROM d),
    tv AS (
      SELECT day, total, pt AS prev_total,
             round(CAST(abs(c0 * pt - p0 * total)
                        + abs(c1 * pt - p1 * total)
                        + abs(c2 * pt - p2 * total)
                        + abs(c3 * pt - p3 * total)
                        + abs(c4 * pt - p4 * total) AS DOUBLE)
                   / CAST(2 * total * pt AS DOUBLE), 6) AS tv_distance
      FROM l WHERE pt IS NOT NULL)
    SELECT day, total, prev_total, tv_distance,
           CAST(CASE WHEN tv_distance > 0.05 THEN 1 ELSE 0 END
                AS BIGINT) AS drift_flag
    FROM tv
    """,
    tags=("temporal", "anomaly", "drift", "monitoring"),
    since=8,
)
def anomaly_distribution_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Day-over-day distribution-shift monitor: total-variation
    distance between consecutive days' event-type mixes, with a
    drift flag at TV > 0.05 — the data-quality tripwire a pipeline
    puts in front of retraining (an upstream logging change shows up
    as a mix shift long before any metric moves). TV is chosen over
    KL/JS deliberately: with integer counts it is an EXACT rational
    (sum of |c_i*T_prev - p_i*T_cur| over one cross-multiplied
    denominator — no libm, no epsilon for empty cells; int64-safe to
    ~1e9 events/day, decimal(38) escape hatch past that).

    One shuffle (the day/type count); the pivot is a fixed-type-list
    conditional aggregate (no discovery pass), and the lag window
    orders the days-sized frame, never events."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        *[
            F.sum((F.col("event_type") == t).cast("long"))
            .cast("long")
            .alias(f"c{i}")
            for i, t in enumerate(_EVENT_TYPES)
        ],
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    w = Window.orderBy("day")
    cols = [f"c{i}" for i in range(len(_EVENT_TYPES))]
    lagged = d.select(
        "day",
        *cols,
        "total",
        *[F.lag(c).over(w).alias(f"p{i}") for i, c in enumerate(cols)],
        F.lag("total").over(w).alias("pt"),
    ).filter(F.col("pt").isNotNull())
    num = None
    for i in range(len(_EVENT_TYPES)):
        term = F.abs(
            F.col(f"c{i}") * F.col("pt") - F.col(f"p{i}") * F.col("total")
        )
        num = term if num is None else num + term
    tv = lagged.select(
        "day",
        "total",
        F.col("pt").alias("prev_total"),
        F.round(
            num.cast("double")
            / (F.lit(2) * F.col("total") * F.col("pt")).cast("double"),
            6,
        ).alias("tv_distance"),
    )
    return tv.withColumn(
        "drift_flag",
        F.when(F.col("tv_distance") > 0.05, 1).otherwise(0).cast("long"),
    )


@register(
    "join_pointintime_scd2",
    oracle="""
    WITH src AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('signup', 'view', 'click')),
    ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM src),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type),
    dim AS (
      SELECT user_id, event_type AS browse_state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM changes),
    probe AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
             CAST(round(value * 100) AS BIGINT) AS value_c
      FROM events WHERE event_type = 'purchase')
    SELECT p.purchase_id, p.user_id, p.purchase_ts, d.browse_state,
           d.valid_from,
           CAST(p.value_c AS DOUBLE) / 100.0 AS purchase_value
    FROM probe p JOIN dim d
      ON p.user_id = d.user_id
     AND d.valid_from <= p.purchase_ts
     AND (d.valid_to IS NULL OR p.purchase_ts < d.valid_to)
    """,
    tags=("temporal", "join", "scd2", "pointintime"),
    since=8,
)
def join_pointintime_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal table) join — the Flink
    `FOR SYSTEM_TIME AS OF` shape the reference's host engine
    provides upstream of the sink, consumed here against a REAL
    versioned dimension: the SCD2 build (`pipeline_scd2_dimension`'s
    construction, restricted to browsing events) supplies validity
    intervals, and each purchase probes the version valid AT its
    timestamp — "what was the user's browsing state when they
    bought". Because SCD2 intervals partition time per key, every
    probe matches at most one version: no dedup pass, no tie-break
    ambiguity, exactly the contract a warehouse's point-in-time
    joins rely on.

    Scale shape: dim build is the single-shuffle SCD2 window stack;
    the probe join is one user-keyed equi-join with the interval as
    a residual range predicate — both sides shuffle once on
    user_id, and per-user match fan-out is bounded by the version
    count a user has."""
    ev = load_table(spark, sf_dir, "events")
    src = ev.filter(
        F.col("event_type").isin("signup", "view", "click")
    ).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        src.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("browse_state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("valid_to"),
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        U.cents("value").alias("value_c"),
    )
    return (
        probe.join(
            dim,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("valid_from") <= F.col("purchase_ts"))
            & (
                F.col("valid_to").isNull()
                | (F.col("purchase_ts") < F.col("valid_to"))
            ),
        )
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "browse_state",
            "valid_from",
            (F.col("value_c").cast("double") / F.lit(100.0)).alias(
                "purchase_value"
            ),
        )
    )
