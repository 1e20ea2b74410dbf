"""Streaming pipeline builders over an events-shaped stream.

Each builder takes a *streaming* DataFrame (from readStream) with the
events schema (event_id, ts timestamp, user_id, event_type, value,
props) and returns the transformed streaming DataFrame; tests replay
the static events table through a file stream and run with
Trigger.availableNow against the memory sink.

Scale notes: all aggregations are keyed (bounded state per key +
window); watermarks bound state retention; sliding windows use the
built-in `window()` (state shared across overlapping panes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Cast TIMESTAMP_NTZ event-time columns to TIMESTAMP (instant).

    ``withWatermark`` requires an instant-typed column
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), but parquet files
    written with naive timestamps — including the µs-NTZ testdata —
    arrive as TIMESTAMP_NTZ. Under the engine's UTC session timezone
    the cast is value-preserving (naive wall-clock == UTC instant), so
    every builder applies it defensively to its event-time column."""
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def tumbling_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with watermarked
    late-data handling — the streaming twin of
    plans.streaming_batch.stream_tumbling_window."""
    stream = ensure_event_time(stream, "ts")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window counts per event_type."""
    stream = ensure_event_time(stream, "ts")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sliding_distinct_users(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window DISTINCT users per window — the streaming DAU/
    WAU shape (the batch twin is ``events_dau_wau``'s fan-out trick).
    Exact ``count_distinct`` is unsupported in streaming aggregations
    (state would be unbounded per window), so the stream side keeps
    the standard two-level form: dedupe (window, user) pairs first —
    state bounded by distinct users per window, expired by the
    watermark — then count rows per window. Same answer as a batch
    COUNT(DISTINCT), streaming-legal state."""
    stream = ensure_event_time(stream, "ts")
    pairs = (
        stream.withWatermark("ts", watermark)
        .select(F.window("ts", window, slide).alias("win"), "user_id")
        .dropDuplicates(["win", "user_id"])
    )
    return (
        pairs.groupBy("win")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("win.start").alias("window_start"), "n_users")
    )


def session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "60 minutes",
) -> DataFrame:
    """Session windows (gap-based) per user via the built-in
    session_window — state merges adjacent events within the gap."""
    stream = ensure_event_time(stream, "ts")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_events(
    stream: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup: first event per key wins; watermark bounds the
    dedup state (keys older than the watermark are evicted)."""
    stream = ensure_event_time(stream, "ts")
    return stream.withWatermark("ts", watermark).dropDuplicates(
        keys or ["event_id"]
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Arbitrary stateful op: running per-user value totals via
    applyInPandasWithState (the Spark analogue of a Flink keyed
    process function)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_stats_tws(stream: DataFrame) -> DataFrame:
    """The same running per-user totals on the modern
    transformWithStateInPandas API (Spark 4.x StatefulProcessor with
    typed ValueState) — the successor to applyInPandasWithState and
    the closest Spark analogue of a Flink KeyedProcessFunction with
    managed state."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        UserStats(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def clicks_before_errors_stream(stream: DataFrame) -> DataFrame:
    """Stream-stream interval join (the live twin of the batch
    `join_interval_clicks_before_error` plan): clicks joined to the
    same user's errors arriving within 30 minutes after them.

    Both sides carry watermarks and the join condition bounds event
    time on both sides, so Spark can expire join state — unbounded
    state otherwise. The Flink-SQL analogue is an interval join."""
    stream = ensure_event_time(stream, "ts")
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("c_user"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
            F.col("user_id").alias("e_user"),
        )
        .withWatermark("error_ts", "1 hour")
    )
    return clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") > F.col("click_ts"))
        & (
            F.col("error_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).select("click_id", "click_ts", "error_id", "error_ts", "c_user")


def enrich_with_static_profile(
    stream: DataFrame, profile: DataFrame
) -> DataFrame:
    """Stream-static join: each event enriched with a (batch) profile
    table. The static side is planned per micro-batch — broadcast
    when small — and needs no watermark; the standard dimension-
    enrichment topology."""
    return stream.join(
        F.broadcast(profile), "user_id", "left_outer"
    ).select(
        "event_id", "ts", "user_id", "event_type", "value", "user_tier"
    )


def _space_saving_fold(tbl: dict, items, capacity: int) -> dict:
    """Pure Space-Saving (Metwally et al. 2005) counter fold:
    ``tbl`` maps key -> [est_count, err]. A new key beyond capacity
    evicts the minimum counter (deterministic tie-break: smallest
    key) and inherits its count as the new key's error bound —
    est_count overestimates by at most err, and any key with true
    frequency > min-counter is guaranteed present. Kept separate
    from the streaming wiring so the sketch math unit-tests without
    a stream."""
    for u in items:
        u = int(u)
        if u in tbl:
            tbl[u][0] += 1
        elif len(tbl) < capacity:
            tbl[u] = [1, 0]
        else:
            mu = min(tbl, key=lambda x: (tbl[x][0], x))
            mc = tbl[mu][0]
            del tbl[mu]
            tbl[u] = [mc + 1, mc]
    return tbl


def windowed_heavy_hitters(
    stream: DataFrame,
    k: int = 3,
    capacity: int = 256,
    width_s: int = 600,
) -> DataFrame:
    """Streaming top-k HEAVY HITTERS per tumbling window via
    applyInPandasWithState holding a Space-Saving sketch per
    (window, event_type) — the bounded-state formulation of "top
    users per 10 minutes" (a rank window is not expressible on a
    stream, and exact per-key counts grow with the key universe;
    Space-Saving caps state at ``capacity`` counters per window
    with a per-key error bound it REPORTS). Each trigger emits the
    current top-k (update mode): (window_start_s, event_type,
    user_id, est_count, err, rnk). With capacity >= distinct keys
    per window the sketch is exact (err 0) and equals the batch
    twin `stream_topk_heavy_hitters` — the live test pins that.
    At scale: state is O(windows x types x capacity), independent
    of stream length; the watermark closes windows as usual."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = (
        "window_start_s bigint, event_type string, user_id bigint, "
        "est_count bigint, err bigint, rnk int"
    )
    state_schema = (
        "users array<bigint>, counts array<bigint>, errs array<bigint>"
    )

    keyed = stream.select(
        (F.floor(F.unix_timestamp("ts") / width_s) * width_s)
        .cast("bigint")
        .alias("window_start_s"),
        "event_type",
        "user_id",
    )

    def update(key, pdfs, state):
        if state.exists:
            users, counts, errs = state.get
            tbl = {
                int(u): [int(c), int(e)]
                for u, c, e in zip(users, counts, errs)
            }
        else:
            tbl = {}
        for pdf in pdfs:
            _space_saving_fold(tbl, pdf["user_id"], capacity)
        state.update(
            (
                list(tbl),
                [v[0] for v in tbl.values()],
                [v[1] for v in tbl.values()],
            )
        )
        top = sorted(tbl.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        yield pd.DataFrame(
            {
                "window_start_s": [key[0]] * len(top),
                "event_type": [key[1]] * len(top),
                "user_id": [u for u, _ in top],
                "est_count": [v[0] for _, v in top],
                "err": [v[1] for _, v in top],
                "rnk": list(range(1, len(top) + 1)),
            }
        )

    return keyed.groupBy("window_start_s", "event_type").applyInPandasWithState(
        update,
        outputStructType=schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def clicks_left_outer_errors_stream(stream: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, enriched
    with same-user errors arriving within 30 minutes after it — and
    emitted WITH NULLS if no such error exists. The outer semantics
    are the subtle part: an unmatched click's null row can only be
    emitted once the watermark proves no matching error can still
    arrive (state eviction), so null rows trail the data by the join
    window + watermark delay, and clicks newer than the final
    watermark horizon are withheld entirely (verified live in
    tests/test_streaming.py against the registered batch twin
    `stream_left_interval_join`, which models the horizon
    explicitly). Unbounded state without both watermarks + both-side
    time bounds; Flink-SQL analogue: LEFT OUTER interval join."""
    stream = ensure_event_time(stream, "ts")
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("c_user"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
            F.col("user_id").alias("e_user"),
        )
        .withWatermark("error_ts", "1 hour")
    )
    return clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") > F.col("click_ts"))
        & (
            F.col("error_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "leftOuter",
    ).select("click_id", "click_ts", "c_user", "error_id", "error_ts")


def dedup_events_within_watermark(
    stream: DataFrame, delay: str = "30 minutes"
) -> DataFrame:
    """Watermark-bounded streaming dedup
    (``dropDuplicatesWithinWatermark``, Spark 3.5+): rows with the
    same event_id are deduplicated only while they can still collide
    inside the watermark window, and state for an id is DROPPED once
    the watermark passes it — bounded state for unbounded streams,
    where plain ``dropDuplicates`` keeps every key forever (the
    state-size failure mode of long-running dedup). The semantics
    tradeoff is explicit: a duplicate arriving later than ``delay``
    after its first occurrence is NOT caught — acceptable exactly
    when duplicates come from retries/at-least-once delivery, which
    cluster in time."""
    stream = ensure_event_time(stream, "ts")
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
