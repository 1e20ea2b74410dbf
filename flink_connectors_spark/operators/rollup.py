"""Hypertable-style rollup: continuous-aggregate summary tables.

The pattern (TimescaleDB continuous aggregates, Druid rollup,
ClickHouse SummingMergeTree — the reference's target engine ships
this as a table engine): maintain a small summary table at a fine
time grain holding ADDITIVE partial aggregates; answer any
coarser-grain query by re-aggregating the summary instead of the
fact table. At 100 TB the rollup is ~|buckets x dims| rows — queries
that would scan the full fact table read megabytes instead.

Correctness rests on additivity: COUNT and SUM (and anything derived
from them — mean, rate) compose exactly across grain boundaries when
the fine buckets NEST inside coarse ones (hour -> day -> week).
Non-additive measures (distinct counts, percentiles) need sketches
(HLL / KLL) in the rollup row; Spark's approx aggregates are
mergeable the same way.

Money metrics are kept as exact int64 hundredths
(`plans/_util.cents` discipline), so rollup-then-aggregate is
bit-identical to direct aggregation — the property the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# nesting-safe grains: each bucket start truncates exactly into the
# coarser one
GRAINS = ("hour", "day", "week", "month")


def build_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    grain: str = "hour",
) -> DataFrame:
    """Summary table at ``grain``: (bucket, *dims, n, v_cents).
    One keyed shuffle over the fact table — this is the ONLY pass
    that ever touches full facts; in production it runs incrementally
    per ingest window (append-only buckets) or via the streaming
    twin (watermarked windowed agg writing the same schema)."""
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {GRAINS}")
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.withColumn("bucket", F.date_trunc(grain, F.col(ts_col)))
        .groupBy("bucket", *dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("v_cents"),
        )
    )


def answer_from_rollup(
    rollup: DataFrame,
    grain: str,
    dims: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Re-aggregate the summary to a coarser grain. Valid whenever
    the requested grain is >= the rollup grain in `GRAINS` order
    (buckets nest); the partial aggregates add exactly."""
    return (
        rollup.withColumn("bucket", F.date_trunc(grain, F.col("bucket")))
        .groupBy("bucket", *dims)
        .agg(
            F.sum("n").alias("n"),
            F.sum("v_cents").alias("v_cents"),
        )
    )


def finalize(df: DataFrame) -> DataFrame:
    """Present additive partials as user-facing metrics (exact cents
    -> double once, at the very end)."""
    return df.select(
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        *[c for c in df.columns if c not in ("bucket", "n", "v_cents")],
        F.col("n").alias("n_events"),
        (F.col("v_cents").cast("double") / F.lit(100.0)).alias("total_value"),
    )


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    dims: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Incremental rollup maintenance: fold a delta summary (the
    rollup of ONE new ingest window) into the standing summary table.
    Because the partials are additive (COUNT / int64-cent SUM),
    union + re-aggregate on the bucket key is EXACTLY equivalent to
    rebuilding from all facts — the refresh step of a continuous
    aggregate, running over summary-sized data (the delta summary is
    |new buckets x dims| rows; old facts are never touched).

    In production this is the nightly job: build_rollup(yesterday's
    facts) -> merge_rollup(summary, delta) -> overwrite/upsert the
    summary partitions that changed.
    """
    return (
        existing.unionByName(delta)
        .groupBy("bucket", *dims)
        .agg(
            F.sum("n").alias("n"),
            F.sum("v_cents").alias("v_cents"),
        )
    )
