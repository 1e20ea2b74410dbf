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


def build_value_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    grain: str = "day",
    n_buckets: int = 64,
    lo_cents: int = 0,
    width_cents: int = 1000,
) -> DataFrame:
    """The rollup family's third mergeable summary (after additive
    count/sum and HLL distinct): a FIXED-BUCKET value histogram per
    (time bucket, dims) — the TimescaleDB/ClickHouse continuous-
    aggregate recipe for quantiles over rollups. Bucket counts are
    plain integers, so histograms merge ADDITIVELY across any grain
    boundary (exactly, unlike KLL-style sketches), and any quantile
    is read off the merged histogram at bucket resolution with pure
    integer math — no engine ever interpolates a float.

    Values quantize to exact cents, then clamp into
    [lo, lo + n_buckets*width): outliers land in the edge buckets
    (visible as mass there — size the domain so they're rare).
    One keyed shuffle over facts; the stored summary is
    |time buckets x dims x <= n_buckets| rows.
    """
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {GRAINS}")
    cents = F.round(F.col(value_col) * 100).cast("long")
    clamped = F.greatest(
        F.lit(lo_cents),
        F.least(cents, F.lit(lo_cents + n_buckets * width_cents - 1)),
    )
    hb = ((clamped - lo_cents) / width_cents).cast("long")
    return (
        events.withColumn("bucket", F.date_trunc(grain, F.col(ts_col)))
        .withColumn("hbucket", hb)
        .groupBy("bucket", *dims, "hbucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histogram(
    hist: DataFrame,
    grain: str,
    dims: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Re-aggregate histograms to a coarser grain — bucket counts add
    exactly, so merge == rebuild (same guarantee as merge_rollup)."""
    return (
        hist.withColumn("bucket", F.date_trunc(grain, F.col("bucket")))
        .groupBy("bucket", *dims, "hbucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    dims: tuple[str, ...] = ("event_type",),
    qs: tuple[int, ...] = (50, 95, 99),
    lo_cents: int = 0,
    width_cents: int = 1000,
) -> DataFrame:
    """Quantile UPPER BOUNDS (in exact cents) from a histogram
    summary: for percentile q, the upper edge of the first bucket
    whose cumulative count reaches ceil(q*n/100). Deterministic
    integer math end to end — a bucket-resolution guarantee
    (true quantile <= reported edge < true + width), which is the
    honest contract sketch quantiles only approximate. The cumulative
    walk is a window over <= n_buckets rows per group — summary-sized,
    never fact-sized."""
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy("bucket", *dims)
        .orderBy("hbucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("bucket", *dims)
    cum = F.sum("cnt").over(wcum)
    n = F.sum("cnt").over(wall)
    ub = F.lit(lo_cents) + (F.col("hbucket") + 1) * width_cents
    c = hist.withColumn("__cum__", cum).withColumn("__n__", n)
    aggs = [F.max("__n__").cast("long").alias("n")]
    for q in qs:
        # cum >= ceil(n*q/100)  <=>  cum*100 >= n*q — pure int64, no
        # float division anywhere near the cut
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum__") * 100 >= F.col("__n__") * q, ub
                )
            )
            .cast("long")
            .alias(f"p{q}_ub_cents")
        )
    return c.groupBy("bucket", *dims).agg(*aggs)
