"""Window-function coverage: ranking, offsets (lag/lead), running
frames, distribution functions.

Host-engine-provided in the reference (Flink SQL planner, SURVEY.md
§2.2); here Spark's Window exec. Scale note: each query partitions its
window by a real key (never an empty OVER ()), so state stays bounded
per partition and the shuffle is on the partition key only.

Determinism note: every window ORDER BY includes a unique tiebreaker so
rank/lag results are identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import load_table
from ._util import dec


@register(
    "window_rank_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer) t
    WHERE rnk <= 5
    """,
    tags=("window", "rank", "topk"),
)
def window_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per group via RANK. At scale this is the canonical
    'grouped top-k': one shuffle on the partition key, per-partition
    sort, early filter on rank."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rnk")
    )


@register(
    "window_row_number_dedup",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def window_row_number_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key via ROW_NUMBER — the batch form of streaming
    dedup and of the sink's replacing-mode compaction (SURVEY §2.1 S10)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    """,
    tags=("window", "offset"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offsets within per-customer order history."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame. Decimal accumulation
    keeps every prefix sum exact, so cross-engine hashes match."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_sliding_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS last3_spend
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding ROWS frame (moving 3-order spend)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("last3_spend"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4)      OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile,
           DENSE_RANK()  OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS nation_dense_rank
    FROM customer
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing + DENSE_RANK (integer-valued distribution
    functions; PERCENT_RANK/CUME_DIST avoided only because their
    double division is engine-identical anyway but adds no coverage)."""
    c = load_table(spark, sf_dir, "customer")
    w_bal = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    w_nat = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_nationkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w_bal).alias("quartile"),
        F.dense_rank().over(w_nat).alias("nation_dense_rank"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
             / 100.0 AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(date_part('epoch', ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per user, events and
    value total within the trailing hour. Ordered on epoch seconds so
    the frame bound is numeric in both engines; peer rows (equal
    epoch) are included together, which RANGE defines deterministically.
    Money sums in int64 hundredths."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.floor(F.unix_timestamp("ts")).cast("bigint"))
        .rangeBetween(-3600, Window.currentRow)
    )
    cents_v = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        (F.sum(cents_v).over(w).cast("double") / F.lit(100.0)).alias(
            "value_last_hour"
        ),
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS INT)
             AS price_quartile
    FROM orders
    """,
    tags=("window", "ntile", "distribution"),
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4): equal-frequency quartile assignment per priority
    band. (o_totalprice, o_orderkey) is a total order, so the bucket
    boundaries are identical in every engine — ntile over a non-total
    order would split peer rows arbitrarily."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
    )
