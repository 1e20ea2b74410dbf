"""Scalar-function families: string, date/time, math, conditional,
JSON. Host-engine-provided in the reference (SURVEY.md §2.2); here
``pyspark.sql.functions`` — all JVM-side, inside whole-stage codegen.

Cross-engine notes baked into the oracles:
- DuckDB `year()`/`hour()`/... return BIGINT, Spark INT → oracle casts.
- DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  replace-all semantics.
- DuckDB `floor()` returns DOUBLE, Spark BIGINT → oracle casts.
- Transcendentals (ln/exp) are not correctly-rounded and may differ by
  1 ulp across libm implementations — excluded from hashed outputs;
  sqrt IS IEEE-correctly-rounded and allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS segment_lower,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_name, ':', c_mktsegment) AS name_seg,
           trim(lpad(c_name, 30, '*')) AS name_padded,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
           (c_name LIKE '%1%') AS has_one
    FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, concat, pad/trim,
    regexp_replace, LIKE."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim(F.lpad("c_name", 30, "*")).alias("name_padded"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.col("c_name").like("%1%").alias("has_one"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 90 DAY AS due_ts,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncation, interval
    arithmetic, datediff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT p_partkey,
           abs(p_size - 25) AS size_dev,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_round1,
           p_size % 7 AS size_mod7,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           CAST(power(CAST(p_size AS DOUBLE), 2) AS DOUBLE) AS size_sq,
           greatest(p_size, 10) AS size_floor10,
           least(p_size, 40) AS size_cap40
    FROM part
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. round() is done on exact DECIMAL (half-away-from-
    zero in both engines); sqrt is IEEE-exact; pow on small ints exact."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.round(F.col("p_retailprice").cast("decimal(18,2)"), 1)
        .cast("double")
        .alias("price_round1"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.pow(F.col("p_size").cast("double"), 2).cast("double").alias("size_sq"),
        F.greatest(F.col("p_size"), F.lit(10)).alias("size_floor10"),
        F.least(F.col("p_size"), F.lit(40)).alias("size_cap40"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS is_urgent
    FROM orders
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF / IN-list."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_urgent"),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           (CAST(json_extract_string(props, '$.k') AS INT) >= 50) AS k_high
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column (reference host
    engine exposes JSON functions; Spark: get_json_object)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_value"),
        (k >= 50).alias("k_high"),
    )
