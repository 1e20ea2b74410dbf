"""Queries authored as Spark SQL *text* over registered views — the
engine's user-facing surface, matching how the reference is driven
(Flink SQL DDL + INSERT INTO ... SELECT, `README.md:4-28`). The rest
of the registry exercises the DataFrame API; these prove the same
plans come out of the SQL front-end (Catalyst parses both into the
same logical plans, and the correctness gate hash-checks the
results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..session import load_table

_VIEWS = ("lineitem", "orders", "customer", "events", "nation")


def _ensure_views(spark: SparkSession, sf_dir: str) -> None:
    for name in _VIEWS:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "sql_text_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("sql", "scan", "agg"),
)
def sql_text_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape written as SQL text (int64-cents money math,
    same determinism discipline as the DataFrame plans)."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "sql_text_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total_spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 25
    """,
    tags=("sql", "join", "agg", "topk"),
)
def sql_text_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + top-k as SQL text; plans identically to the
    DataFrame twin (broadcast dim, TakeOrderedAndProject)."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_spend
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_spend DESC, c_custkey
        LIMIT 25
        """
    )


@register(
    "sql_text_window_sessions",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("sql", "window", "session"),
)
def sql_text_window_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization written as SQL text (lag + running
    sum): the batch formulation of session windows, all within one
    user_id partitioning."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        WITH gaps AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(MIN(ts) AS TIMESTAMP_NTZ) AS session_start
        FROM sess GROUP BY user_id, session_id
        """
    )


@register(
    "sql_text_hinted_join",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS gross
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("sql", "hint", "join"),
)
def sql_text_hinted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-side optimizer hints: /*+ BROADCAST(o) */ forces the
    orders build side from SQL text — the hint surface a SQL-first
    user controls join strategy with (the DataFrame twin is
    F.broadcast). The hint changes only the physical plan, so the
    oracle is the same query unhinted."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(o) */
               o.o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS gross
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "sql_text_recursive_date_spine",
    oracle="""
    WITH RECURSIVE spine(d) AS (
      SELECT DATE '1997-01-01'
      UNION ALL
      SELECT d + 1 FROM spine WHERE d < DATE '1997-01-31'),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-02-01'
        AND CAST(o_orderdate AS DATE) <= DATE '1997-01-31'
      GROUP BY 1)
    SELECT spine.d AS order_day,
           CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
    tags=("sql", "recursive-cte", "gapfill"),
    since=4,
)
def sql_text_recursive_date_spine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gap-filled daily order counts over a RECURSIVE-CTE date spine —
    Spark 4's WITH RECURSIVE surface (the calendar-dimension /
    zero-fill idiom every reporting stack needs), proven against
    DuckDB's recursive CTE. The spine is bounded (31 rows, well under
    the engine's recursion depth limit and planned driver-side-tiny);
    the orders scan is date-pruned before the one broadcast-sized
    left join. For multi-year spines prefer sequence()/explode (one
    row-generator expression, no linear-depth recursion) — the
    recursion is the right tool when each level derives from the
    previous (org charts, BOM explosions), which a calendar also
    demonstrates in minimal form."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '1997-01-01'
          UNION ALL
          SELECT date_add(d, 1) FROM spine WHERE d < DATE '1997-01-31')
        SELECT spine.d AS order_day,
               CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders
        FROM spine
        LEFT JOIN (
          SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate <  TIMESTAMP '1998-02-01'
            AND CAST(o_orderdate AS DATE) <= DATE '1997-01-31'
          GROUP BY CAST(o_orderdate AS DATE)
        ) daily ON spine.d = daily.d
        """
    )


@register(
    "sql_text_lateral_topk",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, round(c_acctbal, 2) AS c_acctbal
             FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """,
    tags=("sql", "lateral", "topk", "correlated"),
    since=4,
)
def sql_text_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by balance PER NATION via a correlated LATERAL
    subquery — the per-row-parameterized-subquery surface (Flink SQL
    and every modern engine ship it; users migrating bring these
    queries verbatim). Catalyst decorrelates the LATERAL into the
    same window/rank plan the DataFrame top-k-per-group uses — one
    shuffle on the correlation key with rank-limit pushdown, NOT a
    per-nation re-execution — which is exactly why the text form is
    safe at 100 TB."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_name, round(c_acctbal, 2) AS c_acctbal
                 FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """
    )


@register(
    "sql_text_pivot_status",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                AS BIGINT) AS open_n,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                AS BIGINT) AS finished_n,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END)
                AS BIGINT) AS pending_n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("sql", "pivot", "agg"),
    since=4,
)
def sql_text_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text PIVOT: order counts per priority pivoted wide by
    status through Spark's PIVOT clause (the relational wide-reshape
    the DataFrame `pivot_daily_event_values` query does with
    `.pivot()`; this proves the SQL front-end surface). COALESCE
    normalizes PIVOT's absent-cell NULL to COUNT semantics' 0 so the
    oracle can be plain conditional aggregation — the plans compile
    identically (one partial-agg shuffle on the group key)."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT priority,
               COALESCE(open_n, 0L) AS open_n,
               COALESCE(finished_n, 0L) AS finished_n,
               COALESCE(pending_n, 0L) AS pending_n
        FROM (
          SELECT o_orderpriority AS priority, o_orderstatus
          FROM orders
        ) PIVOT (
          COUNT(*) FOR o_orderstatus
          IN ('O' AS open_n, 'F' AS finished_n, 'P' AS pending_n)
        )
        """
    )


@register(
    "sql_text_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
    tags=("sql", "agg", "grouping-sets"),
    since=4,
)
def sql_text_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL-text front-end with an explicit
    grouping-id column — the multi-grain summary a reporting layer
    asks for in one statement (detail, per-flag, grand total). The
    DataFrame cube/rollup twins are r1-green; this pins the SQL
    PARSER path and the grouping() builtin. gid disambiguates real
    NULL group keys from superaggregate rows — the value hash
    covers all three grains."""
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )
