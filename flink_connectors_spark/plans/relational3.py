"""Third wave of relational coverage: the remaining TPC-H query shapes
(q2, q11, q13, q15, q16, q17, q20, q21, q22), adapted to the test
schema — it has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``c_phone``/``o_comment`` columns,
so the partsupp-driven queries re-derive supplier-part relationships
from ``lineitem`` and the comment/phone filters use available columns.
The *query shapes* (correlated min, percentage-of-total HAVING,
outer-join distribution, argmax-by-scalar-subquery, anti-joined
distinct counts, correlated-avg filter, semi-joined HAVING,
only-culprit detection, anti-join + scalar-subquery threshold) are
preserved.

Scale notes (100 TB): every query keeps `lineitem`/`orders` on the
shuffle path at most once or twice; all dimension tables (region,
nation, supplier=100 rows, filtered part subsets) are broadcast.
Correlated subqueries are expressed as window functions or
aggregate-then-broadcast-join so Catalyst never falls back to a
nested-loop plan.

Determinism rules as elsewhere: money math in DECIMAL(18,2) cast to
double only at the end; `l_quantity` is integral-valued so double
sums/avgs are exact and order-independent; every LIMIT has a total
tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from ._util import dec, dsum, one_minus

_DISC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q2_min_price_supplier",
    oracle="""
    WITH eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
           l_extendedprice AS min_price
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN eu_supp s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2 JOIN eu_supp s2 ON s2.s_suppkey = l2.l_suppkey
        WHERE l2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, min_price
    LIMIT 100
    """,
    tags=("join", "subquery", "topk"),
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: supplier-part offers come from
    lineitem, not partsupp): per part, the EUROPE supplier(s) whose
    shipment hit the minimum extended price. Correlated MIN subquery
    -> window min over the part key (single shuffle of lineitem)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    eu_supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    # The correlated MIN is over *all* EU shipments of the part, not
    # just STANDARD parts, so compute the window before the part join.
    w = Window.partitionBy("l_partkey")
    li = li.withColumn("min_price", F.min("l_extendedprice").over(w))
    return (
        li.filter(F.col("l_extendedprice") == F.col("min_price"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "min_price"
        )
        .limit(100)
    )


@register(
    "q11_important_part_value",
    oracle=f"""
    WITH vals AS (
      SELECT l_partkey, SUM({_DISC}) AS value_dec
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM vals
    WHERE value_dec > (
      SELECT SUM(value_dec) * CAST(0.001 AS DECIMAL(10,6)) FROM vals)
    """,
    tags=("agg", "subquery"),
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: part value = discounted revenue
    shipped by the nation's suppliers, since there is no partsupp):
    parts whose value exceeds 0.1% of the total. Percentage-of-total
    as aggregate-then-broadcast-join; threshold kept in exact decimal
    so the comparison is engine-independent."""
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    vals = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias(
                "value_dec"
            )
        )
    )
    threshold = vals.agg(
        (F.sum("value_dec") * F.lit("0.001").cast("decimal(10,6)")).alias(
            "threshold"
        )
    )
    return (
        vals.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted: the o_comment NOT LIKE filter becomes an
    order-priority filter): distribution of customers by order count,
    customers with zero orders included via the outer join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_DISC}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    tags=("agg", "subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue — the
    revenue view reused for both the per-supplier rows and the MAX
    scalar subquery. Exact decimal revenue so the equality join on
    the max is engine-stable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(
        F.col("l_suppkey").alias("supplier_no")
    ).agg(
        F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias(
            "total_rev"
        )
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "subquery"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier-part pairs from lineitem;
    the complaint-comment exclusion becomes negative account
    balance): distinct supplier counts per brand/type/size with a
    NOT IN anti-join."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    excluded = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
    tags=("join", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders. The
    correlated AVG is a window over the part key computed on the full
    lineitem (the subquery ranges over all shipments of the part).
    l_quantity is integral so the double AVG is order-independent."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (dsum(dec("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


@register(
    "q20_excess_shipment_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_4')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 60)
    ORDER BY s_name
    """,
    tags=("join", "subquery", "agg"),
)
def q20_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: 'has excess availability' becomes
    'shipped more than 60 units of some red part'): IN-subquery over
    a grouped HAVING -> semi join. l_quantity integral => exact."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_4")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS nsupp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
      FROM li GROUP BY l_orderkey
    ),
    culprit AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN per_order USING (l_orderkey)
      WHERE late AND nsupp > 1 AND nlate = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM culprit
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_5', 'NATION_8')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("join", "agg", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates, so 'late'
    = shipped more than 60 days after the order date): suppliers who
    were the *only* late shipper on a multi-supplier finalized order.
    The EXISTS / NOT EXISTS pair becomes one aggregation per order
    (distinct suppliers vs distinct late suppliers) — lineitem is
    shuffled once by orderkey instead of three self-joins."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    # Distinct (order, supplier) pairs with an any-late flag first:
    # avoids the Expand (input duplication) a two-countDistinct
    # aggregate would plan. r15 (r14 verdict Next #5): the per-order
    # stats ride a WINDOW over the same pairs frame instead of a
    # second aggregate branch joined back — the old two-branch shape
    # re-inlined the lineitem-x-orders subtree into BOTH consumers
    # (lineitem + orders scanned twice, 6 scans total) and paid a
    # pairs-vs-per_order sort-merge join; now one scan each, one
    # aggregate exchange, one window exchange (guide §2.4: two
    # operations keyed the same way share the partitioning).
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("is_late")
    )
    per_order_w = Window.partitionBy("l_orderkey")
    culprit = (
        pairs.withColumn(
            "nsupp", F.count(F.lit(1)).over(per_order_w)
        )
        .withColumn("nlate", F.sum("is_late").over(per_order_w))
        .filter(
            (F.col("is_late") == 1)
            & (F.col("nsupp") > 1)
            & (F.col("nlate") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_5", "NATION_8")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        culprit.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH eligible AS (
      SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
             c_custkey, c_acctbal
      FROM customer
      WHERE CAST(c_nationkey % 10 AS INT) IN (1, 2, 4, 6, 7)
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM eligible e
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM eligible WHERE c_acctbal > 0.00)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = e.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    """,
    tags=("join", "subquery", "agg"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: country code = nationkey mod 10
    instead of a phone prefix): wealthy customers with no orders —
    wealthy customers dormant since 1999 — scalar AVG subquery
    (exact-decimal sum / count) + anti join against recent orders."""
    eligible = (
        _t(spark, sf_dir, "customer")
        .withColumn(
            "cntrycode", (F.col("c_nationkey") % 10).cast("int")
        )
        .filter(F.col("cntrycode").isin(1, 2, 4, 6, 7))
        .select("cntrycode", "c_custkey", "c_acctbal")
    )
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.00).agg(
        (
            F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal")).alias("totacctbal"),
        )
    )
