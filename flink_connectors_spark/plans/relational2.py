"""Second wave of relational coverage: the TPC-H query shapes not in
``relational`` — EXISTS-driven aggregation, multi-nation join pairs,
market-share computation, CASE-conditional aggregation, percentage-of-
total, HAVING + IN, OR-of-ANDs multi-predicate scans.

Same determinism rules: decimal money math cast to double at the end;
every LIMIT has a total tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from ._util import cents, dec, dsum, one_minus

_DISC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("join", "subquery", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS correlated subquery -> left-semi join + agg."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             {_DISC} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name <> n2.n_name
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between distinct nations."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_DISC} AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'CHINA' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
    tags=("join", "agg", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: market share = conditional sum / total sum (both
    exact decimal, divided in float64 -> deterministic)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = dec("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(18,2)")
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "CHINA", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(SUM(a4) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
             - CAST(round(l.l_quantity * 100) AS BIGINT)
               * CAST(round(l.l_tax * 100) AS BIGINT) AS a4
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%a%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per nation-year (tax stands in for the
    missing ps_supplycost column).

    Money math in exact int64 ten-thousandths (the q1 cents
    discipline applied to a 2-factor product): ep_c*(100-disc_c) -
    qty_c*tax_c stays in whole-stage codegen instead of the 128-bit
    DECIMAL(38) product path, integer sums are order-immune, and the
    final double (sum/1e4, mirrored token-for-token in the oracle)
    hashes identically cross-engine. ~10% faster at sf0.1 (one-
    session interleaved A/B, r8); row values < ~1e9 keep the running
    sum exact through ~SF1500 lineitem — past that, revert to the
    decimal helpers (same caveat as _util.cents)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount4 = cents("l_extendedprice") * (
        F.lit(100).cast("long") - cents("l_discount")
    ) - cents("l_quantity") * cents("l_tax")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount4.alias("a4"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum("a4").cast("double") / F.lit(10000.0)).alias(
                "sum_profit"
            )
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    tags=("join", "agg", "conditional"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts by priority band
    (returnflag stands in for the missing shipmode column)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.00 AS DOUBLE)
             * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC}
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_DISC}) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    tags=("join", "agg", "conditional"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage-of-total with conditional numerator."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    vol = dec("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("join", "agg", "subquery", "topk"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over a HAVING aggregate (left-semi against an
    aggregated subquery), then re-aggregate + top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 200)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(dec("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({_DISC}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_matches
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("join", "filter", "agg"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides — exercises
    predicate normalization/pushdown through the join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35) & (q >= 20) & (q <= 40))
    )
    return j.filter(cond).agg(
        dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_matches"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.95) AS p95_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, verified bit-identical on this data). For 100 TB
    interactive use, approx_percentile trades exactness for a
    mergeable sketch — agg_approx_distinct covers that family."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
    )


@register(
    "agg_min_by_max_by",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey,
                   round(o_totalprice * 100) * 10000000 + o_orderkey)
             AS best_order,
           arg_min(o_orderkey,
                   round(o_totalprice * 100) * 10000000 + o_orderkey)
             AS worst_order
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "argminmax"),
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregates: each customer's highest/lowest
    priced order. The ordering key is (price cents, orderkey) packed
    into one int64 so ties are impossible — arg_min/arg_max tie
    behavior is engine-defined and would not hash-match otherwise."""
    o = _t(spark, sf_dir, "orders")
    arg = "round(o_totalprice*100)*10000000 + o_orderkey"
    return o.groupBy("o_custkey").agg(
        F.expr(f"max_by(o_orderkey, {arg})").alias("best_order"),
        F.expr(f"min_by(o_orderkey, {arg})").alias("worst_order"),
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM orders o RIGHT OUTER JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join with a join-side predicate (kept in the ON
    clause — moving it to WHERE would silently drop the null-extended
    rows, the classic outer-join bug)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(
        c,
        (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "F"),
        "right_outer",
    ).select("c_custkey", "c_name", "o_orderkey")


@register(
    "setop_union_by_name",
    oracle="""
    SELECT k, label FROM (
      SELECT n_nationkey AS k, n_name AS label FROM nation
      UNION ALL
      SELECT r_regionkey AS k, r_name AS label FROM region)
    """,
    tags=("setop",),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered projections — column
    resolution by name, not position (positional union on mismatched
    layouts is a silent-corruption class of bug)."""
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_name").alias("label"), F.col("n_nationkey").alias("k")
    )
    r = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.col("r_name").alias("label")
    )
    return n.unionByName(r).select("k", "label")


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
      SELECT c_custkey, CASE WHEN c_nationkey % 7 = 3 THEN NULL
                             ELSE c_nationkey END AS nk
      FROM customer),
    b AS (
      SELECT s_suppkey, CASE WHEN s_nationkey % 5 = 2 THEN NULL
                             ELSE s_nationkey END AS nk
      FROM supplier)
    SELECT a.c_custkey, b.s_suppkey
    FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
    """,
    tags=("join", "nullsafe"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing — the semantic corner
    plain equi-joins silently drop. Synthetic NULLs are planted on
    both sides. Note the scale hazard this demonstrates: all NULLs
    hash to one reducer (it is a join *key value*), so a NULL-heavy
    null-safe join needs the salting primitives."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_nationkey") % 7 == 3, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_nationkey") % 5 == 2, None)
        .otherwise(F.col("s_nationkey"))
        .alias("nk"),
    )
    return c.join(s, c.nk.eqNullSafe(s.nk)).select("c_custkey", "s_suppkey")


@register(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           bit_or(CAST(l_linenumber AS BIGINT)) AS flags_or,
           bit_and(CAST(l_linenumber AS BIGINT)) AS flags_and,
           bit_xor(CAST(l_orderkey AS BIGINT)) AS keys_xor
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (or/and/xor) — order-independent by
    construction, so exact cross-engine. XOR over keys doubles as a
    cheap order-insensitive checksum idiom."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_or(CAST(l_linenumber AS BIGINT))").alias("flags_or"),
        F.expr("bit_and(CAST(l_linenumber AS BIGINT))").alias("flags_and"),
        F.expr("bit_xor(CAST(l_orderkey AS BIGINT))").alias("keys_xor"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list flattened deterministically: array order after a
    shuffle is nondeterministic, so any collected array MUST be
    sorted (or the collection expressed as sort-by within group)
    before leaving the operator — pinned here as the idiom."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
            "nations"
        )
    )


@register(
    "sort_global_order",
    oracle="""
    SELECT event_id, ts, user_id
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY ts, event_id
    """,
    tags=("sort", "global"),
)
def sort_global_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY without a limit: plans as a range-partitioning
    exchange (sampled split points) + per-partition sort — the
    distributed total order, distinct from top-k's
    TakeOrderedAndProject. The (ts, event_id) key is a total order so
    output is deterministic."""
    from ..session import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "user_id"
        )
        .orderBy("ts", "event_id")
    )


@register(
    "agg_robust_mad",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events),
    med AS (
      SELECT event_type, quantile_cont(v_c, 0.5) AS med_c
      FROM v GROUP BY event_type),
    dev AS (
      SELECT v.event_type, v.v_c, med.med_c,
             abs(v.v_c - med.med_c) AS d
      FROM v JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad_c,
             CAST(SUM(d) AS DOUBLE) / COUNT(*) AS meanad_c
      FROM dev GROUP BY event_type)
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ANY_VALUE(dev.med_c) / 100.0 AS median_val,
           ANY_VALUE(mad.mad_c) / 100.0 AS mad_val,
           CAST(SUM(CASE WHEN
                  (CASE
                     WHEN mad.mad_c > 0 THEN
                       abs((0.6745 * (dev.v_c - dev.med_c))
                           / mad.mad_c)
                     WHEN mad.meanad_c > 0 THEN
                       abs((dev.v_c - dev.med_c)
                           / (1.253314 * mad.meanad_c))
                     ELSE 0.0
                   END) > 3.5
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
    tags=("agg", "robust", "outlier", "percentile"),
    since=8,
)
def agg_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier statistics per event type: median, MAD (median
    absolute deviation), and the count of modified-z outliers
    (Iglewicz-Hoaglin: |0.6745*(x-med)/MAD| > 3.5) — the
    quality-filter statistic that survives the heavy-tailed value
    distributions where mean/stddev z-scores (`anomaly_value_zscore`)
    drown: one extreme row shifts a mean arbitrarily but moves a
    median by at most one rank.

    Exactness: values quantize to int64 cents, medians are exact
    interpolated order statistics (Spark `percentile` == DuckDB
    `quantile_cont`, the verified idiom), deviations stay exact
    doubles (< 2^53), and the z expression mirrors token-for-token.
    Degenerate-MAD guard (Iglewicz-Hoaglin's own rule): when >= 50%
    of a group's values are identical, MAD = 0 and the plain
    modified-z is undefined — fall back to the meanAD form
    |x - med| / (1.253314 * meanAD); if meanAD is also 0 the group
    is constant and has no outliers. meanAD is an exact int64 sum
    with ONE IEEE division, so both engines agree bit-for-bit.
    Shape: three scans chained through 5-row broadcast joins — the
    group cardinality (event types) bounds every intermediate."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("v_c")
    )
    med = e.groupBy("event_type").agg(
        F.expr("percentile(v_c, 0.5)").alias("med_c")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("v_c") - F.col("med_c"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("mad_c"),
        (
            F.sum("d").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("meanad_c"),
    )
    z = (
        F.when(
            F.col("mad_c") > 0,
            F.abs(
                (F.lit(0.6745) * (F.col("v_c") - F.col("med_c")))
                / F.col("mad_c")
            ),
        )
        .when(
            F.col("meanad_c") > 0,
            F.abs(
                (F.col("v_c") - F.col("med_c"))
                / (F.lit(1.253314) * F.col("meanad_c"))
            ),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.any_value("med_c") / F.lit(100.0)).alias("median_val"),
            (F.any_value("mad_c") / F.lit(100.0)).alias("mad_val"),
            F.sum(F.when(z > 3.5, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )
