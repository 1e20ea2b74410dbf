"""Relational coverage, wave 4: unpivot/melt, regression & correlation
aggregates from exact sufficient statistics, boolean aggregates +
median, positional explode (ordinality), and URL parsing / printf
formatting.

All host-engine surface per SURVEY.md §2.2 (the reference delegates the
entire relational layer to the Flink SQL planner, `pom.xml:60-72`;
these are the Spark-native equivalents the sink assumes upstream).

Determinism notes follow `plans/_util.py`: float aggregates are built
from exact decimal sufficient statistics cast to double, and any
derived expression (slope/corr) is written with the *same* operation
order on both engines — IEEE doubles then round identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from ._util import dec, dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "unpivot_lineitem_charges",
    oracle="""
    SELECT l_orderkey, l_linenumber, charge, amount
    FROM (UNPIVOT (SELECT l_orderkey, l_linenumber,
                          l_extendedprice, l_discount, l_tax
                   FROM lineitem WHERE l_shipdate >= DATE '1998-11-01')
          ON l_extendedprice, l_discount, l_tax
          INTO NAME charge VALUE amount)
    """,
    tags=("unpivot", "reshape"),
)
def unpivot_lineitem_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape (melt): three charge columns become
    (charge, amount) pairs. Narrow Expand node, no shuffle — the
    inverse of `pivot_daily_event_values`. Values pass through from
    the scan untouched, so they hash-match without decimal staging."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= "1998-11-01")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "charge",
            "amount",
        )
    )


@register(
    "agg_corr_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
           round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
    FROM s
    """,
    tags=("agg", "stats", "regression"),
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope/intercept and Pearson correlation of
    quantity vs extended price per return flag.

    Native corr()/regr_slope() sum doubles in engine-specific order and
    never hash-match cross-engine; instead the five sufficient
    statistics are accumulated as *exact* decimals (order-independent),
    cast once to double, and combined in an identical expression on
    both engines; the final round(_, 6) absorbs the one remaining
    divergence — DuckDB's DECIMAL->DOUBLE cast double-rounds
    (int128 -> double -> /10^scale) where Spark single-rounds, a
    1-ulp difference observed at sf0.001. One shuffle (partial ->
    final agg), derivation is a free post-projection. Decimal sums stay exact through ~SF1000
    (38-digit headroom), mirroring `_util.cents`' domain note."""
    li = _t(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
    )


@register(
    "agg_boolean_median",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
           bool_or(o_totalprice > 400000) AS any_huge,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           median(o_totalprice) AS median_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "boolean"),
)
def agg_boolean_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (count_if / bool_or / bool_and) plus
    exact median. Both engines interpolate the two middle values with
    lower + (upper-lower)*frac on doubles, which is bit-identical for
    identical inputs (verified by hex comparison); DECIMAL staging
    would NOT work here — DuckDB's decimal median is discrete-lower
    while Spark's interpolates. Boolean aggs are cheap
    partial-aggregable counters — map-side combine keeps the shuffle
    tiny; exact median is the expensive one (full value shuffle)."""
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(price > 150000).alias("n_big"),
        F.bool_or(price > 400000).alias("any_huge"),
        F.bool_and(price > 1000).alias("all_over_1k"),
        F.median("o_totalprice").alias("median_price"),
    )


@register(
    "agg_histogram_prices",
    oracle="""
    SELECT CAST(least(floor(l_extendedprice / 10000.0), 10) AS INT) AS bucket,
           COUNT(*) AS n_items,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def agg_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = floor(price / width) with a
    top catch-all — the binning shape behind distribution dashboards
    and quantile pre-aggregation. Expressed as integer floor math
    (identical on both engines) rather than width_bucket(), which
    DuckDB lacks; one partial-aggregated shuffle on ~11 keys. At
    100 TB the map-side combine reduces each partition to <=
    n_buckets rows before the exchange."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_extendedprice") / F.lit(10000.0)), F.lit(10)
    ).cast("int")
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "lateral_posexplode_tokens",
    oracle="""
    SELECT doc_id, CAST(g.pos AS INT) - 1 AS pos, d.toks[g.pos] AS tok
    FROM (SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
          FROM documents WHERE doc_id % 20 = 0) d,
         LATERAL (SELECT unnest(generate_series(1, len(d.toks))) AS pos) g
    """,
    tags=("scalar", "explode", "ordinality"),
)
def lateral_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — explode WITH ORDINALITY: token position survives
    the flatten, the input order any sequence-labeling / chunking
    pipeline needs. Narrow generator node, no shuffle; position is
    computed during generation, not by a window afterward (a
    row_number() rebuild would force a sort per document)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")), " ")
    return d.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")


@register(
    "scalar_url_format_funcs",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1) AS url_host,
           regexp_extract(url, 'https?://[^/]+([^?]*)', 1) AS url_path,
           regexp_extract(url, '\?(.*)$', 1) AS url_query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS url_lang,
           printf('%s-%04d', source, doc_id) AS doc_slug,
           CAST(round(n_chars * 100 / 1024.0) AS BIGINT) AS size_centikb
    FROM (SELECT *,
                 concat('https://', source, '.example.com/docs/', doc_id,
                        '?lang=', lang, '&v=2') AS url
          FROM documents)
    """,
    tags=("scalar", "url", "format"),
)
def scalar_url_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction (parse_url HOST/PATH/QUERY + keyed
    query param) and printf-style formatting (format_string). The URL
    is synthesized from table columns so the round-trip is verifiable;
    the oracle mirrors parse_url with anchored regexes. All JVM
    expressions inside whole-stage codegen. Float printf (%.2f) is
    deliberately absent: Java's Formatter (HALF_UP) and DuckDB's fmt
    round borderline doubles differently — fixed-point labels go
    through integer arithmetic instead (size_centikb)."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY")).alias("url_query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("url_lang"),
        F.format_string("%s-%04d", "source", "doc_id").alias("doc_slug"),
        F.round(F.col("n_chars") * 100 / F.lit(1024.0))
        .cast("long")
        .alias("size_centikb"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    SELECT user_id, event_type AS top_event, n AS n_events
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type) t
    WHERE rn = 1
    """,
    tags=("agg", "mode", "argmax"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key mode with a DETERMINISTIC tie-break (count desc, then
    value asc) — engines' native mode() picks ties arbitrarily, which
    makes it untestable cross-engine; the two-level aggregate +
    row_number formulation is the reproducible argmax every pipeline
    report should use. Two keyed shuffles, both with map-side partial
    aggregation."""
    from pyspark.sql import Window

    from ..session import load_table

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.col("event_type").alias("top_event"),
            F.col("n").alias("n_events"),
        )
    )


@register(
    "pipeline_snapshot_changelog",
    oracle=r"""
    WITH old AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp FROM documents
      WHERE doc_id % 7 <> 0),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 0
                      THEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) || ' v2' ELSE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) END) AS fp
      FROM documents WHERE doc_id % 3 <> 0)
    SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'I'
                WHEN n.doc_id IS NULL THEN 'D'
                ELSE 'UA' END AS op,
           n.fp AS fp
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp
    """,
    tags=("pipeline", "changelog", "cdc", "sink"),
)
def pipeline_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff -> changelog: compare two corpus snapshots by
    content fingerprint and emit the I/UA/D op rows the sink's
    changelog modes consume — the batch CDC producer that turns
    nightly corpus rebuilds into incremental sink writes (full
    refresh of a 100 TB corpus table vs shipping only the delta).
    One full-outer join on the id, fingerprints compared in place;
    unchanged docs drop out. Here the 'old' snapshot is doc_id%7!=0
    and the 'new' one is doc_id%3!=0 with every 5th doc edited."""
    from ..functions import normalize_text
    from ..session import load_table

    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    old = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5(norm).alias("fp")
    )
    new = d.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 5 == 0, F.concat(norm, F.lit(" v2")))
            .otherwise(norm)
        ).alias("fp"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    op = (
        F.when(F.col("o.doc_id").isNull(), "I")
        .when(F.col("n.doc_id").isNull(), "D")
        .otherwise("UA")
    )
    return (
        joined.filter(
            F.col("o.doc_id").isNull()
            | F.col("n.doc_id").isNull()
            | (F.col("o.fp") != F.col("n.fp"))
        )
        .select(
            F.coalesce(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_id"),
            op.alias("op"),
            F.col("n.fp").alias("fp"),
        )
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "bitmap", "distinct", "mergeable"),
    since=4,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counts via Spark's bitmap aggregate surface
    (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count) — the
    ClickHouse/Doris bitmap-index pattern the reference's ecosystem
    leans on for distinct-heavy rollups. Why it matters at 100 TB:
    the per-(group, bucket) bitmaps are ADDITIVE summaries — the
    first aggregate map-side-combines values into 32k-bit buckets,
    the second ORs bucket bitmaps, so the shuffle carries
    groups x occupied-buckets fixed-size rows instead of one row per
    distinct value (count_distinct's expand), and yesterday's bitmaps
    merge with today's by OR exactly like the rollup sketches —
    except bit-exact, which is why the oracle is plain
    COUNT(DISTINCT): equality IS the exactness proof.

    Shape subtlety (found the hard way): bit POSITIONS repeat across
    buckets, so ``bitmap_or_agg`` may only merge bitmaps of the SAME
    bucket (the nightly OR-merge path: OR per (group, bucket) across
    days' bitmaps); a per-group total is SUM of per-bucket
    bitmap_counts, and each counted column needs its OWN bucket
    grouping — bucketing two columns in one groupBy replicates a
    value's bit across the other column's buckets and double-counts
    under SUM."""
    li = load_table(spark, sf_dir, "lineitem")

    def per_group_distinct(col: str, out: str) -> DataFrame:
        return (
            li.groupBy(
                "l_returnflag",
                F.expr(f"bitmap_bucket_number({col})").alias("__b__"),
            )
            .agg(
                F.expr(
                    f"bitmap_construct_agg(bitmap_bit_position({col}))"
                ).alias("__bm__")
            )
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.expr("bitmap_count(__bm__)"))
                .cast("long")
                .alias(out)
            )
        )

    supp = per_group_distinct("l_suppkey", "n_suppliers")
    part = per_group_distinct("l_partkey", "n_parts")
    return supp.join(part, "l_returnflag")


@register(
    "join_range_lookup_broadcast",
    oracle="""
    WITH brackets(label, lo, hi) AS (
      VALUES ('small', 0, 50000), ('medium', 50000, 150000),
             ('large', 150000, 1000000000)),
    bucketed AS (
      SELECT b.label, o.o_totalprice
      FROM orders o JOIN brackets b
        ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total_value
    FROM bucketed GROUP BY label
    """,
    tags=("join", "range", "broadcast", "lookup"),
    since=4,
)
def join_range_lookup_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-lookup join: every order priced into a bracket from a
    tiny [lo, hi) dimension — the IP-to-geo / tax-bracket / SLA-tier
    shape. The bracket table BROADCASTS, so the fact side is scanned
    once with a per-row range probe and never shuffles (the theta
    join never becomes a cartesian against a big side); the aggregate
    on top is int64-cents exact. At 100 TB the only cost is the scan
    — the lookup rides inside it."""
    o = load_table(spark, sf_dir, "orders")
    brackets = spark.createDataFrame(
        [("small", 0, 50_000), ("medium", 50_000, 150_000),
         ("large", 150_000, 1_000_000_000)],
        "label string, lo long, hi long",
    )
    priced = o.join(
        F.broadcast(brackets),
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi")),
    )
    return priced.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("total_value"),
    )


@register(
    "join_ivm_delta",
    oracle="""
    WITH
    a_old AS (SELECT * FROM orders   WHERE o_orderdate < DATE '2001-06-01'),
    b_old AS (SELECT * FROM lineitem WHERE l_shipdate  < DATE '2001-06-01'),
    jn AS (
      SELECT o.o_orderpriority,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    jo AS (
      SELECT o.o_orderpriority,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM a_old o JOIN b_old l ON l.l_orderkey = o.o_orderkey),
    agg_new AS (
      SELECT o_orderpriority, COUNT(*) AS n, SUM(cents) AS s
      FROM jn GROUP BY 1),
    agg_old AS (
      SELECT o_orderpriority, COUNT(*) AS n, SUM(cents) AS s
      FROM jo GROUP BY 1)
    SELECT n2.o_orderpriority,
           CAST(n2.n - coalesce(o2.n, 0) AS BIGINT) AS delta_rows,
           CAST(n2.s - coalesce(o2.s, 0) AS BIGINT) AS delta_cents
    FROM agg_new n2 LEFT JOIN agg_old o2 USING (o_orderpriority)
    WHERE n2.n - coalesce(o2.n, 0) <> 0
    """,
    tags=("join", "incremental", "ivm", "cdc"),
    since=4,
)
def join_ivm_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN: with insert-only
    deltas dA (new orders) and dB (new lineitems) against standing
    snapshots A and B, the join's delta is the classic three-term
    expansion  dA><B  UNION ALL  A><dB  UNION ALL  dA><dB  — cost
    proportional to |delta|, never a re-join of the snapshots. The
    oracle computes the SAME quantity the expensive way — full
    new-state join minus full old-state join, group by group — so
    the green row proves delta-maintenance == recompute exactly
    (the aggregate-IVM proof pattern extended to joins; completes
    the incremental story next to merge_aggregate_delta and
    pipeline_cdc_apply).

    Scale shape: both delta terms BROADCAST the delta side against
    the standing snapshot (the whole point of IVM — the snapshot
    never shuffles), and the dA><dB term is delta-sized on both
    sides. Exact int64 cents keep the sums order-free."""
    cut = F.lit("2001-06-01").cast("date")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a_old = o.filter(F.col("o_orderdate") < cut)
    da = o.filter(F.col("o_orderdate") >= cut)
    b_old = li.filter(F.col("l_shipdate") < cut)
    db = li.filter(F.col("l_shipdate") >= cut)

    def j(left_o: DataFrame, right_l: DataFrame, bcast: str) -> DataFrame:
        lo, rl = left_o, right_l
        if bcast == "o":
            lo = F.broadcast(lo)
        elif bcast == "l":
            rl = F.broadcast(rl)
        return rl.join(
            lo.select("o_orderkey", "o_orderpriority"),
            rl.l_orderkey == lo.o_orderkey,
        ).select(
            "o_orderpriority",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )

    delta = (
        j(da, b_old, "o")          # dA >< B: broadcast the order delta
        .unionAll(j(a_old, db, "l"))  # A >< dB: broadcast the line delta
        .unionAll(j(da, db, "o"))     # dA >< dB
    )
    return (
        delta.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("delta_rows"),
            F.sum("cents").cast("long").alias("delta_cents"),
        )
        .filter(F.col("delta_rows") != 0)
    )


_OLS_DETS = dict(
    det="nn*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)",
    d0="sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)",
    d1="nn*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)",
    d2="nn*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)",
)


@register(
    "agg_ols_two_features",
    oracle=f"""
    WITH r AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS nn,
             CAST(SUM(x1) AS DOUBLE) AS s1,
             CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
             CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
             CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
             CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(x2 * y) AS DOUBLE) AS s2y
      FROM r GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(nn AS BIGINT) AS n,
           round(({_OLS_DETS["d0"]}) / ({_OLS_DETS["det"]}), 6) AS b0_cents,
           round(({_OLS_DETS["d1"]}) / ({_OLS_DETS["det"]}), 6) AS b1_per_qty,
           round(({_OLS_DETS["d2"]}) / ({_OLS_DETS["det"]}), 6) AS b2_per_disc
    FROM s
    """,
    tags=("agg", "regression", "ml"),
    since=4,
)
def agg_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (price ~ quantity + discount) per return flag,
    solved in closed form from EXACT integer sufficient statistics —
    the multi-feature extension of agg_corr_regression and the
    pattern for in-engine analytics models at 100 TB: ONE map-side-
    combining aggregate ships 9 numbers per group, the 3x3 normal
    equations solve via Cramer's rule as a scalar expression over
    those 9 doubles (written token-identical in both engines, so the
    determinant arithmetic rounds identically), and no second pass
    over the data exists. Features/targets quantize to integer units
    (qty, discount cents, price cents) so the sufficient sums are
    exact in any accumulation order."""
    li = _t(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    s = (
        li.select(
            "l_returnflag",
            x1.alias("x1"),
            x2.alias("x2"),
            y.alias("y"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("nn"),
            F.sum("x1").cast("double").alias("s1"),
            F.sum("x2").cast("double").alias("s2"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
            F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
            F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
            F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
            F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        )
    )
    det = F.expr(_OLS_DETS["det"])
    return s.select(
        "l_returnflag",
        F.col("nn").cast("long").alias("n"),
        F.round(F.expr(_OLS_DETS["d0"]) / det, 6).alias("b0_cents"),
        F.round(F.expr(_OLS_DETS["d1"]) / det, 6).alias("b1_per_qty"),
        F.round(F.expr(_OLS_DETS["d2"]) / det, 6).alias("b2_per_disc"),
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem),
    cum AS (
      SELECT l_returnflag, price_cents, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY price_cents
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM w)
    SELECT l_returnflag,
           CAST(MIN(tw) AS BIGINT) AS total_weight,
           CAST(MIN(price_cents) AS BIGINT) AS weighted_median_cents
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
    tags=("agg", "median", "weighted", "window"),
    since=4,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median (price weighted by quantity) per return
    flag — the robust center for skewed money distributions, defined
    as the lower discrete weighted order statistic: the smallest
    value whose cumulative weight reaches half the total. Pure
    integer arithmetic end-to-end (cents, integer weights, the 2*cw
    >= tw comparison), so the boundary row can never flip across
    engines — no interpolation, no float weights. ONE group-keyed
    shuffle shared by both window frames and the final aggregate;
    at 100 TB a skewed group's window sort is the cost, and the
    mergeable-quantile-histogram rollup is the documented
    approximation escape."""
    li = _t(spark, sf_dir, "lineitem")
    from pyspark.sql.window import Window as W

    w = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    cum = w.select(
        "l_returnflag",
        "price_cents",
        F.sum("wt")
        .over(
            W.partitionBy("l_returnflag")
            .orderBy("price_cents")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cw"),
        F.sum("wt").over(W.partitionBy("l_returnflag")).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("tw").cast("long").alias("total_weight"),
            F.min("price_cents").cast("long").alias(
                "weighted_median_cents"
            ),
        )
    )


@register(
    "agg_skew_kurtosis_exact",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag),
    m AS (
      SELECT l_returnflag, n,
             s1 / n AS m1,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3.0 * (s1 / n) * (s2 / n)
                    + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4.0 * (s1 / n) * (s3 / n)
                    + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)
               AS m4
      FROM s)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round(m1, 6) AS mean_qty,
           round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM m
    """,
    tags=("agg", "moments", "stats"),
    since=4,
)
def agg_skew_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per group from EXACT integer
    power sums (sum x..sum x^4 stay in int64 for quantity's domain)
    — completing the moment ladder the corr/regression aggregates
    started. Spark's skewness()/kurtosis() builtins accumulate
    floats in partition order and can't hash-match an oracle; this
    reformulation makes higher moments deterministic the same way
    the exact-cents SUM did for money: one map-side-combining
    aggregate, then central-moment algebra written token-identically
    in both engines (m2/m3/m4 expanded around s_k / n)."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n - m1 * m1
    m3 = F.col("s3") / n - F.lit(3.0) * m1 * (F.col("s2") / n) + F.lit(
        2.0
    ) * m1 * m1 * m1
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * m1 * (F.col("s3") / n)
        + F.lit(6.0) * m1 * m1 * (F.col("s2") / n)
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round(m1, 6).alias("mean_qty"),
        F.round(
            m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)), 6
        ).alias("skewness"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("excess_kurtosis"),
    )
