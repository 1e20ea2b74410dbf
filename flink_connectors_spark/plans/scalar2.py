"""Scalar coverage, wave 2: array and map functions, explode/lateral
views, Python vectorized UDF / grouped-agg UDF / UDTF entries.

Array/map *outputs* are flattened to strings or sizes in the final
projection — the cross-engine hash compares scalars, and DuckDB's
list rendering differs from Spark's.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..session import load_table


@register(
    "scalar_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id,
                      string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
               FROM documents)
    SELECT doc_id,
           len(w) AS n_words,
           array_to_string(list_sort(list_distinct(w))[1:5], ',') AS first5_sorted,
           array_to_string(list_reverse(list_sort(list_distinct(w)))[1:3], ',') AS last3_sorted,
           CASE WHEN list_contains(w, 'spark') THEN TRUE ELSE FALSE END AS has_spark,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(w), x -> length(x) > 5)), ','), '') AS long_words,
           array_to_string(list_transform(list_sort(list_distinct(w))[1:3], x -> upper(x)), ',') AS first3_upper
    FROM t
    """,
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, sort, distinct, slice, reverse, contains,
    filter, transform — all higher-order JVM functions."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")), " "
        ).alias("w"),
    )
    dw = F.array_sort(F.array_distinct(F.col("w")))
    return t.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.concat_ws(",", F.slice(dw, 1, 5)).alias("first5_sorted"),
        F.concat_ws(",", F.slice(F.reverse(dw), 1, 3)).alias("last3_sorted"),
        F.array_contains("w", "spark").alias("has_spark"),
        F.concat_ws(
            ",",
            F.array_sort(F.filter(F.array_distinct("w"), lambda x: F.length(x) > 5)),
        ).alias("long_words"),
        F.concat_ws(
            ",", F.transform(F.slice(dw, 1, 3), lambda x: F.upper(x))
        ).alias("first3_upper"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_from_map,
           'k' AS map_keys_joined,
           1 AS n_entries
    FROM events
    """,
    tags=("scalar", "map"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: parse JSON into map<string,int>, then
    map_keys/values/size/element access."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        m.getItem("k").alias("k_from_map"),
        F.concat_ws(",", F.map_keys(m)).alias("map_keys_joined"),
        F.size(m).alias("n_entries"),
    )


@register(
    "lateral_explode_tokens",
    oracle="""
    WITH t AS (SELECT doc_id,
                      unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
               FROM documents)
    SELECT tok, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM t GROUP BY tok
    """,
    tags=("scalar", "explode", "agg"),
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode() lateral view -> corpus-wide token frequencies (the
    word-count shape: one narrow explode, one shuffle on token)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")), " ")
        ).alias("tok"),
    )
    return toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           length(text) - length(replace(text, ' ', '')) + 1 AS vec_token_count,
           CASE WHEN length(text) >= 100 THEN 'long' ELSE 'short' END AS vec_length_band
    FROM documents
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) scalar Pandas UDF — the sanctioned shape for
    Python logic: batch-at-a-time pandas ops, no per-row interpreter
    crossings. Oracle mirrors the exact arithmetic."""

    @pandas_udf("int")
    def tok_count(s: pd.Series) -> pd.Series:
        return s.str.count(" ").astype("int32") + 1

    @pandas_udf("string")
    def length_band(s: pd.Series) -> pd.Series:
        return pd.Series(
            ["long" if n >= 100 else "short" for n in s.str.len()]
        )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tok_count("text").alias("vec_token_count"),
        length_band("text").alias("vec_length_band"),
    )


@register(
    "udaf_pandas_grouped",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) - MIN(n_chars) AS BIGINT) AS char_range
    FROM documents GROUP BY lang
    """,
    tags=("udf", "pandas", "agg"),
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDAF via applyInPandas: per-group pandas
    frame in, one aggregate row out (integer math -> oracle-exact)."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(pdf["n_chars"].sum())],
                "char_range": [int(pdf["n_chars"].max() - pdf["n_chars"].min())],
            }
        )

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").applyInPandas(
        agg, "lang string, n_docs bigint, total_chars bigint, char_range bigint"
    )


@register(
    "udtf_char_histogram",
    oracle="""
    WITH t AS (SELECT source, length(text) AS n FROM documents)
    SELECT source,
           CASE WHEN n < 150 THEN 'small'
                WHEN n < 350 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_docs
    FROM t GROUP BY source, bucket
    """,
    tags=("udf", "udtf"),
)
def udtf_char_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape (one input row -> one bucketed output row,
    then aggregate). Uses mapInPandas as the UDTF mechanism — Arrow
    batches, multiple output rows per batch allowed."""
    from collections.abc import Iterator

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["text"].str.len()
            yield pd.DataFrame(
                {
                    "source": pdf["source"],
                    "bucket": pd.cut(
                        n,
                        bins=[-1, 149, 349, 10**9],
                        labels=["small", "medium", "large"],
                    ).astype(str),
                }
            )

    d = load_table(spark, sf_dir, "documents")
    buckets = d.mapInPandas(bucketize, "source string, bucket string")
    return buckets.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus, TRUE AS within_bound
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the at-scale form of
    COUNT(DISTINCT): no expand, single pass, mergeable sketches. The
    HLL estimate itself is engine-private, so the checkable output is
    an error-bound predicate: |approx - exact| / exact < 0.05,
    computed inside the query (rsd=0.01, so 5% is a wide margin).
    The oracle asserts the bound holds for every group; exact-count
    parity is separately covered by agg_distinct_count."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .select(
            "o_orderstatus",
            (
                F.abs(F.col("approx") - F.col("exact"))
                / F.col("exact").cast("double")
                < 0.05
            ).alias("within_bound"),
        )
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag, TRUE AS p50_within, TRUE AS p95_within
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "percentile"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch-based quantile for interactive
    100 TB use (bounded memory, mergeable, no global sort). Sketch
    values are engine-private, so the checkable output is a relative
    error-bound predicate per quantile (approx within 5% of the exact
    interpolated percentile), asserted by the oracle for every group.
    Exact-quantile parity is covered by agg_percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)"
        ).alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("ex"),
    )

    def within(i: int):
        a, e = F.col("ap").getItem(i), F.col("ex").getItem(i)
        return F.abs(a - e) / e < 0.05

    return agged.select(
        "l_returnflag",
        within(0).alias("p50_within"),
        within(1).alias("p95_within"),
    )


@register(
    "grouped_map_demean",
    oracle="""
    SELECT event_id, event_type,
           CAST(CAST(round(value * 100) AS BIGINT) * n - s AS DOUBLE)
             / (100.0 * n) AS demeaned
    FROM (
      SELECT event_id, event_type, value,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY event_type) AS s
      FROM events) t
    """,
    tags=("udf", "pandas", "grouped_map"),
)
def grouped_map_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped map): demean `value` within each event
    type. The UDF does the centering in exact integer hundredths
    (value_cents * n - sum_cents, one float division at the end) so
    the result is order-independent and bit-matches the SQL oracle —
    the discipline any numeric Pandas UDF needs to be testable."""
    import pandas as pd

    from ..session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 100).round().astype("int64")
        n = len(pdf)
        s = int(cents.sum())
        out = (cents * n - s).astype("float64") / (100.0 * n)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "demeaned": out,
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        demean, "event_id bigint, event_type string, demeaned double"
    )
