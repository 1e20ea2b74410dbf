"""Scalar coverage, wave 3: regex family and cryptographic hash
functions — both pure JVM expressions inside whole-stage codegen
(plan-shape guarded like the other scalar families).

Hash parity note: md5 and sha2-256 produce identical digests in every
engine (the algorithms are specifications); sha1/crc32 exist in Spark
but not DuckDB, so the oracle-checked set is md5 + sha256 and the
hex-prefix-to-bigint bridge used by the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table


@register(
    "scalar_regex_funcs",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '^(\w+)', 1) AS first_word,
           len(regexp_extract_all(text, '[aeiou]{2,}')) AS n_vowel_runs,
           regexp_matches(text, 'spark') AS mentions_spark,
           length(regexp_replace(text, '[aeiou]', '_', 'g')) AS masked_len,
           regexp_extract(source, '([0-9]+)$', 1) AS source_num
    FROM documents
    """,
    tags=("scalar", "regex"),
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract (group), extract_all + count, rlike,
    global replace — all codegen'd JVM expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"[aeiou]{2,}"), 0)).alias(
            "n_vowel_runs"
        ),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.length(F.regexp_replace("text", "[aeiou]", "_")).alias(
            "masked_len"
        ),
        F.regexp_extract("source", r"([0-9]+)$", 1).alias("source_num"),
    )


@register(
    "scalar_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT) AS h_bucket
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5, sha2-256, and the hex-prefix bigint bridge
    (the same construction the dedup/simhash operators rely on)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.conv(F.substring(F.md5("text"), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h_bucket"),
    )


@register(
    "scalar_try_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN CAST(doc_id AS VARCHAR)
               WHEN 1 THEN concat('x', CAST(doc_id AS VARCHAR))
               ELSE NULL END AS s
      FROM documents)
    SELECT doc_id,
           TRY_CAST(s AS INT) AS as_int,
           CAST(n_chars AS DOUBLE) / nullif(CAST(doc_id % 5 AS INT) - 2, 0)
             AS safe_div,
           CASE WHEN doc_id > 0 THEN NULL
                ELSE 9223372036854775807 + doc_id END AS overflow_add
    FROM t
    """,
    tags=("scalar", "try", "nullsafety"),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: try_cast on malformed strings,
    try_divide by zero, try_add at int64 max — NULL instead of
    runtime failure, the ANSI-adjacent behavior batch pipelines need
    to survive dirty data. The oracle emulates with TRY_CAST /
    nullif / a guard CASE (DuckDB errors on real overflow)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            "try_cast(CASE CAST(doc_id % 3 AS INT)"
            " WHEN 0 THEN CAST(doc_id AS STRING)"
            " WHEN 1 THEN concat('x', CAST(doc_id AS STRING))"
            " ELSE NULL END AS INT)"
        ).alias("as_int"),
        F.expr(
            "try_divide(CAST(n_chars AS DOUBLE),"
            " CAST(doc_id % 5 AS INT) - 2)"
        ).alias("safe_div"),
        F.expr("try_add(9223372036854775807, doc_id)").alias(
            "overflow_add"
        ),
    )


@register(
    "lateral_explode_outer",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN []
                  ELSE regexp_extract_all(text, '[a-z]+ing\b') END AS hits
      FROM documents)
    SELECT doc_id, u.hit
    FROM t LEFT JOIN LATERAL unnest(t.hits) AS u(hit) ON TRUE
    """,
    tags=("scalar", "explode", "lateral"),
)
def lateral_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with EMPTY arrays survive with a NULL
    element (plain explode silently drops them — the lateral-join
    analogue of the inner-vs-outer join bug). Every 10th doc's match
    list is emptied to exercise the preserved branch."""
    d = load_table(spark, sf_dir, "documents")
    hits = F.when(
        F.col("doc_id") % 10 == 0, F.array().cast("array<string>")
    ).otherwise(F.regexp_extract_all("text", F.lit(r"[a-z]+ing\b"), 0))
    return d.select(
        "doc_id", F.explode_outer(hits).alias("hit")
    )


@register(
    "scalar_struct_funcs",
    oracle="""
    SELECT doc_id,
           struct_pack(lang := lang, source := source, n := n_chars).lang
             AS s_lang,
           CAST(to_json(struct_pack(lang := lang, n := n_chars))
                AS VARCHAR) AS s_json,
           struct_pack(lang := lang, n := n_chars)
             = struct_pack(lang := lang, n := n_chars) AS s_eq
    FROM documents
    """,
    tags=("scalar", "struct"),
)
def scalar_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT family: construction, field access, JSON serialization
    (byte-identical across engines), struct equality."""
    d = load_table(spark, sf_dir, "documents")
    s3 = F.struct(
        F.col("lang").alias("lang"),
        F.col("source").alias("source"),
        F.col("n_chars").alias("n"),
    )
    s2 = F.struct(F.col("lang").alias("lang"), F.col("n_chars").alias("n"))
    return d.select(
        "doc_id",
        s3.getField("lang").alias("s_lang"),
        F.to_json(s2).alias("s_json"),
        (s2 == s2).alias("s_eq"),
    )


@register(
    "arrow_batch_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           length(text) AS n_chars_exact
    FROM documents
    """,
    tags=("udf", "arrow", "map_in_arrow"),
)
def arrow_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy RecordBatch API (the same boundary
    the Arrow sink writer uses) — per-batch pyarrow.compute kernels,
    no pandas materialization at all. Completes the Python API
    matrix: pandas_udf / applyInPandas / mapInPandas / UDTF /
    mapInArrow."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for rb in batches:
            text = rb.column(rb.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("doc_id")),
                    pc.cast(
                        pc.binary_length(pc.cast(text, pa.binary())),
                        pa.int64(),
                    ),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_chars_exact"],
            )

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInArrow(
        stats, "doc_id bigint, n_bytes long, n_chars_exact long"
    )


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT doc_id,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           rpad(lang, 5, '.') AS lang_padded,
           translate(source, 'src', 'SRC') AS source_up,
           repeat(lang, 2) AS lang2,
           split_part(source, 'c', 2) AS src_num,
           reverse(lang) AS lang_rev,
           ascii(lang) AS first_cp,
           left(text, 10) AS head10,
           right(text, 5) AS tail5
    FROM documents
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family, wave 2: padding, translate, repeat, split_part,
    reverse, ascii, left/right slices."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.rpad("lang", 5, ".").alias("lang_padded"),
        F.translate("source", "src", "SRC").alias("source_up"),
        F.repeat("lang", 2).alias("lang2"),
        F.split_part("source", F.lit("c"), F.lit(2)).alias("src_num"),
        F.reverse("lang").alias("lang_rev"),
        F.ascii("lang").alias("first_cp"),
        F.expr("left(text, 10)").alias("head10"),
        F.expr("right(text, 5)").alias("tail5"),
    )


@register(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
           quarter(o_orderdate) AS q,
           dayofweek(o_orderdate) + 1 AS dow,
           weekofyear(o_orderdate) AS woy,
           CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
             AS days_to_2002
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family, wave 2: last_day, quarter truncation, quarter /
    week numbers, calendar-aware month addition, day difference.
    Engine quirk pinned: DuckDB's dayofweek is 0-based (Sunday=0),
    Spark's is 1-based — the oracle adds 1."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.trunc(d, "quarter").alias("q_start"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("woy"),
        F.add_months(d, 1).alias("next_month"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias(
            "days_to_2002"
        ),
    )


@register(
    "scalar_bit_ops",
    oracle="""
    SELECT doc_id,
           doc_id & 255 AS low_byte,
           doc_id | 4096 AS with_flag,
           xor(doc_id, 21845) AS toggled,
           doc_id << 3 AS shifted_l,
           doc_id >> 2 AS shifted_r
    FROM documents
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bit manipulation: and/or/xor, shifts — the primitives
    under the Morton codes and hash bucketing."""
    d = load_table(spark, sf_dir, "documents")
    i = F.col("doc_id")
    return d.select(
        "doc_id",
        i.bitwiseAND(F.lit(255)).alias("low_byte"),
        i.bitwiseOR(F.lit(4096)).alias("with_flag"),
        i.bitwiseXOR(F.lit(21845)).alias("toggled"),
        F.shiftleft(i, 3).alias("shifted_l"),
        F.shiftright(i, 2).alias("shifted_r"),
    )
