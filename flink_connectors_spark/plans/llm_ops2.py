"""Round-4 operator additions: int8-scan similarity, corpus cluster
census, TF-IDF keyword extraction.

Same discipline as llm_ops: DataFrame-first plans, zero Python UDFs,
every query value-exact against a DuckDB oracle (integer math or
single-operation IEEE float steps only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as T
from ..registry import register
from ..session import read_parquet as _read_pq
from ..session import load_table
from .llm_ops import (
    _BAND,
    _MINHASH_K,
    _PAIRS_CTES,
    _SHINGLES_CTE,
    _WORDS,
    _load,
    _sql_cos,
)


# ---------------------------------------------------------------------------
# Int8-quantized brute-force similarity: the memory-bandwidth scan path
# ---------------------------------------------------------------------------

_SQL_INT8_CODES = """
    v AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
          FROM v),
    codes AS (
      SELECT vec_id,
             list_transform(v, x ->
               greatest(-127.0, least(127.0, round(x / scale)))) AS codes
      FROM s WHERE scale > 0)
"""


def _sql_idot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> p[1] * p[2])) AS BIGINT)"
    )


@register(
    "similarity_topk_int8",
    oracle=f"""
    WITH {_SQL_INT8_CODES},
    q AS (SELECT vec_id AS query_id, codes AS qc
          FROM codes WHERE vec_id < 20),
    n AS (SELECT vec_id AS neighbor_id, codes AS cc FROM codes),
    scored AS (
      SELECT q.query_id, n.neighbor_id,
             round({_sql_idot("q.qc", "n.cc")}
                   / (sqrt({_sql_idot("q.qc", "q.qc")})
                      * sqrt({_sql_idot("n.cc", "n.cc")})), 6) AS score
      FROM n CROSS JOIN q
      WHERE n.neighbor_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, score, rnk FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "quantization"),
    since=4,
)
def similarity_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine over the int8-QUANTIZED embedding store — the scan
    path that reads 1/4 the bytes at 100 TB (per-vector symmetric
    scales cancel out of cosine, so the codes alone carry the
    geometry; quantization noise relative to float32 is audited by
    embedding_quantize_error + the recall audit). Dot products and
    norms are exact integer math on the codes; one float division per
    pair."""
    emb = _load(spark, sf_dir, "embeddings")
    return S.cosine_topk_int8(emb.filter(emb.vec_id < 20), emb, k=5)


# ---------------------------------------------------------------------------
# Near-dup cluster census: the corpus-health report over dedup_clusters
# ---------------------------------------------------------------------------


@register(
    "dedup_cluster_census",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    labels AS (
      SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a),
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY cluster_id)
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY cluster_size
    """,
    tags=("llm", "dedup", "clustering", "census", "iterative"),
    since=4,
    changed=13,
)
def dedup_cluster_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster SIZE census — the dedup-health histogram
    (cluster_size, n_clusters) a curation run reads before choosing
    thresholds: a fat tail of giant clusters means template spam, all
    size-2 means near-exact mirrors. Derived from the same LSH pairs
    + min-label components as dedup_clusters; two summary-sized
    aggregates on top, so the census costs nothing beyond the
    clustering it audits. Oracle recomputes components via a
    recursive transitive-closure CTE. r11: pairs come from the
    persisted text pair artifact (one pushed-filter scan)."""
    from .llm_ops import _minhash_pairs_artifact_path

    pairs = D.read_minhash_pairs(
        spark, _minhash_pairs_artifact_path(spark, sf_dir), threshold=0.5
    )
    comp = D.connected_components(pairs)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    toks AS (SELECT doc_id, unnest(w) AS token FROM w WHERE len(w) >= 1),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, token),
    dfq AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY token),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM toks),
    scoredq AS (
      SELECT tf.doc_id, tf.token,
             round(CAST(tf.tf AS DOUBLE)
                   * ln(CAST((SELECT n FROM nd) AS DOUBLE)
                        / CAST(dfq.df AS DOUBLE)), 6) AS tfidf
      FROM tf JOIN dfq USING (token)),
    ranked AS (
      SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS rnk
      FROM scoredq)
    SELECT doc_id, token, tfidf, rnk FROM ranked WHERE rnk <= 3
    """,
    tags=("llm", "text", "tfidf", "keywords"),
    since=4,
    changed=13,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords — the classic salient-term
    extraction a corpus browser / topic sampler runs at scale.

    r12: tf IS the corpus_grams artifact's ``tokens`` relation (per-
    doc token counts, stored); df and the doc count fold over those
    already-distinct (doc, token) rows — count(*) per token equals
    the live countDistinct(doc_id) because the stored relation holds
    exactly one row per (doc, token). No tokenize/explode in the
    probe; the tf->df join stays merge-pinned (both sides descend
    from the same artifact scan), the doc count broadcasts, and the
    idf log is one libm call on an exact small-integer ratio —
    IEEE-identical across engines. The oracle replays the live
    tokenize pipeline."""
    from .llm_ops import _corpus_grams_artifact_path

    path = _corpus_grams_artifact_path(spark, sf_dir)
    toks = T.read_corpus_grams(spark, path, "tokens")
    tf = toks.select("doc_id", "token", "tf")
    dfq = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    nd = toks.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    scored = (
        tf.hint("merge")
        .join(dfq.hint("merge"), "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis keys)
# ---------------------------------------------------------------------------


@register(
    "pipeline_weighted_sample",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
             (CAST(concat('0x',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 12))
               AS BIGINT) + 1) / 281474976710656.0 AS u
      FROM documents WHERE n_chars > 0),
    keyed AS (
      SELECT doc_id, source, round(-ln(u) / w, 6) AS sample_key
      FROM base)
    SELECT doc_id, source, sample_key
    FROM keyed ORDER BY sample_key, doc_id LIMIT 200
    """,
    tags=("llm", "pipeline", "sampling", "weighted"),
    since=4,
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-proportional weighted sampling WITHOUT replacement via
    Efraimidis-Spirakis exponential keys: each doc draws a
    deterministic md5-uniform u and competes on -ln(u)/w (w = its
    char count), and the global smallest-key 200 are exactly a
    weighted sample without replacement — the token-budget-
    proportional subcorpus draw a pretraining mix needs, reproducible
    across runs AND engines (no RNG state; the one libm ln is
    IEEE-stable on an exact integer-derived ratio).

    Scale shape: a narrow per-row projection (no shuffle) followed by
    a global top-k — Spark plans TakeOrderedAndProject, so every
    partition ships only its local 200 candidates, never the corpus.
    """
    d = _load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            + 1
        ).cast("double")
        / F.lit(281474976710656.0)
    )
    key = F.round(-F.log(u) / F.col("n_chars").cast("double"), 6)
    return (
        d.select("doc_id", "source", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(200)
    )


@register(
    "similarity_recall_int8",
    oracle=f"""
    WITH {_SQL_INT8_CODES},
    q8 AS (SELECT vec_id AS query_id, codes AS qc
           FROM codes WHERE vec_id < 20),
    n8 AS (SELECT vec_id AS neighbor_id, codes AS cc FROM codes),
    i_scored AS (
      SELECT q8.query_id, n8.neighbor_id,
             round({_sql_idot("q8.qc", "n8.cc")}
                   / (sqrt({_sql_idot("q8.qc", "q8.qc")})
                      * sqrt({_sql_idot("n8.cc", "n8.cc")})), 6) AS score
      FROM n8 CROSS JOIN q8
      WHERE n8.neighbor_id <> q8.query_id),
    i8 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM i_scored) t WHERE rnk <= 5),
    bfq AS (SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
    bfc AS (SELECT vec_id AS neighbor_id, embedding AS cvec
            FROM embeddings),
    bf_scored AS (
      SELECT bfq.query_id, bfc.neighbor_id,
             {_sql_cos("bfq.qvec", "bfc.cvec")} AS score
      FROM bfc CROSS JOIN bfq
      WHERE bfc.neighbor_id <> bfq.query_id),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM bf_scored) t WHERE rnk <= 5),
    hits AS (
      SELECT bf.query_id, COUNT(*) AS n_hits
      FROM bf JOIN i8 ON bf.query_id = i8.query_id
                     AND bf.neighbor_id = i8.neighbor_id
      GROUP BY bf.query_id)
    SELECT b.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS DOUBLE)
                 / COUNT(*), 6) AS recall
    FROM bf b LEFT JOIN hits h ON b.query_id = h.query_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "quantization", "qa"),
    since=4,
)
def similarity_recall_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the int8-quantized scan against the exact float32
    brute force, per query — closes the quantized-store story: the
    storage audit (embedding_quantize_error) bounds per-element error,
    THIS bounds the retrieval consequence, and together they are the
    go/no-go for flipping a 100 TB store to int8. Both sides and the
    audit joins are result-sized; at scale the exact side runs over a
    query sample."""
    from ..operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_int8,
        topk_recall_audit,
    )

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id < 20)
    exact = cosine_topk_bruteforce(q, emb, k=5)
    approx = cosine_topk_int8(q, emb, k=5)
    return topk_recall_audit(exact, approx, k=5)


@register(
    "text_top_boilerplate_spans",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    dfq AS (
      SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
      FROM ex GROUP BY shingle HAVING COUNT(*) >= 2),
    ranked AS (
      SELECT shingle, df,
             ROW_NUMBER() OVER (ORDER BY df DESC, shingle) AS rnk
      FROM dfq)
    SELECT shingle, df, rnk FROM ranked WHERE rnk <= 20
    """,
    tags=("llm", "text", "boilerplate", "report"),
    since=4,
)
def text_top_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-20 most-repeated 3-gram spans corpus-wide (document
    frequency >= 2) — the report an operator READS before running
    text_boilerplate_strip: it names the exact template strings
    ("click here to subscribe") the strip would delete, with their
    blast radius. One shingle explode + one keyed aggregate; the
    global top-20 is a TakeOrderedAndProject over the aggregate
    (each partition ships 20 candidates), so the report costs one
    shuffle at any corpus size."""
    from ..operators.dedup import with_shingles

    d = _load(spark, sf_dir, "documents")
    sh = with_shingles(d)
    dfq = (
        sh.select("doc_id", F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") >= 2)
    )
    w = Window.orderBy(F.desc("df"), F.asc("shingle"))
    return (
        dfq.orderBy(F.desc("df"), F.asc("shingle"))
        .limit(20)
        .withColumn("rnk", F.row_number().over(w))
        .select("shingle", "df", "rnk")
    )


# ---------------------------------------------------------------------------
# Cross-modality dedup agreement: text LSH vs embedding LSH
# ---------------------------------------------------------------------------

from .llm_ops import _lsh_pairs_cte  # noqa: E402


@register(
    "dedup_modality_agreement",
    changed=13,
    oracle=f"""
    SELECT
      CAST(SUM(CASE WHEN tp.d1 IS NOT NULL AND ep.d1 IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      CAST(SUM(CASE WHEN ep.d1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_text_only,
      CAST(SUM(CASE WHEN tp.d1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_embedding_only
    FROM (WITH {_PAIRS_CTES}
          SELECT d1, d2 FROM pairs) tp
    FULL JOIN (WITH {_lsh_pairs_cte()}
               SELECT id1 AS d1, id2 AS d2 FROM scored
               WHERE score >= 0.4) ep
      ON tp.d1 = ep.d1 AND tp.d2 = ep.d2
    """,
    tags=("llm", "dedup", "qa", "multimodal-agreement"),
    since=4,
)
def dedup_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the TEXT near-dup detector (MinHash-LSH over shingles) and
    the EMBEDDING near-dup detector (sign-LSH over vectors, cosine >=
    0.4) agree? One-row report (n_both, n_text_only,
    n_embedding_only) over the full-outer join of their pair lists —
    the calibration readout that tells a curation run whether
    embeddings are catching paraphrases the text stage misses (or
    hallucinating pairs text disproves) BEFORE either is trusted to
    delete data. Both pair generators are the banded/bucketed
    corpus-scale paths; the agreement join is pair-list-sized, so
    the report costs nothing beyond the two detectors. r11: BOTH
    sides serve from persisted pair artifacts — the embedding side
    from the sign-LSH edge artifact, the text side from the MinHash
    pair artifact — two pair-sized scans instead of two
    per-invocation LSH passes."""
    from .llm_ops import (
        _minhash_pairs_artifact_path,
        _neardup_edges_artifact_path,
    )

    tp = D.read_minhash_pairs(
        spark, _minhash_pairs_artifact_path(spark, sf_dir), threshold=0.5
    ).select("d1", "d2")
    path = _neardup_edges_artifact_path(spark, sf_dir)
    ep = (
        S.read_neardup_edges(spark, path, threshold=0.4)
        .select(F.col("id1").alias("d1"), F.col("id2").alias("d2"))
    )
    j = tp.alias("t").join(
        ep.alias("e"),
        (F.col("t.d1") == F.col("e.d1")) & (F.col("t.d2") == F.col("e.d2")),
        "full_outer",
    )
    return j.agg(
        F.sum(
            (F.col("t.d1").isNotNull() & F.col("e.d1").isNotNull()).cast(
                "long"
            )
        ).alias("n_both"),
        F.sum(F.col("e.d1").isNull().cast("long")).alias("n_text_only"),
        F.sum(F.col("t.d1").isNull().cast("long")).alias("n_embedding_only"),
    )


@register(
    "dedup_repeated_spans",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    wins AS (
      SELECT doc_id, len(w) AS n_tokens, g.pos AS pos,
             concat_ws(' ', w[g.pos], w[g.pos + 1], w[g.pos + 2],
                       w[g.pos + 3], w[g.pos + 4]) AS gram
      FROM docs d,
           LATERAL (SELECT unnest(generate_series(1, len(d.w) - 4)) AS pos) g
      WHERE len(d.w) >= 5),
    repeated AS (
      SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) >= 2),
    dup AS (
      SELECT w.doc_id, w.n_tokens, w.pos
      FROM wins w JOIN repeated r ON w.gram = r.gram),
    lagged AS (
      SELECT doc_id, n_tokens, pos,
             CASE WHEN pos - lag(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) > 5
                  THEN 1 ELSE 0 END AS brk
      FROM dup),
    isl AS (
      SELECT doc_id, n_tokens, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM lagged),
    spans AS (
      SELECT doc_id, n_tokens, island,
             MIN(pos) AS p1, MAX(pos) AS p2
      FROM isl GROUP BY 1, 2, 3)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(p2 - p1 + 5) AS BIGINT) AS dup_tokens,
           round(CAST(SUM(p2 - p1 + 5) AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 6) AS dup_fraction
    FROM spans GROUP BY doc_id, n_tokens
    """,
    tags=("llm", "dedup", "substring", "spans"),
    since=4,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans per document (k=5 token windows
    repeated >= 2x corpus-wide, merged gaps-and-islands) — the
    token-granular form of suffix-array exact-substring dedup.
    Reports per doc: span count, duplicated tokens, duplicated
    fraction. See operators/text.py duplicated_spans for the
    three-exchange scale shape."""
    from ..operators import text as T

    d = _load(spark, sf_dir, "documents")
    return T.duplicated_spans(d, k=5)


@register(
    "text_zipf_alpha",
    oracle=f"""
    WITH toks AS (SELECT unnest({_WORDS}) AS tok FROM documents),
    vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    top AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
      FROM vocab ORDER BY c DESC, tok LIMIT 30),
    pts AS (
      SELECT r, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM top),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             list_sum(list(x ORDER BY r)) AS sx,
             list_sum(list(y ORDER BY r)) AS sy,
             list_sum(list(x * y ORDER BY r)) AS sxy,
             list_sum(list(x * x ORDER BY r)) AS sxx
      FROM pts)
    SELECT CAST(n AS BIGINT) AS n_ranks,
           round(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6) AS zipf_alpha,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept
    FROM s
    """,
    tags=("llm", "text", "stats", "quality"),
    since=4,
    changed=13,
)
def text_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus frequency-rank curve — the
    one-number corpus-health check (natural language sits near
    alpha ~ 1; generated spam, template floods, and truncated
    crawls bend the curve): least-squares slope of ln(count) vs
    ln(rank) over the top-30 ranks. The rank table is a
    TakeOrdered top-30 off the vocabulary aggregate (each partition
    ships 30 candidates), so the whole fit costs one token
    aggregate at any corpus size; the four regression sums fold in
    RANK order on both engines and the slope/intercept expressions
    are written with identical operation order, so the single
    output row value-hash-matches.

    r12: the vocabulary aggregate serves from the corpus_grams
    artifact's ``unigrams`` relation — the fit is a TakeOrdered off
    a vocab-sized parquet scan, corpus-free; the oracle replays the
    live token aggregate."""
    from pyspark.sql.window import Window as W

    from .llm_ops import _corpus_grams_artifact_path

    path = _corpus_grams_artifact_path(spark, sf_dir)
    vocab = T.read_corpus_grams(spark, path, "unigrams").select(
        F.col("word").alias("tok"), F.col("n_w").alias("c")
    )
    top = (
        vocab.orderBy(F.desc("c"), F.asc("tok"))
        .limit(30)
        .withColumn(
            "r", F.row_number().over(W.orderBy(F.desc("c"), F.asc("tok")))
        )
    )
    pts = top.select(
        "r",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct("r", "x", "y"))
    )

    def fold(expr):
        return F.aggregate(arr, F.lit(0.0), expr)

    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        fold(lambda a, p: a + p["x"]).alias("sx"),
        fold(lambda a, p: a + p["y"]).alias("sy"),
        fold(lambda a, p: a + p["x"] * p["y"]).alias("sxy"),
        fold(lambda a, p: a + p["x"] * p["x"]).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round(-slope, 6).alias("zipf_alpha"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Z-order layout effectiveness audit (r7)
# ---------------------------------------------------------------------------

_Z_BITS = 8


def _sql_morton2(r0: str, r1: str, bits: int) -> str:
    """DuckDB bit-interleave of two `bits`-bit ranks — the same
    shift/and/or expansion `operators.scale.morton_code` codegens."""
    terms = []
    for b in range(bits):
        terms.append(f"((({r0} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({r1} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


@register(
    "pipeline_zorder_layout",
    oracle=f"""
    WITH dims AS (
      SELECT user_id AS d0,
             CAST(round(value * 100) AS BIGINT) AS d1
      FROM events),
    b AS (
      SELECT MIN(d0) AS mn0, MAX(d0) AS mx0,
             MIN(d1) AS mn1, MAX(d1) AS mx1
      FROM dims),
    ranked AS (
      SELECT d0, d1,
             CAST(floor((d0 - mn0) * {(1 << _Z_BITS) - 1}
                        / greatest(mx0 - mn0, 1)) AS BIGINT) AS r0,
             CAST(floor((d1 - mn1) * {(1 << _Z_BITS) - 1}
                        / greatest(mx1 - mn1, 1)) AS BIGINT) AS r1
      FROM dims CROSS JOIN b),
    coded AS (
      SELECT d0, d1,
             ({_sql_morton2("r0", "r1", _Z_BITS)}) >> {_Z_BITS} AS zbucket
      FROM ranked)
    SELECT zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(d0) AS min_user, MAX(d0) AS max_user,
           MIN(d1) AS min_cents, MAX(d1) AS max_cents
    FROM coded GROUP BY zbucket
    """,
    tags=("pipeline", "layout", "zorder", "scale"),
    since=7,
)
def pipeline_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit — the per-file min/max report behind
    Delta/Iceberg OPTIMIZE ZORDER, driver-verified: events rows are
    min-max-normalized on (user_id, value-cents), bit-interleaved
    into a Morton code (`operators.scale.morton_code` — the same
    codegen'd key `write_zordered` lays files out by), and grouped
    into 2^8 layout buckets ≈ files. Each bucket's [min, max] spans
    narrow ranges in BOTH dimensions at once — the property that lets
    parquet row-group stats prune a 100 TB scan filtering on EITHER
    column, where a single-column sort prunes only its leading key.
    The normalize/interleave is exact IEEE-step arithmetic (int
    products into one correctly-rounded double division + floor), so
    bucket assignment value-hashes cross-engine; the report is one
    bounded-key shuffle (256 groups)."""
    from ..operators.scale import zorder_layout_audit

    ev = load_table(spark, sf_dir, "events")
    return zorder_layout_audit(
        ev,
        [F.col("user_id"), F.round(F.col("value") * 100).cast("long")],
        ["user", "cents"],
        bits=_Z_BITS,
        bucket_bits=_Z_BITS,
    )


@register(
    "pipeline_zorder_skipping_gain",
    oracle=f"""
    WITH dims AS (
      SELECT user_id AS d0,
             CAST(round(value * 100) AS BIGINT) AS d1
      FROM events),
    b AS (
      SELECT MIN(d0) AS mn0, MAX(d0) AS mx0,
             MIN(d1) AS mn1, MAX(d1) AS mx1
      FROM dims),
    ranked AS (
      SELECT d0, d1,
             CAST(floor((d0 - mn0) * {(1 << _Z_BITS) - 1}
                        / greatest(mx0 - mn0, 1)) AS BIGINT) AS r0,
             CAST(floor((d1 - mn1) * {(1 << _Z_BITS) - 1}
                        / greatest(mx1 - mn1, 1)) AS BIGINT) AS r1
      FROM dims CROSS JOIN b),
    coded AS (
      SELECT d0, d1,
             ({_sql_morton2("r0", "r1", _Z_BITS)}) >> {_Z_BITS} AS zbucket
      FROM ranked),
    buckets AS (
      SELECT zbucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(d0) AS min_user, MAX(d0) AS max_user,
             MIN(d1) AS min_cents, MAX(d1) AS max_cents
      FROM coded GROUP BY zbucket),
    preds AS (
      SELECT mn0 + ((mx0 - mn0) * 4) // 10 AS u_lo,
             mn0 + ((mx0 - mn0) * 5) // 10 AS u_hi,
             mn1 + ((mx1 - mn1) * 9) // 10 AS c_lo
      FROM b)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN max_user < u_lo OR min_user > u_hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS skip_user_band,
           CAST(SUM(CASE WHEN max_cents < c_lo
                         THEN 1 ELSE 0 END) AS BIGINT) AS skip_cents_tail,
           CAST(SUM(CASE WHEN max_user < u_lo OR min_user > u_hi
                         THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_skipped_user,
           CAST(SUM(CASE WHEN max_cents < c_lo THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_skipped_cents
    FROM buckets CROSS JOIN preds
    """,
    tags=("pipeline", "layout", "zorder", "scale"),
    since=7,
)
def pipeline_zorder_skipping_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order payoff, measured: against the 256-bucket layout of
    `pipeline_zorder_layout`, how many buckets (≈ files at 100 TB)
    does min/max pruning SKIP for two canonical predicates — a 10%
    user-id band (the multi-tenant slice query) and a top-decile
    value filter (the high-ticket scan)? Thresholds derive from the
    global bounds by exact integer arithmetic, a bucket is skippable
    exactly when its [min, max] excludes the predicate — the same
    decision parquet row-group stats make — and the report counts
    skipped buckets AND skipped rows for both predicates on DIMENSION
    2 AND DIMENSION 1 *of the same layout*: the number a plain sort
    can only deliver for its leading column. One-row output; the
    bucket table is 256 rows, checkpointed across its two consumers
    (bounds + skip counts)."""
    from ..operators.scale import zorder_layout_audit

    ev = load_table(spark, sf_dir, "events")
    audit = zorder_layout_audit(
        ev,
        [F.col("user_id"), F.round(F.col("value") * 100).cast("long")],
        ["user", "cents"],
        bits=_Z_BITS,
        bucket_bits=_Z_BITS,
    ).localCheckpoint(eager=True)  # 256 rows, 2 consumers
    bounds = F.broadcast(
        audit.agg(
            F.min("min_user").alias("mn0"),
            F.max("max_user").alias("mx0"),
            F.min("min_cents").alias("mn1"),
            F.max("max_cents").alias("mx1"),
        ).select(
            (
                F.col("mn0")
                + F.floor((F.col("mx0") - F.col("mn0")) * 4 / 10)
            ).alias("u_lo"),
            (
                F.col("mn0")
                + F.floor((F.col("mx0") - F.col("mn0")) * 5 / 10)
            ).alias("u_hi"),
            (
                F.col("mn1")
                + F.floor((F.col("mx1") - F.col("mn1")) * 9 / 10)
            ).alias("c_lo"),
        )
    )
    skip_u = (F.col("max_user") < F.col("u_lo")) | (
        F.col("min_user") > F.col("u_hi")
    )
    skip_c = F.col("max_cents") < F.col("c_lo")
    return audit.crossJoin(bounds).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(skip_u.cast("long")).alias("skip_user_band"),
        F.sum(skip_c.cast("long")).alias("skip_cents_tail"),
        F.sum(F.when(skip_u, F.col("n_rows")).otherwise(0)).alias(
            "rows_skipped_user"
        ),
        F.sum(F.when(skip_c, F.col("n_rows")).otherwise(0)).alias(
            "rows_skipped_cents"
        ),
    )


@register(
    "embedding_matryoshka_audit",
    oracle=f"""
    WITH bfq AS (SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
    bfc AS (SELECT vec_id AS neighbor_id, embedding AS cvec
            FROM embeddings),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT bfq.query_id, bfc.neighbor_id,
               row_number() OVER (PARTITION BY bfq.query_id
                   ORDER BY {_sql_cos("bfq.qvec", "bfc.cvec")} DESC,
                            bfc.neighbor_id) AS rnk
        FROM bfc CROSS JOIN bfq
        WHERE bfc.neighbor_id <> bfq.query_id) t WHERE rnk <= 5),
    tq AS (SELECT vec_id AS query_id,
                  list_slice(embedding, 1, 32) AS qvec
           FROM embeddings WHERE vec_id < 20),
    tc AS (SELECT vec_id AS neighbor_id,
                  list_slice(embedding, 1, 32) AS cvec
           FROM embeddings),
    tr AS (
      SELECT query_id, neighbor_id FROM (
        SELECT tq.query_id, tc.neighbor_id,
               row_number() OVER (PARTITION BY tq.query_id
                   ORDER BY {_sql_cos("tq.qvec", "tc.cvec")} DESC,
                            tc.neighbor_id) AS rnk
        FROM tc CROSS JOIN tq
        WHERE tc.neighbor_id <> tq.query_id) t WHERE rnk <= 5),
    hits AS (
      SELECT bf.query_id, COUNT(*) AS n_hits
      FROM bf JOIN tr ON bf.query_id = tr.query_id
                     AND bf.neighbor_id = tr.neighbor_id
      GROUP BY bf.query_id)
    SELECT b.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS DOUBLE)
                 / COUNT(*), 6) AS recall
    FROM bf b LEFT JOIN hits h ON b.query_id = h.query_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "embedding", "qa", "matryoshka"),
    since=7,
)
def embedding_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022 MRL; the
    dimension-adaptive retrieval now standard in embedding serving):
    recall@5 of cosine top-k computed on the FIRST 32 of 64
    dimensions against the full-dimension answer — the measurement
    that decides whether the index can store/scan HALF the bytes
    (truncate-then-search) before any re-rank pass. Same |Q| x k
    audit-join shape as the other recall meters; the truncated scan
    is the point: at 100 TB, halving the vector width halves the
    memory-bandwidth bill of every brute-force or IVF scan, and this
    number says what that costs in recall. Both sides' ranking math
    is the engine-stable round(cos,6) fold."""
    emb = _load(spark, sf_dir, "embeddings")

    def half(df):
        return df.select(
            "vec_id",
            F.slice("embedding", 1, 32).alias("embedding"),
            "label",
        )

    q = emb.filter(F.col("vec_id") < 20)
    exact = S.cosine_topk_bruteforce(q, emb, k=5)
    trunc = S.cosine_topk_bruteforce(half(q), half(emb), k=5)
    return S.topk_recall_audit(exact, trunc, k=5)


@register(
    "similarity_topk_matryoshka",
    oracle=f"""
    WITH tq AS (SELECT vec_id AS query_id,
                       list_slice(embedding, 1, 32) AS qvec
                FROM embeddings WHERE vec_id < 20),
    tc AS (SELECT vec_id AS neighbor_id,
                  list_slice(embedding, 1, 32) AS cvec
           FROM embeddings),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT tq.query_id, tc.neighbor_id,
               row_number() OVER (PARTITION BY tq.query_id
                   ORDER BY {_sql_cos("tq.qvec", "tc.cvec")} DESC,
                            tc.neighbor_id) AS rnk
        FROM tc CROSS JOIN tq
        WHERE tc.neighbor_id <> tq.query_id) t WHERE rnk <= 20),
    q AS (SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cvec
          FROM embeddings),
    rer AS (
      SELECT cand.query_id, cand.neighbor_id,
             {_sql_cos("q.qvec", "c.cvec")} AS score
      FROM cand
      JOIN q ON q.query_id = cand.query_id
      JOIN c ON c.neighbor_id = cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM rer)
    SELECT query_id, neighbor_id, score, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "matryoshka", "rerank"),
    since=7,
)
def similarity_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage Matryoshka retrieval, driver-verified: top-20
    candidates by cosine over the first 32 of 64 dims (half the scan
    bytes), exact full-dim re-rank to top-5 — the serving pattern
    that turns `embedding_matryoshka_audit`'s recall number into a
    latency/quality dial (candidate recall is the only loss; the
    re-rank restores exact order within candidates). The oracle
    unrolls both stages."""
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_matryoshka_rerank(
        emb.filter(F.col("vec_id") < 20), emb,
        k=5, n_candidates=20, trunc_dim=32,
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "bucketing", "layout", "scale"),
    since=8,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact-fact join via BUCKETED table layout: write
    orders and lineitem as Spark bucketed tables (8 buckets on the
    order key each), then join the bucketed reads — the planner
    proves both sides already share the same hash distribution and
    plans the sort-merge join with ZERO join-input Exchange (pinned
    in tests/test_plans.py; the only exchange in the whole plan is
    the final group-by's). This is the shuffle eliminator the
    z-order layout is the skipping counterpart of: at 100 TB you pay
    the bucketing once at ingest and every recurring join of the day
    reads co-located buckets. The per-side Sort remains — OSS Spark
    never trusts written bucket sort order on read (SPARK-19256) —
    but it is a local per-bucket sort, not a shuffle. Values match
    the plain keyed join (the oracle), proving the layout is a pure
    plan optimization.

    Tables/paths are PID- AND sf_dir-scoped (concurrent sessions must
    not rmtree each other's live buckets, and building the plan for a
    second scale factor in one process must not overwrite the tables a
    previously returned, not-yet-evaluated DataFrame still points at —
    same hazard join_dynamic_partition_pruning guards) and cleaned at
    interpreter exit."""
    import os
    import tempfile

    from ..sources.readers import write_bucketed_table
    from .sink_semantics import _register_tmp_cleanup

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(
        tempfile.gettempdir(), f"fcs_bucketed_{os.getpid()}_{tag}"
    )
    _register_tmp_cleanup(base)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    to = f"fcs_bkt_orders_{os.getpid()}_{tag}"
    tl = f"fcs_bkt_li_{os.getpid()}_{tag}"
    # written once per process (the DPP query's guard, r14): the
    # bucketed layout is the pay-once-at-ingest half of this query's
    # story — rewriting BOTH tables per invocation (a shuffle + full
    # write of each side) priced ingest into every probe run. Re-runs
    # now read the standing buckets, exactly like production.
    if not (
        os.path.isdir(f"{base}/orders")
        and os.path.isdir(f"{base}/lineitem")
        and spark.catalog.tableExists(to)
        and spark.catalog.tableExists(tl)
    ):
        write_bucketed_table(o, to, f"{base}/orders", "o_orderkey", 8)
        write_bucketed_table(l, tl, f"{base}/lineitem", "l_orderkey", 8)
    # merge-hint both sides: at test SFs Catalyst would BROADCAST the
    # small orders side, which silently skips the co-located path this
    # query exists to exercise (and at real fact-fact scale broadcast
    # is not on the table anyway). With the hint the planner must pick
    # sort-merge — and the bucketed+sorted layout makes it exchange-
    # AND sort-free.
    ob = spark.table(to).hint("merge")
    lb = spark.table(tl).hint("merge")
    rev4 = F.col("l_extendedprice_c") * (
        F.lit(100).cast("long") - F.col("l_discount_c")
    )
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .select(
            "o_orderpriority",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("l_extendedprice_c"),
            F.round(F.col("l_discount") * 100)
            .cast("long")
            .alias("l_discount_c"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            (F.sum(rev4).cast("double") / F.lit(10000.0)).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
             CAST(strftime(CAST(ts AS DATE), '%w') AS BIGINT) AS dow
      FROM events),
    sel AS (SELECT dt FROM dim WHERE dow = 1),
    f AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dt, event_type
          FROM events)
    SELECT f.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT f.dt) AS BIGINT) AS n_days
    FROM f JOIN sel ON f.dt = sel.dt
    GROUP BY f.event_type
    """,
    tags=("join", "partitioning", "pruning", "layout", "scale"),
    since=8,
)
def join_dynamic_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition pruning, driver-verified: write the events
    fact hive-partitioned by date (the `write_date_partitioned`
    layout), join it against a FILTERED day dimension (Mondays only)
    on the partition column — the filter value isn't known until the
    dim side runs, so static pruning can't help; Spark's DPP turns
    the dim result into a runtime IN-subquery ON THE SCAN
    (`dynamicpruningexpression` in the plan, pinned), and the fact
    side reads ~1/7th of the directories. At 100 TB this is the
    difference between scanning the corpus and scanning Mondays —
    the runtime twin of the static `PartitionFilters` pruning the
    date layout already proves, and of the bucketing layout's
    exchange elimination. Fact/dim values match the plain join (the
    oracle), proving the pruning is a pure scan optimization.

    The partitioned copy is PID-scoped (concurrent sessions) and
    written once per process (re-runs reuse it — writing per build
    would dominate the query)."""
    import os
    import tempfile

    from ..sources.readers import (
        read_date_partitioned,
        write_date_partitioned,
    )
    from .sink_semantics import _register_tmp_cleanup

    ev = load_table(spark, sf_dir, "events")
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(), f"fcs_dpp_events_{os.getpid()}_{tag}"
    )
    _register_tmp_cleanup(path)
    if not os.path.isdir(path):
        write_date_partitioned(ev, path, "ts")
    fact = read_date_partitioned(spark, path)
    dim = (
        ev.select(F.to_date("ts").alias("d"))
        .distinct()
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("dt"),
            F.dayofweek("d").cast("long").alias("dow"),
        )
        # Spark dayofweek: 1=Sunday ... 2=Monday; DuckDB %w: 1=Monday
        .filter(F.col("dow") == 2)
        .select("dt")
    )
    return (
        fact.join(dim, "dt")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("dt").cast("long").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension 8-bit scalar quantization (FAISS ScalarQuantizer QT_8bit):
# the rung between per-vector int8 (no training, scales cancel) and PQ
# (codebook training). Asymmetric distance: queries stay full-precision,
# the corpus is coded on per-dimension trained (min, max) ranges; the
# decode reconstructs at 255x magnification so scoring is exact int64
# math end to end (the uniform 1/255 cancels out of cosine).
# ---------------------------------------------------------------------------

_SQL_SQ8 = """
    wq AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS w
           FROM embeddings),
    sq_ex AS (SELECT unnest(wq.w) AS val,
                     unnest(range(1, len(wq.w) + 1)) AS pos
              FROM wq),
    sq_st AS (SELECT pos, MIN(val) AS mn, MAX(val) AS mx
              FROM sq_ex GROUP BY pos),
    sq_mm AS (SELECT list(mn ORDER BY pos) AS mins,
                     list(mx ORDER BY pos) AS maxs FROM sq_st),
    sq_rec AS (
      SELECT wq.vec_id,
             list_transform(range(1, len(wq.w) + 1), i ->
               sq_mm.mins[i] * 255 +
               (CASE WHEN sq_mm.maxs[i] > sq_mm.mins[i]
                THEN greatest(CAST(0 AS BIGINT), least(CAST(255 AS BIGINT),
                     CAST(round(CAST((wq.w[i] - sq_mm.mins[i]) * 255
                               AS DOUBLE)
                          / CAST(sq_mm.maxs[i] - sq_mm.mins[i] AS DOUBLE))
                     AS BIGINT)))
                ELSE CAST(0 AS BIGINT) END)
               * (sq_mm.maxs[i] - sq_mm.mins[i])) AS rv
      FROM wq, sq_mm),
    sq_q AS (SELECT vec_id AS query_id, w AS qw FROM wq
             WHERE vec_id < 20
               AND list_sum(list_transform(w, x -> x * x)) > 0),
    sq_n AS (SELECT vec_id AS neighbor_id, rv FROM sq_rec
             WHERE list_sum(list_transform(rv, x -> x * x)) > 0)
"""

_SQL_SQ8_SCORED = f"""
    sq_scored AS (
      SELECT sq_q.query_id, sq_n.neighbor_id,
             round({_sql_idot("sq_q.qw", "sq_n.rv")}
                   / (sqrt({_sql_idot("sq_q.qw", "sq_q.qw")})
                      * sqrt({_sql_idot("sq_n.rv", "sq_n.rv")})), 6)
               AS score
      FROM sq_n CROSS JOIN sq_q
      WHERE sq_n.neighbor_id <> sq_q.query_id)
"""


def _sq8_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted SQ8 index artifact: the one-row
    per-dimension (mins, maxs) trained ranges on the 1024 grid (the
    scalar quantizer's whole "codebook") PLUS, since r13, the
    ENCODED corpus codes relation (id, array<smallint>) — what a
    FAISS IndexScalarQuantizer actually stores, so probes scan
    stored codes instead of re-encoding the corpus per invocation
    (the clamp's per-probe cost measured in the r13 quiet-box A/B
    moves to this one build). `similarity_topk_sq8` prices the
    train+encode pass (first toucher); the recall meter reads the
    same relations. Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact
    from ..operators.similarity import (
        _write_artifact_manifest,
        sq8_encode_codes,
        sq8_train_stats,
    )

    def build(path: str) -> None:
        _write_artifact_manifest(
            spark, path, {"scale": 1024, "layout": 2}
        )
        emb = _load(spark, sf_dir, "embeddings")
        (
            sq8_train_stats(emb, scale=1024)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/stats")
        )
        sq8_encode_codes(
            emb, _read_pq(spark, f"{path}/stats"), scale=1024
        ).write.mode("overwrite").parquet(f"{path}/codes")

    return ensure_artifact(spark, "sq8_stats", sf_dir, build)


def _sq8_stored_stats(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import read_artifact_manifest

    path = _sq8_artifact_path(spark, sf_dir)
    man = read_artifact_manifest(spark, path)
    if man.get("scale") != 1024:
        raise ValueError(
            f"sq8 artifact at {path!r} params mismatch: built with "
            f"scale={man.get('scale')}, probe wants 1024"
        )
    return _read_pq(spark, f"{path}/stats")


def _sq8_stored_codes(spark: SparkSession, sf_dir: str):
    """The persisted encoded corpus, or None for a pre-r13
    stable-root artifact that stores only the trained ranges (the
    probe then encodes live — deterministic, bit-identical; the same
    trusted-marker compatibility rule as the pre-r12 signatures
    fallback)."""
    import os

    path = _sq8_artifact_path(spark, sf_dir)
    if not os.path.isdir(os.path.join(path, "codes")):
        return None
    return _read_pq(spark, f"{path}/codes")


@register(
    "similarity_topk_sq8",
    oracle=f"""
    WITH {_SQL_SQ8},
    {_SQL_SQ8_SCORED},
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM sq_scored)
    SELECT query_id, neighbor_id, score, rnk FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "quantization"),
    since=11,
    changed=13,
)
def similarity_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine over the per-DIMENSION 8-bit scalar-quantized
    store (FAISS ScalarQuantizer QT_8bit / IndexScalarQuantizer
    parity) with ASYMMETRIC distance — same 4x byte shrink as the
    per-vector int8 scan but per-dimension trained ranges adapt to
    anisotropic embeddings (this corpus IS anisotropic:
    embedding_anisotropy audits it), and the query side stays
    lossless (ADC). Train = one posexplode + dims-keyed agg into a
    one-row broadcast (2 x dims longs — SQ's whole "codebook");
    encode rides the corpus scan projection; integer dots, one float
    division per pair. r11 wave 10: the trained ranges are a
    PERSISTED one-row artifact (this query prices the train pass);
    the oracle replays the train live."""
    emb = _load(spark, sf_dir, "embeddings")
    return S.cosine_topk_sq8(
        emb.filter(emb.vec_id < 20), emb, k=5,
        stats=_sq8_stored_stats(spark, sf_dir),
        codes=_sq8_stored_codes(spark, sf_dir),
    )


@register(
    "similarity_recall_sq8",
    oracle=f"""
    WITH {_SQL_SQ8},
    {_SQL_SQ8_SCORED},
    sq8 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM sq_scored) t WHERE rnk <= 5),
    bfq AS (SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
    bfc AS (SELECT vec_id AS neighbor_id, embedding AS cvec
            FROM embeddings),
    bf_scored AS (
      SELECT bfq.query_id, bfc.neighbor_id,
             {_sql_cos("bfq.qvec", "bfc.cvec")} AS score
      FROM bfc CROSS JOIN bfq
      WHERE bfc.neighbor_id <> bfq.query_id),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM bf_scored) t WHERE rnk <= 5),
    hits AS (
      SELECT bf.query_id, COUNT(*) AS n_hits
      FROM bf JOIN sq8 ON bf.query_id = sq8.query_id
                      AND bf.neighbor_id = sq8.neighbor_id
      GROUP BY bf.query_id)
    SELECT b.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS DOUBLE)
                 / COUNT(*), 6) AS recall
    FROM bf b LEFT JOIN hits h ON b.query_id = h.query_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "quantization", "qa"),
    since=11,
    changed=13,
)
def similarity_recall_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the per-dimension SQ8 asymmetric scan against the
    exact float32 brute force — the go/no-go audit before flipping a
    store to scalar quantization, and the direct A/B against
    similarity_recall_int8: same bytes, trained ranges + lossless
    queries vs untrained symmetric codes. Both sides are
    result-sized joins over |Q| x k rows; at 100 TB the exact side
    runs over a query sample."""
    from ..operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_sq8,
        topk_recall_audit,
    )

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id < 20)
    exact = cosine_topk_bruteforce(q, emb, k=5)
    approx = cosine_topk_sq8(
        q, emb, k=5, stats=_sq8_stored_stats(spark, sf_dir),
        codes=_sq8_stored_codes(spark, sf_dir),
    )
    return topk_recall_audit(exact, approx, k=5)
