"""Registered query plans for the LLM-data-pipeline operators
(SURVEY.md §2.3): dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search (brute-force + IVF),
text analysis, multimodal metadata.

Each plan wraps an operator from ``flink_connectors_spark.operators``
and carries a full DuckDB oracle — including the MinHash/SimHash
pipelines, which are expressed in portable SQL (md5-derived hashes, no
engine-private hash functions) precisely so the driver can verify them
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as T
from ..registry import register
from ..session import read_parquet as _read_pq
from ..session import load_table, spread


def _load(spark, sf_dir, name):
    """Load + spread: these corpora ship as one parquet file each,
    which scans as a single split — without redistribution every
    hash/shingle/vector transform below would run on one core. At
    production scale the scan is already wide and spread() no-ops."""
    return spread(load_table(spark, sf_dir, name))

# ---------------------------------------------------------------------------
# Shared DuckDB SQL fragments (mirrors of functions/__init__.py)
# ---------------------------------------------------------------------------

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"

# 3-word distinct shingles with the same short-doc guard as
# functions.word_shingles.
_SHINGLES_CTE = f"""
norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w)-1),
             i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
  FROM norm WHERE len(w) >= 3)
"""


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


def _sql_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"


def _sql_cos(a: str, b: str) -> str:
    return f"round({_sql_dot(a, b)} / ({_sql_norm(a)} * {_sql_norm(b)}), 6)"


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_NORM}) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("llm", "dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-content md5."""
    return D.exact_dedup(_load(spark, sf_dir, "documents"))


_MINHASH_K = 8
_BAND = 2
_SIG_COLS = ",\n         ".join(
    f"list_min(list_transform(shingles, s -> md5('{i}|' || s))) AS m{i}"
    for i in range(_MINHASH_K)
)
_BAND_SELECTS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, concat(m{2 * b}, m{2 * b + 1}) AS band_key FROM sig"
    for b in range(_MINHASH_K // _BAND)
)

@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id, shingles,
         {_SIG_COLS}
      FROM sh),
    bands AS (
      {_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)
    SELECT c.d1, c.d2,
           round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE), 6) AS jac
    FROM cand c
    JOIN sh x ON x.doc_id = c.d1
    JOIN sh y ON y.doc_id = c.d2
    WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE), 6) >= 0.5
    """,
    tags=("llm", "dedup", "minhash", "lsh"),
    changed=13,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4 bands of 2) near-dup pairs, Jaccard-verified
    at >= 0.5. No O(n^2): candidates come from band-bucket self-join.
    r11: served from the persisted TEXT-side pair artifact — this
    query prices the one LSH pass (first toucher) and value-hashes
    the read-back against an oracle that replays the full pipeline,
    proving the stored relation equals the live computation."""
    path = _minhash_pairs_artifact_path(spark, sf_dir)
    return D.read_minhash_pairs(spark, path, threshold=0.5)


def _minhash_pairs_inc_artifact_path(
    spark: SparkSession, sf_dir: str
) -> str:
    """Ensure a MinHash pair artifact that has lived an ingest day:
    base build on three quarters of the corpus (verify floor 0.5),
    then a TRANSACTIONAL append of the remaining quarter
    (`minhash_pairs_append` — only the batch shingles/hashes;
    candidates band-join the stored committed signatures, r12
    verdict Next #3). The probe reads it uncompacted. Contract in
    `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        d = _load(spark, sf_dir, "documents")
        D.minhash_pairs_build_artifact(
            d.filter(F.col("doc_id") % 4 != 3), path,
            shingle_n=3, num_hashes=_MINHASH_K, band_size=_BAND,
            min_jac=0.5,
        )
        D.minhash_pairs_append(
            d.filter(F.col("doc_id") % 4 == 3), path, "ingest1",
            shingle_n=3, num_hashes=_MINHASH_K, band_size=_BAND,
            min_jac=0.5,
        )

    return ensure_artifact(spark, "minhash_pairs_inc", sf_dir, build)


@register(
    "dedup_pairs_append_probe",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id, shingles,
         {_SIG_COLS}
      FROM sh),
    bands AS (
      {_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)
    SELECT c.d1, c.d2,
           round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE), 6) AS jac
    FROM cand c
    JOIN sh x ON x.doc_id = c.d1
    JOIN sh y ON y.doc_id = c.d2
    WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE), 6) >= 0.5
    """,
    tags=("llm", "dedup", "minhash", "lsh", "incremental"),
    since=13,
    changed=14,
)
def dedup_pairs_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ingest for the TEXT-side MinHash pair artifact
    (r12 verdict Next #3, second target): the probed artifact was
    built on three quarters of the corpus and a nightly batch (the
    last quarter) was APPENDED transactionally — only the batch
    shingled/hashed; its candidates band-joined against the stored
    committed signatures and Jaccard verification resolved shingles
    from the stored relation. Returns the full committed pair
    relation (uncompacted: base + batch partitions); the oracle
    replays the FULL-corpus MinHash pipeline at the same floor, and
    a MATCH proves build-on-old + append-new equals the from-scratch
    build — exact because band keys are deterministic per doc, so
    every pair the full build finds has either both sides old or
    >= 1 batch side."""
    return D.read_minhash_pairs(
        spark,
        _minhash_pairs_inc_artifact_path(spark, sf_dir),
        threshold=0.5,
    )


@register(
    "pipeline_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, CAST(len({_WORDS}) AS BIGINT) AS n_tokens
      FROM documents),
    runs AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks)
    SELECT doc_id, source, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
           CAST(cum - n_tokens - ((cum - n_tokens) // 2048) * 2048
                AS BIGINT) AS pack_offset
    FROM runs
    """,
    tags=("llm", "pipeline", "packing", "window"),
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: assign each doc to a fixed
    2048-token training sequence (pack) by contiguous cumulative
    token count within its source — the deterministic, shuffle-light
    formulation of 'concat the corpus and cut every N tokens' (docs
    straddling a boundary start the next pack, the standard
    document-boundary variant). One shuffle on source + one window
    cumsum; at 100 TB this replaces the serial concat step that
    otherwise bottlenecks tokenizer sharding. Deterministic: pack
    layout depends only on (source, doc_id) order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions import tokenize

    budget = 2048
    d = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    out = d.withColumn("start", start)
    return out.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("start") / budget).cast("bigint").alias("pack_id"),
        (F.col("start") - (F.col("start") / budget).cast("bigint") * budget)
        .cast("bigint")
        .alias("pack_offset"),
    )


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    grams AS (
      SELECT doc_id, w,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(1, len(w)-1),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                  ELSE [] END AS g3
      FROM norm)
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE)
                 / greatest(CAST(len(w) AS DOUBLE), 1.0), 6)
             AS dup_token_ratio,
           round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                 / greatest(CAST(len(g3) AS DOUBLE), 1.0), 6)
             AS dup_3gram_ratio
    FROM grams
    """,
    tags=("llm", "text", "quality", "repetition"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher-style quality
    gates): duplicate-token fraction and duplicate-3-gram fraction.
    High values flag boilerplate/spam docs a pretraining pipeline
    drops. Pure codegen'd array expressions — narrow map, no shuffle,
    no UDF; at 100 TB this is a free rider on any scan."""
    from pyspark.sql import functions as F

    from ..functions import raw_word_ngrams, tokenize

    d = _load(spark, sf_dir, "documents")
    w = tokenize(F.col("text"))
    frame = d.select("doc_id", w.alias("w")).withColumn(
        "g3", raw_word_ngrams(F.col("w"), 3)
    )

    def dup_ratio(col):
        return F.round(
            1.0
            - F.size(F.array_distinct(col)).cast("double")
            / F.greatest(F.size(col).cast("double"), F.lit(1.0)),
            6,
        )

    return frame.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        dup_ratio(F.col("w")).alias("dup_token_ratio"),
        dup_ratio(F.col("g3")).alias("dup_3gram_ratio"),
    )


# The bipartite incremental-dedup oracle: full live replay of BOTH
# sides (batch = every 10th doc, corpus = the rest). Shared by the
# plain index probe AND the compaction probe — compaction must not
# change the logical relation, so both MATCH the same replay.
_INCR_BATCH_ORACLE = f"""
    WITH nnorm AS (
      SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id % 10 = 0),
    cnorm AS (
      SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id % 10 <> 0),
    nsh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w)-1),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
      FROM nnorm WHERE len(w) >= 3),
    csh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w)-1),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
      FROM cnorm WHERE len(w) >= 3),
    nsig AS (SELECT doc_id, shingles, {_SIG_COLS} FROM nsh),
    csig AS (SELECT doc_id, shingles, {_SIG_COLS} FROM csh),
    nbands AS ({_BAND_SELECTS.replace("FROM sig", "FROM nsig")}),
    cbands AS ({_BAND_SELECTS.replace("FROM sig", "FROM csig")}),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM nbands n JOIN cbands c
        ON n.band_id = c.band_id AND n.band_key = c.band_key)
    SELECT d.new_id, d.corpus_id,
           round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE), 6) AS jac
    FROM cand d
    JOIN nsh x ON x.doc_id = d.new_id
    JOIN csh y ON y.doc_id = d.corpus_id
    WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE), 6) >= 0.5
    """


@register(
    "dedup_incremental_batch",
    oracle=_INCR_BATCH_ORACLE,
    tags=("llm", "dedup", "minhash", "lsh", "incremental"),
    changed=12,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: every 10th doc plays the NEW batch;
    bipartite MinHash-LSH finds which new docs are near-dups of the
    existing corpus without any corpus self-join — the nightly-batch
    shape where the corpus band table is a persistent index and only
    the batch side is computed fresh. r11: that sentence is now
    literal — the corpus bands + shingles are a PERSISTED signature
    index (built once, priced in this query's cold column) and the
    probe computes only the O(batch) side; the oracle replays both
    sides live, so a MATCH proves probing the stored index equals
    the full bipartite computation."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_vs_index(
        d.filter(F.col("doc_id") % 10 == 0),
        _minhash_index_artifact_path(spark, sf_dir),
        num_hashes=_MINHASH_K,
        band_size=_BAND,
        threshold=0.5,
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    blocked AS (
      SELECT d.lang, d.source, s.doc_id, s.shingles
      FROM documents d JOIN sh s ON d.doc_id = s.doc_id)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE), 6) AS jac
    FROM blocked a JOIN blocked b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE), 6) >= 0.3
    """,
    tags=("llm", "dedup", "ngram"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs within (lang, source) blocks."""
    return D.ngram_jaccard_pairs(
        _load(spark, sf_dir, "documents"),
        block_cols=["lang", "source"],
        threshold=0.3,
    )


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    blocked AS (
      SELECT d.lang, d.source, s.doc_id, s.shingles
      FROM documents d JOIN sh s ON d.doc_id = s.doc_id),
    paired AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               AS inter,
             CAST(len(a.shingles) AS DOUBLE) AS na,
             CAST(len(b.shingles) AS DOUBLE) AS nb
      FROM blocked a JOIN blocked b
        ON a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id)
    SELECT d1, d2,
           round(inter / na, 6) AS c_d1_in_d2,
           round(inter / nb, 6) AS c_d2_in_d1
    FROM paired
    WHERE greatest(round(inter / na, 6), round(inter / nb, 6)) >= 0.5
    """,
    tags=("llm", "dedup", "ngram", "containment"),
    since=7,
    changed=13,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs (Broder 1997): a doc
    quoted inside a much larger doc scores ~1.0 here but near 0 on
    Jaccard — the subset-duplicate detector symmetric dedup misses.
    Both directed scores per pair; either direction >= 0.5 keeps the
    pair. Same blocked self-join shape (and scale bound) as
    `dedup_ngram_jaccard`. r11: the directed scores are one-division
    projections over the persisted containment-statistics artifact
    (this query prices the build as first toucher); the oracle
    replays the full blocked pipeline."""
    stats = D.read_containment_pairs(
        spark, _containment_pairs_artifact_path(spark, sf_dir),
        threshold=0.5,
    )
    return stats.select(
        "d1",
        "d2",
        D._contain_dir(F.col("inter"), "n1").alias("c_d1_in_d2"),
        D._contain_dir(F.col("inter"), "n2").alias("c_d2_in_d1"),
    )


_CONTAIN_PAIRS_CTE = f"""{_SHINGLES_CTE},
    blocked AS (
      SELECT d.lang, d.source, s.doc_id, s.shingles
      FROM documents d JOIN sh s ON d.doc_id = s.doc_id),
    cpairs AS (
      SELECT d1, d2,
             round(inter / na, 6) AS c12, round(inter / nb, 6) AS c21
      FROM (
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 AS inter,
               CAST(len(a.shingles) AS DOUBLE) AS na,
               CAST(len(b.shingles) AS DOUBLE) AS nb
        FROM blocked a JOIN blocked b
          ON a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id) t)"""


@register(
    "dedup_containment_keeplist",
    oracle=f"""
    WITH {_CONTAIN_PAIRS_CTE},
    drops AS (
      SELECT d1 AS doc_id FROM cpairs WHERE c12 >= 0.5 AND c21 < 0.5
      UNION
      SELECT d2 FROM cpairs WHERE c21 >= 0.5)
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d LEFT JOIN drops x ON d.doc_id = x.doc_id
    WHERE x.doc_id IS NULL
    """,
    tags=("llm", "dedup", "containment", "apply"),
    since=7,
    changed=13,
)
def dedup_containment_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The containment CUT: every doc that is contained (>= 0.5 of
    its shingles) inside another doc is dropped — quoted/embedded
    subset duplicates leave the corpus, the container survives.
    Mutual containment (near-identical pair) keeps the lower id, so
    the rule is deterministic: with pairs ordered d1 < d2, drop d1
    when only it is contained, drop d2 whenever it is contained.
    Survivors = corpus ANTI JOIN drops — duplicate-sized, like
    `dedup_apply_keeplist`; the pair pass is the blocked LSH-class
    self-join, never corpus². r11: pairs derive from the persisted
    containment-statistics artifact — both drop branches re-read the
    cheap pushed-filter scan, so the checkpoint the live pipeline
    needed here is gone."""
    docs = _load(spark, sf_dir, "documents")
    stats = D.read_containment_pairs(
        spark, _containment_pairs_artifact_path(spark, sf_dir),
        threshold=0.5,
    )
    pairs = stats.select(
        "d1",
        "d2",
        D._contain_dir(F.col("inter"), "n1").alias("c_d1_in_d2"),
        D._contain_dir(F.col("inter"), "n2").alias("c_d2_in_d1"),
    )
    thr = F.lit(0.5)
    drops = (
        pairs.filter(
            (F.col("c_d1_in_d2") >= thr) & (F.col("c_d2_in_d1") < thr)
        )
        .select(F.col("d1").alias("doc_id"))
        .unionByName(
            pairs.filter(F.col("c_d2_in_d1") >= thr).select(
                F.col("d2").alias("doc_id")
            )
        )
        .distinct()
    )
    return docs.join(drops, "doc_id", "left_anti").select(
        "doc_id", "source", "n_chars"
    )


_SIMHASH_BITS = 16
_VOTE_COLS = ", ".join(f"SUM((h >> {j}) & 1) AS s{j}" for j in range(_SIMHASH_BITS))
_FP_EXPR = " + ".join(
    f"(CASE WHEN s{j} * 2 > n_tokens THEN {1 << j} ELSE 0 END)"
    for j in range(_SIMHASH_BITS)
)

def _simhash_fps_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted per-document SimHash fingerprint table
    (16-bit, (lang, source) block cols carried — the params all
    three simhash consumers use). The fingerprint report
    (`dedup_simhash`) prices the one tokenize->vote fold as first
    toucher; the exhaustive blocked join and the banded LSH probe
    then read 2-byte-row fingerprint scans (r12 verdict What's-wrong
    #2: the banded probe was the dedup bench family's last
    per-invocation LSH recompute). Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        D.simhash_build_artifact(
            _load(spark, sf_dir, "documents"), path,
            block_cols=["lang", "source"], n_bits=_SIMHASH_BITS,
        )

    return ensure_artifact(spark, "simhash_fps", sf_dir, build)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS}) AS tok FROM documents),
    hashed AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, {_SIMHASH_BITS // 4})) AS BIGINT) AS h
      FROM toks),
    votes AS (
      SELECT doc_id, COUNT(*) AS n_tokens, {_VOTE_COLS}
      FROM hashed GROUP BY doc_id)
    SELECT doc_id, n_tokens, CAST({_FP_EXPR} AS BIGINT) AS simhash
    FROM votes
    """,
    tags=("llm", "dedup", "simhash"),
    changed=13,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bit SimHash fingerprint (per-bit majority over
    md5-derived token hashes). r13: PRICES the shared fingerprint
    artifact build (`_simhash_fps_artifact_path`) and returns the
    table read BACK from it, so the value hash proves the
    round-tripped relation; the pair/LSH consumers probe the same
    artifact."""
    path = _simhash_fps_artifact_path(spark, sf_dir)
    return D.read_simhash_fps(
        spark, path, n_bits=_SIMHASH_BITS, n_block_cols=2
    ).select("doc_id", "n_tokens", "simhash")


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           {_sql_cos("a.embedding", "b.embedding")} AS score
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_sql_cos("a.embedding", "b.embedding")} >= 0.4
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.4 within label blocks
    (the synthetic embeddings top out near 0.48 block-internal)."""
    return S.cosine_near_dup_pairs(
        _load(spark, sf_dir, "embeddings"), threshold=0.4
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_sql_cos("q.qvec", "c.cvec")} AS score
      FROM c CROSS JOIN q
      WHERE c.neighbor_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, score, rnk FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk"),
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id < 20 —
    the correctness baseline for ANN."""
    emb = _load(spark, sf_dir, "embeddings")
    return S.cosine_topk_bruteforce(emb.filter(emb.vec_id < 20), emb, k=5)


@register(
    "similarity_topk_incremental",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_sql_cos("q.qvec", "c.cvec")} AS score
      FROM c CROSS JOIN q
      WHERE c.neighbor_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, score, rnk FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "incremental"),
)
def similarity_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental top-k maintenance (the shape of 'Incremental Based
    Framework for Efficient Top-K Similarity Search in Interactive
    Data Analysis Sessions', EDBT 2020): the corpus splits into an
    already-indexed part (vec_id % 10 != 0, whose per-query top-k
    would be cached from the previous session) and a newly-ingested
    delta (vec_id % 10 == 0). The refreshed answer re-ranks
    cached-topk UNION delta-scores — per-ingest cost scales with
    |delta| x |Q| + |Q| x k, never re-scanning the indexed corpus.
    Top-k-of-a-union-of-topks is exact because a global top-k row is
    necessarily a top-k row of its own part. Must equal full
    brute-force bit-for-bit — same oracle as
    `similarity_topk_bruteforce`."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id < 20)
    indexed = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    cached = S.cosine_topk_bruteforce(q, indexed, k=5)
    fresh = S.cosine_topk_bruteforce(q, delta, k=5)
    merged = cached.unionByName(fresh).drop("rnk")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        merged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


@register(
    "similarity_topk_ivf",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 20),
    reps AS (
      SELECT label AS cluster, embedding AS rvec FROM (
        SELECT label, embedding,
               ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings) t WHERE rn = 1),
    probes AS (
      SELECT query_id, qvec, cluster FROM (
        SELECT q.query_id, q.qvec, r.cluster,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos("q.qvec", "r.rvec")} DESC, r.cluster) AS pr
        FROM q CROSS JOIN reps r) t WHERE pr <= 2),
    c AS (SELECT vec_id AS neighbor_id, label AS cluster, embedding AS cvec
          FROM embeddings),
    scored AS (
      SELECT p.query_id, c.neighbor_id,
             {_sql_cos("p.qvec", "c.cvec")} AS score
      FROM c JOIN probes p USING (cluster)
      WHERE c.neighbor_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, score, rnk FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "ann", "ivf"),
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe the 2 most-similar clusters (deterministic
    medoid representatives), search only those — the scale path."""
    emb = _load(spark, sf_dir, "embeddings")
    return S.cosine_topk_ivf(emb.filter(emb.vec_id < 20), emb, k=5, n_probe=2)


def _rplsh_sig_cte() -> str:
    """Shared CTE fragment: the sign-LSH signature table. Same
    md5-derived hyperplanes as the Spark operator (python float repr
    round-trips exactly, so both engines see bit-identical plane
    weights), same packed band keys."""
    from ..operators.similarity import random_hyperplanes

    planes = random_hyperplanes(16, 64)

    def lit(row: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in row) + "]"

    keys = ",\n         ".join(
        "("
        + " + ".join(
            f"(CASE WHEN {_sql_dot('embedding', lit(planes[b * 4 + i]))} >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(4)
        )
        + f") AS key{b}"
        for b in range(4)
    )
    return f"""keys AS (SELECT vec_id,
         {keys}
    FROM embeddings),
    sig AS (
      SELECT vec_id, band_id,
             CASE band_id WHEN 0 THEN key0 WHEN 1 THEN key1
                          WHEN 2 THEN key2 ELSE key3 END AS band_key
      FROM keys CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(band_id))"""


def _rplsh_oracle() -> str:
    """DuckDB mirror of the sign-LSH search: signature CTE + the same
    candidate join and ranking as the Spark operator."""
    return f"""
    WITH {_rplsh_sig_cte()},
    pairs AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM sig q JOIN sig c
        ON q.band_id = c.band_id AND q.band_key = c.band_key
      WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
    scored AS (
      SELECT p.query_id, p.neighbor_id,
             {_sql_cos("qe.embedding", "ce.embedding")} AS score
      FROM pairs p
      JOIN embeddings qe ON qe.vec_id = p.query_id
      JOIN embeddings ce ON ce.vec_id = p.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, score, rnk FROM ranked WHERE rnk <= 5
    """


@register(
    "similarity_topk_rplsh",
    oracle=_rplsh_oracle(),
    tags=("llm", "similarity", "ann", "lsh"),
    changed=13,
)
def similarity_topk_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH (random hyperplane) ANN: 16 deterministic hyperplanes
    banded 4x4; queries only score corpus rows sharing a band key —
    the label-free bucketed scale path (IVF needs cluster labels).

    r12 (verdict Next #6): the corpus band-signature table serves
    from the edge artifact's persisted ``signatures`` relation (same
    hyperplanes, manifest-validated) — only the |Q| query signatures
    fold live; the oracle replays the full live fold."""
    emb = _load(spark, sf_dir, "embeddings")
    path = _neardup_edges_artifact_path(spark, sf_dir)
    return S.cosine_topk_rplsh(
        emb.filter(emb.vec_id < 20), emb, k=5, n_planes=16,
        bits_per_band=4,
        corpus_signatures=S.read_neardup_signatures(
            spark, path, n_planes=16, bits_per_band=4, corpus=emb
        ),
    )


@register(
    "similarity_recall_audit",
    oracle=f"""
    WITH {_rplsh_sig_cte()},
    ann_pairs AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM sig q JOIN sig c
        ON q.band_id = c.band_id AND q.band_key = c.band_key
      WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
    ann_scored AS (
      SELECT p.query_id, p.neighbor_id,
             {_sql_cos("qe.embedding", "ce.embedding")} AS score
      FROM ann_pairs p
      JOIN embeddings qe ON qe.vec_id = p.query_id
      JOIN embeddings ce ON ce.vec_id = p.neighbor_id),
    ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM ann_scored) t WHERE rnk <= 5),
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
      FROM bf JOIN ann ON bf.query_id = ann.query_id
                      AND bf.neighbor_id = ann.neighbor_id
      GROUP BY bf.query_id)
    SELECT b.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS DOUBLE)
                 / COUNT(*), 6) AS recall
    FROM bf b LEFT JOIN hits h ON b.query_id = h.query_id
    GROUP BY b.query_id
    """,
    tags=("llm", "similarity", "ann", "qa"),
    since=3,
    changed=13,
)
def similarity_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the sign-LSH ANN against the exact brute-force
    top-5, per query — the QA measurement that decides whether an
    approximate index may replace brute force. Audit joins are
    result-sized (|Q| x k); at corpus scale the exact side runs over
    a query sample, so monitoring cost is independent of N."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id < 20)
    exact = S.cosine_topk_bruteforce(q, emb, k=5)
    # r12: the approximate arm probes the persisted signature table
    # (the meter's cost should be the exact side it audits, not a
    # re-fold of the corpus through the hyperplanes)
    path = _neardup_edges_artifact_path(spark, sf_dir)
    approx = S.cosine_topk_rplsh(
        q, emb, k=5, n_planes=16, bits_per_band=4,
        corpus_signatures=S.read_neardup_signatures(
            spark, path, n_planes=16, bits_per_band=4, corpus=emb
        ),
    )
    return S.topk_recall_audit(exact, approx, k=5)


def _lsh_pairs_cte() -> str:
    """Composable CTE chain ending in ``scored`` (id1, id2, score):
    the sign-LSH candidate pairs with exact cosine verification, used
    by the dedup oracle and the degree-histogram oracle."""
    return f"""{_rplsh_sig_cte()},
    pairs AS (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
      FROM sig a JOIN sig b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.vec_id < b.vec_id),
    scored AS (
      SELECT p.id1, p.id2,
             {_sql_cos("e1.embedding", "e2.embedding")} AS score
      FROM pairs p
      JOIN embeddings e1 ON e1.vec_id = p.id1
      JOIN embeddings e2 ON e2.vec_id = p.id2)"""


def _lsh_dedup_oracle() -> str:
    return f"""
    WITH {_lsh_pairs_cte()}
    SELECT id1, id2, score FROM scored WHERE score >= 0.4
    """


def _neardup_edges_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted sign-LSH near-dup EDGE-LIST artifact
    (scored pairs at the loosest consumer threshold, 0.3; 16x4
    banding pinned for oracle parity — production builds omit the
    pins for `auto_lsh_bands` sizing). ONE build serves every graph
    consumer: the pair report, the degree audit, triangles, both
    PageRank queries, link prediction, and the modality-agreement
    report — each was re-running the full signature-fold + band
    self-join + rescore pipeline per invocation (r10 verdict Next
    #4: the iterative graph trio was the bench's most expensive
    remaining block). Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.neardup_edges_build_artifact(
            emb, path, n_planes=16, bits_per_band=4, min_score=0.3
        )

    return ensure_artifact(spark, "neardup_edges", sf_dir, build)


def _neardup_graph_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted GRAPH-DERIVED artifact over the near-dup
    edge list: min-label connected components and converged
    (2-iteration) PageRank at the working threshold 0.4, computed
    ONCE per scope from the edge artifact and persisted as two
    node-sized relations. In production these are exactly the
    relations a dedup pipeline materializes on ingest — membership
    (which near-dup group) and centrality (which member to keep) —
    and every downstream read (canonicalization, census, rank
    report) is a node-sized scan, never an iterative recompute. Both
    builds are deterministic (min-label propagation; ordered
    contribution folds), so rebuilds are byte-identical and SQL
    oracles can replay closure + unrolled iterations and still
    value-hash a consumer's output. Contract in `ensure_artifact`;
    composes on `_neardup_edges_artifact_path` (the edge build runs
    first if this scope hasn't priced it yet)."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        epath = _neardup_edges_artifact_path(spark, sf_dir)
        pairs = (
            S.read_neardup_edges(spark, epath, threshold=0.4)
            .select("id1", "id2")
            .localCheckpoint(eager=True)
        )
        comp = D.connected_components(pairs, src="id1", dst="id2")
        comp.select(
            F.col("doc_id").alias("vec_id"), "cluster_id"
        ).write.mode("overwrite").parquet(f"{path}/components")
        pr = D.pagerank_undirected(pairs, src="id1", dst="id2", iters=2)
        pr.write.mode("overwrite").parquet(f"{path}/ranks")
        # both relations are on disk — free the build's checkpoints
        D._release_frame(comp)
        D._release_frame(pairs)

    return ensure_artifact(spark, "neardup_graph", sf_dir, build)


@register(
    "dedup_embedding_lsh",
    oracle=_lsh_dedup_oracle(),
    tags=("llm", "dedup", "embedding", "lsh"),
    changed=13,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-free embedding near-dup pairs (cosine >= 0.4): sign-LSH
    banding generates the candidate pairs instead of the label
    blocking `dedup_embedding_cosine` relies on — the corpus-scale
    path when no grouping column exists. Candidate cost scales with
    bucket occupancy, never N^2.

    16x4 banding is pinned explicitly: the SQL oracle replicates this
    exact banding, and the operator's corpus-sized auto-sizing
    (`auto_lsh_bands`) would pick different planes for the tiny test
    table and change which candidate pairs exist.

    r11: this row PRICES the shared persisted edge-list build
    (`_neardup_edges_artifact_path`, once per scope) and returns the
    pairs read BACK from the artifact at threshold 0.4 — the value
    hash proves the round-trip, and the graph consumers (degree,
    triangles, PageRank x2, link prediction, modality agreement)
    serve from the same build. The oracle still replays the full
    banding + rescore in SQL, so a MATCH proves artifact == live
    computation."""
    path = _neardup_edges_artifact_path(spark, sf_dir)
    return S.read_neardup_edges(spark, path, threshold=0.4)


_KM_SQ = (
    "CAST(list_sum(list_transform(list_zip(q.qv, {C}.s), "
    "p -> ({C}.c*p[1]-p[2])*({C}.c*p[1]-p[2]))) AS DOUBLE) "
    "/ CAST({C}.c*{C}.c AS DOUBLE)"
)


def _km_assign(name: str, cent: str) -> str:
    sq = _KM_SQ.format(C=cent)
    return f"""{name} AS (
      SELECT vec_id, cluster, qv, dist_key FROM (
        SELECT q.vec_id, {cent}.cluster, q.qv, {sq} AS dist_key,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {sq}, {cent}.cluster) AS rn
        FROM q CROSS JOIN {cent}) t WHERE rn = 1)"""


def _km_update(a: str, prev: str, nxt: str) -> str:
    return f"""{nxt}d AS (
      SELECT cluster, pos, CAST(SUM(qv[pos]) AS BIGINT) AS s_d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {a}, UNNEST(range(1, 65)) AS r(pos)
      GROUP BY cluster, pos),
    {nxt}u AS (
      SELECT cluster, list(s_d ORDER BY pos) AS s, any_value(c) AS c
      FROM {nxt}d GROUP BY cluster),
    {nxt} AS (
      SELECT {prev}.cluster, COALESCE({nxt}u.s, {prev}.s) AS s,
             COALESCE({nxt}u.c, {prev}.c) AS c
      FROM {prev} LEFT JOIN {nxt}u ON {prev}.cluster = {nxt}u.cluster)"""


def _km_chain_cte() -> str:
    """Composable CTE chain ending in ``af`` (vec_id, cluster, qv,
    dist_key): the full 2-iteration deterministic quantized k-means
    over the embeddings table. NOTE: claims the CTE name ``q`` for
    the quantized vectors."""
    return f"""q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT)) AS qv
      FROM embeddings),
    c0 AS (
      SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cluster,
             qv AS s, CAST(1 AS BIGINT) AS c
      FROM (SELECT * FROM q ORDER BY vec_id LIMIT 8)),
    {_km_assign("a1", "c0")},
    {_km_update("a1", "c0", "c1")},
    {_km_assign("a2", "c1")},
    {_km_update("a2", "c1", "c2")},
    {_km_assign("af", "c2")}"""


def _kmeans_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted label-free k-means build (k=8, 2 Lloyd
    rounds, scale 1024 — the registry's shared coarse quantizer) for
    this (process, scale factor): assignment hive-partitioned by
    learned cluster + exact-integer centroids + manifest. Same
    contract as the ANN artifact helpers (`ensure_artifact`). One
    build serves every consumer of the same quantizer: the unlabeled
    IVF search, SemDeDup pair generation, the cluster-purity audit,
    and the "today" side of the centroid-drift monitor."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.kmeans_build_artifact(emb, path, k=8, iters=2, scale=1024)

    return ensure_artifact(spark, "kmeans8", sf_dir, build)


def _kmeans_old_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Yesterday's-slice twin of the shared k-means artifact: the
    SAME deterministic build over the frozen ``vec_id < 300`` slice
    — what a nightly refresh would have persisted from yesterday's
    corpus. The drift monitor compares this stored codebook against
    the LIVE one (`_kmeans_artifact_path`); rebuilding yesterday's
    chain per invocation priced ~2.5 s/run at sf0.1 for a k-sized
    compare (r11 bench). Its only consumer is the drift query, so
    that query's COLD run carries this build — the standard
    first-toucher pricing."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.kmeans_build_artifact(
            emb.filter(F.col("vec_id") < 300), path, k=8, iters=2,
            scale=1024,
        )

    return ensure_artifact(spark, "kmeans8_old", sf_dir, build)


def _minhash_pairs_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted TEXT-side MinHash-LSH pair artifact
    (shingle_n=3, MinHash(8), bands 4x2, floor 0.0 — audit-grade:
    every band-bucket candidate with its signature-agreement count
    and exact Jaccard) for this (process, scale factor). SEVEN
    consumers serve from it: the pair report (`dedup_minhash_lsh`,
    which prices the build in its cold run as the usual first
    toucher), clusters, the cluster census, the per-source dup-rate
    report, modality agreement's text side, the keeplist cut — each
    a (d1, d2, jac) projection at its own jac >= threshold — and
    the sketch-accuracy audit, which derives est/err from the
    stored statistics. Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        D.minhash_pairs_build_artifact(
            _load(spark, sf_dir, "documents"), path,
            shingle_n=3, num_hashes=_MINHASH_K, band_size=_BAND,
            min_jac=0.0,
        )

    return ensure_artifact(spark, "minhash_pairs", sf_dir, build)


def _containment_pairs_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted containment-pair sufficient-statistics
    artifact ((lang, source)-blocked, shingle_n=3, floor 0.5 — the
    params every registered containment consumer uses). Three
    consumers derive their scores from the stored exact integers:
    the directed report (`dedup_ngram_containment`, the first
    toucher that prices the build), the min-side report
    (`dedup_containment`), and the keeplist cut
    (`dedup_containment_keeplist`). Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        D.containment_pairs_build_artifact(
            _load(spark, sf_dir, "documents"), path,
            block_cols=["lang", "source"], shingle_n=3, min_score=0.5,
        )

    return ensure_artifact(spark, "contain_pairs", sf_dir, build)


def _minhash_index_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted CORPUS-side MinHash signature index
    (bands + shingles, the standing relations a nightly ingest keeps
    between batches) for the incremental-dedup demo's corpus slice
    (doc_id % 10 != 0). `dedup_incremental_batch` probes it with a
    live batch side and prices the build as first toucher. Contract
    in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        d = _load(spark, sf_dir, "documents")
        D.minhash_index_build_artifact(
            d.filter(F.col("doc_id") % 10 != 0), path,
            shingle_n=3, num_hashes=_MINHASH_K, band_size=_BAND,
        )

    return ensure_artifact(spark, "minhash_index", sf_dir, build)


def _minhash_index_cpt_artifact_path(
    spark: SparkSession, sf_dir: str
) -> str:
    """Ensure a signature index that has lived the FULL nightly
    lifecycle — base build on two thirds of the corpus slice, a
    transactional append of the remaining third, then
    `minhash_index_compact` folding the batch back into one
    ``part=base`` per relation. The compact probe reads it; its
    oracle is the same full bipartite replay as the plain index
    probe, so a MATCH proves compaction preserved the logical
    relation. Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        d = _load(spark, sf_dir, "documents")
        cor = d.filter(F.col("doc_id") % 10 != 0)
        D.minhash_index_build_artifact(
            cor.filter(F.col("doc_id") % 3 != 1), path,
            shingle_n=3, num_hashes=_MINHASH_K, band_size=_BAND,
        )
        D.minhash_index_append(
            cor.filter(F.col("doc_id") % 3 == 1), path, "ingest1",
            shingle_n=3, num_hashes=_MINHASH_K, band_size=_BAND,
        )
        D.minhash_index_compact(spark, path)

    return ensure_artifact(spark, "minhash_index_cpt", sf_dir, build)


@register(
    "dedup_index_compact_probe",
    oracle=_INCR_BATCH_ORACLE,
    tags=("llm", "dedup", "minhash", "lsh", "incremental", "compact"),
    since=12,
    changed=14,
)
def dedup_index_compact_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compaction for the SIGNATURE index — the maintenance verb that
    finishes the nightly-dedup lifecycle (build -> transactional
    append -> compact), the text-side twin of
    `similarity_ivfpq_compact_probe`: after months of appends the
    index is 1+N partition directories; `minhash_index_compact`
    rewrites each relation's committed view as one ``part=base``
    (crash-safe two-rename swap with a ``*_precompact`` fallback,
    consumed batch markers cleared) so probes stop listing N+1
    directories. The probed index here was built on two thirds of
    the corpus slice, appended the remaining third, and compacted —
    and the oracle is the SAME full bipartite replay as
    `dedup_incremental_batch`, so a MATCH proves storage-level
    folding equals the never-compacted computation."""
    d = _load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_vs_index(
        d.filter(F.col("doc_id") % 10 == 0),
        _minhash_index_cpt_artifact_path(spark, sf_dir),
        num_hashes=_MINHASH_K,
        band_size=_BAND,
        threshold=0.5,
    )


def _corpus_grams_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted tokenized-corpus relations (docstats /
    shingles / tokens / grams / pairs / unigrams — the tokenize-once
    layout every n-gram and token report reads from r12 on).
    `text_corpus_grams_artifact` prices the build as first toucher;
    the statistic consumers then run corpus-free.

    r14 (the grams cold-column diet, verdict Next #6 extended): the
    full-corpus artifact is a SNAPSHOT of the compacted lifecycle
    artifact (`_corpus_grams_cpt_artifact_path`), not a second
    full-corpus tokenize. Grams has NO training step, so
    compact(build(3/4) + append(1/4)) is LOGICALLY IDENTICAL to
    build(full): tokenize is per-doc deterministic, the count
    relations are per-doc folds whose partial sums over disjoint doc
    batches are the corpus sums (batch-split invariance is property-
    tested, `tests/test_text.py`), and the compact probe's
    full-replay census MATCH pins the equality at 3 SFs every
    rotation. One corpus tokenize now prices the whole grams family
    (build + both lifecycle probes) instead of two. This inversion
    is exactly the production flow: the standing nightly-ingest
    artifact IS the source of truth — a "full rebuild" is a
    snapshot of it, not a re-scan of the corpus. (Trained families
    — OPQ/IVF-PQ codebooks — can NOT do this: their inc artifacts
    train on the old corpus only, so their full builds are genuinely
    different models; see the r13 taxonomy in SCALING.md.)"""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        _snapshot_artifact(
            _corpus_grams_cpt_artifact_path(spark, sf_dir), path
        )

    return ensure_artifact(spark, "corpus_grams", sf_dir, build)


@register(
    "text_corpus_grams_artifact",
    changed=14,
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    shc AS (
      SELECT CAST(COALESCE(SUM(
               CASE WHEN len(w) >= 3 THEN
                 len(list_distinct(list_transform(range(1, len(w)-1),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))))
               ELSE 0 END), 0) AS BIGINT) AS n_shingle_rows
      FROM norm),
    tkc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_token_rows FROM (
        SELECT DISTINCT doc_id, unnest(w) AS tok FROM norm) t),
    ugc AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_unigram_rows
      FROM (SELECT unnest(w) AS tok FROM norm) t),
    gmc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_gram_rows FROM (
        SELECT DISTINCT doc_id, n, gram FROM (
          SELECT doc_id, 2 AS n,
                 unnest(list_transform(range(1, len(w)),
                     i -> concat_ws(' ', w[i], w[i+1]))) AS gram
          FROM norm WHERE len(w) >= 2
          UNION ALL
          SELECT doc_id, 3 AS n,
                 unnest(list_transform(range(1, len(w)-1),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS gram
          FROM norm WHERE len(w) >= 3) g) t),
    prc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pair_rows FROM (
        SELECT DISTINCT d.d AS off, w[i.i] AS w1, w[i.i + d.d] AS w2
        FROM norm,
             UNNEST(range(1, 3)) AS d(d),
             UNNEST(range(1, len(w) + 1)) AS i(i)
        WHERE i.i + d.d <= len(w)) t),
    dsc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT dsc.n_docs, shc.n_shingle_rows, tkc.n_token_rows,
           gmc.n_gram_rows, prc.n_pair_rows, ugc.n_unigram_rows,
           3 AS shingle_n, 2 AS pmi_window
    FROM dsc CROSS JOIN shc CROSS JOIN tkc CROSS JOIN gmc
    CROSS JOIN prc CROSS JOIN ugc
    """,
    tags=("llm", "text", "artifact", "ngram"),
    since=12,
)
def text_corpus_grams_artifact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Build half of build-once / probe-many for the TOKENIZED-CORPUS
    family: tokenize/shingle/pair-count the corpus once and persist
    the six gram relations (`operators/text.py:
    corpus_grams_build_artifact`). Returns a one-row census — row
    count of every stored relation plus the manifest params read back
    from the sidecar — whose oracle recomputes each count from the
    LIVE tokenize pipeline, so a MATCH proves every relation
    round-tripped complete (the contents themselves are pinned
    value-for-value by the eight consumers' full-replay oracles).
    The tokenize/shingle/pair passes are priced HERE and nowhere
    else; every n-gram/token report (eval burn, crossdoc mass,
    source overlap, novelty, repetition, TF-IDF, DSIR, PMI) reads
    the stored relations only."""
    path = _corpus_grams_artifact_path(spark, sf_dir)
    man = S.read_artifact_manifest(spark, path)
    rels = {
        name: T.read_corpus_grams(spark, path, name)
        for name in (
            "docstats", "shingles", "tokens", "grams", "pairs",
            "unigrams",
        )
    }
    one = lambda df, alias: F.broadcast(  # noqa: E731
        df.agg(F.count(F.lit(1)).cast("long").alias(alias))
    )
    return (
        one(rels["docstats"], "n_docs")
        .crossJoin(one(rels["shingles"], "n_shingle_rows"))
        .crossJoin(one(rels["tokens"], "n_token_rows"))
        .crossJoin(one(rels["grams"], "n_gram_rows"))
        .crossJoin(one(rels["pairs"], "n_pair_rows"))
        .crossJoin(one(rels["unigrams"], "n_unigram_rows"))
        .select(
            "*",
            F.lit(man["shingle_n"]).cast("int").alias("shingle_n"),
            F.lit(man["pmi_window"]).cast("int").alias("pmi_window"),
        )
    )


def _corpus_grams_inc_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure a tokenized-corpus artifact that has lived an ingest
    day: base build on three quarters of the corpus, then a
    TRANSACTIONAL append of the remaining quarter
    (`corpus_grams_append` — the nightly delta job that tokenizes
    only its batch, r12 verdict Next #1). The append probe reads it
    uncompacted, so the committed-partition pruning AND the
    merge-on-read SUM of the count relations are both on the hook.
    Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        d = _load(spark, sf_dir, "documents")
        T.corpus_grams_build_artifact(
            d.filter(F.col("doc_id") % 4 != 3), path,
            shingle_n=3, pmi_window=2,
        )
        T.corpus_grams_append(
            d.filter(F.col("doc_id") % 4 == 3), path, "ingest1",
            shingle_n=3, pmi_window=2,
        )

    return ensure_artifact(spark, "corpus_grams_inc", sf_dir, build)


def _corpus_grams_cpt_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure a tokenized-corpus artifact that has lived the FULL
    nightly lifecycle — base build on three quarters, transactional
    append of the last quarter, then `corpus_grams_compact` folding
    the batch (and the count relations' partial sums) back into one
    ``part=base`` per relation.

    The pre-compaction state is a SNAPSHOT of the append-lifecycle
    artifact (`_corpus_grams_inc_artifact_path`) rather than a second
    from-scratch tokenize — truer to production (maintenance runs ON
    the standing index, never on a rebuild) and it prices the corpus
    tokenize once across the two lifecycle probes; compaction's
    storage folding is what THIS artifact exists to prove, and its
    oracle replays the full pipeline regardless. Contract in
    `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        _snapshot_artifact(
            _corpus_grams_inc_artifact_path(spark, sf_dir), path
        )
        T.corpus_grams_compact(spark, path)

    return ensure_artifact(spark, "corpus_grams_cpt", sf_dir, build)


def _snapshot_artifact(src: str, dst: str) -> None:
    """Copy a standing artifact into a new root for an independent
    lifecycle, under the SOURCE's writer claim (a concurrent append
    mid-copy would otherwise tear a committed partition into the
    copy: its marker copied whole, its files partial). The source's
    ``_done`` marker is EXCLUDED: `ensure_artifact` writes the
    destination's own marker after the whole build succeeds — copying
    the source's would make a crash mid-copytree look like a
    completed build to every later process (r14 self-review; the
    marker must always be the LAST thing written)."""
    import shutil

    from ..operators.artifacts import _writer_claim

    with _writer_claim(src):
        shutil.copytree(
            src, dst, dirs_exist_ok=True,
            ignore=shutil.ignore_patterns("_done"),
        )


def _grams_lifecycle_census(spark: SparkSession, path: str) -> DataFrame:
    """One row per tokenized-corpus relation: (relation, n_rows,
    mass) where mass is the relation's exact count total (docstats:
    total tokens; shingles: global distinct shingles; tokens /
    unigrams: total token instances; grams / pairs: total gram /
    pair instances). Row counts pin the key sets; masses pin the
    MERGED count values — an append double-committed, a batch lost,
    or a partial-sum merge gone wrong each moves at least one cell.
    All six aggregates are statistic-sized scans of the artifact; the
    corpus is never touched."""
    rels = {
        name: T.read_corpus_grams(spark, path, name)
        for name in (
            "docstats", "shingles", "tokens", "grams", "pairs",
            "unigrams",
        )
    }

    def census(name: str, df: DataFrame, mass) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(mass, F.lit(0)).cast("long").alias("mass"),
        ).select(F.lit(name).alias("relation"), "n_rows", "mass")

    out = census("docstats", rels["docstats"], F.sum("n_words"))
    for name, mass in (
        ("shingles", F.countDistinct("shingle")),
        ("tokens", F.sum("tf")),
        ("grams", F.sum("cnt")),
        ("pairs", F.sum("n_pair")),
        ("unigrams", F.sum("n_w")),
    ):
        out = out.unionAll(census(name, rels[name], mass))
    return out


_GRAMS_LIFECYCLE_ORACLE = f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(w)-1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
      FROM norm WHERE len(w) >= 3),
    tok AS (SELECT doc_id, unnest(w) AS token FROM norm),
    gm AS (
      SELECT doc_id, 2 AS n,
             unnest(list_transform(range(1, len(w)),
                 i -> concat_ws(' ', w[i], w[i+1]))) AS gram
      FROM norm WHERE len(w) >= 2
      UNION ALL
      SELECT doc_id, 3 AS n,
             unnest(list_transform(range(1, len(w)-1),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS gram
      FROM norm WHERE len(w) >= 3),
    pr AS (
      SELECT d.d AS off, w[i.i] AS w1, w[i.i + d.d] AS w2
      FROM norm,
           UNNEST(range(1, 3)) AS d(d),
           UNNEST(range(1, len(w) + 1)) AS i(i)
      WHERE i.i + d.d <= len(w))
    SELECT 'docstats' AS relation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(len(w)), 0) AS BIGINT) AS mass FROM norm
    UNION ALL
    SELECT 'shingles', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT shingle) AS BIGINT) FROM sh
    UNION ALL
    SELECT 'tokens',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT doc_id, token FROM tok) t),
           CAST(COUNT(*) AS BIGINT) FROM tok
    UNION ALL
    SELECT 'grams',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT doc_id, n, gram FROM gm) t),
           CAST(COUNT(*) AS BIGINT) FROM gm
    UNION ALL
    SELECT 'pairs',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT off, w1, w2 FROM pr) t),
           CAST(COUNT(*) AS BIGINT) FROM pr
    UNION ALL
    SELECT 'unigrams', CAST(COUNT(DISTINCT token) AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM tok
    """


@register(
    "text_corpus_grams_append_probe",
    oracle=_GRAMS_LIFECYCLE_ORACLE,
    tags=("llm", "text", "artifact", "ngram", "incremental"),
    since=13,
    changed=14,
)
def text_corpus_grams_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ingest for the tokenized-corpus artifact (r12
    verdict Next #1): the probed artifact was built on three
    quarters of the corpus and a nightly batch (the last quarter)
    was APPENDED transactionally — tokenizing only itself, O(batch)
    — with the count relations stored as per-batch partial sums.
    The census reads the UNCOMPACTED artifact, so both the
    committed-partition pruning and the merge-on-read SUM are
    exercised; the oracle replays the full-corpus tokenize pipeline,
    and a MATCH proves build-on-old + tokenize-new + merge equals
    the from-scratch build on every relation's key set AND count
    total (the merge is exact because both counting passes are
    per-doc folds — partial sums over disjoint doc batches are the
    corpus sums)."""
    return _grams_lifecycle_census(
        spark, _corpus_grams_inc_artifact_path(spark, sf_dir)
    )


@register(
    "text_corpus_grams_compact_probe",
    oracle=_GRAMS_LIFECYCLE_ORACLE,
    tags=("llm", "text", "artifact", "ngram", "incremental", "compact"),
    since=13,
    changed=14,
)
def text_corpus_grams_compact_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compaction for the tokenized-corpus artifact — the
    maintenance verb that finishes its nightly lifecycle (build ->
    transactional append -> compact), twin of
    `dedup_index_compact_probe`: `corpus_grams_compact` folds the
    committed batches into one ``part=base`` per relation and
    MATERIALIZES the count relations' SUM merge, so post-compaction
    probes skip the merge shuffle and stop listing N+1 partition
    directories. Same census + same full-replay oracle as the
    append probe, so a MATCH proves storage-level folding preserved
    every relation's logical contents."""
    return _grams_lifecycle_census(
        spark, _corpus_grams_cpt_artifact_path(spark, sf_dir)
    )


@register(
    "embedding_kmeans_assign",
    changed=10,
    oracle=f"""
    WITH {_km_chain_cte()}
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           round(dist_key / 1048576.0, 6) AS dist
    FROM af
    """,
    tags=("llm", "embedding", "kmeans", "ivf", "iterative"),
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-free IVF build: 2 Lloyd iterations of deterministic
    quantized k-means (k=8) over the embeddings — exact integer
    centroid sums, IEEE-identical distance keys, so the iterative
    algorithm itself is value-hash-verifiable against the unrolled
    SQL oracle. Produces the cluster column `cosine_topk_ivf`
    consumes when no label exists.

    r10: this row now PRICES the shared persisted build
    (`_kmeans_artifact_path`, once per process) and returns the
    assignment read BACK from the artifact, so the value hash proves
    the round-tripped index; the downstream consumers (unlabeled IVF
    search, SemDeDup, purity, drift) probe the same artifact."""
    path = _kmeans_artifact_path(spark, sf_dir)
    return _read_pq(spark, f"{path}/assign").select(
        "vec_id", "cluster", "dist"
    )


@register(
    "embedding_norm_stats",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vectors,
           MIN(round({_sql_norm("embedding")}, 6)) AS min_norm,
           MAX(round({_sql_norm("embedding")}, 6)) AS max_norm
    FROM embeddings GROUP BY label
    """,
    tags=("llm", "similarity", "stats"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm distribution of the embedding corpus."""
    return S.norm_stats(_load(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_BPE_SPLIT = (
    r"list_filter(regexp_split_to_array("
    r"regexp_replace(lower(text), '([0-9]+|[^a-z0-9\s]+)', ' \1 ', 'g'),"
    r" '\s+'), p -> p <> '')"
)


@register(
    "text_token_stats",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, {_WORDS} AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           len({_BPE_SPLIT}) AS n_bpe_tokens,
           length(text) AS n_chars,
           len(list_distinct(w)) AS n_unique_tokens,
           round(CAST(length(text) AS DOUBLE) / CAST(len(w) AS DOUBLE), 6)
             AS chars_per_token
    FROM base
    """,
    tags=("llm", "text", "stats"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts (whitespace + BPE-ish), char counts,
    vocabulary size."""
    return T.token_stats(_load(spark, sf_dir, "documents"))


def _sql_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return f"len(list_filter(w, x -> x IN ({words})))"


@register(
    "text_quality_score",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
    m AS (
      SELECT doc_id,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio,
             CAST({" + ".join(_sql_stop_hits(lang) for lang in T.STOPWORDS)} AS DOUBLE)
               / greatest(CAST(len(w) AS DOUBLE), 1.0) AS stop_ratio,
             CAST(len(list_distinct(w)) AS DOUBLE)
               / greatest(CAST(len(w) AS DOUBLE), 1.0) AS ttr,
             CAST(CASE WHEN len(w) BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END
                  AS DOUBLE) AS length_ok
      FROM base)
    SELECT doc_id,
           round(alpha_ratio, 6) AS alpha_ratio,
           round(stop_ratio, 6) AS stop_ratio,
           round(ttr, 6) AS type_token_ratio,
           length_ok,
           round(alpha_ratio * 0.4 + least(stop_ratio * 4, 1.0) * 0.2
                 + ttr * 0.2 + length_ok * 0.2, 6) AS quality_score
    FROM m
    """,
    tags=("llm", "text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score (alpha ratio, stopword ratio,
    type-token ratio, length band)."""
    return T.quality_score(_load(spark, sf_dir, "documents"))


_LANG_SCORES = ",\n           ".join(
    f"{_sql_stop_hits(lang)} AS score_{lang}" for lang in T.STOPWORDS
)
_BEST = "greatest(score_en, score_es, score_de, score_fr)"
_PRED = (
    f"CASE WHEN {_BEST} <= 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{lang} = {_BEST} THEN '{lang}'"
        for lang in ("en", "es", "de", "fr")
    )
    + " END"
)


@register(
    "text_lang_id",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    scored AS (
      SELECT doc_id,
           {_LANG_SCORES}
      FROM base)
    SELECT doc_id, score_en, score_es, score_de, score_fr,
           {_PRED} AS pred_lang
    FROM scored
    """,
    tags=("llm", "text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with deterministic tie-breaking."""
    return T.lang_id(_load(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle=f"""
    WITH {_SHINGLES_CTE}
    SELECT n.doc_id,
           md5({_NORM.replace("text", "d.text")}) AS content_md5,
           coalesce(array_to_string(
             list_sort(list_transform(s.shingles, x -> md5(x)))[1:3], '|'), '')
             AS winnow_fp
    FROM norm n
    JOIN documents d ON d.doc_id = n.doc_id
    LEFT JOIN sh s ON s.doc_id = n.doc_id
    """,
    tags=("llm", "text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint (3 smallest shingle hashes) +
    content md5."""
    return T.fingerprint(_load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata projection (binary column itself is
    pruned from the scan — columnar fast path)."""
    mm = M.attach_binary_payload(_load(spark, sf_dir, "documents"))
    return M.metadata_only(mm).select(
        "doc_id", "mime", "modality", "byte_len", "content_md5"
    )


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5,
           concat('text:', CAST(octet_length(encode(text)) AS VARCHAR), ':',
                  lower(hex(encode(substr(text, 1, 8)))), ':',
                  lower(hex(encode(substr(text, greatest(length(text) - 7, 1), 8)))))
             AS feature
    FROM documents
    """,
    tags=("llm", "multimodal", "pandas_udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/featurize stage (stubbed codec, real Arrow
    plumbing) — verified value-for-value against the SQL oracle."""
    mm = M.attach_binary_payload(_load(spark, sf_dir, "documents"))
    return M.extract_features(mm)


# ---------------------------------------------------------------------------
# Composed end-to-end pipeline
# ---------------------------------------------------------------------------


@register(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, source, lang, n_chars,
             md5({_NORM}) AS fp,
             len({_WORDS}) AS n_tokens
      FROM documents),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM norm),
    flagged AS (
      SELECT source,
             (rn = 1 AND lang = 'en'
              AND n_chars BETWEEN 100 AND 2000) AS kept,
             (rn > 1) AS dupe,
             n_tokens
      FROM ranked)
    SELECT source,
           COUNT(*) AS n_candidates,
           COUNT(*) FILTER (kept) AS n_kept,
           COUNT(*) FILTER (dupe) AS n_dupes_removed,
           CAST(COALESCE(SUM(n_tokens) FILTER (kept), 0) AS BIGINT) AS tokens_kept
    FROM flagged
    GROUP BY source
    """,
    tags=("llm", "pipeline", "dedup", "quality"),
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning, the operators composed the way a
    training-data job runs them: normalize -> fingerprint -> exact
    dedup (keep lowest doc_id) -> language + length gate -> per-source
    yield accounting.

    Plan shape: one shuffle on the fingerprint (window row_number),
    one on source (final small agg). No UDFs, no collects; at 100 TB
    the fingerprint shuffle is the dedup cost you pay anyway."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions import normalize_text, tokenize

    d = _load(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5(normalize_text(F.col("text"))).alias("fp"),
        F.size(tokenize(F.col("text"))).alias("n_tokens"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = norm.withColumn("rn", F.row_number().over(w))
    kept = (
        (F.col("rn") == 1)
        & (F.col("lang") == "en")
        & F.col("n_chars").between(100, 2000)
    )
    return (
        ranked.select(
            "source",
            kept.alias("kept"),
            (F.col("rn") > 1).alias("dupe"),
            "n_tokens",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
            F.count(F.when(F.col("dupe"), 1)).alias("n_dupes_removed"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("n_tokens"))), F.lit(0)
            ).alias("tokens_kept"),
        )
    )


_PAIRS_CTES = f"""{_SHINGLES_CTE},
    sig AS (
      SELECT doc_id, shingles,
         {_SIG_COLS}
      FROM sh),
    bands AS (
      {_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id),
    pairs AS (
      SELECT c.d1, c.d2
      FROM cand c
      JOIN sh x ON x.doc_id = c.d1
      JOIN sh y ON y.doc_id = c.d2
      WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                  / CAST(len(list_distinct(x.shingles || y.shingles)) AS DOUBLE), 6) >= 0.5)"""


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
    SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
    tags=("llm", "dedup", "clustering", "iterative"),
    changed=13,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clustering: MinHash-LSH pairs -> connected
    components via iterative min-label propagation (each doc labeled
    with the smallest doc_id in its component — the canonical doc a
    training pipeline keeps). The DuckDB oracle computes the same
    components with a recursive transitive-closure CTE. r11: the
    pair list is a pushed-filter scan of the persisted text pair
    artifact — only the min-label iterations run per invocation."""
    pairs = D.read_minhash_pairs(
        spark, _minhash_pairs_artifact_path(spark, sf_dir), threshold=0.5
    )
    return D.connected_components(pairs)


@register(
    "multimodal_dispatch",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(doc_id % 4 AS INT) AS m,
             octet_length(encode(text)) AS byte_len,
             md5(text) AS content_md5,
             text
      FROM documents)
    SELECT doc_id,
           CASE m WHEN 0 THEN 'text' WHEN 1 THEN 'image'
                  WHEN 2 THEN 'audio' ELSE 'video' END AS modality,
           CAST(byte_len AS BIGINT) AS byte_len,
           content_md5,
           CASE m
             WHEN 0 THEN concat('text:', CAST(byte_len AS VARCHAR), ':',
                    lower(hex(encode(substr(text, 1, 8)))), ':',
                    lower(hex(encode(substr(text, greatest(length(text) - 7, 1), 8)))))
             WHEN 1 THEN concat('img:', CAST(byte_len % 640 + 1 AS VARCHAR),
                    'x', CAST(byte_len % 480 + 1 AS VARCHAR), '->224x224')
             WHEN 2 THEN concat('aud:',
                    CAST(greatest(byte_len // 800, 1) AS VARCHAR), 'f@25ms')
             ELSE concat('vid:',
                    CAST(greatest(byte_len // 1024, 1) // 30 + 1 AS VARCHAR),
                    's/30')
           END AS feature
    FROM base
    """,
    tags=("llm", "multimodal", "pandas_udf"),
)
def multimodal_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality corpus through the modality-dispatched
    mapInPandas featurize stage (codec stubs, real Arrow plumbing) —
    every stub's output is value-checked against the SQL oracle."""
    mm = M.attach_mixed_modalities(_load(spark, sf_dir, "documents"))
    return M.extract_features_dispatched(mm)


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
           CASE WHEN doc_id % 2 = 0 THEN doc_id % 31 + 1 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN n_chars % 17 + 1 END AS height,
           CASE WHEN doc_id % 2 = 0 THEN 24 END AS bits_per_pixel,
           CASE WHEN doc_id % 2 = 1 THEN 8000 * (doc_id % 3 + 1) END
             AS sample_rate,
           CASE WHEN doc_id % 2 = 1 THEN n_chars % 256 + 16 END
             AS n_samples,
           CASE WHEN doc_id % 2 = 0
                THEN 54 + ((doc_id % 31 + 1) * 3 + 3) // 4 * 4
                          * (n_chars % 17 + 1)
                ELSE 44 + 2 * (n_chars % 256 + 16) END AS byte_len,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN list_sum(list_transform(
                       range(0, ((doc_id % 31 + 1) * 3 + 3) // 4 * 4
                                * (n_chars % 17 + 1)),
                       i -> (i * 7 + doc_id) % 256))
                ELSE list_sum(list_transform(
                       range(0, n_chars % 256 + 16),
                       i -> (i * 31 + doc_id) % 65536 % 256
                            + (i * 31 + doc_id) % 65536 // 256))
                END AS BIGINT) AS payload_checksum
    FROM documents
    """,
    tags=("llm", "multimodal", "decode", "pandas_udf"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode, no codec library: synthesize_media builds valid
    BMP (even ids) / RIFF-WAVE PCM16 (odd ids) files byte-for-byte,
    decode_media struct-parses the actual bytes back (header fields +
    full pixel/sample-data checksum). The oracle predicts every field
    arithmetically from the doc attributes, so a synthesis/parse
    disagreement at any byte offset fails the hash check. Two chained
    mapInPandas stages — the exact plumbing a PIL/librosa decode
    drops into."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return M.decode_media(M.synthesize_media(d))


@register(
    "sample_stratified_hash",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE CAST(concat('0x', substr(
            md5(concat(source, ':', CAST(doc_id AS VARCHAR))), 1, 12))
          AS BIGINT) % 100
          < CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 25 ELSE 10 END
    """,
    tags=("llm", "sampling"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (md5-bucket, per-source
    rates): reproducible corpus subsets — same rows every run, every
    engine, any partitioning (engine RNG sampling is neither)."""
    from ..operators.sampling import sample_stratified

    d = _load(spark, sf_dir, "documents")
    return sample_stratified(
        d, "source", "doc_id", {"src0": 50, "src1": 25}, default_pct=10
    ).select("doc_id", "source")


@register(
    "sample_uniform_hash",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE CAST(concat('0x', substr(
            md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 100 < 20
    """,
    tags=("llm", "sampling"),
    since=7,
)
def sample_uniform_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain deterministic ~20% uniform sample (md5-bucket on the
    key) — the unstratified primitive under `sample_stratified_hash`:
    same rows every run, every engine, any partitioning, and a doc's
    membership never flips as the corpus grows (engine RNG sampling
    gives none of these). Zero shuffle — a codegen'd filter."""
    from ..operators.sampling import sample_uniform

    d = _load(spark, sf_dir, "documents")
    return sample_uniform(d, "doc_id", 20).select("doc_id", "source")


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS}) AS tok FROM documents),
    hashed AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, {_SIMHASH_BITS // 4})) AS BIGINT) AS h
      FROM toks),
    votes AS (
      SELECT doc_id, COUNT(*) AS n_tokens, {_VOTE_COLS}
      FROM hashed GROUP BY doc_id),
    fp AS (
      SELECT doc_id, CAST({_FP_EXPR} AS BIGINT) AS simhash
      FROM votes),
    blocked AS (
      SELECT d.lang, d.source, f.doc_id, f.simhash
      FROM documents d JOIN fp f ON d.doc_id = f.doc_id)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
             AS hamming
    FROM blocked a JOIN blocked b
      ON a.lang = b.lang AND a.source = b.source
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("llm", "dedup", "simhash", "pairs"),
    since=7,
    changed=13,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS — the search half over the
    `dedup_simhash` fingerprints: within (lang, source) blocks,
    pairs whose 16-bit fingerprints differ in <= 3 bits (Hamming
    distance via one XOR + popcount per pair — the whole point of
    SimHash: similarity collapses to integer bit ops on 2 bytes/doc,
    no shingle sets at compare time). Blocked self-join bounds the
    pair volume by the largest block; at corpus scale the standard
    refinement is Charikar bucketing on fingerprint prefixes, which
    this blocked join is the semantic twin of. r13: the fingerprint
    side reads the persisted `simhash_fps` artifact — the plan is
    fingerprint-table scans, no tokenize fold."""
    path = _simhash_fps_artifact_path(spark, sf_dir)
    return D.simhash_pairs(
        _load(spark, sf_dir, "documents"),
        block_cols=["lang", "source"],
        n_bits=_SIMHASH_BITS,
        max_hamming=3,
        fps=D.read_simhash_fps(
            spark, path, n_bits=_SIMHASH_BITS, n_block_cols=2
        ),
    )


_SIMHASH_PAIRS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS}) AS tok FROM documents),
    hashed AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, {_SIMHASH_BITS // 4})) AS BIGINT) AS h
      FROM toks),
    votes AS (
      SELECT doc_id, COUNT(*) AS n_tokens, {_VOTE_COLS}
      FROM hashed GROUP BY doc_id),
    fp AS (
      SELECT doc_id, CAST({_FP_EXPR} AS BIGINT) AS simhash
      FROM votes),
    blocked AS (
      SELECT d.lang, d.source, f.doc_id, f.simhash
      FROM documents d JOIN fp f ON d.doc_id = f.doc_id)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
             AS hamming
    FROM blocked a JOIN blocked b
      ON a.lang = b.lang AND a.source = b.source
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register(
    "dedup_simhash_lsh",
    oracle=_SIMHASH_PAIRS_ORACLE,
    tags=("llm", "dedup", "simhash", "lsh", "pairs"),
    since=7,
    changed=13,
)
def dedup_simhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash bucketing — the SCALE path for fingerprint
    near-dup search (Charikar-style LSH on the fingerprint): 4 bands
    of 4 bits; by pigeonhole any pair within Hamming 3 shares at
    least one exact band, so the band-bucket join finds EVERY
    qualifying pair with bucket-bounded candidate volume, and the
    popcount verify drops band collisions. The oracle is deliberately
    the EXHAUSTIVE blocked join (`dedup_simhash_pairs`'s oracle): the
    value-hash match IS the proof that banding lost nothing. r13
    (verdict What's-wrong #2): the fingerprints read the persisted
    `simhash_fps` artifact — this was the dedup bench family's last
    live-LSH recompute; the band explode, bucket join, and popcount
    verify now fold over stored 2-byte rows."""
    path = _simhash_fps_artifact_path(spark, sf_dir)
    return D.simhash_lsh_pairs(
        _load(spark, sf_dir, "documents"),
        block_cols=["lang", "source"],
        n_bits=_SIMHASH_BITS,
        max_hamming=3,
        n_bands=4,
        fps=D.read_simhash_fps(
            spark, path, n_bits=_SIMHASH_BITS, n_block_cols=2
        ),
    )


_FH_DIMS = 8
_FH_H = "CAST(concat('0x', substr(md5(tok), 1, 12)) AS BIGINT)"
_FH_COLS = ",\n           ".join(
    f"CAST(SUM(CASE WHEN {_FH_H} % {_FH_DIMS} = {j} THEN "
    f"(CASE WHEN ({_FH_H} // {_FH_DIMS}) % 2 = 0 THEN 1 ELSE -1 END) "
    f"ELSE 0 END) AS BIGINT) AS f{j}"
    for j in range(_FH_DIMS)
)


@register(
    "text_feature_hashing",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
    SELECT doc_id,
           {_FH_COLS}
    FROM toks GROUP BY doc_id
    """,
    tags=("llm", "text", "embedding", "hashing"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) text vectorizer: deterministic
    no-vocabulary embeddings, the bridge from documents to the vector
    similarity operators. Flat f0..f7 columns for the oracle (the
    operator also emits the assembled array column)."""
    from ..operators.text import feature_hash_embedding

    out = feature_hash_embedding(
        _load(spark, sf_dir, "documents"), dims=_FH_DIMS
    )
    return out.drop("embedding")


_PLANT = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR),"
    " '@example.com or https://ex.com/d/', CAST(doc_id AS VARCHAR),"
    " ' tel +1 555-000-', CAST(1000 + doc_id AS VARCHAR))"
)


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PLANT} AS text FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
             'https?://[^\\s]+', '<URL>', 'g'),
             '\\+?\\d[\\d\\- ]{{7,}}\\d', '<PHONE>', 'g') AS clean_text,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_urls,
           len(regexp_extract_all(text, '\\+?\\d[\\d\\- ]{{7,}}\\d')) AS n_phones
    FROM aug
    """,
    tags=("llm", "text", "pii", "privacy"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy scrub with audit counts. The corpus is synthetic and
    PII-free, so deterministic fake PII (email/URL/phone derived from
    doc_id) is planted first — the scrubber must then find and redact
    exactly it, value-checked both engines."""
    from pyspark.sql import functions as F

    from ..operators.text import pii_scrub

    d = _load(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or https://ex.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" tel +1 555-000-"),
            (F.col("doc_id") + 1000).cast("string"),
        ),
    )
    return pii_scrub(d)


_CHUNK, _OVER, _STEP = 32, 4, 28


@register(
    "text_chunking",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    sized AS (
      SELECT doc_id, w,
             CAST(greatest(ceil((len(w) - {_OVER}) / {_STEP}.0), 1) AS INT)
               AS n_chunks
      FROM norm)
    SELECT s.doc_id,
           CAST(gs.i AS INT) AS chunk_id,
           len(w[gs.i * {_STEP} + 1 : gs.i * {_STEP} + {_CHUNK}]) AS n_tokens,
           array_to_string(
             w[gs.i * {_STEP} + 1 : gs.i * {_STEP} + {_CHUNK}], ' ')
             AS chunk_text
    FROM sized s, LATERAL unnest(generate_series(0, s.n_chunks - 1)) AS gs(i)
    """,
    tags=("llm", "text", "chunking"),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (32-token chunks,
    4-token overlap): context-window preparation, rows fan out
    ~n_tokens/28 per doc — all higher-order functions, no UDF."""
    from ..operators.text import chunk_documents

    return chunk_documents(
        _load(spark, sf_dir, "documents"),
        chunk_tokens=_CHUNK,
        overlap=_OVER,
    )


@register(
    "text_fuzzy_title_match",
    oracle="""
    WITH firsts AS (
      SELECT doc_id, lang, source,
             array_to_string(string_split(trim(regexp_replace(lower(text),
               '\\s+', ' ', 'g')), ' ')[1:4], ' ') AS head
      FROM documents)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           levenshtein(a.head, b.head) AS edit_dist
    FROM firsts a JOIN firsts b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 3
    """,
    tags=("llm", "dedup", "fuzzy", "levenshtein"),
)
def text_fuzzy_title_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching on document heads (first 4
    tokens) within (lang, source) blocks — the string-metric
    complement to MinHash (catches small typo-level edits exact
    shingles miss). Levenshtein is identically defined in both
    engines; blocking bounds the pair count."""
    from pyspark.sql import functions as F

    from ..functions import tokenize

    d = _load(spark, sf_dir, "documents")
    firsts = d.select(
        "doc_id",
        "lang",
        "source",
        F.concat_ws(" ", F.slice(tokenize(F.col("text")), 1, 4)).alias(
            "head"
        ),
    )
    a, b = firsts.alias("a"), firsts.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= 3)
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            dist.alias("edit_dist"),
        )
    )


@register(
    "pipeline_decontaminate",
    oracle=f"""
    WITH eval_set AS (
      SELECT * FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT * FROM documents WHERE doc_id % 97 <> 0),
    efp AS (SELECT DISTINCT md5({_NORM}) AS fp FROM eval_set),
    stage1 AS (
      SELECT c.* FROM corpus c
      WHERE md5({_NORM.replace('text', 'c.text')}) NOT IN (SELECT fp FROM efp)),
    esh AS (
      SELECT DISTINCT n.doc_id AS eval_id, unnest(sh.shingles) AS shingle
      FROM (SELECT doc_id, {_WORDS} AS w FROM eval_set) n,
      LATERAL (SELECT list_distinct(list_transform(range(1, len(n.w)-1),
                 i -> concat_ws(' ', n.w[i], n.w[i+1], n.w[i+2]))) AS shingles
               WHERE len(n.w) >= 3) sh),
    csh AS (
      SELECT n.doc_id, unnest(sh.shingles) AS shingle
      FROM (SELECT doc_id, {_WORDS} AS w FROM stage1) n,
      LATERAL (SELECT list_distinct(list_transform(range(1, len(n.w)-1),
                 i -> concat_ws(' ', n.w[i], n.w[i+1], n.w[i+2]))) AS shingles
               WHERE len(n.w) >= 3) sh),
    pairhits AS (
      SELECT c.doc_id FROM csh c JOIN esh e ON c.shingle = e.shingle
      GROUP BY c.doc_id, e.eval_id HAVING COUNT(*) >= 2),
    contaminated AS (SELECT DISTINCT doc_id FROM pairhits)
    SELECT s.doc_id, s.source
    FROM stage1 s
    WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    tags=("llm", "pipeline", "decontamination", "dedup"),
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 97th doc plays the eval set;
    the remaining corpus drops exact fingerprint matches AND docs
    sharing >= 2 distinct 3-gram shingles with any eval doc — the
    paraphrase-level leakage filter a training pipeline runs before
    release. Corpus-linear (no self-join)."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents")
    eval_set = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return D.decontaminate(corpus, eval_set, min_overlap=2).select(
        "doc_id", "source"
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding,
                 v -> abs(CAST(v AS DOUBLE)))) AS max_abs
      FROM embeddings)
    SELECT vec_id, label,
           round(127.0 / max_abs, 6) AS scale,
           array_to_string(list_transform(embedding,
             v -> CAST(CAST(round(CAST(v AS DOUBLE) * (127.0 / max_abs))
                       AS BIGINT) AS VARCHAR)), ',') AS q8
    FROM scaled
    """,
    tags=("llm", "similarity", "quantization"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (per-vector scale =
    127/max|v|): 4x smaller embeddings for the 100 TB tier where
    vector storage and shuffle bytes dominate. All higher-order array
    functions; the quantized codes are flattened to a string for the
    cross-engine hash (DuckDB renders lists differently)."""
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir, "embeddings")
    vabs = F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    max_abs = F.array_max(vabs)
    scale = F.lit(127.0) / max_abs
    q8 = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") * scale).cast("bigint").cast("string"),
    )
    return emb.select(
        "vec_id",
        "label",
        F.round(scale, 6).alias("scale"),
        F.concat_ws(",", q8).alias("q8"),
    )


@register(
    "pipeline_mixture_sample",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    p AS (
      SELECT list_sum(list_transform(list(CAST(n AS DOUBLE) ORDER BY lang),
                                     x -> sqrt(x))) AS wsum,
             CAST(SUM(n) AS BIGINT) AS total
      FROM c),
    r AS (
      SELECT lang,
             CAST(round(least(1.0,
                 (sqrt(CAST(n AS DOUBLE)) / wsum)
                 * ((0.5 * CAST(total AS DOUBLE)) / CAST(n AS DOUBLE)))
               * 1000000) AS BIGINT) AS ppm
      FROM c, p)
    SELECT d.doc_id, d.lang, r.ppm
    FROM documents d JOIN r USING (lang)
    WHERE CAST(concat('0x', substr(
            md5(concat(d.lang, ':', CAST(d.doc_id AS VARCHAR))), 1, 12))
          AS BIGINT) % 1000000 < r.ppm
    """,
    tags=("llm", "sampling", "pipeline", "mixture"),
    since=3,
)
def pipeline_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the multinomial-alpha=0.5
    pretraining recipe): low-resource languages sample at a higher
    rate than proportional, budgeted at half the corpus. Weight
    normalization is a sequential fold over the sorted language list
    and the per-row decision is integer ppm math against an md5
    bucket — deterministic and bit-exact cross-engine end-to-end."""
    from ..operators.sampling import temperature_mixture_sample

    d = _load(spark, sf_dir, "documents")
    return temperature_mixture_sample(
        d, "lang", "doc_id", target_fraction=0.5
    ).select("doc_id", "lang", "ppm")


@register(
    "text_commonness_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents),
    top AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c FROM toks
        GROUP BY tok ORDER BY c DESC, tok LIMIT 20))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CASE WHEN tok IN (SELECT tok FROM top)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS commonness
    FROM toks GROUP BY doc_id
    """,
    tags=("llm", "text", "quality"),
    since=3,
)
def text_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-vocabulary commonness quality signal: fraction of each
    document's tokens inside the corpus top-k vocabulary
    (deterministic count-desc/token-asc tie-break). Pure counts + one
    division — the transcendental-free cousin of a unigram-LM score,
    so the oracle hash-matches bit-for-bit. k=20 here: the synthetic
    corpus has a ~31-token vocabulary, so the production default
    (k=100) would cover every token and score everything 1.0."""
    d = _load(spark, sf_dir, "documents")
    return T.commonness_score(d, k=20)


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    toks AS (
      SELECT doc_id, g.pos AS pos, d.w[g.pos] AS tok
      FROM docs d,
           LATERAL (SELECT unnest(generate_series(1, len(d.w))) AS pos) g),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    lp AS (
      SELECT t.doc_id, t.pos, ln(CAST(f.c AS DOUBLE) / tot.n) AS lp
      FROM toks t JOIN freq f ON t.tok = f.tok CROSS JOIN tot),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             list_sum(list(lp ORDER BY pos)) AS s
      FROM lp GROUP BY doc_id)
    SELECT doc_id, n_tokens, round(-s / n_tokens, 6) AS avg_neg_logprob
    FROM per_doc
    """,
    tags=("llm", "text", "quality"),
    since=3,
    changed=13,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram cross-entropy per document — the perplexity
    proxy (CCNet's reference-LM score with the corpus itself as the
    model). Per-doc sums fold in token-position order in BOTH engines
    (sort_array fold here, list(... ORDER BY pos) in the oracle), so
    accumulation order never depends on partitioning; round(6)
    absorbs last-ulp ln() differences between libm builds.

    head_k=8 (production default 1024) so the head/tail hybrid join
    exercises BOTH branches on the ~31-token synthetic vocabulary —
    the oracle is split-agnostic, proving the hybrid changes the
    plan, never the values.

    r12: the LM side (vocabulary counts + token total) serves from
    the corpus_grams artifact's ``unigrams`` relation; only the
    positional doc side computes live. The oracle replays the full
    live pipeline."""
    d = _load(spark, sf_dir, "documents")
    path = _corpus_grams_artifact_path(spark, sf_dir)
    return T.unigram_logprob_score(
        d, head_k=8,
        vocab_counts=T.read_corpus_grams(spark, path, "unigrams"),
    )


@register(
    "similarity_graph_degree",
    changed=11,
    oracle=f"""
    WITH {_lsh_pairs_cte()},
    base AS (SELECT id1, id2 FROM scored WHERE score >= 0.4),
    ends AS (
      SELECT id1 AS vec_id FROM base
      UNION ALL
      SELECT id2 AS vec_id FROM base),
    deg AS (
      SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS degree
      FROM ends GROUP BY vec_id)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM deg GROUP BY degree
    """,
    tags=("llm", "similarity", "dedup", "stats"),
    since=3,
)
def similarity_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph degree histogram — the dedup-aggressiveness
    tuning report: how many vectors participate in 1, 2, ... near-dup
    relations at the working threshold. Two keyed aggregates over the
    pair list, which is candidate-sized, never corpus-squared.

    r11: the pair list serves from the persisted edge artifact
    (`_neardup_edges_artifact_path`) — one pair-sized parquet scan
    with a pushed-down score filter instead of a per-invocation LSH
    pass; the oracle still replays the full banding + rescore."""
    from pyspark.sql import functions as F

    path = _neardup_edges_artifact_path(spark, sf_dir)
    pairs = S.read_neardup_edges(spark, path, threshold=0.4)
    ends = pairs.select(F.col("id1").alias("vec_id")).unionAll(
        pairs.select(F.col("id2").alias("vec_id"))
    )
    deg = ends.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )


@register(
    "similarity_neardup_edges_artifact",
    oracle=f"""
    WITH {_lsh_pairs_cte()}
    SELECT id1, id2, score,
           16 AS n_planes, 4 AS bits_per_band, 30 AS min_score_x100
    FROM scored WHERE score >= 0.3
    """,
    tags=("llm", "similarity", "graph", "artifact", "lsh"),
    since=11,
    changed=13,
)
def similarity_neardup_edges_artifact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Build half of build-once / probe-many for the GRAPH family:
    run the sign-LSH candidate generator once (signature fold + band
    self-join + exact rescore) and persist the scored edge list at
    the loosest consumer threshold
    (`operators/similarity.neardup_edges_build_artifact`). Returns
    the FULL stored edge relation read BACK from the artifact,
    joined with the params manifest read back from the sidecar — the
    value hash proves the persisted pairs AND the manifest
    round-trip, the same proof shape as
    `similarity_opq_build_artifact`. The LSH pass is priced HERE and
    nowhere else; every graph consumer (degree, triangles, both
    PageRanks, link prediction, modality agreement) reads the index
    relation only."""
    path = _neardup_edges_artifact_path(spark, sf_dir)
    man = S.read_artifact_manifest(spark, path)
    return S.read_neardup_edges(spark, path, threshold=0.3).select(
        "id1",
        "id2",
        "score",
        F.lit(man["n_planes"]).cast("int").alias("n_planes"),
        F.lit(man["bits_per_band"]).cast("int").alias("bits_per_band"),
        F.lit(man["min_score_x100"]).cast("int").alias("min_score_x100"),
    )


def _neardup_edges_inc_artifact_path(
    spark: SparkSession, sf_dir: str
) -> str:
    """Ensure a near-dup edge artifact that has lived an ingest day:
    base LSH build on three quarters of the embedding corpus, then a
    TRANSACTIONAL append of the remaining quarter
    (`neardup_edges_append` — only the batch folds through the
    hyperplanes; candidates band-join against the STORED committed
    signatures, r12 verdict Next #3). The probe reads it uncompacted,
    so the committed-partition pruning is on the hook. Contract in
    `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        old = emb.filter(F.col("vec_id") % 4 != 3)
        S.neardup_edges_build_artifact(
            old, path, n_planes=16, bits_per_band=4, min_score=0.3,
        )
        S.neardup_edges_append(
            emb.filter(F.col("vec_id") % 4 == 3), old, path, "ingest1",
            n_planes=16, bits_per_band=4, min_score=0.3,
        )

    return ensure_artifact(spark, "neardup_edges_inc", sf_dir, build)


@register(
    "similarity_neardup_append_probe",
    oracle=f"""
    WITH {_lsh_pairs_cte()}
    SELECT id1, id2, score FROM scored WHERE score >= 0.3
    """,
    tags=("llm", "similarity", "graph", "artifact", "lsh",
          "incremental"),
    since=13,
    changed=14,
)
def similarity_neardup_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ingest for the near-dup edge artifact (r12
    verdict Next #3): the probed artifact was built on three
    quarters of the embedding corpus and a daily batch (the last
    quarter) was APPENDED transactionally — only the batch folded
    through the hyperplanes; its candidates band-joined against the
    stored committed signatures and the exact rescore touched only
    candidate ids. Returns the full committed edge relation
    (uncompacted: base + batch partitions); the oracle replays the
    FULL-corpus banding + rescore, and a MATCH proves
    build-on-old + append-new equals the from-scratch build — exact
    because band keys are deterministic per vector, so every pair
    the full build finds has either both sides old (in the base
    partition) or >= 1 batch side (in the append partition)."""
    return S.read_neardup_edges(
        spark,
        _neardup_edges_inc_artifact_path(spark, sf_dir),
        threshold=0.3,
    ).select("id1", "id2", "score")


@register(
    "similarity_graph_components_census",
    oracle=f"""
    WITH RECURSIVE {_lsh_pairs_cte()},
    base AS (SELECT id1, id2 FROM scored WHERE score >= 0.4),
    uedges AS (SELECT id1 AS a, id2 AS b FROM base
               UNION SELECT id2, id1 FROM base),
    reach(a, b) AS (
      SELECT a, b FROM uedges
      UNION
      SELECT r.a, e.b FROM reach r JOIN uedges e ON r.b = e.a),
    comp AS (
      SELECT a AS vec_id, least(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a),
    sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY cluster_id)
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY cluster_size
    """,
    tags=("llm", "similarity", "graph", "components", "iterative"),
    since=11,
)
def similarity_graph_components_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup component SIZE histogram over the embedding graph —
    the before-you-delete audit for embedding-level dedup (the twin
    of the text-side `dedup_cluster_census`): a census dominated by
    pairs and triples means tight duplicate groups; a giant
    component means the threshold is transitively gluing unrelated
    docs and canonicalization would destroy data. Min-label
    connected components over the persisted edge artifact (score >=
    0.4), then two node-sized aggregates; the oracle replays the
    closure with a recursive CTE. Serves from the persisted GRAPH
    artifact (`_neardup_graph_artifact_path`) — the plan is one
    node-sized parquet scan + two aggregates; LSH and the closure
    iterations are priced in the graph build, once per scope."""
    path = _neardup_graph_artifact_path(spark, sf_dir)
    comp = _read_pq(spark, f"{path}/components")
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


@register(
    "similarity_graph_adamic_adar",
    oracle=f"""
    WITH {_lsh_pairs_cte()},
    p AS (SELECT id1, id2 FROM scored WHERE score >= 0.3),
    e AS (SELECT id1 AS a, id2 AS b FROM p
          UNION ALL SELECT id2, id1 FROM p),
    deg AS (SELECT a, CAST(COUNT(*) AS DOUBLE) AS d
            FROM e GROUP BY a),
    cn AS (
      SELECT e1.a AS x, e2.a AS y, e1.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.b AND e1.a < e2.a),
    agg AS (
      SELECT cn.x, cn.y,
             CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             list_sum(list(1.0 / ln(dz.d) ORDER BY cn.z)) AS aa
      FROM cn JOIN deg dz ON dz.a = cn.z
      GROUP BY cn.x, cn.y),
    new_p AS (
      SELECT * FROM agg
      WHERE NOT EXISTS (SELECT 1 FROM p
                        WHERE p.id1 = agg.x AND p.id2 = agg.y))
    SELECT x AS id1, y AS id2, common_neighbors,
           round(aa, 6) AS adamic_adar
    FROM new_p
    """,
    tags=("llm", "similarity", "graph", "link-prediction"),
    since=11,
)
def similarity_graph_adamic_adar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Adamic–Adar link prediction over the near-dup graph — the
    hub-discounting upgrade of `similarity_graph_link_prediction`:
    a shared neighbor connected to half the corpus is weak evidence
    that (x, y) are near-dups; a shared niche neighbor is strong.
    Scores non-edges by sum over common neighbors z of 1/ln(deg(z)),
    folding contributions in neighbor-id order on both engines (the
    pagerank determinism discipline) so the float sum is
    IEEE-identical to the oracle's ordered list_sum. Serves from the
    persisted edge artifact; all joins node-keyed and
    pair-list-sized."""
    path = _neardup_edges_artifact_path(spark, sf_dir)
    pairs = S.read_neardup_edges(spark, path, threshold=0.3).select(
        "id1", "id2"
    )
    return S.link_prediction_adamic_adar(pairs)


@register(
    "dedup_embedding_keeplist",
    oracle=f"""
    WITH RECURSIVE {_lsh_pairs_cte()},
    base AS (SELECT id1, id2 FROM scored WHERE score >= 0.4),
    uedges AS (SELECT id1 AS a, id2 AS b FROM base
               UNION SELECT id2, id1 FROM base),
    reach(a, b) AS (
      SELECT a, b FROM uedges
      UNION
      SELECT r.a, e.b FROM reach r JOIN uedges e ON r.b = e.a),
    comp AS (
      SELECT a AS vec_id, least(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a),
    drops AS (SELECT vec_id FROM comp WHERE vec_id <> cluster_id)
    SELECT e.vec_id, e.label
    FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
    """,
    tags=("llm", "dedup", "embedding", "apply", "iterative"),
    since=11,
)
def dedup_embedding_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stage that SHRINKS the corpus on the EMBEDDING side — the
    semantic twin of `dedup_apply_keeplist` (which cuts on MinHash
    text pairs): every non-canonical member of a near-dup component
    (vec_id != its component's min label) becomes a drop row, and the
    surviving corpus is one ANTI JOIN against that duplicate-sized
    drop list. Closes the embedding dedup loop the graph family
    analyzes: edges (detection) -> components (grouping) -> census /
    canonical-rank (audit & choice) -> THIS (the cut). Serves the
    membership from the persisted graph artifact, so the query costs
    one node-sized scan + one anti-join against the corpus; the
    oracle replays banding + recursive closure + the anti-join."""
    path = _neardup_graph_artifact_path(spark, sf_dir)
    comp = _read_pq(spark, f"{path}/components")
    drops = comp.filter(F.col("vec_id") != F.col("cluster_id")).select(
        "vec_id"
    )
    emb = _load(spark, sf_dir, "embeddings")
    return emb.join(F.broadcast(drops), "vec_id", "left_anti").select(
        "vec_id", "label"
    )


@register(
    "similarity_topk_ivf_unlabeled",
    changed=10,
    oracle=f"""
    WITH {_km_chain_cte()},
    corpus AS (
      SELECT e.vec_id, e.embedding, af.cluster
      FROM embeddings e JOIN af USING (vec_id)),
    qq AS (SELECT vec_id AS query_id, embedding AS qvec
           FROM embeddings WHERE vec_id < 20),
    reps AS (
      SELECT cluster, embedding AS rvec FROM (
        SELECT cluster, embedding,
               ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vec_id) AS rn
        FROM corpus) t WHERE rn = 1),
    probes AS (
      SELECT query_id, qvec, cluster FROM (
        SELECT qq.query_id, qq.qvec, r.cluster,
               ROW_NUMBER() OVER (PARTITION BY qq.query_id
                   ORDER BY {_sql_cos("qq.qvec", "r.rvec")} DESC, r.cluster) AS pr
        FROM qq CROSS JOIN reps r) t WHERE pr <= 2),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             {_sql_cos("p.qvec", "c.embedding")} AS score
      FROM corpus c JOIN probes p USING (cluster)
      WHERE c.vec_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, score, rnk FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "ann", "ivf", "kmeans", "iterative"),
    since=3,
)
def similarity_topk_ivf_unlabeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-free ANN END-TO-END: the deterministic quantized k-means
    BUILD (`embedding_kmeans_assign`) feeds the IVF SEARCH
    (`cosine_topk_ivf`) as its cluster column — the full
    index-then-probe lifecycle with no label crutch, verified
    value-for-value by an oracle that unrolls both the two Lloyd
    iterations AND the probe/search in one SQL statement.

    Scale shape: build = per-iteration one-row centroid broadcast +
    one keyed update shuffle (see PLANS.md); search = tiny rep table
    broadcast, candidate join shuffles on cluster id only. The
    assignment output is exactly what you would persist as the IVF
    index at 100 TB; here it flows straight into the search."""
    emb = _load(spark, sf_dir, "embeddings")
    # r10: the index IS persisted now — the shared k-means artifact's
    # ``clustered`` relation (raw vectors laid out BY learned
    # inverted list, FAISS IVFFlat parity; built once per process,
    # priced by `embedding_kmeans_assign`). No Lloyd chain in this
    # plan, no corpus-wide assignment join: the candidate scan's
    # cluster restriction arrives as runtime partition pruning.
    path = _kmeans_artifact_path(spark, sf_dir)
    corpus = _read_pq(spark, f"{path}/clustered")
    return S.cosine_topk_ivf(
        emb.filter(emb.vec_id < 20), corpus, k=5, n_probe=2,
        cluster_col="cluster",
    )


# ---------------------------------------------------------------------------
# Round 3: corpus-structure reports + curriculum/quota stages
# ---------------------------------------------------------------------------


@register(
    "text_crossdoc_ngram_mass",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    dfq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
            FROM ex GROUP BY shingle)
    SELECT ex.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           round(CAST(SUM(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS crossdoc_mass
    FROM ex JOIN dfq USING (shingle)
    GROUP BY ex.doc_id
    """,
    tags=("llm", "text", "dedup", "boilerplate"),
    since=3,
    changed=13,
)
def text_crossdoc_ngram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate mass: per doc, the fraction of its
    distinct 3-gram shingles that occur in >= 2 documents corpus-wide
    — catches template text that pairwise near-dup never flags (no
    single pair is similar, but the spans repeat everywhere). One
    shingle-keyed shuffle (the DF window) + one doc-keyed fold.

    r12: the shingle table serves pre-exploded from the corpus_grams
    artifact — no tokenize/explode in the probe; the oracle replays
    the live shingle pipeline."""
    path = _corpus_grams_artifact_path(spark, sf_dir)
    return T.crossdoc_shingle_mass(
        None, shingles=T.read_corpus_grams(spark, path, "shingles")
    )


@register(
    "pipeline_source_overlap",
    oracle=f"""
    WITH norm AS (SELECT source, {_WORDS} AS w FROM documents),
    sh AS (
      SELECT DISTINCT src, shingle FROM (
        SELECT source AS src,
               unnest(list_distinct(list_transform(range(1, len(w)-1),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
        FROM norm WHERE len(w) >= 3)),
    sizes AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY src),
    shared AS (
      SELECT a.src AS source_a, b.src AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.src < b.src
      GROUP BY 1, 2)
    SELECT source_a, source_b, n_shared,
           round(CAST(n_shared AS DOUBLE)
                 / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.src = source_a
    JOIN sizes sb ON sb.src = source_b
    """,
    tags=("llm", "pipeline", "dedup", "stats", "mixture"),
    since=3,
    changed=13,
)
def pipeline_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix (shared distinct shingles +
    shingle-set Jaccard): the which-crawls-mirror-each-other report a
    mixture designer reads before setting per-source weights. Work
    unit is the distinct (shingle, source) pair — corpus text
    collapses to |shingles| x |sources| rows before any join.

    r12: the (source, shingle) stream serves pre-exploded from the
    corpus_grams artifact; the oracle replays the live shingle
    pipeline."""
    path = _corpus_grams_artifact_path(spark, sf_dir)
    return T.source_shingle_overlap(
        None, shingles=T.read_corpus_grams(spark, path, "shingles")
    )


@register(
    "pipeline_length_buckets",
    oracle=f"""
    WITH t AS (SELECT len({_WORDS}) AS n FROM documents),
    b AS (SELECT n,
                 CAST(CASE WHEN n <= 1 THEN 1
                      ELSE 1 << length(bin(n - 1)) END AS BIGINT) AS bucket
          FROM t)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * CAST(bucket AS DOUBLE)), 6)
             AS fill_ratio
    FROM b GROUP BY bucket
    """,
    tags=("llm", "pipeline", "curriculum", "stats"),
    since=3,
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/packing length census: documents bucketed to the
    next power-of-two token length (the pad-to-bucket batching
    scheme), with per-bucket doc count, token mass, and fill ratio
    (mean tokens / bucket capacity — the padding-waste metric that
    decides whether sequence packing is worth running). The bucket
    is integer bit math (length of bin(n-1)), not log2 — float logs
    at bucket boundaries would flip rows between engines. One
    bucket-keyed aggregate; bucket cardinality is ~log(max tokens),
    so the shuffle is trivially small at any corpus size."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents")
    n = F.size(T.tokenize(F.col("text"))).cast("long")
    t = d.select(n.alias("n"))
    bucket = (
        F.when(F.col("n") <= 1, F.lit(1).cast("long"))
        .otherwise(
            F.expr("CAST(shiftleft(1L, length(bin(n - 1))) AS BIGINT)")
        )
    )
    return (
        t.select("n", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.round(
                F.sum("n").cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.col("bucket").cast("double")
                ),
                6,
            ).alias("fill_ratio"),
        )
    )


@register(
    "pipeline_source_quota",
    oracle=f"""
    WITH base AS (SELECT doc_id, source, text, {_WORDS} AS w FROM documents),
    q AS (
      SELECT doc_id, source,
             round(
               (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                  / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.4
               + least((CAST({" + ".join(_sql_stop_hits(lang) for lang in T.STOPWORDS)} AS DOUBLE)
                        / greatest(CAST(len(w) AS DOUBLE), 1.0)) * 4, 1.0) * 0.2
               + (CAST(len(list_distinct(w)) AS DOUBLE)
                  / greatest(CAST(len(w) AS DOUBLE), 1.0)) * 0.2
               + CAST(CASE WHEN len(w) BETWEEN 10 AND 5000 THEN 1.0
                      ELSE 0.0 END AS DOUBLE) * 0.2
             , 6) AS quality_score
      FROM base),
    r AS (
      SELECT doc_id, source, quality_score,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rnk
      FROM q)
    SELECT source, doc_id, quality_score, rnk FROM r WHERE rnk <= 10
    """,
    tags=("llm", "pipeline", "quality", "mixture"),
    since=3,
)
def pipeline_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality quota: each source contributes at most its
    10 BEST documents by the heuristic quality score (doc_id breaks
    score ties, so the cut is deterministic at the boundary) — the
    domain-cap stage of a corpus mix. The score is a narrow
    projection (source rides through via keep_cols, no join back);
    the quota is one hash shuffle on source + a per-partition rank."""
    from ..operators.sampling import per_group_quota

    d = _load(spark, sf_dir, "documents")
    q = T.quality_score(d, keep_cols=("source",)).select(
        "doc_id", "source", "quality_score"
    )
    return per_group_quota(
        q, "source", "quality_score", "doc_id", 10
    ).select("source", "doc_id", "quality_score", "rnk")


_MD5BUCKET = (
    "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR))), 1, 12))"
    " AS BIGINT) % 100"
)


@register(
    "pipeline_train_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_MD5BUCKET} < 5 THEN 'test'
                WHEN {_MD5BUCKET} < 95 THEN 'train'
                ELSE 'val' END AS split
    FROM documents
    """,
    tags=("llm", "pipeline", "sampling", "split"),
    since=3,
)
def pipeline_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5): each doc
    lands in exactly one split by md5 bucket of its id — reproducible
    across engines and runs, and a doc's split never flips when the
    corpus grows (the property RNG splitters lack). Narrow
    projection, zero shuffle."""
    from ..operators.sampling import split_assign

    d = _load(spark, sf_dir, "documents")
    return split_assign(
        d, "doc_id", {"train": 90, "val": 5, "test": 5}
    ).select("doc_id", "split")


@register(
    "pipeline_eval_carveout",
    oracle="""
    WITH h AS (
      SELECT source, doc_id,
             CAST(concat('0x', substr(md5(concat(source, ':',
                 CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT) AS hv
      FROM documents),
    r AS (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY hv, doc_id) AS BIGINT) AS pick_rank
      FROM h)
    SELECT source, doc_id, pick_rank FROM r WHERE pick_rank <= 5
    """,
    tags=("llm", "pipeline", "sampling"),
    since=3,
)
def pipeline_eval_carveout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen eval-set carve-out: the 5 docs per source with the
    smallest md5(source:id) — an order statistic over a uniform hash,
    so the pick is unbiased-random yet fully reproducible (quota
    takes the BEST docs; this takes RANDOM-but-frozen docs). One
    source-keyed shuffle + rank."""
    from ..operators.sampling import sample_k_per_stratum

    d = _load(spark, sf_dir, "documents")
    return sample_k_per_stratum(d, "source", "doc_id", 5).select(
        "source", "doc_id", "pick_rank"
    )


@register(
    "embedding_quantize_error",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CAST(len(v) AS BIGINT) AS n_dims,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM v),
    c AS (
      SELECT vec_id, v, n_dims, scale,
             list_transform(v, x ->
               CASE WHEN scale > 0
                    THEN greatest(-127.0, least(127.0, round(x / scale)))
                    ELSE 0.0 END) AS codes
      FROM s)
    SELECT vec_id, n_dims,
           round(scale, 6) AS scale,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           round(list_max(list_transform(list_zip(codes, v),
               p -> abs(p[1] * scale - p[2]))), 6) AS max_abs_err
    FROM c
    """,
    tags=("llm", "similarity", "quantization", "storage"),
    since=3,
)
def embedding_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization audit: per-vector scale, code
    checksum, and max reconstruction error — the storage-planning
    report for a float32 -> int8 embedding store (4x fewer bytes at
    100 TB) with known error bounds. Pure array expressions (no UDF);
    scalar outputs so the value hash is float-array-free."""
    return S.quantize_int8_audit(_load(spark, sf_dir, "embeddings"))


@register(
    "pipeline_quality_threshold_adaptive",
    oracle=f"""
    WITH base AS (SELECT doc_id, source, text, {_WORDS} AS w FROM documents),
    q AS (
      SELECT doc_id, source,
             round(
               (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                  / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.4
               + least((CAST({" + ".join(_sql_stop_hits(lang) for lang in T.STOPWORDS)} AS DOUBLE)
                        / greatest(CAST(len(w) AS DOUBLE), 1.0)) * 4, 1.0) * 0.2
               + (CAST(len(list_distinct(w)) AS DOUBLE)
                  / greatest(CAST(len(w) AS DOUBLE), 1.0)) * 0.2
               + CAST(CASE WHEN len(w) BETWEEN 10 AND 5000 THEN 1.0
                      ELSE 0.0 END AS DOUBLE) * 0.2
             , 6) AS quality_score
      FROM base),
    r AS (
      SELECT doc_id, source, quality_score,
             ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY quality_score, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM q),
    th AS (
      SELECT source, quality_score AS threshold
      FROM r WHERE rn = (n + 3) // 4)
    SELECT q.doc_id, q.source, q.quality_score, th.threshold
    FROM q JOIN th USING (source)
    WHERE q.quality_score >= th.threshold
    """,
    tags=("llm", "pipeline", "quality"),
    since=3,
)
def pipeline_quality_threshold_adaptive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Adaptive quality gating: each source keeps docs at or above
    its own 25th-percentile quality (the k-th smallest score with
    k = (n+3) div 4 — a pure-integer discrete quantile, no float
    interpolation to diverge across engines). A fixed global
    threshold over-prunes clean sources and under-prunes noisy ones;
    the per-source threshold prunes each source's own worst quartile.
    One source-keyed window pass + a broadcast threshold join
    (sources-sized)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = _load(spark, sf_dir, "documents")
    q = T.quality_score(d, keep_cols=("source",)).select(
        "doc_id", "source", "quality_score"
    )
    w = Window.partitionBy("source").orderBy(
        F.asc("quality_score"), F.asc("doc_id")
    )
    wn = Window.partitionBy("source")
    r = q.select(
        "doc_id",
        "source",
        "quality_score",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    th = r.filter(
        F.col("rn") == F.expr("(n + 3) div 4")
    ).select("source", F.col("quality_score").alias("threshold"))
    return (
        q.join(F.broadcast(th), "source")
        .filter(F.col("quality_score") >= F.col("threshold"))
        .select("doc_id", "source", "quality_score", "threshold")
    )


@register(
    "pipeline_doc_embedding_audit",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM documents) AS n_docs,
      (SELECT COUNT(*) FROM embeddings) AS n_vecs,
      (SELECT COUNT(*) FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                          WHERE e.vec_id = d.doc_id)) AS n_docs_without_vec,
      (SELECT COUNT(*) FROM embeddings e
        WHERE NOT EXISTS (SELECT 1 FROM documents d
                          WHERE d.doc_id = e.vec_id)) AS n_orphan_vecs
    """,
    tags=("llm", "pipeline", "audit"),
    since=3,
)
def pipeline_doc_embedding_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-join QA gate: doc/embedding counts plus both dangling
    sides (docs with no vector, vectors with no doc) — the referential
    integrity check that runs before any embedding-dependent stage.
    Two anti-joins; at 100 TB both sides shuffle once on the id
    (broadcast only if one side is known-small)."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents").select("doc_id")
    e = _load(spark, sf_dir, "embeddings").select("vec_id")
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    n_vecs = e.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    no_vec = (
        d.join(e, d.doc_id == e.vec_id, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_without_vec"))
    )
    orphan = (
        e.join(d, d.doc_id == e.vec_id, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphan_vecs"))
    )
    return (
        n_docs.crossJoin(n_vecs).crossJoin(no_vec).crossJoin(orphan)
    )


@register(
    "text_boilerplate_strip",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    ex AS (
      SELECT doc_id, p, concat_ws(' ', w[p], w[p+1], w[p+2]) AS gram
      FROM norm, unnest(range(1, len(w)-1)) AS t(p)
      WHERE len(w) >= 3),
    bp AS (
      SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM ex)
      GROUP BY gram HAVING COUNT(*) >= 2),
    cov AS (
      SELECT DISTINCT ex.doc_id, ex.p + d.d AS pos
      FROM ex JOIN bp USING (gram), (VALUES (0), (1), (2)) d(d)),
    toks AS (
      SELECT doc_id, i AS pos, w[i] AS tok
      FROM norm, unnest(range(1, len(w) + 1)) AS t(i)),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t LEFT JOIN cov c
        ON c.doc_id = t.doc_id AND c.pos = t.pos
      WHERE c.doc_id IS NULL),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id)
    SELECT n.doc_id,
           CAST(len(n.w) AS BIGINT) AS n_tokens,
           CAST(len(n.w) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(a.clean_text, '') AS clean_text
    FROM norm n LEFT JOIN agg a USING (doc_id)
    """,
    tags=("llm", "text", "dedup", "boilerplate", "transform"),
    since=3,
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate REMOVAL: tokens inside any 3-gram
    occurring in >= 2 documents corpus-wide are dropped and the text
    is rebuilt in original token order — the C4 repeated-line removal
    idea lifted to corpus level, deleting template spans from every
    document at once with no pairwise similarity work. The transform
    counterpart of text_crossdoc_ngram_mass's report."""
    return T.boilerplate_strip(_load(spark, sf_dir, "documents"))


@register(
    "pipeline_global_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS hx,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) % 8 AS shard
      FROM documents)
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY hx, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    tags=("llm", "pipeline", "sampling", "ordering"),
    since=3,
)
def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order: md5 shard + dense
    within-shard position — a reproducible uniform permutation of the
    corpus with ONE bounded-key shuffle, replacing the full-corpus
    range sort of ORDER BY rand() (and reproducible where rand() is
    not)."""
    from ..operators.sampling import global_shuffle_order

    d = _load(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle_order(d, "doc_id", 8).select(
        "doc_id", "shard", "pos"
    )


@register(
    "text_token_entropy",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents)
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
           round(-list_sum(list_transform(list_sort(list_distinct(w)),
                 t -> (CAST(len(list_filter(w, x -> x = t)) AS DOUBLE)
                       / len(w))
                      * log2(CAST(len(list_filter(w, x -> x = t)) AS DOUBLE)
                             / len(w))))
                 + 0.0, 6) AS entropy_bits
    FROM norm
    """,
    tags=("llm", "text", "quality", "entropy"),
    since=3,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document token-distribution Shannon entropy (bits):
    the intra-doc gibberish/spam gate (low = keyword stuffing /
    two-token loops, high = hash dumps), complementing the
    corpus-relative unigram logprob signal. Narrow projection — no
    shuffle at any corpus size; the fold walks distinct tokens in
    sorted order so float accumulation is engine- and
    partitioning-stable."""
    from ..operators.text import token_entropy

    return token_entropy(_load(spark, sf_dir, "documents"))


@register(
    "embedding_norm_audit",
    oracle=f"""
    WITH n AS (
      SELECT label AS "group",
             CAST(round({_sql_norm('embedding')} * 1000000) AS BIGINT) AS nm
      FROM embeddings)
    SELECT "group",
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN nm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_vec,
           CAST(SUM(CASE WHEN nm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           CAST(SUM(nm) AS BIGINT) AS sum_norm_micros,
           CAST(MIN(nm) AS BIGINT) AS min_norm_micros,
           CAST(MAX(nm) AS BIGINT) AS max_norm_micros,
           round((CAST(SUM(nm) AS BIGINT)
                  / CAST(COUNT(*) - SUM(CASE WHEN nm IS NULL THEN 1
                                        ELSE 0 END) AS DOUBLE))
                 / 1000000, 6) AS avg_norm
    FROM n GROUP BY "group"
    """,
    tags=("llm", "similarity", "audit"),
    since=3,
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-store QA: per-label vector counts + L2-norm stats in
    exact integer micro-units (zero-norm vectors poison cosine stages;
    norm drift flags encoder changes). Vectors never shuffle — only
    scalar (group, nm) rows do."""
    from ..operators.similarity import norm_audit

    return norm_audit(_load(spark, sf_dir, "embeddings"))


@register(
    "pipeline_pack_efficiency",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, CAST(len({_WORDS}) AS BIGINT) AS n_tokens
      FROM documents),
    runs AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks),
    packed AS (
      SELECT source, n_tokens,
             CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
             CAST(cum - n_tokens - ((cum - n_tokens) // 2048) * 2048
                  AS BIGINT) AS pack_offset
      FROM runs)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
           CAST(SUM(CASE WHEN pack_offset + n_tokens > 2048
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
           round(CAST(SUM(n_tokens) AS BIGINT)
                 / (CAST(COUNT(DISTINCT pack_id) AS DOUBLE) * 2048), 6)
             AS fill_ratio
    FROM packed GROUP BY source
    """,
    tags=("llm", "pipeline", "packing", "audit"),
    since=3,
)
def pipeline_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing QA over pipeline_sequence_packing's assignment: per
    source, how many 2048-token packs the corpus fills, how full they
    are, and how many docs straddle a pack boundary (the
    attention-mask hazard the document-boundary variant trades
    against). Re-aggregates the packing output — summary-sized after
    one source-keyed shuffle; exact integer sums, ratio rounded
    last."""
    from pyspark.sql import functions as F

    packed = pipeline_sequence_packing(spark, sf_dir)
    budget = 2048
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct("pack_id").cast("long").alias("n_packs"),
            F.sum(
                (F.col("pack_offset") + F.col("n_tokens") > budget).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("n_straddlers"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "n_packs",
            "n_straddlers",
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("n_packs").cast("double") * budget),
                6,
            ).alias("fill_ratio"),
        )
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH wav AS (
      SELECT doc_id, n_chars % 256 + 16 AS n_samples
      FROM documents WHERE doc_id % 2 = 1),
    fr AS (
      SELECT doc_id, n_samples, CAST(f.fi AS BIGINT) AS frame_idx
      FROM wav,
           unnest(range(0, CAST((n_samples + 63) // 64 AS BIGINT)))
             AS f(fi)
      WHERE f.fi % 2 = 0)
    SELECT doc_id,
           frame_idx,
           CAST(frame_idx * 64 AS BIGINT) AS start_sample,
           CAST(least(64, n_samples - frame_idx * 64) AS BIGINT)
             AS n_in_frame,
           CAST(list_sum(list_transform(
                 range(frame_idx * 64,
                       frame_idx * 64
                       + least(64, n_samples - frame_idx * 64)),
                 i -> (i * 31 + doc_id) % 65536 % 256
                      + (i * 31 + doc_id) % 65536 // 256)) AS BIGINT)
             AS frame_checksum
    FROM fr
    """,
    tags=("llm", "multimodal", "framesample", "pandas_udf"),
    since=3,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal frame sampling over real media bytes: synthesize the
    WAV clips (odd ids), then keep every 2nd 64-sample frame with its
    exact data checksum — the take-every-Nth-frame video shape on the
    codec-free modality. The oracle predicts every kept frame's
    checksum arithmetically, so a single wrong byte boundary in the
    frame walk fails the hash. Row fan-out (clip -> frames) happens
    inside Arrow-batched mapInPandas; output is frame-metadata-sized,
    payloads never leave the stage."""
    d = (
        _load(spark, sf_dir, "documents")
        .filter("doc_id % 2 = 1")
        .select("doc_id", "n_chars")
    )
    return M.frame_sample_audio(M.synthesize_media(d))


@register(
    "multimodal_png_decode",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 13 + 1 AS BIGINT) AS width,
           CAST(n_chars % 11 + 1 AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(2 AS BIGINT) AS color_type,
           CAST(3 * (doc_id % 13 + 1) * (n_chars % 11 + 1) AS BIGINT)
             AS n_raw_bytes,
           CAST(list_sum(list_transform(
                 range(0, 3 * (doc_id % 13 + 1) * (n_chars % 11 + 1)),
                 i -> (i * 7 + doc_id) % 256)) AS BIGINT)
             AS pixel_checksum
    FROM documents
    """,
    tags=("llm", "multimodal", "png", "codec", "pandas_udf"),
    since=14,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The family's first COMPRESSED codec, end-to-end real (r14):
    synthesize a valid RGB8 PNG per document (correct CRCs, DEFLATE
    IDAT split across two chunks, scanlines filtered with the full
    None/Sub/Up/Average/Paeth predictor set cycling by row), then
    decode it back — CRC-verified chunk walk, multi-IDAT reassembly,
    zlib inflate, per-scanline predictor inversion — inside
    Arrow-batched mapInPandas. The oracle predicts every image's
    UNFILTERED pixel checksum arithmetically, so one wrong predictor,
    one mis-assembled chunk, or one bad inflate anywhere fails the
    value hash. BMP/WAV/Y4M proved the uncompressed plumbing;
    JPEG/FLAC remain env-blocked (no PIL/soundfile) — PNG needs only
    stdlib zlib, so the compressed path is no longer hypothetical.
    Payload bytes never leave the stage: only header fields + the
    checksum ship."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return M.png_decode(M.synthesize_png(d))


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    blocked AS (
      SELECT d.lang, d.source, s.doc_id, s.shingles
      FROM documents d JOIN sh s ON d.doc_id = s.doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             round(CAST(len(list_intersect(a.shingles, b.shingles))
                        AS DOUBLE)
                   / least(len(a.shingles), len(b.shingles)), 6)
               AS containment,
             CASE WHEN len(a.shingles) <= len(b.shingles)
                  THEN a.doc_id ELSE b.doc_id END AS smaller
      FROM blocked a JOIN blocked b
        ON a.lang = b.lang AND a.source = b.source
           AND a.doc_id < b.doc_id)
    SELECT d1, d2, containment, CAST(smaller AS BIGINT) AS smaller
    FROM pairs WHERE containment >= 0.5
    """,
    tags=("llm", "dedup", "containment"),
    since=3,
    changed=13,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup detection: flags pairs where
    the smaller doc's shingle set is >= 50% covered by the larger —
    the quote/repost/wrapper relation Jaccard structurally misses
    (full containment of a short doc in a long one scores jac ~ |A|/|B|
    but containment 1.0). Blocked self-join, block-bounded pairs.
    r11: min-side containment and the drop candidate are one-division
    projections over the persisted containment-statistics artifact
    (round(inter/min, 6) == greatest directed score, so the shared
    floor loses nothing); the oracle replays the full pipeline.
    r13: the artifact is partitioned (layout 2) and reads are
    committed-pruned — the serving path of every consumer changed."""
    stats = D.read_containment_pairs(
        spark, _containment_pairs_artifact_path(spark, sf_dir),
        threshold=0.5,
    )
    return stats.select(
        "d1",
        "d2",
        D._contain_min(F.col("inter"), "n1", "n2").alias("containment"),
        F.when(F.col("n1") <= F.col("n2"), F.col("d1"))
        .otherwise(F.col("d2"))
        .cast("long")
        .alias("smaller"),
    )


def _containment_pairs_inc_artifact_path(
    spark: SparkSession, sf_dir: str
) -> str:
    """Ensure a containment-statistics artifact that has lived an
    ingest day: base build on three quarters of the corpus, then a
    TRANSACTIONAL append of the remaining quarter
    (`containment_pairs_append` — only the batch tokenizes; new
    candidates block-join the stored committed shingle relation).
    The probe reads it uncompacted. Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        d = _load(spark, sf_dir, "documents")
        D.containment_pairs_build_artifact(
            d.filter(F.col("doc_id") % 4 != 3), path,
            block_cols=["lang", "source"], shingle_n=3, min_score=0.5,
        )
        D.containment_pairs_append(
            d.filter(F.col("doc_id") % 4 == 3), path, "ingest1",
            block_cols=["lang", "source"], shingle_n=3, min_score=0.5,
        )

    return ensure_artifact(spark, "contain_pairs_inc", sf_dir, build)


@register(
    "dedup_containment_append_probe",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    blocked AS (
      SELECT d.lang, d.source, s.doc_id, s.shingles
      FROM documents d JOIN sh s ON d.doc_id = s.doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             round(CAST(len(list_intersect(a.shingles, b.shingles))
                        AS DOUBLE)
                   / least(len(a.shingles), len(b.shingles)), 6)
               AS containment,
             CASE WHEN len(a.shingles) <= len(b.shingles)
                  THEN a.doc_id ELSE b.doc_id END AS smaller
      FROM blocked a JOIN blocked b
        ON a.lang = b.lang AND a.source = b.source
           AND a.doc_id < b.doc_id)
    SELECT d1, d2, containment, CAST(smaller AS BIGINT) AS smaller
    FROM pairs WHERE containment >= 0.5
    """,
    tags=("llm", "dedup", "containment", "incremental"),
    since=13,
    changed=14,
)
def dedup_containment_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ingest for the containment-statistics artifact —
    the last rebuild-only pair family adopts the shared transactional
    protocol: the probed artifact was built on three quarters of the
    corpus and a nightly batch (the last quarter) was APPENDED
    transactionally (only the batch tokenized; its candidates
    block-joined the stored committed shingle relation). Returns the
    min-side containment report over the full committed pair relation
    (uncompacted: base + batch partitions); the oracle replays the
    FULL-corpus blocked pipeline, and a MATCH proves
    build-on-old + append-new equals the from-scratch build."""
    stats = D.read_containment_pairs(
        spark, _containment_pairs_inc_artifact_path(spark, sf_dir),
        threshold=0.5,
    )
    return stats.select(
        "d1",
        "d2",
        D._contain_min(F.col("inter"), "n1", "n2").alias("containment"),
        F.when(F.col("n1") <= F.col("n2"), F.col("d1"))
        .otherwise(F.col("d2"))
        .cast("long")
        .alias("smaller"),
    )


@register(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    blocked AS (
      SELECT d.lang, d.source, s.doc_id, s.shingles
      FROM documents d JOIN sh s ON d.doc_id = s.doc_id),
    pairs AS (
      SELECT round(CAST(len(list_intersect(a.shingles, b.shingles))
                        AS DOUBLE)
                   / CAST(len(list_distinct(a.shingles || b.shingles))
                          AS DOUBLE), 6) AS jac
      FROM blocked a JOIN blocked b
        ON a.lang = b.lang AND a.source = b.source
           AND a.doc_id < b.doc_id),
    sw AS (
      SELECT CAST(t.threshold AS DOUBLE) AS threshold, jac
      FROM pairs, (VALUES (0.1), (0.2), (0.3), (0.5), (0.7)) t(threshold)
      WHERE jac >= CAST(t.threshold AS DOUBLE))
    SELECT threshold,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(round(jac * 1000000) AS BIGINT))
                      AS BIGINT)
                 / (COUNT(*) * 1000000.0), 6) AS avg_jac
    FROM sw GROUP BY threshold
    """,
    tags=("llm", "dedup", "tuning", "report"),
    since=3,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aggressiveness tuning report: how many near-dup pairs
    (and at what mean similarity) each candidate Jaccard threshold
    would flag — the corpus-wide sweep run BEFORE committing a
    threshold to the pipeline. One blocked pair pass; the sweep is an
    explode over a 5-literal array, so cost is pair-list-sized, and
    the mean folds exact integer jac-micros (accumulation-order-
    immune), divided and rounded last."""
    from pyspark.sql import functions as F

    pairs = D.ngram_jaccard_pairs(
        _load(spark, sf_dir, "documents"),
        ["lang", "source"],
        threshold=0.0,
    )
    thresholds = F.array(*[F.lit(t) for t in (0.1, 0.2, 0.3, 0.5, 0.7)])
    return (
        pairs.select("jac", F.explode(thresholds).alias("threshold"))
        .filter(F.col("jac") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.round(F.col("jac") * 1000000).cast("long"))
            .cast("long")
            .alias("__sj__"),
        )
        .select(
            "threshold",
            "n_pairs",
            F.round(
                F.col("__sj__").cast("double")
                / (F.col("n_pairs").cast("double") * 1000000.0),
                6,
            ).alias("avg_jac"),
        )
    )


# Bloom oracle building blocks. The bitmap width is CORPUS-DERIVED in
# both engines via the identical integer rule (auto_bloom_bits:
# ((greatest(992, n*10) + 61) // 62) * 62), referenced as the scalar
# subquery (SELECT m FROM mb) — one flipped bit OR a one-word sizing
# divergence between Spark and DuckDB fails the value hash.
_BLOOM_MB = "((greatest(992, {n_expr} * 10) + 61) // 62) * 62"
_BLOOM_P = (
    "CAST(concat('0x', substr(fp, {o}, 8)) AS BIGINT) % (SELECT m FROM mb)"
)
_BLOOM_HIT = " AND ".join(
    f"""EXISTS(SELECT 1 FROM words x
        WHERE x.w = ({_BLOOM_P.format(o=1 + 8 * j)}) // 62
          AND (x.word & (CAST(1 AS BIGINT)
               << CAST(({_BLOOM_P.format(o=1 + 8 * j)}) % 62 AS INT))) != 0)"""
    for j in range(3)
)


_BLOOM_GUARD_ORACLE = f"""
    WITH n AS (
      SELECT doc_id, md5({_NORM}) AS fp FROM documents),
    hist AS (SELECT DISTINCT fp FROM n WHERE doc_id % 3 = 0),
    mb AS (SELECT {_BLOOM_MB.format(n_expr="COUNT(*)")} AS m FROM hist),
    hp AS (
      SELECT {_BLOOM_P.format(o=1)} AS p FROM hist
      UNION ALL SELECT {_BLOOM_P.format(o=9)} FROM hist
      UNION ALL SELECT {_BLOOM_P.format(o=17)} FROM hist),
    words AS (
      SELECT p // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 62 AS INT)) AS word
      FROM hp GROUP BY 1)
    SELECT doc_id,
           CAST(CASE WHEN {_BLOOM_HIT} THEN 1 ELSE 0 END AS BIGINT)
             AS bloom_hit,
           CAST(CASE WHEN fp IN (SELECT fp FROM hist) THEN 1 ELSE 0 END
                AS BIGINT) AS true_dup
    FROM n
    """


def _doc_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) normalized-text fingerprints — the bloom family's
    input stream."""
    from pyspark.sql import functions as F

    from ..functions import normalize_text

    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
    )


def _bloom_guard_report(
    fps: DataFrame, hist: DataFrame, bmp: DataFrame
) -> DataFrame:
    """Per-doc Bloom verdict next to ground truth — shared by the
    live-bitmap guard and the artifact-served append probe."""
    from pyspark.sql import functions as F

    from ..operators.scale import bloom_might_contain

    probed = bloom_might_contain(fps, bmp)
    truth = hist.withColumn("__t__", F.lit(1).cast("long"))
    return (
        probed.join(F.broadcast(truth), "fp", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("__t__"), F.lit(0).cast("long")).alias(
                "true_dup"
            ),
        )
    )


@register(
    "dedup_bloom_guard",
    oracle=_BLOOM_GUARD_ORACLE,
    tags=("llm", "dedup", "bloom", "scale"),
    since=3,
)
def dedup_bloom_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-guarded membership against a historical fingerprint set
    (docs with doc_id % 3 = 0 stand in for the prior-ingest corpus):
    per doc, the broadcast-bitmap Bloom verdict next to ground truth.
    bloom_hit is 1 for EVERY true duplicate (no false negatives — the
    invariant that makes the guard sound as a pre-filter); the
    occasional bloom_hit=1/true_dup=0 row is the false positive the
    exact verify join exists to remove. At 100 TB the guard turns the
    nightly batch-vs-corpus dedup join from batch-sized to
    duplicate-sized with one few-MB broadcast and zero shuffle. The
    bitmap width is CORPUS-DERIVED (auto_bloom_bits: ~10 bits per
    history key — no fixed-capacity saturation hazard) and the oracle
    re-derives the same width from its own COUNT(*) before rebuilding
    the identical bitmap bit-for-bit in SQL, so one flipped bit — or
    a sizing divergence — anywhere fails the hash."""
    from ..operators.scale import bloom_bitmap

    fps = _doc_fps(spark, sf_dir)
    hist = fps.filter("doc_id % 3 = 0").select("fp").distinct()
    bmp = bloom_bitmap(hist)  # m_bits=None -> auto-sized from hist count
    return _bloom_guard_report(fps, hist, bmp)


def _bloom_words_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure a Bloom word-table artifact that has lived an ingest
    day: the family width is provisioned ONCE from the full history's
    distinct-fingerprint count (the bloom_merge width contract — an
    append-able bitmap family can never auto-size per batch), the
    base is built on three quarters of the history rows, and the
    last quarter is APPENDED transactionally. The two batches'
    fingerprint SETS may overlap (same normalized text under
    different doc ids) — deliberately: OR is idempotent, so the
    bloom family tolerates overlapping batches, the property the
    SUM families must forbid. Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact
    from ..operators.scale import (
        auto_bloom_bits,
        bloom_words_append,
        bloom_words_build_artifact,
    )

    def build(path: str) -> None:
        fps = _doc_fps(spark, sf_dir)
        hist = fps.filter("doc_id % 3 = 0")
        m_bits = auto_bloom_bits(
            hist.select("fp").distinct().count()
        )
        bloom_words_build_artifact(
            hist.filter(F.col("doc_id") % 4 != 3).select("fp").distinct(),
            path, m_bits,
        )
        bloom_words_append(
            hist.filter(F.col("doc_id") % 4 == 3).select("fp").distinct(),
            path, "ingest1",
        )

    return ensure_artifact(spark, "bloom_words", sf_dir, build)


@register(
    "dedup_bloom_append_probe",
    oracle=_BLOOM_GUARD_ORACLE,
    tags=("llm", "dedup", "bloom", "scale", "incremental"),
    since=14,
)
def dedup_bloom_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest for the Bloom guard — the OR-monoid member
    of the shared transactional protocol (r14): the probed bitmap is
    served from a word-table artifact built on three quarters of the
    history and transactionally appended with the last quarter (only
    the batch hashed, O(batch)); the uncompacted read OR-merges the
    committed word partitions before packing, so committed-partition
    pruning AND the bitwise merge-on-read are both on the hook. The
    oracle replays the FULL-history bitmap build bit-for-bit, so a
    MATCH proves OR(words(old), words(delta)) == words(all) — and
    because a crashed append's partition is invisible, a bit can
    never be set for a fingerprint whose batch did not commit (the
    no-false-negatives invariant survives the lifecycle)."""
    from ..operators.scale import read_bloom_bitmap

    fps = _doc_fps(spark, sf_dir)
    hist = fps.filter("doc_id % 3 = 0").select("fp").distinct()
    bmp = read_bloom_bitmap(
        spark, _bloom_words_artifact_path(spark, sf_dir)
    )
    return _bloom_guard_report(fps, hist, bmp)


@register(
    "dedup_containment_rare_shingle",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    rare AS (
      SELECT s FROM ex GROUP BY s
      HAVING COUNT(*) <= 10 AND COUNT(*) >= 2),
    rex AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM rex a JOIN rex b
        ON a.s = b.s AND a.doc_id < b.doc_id),
    verified AS (
      SELECT c.d1, c.d2,
             round(CAST(len(list_intersect(x.shingles, y.shingles))
                        AS DOUBLE)
                   / least(len(x.shingles), len(y.shingles)), 6)
               AS containment,
             CASE WHEN len(x.shingles) <= len(y.shingles)
                  THEN c.d1 ELSE c.d2 END AS smaller
      FROM cand c
      JOIN sh x ON x.doc_id = c.d1
      JOIN sh y ON y.doc_id = c.d2)
    SELECT d1, d2, containment, CAST(smaller AS BIGINT) AS smaller
    FROM verified WHERE containment >= 0.5
    """,
    tags=("llm", "dedup", "containment", "prefix-filter"),
    since=3,
)
def dedup_containment_rare_shingle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-scale containment detection via prefix filtering:
    candidates share at least one rare shingle (document frequency in
    [2, 10]), bounding candidate volume by max_df^2 per rare shingle
    instead of block^2 — the AllPairs/PPJoin recipe, needed because
    MinHash-LSH structurally cannot surface low-Jaccard containment
    pairs. Exact containment verify on candidates only."""
    return D.containment_pairs_rare_shingle(
        _load(spark, sf_dir, "documents"), threshold=0.5
    )


@register(
    "dedup_bloom_merge_nightly",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, md5({_NORM}) AS fp FROM documents),
    mb AS (SELECT {_BLOOM_MB.format(n_expr="COUNT(DISTINCT fp)")} AS m
           FROM n),
    day1 AS (SELECT DISTINCT fp FROM n WHERE doc_id % 2 = 0),
    day2 AS (SELECT DISTINCT fp FROM n WHERE doc_id % 2 = 1),
    p1 AS (
      SELECT {_BLOOM_P.format(o=1)} AS p FROM day1
      UNION ALL SELECT {_BLOOM_P.format(o=9)} FROM day1
      UNION ALL SELECT {_BLOOM_P.format(o=17)} FROM day1),
    p2 AS (
      SELECT {_BLOOM_P.format(o=1)} AS p FROM day2
      UNION ALL SELECT {_BLOOM_P.format(o=9)} FROM day2
      UNION ALL SELECT {_BLOOM_P.format(o=17)} FROM day2),
    merged AS (SELECT p FROM p1 UNION ALL SELECT p FROM p2),
    words AS (
      SELECT p // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 62 AS INT)) AS word
      FROM merged GROUP BY 1)
    SELECT CAST(w AS BIGINT) AS w, CAST(word AS BIGINT) AS word
    FROM words
    """,
    tags=("llm", "dedup", "bloom", "incremental"),
    since=3,
)
def dedup_bloom_merge_nightly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly bitmap maintenance path under the driver gate: two
    ingest days' fingerprint sets build bitmaps INDEPENDENTLY, the
    bitmaps OR-merge, and the output is the merged non-zero word
    table. The oracle builds the union's bitmap directly — equality
    of every word proves merge == rebuild bit-for-bit (Bloom filters
    are exactly mergeable under OR), which is what lets incremental
    ingest never re-scan the historical corpus.

    OR-merge requires the family to SHARE a width, so the width is
    derived ONCE from the full corpus's distinct-fingerprint count
    (auto_bloom_bits) and passed to every daily build — exactly the
    production contract: size from expected corpus scale up front,
    never from each day's batch (bloom_merge raises loudly on a
    mismatch). The oracle re-derives the same width from its own
    COUNT(DISTINCT fp)."""
    from pyspark.sql import functions as F

    from ..functions import normalize_text
    from ..operators.scale import auto_bloom_bits, bloom_bitmap, bloom_merge

    d = _load(spark, sf_dir, "documents")
    fps = d.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
    )
    m_bits = auto_bloom_bits(fps.select("fp").distinct().count())
    b1 = bloom_bitmap(
        fps.filter("doc_id % 2 = 0").select("fp").distinct(), m_bits=m_bits
    )
    b2 = bloom_bitmap(
        fps.filter("doc_id % 2 = 1").select("fp").distinct(), m_bits=m_bits
    )
    merged = bloom_merge([b1, b2])
    return (
        merged.select(
            F.posexplode("bf").alias("w", "word")
        )
        .filter(F.col("word") != 0)
        .select(F.col("w").cast("long"), F.col("word").cast("long"))
    )


@register(
    "dedup_bloom_fill_audit",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, md5({_NORM}) AS fp FROM documents),
    hist AS (SELECT DISTINCT fp FROM n WHERE doc_id % 3 = 0),
    mb AS (SELECT {_BLOOM_MB.format(n_expr="COUNT(*)")} AS m FROM hist),
    hp AS (
      SELECT {_BLOOM_P.format(o=1)} AS p FROM hist
      UNION ALL SELECT {_BLOOM_P.format(o=9)} FROM hist
      UNION ALL SELECT {_BLOOM_P.format(o=17)} FROM hist),
    words AS (
      SELECT p // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 62 AS INT)) AS word
      FROM hp GROUP BY 1)
    SELECT CAST((SELECT m FROM mb) AS BIGINT) AS m_bits,
           CAST(SUM(bit_count(word)) AS BIGINT) AS set_bits,
           round(CAST(SUM(bit_count(word)) AS DOUBLE)
                 / (SELECT m FROM mb), 6) AS fill_ratio
    FROM words
    """,
    tags=("llm", "dedup", "bloom", "qa"),
    since=4,
)
def dedup_bloom_fill_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The saturation audit that keeps the Bloom guard honest at
    100 TB: popcount / width of the historical-corpus bitmap as a
    one-row (m_bits, set_bits, fill_ratio). Auto-sizing pins healthy
    fills near 1 - exp(-3/10) ≈ 0.26; a ratio drifting toward 1.0
    is the silent-degradation signature (every probe → bloom_hit=1,
    the pre-filter becomes a no-op in front of a batch-sized verify
    join) — this query is the nightly emit that makes it loud. The
    oracle rebuilds the same auto-sized bitmap in SQL and recomputes
    the popcount independently."""
    from pyspark.sql import functions as F

    from ..functions import normalize_text
    from ..operators.scale import bloom_bitmap, bloom_fill_ratio

    d = _load(spark, sf_dir, "documents")
    hist = (
        d.select(
            "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
        )
        .filter("doc_id % 3 = 0")
        .select("fp")
        .distinct()
    )
    return bloom_fill_ratio(bloom_bitmap(hist))


@register(
    "pipeline_shard_manifest",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(trim(regexp_replace(lower(text),
                  '\\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    sh AS (
      SELECT doc_id, n_tokens,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) % 8 AS shard
      FROM toks)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM sh GROUP BY shard
    """,
    tags=("llm", "pipeline", "manifest"),
    since=3,
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest a training reader consumes: per global-shuffle
    shard, document and token totals — the sizing table that verifies
    shard balance before a run (md5 sharding keeps the spread tight;
    a skewed manifest means a broken key upstream). Shard-keyed
    re-aggregate of the shuffle assignment — summary-sized."""
    from pyspark.sql import functions as F

    from ..functions import tokenize
    from ..operators.sampling import global_shuffle_order

    d = _load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    assigned = global_shuffle_order(d, "doc_id", 8)
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "pipeline_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en') AS t, unnest({_WORDS}) AS tok
      FROM documents),
    bk AS (
      SELECT doc_id, t,
             CAST(concat('0x', substr(md5(tok), 1, 12)) AS BIGINT) % 64 AS b
      FROM toks),
    docb AS (
      SELECT doc_id, t, b, COUNT(*) AS c FROM bk GROUP BY 1, 2, 3),
    counts AS (
      SELECT b, SUM(c) AS cr, SUM(CASE WHEN t THEN c ELSE 0 END) AS ct
      FROM docb GROUP BY b),
    tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM counts),
    llr AS (
      SELECT b,
             ln((ct + 1.0) / (nt + 64.0)) - ln((cr + 1.0) / (nr + 64.0)) AS v
      FROM counts CROSS JOIN tot),
    terms AS (
      SELECT d.doc_id, d.b, CAST(d.c AS BIGINT) AS c,
             CAST(d.c AS DOUBLE) * l.v AS cv
      FROM docb d JOIN llr l ON d.b = l.b),
    per_doc AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             list_sum(list(cv ORDER BY b)) AS s
      FROM terms GROUP BY doc_id)
    SELECT doc_id, n_tokens, round(s, 6) AS dsir_logweight
    FROM per_doc
    """,
    tags=("llm", "pipeline", "sampling", "quality"),
    since=4,
    changed=13,
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): score every doc
    by how much more likely its hashed-unigram bag is under the
    target LM (here: the corpus's English slice as the quality seed)
    than under the raw-pool LM. The whole model fit crosses the wire
    as <=n_buckets rows per partition; the B-row log-likelihood-ratio
    table broadcasts back onto per-doc bucket counts; per-doc scores
    fold in bucket order in both engines. n_buckets=64 here so the
    ~31-token synthetic vocabulary actually collides into shared
    buckets (production default 10k).

    r12: the per-(doc, target-flag, bucket) counts derive from the
    corpus_grams artifact's per-doc token counts (sum of stored tf
    per hashed bucket == the live per-occurrence count) — no
    tokenize/explode in the probe; the oracle replays the live token
    pipeline."""
    return _dsir_weights_from_grams(spark, sf_dir)


def _dsir_weights_from_grams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR log-weights served from the corpus_grams artifact: the
    per-(doc, target-flag, bucket) counts derive from the stored
    per-doc token counts (sum of tf per hashed bucket == the live
    per-occurrence count); the LM fits / LLR broadcast / ordered
    fold are the shared operator. Used by BOTH the weights report
    and the Gumbel-resampling select stage."""
    from ..operators.sampling import hash_bucket

    path = _corpus_grams_artifact_path(spark, sf_dir)
    toks = T.read_corpus_grams(spark, path, "tokens")
    docb = (
        toks.select(
            "doc_id",
            (F.col("lang") == "en").alias("__t__"),
            hash_bucket(F.col("token"), 64).alias("b"),
            "tf",
        )
        .groupBy("doc_id", "__t__", "b")
        .agg(F.sum("tf").alias("c"))
    )
    return T.dsir_logweights(
        None, None, n_buckets=64, bucket_counts=docb
    )


@register(
    "text_lang_margin",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    scored AS (
      SELECT doc_id, len(w) AS n,
           {_LANG_SCORES}
      FROM base),
    r AS (
      SELECT doc_id, n, score_en, score_es, score_de, score_fr,
             {_PRED} AS pred_lang,
             list_sort([score_en, score_es, score_de, score_fr],
                       'DESC') AS rk
      FROM scored)
    SELECT doc_id, pred_lang,
           CAST(rk[1] AS BIGINT) AS score_top,
           CAST(rk[2] AS BIGINT) AS score_second,
           round(CAST(rk[1] - rk[2] AS DOUBLE)
                 / CAST(greatest(n, 1) AS DOUBLE), 6) AS margin_ratio,
           (rk[1] > 0 AND (rk[1] - rk[2]) * 20 >= n) AS trusted
    FROM r
    """,
    tags=("llm", "text", "langid", "quality"),
    since=4,
)
def text_lang_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confidence margin + integer-threshold trust flag
    (the CCNet-style gate on the cheap stopword-vote classifier):
    low-margin docs — mixed-language, too-short, boilerplate — get
    routed to a heavier classifier instead of trusting the vote. The
    trusted decision is pure integer arithmetic ((top - second) * 20
    >= n_tokens), so the boundary can never flip across engines.
    Narrow row-local array math, zero shuffle."""
    return T.lang_confidence(_load(spark, sf_dir, "documents"))


@register(
    "pipeline_dsir_select",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en') AS t, unnest({_WORDS}) AS tok
      FROM documents),
    bk AS (
      SELECT doc_id, t,
             CAST(concat('0x', substr(md5(tok), 1, 12)) AS BIGINT) % 64 AS b
      FROM toks),
    docb AS (
      SELECT doc_id, t, b, COUNT(*) AS c FROM bk GROUP BY 1, 2, 3),
    counts AS (
      SELECT b, SUM(c) AS cr, SUM(CASE WHEN t THEN c ELSE 0 END) AS ct
      FROM docb GROUP BY b),
    tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM counts),
    llr AS (
      SELECT b,
             ln((ct + 1.0) / (nt + 64.0)) - ln((cr + 1.0) / (nr + 64.0)) AS v
      FROM counts CROSS JOIN tot),
    terms AS (
      SELECT d.doc_id, d.b, CAST(d.c AS BIGINT) AS c,
             CAST(d.c AS DOUBLE) * l.v AS cv
      FROM docb d JOIN llr l ON d.b = l.b),
    per_doc AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             round(list_sum(list(cv ORDER BY b)), 6) AS lw
      FROM terms GROUP BY doc_id),
    keyed AS (
      SELECT doc_id, n_tokens, lw AS dsir_logweight,
             round(lw - ln(-ln(
               (CAST(concat('0x',
                   substr(md5(CAST(doc_id AS VARCHAR) || ':dsir'), 1, 12))
                 AS BIGINT) + 0.5) / 281474976710656.0)), 6) AS gumbel_key
      FROM per_doc)
    SELECT doc_id, n_tokens, dsir_logweight, gumbel_key
    FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT 100
    """,
    tags=("llm", "pipeline", "sampling", "quality"),
    since=4,
    changed=13,
)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling half of DSIR (Xie et al. 2023 §3: sample with
    Gumbel-noised log-weights rather than hard top-k, so the draw
    follows the importance distribution instead of collapsing onto
    near-identical maximum-weight docs): each doc competes on
    logweight + Gumbel(0,1), with the Gumbel drawn DETERMINISTICALLY
    as -ln(-ln(u)) over the md5-uniform construction the
    Efraimidis-Spirakis sampler uses, with u = (h + 0.5) / 2^48 so u
    lies strictly inside (0, 1): the all-ones 48-bit prefix would
    otherwise reach u = 1.0 exactly and ln(-ln(1)) diverges (NULL in
    Spark, a hard error in DuckDB). Reproducible across runs and
    engines, no RNG state. Top-100 by noised key is the selected
    subcorpus. Scale shape inherits dsir_logweights (bucket-bounded
    shuffle + B-row broadcast) plus one narrow projection and a
    global top-k: TakeOrderedAndProject ships only 100 candidates
    per partition. r12: the bucket counts derive from the
    corpus_grams artifact's stored token counts (see
    `_dsir_weights_from_grams`); the Gumbel keys and the top-k cut
    are unchanged, and the oracle replays the live pipeline."""
    from pyspark.sql import functions as F

    w = _dsir_weights_from_grams(spark, sf_dir)
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit(":dsir")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            .cast("double")
            + F.lit(0.5)
        )
        / F.lit(281474976710656.0)
    )
    key = F.round(
        F.col("dsir_logweight") - F.log(-F.log(u)), 6
    )
    return (
        w.select(
            "doc_id",
            "n_tokens",
            "dsir_logweight",
            key.alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
        .limit(100)
    )


@register(
    "pipeline_curriculum_order",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
    m AS (
      SELECT doc_id,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio,
             CAST({" + ".join(_sql_stop_hits(lang) for lang in T.STOPWORDS)} AS DOUBLE)
               / greatest(CAST(len(w) AS DOUBLE), 1.0) AS stop_ratio,
             CAST(len(list_distinct(w)) AS DOUBLE)
               / greatest(CAST(len(w) AS DOUBLE), 1.0) AS ttr,
             CAST(CASE WHEN len(w) BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END
                  AS DOUBLE) AS length_ok
      FROM base),
    q AS (
      SELECT doc_id,
             round(alpha_ratio * 0.4 + least(stop_ratio * 4, 1.0) * 0.2
                   + ttr * 0.2 + length_ok * 0.2, 6) AS qs
      FROM m),
    h AS (
      SELECT doc_id,
             least(CAST(floor(qs * 10) AS BIGINT), 9) AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS hx,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) % 8 AS shard
      FROM q)
    SELECT doc_id, bucket, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY bucket, shard
                                   ORDER BY hx, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    tags=("llm", "pipeline", "sampling", "ordering", "curriculum"),
    since=4,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: quality bands consumed best-first,
    each band internally a reproducible md5 permutation — curriculum
    learning's clean-data-first schedule without sacrificing
    within-band uniformity or determinism. The band boundary is one
    IEEE multiply + floor on the already-rounded quality score
    (cannot flip across engines); the order costs ONE bounded-key
    shuffle (bands x shards = 80 keys), never a corpus range sort."""
    from ..operators.sampling import curriculum_order

    d = _load(spark, sf_dir, "documents")
    qs = T.quality_score(d).select("doc_id", "quality_score")
    return curriculum_order(qs, "quality_score", "doc_id")


@register(
    "pipeline_token_budget",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(len({_WORDS}) AS BIGINT) AS nt FROM documents),
    cnt AS (
      SELECT source, CAST(SUM(nt) AS BIGINT) AS n FROM tok GROUP BY source),
    tot AS (
      SELECT list_sum(list(sqrt(CAST(n AS DOUBLE)) ORDER BY source)) AS z
      FROM cnt)
    SELECT source, n AS n_tokens,
           CAST(floor(sqrt(CAST(n AS DOUBLE)) / tot.z * 1000000.0)
                AS BIGINT) AS weight_ppm,
           CAST(floor(sqrt(CAST(n AS DOUBLE)) / tot.z * 10000000.0)
                AS BIGINT) AS budget_tokens,
           round(CAST(floor(sqrt(CAST(n AS DOUBLE)) / tot.z * 10000000.0)
                      AS DOUBLE) / CAST(n AS DOUBLE), 6) AS epochs
    FROM cnt CROSS JOIN tot
    """,
    tags=("llm", "pipeline", "sampling", "mixture"),
    since=4,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN budget allocation for a fixed training budget
    (here 10M tokens) under temperature alpha=0.5 weights — the
    sampling-proportions table a pretraining config ships (per
    source: weight, token budget, and EPOCHS, the repetition factor
    that warns when a low-resource source would repeat many times).
    Complements `pipeline_mixture_sample` (which draws rows) by
    emitting the budget TABLE itself. sqrt is IEEE-correctly-rounded
    and the normalizer folds over sources in sorted order, so the
    doubles match bit-for-bit; budgets quantize via floor to exact
    integers. One corpus token count -> source-sized everything."""
    d = _load(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    from ..functions import tokenize

    cnt = d.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).cast("long").alias("n")
    )
    packed = cnt.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "n"))),
            F.lit(0.0),
            lambda a, x: a + F.sqrt(x["n"].cast("double")),
        ).alias("z")
    )
    w = F.sqrt(F.col("n").cast("double")) / F.col("z")
    budget = F.floor(w * F.lit(10_000_000.0)).cast("long")
    return cnt.crossJoin(F.broadcast(packed)).select(
        "source",
        F.col("n").alias("n_tokens"),
        F.floor(w * F.lit(1_000_000.0)).cast("long").alias("weight_ppm"),
        budget.alias("budget_tokens"),
        F.round(
            budget.cast("double") / F.col("n").cast("double"), 6
        ).alias("epochs"),
    )


@register(
    "dedup_rate_by_source",
    oracle=f"""
    WITH {_PAIRS_CTES},
    members AS (
      SELECT d1 AS doc_id FROM pairs
      UNION
      SELECT d2 FROM pairs),
    tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    dup AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_dup
      FROM members m JOIN documents d ON d.doc_id = m.doc_id
      GROUP BY d.source)
    SELECT t.source, t.n_docs,
           COALESCE(u.n_dup, 0) AS n_near_dup,
           round(CAST(COALESCE(u.n_dup, 0) AS DOUBLE)
                 / CAST(t.n_docs AS DOUBLE), 6) AS dup_rate
    FROM tot t LEFT JOIN dup u ON u.source = t.source
    """,
    tags=("llm", "dedup", "report", "stats"),
    since=4,
    changed=13,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate rate per source — the which-crawl-is-dirtiest
    report read before deciding per-source dedup aggressiveness or
    dropping a mirror wholesale: the fraction of each source's docs
    participating in at least one verified MinHash-LSH near-dup
    pair. Pair machinery is the standard banded generator (one LSH
    pass); everything after is member- and source-sized. Sources
    with zero near-dups still report (LEFT join, rate 0)."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents")
    # r11: the pair list is a pushed-filter scan of the persisted
    # text pair artifact; the d1/d2 member union reads the parquet
    # relation twice, which is cheaper than the checkpoint the live
    # LSH pipeline needed here
    pairs = D.read_minhash_pairs(
        spark, _minhash_pairs_artifact_path(spark, sf_dir), threshold=0.5
    )
    members = (
        pairs.select(F.col("d1").alias("doc_id"))
        .union(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    tot = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    dup = (
        members.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup"))
    )
    return tot.join(dup, "source", "left_outer").select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias(
            "n_near_dup"
        ),
        F.round(
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_rate"),
    )


@register(
    "pipeline_eval_burn_report",
    oracle=f"""
    WITH eval_set AS (
      SELECT * FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT * FROM documents WHERE doc_id % 97 <> 0),
    efp AS (SELECT doc_id AS eval_id, md5({_NORM}) AS fp FROM eval_set),
    cfp AS (SELECT doc_id, md5({_NORM}) AS fp FROM corpus),
    exact AS (
      SELECT e.eval_id, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM efp e JOIN cfp c ON c.fp = e.fp GROUP BY e.eval_id),
    esh AS (
      SELECT DISTINCT n.doc_id AS eval_id, unnest(sh.shingles) AS shingle
      FROM (SELECT doc_id, {_WORDS} AS w FROM eval_set) n,
      LATERAL (SELECT list_distinct(list_transform(range(1, len(n.w)-1),
                 i -> concat_ws(' ', n.w[i], n.w[i+1], n.w[i+2]))) AS shingles
               WHERE len(n.w) >= 3) sh),
    csh AS (
      SELECT n.doc_id, unnest(sh.shingles) AS shingle
      FROM (SELECT doc_id, {_WORDS} AS w FROM corpus) n,
      LATERAL (SELECT list_distinct(list_transform(range(1, len(n.w)-1),
                 i -> concat_ws(' ', n.w[i], n.w[i+1], n.w[i+2]))) AS shingles
               WHERE len(n.w) >= 3) sh),
    pairhits AS (
      SELECT e.eval_id, c.doc_id
      FROM csh c JOIN esh e ON c.shingle = e.shingle
      GROUP BY e.eval_id, c.doc_id HAVING COUNT(*) >= 2),
    leaks AS (
      SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_leaks
      FROM pairhits GROUP BY eval_id)
    SELECT e.doc_id AS eval_id,
           COALESCE(x.n_exact, 0) AS n_exact_copies,
           COALESCE(l.n_leaks, 0) AS n_shingle_leaks
    FROM eval_set e
    LEFT JOIN exact x ON x.eval_id = e.doc_id
    LEFT JOIN leaks l ON l.eval_id = e.doc_id
    """,
    tags=("llm", "pipeline", "decontamination", "report"),
    since=4,
    changed=13,
)
def pipeline_eval_burn_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flip side of decontamination: per EVAL doc, how burned is
    it — exact corpus copies and >= 2-shared-shingle paraphrase
    leaks. Decontaminate answers "which training docs to drop"; this
    answers "which benchmark items stopped measuring anything" (the
    report an eval owner reads to retire items). Every eval doc
    reports, zeros included.

    r12: BOTH inputs serve from the corpus_grams artifact — the
    fingerprints from ``docstats``, the doc-distinct shingles from
    ``shingles`` (pre-exploded) — so the probe never touches corpus
    text; the eval/corpus split is a pushed-down id filter on
    statistic-sized relations. The oracle replays the full live
    tokenize+shingle pipeline, so a MATCH proves the stored
    relations equal the live computation."""
    from pyspark.sql import functions as F

    path = _corpus_grams_artifact_path(spark, sf_dir)
    ds = T.read_corpus_grams(spark, path, "docstats")
    sh = T.read_corpus_grams(spark, path, "shingles")
    eval_set = ds.filter(F.col("doc_id") % 97 == 0)
    efp = eval_set.select(F.col("doc_id").alias("eval_id"), "fp")
    cfp = ds.filter(F.col("doc_id") % 97 != 0).select("doc_id", "fp")
    exact = (
        efp.join(cfp, "fp")
        .groupBy("eval_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    esh = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    csh = sh.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", "shingle"
    )
    pairhits = (
        csh.join(esh.hint("shuffle_hash"), "shingle")
        .groupBy("eval_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .filter(F.col("__c__") >= 2)
    )
    leaks = pairhits.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_leaks")
    )
    return (
        eval_set.select(F.col("doc_id").alias("eval_id"))
        .join(exact, "eval_id", "left_outer")
        .join(leaks, "eval_id", "left_outer")
        .select(
            "eval_id",
            F.coalesce(F.col("n_exact"), F.lit(0))
            .cast("long")
            .alias("n_exact_copies"),
            F.coalesce(F.col("n_leaks"), F.lit(0))
            .cast("long")
            .alias("n_shingle_leaks"),
        )
    )


@register(
    "pipeline_dataset_card",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, source, len({_WORDS}) AS nt FROM documents),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(MIN(nt) AS BIGINT) AS min_tokens,
             CAST(MAX(nt) AS BIGINT) AS max_tokens
      FROM toks),
    med AS (
      SELECT CAST(nt AS BIGINT) AS median_tokens FROM toks
      ORDER BY nt, doc_id
      LIMIT 1 OFFSET (SELECT (n_docs - 1) // 2 FROM base)),
    fps AS (
      SELECT md5({_NORM}) AS fp FROM documents),
    dup AS (
      SELECT CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups
      FROM fps)
    SELECT b.n_docs, b.n_tokens, b.n_langs, b.n_sources,
           b.min_tokens, m.median_tokens, b.max_tokens,
           d.n_exact_dups,
           round(CAST(d.n_exact_dups AS DOUBLE)
                 / CAST(b.n_docs AS DOUBLE), 6) AS exact_dup_rate
    FROM base b CROSS JOIN med m CROSS JOIN dup d
    """,
    tags=("llm", "pipeline", "report", "stats"),
    since=4,
    changed=13,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one row: documents, tokens, language and
    source counts, token-length min/median/max (median as the exact
    lower discrete order statistic, doc_id tie-break — no float
    interpolation), exact-duplicate count and rate — the summary
    table a corpus release ships and a refresh job diffs against
    yesterday's card to catch pipeline regressions (sudden dup-rate
    or median shifts). r12: BOTH corpus passes (token census +
    fingerprint census) serve from the corpus_grams artifact's
    one-row-per-doc ``docstats`` relation — the card touches no
    corpus text; the median stays a TakeOrdered-style bounded
    selection, everything else folds map-side into one summary row.
    The oracle replays the live tokenize + fingerprint pipelines."""
    from pyspark.sql import functions as F

    path = _corpus_grams_artifact_path(spark, sf_dir)
    ds = T.read_corpus_grams(spark, path, "docstats")
    toks = ds.select(
        "doc_id", "lang", "source", F.col("n_words").alias("nt")
    )
    base = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.min("nt").cast("long").alias("min_tokens"),
        F.max("nt").cast("long").alias("max_tokens"),
    )
    n_docs = toks.count()
    med = (
        toks.orderBy("nt", "doc_id")
        .limit((n_docs - 1) // 2 + 1)
        .orderBy(F.desc("nt"), F.desc("doc_id"))
        .limit(1)
        .select(F.col("nt").cast("long").alias("median_tokens"))
    )
    dup = ds.select("fp").agg(
        (F.count(F.lit(1)) - F.countDistinct("fp"))
        .cast("long")
        .alias("n_exact_dups")
    )
    return (
        base.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(dup))
        .select(
            "n_docs", "n_tokens", "n_langs", "n_sources",
            "min_tokens", "median_tokens", "max_tokens",
            "n_exact_dups",
            F.round(
                F.col("n_exact_dups").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("exact_dup_rate"),
        )
    )


@register(
    "pipeline_source_gini",
    oracle=f"""
    WITH cnt AS (
      SELECT source, CAST(SUM(len({_WORDS})) AS BIGINT) AS n
      FROM documents GROUP BY source),
    rk AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n, source) AS i FROM cnt),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS tot,
             CAST(SUM(i * n) AS BIGINT) AS s1
      FROM rk)
    SELECT k AS n_sources, tot AS total_tokens,
           round((2.0 * s1) / (k * CAST(tot AS DOUBLE))
                 - (k + 1.0) / k, 6) AS gini
    FROM s
    """,
    tags=("llm", "pipeline", "report", "stats"),
    since=4,
)
def pipeline_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of token mass across sources — the
    one-number concentration check on the corpus mix (0 = perfectly
    balanced sources, ->1 = one crawl dominates; read next to the
    temperature-mixture and quota stages to decide whether
    rebalancing is even needed). Sufficient statistics are exact
    integers (rank-weighted sums over the source-sized table); the
    closing formula is two divisions written token-identically in
    both engines. One corpus token count; everything after is
    source-sized."""
    from pyspark.sql import functions as F

    from pyspark.sql.window import Window as W

    from ..functions import tokenize

    d = _load(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(
        F.sum(F.size(tokenize(F.col("text")))).cast("long").alias("n")
    )
    rk = cnt.select(
        "n",
        F.row_number().over(W.orderBy("n", "source")).alias("i"),
    )
    s = rk.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("tot"),
        F.sum(F.col("i") * F.col("n")).cast("long").alias("s1"),
    )
    return s.select(
        F.col("k").alias("n_sources"),
        F.col("tot").alias("total_tokens"),
        F.round(
            (F.lit(2.0) * F.col("s1"))
            / (F.col("k") * F.col("tot").cast("double"))
            - (F.col("k") + F.lit(1.0)) / F.col("k"),
            6,
        ).alias("gini"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH base AS (SELECT doc_id, lang, {_WORDS} AS w FROM documents),
    scored AS (
      SELECT doc_id, lang,
           {_LANG_SCORES}
      FROM base),
    pred AS (
      SELECT lang, {_PRED} AS pred_lang FROM scored)
    SELECT lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY lang, pred_lang
    """,
    tags=("llm", "text", "langid", "qa", "report"),
    since=4,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix against the corpus's ground-truth
    ``lang`` labels — the classifier-evaluation artifact that tells
    you WHERE the cheap stopword vote fails (which language pairs
    confuse, how much lands in 'und') before you trust it to route
    documents. Pure narrow scoring + one |langs|² aggregate; pairs
    with `text_lang_margin` (the per-doc trust gate) the way a
    confusion matrix pairs with a confidence threshold."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents")
    pred = T.lang_id(d).select("doc_id", "pred_lang")
    return (
        d.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _card_sql(pred: str) -> str:
    """One dataset-card row (docs/tokens/dups) over the slice
    selected by ``pred`` — shared by the card-diff oracle."""
    return f"""(
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_WORDS})) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) - COUNT(DISTINCT md5({_NORM})) AS BIGINT)
             AS n_exact_dups
    FROM documents WHERE {pred})"""


@register(
    "pipeline_card_diff",
    oracle=f"""
    WITH old AS {_card_sql("doc_id % 10 <> 0")},
    new AS {_card_sql("TRUE")}
    SELECT o.n_docs AS old_docs, n.n_docs AS new_docs,
           CAST(n.n_docs - o.n_docs AS BIGINT) AS delta_docs,
           CAST(n.n_tokens - o.n_tokens AS BIGINT) AS delta_tokens,
           CAST(n.n_exact_dups - o.n_exact_dups AS BIGINT)
             AS delta_exact_dups,
           round(CAST(n.n_exact_dups AS DOUBLE) / CAST(n.n_docs AS DOUBLE)
                 - CAST(o.n_exact_dups AS DOUBLE) / CAST(o.n_docs AS DOUBLE),
                 6) AS dup_rate_shift
    FROM old o CROSS JOIN new n
    """,
    tags=("llm", "pipeline", "report", "stats"),
    since=4,
)
def pipeline_card_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly card DIFF the dataset-card docstring promises:
    yesterday's corpus (here: doc_id % 10 <> 0 plays the prior
    snapshot) against today's, as deltas — doc/token growth,
    exact-duplicate growth, and the dup-rate shift that screams when
    an ingest bug starts double-feeding a source. Two summary rows
    crossed; all counts exact, one rounded rate difference."""
    from pyspark.sql import functions as F

    from ..functions import normalize_text, tokenize

    d = _load(spark, sf_dir, "documents")

    def card(df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(tokenize(F.col("text"))))
            .cast("long")
            .alias("n_tokens"),
            (
                F.count(F.lit(1))
                - F.countDistinct(F.md5(normalize_text(F.col("text"))))
            )
            .cast("long")
            .alias("n_exact_dups"),
        )

    old = card(d.filter(F.col("doc_id") % 10 != 0))
    new = card(d)
    o, n = old.alias("o"), new.alias("n")
    rate = lambda side: F.col(f"{side}.n_exact_dups").cast(  # noqa: E731
        "double"
    ) / F.col(f"{side}.n_docs").cast("double")
    return o.crossJoin(F.broadcast(n)).select(
        F.col("o.n_docs").alias("old_docs"),
        F.col("n.n_docs").alias("new_docs"),
        (F.col("n.n_docs") - F.col("o.n_docs"))
        .cast("long")
        .alias("delta_docs"),
        (F.col("n.n_tokens") - F.col("o.n_tokens"))
        .cast("long")
        .alias("delta_tokens"),
        (F.col("n.n_exact_dups") - F.col("o.n_exact_dups"))
        .cast("long")
        .alias("delta_exact_dups"),
        F.round(rate("n") - rate("o"), 6).alias("dup_rate_shift"),
    )


@register(
    "pipeline_dedup_cascade",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    fps AS (
      SELECT doc_id, md5({_NORM}) AS fp FROM documents),
    surv AS (
      SELECT MIN(doc_id) AS doc_id FROM fps GROUP BY fp),
    spairs AS (
      SELECT d1, d2 FROM pairs
      WHERE d1 IN (SELECT doc_id FROM surv)
        AND d2 IN (SELECT doc_id FROM surv)),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM spairs
      UNION SELECT d2, d1 FROM spairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (
      SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a),
    counts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_input,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_after_exact,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM comp
              WHERE doc_id <> cluster_id) AS n_neardup_drops)
    SELECT n_input, n_after_exact,
           CAST(n_input - n_after_exact AS BIGINT) AS exact_removed,
           n_neardup_drops AS neardup_removed,
           CAST(n_after_exact - n_neardup_drops AS BIGINT)
             AS n_after_neardup,
           round(CAST(n_after_exact - n_neardup_drops AS DOUBLE)
                 / CAST(n_input AS DOUBLE), 6) AS final_yield
    FROM counts
    """,
    tags=("llm", "dedup", "pipeline", "report"),
    since=4,
)
def pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yield accounting through the dedup cascade — exact
    fingerprint dedup, then MinHash-LSH near-dup clustering over the
    exact survivors — as one row: input docs, removals per stage,
    final yield. The report a curation run logs per snapshot so a
    sudden yield drop points at the stage that caused it. Near-dup
    pairs among survivors are the full pair list FILTERED to
    survivor endpoints (the pair predicate depends only on the two
    docs, so filter-after == recompute-on-survivors); components run
    on the filtered pairs. Counts exact, one rounded yield."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents")
    n_input = d.count()
    keep = D.exact_dedup(d).select(F.col("keep_id").alias("doc_id"))
    surv = d.join(keep, "doc_id")
    n_after_exact = surv.count()
    pairs = D.minhash_lsh_pairs(
        surv, num_hashes=_MINHASH_K, band_size=_BAND, threshold=0.5
    )
    comp = D.connected_components(pairs)
    n_drops = comp.filter(F.col("doc_id") != F.col("cluster_id")).count()
    return spark.createDataFrame(
        [
            (
                n_input,
                n_after_exact,
                n_input - n_after_exact,
                n_drops,
                n_after_exact - n_drops,
            )
        ],
        "n_input long, n_after_exact long, exact_removed long, "
        "neardup_removed long, n_after_neardup long",
    ).select(
        "*",
        F.round(
            F.col("n_after_neardup").cast("double")
            / F.col("n_input").cast("double"),
            6,
        ).alias("final_yield"),
    )


_UNIGRAM_SCORE_CTE = f"""docs AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    toks AS (
      SELECT doc_id, g.pos AS pos, d.w[g.pos] AS tok
      FROM docs d,
           LATERAL (SELECT unnest(generate_series(1, len(d.w))) AS pos) g),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    lp AS (
      SELECT t.doc_id, t.pos, ln(CAST(f.c AS DOUBLE) / tot.n) AS lp
      FROM toks t JOIN freq f ON t.tok = f.tok CROSS JOIN tot),
    scored AS (
      SELECT doc_id,
             round(-list_sum(list(lp ORDER BY pos))
                   / CAST(COUNT(*) AS DOUBLE), 6) AS score
      FROM lp GROUP BY doc_id)"""


@register(
    "pipeline_ccnet_buckets",
    oracle=f"""
    WITH {_UNIGRAM_SCORE_CTE},
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
    b1 AS (
      SELECT score AS v FROM scored ORDER BY score, doc_id
      LIMIT 1 OFFSET (SELECT (n + 2) // 3 - 1 FROM nn)),
    b2 AS (
      SELECT score AS v FROM scored ORDER BY score, doc_id
      LIMIT 1 OFFSET (SELECT (2 * n + 2) // 3 - 1 FROM nn)),
    bucketed AS (
      SELECT s.doc_id, s.score,
             CASE WHEN s.score <= b1.v THEN 'head'
                  WHEN s.score <= b2.v THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored s CROSS JOIN b1 CROSS JOIN b2)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(MIN(score), 6) AS min_score,
           round(MAX(score), 6) AS max_score
    FROM bucketed GROUP BY bucket
    """,
    tags=("llm", "pipeline", "quality", "ccnet"),
    since=4,
    changed=13,
)
def pipeline_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: documents bucketed by
    perplexity terciles of the corpus-unigram score (head = most
    fluent third, the slice CCNet keeps by default). Scale-correct
    formulation: the two tercile BOUNDARY VALUES are exact discrete
    order statistics fetched via bounded TakeOrdered selections —
    never a corpus-wide row_number (the global-sort anti-pattern) —
    then broadcast into a comparison; ties land in the lower bucket
    identically in both engines because scores are already
    round(6)-exact. Bucket census output; the per-doc bucket column
    is the same comparison applied without the final aggregate."""
    from pyspark.sql import functions as F

    d = _load(spark, sf_dir, "documents")
    # doc-sized; FOUR consumers (count, both boundary selections, the
    # bucket compare) would otherwise each re-inline the whole
    # unigram-scoring pipeline — the worst plan in the r5 audit at 42
    # parquet scans. The count() materializes the checkpoint.
    path = _corpus_grams_artifact_path(spark, sf_dir)
    scored = (
        T.unigram_logprob_score(
            d, head_k=8,
            vocab_counts=T.read_corpus_grams(spark, path, "unigrams"),
        )
        .select("doc_id", F.col("avg_neg_logprob").alias("score"))
        .localCheckpoint(eager=False)
    )
    n = scored.count()

    def boundary(offset: int):
        return (
            scored.orderBy("score", "doc_id")
            .limit(offset + 1)
            .orderBy(F.desc("score"), F.desc("doc_id"))
            .limit(1)
            .select(F.col("score").alias("v"))
        )

    b1 = boundary((n + 2) // 3 - 1)
    b2 = boundary((2 * n + 2) // 3 - 1)
    bucketed = (
        scored.crossJoin(F.broadcast(b1.withColumnRenamed("v", "v1")))
        .crossJoin(F.broadcast(b2.withColumnRenamed("v", "v2")))
        .select(
            "score",
            F.when(F.col("score") <= F.col("v1"), "head")
            .when(F.col("score") <= F.col("v2"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.min("score"), 6).alias("min_score"),
        F.round(F.max("score"), 6).alias("max_score"),
    )
