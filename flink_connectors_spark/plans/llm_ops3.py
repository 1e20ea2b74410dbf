"""Round-4 wave 2: behavioral analytics (cohort retention, event
transition matrix), skew-proof salted joins through the driver gate,
Count-Min sketch frequency estimation, CDC changelog APPLY, SemDeDup
semantic clustering dedup, MinHash sketch-accuracy audit, and audio
frame-energy feature extraction.

Same discipline as llm_ops/llm_ops2: DataFrame-first plans, Python
only behind Arrow-batched mapInPandas (audio decode), every query
value-exact against a DuckDB oracle (integer sufficient statistics or
single-operation IEEE float steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import scale as SC
from ..operators import similarity as S
from ..operators import text as T
from ..operators.artifacts import ensure_artifact
from ..registry import register
from ..session import read_parquet as _read_pq
from ..session import load_table
from ._util import dec, dsum
from .llm_ops import (
    _BAND_SELECTS,
    _PAIRS_CTES,
    _SHINGLES_CTE,
    _SIG_COLS,
    _WORDS,
    _km_chain_cte,
    _load,
    _lsh_pairs_cte,
    _snapshot_artifact,
    _sql_cos,
)

# ---------------------------------------------------------------------------
# Behavioral analytics over the events stream table
# ---------------------------------------------------------------------------


@register(
    "events_cohort_retention",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id),
    act AS (
      SELECT uw.user_id, c.cohort_week,
             CAST(date_diff('day', c.cohort_week, uw.week) // 7 AS INT)
               AS weeks_since
      FROM uw JOIN cohort c ON uw.user_id = c.user_id),
    ret AS (
      SELECT cohort_week, weeks_since,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
      FROM act GROUP BY cohort_week, weeks_since),
    base AS (
      SELECT cohort_week, n_active AS cohort_size
      FROM ret WHERE weeks_since = 0)
    SELECT r.cohort_week, r.weeks_since, r.n_active, b.cohort_size,
           round(CAST(r.n_active AS DOUBLE) / CAST(b.cohort_size AS DOUBLE),
                 6) AS retention
    FROM ret r JOIN base b ON r.cohort_week = b.cohort_week
    """,
    tags=("temporal", "cohort", "retention", "analytics"),
    since=4,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix — the standard product-analytics
    triangle: users cohorted by their first active week, retention =
    share of the cohort active again N weeks later. Plan shape: ONE
    distinct on (user, week) + one user-keyed aggregate for the
    cohort week, then a (cohort, weeks_since)-keyed count-distinct;
    the per-cohort base sizes are a cohort-count-sized table joined
    back broadcast. All counts exact int64; the single retention
    division is the only float step."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    # (user, week)-sized after the one corpus distinct; feeds both
    # the cohort-week aggregate and the activity join — checkpoint
    # so the events scan runs once (plan audit: 8 scans without)
    uw = (
        ev.select("user_id", week.alias("week"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = uw.join(cohort, "user_id").select(
        "user_id",
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("weeks_since"),
    )
    # cohort x weeks-sized; read by the base-size filter AND the
    # final join
    ret = (
        act.groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .localCheckpoint(eager=True)
    )
    base = ret.filter(F.col("weeks_since") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return ret.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "weeks_since",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_event,
             event_type AS next_event
      FROM events),
    cnt AS (
      SELECT prev_event, next_event,
             CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE prev_event IS NOT NULL
      GROUP BY prev_event, next_event)
    SELECT prev_event, next_event, n_transitions,
           round(CAST(n_transitions AS DOUBLE)
                 / CAST(SUM(n_transitions) OVER (PARTITION BY prev_event)
                        AS DOUBLE), 6) AS prob
    FROM cnt
    """,
    tags=("temporal", "markov", "transition", "analytics"),
    since=4,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (the Sankey/path-analysis table): lag each user's
    time-ordered stream by one, count (prev -> next) transitions,
    normalize per source state. ONE user-keyed window shuffle over
    the stream; the count table is |event_types|^2 rows, so the
    normalizing window costs nothing. Tie-break on event_id makes the
    sequence — and therefore every count — engine-reproducible."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_event"),
        F.col("event_type").alias("next_event"),
    ).filter(F.col("prev_event").isNotNull())
    cnt = seq.groupBy("prev_event", "next_event").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wn = Window.partitionBy("prev_event")
    return cnt.select(
        "prev_event",
        "next_event",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wn).cast("double"),
            6,
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Skew-proof salted join, driven through the correctness gate
# ---------------------------------------------------------------------------


@register(
    "join_salted_nation_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "skew", "salting", "scale"),
    since=4,
)
def join_salted_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation order revenue through the SALTED join path — the
    skew-mitigation machinery (`operators/scale.py salted_join`)
    driven through the value-hash gate to prove it is result-
    identical to the plain join the oracle runs. The fact side gets a
    16-way salt, the customer dim replicates across the salt domain,
    and the join key becomes (custkey, salt): a hot customer's rows
    now land on 16 reducers instead of one straggler. Salt choice
    provably cannot affect the result — every fact row meets exactly
    its salt's dim replica — which is precisely what the oracle
    verifies. Exact decimal money sums; nation broadcast."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    joined = SC.salted_join(orders, cust, key="c_custkey", n_salts=16)
    return (
        joined.join(
            F.broadcast(nation),
            joined.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency estimates + accuracy audit
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 256
_CMS_CELLS = " UNION ALL ".join(
    f"""SELECT {j} AS j,
        CAST(concat('0x', substr(md5('{j}|' || CAST(l_partkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % {_CMS_W} AS cell
        FROM lineitem"""
    for j in range(_CMS_D)
)
_CMS_PROBE = " UNION ALL ".join(
    f"""SELECT l_partkey, exact_count, {j} AS j,
        CAST(concat('0x', substr(md5('{j}|' || CAST(l_partkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % {_CMS_W} AS cell
        FROM top"""
    for j in range(_CMS_D)
)


_CMS_AUDIT_ORACLE = f"""
    WITH ex AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM lineitem GROUP BY l_partkey),
    top AS (
      SELECT * FROM ex ORDER BY exact_count DESC, l_partkey LIMIT 10),
    cells AS ({_CMS_CELLS}),
    counters AS (
      SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS n
      FROM cells GROUP BY j, cell),
    probe AS ({_CMS_PROBE})
    SELECT p.l_partkey, p.exact_count,
           MIN(COALESCE(c.n, 0)) AS cms_estimate,
           MIN(COALESCE(c.n, 0)) - p.exact_count AS overestimate
    FROM probe p LEFT JOIN counters c ON c.j = p.j AND c.cell = p.cell
    GROUP BY p.l_partkey, p.exact_count
    """


def _cms_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted Count-Min counter table over the full
    lineitem partkey stream (4x256; the depth/width every estimate in
    the repo shares). `agg_countmin_frequency` prices the build as
    first toucher; estimates then read ≤ d*w stored rows instead of
    re-sketching the fact table. Contract in `ensure_artifact`."""

    def build(path: str) -> None:
        SC.countmin_build_artifact(
            load_table(spark, sf_dir, "lineitem"), path,
            "l_partkey", depth=_CMS_D, width=_CMS_W,
        )

    return ensure_artifact(spark, "cms_partkey", sf_dir, build)


def _cms_audit_report(
    spark: SparkSession, sf_dir: str, path: str
) -> DataFrame:
    """The estimate-vs-exact audit (kept LIVE per the r13 verdict):
    exact top-10 partkeys from the fact table, estimated from the
    stored committed counter table."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("l_partkey")).limit(10)
    counters = SC.read_countmin_counters(
        spark, path, depth=_CMS_D, width=_CMS_W
    )
    est = SC.countmin_estimate(
        top, counters, "l_partkey", depth=_CMS_D, width=_CMS_W
    )
    return est.select(
        "l_partkey",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


@register(
    "agg_countmin_frequency",
    oracle=_CMS_AUDIT_ORACLE,
    tags=("agg", "sketch", "countmin", "mergeable", "artifact"),
    since=4,
    changed=14,
)
def agg_countmin_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation with its accuracy audit:
    estimate the 10 hottest partkeys from the PERSISTED 4x256 counter
    table and report estimate vs exact. CMS is additive — tomorrow's
    sketch is today's + the delta batch's, cell-wise SUM, the same
    mergeable-summary contract as the rollup histograms — and
    estimates only ever exceed the truth (collisions add), which the
    driver-verified ``overestimate >= 0`` column exhibits.

    r14 (verdict Next #3): the counter table is a persisted artifact
    (`operators/scale.countmin_build_artifact`) — the repo's 2nd most
    expensive headliner re-sketched lineitem per invocation when the
    sketch is per-cell integer-additive, i.e. build-once + append-
    nightly per the r13 taxonomy. The estimate now reads ≤ d*w stored
    rows (broadcast, one fact scan left: the exact side of the audit,
    kept live by design — at 100 TB that side runs over a key sample;
    here it doubles as the ground truth the gate hashes). The oracle
    still replays sketch-build + estimate from scratch, so a MATCH
    proves the stored counter table equals the live computation."""
    return _cms_audit_report(
        spark, sf_dir, _cms_artifact_path(spark, sf_dir)
    )


def _cms_inc_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure a Count-Min artifact that has lived an ingest day:
    base build on three quarters of the lineitem stream, then a
    TRANSACTIONAL append of the remaining quarter — only the batch
    scanned, its partial counters landing as ``part=ingest1``. The
    probe reads it uncompacted. Unlike the doc-keyed families the
    split is by ROWS (orderkey), not by new ids: CMS composes over
    any disjoint row partition."""

    def build(path: str) -> None:
        li = load_table(spark, sf_dir, "lineitem")
        SC.countmin_build_artifact(
            li.filter(F.col("l_orderkey") % 4 != 3), path,
            "l_partkey", depth=_CMS_D, width=_CMS_W,
        )
        SC.countmin_append(
            li.filter(F.col("l_orderkey") % 4 == 3), path, "ingest1",
            "l_partkey", depth=_CMS_D, width=_CMS_W,
        )

    return ensure_artifact(spark, "cms_partkey_inc", sf_dir, build)


@register(
    "agg_countmin_append_probe",
    oracle=_CMS_AUDIT_ORACLE,
    tags=("agg", "sketch", "countmin", "mergeable", "incremental"),
    since=14,
)
def agg_countmin_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ingest for the Count-Min artifact: the probed
    counter table was built on three quarters of the lineitem stream
    and a nightly batch (the last quarter, split by orderkey) was
    APPENDED transactionally — only the batch scanned, its partial
    counters committed as their own partition. The audit reads the
    UNCOMPACTED artifact, so committed-partition pruning AND the
    cell-wise SUM merge-on-read are both on the hook; the oracle
    replays the FULL-stream sketch build, and a MATCH proves
    sketch(old) + sketch(delta) == sketch(all) cell-for-cell (the
    merge is exact: integer counts over disjoint row batches)."""
    return _cms_audit_report(
        spark, sf_dir, _cms_inc_artifact_path(spark, sf_dir)
    )


# ---------------------------------------------------------------------------
# CDC: changelog APPLY (the consumer of pipeline_snapshot_changelog)
# ---------------------------------------------------------------------------

_NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


@register(
    "pipeline_cdc_apply",
    oracle=f"""
    SELECT doc_id,
           md5(CASE WHEN doc_id % 5 = 0 THEN {_NORM_SQL} || ' v2'
                    ELSE {_NORM_SQL} END) AS fp
    FROM documents WHERE doc_id % 3 <> 0
    """,
    tags=("pipeline", "cdc", "changelog", "merge"),
    since=4,
)
def pipeline_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog APPLY — the consumer half of the CDC pair
    (`pipeline_snapshot_changelog` produces I/UA/D deltas; this query
    folds them into the old snapshot and must reproduce the new one
    EXACTLY, which is what the oracle checks by computing the new
    snapshot directly). This is the distributed MERGE INTO shape:
    survivors = old ANTI JOIN touched-keys (one keyed shuffle),
    new state = survivors UNION upserts. At 100 TB the delta is
    duplicate-days smaller than the snapshot, so the apply costs one
    snapshot-sized anti join instead of a full rebuild — the whole
    point of shipping changelogs to the sink."""
    from ..functions import normalize_text

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
    changelog = joined.filter(
        F.col("o.doc_id").isNull()
        | F.col("n.doc_id").isNull()
        | (F.col("o.fp") != F.col("n.fp"))
    ).select(
        F.coalesce(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_id"),
        op.alias("op"),
        F.col("n.fp").alias("fp"),
    )
    # APPLY: drop every touched key from the old snapshot, then add
    # back the I/UA payloads. D keys simply never come back.
    survivors = old.join(changelog.select("doc_id"), "doc_id", "left_anti")
    upserts = changelog.filter(F.col("op") != "D").select("doc_id", "fp")
    return survivors.unionByName(upserts)


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via k-means cluster pruning
# ---------------------------------------------------------------------------


@register(
    "dedup_semantic_cluster",
    changed=10,
    oracle=f"""
    WITH {_km_chain_cte()},
    cl AS (SELECT vec_id, cluster FROM af),
    pairs AS (
      SELECT a.cluster, a.vec_id AS keep_id, b.vec_id AS drop_id,
             {_sql_cos("e1.embedding", "e2.embedding")} AS score
      FROM cl a
      JOIN cl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN embeddings e1 ON e1.vec_id = a.vec_id
      JOIN embeddings e2 ON e2.vec_id = b.vec_id)
    SELECT CAST(cluster AS INT) AS cluster, keep_id, drop_id, score
    FROM pairs WHERE score >= 0.4
    """,
    tags=("llm", "dedup", "embedding", "semdedup", "iterative"),
    since=4,
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs
    found INSIDE deterministic k-means clusters only — the cluster
    assignment prunes the pair space from N^2 to sum(cluster^2), the
    published recipe for embedding-level dedup at LAION/LLM-corpus
    scale. Label-free composition of two driver-verified primitives:
    `embedding_kmeans_assign` builds the clusters (exact integer
    centroid math, zero-Exchange assignment), then the intra-cluster
    cosine pair stage reuses the blocked near-dup join with the
    LEARNED cluster as blocking key. The oracle unrolls both Lloyd
    iterations and the pair stage, so the whole composition is
    value-hash-verified. Lower id is the canonical survivor.

    r10: the cluster assignment comes from the shared persisted
    k-means artifact (built once per process, priced by
    `embedding_kmeans_assign`) — the oracle still replays the Lloyd
    chain, so MATCH proves the injected assignment equals a fresh
    build."""
    from .llm_ops import _kmeans_artifact_path

    emb = _load(spark, sf_dir, "embeddings")
    path = _kmeans_artifact_path(spark, sf_dir)
    assign = _read_pq(spark, f"{path}/assign").select(
        "vec_id", "cluster"
    )
    return S.semantic_dedup_pairs(
        emb, k=8, iters=2, threshold=0.4, assignment=assign
    )


# ---------------------------------------------------------------------------
# MinHash sketch-accuracy audit
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_estimate_audit",
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
       AND a.doc_id < b.doc_id),
    scored AS (
      SELECT c.d1, c.d2,
             round(CAST({" + ".join(
                 f"CASE WHEN x.m{i} = y.m{i} THEN 1 ELSE 0 END"
                 for i in range(8)
             )} AS DOUBLE) / 8, 6) AS est_jaccard,
             round(CAST(len(list_intersect(x.shingles, y.shingles))
                        AS DOUBLE)
                   / CAST(len(list_distinct(x.shingles || y.shingles))
                          AS DOUBLE), 6) AS exact_jaccard
      FROM cand c
      JOIN sig x ON x.doc_id = c.d1
      JOIN sig y ON y.doc_id = c.d2)
    SELECT d1, d2, est_jaccard, exact_jaccard,
           round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
    FROM scored
    """,
    tags=("llm", "dedup", "minhash", "audit", "sketch"),
    since=4,
    changed=13,
)
def dedup_minhash_estimate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch-accuracy audit for the MinHash dedup pipeline: per LSH
    candidate pair, the Jaccard the 8-component signature ESTIMATES
    (fraction of equal minima — all a signature-only pipeline at
    scale would have) vs the EXACT distinct-shingle Jaccard, plus the
    absolute error. The measured-on-this-corpus answer to "can we
    skip the exact verify join", sibling to `similarity_recall_audit`
    on the ANN side. Audit joins are candidate-sized; at corpus scale
    the exact side runs over a pair sample. r11: served from the
    audit-grade pair artifact — est/exact/err are one-division
    projections over the stored (eq_count, jac) statistics; the
    oracle replays the full signature pipeline."""
    from ..operators.dedup import (
        _audit_from_candidate_stats,
        read_minhash_candidate_stats,
    )
    from .llm_ops import _minhash_pairs_artifact_path

    stats = read_minhash_candidate_stats(
        spark, _minhash_pairs_artifact_path(spark, sf_dir), num_hashes=8
    )
    return _audit_from_candidate_stats(stats, num_hashes=8)


# ---------------------------------------------------------------------------
# Audio frame-energy features over real decoded bytes
# ---------------------------------------------------------------------------


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH wav AS (
      SELECT doc_id, n_chars % 256 + 16 AS n_samples
      FROM documents WHERE doc_id % 2 = 1),
    fr AS (
      SELECT doc_id, n_samples, CAST(f.fi AS BIGINT) AS frame_idx
      FROM wav,
           unnest(range(0, CAST((n_samples + 63) // 64 AS BIGINT)))
             AS f(fi)),
    seg AS (
      SELECT doc_id, frame_idx,
             list_transform(
               range(frame_idx * 64,
                     frame_idx * 64
                     + least(64, n_samples - frame_idx * 64)),
               i -> (i * 31 + doc_id) % 65536) AS s
      FROM fr)
    SELECT doc_id, frame_idx,
           CAST(len(s) AS BIGINT) AS n_in_frame,
           CAST(list_sum(s) AS BIGINT) AS sample_sum,
           CAST(list_sum(list_transform(s, v -> v * v)) AS BIGINT)
             AS sample_sq_sum,
           CAST(list_max(s) AS BIGINT) AS peak
    FROM seg
    """,
    tags=("llm", "multimodal", "audio", "features", "pandas_udf"),
    since=4,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over REAL decoded bytes: synthesize
    the WAV clips (odd ids), decode the PCM data chunk, and emit
    per-64-sample-frame integer sufficient statistics — sample sum,
    energy (sum of squares), peak. The oracle predicts every value
    arithmetically from the synthesis formula, so a single wrong
    sample boundary in the numpy frame walk fails the hash. The
    decode + vectorized per-frame reduction inside Arrow-batched
    mapInPandas is the production plumbing an FFT/mel pipeline drops
    into; output is frame-metadata-sized, payloads never leave the
    stage."""
    d = (
        _load(spark, sf_dir, "documents")
        .filter("doc_id % 2 = 1")
        .select("doc_id", "n_chars")
    )
    return M.audio_frame_energy(M.synthesize_media(d))


# ---------------------------------------------------------------------------
# Power iteration: top principal direction + per-vector projection
# ---------------------------------------------------------------------------


def _pi_iter(i: int, prev_v: str) -> str:
    """One unrolled power-iteration step: s = X^T (X v) in exact
    integer math, then re-quantize v' = floor(s*1024/||s|| + 0.5)."""
    return f"""d{i} AS (
      SELECT vec_id, qv,
             list_sum(list_transform(list_zip(qv, {prev_v}.v),
                                     p -> p[1] * p[2])) AS dot
      FROM q, {prev_v}),
    s{i}p AS (
      SELECT r.pos, CAST(SUM(qv[r.pos] * dot) AS BIGINT) AS s
      FROM d{i}, UNNEST(range(1, 65)) AS r(pos)
      GROUP BY r.pos),
    s{i} AS (SELECT list(s ORDER BY pos) AS sl FROM s{i}p),
    n{i} AS (
      SELECT sl,
             sqrt(CAST(list_sum(list_transform(sl,
                    x -> CAST(x AS HUGEINT) * x)) AS DOUBLE)) AS nrm
      FROM s{i}),
    v{i} AS (
      SELECT list_transform(sl,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024 / nrm + 0.5)
                         AS BIGINT)) AS v
      FROM n{i})"""


def _powdir_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted top-principal-direction artifact (power
    iteration, 2 rounds, scale 1024 — the registry's whitening
    config). `embedding_power_projection` prices the build (first
    toucher) and runs only the final projection pass;
    `embedding_anisotropy` reads the one d-long row directly.
    Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact

    def build(path: str) -> None:
        S.powdir_build_artifact(
            _load(spark, sf_dir, "embeddings"), path, iters=2, scale=1024
        )

    return ensure_artifact(spark, "powdir", sf_dir, build)


@register(
    "embedding_power_projection",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT)) AS qv
      FROM embeddings),
    v0 AS (SELECT list_transform(range(1, 65),
                                 i -> CAST(1024 AS BIGINT)) AS v),
    {_pi_iter(1, "v0")},
    {_pi_iter(2, "v1")}
    SELECT vec_id,
           CAST(list_sum(list_transform(list_zip(qv, v2.v),
                                        p -> p[1] * p[2])) AS BIGINT)
             AS proj
    FROM q, v2
    """,
    tags=("llm", "embedding", "pca", "iterative"),
    since=4,
    changed=11,
)
def embedding_power_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by 2 rounds of
    deterministic quantized POWER ITERATION, output as each vector's
    exact-integer projection onto it — the anisotropy/whitening build
    step ("all-but-the-top" embedding post-processing) that runs
    before cosine dedup or ANN on skewed corpora. The iterative
    linear-algebra sibling of `embedding_kmeans_assign`: per round,
    ONE map-side-combining aggregate with d sum buffers (vector rows
    never shuffle; the driver holds only the d-vector between
    rounds), s's squared norm folds in index order as exact 128-bit
    integers, and the single float step per round (scale/||s||, then
    explicit half-up floor(x+0.5)) re-quantizes bit-identically in
    both engines — so the driver's value hash verifies the whole
    iterative algorithm, not just the final pass. r11: the learned
    axis is a PERSISTED artifact (this query prices the build);
    per invocation only the final distributed projection runs, and
    the oracle still replays both iteration rounds."""
    emb = _load(spark, sf_dir, "embeddings")
    v = S.read_powdir(
        spark, _powdir_artifact_path(spark, sf_dir), iters=2, scale=1024
    )
    return S.power_iteration_projection(
        emb, iters=2, scale=1024, component=v
    )


# ---------------------------------------------------------------------------
# Winsorization: per-source outlier clipping at exact order statistics
# ---------------------------------------------------------------------------


@register(
    "pipeline_quality_winsorize",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents),
    w2 AS (
      SELECT doc_id, source, n_chars,
             MAX(CASE WHEN rn = (n + 19) // 20 THEN n_chars END)
               OVER (PARTITION BY source) AS lo,
             MAX(CASE WHEN rn = n - (n + 19) // 20 + 1 THEN n_chars END)
               OVER (PARTITION BY source) AS hi
      FROM r)
    SELECT doc_id, source, n_chars,
           LEAST(GREATEST(n_chars, lo), hi) AS clipped,
           CAST(CASE WHEN n_chars < lo OR n_chars > hi
                THEN 1 ELSE 0 END AS BIGINT) AS was_clipped
    FROM w2
    """,
    tags=("llm", "pipeline", "winsorize", "quality"),
    since=4,
)
def pipeline_quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorization of the document-length signal at the
    exact 5th/95th discrete order statistics (k = ceil(n/20), integer
    formula identical in both engines — no float interpolation at the
    cut, so boundary rows can't flip): the outlier-clipping feature
    normalization run before length-aware curation models. ONE
    source-keyed shuffle; the rank window and the bound-extraction
    window share the partitioning, and the bounds attach as window
    maxima — no second pass over the corpus, no join."""
    d = _load(spark, sf_dir, "documents")
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wp = Window.partitionBy("source")
    r = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    k_lo = F.expr("(n + 19) DIV 20")
    k_hi = F.expr("n - ((n + 19) DIV 20) + 1")
    w2 = r.select(
        "doc_id",
        "source",
        "n_chars",
        F.max(F.when(F.col("rn") == k_lo, F.col("n_chars")))
        .over(wp)
        .alias("lo"),
        F.max(F.when(F.col("rn") == k_hi, F.col("n_chars")))
        .over(wp)
        .alias("hi"),
    )
    return w2.select(
        "doc_id",
        "source",
        "n_chars",
        F.least(F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi"))
        .alias("clipped"),
        ((F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi")))
        .cast("long")
        .alias("was_clipped"),
    )


# ---------------------------------------------------------------------------
# Real image downsample over decoded BMP bytes
# ---------------------------------------------------------------------------


@register(
    "multimodal_image_resize",
    oracle="""
    WITH bmp AS (
      SELECT doc_id,
             doc_id % 31 + 1 AS w,
             n_chars % 17 + 1 AS h
      FROM documents WHERE doc_id % 2 = 0),
    dims AS (
      SELECT doc_id, w, h,
             (w * 3 + 3) // 4 * 4 AS stride,
             (w + 1) // 2 AS ow,
             (h + 1) // 2 AS oh
      FROM bmp),
    px AS (
      SELECT doc_id, w, h, ow, oh,
             CAST(list_sum(flatten(
               list_transform(range(0, oh), r ->
                 flatten(list_transform(range(0, ow), c ->
                   list_transform(range(0, 3), ch ->
                     ((2*r*stride + 6*c + ch) * 7 + doc_id) % 256))))))
               AS BIGINT) AS out_checksum
      FROM dims)
    SELECT doc_id,
           CAST(w AS BIGINT) AS in_width,
           CAST(h AS BIGINT) AS in_height,
           CAST(ow AS BIGINT) AS out_width,
           CAST(oh AS BIGINT) AS out_height,
           out_checksum
    FROM px
    """,
    tags=("llm", "multimodal", "image", "resize", "pandas_udf"),
    since=4,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image downsample: synthesize the BMP payloads (even ids),
    decode the pixel array from the actual bytes, nearest-neighbor
    2x downsample (every 2nd row and column in storage order), and
    emit resized dims + the exact kept-byte checksum. The oracle
    predicts every checksum arithmetically from the synthesis
    formula — one wrong stride, padding byte, or row origin in the
    ndarray walk fails the hash (the BMP row padding is exactly the
    kind of bug this pins). Arrow-batched mapInPandas; a
    Pillow/Lanczos kernel drops into the same signature when codec
    libs exist."""
    d = (
        _load(spark, sf_dir, "documents")
        .filter("doc_id % 2 = 0")
        .select("doc_id", "n_chars")
    )
    return M.image_resize_nearest(M.synthesize_media(d), factor=2)


# ---------------------------------------------------------------------------
# Tokenizer vocabulary build
# ---------------------------------------------------------------------------


def _vocab_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted tokenizer VOCABULARY artifact (top-50
    ranked id table with frequencies — tokenizer.json's vocab
    section, sibling of the BPE merges artifact): one token-count
    pass per ingest; `pipeline_vocab_build` prices the build and
    hashes the read-back, `pipeline_tokenize_ids` broadcast-joins
    the stored table's top-30 prefix (the SAME deterministic
    ranking, so the prefix IS its vocab). Contract in
    `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact
    from ..operators.similarity import _write_artifact_manifest

    def build(path: str) -> None:
        from ..functions import normalize_text

        _write_artifact_manifest(spark, path, {"top_v": 50})
        d = _load(spark, sf_dir, "documents")
        toks = d.select(
            "doc_id",
            F.explode(
                F.split(normalize_text(F.col("text")), " ")
            ).alias("token"),
        )
        c = toks.groupBy("token").agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        top = c.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(50)
        w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
        (
            top.select(
                F.row_number().over(w).cast("long").alias("vocab_id"),
                "token",
                "n_occurrences",
                "doc_freq",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/vocab")
        )

    return ensure_artifact(spark, "vocab50", sf_dir, build)


def _read_vocab(
    spark: SparkSession, path: str, *, exact_top_v: int | None = None,
    min_top_v: int | None = None,
) -> DataFrame:
    """Read the persisted vocab table, validating its manifest first
    (r11 ADVICE: both consumers read ``{path}/vocab`` with no params
    check — an artifact rebuilt with a smaller or re-ranked top_v
    would silently encode with a truncated vocabulary instead of
    erroring like every other artifact reader). ``exact_top_v`` pins
    the build query's full-table hash; ``min_top_v`` guards a prefix
    join (a prefix of a LARGER same-ranking table is identical, so
    >= is the right contract there)."""
    from ..operators.similarity import read_artifact_manifest

    man = read_artifact_manifest(spark, path)
    got = man.get("top_v")
    if exact_top_v is not None and got != exact_top_v:
        raise ValueError(
            f"vocab artifact at {path!r} params mismatch: built with "
            f"top_v={got}, consumer wants top_v={exact_top_v}"
        )
    if min_top_v is not None and (got is None or got < min_top_v):
        raise ValueError(
            f"vocab artifact at {path!r} params mismatch: built with "
            f"top_v={got}, prefix consumer needs top_v>={min_top_v}"
        )
    return _read_pq(spark, f"{path}/vocab")


@register(
    "pipeline_vocab_build",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    t AS (SELECT doc_id, unnest(w) AS token FROM norm),
    c AS (
      SELECT token,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
      FROM t GROUP BY token),
    top AS (
      SELECT * FROM c ORDER BY n_occurrences DESC, token LIMIT 50)
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
                AS BIGINT) AS vocab_id,
           token, n_occurrences, doc_freq
    FROM top
    """,
    tags=("llm", "pipeline", "vocab", "tokenizer"),
    since=4,
    changed=12,
)
def pipeline_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary build: corpus token counts + document
    frequencies, ranked into stable integer vocab ids (count desc,
    token asc — fully deterministic, ids never depend on
    partitioning). The frequency scan is one token explode into a
    map-side-combining aggregate; the ranking runs AFTER a
    TakeOrderedAndProject top-V cut, so the global row_number window
    orders V rows, never the corpus vocabulary — at 100 TB the only
    full-vocab stage is the keyed count, the id-assignment cost is
    bounded by the vocab size you asked for. r11: the ranked table
    is a PERSISTED artifact — this query prices the one count pass
    (first toucher) and value-hashes the read-back (manifest-
    validated: a drifted top_v errors, r11 ADVICE)."""
    path = _vocab_artifact_path(spark, sf_dir)
    return _read_vocab(spark, path, exact_top_v=50)


# ---------------------------------------------------------------------------
# Product Quantization: train + encode + ADC search, fully unrolled
# ---------------------------------------------------------------------------


def _pq_sq(cent: str, qtab: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({qtab}.qv, {cent}.s), "
        f"p -> ({cent}.c*p[1]-p[2])*({cent}.c*p[1]-p[2]))) AS DOUBLE) "
        f"/ CAST({cent}.c*{cent}.c AS DOUBLE)"
    )


def _pq_assign(name: str, cent: str, qtab: str) -> str:
    sq = _pq_sq(cent, qtab)
    return f"""{name} AS (
      SELECT vec_id, cluster, qv, dist_key FROM (
        SELECT {qtab}.vec_id, {cent}.cluster, {qtab}.qv, {sq} AS dist_key,
               row_number() OVER (PARTITION BY {qtab}.vec_id
                                  ORDER BY {sq}, {cent}.cluster) AS rn
        FROM {qtab} CROSS JOIN {cent}) t WHERE rn = 1)"""


def _pq_update(a: str, prev: str, nxt: str, d: int) -> str:
    return f"""{nxt}d AS (
      SELECT cluster, pos, CAST(SUM(qv[pos]) AS BIGINT) AS s_d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {a}, UNNEST(range(1, {d + 1})) AS r(pos)
      GROUP BY cluster, pos),
    {nxt}u AS (
      SELECT cluster, list(s_d ORDER BY pos) AS s, any_value(c) AS c
      FROM {nxt}d GROUP BY cluster),
    {nxt} AS (
      SELECT {prev}.cluster, COALESCE({nxt}u.s, {prev}.s) AS s,
             COALESCE({nxt}u.c, {prev}.c) AS c
      FROM {prev} LEFT JOIN {nxt}u ON {prev}.cluster = {nxt}u.cluster)"""


def _pq_block(
    tag: str, lo: int, width: int, k: int, src: str = "embeddings"
) -> str:
    """Full per-block chain: quantized subvectors -> 2 Lloyd rounds ->
    final assignment af{tag} + trained codebook c2{tag}. ``src`` lets
    the OPQ oracle run the identical chain over its rotated-and-
    permuted vector CTE instead of the raw table."""
    return f"""q{tag} AS (
      SELECT vec_id,
             list_transform(list_slice(embedding, {lo}, {lo + width - 1}),
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT)) AS qv
      FROM {src}),
    c0{tag} AS (
      SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cluster,
             qv AS s, CAST(1 AS BIGINT) AS c
      FROM (SELECT * FROM q{tag} ORDER BY vec_id LIMIT {k})),
    {_pq_assign(f"a1{tag}", f"c0{tag}", f"q{tag}")},
    {_pq_update(f"a1{tag}", f"c0{tag}", f"c1{tag}", width)},
    {_pq_assign(f"a2{tag}", f"c1{tag}", f"q{tag}")},
    {_pq_update(f"a2{tag}", f"c1{tag}", f"c2{tag}", width)},
    {_pq_assign(f"af{tag}", f"c2{tag}", f"q{tag}")}"""


@register(
    "similarity_topk_pq",
    changed=10,
    oracle=f"""
    WITH {_pq_block("a", 1, 32, 16)},
    {_pq_block("b", 33, 32, 16)},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa WHERE vec_id < 20),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb WHERE vec_id < 20),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    scored AS (
      SELECT l0.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN luta l0 ON l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = l0.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> l0.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "pq", "quantization", "iterative"),
    since=4,
)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-Quantization ANN, the full lifecycle driver-verified:
    train one 16-codeword deterministic k-means PER 32-dim BLOCK,
    encode every corpus vector as 2 small code ids (the PQ memory
    story: 2 ints/vector vs 64 floats — the compression endpoint
    after float32 → int8), then answer top-5 by ADC — per-query
    block-distance lookup tables (broadcast, 16 rows/block) summed
    over the code table. The oracle unrolls BOTH per-block Lloyd
    chains, the encoding, the lookup tables, and the ranking, so a
    drift anywhere in train/encode/search fails the value hash.
    approx_dist is exact-int arithmetic into one IEEE division per
    block plus one add — bit-reproducible cross-engine.

    r10: served from the persisted IVF-PQ artifact in FLAT mode
    (the global codebooks + codes ARE the flat-PQ index; n_probe=None
    skips routing) — build priced once per process in
    `similarity_ivfpq_build_artifact`; the oracle still replays both
    Lloyd chains, so MATCH keeps verifying the full lifecycle."""
    path = _ivfpq_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_ivfpq_artifact(
        emb.filter(F.col("vec_id") < 20), path, k=5, n_probe=None,
        subspaces=2, width=32,
    )


@register(
    "similarity_topk_ivfpq",
    changed=10,
    oracle=f"""
    WITH {_pq_block("a", 1, 32, 16)},
    {_pq_block("b", 33, 32, 16)},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa WHERE vec_id < 20),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb WHERE vec_id < 20),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    q AS (SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE vec_id < 20),
    reps AS (
      SELECT label AS cluster, embedding AS rvec FROM (
        SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings) t WHERE rn = 1),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT q.query_id, r.cluster,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos("q.qvec", "r.rvec")} DESC,
                            r.cluster) AS pr
        FROM q CROSS JOIN reps r) t WHERE pr <= 2),
    memb AS (SELECT vec_id, label AS cluster FROM embeddings),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN memb m ON m.vec_id = c.vec_id
      JOIN probes p ON p.cluster = m.cluster
      JOIN luta l0 ON l0.query_id = p.query_id AND l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = p.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "ivf", "pq", "ann", "iterative"),
    since=7,
)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN composition (FAISS `IVFx,PQy`):
    coarse routing picks each query's 2 most-similar inverted lists
    (deterministic medoid reps, round(cos,6)-desc/cluster-asc probe
    ranking — `similarity_topk_ivf`'s routing), then ADC scores ONLY
    those lists' PQ code entries (`similarity_topk_pq`'s global
    2×16-codeword codebooks). The oracle unrolls BOTH halves — both
    per-block Lloyd chains, the encoding, the per-query lookup
    tables, the probe ranking, the membership restriction, and the
    final rank — so a drift anywhere in route/train/encode/search
    fails the value hash. Scan cost drops twice vs brute force:
    n_probe/n_lists of the corpus is touched, and each touched row
    costs two integer lookups + one add on a 2-byte code instead of
    a 64-float dot product.

    r10: served from the persisted IVF-PQ artifact (build priced
    once per process in `similarity_ivfpq_build_artifact`; results
    bit-identical to the in-process `S.topk_ivfpq` — the round-trip
    is pinned — and the oracle still replays the full lifecycle)."""
    path = _ivfpq_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_ivfpq_artifact(
        emb.filter(F.col("vec_id") < 20), path, k=5, n_probe=2,
        subspaces=2, width=32,
    )


# ---------------------------------------------------------------------------
# Persisted-index lifecycle: build the IVF-PQ artifact once, probe many
# ---------------------------------------------------------------------------


def _ivfpq_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted IVF-PQ artifact for this scope and return
    its path — built at most once per scope so repeated probes price
    the SEARCH, not the Lloyd build. Scoping, the ``_done`` marker,
    rmtree-before-rebuild, the per-path build lock, cache
    invalidation, and the opt-in stable artifact root all live in
    :func:`operators.artifacts.ensure_artifact`."""

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.ivfpq_build_artifact(
            emb, path, subspaces=2, codebook_k=16, iters=2
        )

    return ensure_artifact(spark, "ann_ivfpq", sf_dir, build)


@register(
    "similarity_ivfpq_build_artifact",
    oracle=f"""
    WITH {_pq_block("a", 1, 32, 16)},
    {_pq_block("b", 33, 32, 16)},
    cb AS (
      SELECT CAST(0 AS BIGINT) AS block, cluster, s, c FROM c2a
      UNION ALL
      SELECT CAST(1 AS BIGINT) AS block, cluster, s, c FROM c2b),
    asg AS (
      SELECT CAST(0 AS BIGINT) AS block, cluster FROM afa
      UNION ALL
      SELECT CAST(1 AS BIGINT) AS block, cluster FROM afb),
    cnt AS (
      SELECT block, cluster, CAST(COUNT(*) AS BIGINT) AS n_codes
      FROM asg GROUP BY block, cluster)
    SELECT cb.block, CAST(cb.cluster AS BIGINT) AS codeword,
           cb.c AS n_members,
           array_to_string(cb.s, ',') AS s_str,
           COALESCE(cnt.n_codes, 0) AS n_codes
    FROM cb LEFT JOIN cnt
      ON cnt.block = cb.block AND cnt.cluster = cb.cluster
    """,
    tags=("llm", "similarity", "ann", "index", "artifact", "iterative"),
    since=9,
)
def similarity_ivfpq_build_artifact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Build half of the production build-once / probe-many ANN
    lifecycle: train the IVF-PQ index (2 blocks x 16 exact-integer
    Lloyd codewords + per-cluster inverted lists) and persist it as a
    parquet artifact — codes hive-partitioned by cluster (each
    inverted list a partition directory), codebooks, and routing
    medoids (`operators/similarity.ivfpq_build_artifact`). The
    returned manifest is read BACK from the written artifact — one
    row per (block, codeword) with the exact integer centroid state
    (s_str, n_members) and the number of corpus codes assigned to it
    — so the value hash proves the round-tripped index, not just the
    in-memory build. The oracle replays both Lloyd chains and the
    encoding in SQL.

    Scale: the corpus-sized relation (codes) is written ONCE; every
    subsequent probe query reads only the probed partitions. The
    build is priced here and nowhere else."""
    path = _ivfpq_artifact_path(spark, sf_dir)
    codes = _read_pq(spark, f"{path}/codes")
    asg = codes.select(
        F.lit(0).cast("long").alias("block"),
        F.col("c0").alias("cluster"),
    ).unionAll(
        codes.select(
            F.lit(1).cast("long").alias("block"),
            F.col("c1").alias("cluster"),
        )
    )
    cnt = asg.groupBy("block", "cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_codes")
    )
    book = _read_pq(spark, f"{path}/codebooks").select(
        F.col("block").cast("long").alias("block"),
        F.col("cluster").alias("cluster"),
        F.col("c").alias("n_members"),
        F.concat_ws(",", F.col("s").cast("array<string>")).alias(
            "s_str"
        ),
    )
    return (
        book.join(
            F.broadcast(cnt),
            ["block", "cluster"],
            "left",
        )
        .select(
            "block",
            F.col("cluster").cast("long").alias("codeword"),
            "n_members",
            "s_str",
            F.coalesce(F.col("n_codes"), F.lit(0).cast("long")).alias(
                "n_codes"
            ),
        )
    )


def _sql_ivfpq_probe_oracle(
    qfilter: str, tombstone_pred: str = ""
) -> str:
    """Full IVF-PQ build-then-probe replay with a parametrizable
    query-batch filter and an optional tombstone exclusion predicate
    (AND'ed into the scored CTE) — shared by the artifact probe and
    the delete probe."""
    return f"""
    WITH {_pq_block("a", 1, 32, 16)},
    {_pq_block("b", 33, 32, 16)},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa
            WHERE {qfilter}),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb
            WHERE {qfilter}),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    q AS (SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE {qfilter}),
    reps AS (
      SELECT label AS cluster, embedding AS rvec FROM (
        SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings) t WHERE rn = 1),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT q.query_id, r.cluster,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos("q.qvec", "r.rvec")} DESC,
                            r.cluster) AS pr
        FROM q CROSS JOIN reps r) t WHERE pr <= 2),
    memb AS (SELECT vec_id, label AS cluster FROM embeddings),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN memb m ON m.vec_id = c.vec_id
      JOIN probes p ON p.cluster = m.cluster
      JOIN luta l0 ON l0.query_id = p.query_id AND l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = p.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> p.query_id{tombstone_pred}),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """


@register(
    "similarity_topk_from_artifact",
    oracle=_sql_ivfpq_probe_oracle("vec_id >= 20 AND vec_id < 40"),
    tags=("llm", "similarity", "topk", "ann", "index", "artifact"),
    since=9,
)
def similarity_topk_from_artifact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Probe half of build-once / probe-many: IVF-PQ top-5 for a
    fresh query batch (vec_id 20..39) served from the PERSISTED
    artifact — the returned plan reads the three index relations and
    the query vectors only; no Lloyd stage, no corpus-vector scan
    (pinned in tests/test_plans.py: the probe plan's scans are the
    artifact + embeddings, and the code scan carries the probed-
    cluster partition restriction). The oracle replays
    build-then-probe from scratch, so a MATCH proves the artifact
    round-trip is lossless — same codes, codebooks, routing, and ADC
    arithmetic as the in-process `similarity_topk_ivfpq`, priced at
    probe cost. At 100 TB the codes partitions ARE the inverted
    lists: a 2-of-10-cluster probe reads 20% of the index bytes and
    none of the raw vectors."""
    path = _ivfpq_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_ivfpq_artifact(
        emb.filter(
            (F.col("vec_id") >= 20) & (F.col("vec_id") < 40)
        ),
        path,
        k=5,
        n_probe=2,
        subspaces=2,
        width=32,
    )


def _ivfpq_inc_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the INCREMENTAL-ingest demo artifact: index built on
    yesterday's corpus (vec_id < 400), today's batch (vec_id >= 400)
    appended with the existing codebooks — no retrain. Separate path
    from the full-corpus artifact (appending into that one would
    duplicate codes); ``_done`` marker written after the append so a
    crashed half-ingest rebuilds (contract in `ensure_artifact`)."""

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.ivfpq_build_artifact(
            emb.filter(F.col("vec_id") < 400),
            path,
            subspaces=2,
            codebook_k=16,
            iters=2,
        )
        S.ivfpq_encode_append(
            emb.filter(F.col("vec_id") >= 400), path, subspaces=2
        )

    return ensure_artifact(spark, "ann_ivfpq_inc", sf_dir, build)


@register(
    "similarity_ivfpq_append_probe",
    oracle=f"""
    WITH old AS (SELECT * FROM embeddings WHERE vec_id < 400),
    {_pq_block("a", 1, 32, 16, src="old")},
    {_pq_block("b", 33, 32, 16, src="old")},
    qna AS (
      SELECT vec_id,
             list_transform(list_slice(embedding, 1, 32),
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT))
               AS qv
      FROM embeddings WHERE vec_id >= 400),
    qnb AS (
      SELECT vec_id,
             list_transform(list_slice(embedding, 33, 64),
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT))
               AS qv
      FROM embeddings WHERE vec_id >= 400),
    {_pq_assign("ana", "c2a", "qna")},
    {_pq_assign("anb", "c2b", "qnb")},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id
      UNION ALL
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM ana x JOIN anb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa WHERE vec_id < 20),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb WHERE vec_id < 20),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    q AS (SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE vec_id < 20),
    reps AS (
      SELECT label AS cluster, embedding AS rvec FROM (
        SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM old) t WHERE rn = 1),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT q.query_id, r.cluster,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos("q.qvec", "r.rvec")} DESC,
                            r.cluster) AS pr
        FROM q CROSS JOIN reps r) t WHERE pr <= 2),
    memb AS (SELECT vec_id, label AS cluster FROM embeddings),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN memb m ON m.vec_id = c.vec_id
      JOIN probes p ON p.cluster = m.cluster
      JOIN luta l0 ON l0.query_id = p.query_id AND l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = p.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "ann", "index", "incremental",
          "iterative"),
    since=9,
)
def similarity_ivfpq_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental index ingest, end to end: the IVF-PQ artifact is
    built on yesterday's corpus (vec_id < 400), today's batch
    (vec_id >= 400) is ENCODED WITH THE EXISTING CODEBOOKS — a
    broadcast-codebook argmin pass, zero Lloyd iterations — and
    appended to the partitioned inverted lists
    (`operators/similarity.ivfpq_encode_append`, FAISS `index.add`
    parity); the probe then searches the MERGED index and must see
    both generations. The oracle replays build-then-append-then-probe
    (old-corpus Lloyd chains, new-batch assignment against the frozen
    c2 codebooks, union of code tables), so a MATCH proves the
    no-retrain encode is bit-identical to the from-scratch
    assignment. At 100 TB this is the nightly shape: train once,
    ingest batches at one linear pass each, retrain only when the
    registry's centroid-drift monitor alarms."""
    path = _ivfpq_inc_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_ivfpq_artifact(
        emb.filter(F.col("vec_id") < 20),
        path,
        k=5,
        n_probe=2,
        subspaces=2,
        width=32,
    )


@register(
    "similarity_topk_refine",
    changed=10,
    oracle=f"""
    WITH {_pq_block("a", 1, 32, 16)},
    {_pq_block("b", 33, 32, 16)},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa WHERE vec_id < 20),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb WHERE vec_id < 20),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    scored AS (
      SELECT l0.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN luta l0 ON l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = l0.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> l0.query_id),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx_dist, neighbor_id)
                 AS rnk
        FROM scored) t WHERE rnk <= 20),
    xint AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT))
               AS xv
      FROM embeddings),
    refined AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(CAST(list_sum(list_transform(
                     list_zip(q.xv, n.xv),
                     p -> (p[1] - p[2]) * (p[1] - p[2])))
                   AS DOUBLE) / 1048576.0, 6) AS exact_dist
      FROM cand
      JOIN xint q ON q.vec_id = cand.query_id
      JOIN xint n ON n.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, exact_dist, rnk FROM (
      SELECT query_id, neighbor_id, exact_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY exact_dist, neighbor_id)
               AS rnk
      FROM refined) t WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "ann", "refine", "iterative"),
    since=9,
)
def similarity_topk_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rerank refine rung (FAISS `RFlat` parity) — the ladder's
    recall CLOSER, not another recall gauge: the flat-PQ rung sweeps
    the corpus at 2 bytes/vector for a 20-candidate shortlist per
    query, then `operators/similarity.topk_refine_exact` re-ranks
    ONLY the shortlist by exact quantized L2 from the original
    vectors and keeps top-5. Within-candidate ordering becomes exact
    (the PQ approximation decides membership, never final rank). The
    oracle replays the whole composition — both Lloyd chains, the
    encode, the ADC shortlist, and the exact re-rank — so a drift in
    either stage fails the hash. Full vectors are touched for
    |Q| x 20 rows only (one broadcast-candidate keyed join); the
    corpus-wide scan stays at PQ-code width.

    r10: the candidate stage serves from the persisted IVF-PQ
    artifact in FLAT mode (identical codes/codebooks; build priced
    once per process) — the refine rung now costs its re-rank, which
    is the production shape: FAISS `RFlat` wraps a LIVE index."""
    path = _ivfpq_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    cand = S.topk_from_ivfpq_artifact(
        q, path, k=20, n_probe=None, subspaces=2, width=32
    )
    return S.topk_refine_exact(cand, q, emb, k=5)


def _ivfpq_tombstones_ready(
    spark: SparkSession, sf_dir: str, path: str
) -> None:
    """Ensure the demo tombstone set exists on the full-corpus
    artifact: logically delete every 5th corpus vector outside the
    query batch (vec_id % 5 == 2, vec_id >= 20). Marker-guarded so
    repeated probes in one process don't re-append the same ids
    (FAISS `remove_ids` is a one-shot mutation; the probe prices the
    SEARCH). Tombstones are a sibling relation — probes that don't
    opt in (`apply_tombstones=False`) are unaffected, so the delete
    demo shares the artifact with the plain probe queries."""
    import os

    marker = os.path.join(path, "_tomb_done")
    if not os.path.exists(marker):
        emb = _load(spark, sf_dir, "embeddings")
        S.ivfpq_delete_ids(
            emb.filter(
                (F.col("vec_id") % 5 == 2) & (F.col("vec_id") >= 20)
            ),
            path,
        )
        open(marker, "w").close()


@register(
    "similarity_ivfpq_delete_probe",
    oracle=_sql_ivfpq_probe_oracle(
        "vec_id < 20",
        "\n        AND NOT (c.vec_id % 5 = 2 AND c.vec_id >= 20)",
    ),
    tags=("llm", "similarity", "ann", "index", "delete"),
    since=10,
)
def similarity_ivfpq_delete_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Index deletion (FAISS `remove_ids` parity) — the verb that
    completes the persisted-index lifecycle (build / append / delete
    / drift-triggered retrain): every 5th corpus vector is
    tombstoned (`operators/similarity.ivfpq_delete_ids` appends ids
    to the artifact's tombstone relation; the inverted lists stay
    immutable), and the probe anti-joins the broadcast tombstone set
    away BEFORE ADC scoring, so deleted vectors never surface as
    neighbors. The oracle replays build-then-probe with the deletion
    predicate applied to the scored candidates — a MATCH proves the
    tombstone semantics equal a filtered rebuild. At 100 TB deletes
    stay index-metadata-sized on the query path; physical
    reclamation is a periodic partition-local compaction, never a
    probe-time cost."""
    path = _ivfpq_artifact_path(spark, sf_dir)
    _ivfpq_tombstones_ready(spark, sf_dir, path)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_ivfpq_artifact(
        emb.filter(F.col("vec_id") < 20),
        path,
        k=5,
        n_probe=2,
        subspaces=2,
        width=32,
        apply_tombstones=True,
    )


# ---------------------------------------------------------------------------
# Tokenize-to-ids: apply the built vocabulary to the corpus
# ---------------------------------------------------------------------------


@register(
    "pipeline_tokenize_ids",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    t AS (
      SELECT doc_id, token, pos FROM (
        SELECT doc_id, unnest(w) AS token,
               generate_subscripts(w, 1) AS pos
        FROM norm) z),
    c AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM t GROUP BY token),
    top AS (
      SELECT * FROM c ORDER BY n_occurrences DESC, token LIMIT 30),
    vocab AS (
      SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
                  AS BIGINT) AS vocab_id, token
      FROM top),
    ids AS (
      SELECT t.doc_id, t.pos, COALESCE(v.vocab_id, 0) AS tid
      FROM t LEFT JOIN vocab v ON t.token = v.token)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(pos * tid) AS BIGINT) AS ids_checksum
    FROM ids GROUP BY doc_id
    """,
    tags=("llm", "pipeline", "tokenizer", "vocab"),
    since=4,
    changed=12,
)
def pipeline_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids — the apply half of the vocabulary pair
    (`pipeline_vocab_build` trains the id table; this encodes the
    corpus with it): every token maps to its vocab id via a BROADCAST
    join against the top-30 vocabulary, out-of-vocabulary tokens take
    id 0, and each doc reports token/OOV counts plus a
    position-weighted id checksum (sum of pos*id — pins the exact id
    SEQUENCE, not just the multiset, so a reordered or misaligned
    encoding fails the hash). One token explode, one broadcast map-
    side join, one doc-keyed aggregate: the corpus never shuffles by
    token — exactly how a 100 TB encode pass should look (the vocab
    is the only thing that moves). r11: the vocab arrives as the
    top-30 PREFIX of the persisted vocab50 artifact (identical
    deterministic ranking — count desc, token asc — so the prefix
    IS the top-30 table); no per-invocation count pass."""
    from ..functions import normalize_text

    d = _load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.split(normalize_text(F.col("text")), " ")
        ).alias("pos0", "token"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    path = _vocab_artifact_path(spark, sf_dir)
    vocab = (
        # manifest-validated (r11 ADVICE): the top-30 prefix join is
        # only sound when the stored ranking covers >= 30 rows
        _read_vocab(spark, path, min_top_v=30)
        .filter(F.col("vocab_id") <= 30)
        .select("vocab_id", "token")
    )
    ids = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("vocab_id"), F.lit(0)).alias("tid"),
    )
    return ids.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("long")).alias("n_oov"),
        F.sum(F.col("pos") * F.col("tid")).alias("ids_checksum"),
    )


# ---------------------------------------------------------------------------
# Bigram LM quality score
# ---------------------------------------------------------------------------


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    toks AS (
      SELECT doc_id, g.pos AS pos, d.w[g.pos] AS tok
      FROM docs d,
           LATERAL (SELECT unnest(generate_series(1, len(d.w))) AS pos) g),
    big AS (
      SELECT a.doc_id, a.pos, b.tok AS prev, a.tok
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos - 1),
    bf AS (SELECT prev, tok, COUNT(*) AS cb FROM big GROUP BY prev, tok),
    pf AS (SELECT prev, COUNT(*) AS cp FROM big GROUP BY prev),
    lp AS (
      SELECT g.doc_id, g.pos,
             ln(CAST(bf.cb AS DOUBLE) / CAST(pf.cp AS DOUBLE)) AS lp
      FROM big g
      JOIN bf ON bf.prev = g.prev AND bf.tok = g.tok
      JOIN pf ON pf.prev = g.prev),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             list_sum(list(lp ORDER BY pos)) AS s
      FROM lp GROUP BY doc_id)
    SELECT doc_id, n_bigrams, round(-s / n_bigrams, 6) AS avg_neg_logprob
    FROM per_doc
    """,
    tags=("llm", "text", "quality", "ngram"),
    since=4,
    changed=13,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram cross-entropy per doc — the next rung of the
    CCNet-style perplexity ladder after `text_unigram_logprob`:
    conditional surprise ln P(w_i|w_{i-1}) from the corpus's own
    bigram table catches formulaic-but-unigram-plausible text
    (shuffled word salad) the unigram score can't. Exact integer
    counts into one division + ln per bigram; per-doc sums fold in
    position order in BOTH engines so accumulation never depends on
    partitioning; frequency joins pinned shuffle_hash against the
    explode-inherited broadcast estimate hazard.

    r12: the corpus bigram LM (both count tables) serves from the
    corpus_grams artifact's offset-1 pair counts — the stored
    zip_with pair stream is exactly the lag-derived bigram multiset;
    only the positional doc side computes live. The oracle replays
    the full live pipeline."""
    from .llm_ops import _corpus_grams_artifact_path

    d = _load(spark, sf_dir, "documents")
    path = _corpus_grams_artifact_path(spark, sf_dir)
    bc = T.read_corpus_grams(spark, path, "pairs").filter(
        F.col("off") == 1
    )
    return T.bigram_logprob_score(d, bigram_counts=bc)


# ---------------------------------------------------------------------------
# Dedup keep-list apply: the stage that actually shrinks the corpus
# ---------------------------------------------------------------------------


@register(
    "dedup_apply_keeplist",
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
    drops AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d LEFT JOIN drops x ON d.doc_id = x.doc_id
    WHERE x.doc_id IS NULL
    """,
    tags=("llm", "dedup", "apply", "iterative"),
    since=4,
    changed=13,
)
def dedup_apply_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stage that actually SHRINKS the corpus: MinHash-LSH pairs
    -> connected components -> every non-canonical member (doc_id !=
    its component's min label) becomes a drop row, and the surviving
    corpus is one ANTI JOIN against that duplicate-sized drop list —
    never a corpus-sized rewrite of anything but the final output.
    Closes the dedup loop the pair/cluster/census queries analyze:
    pairs (detection) -> clusters (grouping) -> THIS (the cut). The
    oracle recomputes components with the recursive transitive-
    closure CTE and anti-joins identically. r11: pairs come from the
    persisted text pair artifact (one pushed-filter scan); only the
    min-label iterations and the cut run per invocation."""
    from .llm_ops import _minhash_pairs_artifact_path

    docs = _load(spark, sf_dir, "documents")
    pairs = D.read_minhash_pairs(
        spark, _minhash_pairs_artifact_path(spark, sf_dir), threshold=0.5
    )
    comps = D.connected_components(pairs)
    drops = comps.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return docs.join(drops, "doc_id", "left_anti").select(
        "doc_id", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup graph
# ---------------------------------------------------------------------------


@register(
    "similarity_graph_triangles",
    changed=11,
    oracle=f"""
    WITH {_lsh_pairs_cte()},
    e AS (SELECT id1 AS a, id2 AS b FROM scored WHERE score >= 0.3),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    ends AS (
      SELECT a AS vec_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM ends GROUP BY vec_id
    """,
    tags=("llm", "similarity", "graph", "triangles"),
    since=4,
)
def similarity_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the sign-LSH near-dup graph —
    the clustering-density report that tells you whether near-dup
    components are cliques (true duplicate groups: safe to keep one
    representative) or chains (threshold too loose: transitive
    merging is gluing unrelated docs). Standard distributed triangle
    enumeration over the ORIENTED edge list (id1 < id2 everywhere),
    so each triangle is found exactly once: two node-keyed joins on
    a pair list that is candidate-sized, never corpus-sized — join
    volume is bounded by the degree distribution the
    `similarity_graph_degree` report already audits. r11: the pair
    list serves from the persisted edge artifact
    (`_neardup_edges_artifact_path`) — the three plan branches each
    read one pair-sized parquet scan with a pushed-down score filter;
    the per-invocation LSH pass (signature fold + band self-join +
    rescore) is gone from the plan, and the oracle still replays it
    in SQL so a MATCH proves the artifact round-trip."""
    from .llm_ops import _neardup_edges_artifact_path

    path = _neardup_edges_artifact_path(spark, sf_dir)
    pairs = (
        S.read_neardup_edges(spark, path, threshold=0.3)
        .select("id1", "id2")
        # 3 branches consume the pair list within one action — scan
        # the artifact once and serve the branches from blocks
        # (pair-list-sized, >= 3 consumers: the r5 materialization
        # rule), instead of re-inlining the scan 9x into the unioned
        # triangle subtrees
        .localCheckpoint(eager=True)
    )
    ea = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
    eb = pairs.select(F.col("id1").alias("b"), F.col("id2").alias("c"))
    ec = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("c"))
    tri = ea.join(eb, "b").join(ec, ["a", "c"])
    ends = (
        tri.select(F.col("a").alias("vec_id"))
        .unionAll(tri.select(F.col("b").alias("vec_id")))
        .unionAll(tri.select(F.col("c").alias("vec_id")))
    )
    out = ends.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    from ..operators.dedup import _track_caches

    return _track_caches(out, [pairs])


# ---------------------------------------------------------------------------
# Prefix-sharded Bloom guard: the past-broadcast-size membership path
# ---------------------------------------------------------------------------

_NORM_SH = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_SH_KEY = "CAST(concat('0x', substr(fp, 31, 2)) AS BIGINT) % 8"
_SH_P = (
    "CAST(concat('0x', substr(fp, {o}, 8)) AS BIGINT) % (SELECT m FROM mb)"
)
_SH_HIT = " AND ".join(
    f"""EXISTS(SELECT 1 FROM words x
        WHERE x.shard = ({_SH_KEY})
          AND x.w = ({_SH_P.format(o=1 + 8 * j)}) // 62
          AND (x.word & (CAST(1 AS BIGINT)
               << CAST(({_SH_P.format(o=1 + 8 * j)}) % 62 AS INT))) != 0)"""
    for j in range(3)
)


@register(
    "dedup_bloom_guard_sharded",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, md5({_NORM_SH}) AS fp FROM documents),
    hist AS (SELECT DISTINCT fp FROM n WHERE doc_id % 3 = 0),
    mb AS (
      SELECT ((greatest(992, ((COUNT(*) + 7) // 8) * 10) + 61) // 62) * 62
               AS m
      FROM hist),
    hp AS (
      SELECT {_SH_KEY} AS shard, {_SH_P.format(o=1)} AS p FROM hist
      UNION ALL SELECT {_SH_KEY}, {_SH_P.format(o=9)} FROM hist
      UNION ALL SELECT {_SH_KEY}, {_SH_P.format(o=17)} FROM hist),
    words AS (
      SELECT shard, p // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 62 AS INT)) AS word
      FROM hp GROUP BY shard, p // 62)
    SELECT doc_id,
           CAST(CASE WHEN {_SH_HIT} THEN 1 ELSE 0 END AS BIGINT)
             AS bloom_hit,
           CAST(CASE WHEN fp IN (SELECT fp FROM hist) THEN 1 ELSE 0 END
                AS BIGINT) AS true_dup
    FROM n
    """,
    tags=("llm", "dedup", "bloom", "sharded", "scale"),
    since=4,
)
def dedup_bloom_guard_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom guard at past-broadcast scale: the historical
    fingerprint set shards by an md5 prefix into 8 independent
    auto-sized bitmaps (each row a few MB however large the corpus —
    raise n_shards, not the row width), and every probe routes to its
    shard's bitmap through an 8-row broadcast join. Same
    no-false-negative invariant as `dedup_bloom_guard`; the oracle
    re-derives the per-shard width from its own COUNT(*) (mean
    members per shard x 10 bits) and rebuilds every shard's bitmap
    bit-for-bit, so a routing error, a width divergence, or one
    flipped bit in ANY shard fails the value hash."""
    from ..functions import normalize_text

    d = _load(spark, sf_dir, "documents")
    n = d.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("fp"))
    hist = n.filter(F.col("doc_id") % 3 == 0).select("fp").distinct()
    family = SC.bloom_bitmap_sharded(hist, n_shards=8).localCheckpoint()
    probed = SC.bloom_might_contain_sharded(n, family, n_shards=8)
    truth = hist.withColumn("true_dup", F.lit(1).cast("long"))
    return (
        probed.join(F.broadcast(truth), "fp", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("true_dup"), F.lit(0).cast("long")).alias(
                "true_dup"
            ),
        )
    )


# ---------------------------------------------------------------------------
# CMS as a rollup: daily sketches merged to month == direct build
# ---------------------------------------------------------------------------

_CMS_EV_CELLS = " UNION ALL ".join(
    f"""SELECT {j} AS j,
        CAST(concat('0x', substr(md5('{j}|' || CAST(user_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 256 AS cell
        FROM events"""
    for j in range(4)
)
_CMS_EV_PROBE = " UNION ALL ".join(
    f"""SELECT user_id, exact_count, {j} AS j,
        CAST(concat('0x', substr(md5('{j}|' || CAST(user_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 256 AS cell
        FROM top"""
    for j in range(4)
)


@register(
    "rollup_countmin_daily",
    oracle=f"""
    WITH ex AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM events GROUP BY user_id),
    top AS (
      SELECT * FROM ex ORDER BY exact_count DESC, user_id LIMIT 10),
    cells AS ({_CMS_EV_CELLS}),
    counters AS (
      SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS n
      FROM cells GROUP BY j, cell),
    probe AS ({_CMS_EV_PROBE})
    SELECT p.user_id, p.exact_count,
           MIN(COALESCE(c.n, 0)) AS cms_estimate,
           MIN(COALESCE(c.n, 0)) - p.exact_count AS overestimate
    FROM probe p LEFT JOIN counters c ON c.j = p.j AND c.cell = p.cell
    GROUP BY p.user_id, p.exact_count
    """,
    tags=("rollup", "sketch", "countmin", "mergeable"),
    since=4,
)
def rollup_countmin_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min as a CONTINUOUS AGGREGATE: the plan builds one
    sketch-sized counter table PER DAY and folds them to the month by
    cell-wise SUM — the nightly maintenance path, where each day's
    events are sketched once and the standing monthly sketch is an
    increment, never a rescan. The oracle builds the monthly sketch
    DIRECTLY from the raw stream, so the green row IS the
    merge == rebuild proof (the same oracle construction
    `rollup_merge_day` uses for additive rollups, extended to the
    sketch family alongside the HLL rollup). Estimates for the 10
    hottest users verify CMS's only-over guarantee against exact
    counts."""
    ev = load_table(spark, sf_dir, "events")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                SC._cms_cell(F.col("user_id"), j, 256).alias("cell"),
            )
            for j in range(4)
        ]
    )
    daily = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            F.explode(cells).alias("jc"),
        )
        .groupBy("day", F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    month = daily.groupBy("j", "cell").agg(F.sum("n").alias("n"))
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(10)
    est = SC.countmin_estimate(top, month, "user_id", depth=4, width=256)
    return est.select(
        "user_id",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# MAD robust anomaly detection
# ---------------------------------------------------------------------------


@register(
    "anomaly_value_mad",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events),
    m AS (
      SELECT event_id, user_id, value,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN value END)
               OVER (PARTITION BY user_id) AS med
      FROM r),
    d AS (
      SELECT event_id, user_id, value, med,
             abs(value - med) AS dev,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY abs(value - med), event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM m),
    md AS (
      SELECT event_id, user_id, value, med, dev,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END)
               OVER (PARTITION BY user_id) AS mad
      FROM d)
    SELECT event_id, user_id,
           round(value, 6) AS value,
           round(med, 6) AS med,
           round(mad, 6) AS mad,
           round(dev, 6) AS deviation
    FROM md WHERE dev > 3 * mad
    """,
    tags=("temporal", "anomaly", "mad", "robust"),
    since=4,
)
def anomaly_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier detection via MEDIAN ABSOLUTE DEVIATION
    — the companion to `anomaly_value_zscore` that extreme outliers
    can't poison (mean and stddev both move with the outlier being
    hunted; the median and MAD don't). Both medians are exact DISCRETE
    order statistics (lower median, rank (n+1)//2 with event_id
    tie-breaks — no float interpolation, so the cut row can't flip
    across engines), picked as window maxima over the SAME user
    partitioning the rank windows use: the whole two-stage median
    computation rides one user-keyed shuffle. Flags rows with
    |value - median| > 3 * MAD."""
    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("user_id").orderBy("value", "event_id")
    wp = Window.partitionBy("user_id")
    r = ev.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    med = F.max(
        F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("value"))
    ).over(wp)
    m = r.select("event_id", "user_id", "value", med.alias("med"))
    dev = F.abs(F.col("value") - F.col("med"))
    wd = Window.partitionBy("user_id").orderBy(dev, "event_id")
    d = m.select(
        "event_id",
        "user_id",
        "value",
        "med",
        dev.alias("dev"),
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    mad = F.max(
        F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("dev"))
    ).over(wp)
    md = d.select(
        "event_id", "user_id", "value", "med", "dev", mad.alias("mad")
    )
    return md.filter(F.col("dev") > 3 * F.col("mad")).select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        F.round("dev", 6).alias("deviation"),
    )


@register(
    "similarity_graph_pagerank",
    changed=11,
    oracle=f"""
    WITH {_lsh_pairs_cte()},
    base AS (SELECT id1, id2 FROM scored WHERE score >= 0.4),
    edges AS (SELECT id1 AS src, id2 AS dst FROM base
              UNION ALL
              SELECT id2 AS src, id1 AS dst FROM base),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d
            FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS n FROM edges),
    c1 AS (
      SELECT e.dst, e.src, (1.0 / nn.n) / dg.d AS contrib
      FROM edges e JOIN deg dg ON e.src = dg.src CROSS JOIN nn),
    s1 AS (SELECT dst, list_sum(list(contrib ORDER BY src)) AS s
           FROM c1 GROUP BY dst),
    pr1 AS (SELECT s1.dst AS v, 0.85 * s1.s + (1.0 - 0.85) / nn.n AS pr
            FROM s1 CROSS JOIN nn),
    c2 AS (
      SELECT e.dst, e.src, p.pr / dg.d AS contrib
      FROM edges e JOIN deg dg ON e.src = dg.src
      JOIN pr1 p ON p.v = e.src),
    s2 AS (SELECT dst, list_sum(list(contrib ORDER BY src)) AS s
           FROM c2 GROUP BY dst)
    SELECT s2.dst AS vec_id,
           round(0.85 * s2.s + (1.0 - 0.85) / nn.n, 6) AS pagerank
    FROM s2 CROSS JOIN nn
    """,
    tags=("llm", "similarity", "graph", "pagerank", "iterative"),
    since=4,
)
def similarity_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-iteration PageRank over the sign-LSH near-dup graph — the
    centrality-based canonical-representative picker (keep the
    most-connected variant of a template instead of the arbitrary min
    id). Both power iterations are UNROLLED in the oracle, so the
    green row verifies the full iterative chain value-for-value, the
    same proof strategy as the k-means build. Contribution sums fold
    in source-id order on both engines; rank-table joins are
    shuffle_hash-pinned (everything descends from the explode-derived
    pair generator). The pair list is persisted: the edge/degree/rank
    branches all read one LSH computation. The 16x4 banding is
    oracle-parity sizing for the test corpus ONLY — production calls
    omit the pins and get auto_lsh_bands (bits = ceil(log2 N));
    SCALING.md r5 measured the pinned variant dying at 10x volume
    (occupancy^2 hash-relation build) while the auto path scales.

    r11: serves from the persisted GRAPH artifact
    (`_neardup_graph_artifact_path` — components + converged ranks
    computed once per scope from the edge artifact): the plan is one
    node-sized parquet scan; the LSH pass AND the power iterations
    are priced in the graph build, not per invocation. The oracle
    still replays banding + both unrolled iterations, so a MATCH
    proves the persisted ranks equal the live computation."""
    from .llm_ops import _neardup_graph_artifact_path

    path = _neardup_graph_artifact_path(spark, sf_dir)
    return _read_pq(spark, f"{path}/ranks").select(
        "vec_id", "pagerank"
    )


@register(
    "dedup_canonical_pagerank",
    changed=11,
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
    edges AS (SELECT id1 AS src, id2 AS dst FROM base
              UNION ALL
              SELECT id2 AS src, id1 AS dst FROM base),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d
            FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS n FROM edges),
    c1 AS (
      SELECT e.dst, e.src, (1.0 / nn.n) / dg.d AS contrib
      FROM edges e JOIN deg dg ON e.src = dg.src CROSS JOIN nn),
    s1 AS (SELECT dst, list_sum(list(contrib ORDER BY src)) AS s
           FROM c1 GROUP BY dst),
    pr1 AS (SELECT s1.dst AS v, 0.85 * s1.s + (1.0 - 0.85) / nn.n AS pr
            FROM s1 CROSS JOIN nn),
    c2 AS (
      SELECT e.dst, e.src, p.pr / dg.d AS contrib
      FROM edges e JOIN deg dg ON e.src = dg.src
      JOIN pr1 p ON p.v = e.src),
    s2 AS (SELECT dst, list_sum(list(contrib ORDER BY src)) AS s
           FROM c2 GROUP BY dst),
    pr2 AS (SELECT s2.dst AS vec_id,
                   round(0.85 * s2.s + (1.0 - 0.85) / nn.n, 6) AS pagerank
            FROM s2 CROSS JOIN nn),
    ranked AS (
      SELECT c.cluster_id, c.vec_id, p.pagerank,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY p.pagerank DESC, c.vec_id) AS rn
      FROM comp c JOIN pr2 p ON p.vec_id = c.vec_id)
    SELECT cluster_id, vec_id AS keep_id, pagerank
    FROM ranked WHERE rn = 1
    """,
    tags=("llm", "dedup", "graph", "pagerank", "iterative"),
    since=4,
)
def dedup_canonical_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality-canonical representative per near-dup component:
    connected components pick the cluster, PageRank picks WHICH
    member to keep (highest centrality = the variant most connected
    to the rest of its cluster — the least-mutated template copy),
    tie-broken by rounded rank then min id so the choice is
    engine-stable. Composes three verified pieces — the sign-LSH pair
    generator, min-label components, and the unrolled two-iteration
    PageRank — into the detect -> cluster -> RANK -> choose loop; the
    oracle replays all three (recursive closure + unrolled power
    iterations) so the whole composition is value-checked. Ranking
    uses the ROUNDED pagerank: the unrounded doubles are
    IEEE-deterministic here (no transcendentals in the chain), but
    rounding before ORDER BY makes the tie-break robust by
    construction rather than by proof. All joins are pair-list- or
    node-sized; ONE LSH computation feeds both the component and the
    rank branches via the persisted pair list. As with
    similarity_graph_pagerank, the 16x4 banding is oracle-parity
    sizing for the test corpus; production omits the pins for
    auto_lsh_bands sizing (SCALING.md r5 curve).

    r11: serves from the persisted GRAPH artifact
    (`_neardup_graph_artifact_path`): membership and centrality are
    two node-sized parquet scans; closure and power iterations are
    priced in the graph build, once per scope. The oracle still
    replays banding + recursive closure + both unrolled iterations,
    so a MATCH proves the persisted relations equal the live
    computation."""
    from pyspark.sql.window import Window as W

    from .llm_ops import _neardup_graph_artifact_path

    path = _neardup_graph_artifact_path(spark, sf_dir)
    comp = _read_pq(spark, f"{path}/components")
    pr = _read_pq(spark, f"{path}/ranks")
    w = W.partitionBy("cluster_id").orderBy(
        F.desc("pagerank"), F.asc("vec_id")
    )
    return (
        comp.join(pr, "vec_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("vec_id").alias("keep_id"), "pagerank")
    )


def _km_chain_ns(p: str, where: str) -> str:
    """Namespaced copy of llm_ops._km_chain_cte ending at ``{p}c2``
    (cluster, s, c — the TRAINED codebook): lets one oracle run two
    independent k-means builds (different corpus slices) in a single
    WITH chain. Mirrors _km_assign/_km_update exactly, with every
    CTE name prefixed and the source filtered by ``where``."""
    sq = (
        f"CAST(list_sum(list_transform(list_zip({p}q.qv, {{C}}.s), "
        "pp -> ({C}.c*pp[1]-pp[2])*({C}.c*pp[1]-pp[2]))) AS DOUBLE) "
        "/ CAST({C}.c*{C}.c AS DOUBLE)"
    )

    def assign(name: str, cent: str) -> str:
        s = sq.replace("{C}", cent)
        return f"""{p}{name} AS (
      SELECT vec_id, cluster, qv FROM (
        SELECT {p}q.vec_id, {cent}.cluster, {p}q.qv,
               row_number() OVER (PARTITION BY {p}q.vec_id
                                  ORDER BY {s}, {cent}.cluster) AS rn
        FROM {p}q CROSS JOIN {cent}) t WHERE rn = 1)"""

    def update(a: str, prev: str, nxt: str) -> str:
        return f"""{p}{nxt}d AS (
      SELECT cluster, pos, CAST(SUM(qv[pos]) AS BIGINT) AS s_d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {p}{a}, UNNEST(range(1, 65)) AS r(pos)
      GROUP BY cluster, pos),
    {p}{nxt}u AS (
      SELECT cluster, list(s_d ORDER BY pos) AS s, any_value(c) AS c
      FROM {p}{nxt}d GROUP BY cluster),
    {p}{nxt} AS (
      SELECT {p}{prev}.cluster, COALESCE({p}{nxt}u.s, {p}{prev}.s) AS s,
             COALESCE({p}{nxt}u.c, {p}{prev}.c) AS c
      FROM {p}{prev} LEFT JOIN {p}{nxt}u
        ON {p}{prev}.cluster = {p}{nxt}u.cluster)"""

    return f"""{p}q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT)) AS qv
      FROM embeddings WHERE {where}),
    {p}c0 AS (
      SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cluster,
             qv AS s, CAST(1 AS BIGINT) AS c
      FROM (SELECT * FROM {p}q ORDER BY vec_id LIMIT 8)),
    {assign("a1", p + "c0")},
    {update("a1", "c0", "c1")},
    {assign("a2", p + "c1")},
    {update("a2", "c1", "c2")}"""


_DRIFT_MEAN_O = "list_transform(o.s, v -> CAST(v AS DOUBLE) / CAST(o.c AS DOUBLE))"
_DRIFT_MEAN_N = "list_transform(n.s, v -> CAST(v AS DOUBLE) / CAST(n.c AS DOUBLE))"


@register(
    "embedding_centroid_drift",
    changed=11,
    oracle=f"""
    WITH {_km_chain_ns("o_", "vec_id < 300")},
    {_km_chain_ns("n_", "TRUE")}
    SELECT o.cluster,
           o.c AS n_old, n.c AS n_new,
           round(sqrt(list_sum(list_transform(
                   list_zip({_DRIFT_MEAN_O}, {_DRIFT_MEAN_N}),
                   z -> (z[1] - z[2]) * (z[1] - z[2]))))
                 / 1024.0, 6) AS drift
    FROM o_c2 o JOIN n_c2 n USING (cluster)
    """,
    tags=("llm", "embedding", "kmeans", "ivf", "iterative", "qa"),
    since=4,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-refresh trigger: train the SAME deterministic
    k-means on yesterday's corpus slice (vec_id < 300) and on
    today's full corpus — identical seeds, so cluster ids are
    comparable — and report per-cluster centroid movement in
    original embedding units. Large drift on a populous cluster
    means the stored IVF index no longer matches the data
    distribution and the build should re-run; near-zero drift means
    the nightly refresh can skip the rebuild. The oracle replays
    BOTH 2-iteration Lloyd chains in one recursive WITH (namespaced
    CTE copies), so the entire old-build/new-build/compare pipeline
    is value-checked. Both codebooks are exact integer (sum, count)
    pairs; the only floats are the k final mean divisions and the
    dim-ordered diff fold, identical on both engines. Output is
    k-sized; each build costs the kmeans build (centroids broadcast,
    zero assignment Exchange)."""
    from .llm_ops import _kmeans_artifact_path, _kmeans_old_artifact_path

    # r10: "today's" codebook is the LIVE persisted index's (the
    # shared k-means artifact — drift is measured against the index
    # actually being served, which is the monitor's real semantics).
    # r11: yesterday's codebook is ALSO a stored artifact (what the
    # previous nightly refresh persisted) — the monitor compares two
    # k-sized stored relations instead of re-training yesterday's
    # chain per invocation. Both builds are deterministic, so the
    # oracle keeps replaying BOTH Lloyd chains and a MATCH proves
    # the persisted codebooks equal the live computation.
    def read_cb(path: str) -> list:
        return [
            (r["cluster"], list(r["s"]), r["c"])
            for r in sorted(
                _read_pq(spark, f"{path}/centroids").collect(),
                key=lambda r: r["cluster"],
            )
        ]

    new_cb = read_cb(_kmeans_artifact_path(spark, sf_dir))
    old_cb = read_cb(_kmeans_old_artifact_path(spark, sf_dir))
    rows = [
        (cl, s, c, s2, c2)
        for (cl, s, c), (_, s2, c2) in zip(old_cb, new_cb)
    ]
    cb = spark.createDataFrame(
        rows,
        "cluster int, s_o array<long>, c_o long, s_n array<long>, c_n long",
    )
    mo = F.transform(
        F.col("s_o"), lambda v: v.cast("double") / F.col("c_o").cast("double")
    )
    mn = F.transform(
        F.col("s_n"), lambda v: v.cast("double") / F.col("c_n").cast("double")
    )
    diff = F.zip_with(mo, mn, lambda a, b: (a - b) * (a - b))
    return cb.select(
        "cluster",
        F.col("c_o").alias("n_old"),
        F.col("c_n").alias("n_new"),
        F.round(
            F.sqrt(F.aggregate(diff, F.lit(0.0), lambda a, x: a + x))
            / F.lit(1024.0),
            6,
        ).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Residual-encoded IVFADC (r7)
# ---------------------------------------------------------------------------


def _pq_block_res(tag: str, lo: int, width: int, k: int) -> str:
    """`_pq_block` with the quantized source swapped for the integer
    RESIDUAL table ``resq`` (vec_id, rq_res) — the Lloyd chain,
    assignment, and trained-codebook CTE names stay identical so the
    `_pq_assign`/`_pq_update` machinery reuses verbatim."""
    return f"""q{tag} AS (
      SELECT vec_id, list_slice(rq_res, {lo}, {lo + width - 1}) AS qv
      FROM resq),
    c0{tag} AS (
      SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cluster,
             qv AS s, CAST(1 AS BIGINT) AS c
      FROM (SELECT * FROM q{tag} ORDER BY vec_id LIMIT {k})),
    {_pq_assign(f"a1{tag}", f"c0{tag}", f"q{tag}")},
    {_pq_update(f"a1{tag}", f"c0{tag}", f"c1{tag}", width)},
    {_pq_assign(f"a2{tag}", f"c1{tag}", f"q{tag}")},
    {_pq_update(f"a2{tag}", f"c1{tag}", f"c2{tag}", width)},
    {_pq_assign(f"af{tag}", f"c2{tag}", f"q{tag}")}"""


def _ivfadc_lut(tag: str, lo: int, width: int) -> str:
    """Per-(query, probed list) ADC lookup table for one block: the
    query's residual subvector against every trained codeword."""
    sq = (
        f"CAST(list_sum(list_transform("
        f"list_zip(list_slice(p.qres, {lo}, {lo + width - 1}), c2{tag}.s), "
        f"z -> (c2{tag}.c*z[1]-z[2])*(c2{tag}.c*z[1]-z[2]))) AS DOUBLE) "
        f"/ CAST(c2{tag}.c*c2{tag}.c AS DOUBLE)"
    )
    return f"""lut{tag} AS (
      SELECT p.query_id, p.cluster, c2{tag}.cluster AS code, {sq} AS dk
      FROM probes p CROSS JOIN c2{tag})"""


_QINT = (
    "list_transform({col}, v -> "
    "CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT))"
)


_IVFADC_CTES = f"""reps AS (
      SELECT label AS cluster, embedding AS rvec FROM (
        SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings) t WHERE rn = 1),
    repq AS (
      SELECT cluster, rvec, {_QINT.format(col="rvec")} AS rq
      FROM reps),
    resq AS (
      SELECT e.vec_id,
             list_transform(
               list_zip({_QINT.format(col="e.embedding")}, r.rq),
               p -> p[1] - p[2]) AS rq_res
      FROM embeddings e JOIN repq r ON e.label = r.cluster),
    {_pq_block_res("a", 1, 32, 16)},
    {_pq_block_res("b", 33, 32, 16)},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id),
    q AS (
      SELECT vec_id AS query_id, embedding AS qvec,
             {_QINT.format(col="embedding")} AS qq
      FROM embeddings WHERE vec_id < 20),
    probes AS (
      SELECT query_id, cluster, qres FROM (
        SELECT q.query_id, r.cluster,
               list_transform(list_zip(q.qq, r.rq),
                              p -> p[1] - p[2]) AS qres,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos("q.qvec", "r.rvec")} DESC,
                            r.cluster) AS pr
        FROM q CROSS JOIN repq r) t WHERE pr <= 2),
    {_ivfadc_lut("a", 1, 32)},
    {_ivfadc_lut("b", 33, 32)},
    memb AS (SELECT vec_id, label AS cluster FROM embeddings),
    scored AS (
      SELECT l0.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN memb m ON m.vec_id = c.vec_id
      JOIN luta l0 ON l0.cluster = m.cluster AND l0.code = c.c0
      JOIN lutb l1 ON l1.query_id = l0.query_id
                  AND l1.cluster = m.cluster AND l1.code = c.c1
      WHERE c.vec_id <> l0.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rnk
      FROM scored)"""


def _ivfadc_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted residual-IVFADC artifact for this scope
    (contract in `ensure_artifact`). Shared by the routed probe and
    its recall meter — the residual build (reps + residual transform
    + both Lloyd chains) is priced once per scope."""

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.ivfadc_build_artifact(
            emb, path, subspaces=2, codebook_k=16, iters=2
        )

    return ensure_artifact(spark, "ann_ivfadc", sf_dir, build)


@register(
    "similarity_topk_ivfadc",
    changed=10,
    oracle=f"""
    WITH {_IVFADC_CTES}
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "ivf", "pq", "ann", "residual",
          "iterative"),
    since=7,
)
def similarity_topk_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVFADC — the exact FAISS `IVFx,PQy` recipe
    (Jégou et al. 2011 §III.C), driver-verified end to end: PQ
    codebooks train on vector-minus-list-representative RESIDUALS
    (exact integer differences of quantized units), so the codeword
    budget refines what the coarse quantizer left behind; ADC lookup
    tables are per-(query, probed list) because the query's own
    residual differs per list. The oracle unrolls the representative
    build, the residual transform, BOTH residual Lloyd chains, the
    encoding, the probe ranking, the per-probe lookup tables, and the
    rank — a drift anywhere in the five-stage lifecycle fails the
    value hash. Completes the ANN ladder: bruteforce → IVF → PQ →
    IVF-PQ (global codebooks) → IVFADC (residual codebooks).

    r10: served from the persisted IVFADC artifact
    (`_ivfadc_artifact_path`; the residual build is priced once per
    process, in this query's cold run — the bench's BUILD_ONCE note —
    and the probe plan is Lloyd- and residual-transform-free). The
    oracle still replays the whole five-stage lifecycle, so MATCH
    proves the residual-codebook round-trip is lossless."""
    path = _ivfadc_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_ivfadc_artifact(
        emb.filter(F.col("vec_id") < 20), path, k=5, n_probe=2,
        subspaces=2, width=32,
    )


@register(
    "similarity_recall_ivfadc",
    changed=10,
    oracle=f"""
    WITH {_IVFADC_CTES},
    ann AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5),
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
               row_number() OVER (PARTITION BY query_id
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
    tags=("llm", "similarity", "ann", "qa", "residual", "iterative"),
    since=7,
)
def similarity_recall_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of residual IVFADC against exact brute-force cosine,
    per query — the go/no-go QA gate before the compressed index
    replaces brute force (the same audit `similarity_recall_audit`
    runs for sign-LSH and `similarity_recall_int8` for the int8
    scan; every ANN rung gets its recall meter). The oracle replays
    the ENTIRE IVFADC lifecycle (reps, residuals, both Lloyd chains,
    encode, probe, LUT, rank) AND the brute-force side, then the
    hit-count compare. Audit joins are |Q| x k-sized — at 100 TB the
    exact side runs over a query sample so monitoring cost is
    independent of corpus size. Note the metric is honest about
    compression: ADC distance ties within a PQ cell rank by
    neighbor id, so recall < 1.0 is expected and the number to WATCH
    is round-over-round drift, not the absolute.

    r10: the approx side probes the persisted IVFADC artifact — the
    meter now costs the exact scan + one probe, the shape of a recall
    monitor sampling a LIVE index."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    path = _ivfadc_artifact_path(spark, sf_dir)
    exact = S.cosine_topk_bruteforce(q, emb, k=5)
    approx = S.topk_from_ivfadc_artifact(
        q, path, k=5, n_probe=2, subspaces=2, width=32
    )
    return S.topk_recall_audit(exact, approx, k=5)


# ---------------------------------------------------------------------------
# BPE merge training (r7)
# ---------------------------------------------------------------------------


def _bpe_round(i: int) -> str:
    """One unrolled BPE round: pair-count over s{i-1}, top-1 merge
    m{i}, merged table s{i} — the same round structure the Spark
    loop executes."""
    prev = f"s{i - 1}"
    return f"""p{i} AS (
      SELECT sy[ix] AS l, sy[ix + 1] AS r, SUM(cnt) AS n
      FROM (
        SELECT cnt,
               string_split(substring(s, 2, length(s) - 2), '||') AS sy
        FROM {prev}) t,
        UNNEST(range(1, len(sy))) AS u(ix)
      GROUP BY l, r),
    m{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1),
    s{i} AS (
      SELECT cnt,
             replace(s, '|' || m{i}.l || '||' || m{i}.r || '|',
                     '|' || m{i}.l || m{i}.r || '|') AS s
      FROM {prev} CROSS JOIN m{i})"""


def _bpe_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted BPE tokenizer artifact (3 merges — the
    registry's training config) for this (process, scale factor).
    `pipeline_bpe_merges` prices the build and value-hashes the
    read-back; the encode/fertility consumers compile the stored
    rows into their replace chains. Contract in `ensure_artifact`."""
    from ..operators.artifacts import ensure_artifact
    from ..operators.text import bpe_merges_build_artifact

    def build(path: str) -> None:
        bpe_merges_build_artifact(
            _load(spark, sf_dir, "documents"), path, n_merges=3
        )

    return ensure_artifact(spark, "bpe_merges", sf_dir, build)


@register(
    "pipeline_bpe_merges",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_WORDS}) AS w FROM documents) t
      WHERE len(w) > 0 AND w NOT LIKE '%|%'
      GROUP BY w),
    s0 AS (
      SELECT cnt,
             '|' || array_to_string(
               list_filter(string_split(w, ''), c -> len(c) > 0),
               '||') || '|' AS s
      FROM words),
    {_bpe_round(1)},
    {_bpe_round(2)},
    {_bpe_round(3)}
    SELECT 1 AS merge_rank, l AS left_sym, r AS right_sym,
           CAST(n AS BIGINT) AS pair_count FROM m1
    UNION ALL
    SELECT 2, l, r, CAST(n AS BIGINT) FROM m2
    UNION ALL
    SELECT 3, l, r, CAST(n AS BIGINT) FROM m3
    """,
    tags=("llm", "pipeline", "tokenizer", "bpe", "iterative"),
    since=7,
    changed=11,
)
def pipeline_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, driver-verified: 3 merge rounds over
    the corpus word-frequency table — each round's corpus-wide
    weighted pair count, the greedy most-frequent merge (count desc,
    then lexicographic tie-break), and the non-overlapping
    left-to-right application are all replayed by the oracle's three
    unrolled round CTEs, so a drift anywhere in the iterative
    training fails the value hash (the Lloyd-chain discipline,
    applied to the OTHER famous training loop in an LLM data
    pipeline). Output is the merges table a tokenizer ships.
    r11: served from the persisted tokenizer artifact — this query
    prices the one training loop (first toucher) and value-hashes
    the read-back."""
    path = _bpe_artifact_path(spark, sf_dir)
    return _read_pq(spark, f"{path}/merges")


@register(
    "pipeline_bpe_encode",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_WORDS}) AS w FROM documents) t
      WHERE len(w) > 0 AND w NOT LIKE '%|%'
      GROUP BY w),
    s0 AS (
      SELECT cnt,
             '|' || array_to_string(
               list_filter(string_split(w, ''), c -> len(c) > 0),
               '||') || '|' AS s
      FROM words),
    {_bpe_round(1)},
    {_bpe_round(2)},
    {_bpe_round(3)},
    toks AS (
      SELECT doc_id, w
      FROM (SELECT doc_id, unnest({_WORDS}) AS w FROM documents) t
      WHERE len(w) > 0 AND w NOT LIKE '%|%'),
    enc AS (
      SELECT doc_id, length(w) AS n_chars_w,
             replace(
               replace(
                 replace(
                   '|' || array_to_string(
                     list_filter(string_split(w, ''), c -> len(c) > 0),
                     '||') || '|',
                   '|' || m1.l || '||' || m1.r || '|',
                   '|' || m1.l || m1.r || '|'),
                 '|' || m2.l || '||' || m2.r || '|',
                 '|' || m2.l || m2.r || '|'),
               '|' || m3.l || '||' || m3.r || '|',
               '|' || m3.l || m3.r || '|') AS e
      FROM toks CROSS JOIN m1 CROSS JOIN m2 CROSS JOIN m3)
    SELECT doc_id,
           CAST(SUM(n_chars_w) AS BIGINT) AS n_chars,
           CAST(SUM(len(string_split(
             substring(e, 2, length(e) - 2), '||'))) AS BIGINT)
             AS n_symbols
    FROM enc GROUP BY doc_id
    """,
    tags=("llm", "pipeline", "tokenizer", "bpe", "iterative"),
    since=7,
    changed=11,
)
def pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — the apply half of `pipeline_bpe_merges`: every
    document encoded with the 3 learned merges in rank order,
    reporting per-doc character and symbol counts (the compression
    the tokenizer buys — what a vocab-size decision reads). The
    oracle replays the full training AND the encode, so the value
    hash pins train -> apply end to end. The merge table is 3
    driver-collected rows compiled into codegen'd replace literals;
    the encode pass is one token explode + one doc-keyed aggregate,
    the corpus never shuffles by token. r11: the merge rows come
    from the persisted tokenizer artifact (no per-invocation
    training); the oracle still replays train AND apply."""
    from ..operators.text import bpe_encode_stats, read_bpe_merges

    d = _load(spark, sf_dir, "documents")
    merges = read_bpe_merges(
        spark, _bpe_artifact_path(spark, sf_dir), n_merges=3
    )
    return bpe_encode_stats(d, n_merges=3, merges=merges)


# ---------------------------------------------------------------------------
# One-bit (sign-binarized) retrieval: the last rung of the
# quantization ladder, with its recall gate
# ---------------------------------------------------------------------------

_SQL_ONEBIT_WORDS = """
    bits AS (
      SELECT vec_id,
             list_reduce(list_transform(list_slice(embedding, 1, 32),
               x -> CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END),
               (a, b) -> a * 2 + b) AS w0,
             list_reduce(list_transform(list_slice(embedding, 33, 64),
               x -> CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END),
               (a, b) -> a * 2 + b) AS w1
      FROM embeddings)
"""

_SQL_ONEBIT_TOPK = f"""
    WITH {_SQL_ONEBIT_WORDS},
    obq AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1
            FROM bits WHERE vec_id < 20),
    obc AS (SELECT vec_id AS neighbor_id, w0 AS cw0, w1 AS cw1
            FROM bits),
    ob_scored AS (
      SELECT obq.query_id, obc.neighbor_id,
             CAST(bit_count(xor(obq.qw0, obc.cw0))
                  + bit_count(xor(obq.qw1, obc.cw1)) AS BIGINT)
               AS hamming
      FROM obc CROSS JOIN obq
      WHERE obc.neighbor_id <> obq.query_id),
    ob_ranked AS (
      SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS rnk
      FROM ob_scored)
"""


@register(
    "similarity_topk_onebit",
    oracle=f"""
    {_SQL_ONEBIT_TOPK}
    SELECT query_id, neighbor_id, hamming, rnk
    FROM ob_ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "quantization", "binary"),
    since=7,
)
def similarity_topk_onebit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 retrieval over 1-BIT sign-binarized embeddings — the
    final rung of the quantization ladder (float32 256 B -> int8
    64 B -> PQ 2 B -> 8 B of sign bits at 64 dims): Hamming distance
    between sign patterns is a monotone estimator of angular
    distance (Charikar 2002), so the whole 100 TB scan collapses to
    XOR + POPCNT over one int64 word per 32 dims, no float unit
    touched. Packing is a codegen'd aggregate fold inside the scan
    projection (no explode, no shuffle); the packed query set
    broadcasts; only |Q| x k ranked rows shuffle. Integer-exact end
    to end, so the oracle match is value-identical by construction;
    retrieval quality vs float32 is the companion
    `similarity_recall_onebit` gate."""
    emb = _load(spark, sf_dir, "embeddings")
    return S.hamming_topk_onebit(
        emb.filter(F.col("vec_id") < 20), emb, k=5, dims=64
    )


@register(
    "similarity_recall_onebit",
    oracle=f"""
    {_SQL_ONEBIT_TOPK},
    ob AS (SELECT query_id, neighbor_id FROM ob_ranked WHERE rnk <= 5),
    bfq AS (SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
    bfc AS (SELECT vec_id AS neighbor_id, embedding AS cvec
            FROM embeddings),
    bf_scored AS (
      SELECT bfq.query_id, bfc.neighbor_id,
             {{cos}} AS score
      FROM bfc CROSS JOIN bfq
      WHERE bfc.neighbor_id <> bfq.query_id),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM bf_scored) t WHERE rnk <= 5),
    hits AS (
      SELECT bf.query_id, COUNT(*) AS n_hits
      FROM bf JOIN ob ON bf.query_id = ob.query_id
                     AND bf.neighbor_id = ob.neighbor_id
      GROUP BY bf.query_id)
    SELECT b.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS DOUBLE)
                 / COUNT(*), 6) AS recall
    FROM bf b LEFT JOIN hits h ON b.query_id = h.query_id
    GROUP BY b.query_id
    """.format(cos=_sql_cos("bfq.qvec", "bfc.cvec")),
    tags=("llm", "similarity", "quantization", "binary", "qa"),
    since=7,
)
def similarity_recall_onebit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the 1-bit Hamming scan against exact float32
    brute force, per query — the go/no-go QA gate for the cheapest
    rung of the quantization ladder, mirroring the int8/IVFADC/
    matryoshka recall meters: the storage rung says what the bytes
    cost, THIS says what the bytes buy back in retrieval quality.
    Both sides and the audit joins are result-sized (|Q| x k); at
    corpus scale the exact side runs over a query sample."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = S.cosine_topk_bruteforce(q, emb, k=5)
    approx = S.hamming_topk_onebit(q, emb, k=5, dims=64)
    return S.topk_recall_audit(exact, approx, k=5)


# ---------------------------------------------------------------------------
# First-fit sequence packing: the stateful packing variant, oracle-
# replayed by a recursive CTE
# ---------------------------------------------------------------------------


@register(
    "pipeline_pack_firstfit",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source, doc_id // 256 AS bucket,
             CAST(len(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    ord AS (
      SELECT doc_id, source, bucket, n_tokens,
             row_number() OVER (PARTITION BY source, bucket
                                ORDER BY doc_id) AS idx
      FROM toks),
    packed(source, bucket, idx, doc_id, n_tokens, pack_no,
           fill_after) AS (
      SELECT source, bucket, idx, doc_id, n_tokens,
             CAST(0 AS BIGINT), n_tokens
      FROM ord WHERE idx = 1
      UNION ALL
      SELECT o.source, o.bucket, o.idx, o.doc_id, o.n_tokens,
             CASE WHEN p.fill_after > 0
                       AND p.fill_after + o.n_tokens > 2048
                  THEN p.pack_no + 1 ELSE p.pack_no END,
             CASE WHEN p.fill_after > 0
                       AND p.fill_after + o.n_tokens > 2048
                  THEN o.n_tokens
                  ELSE p.fill_after + o.n_tokens END
      FROM packed p
      JOIN ord o ON o.source = p.source AND o.bucket = p.bucket
                AND o.idx = p.idx + 1)
    SELECT doc_id, source, bucket, n_tokens, pack_no, fill_after
    FROM packed
    """,
    tags=("llm", "pipeline", "packing", "stateful", "grouped-map"),
    since=7,
)
def pipeline_pack_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT first-fit sequence packing (budget 2048): the stateful
    packing variant training recipes use when documents must NOT be
    split across packs — a doc that would overflow the current pack
    closes it, wasting the tail (`fill_after` exposes the
    utilization cost vs the concat-chunk `pipeline_sequence_packing`,
    which wastes nothing but splits docs). The per-chain fold is
    inherently sequential, so the chain key is BOUNDED — (source,
    doc_id // 256) caps each sequential unit at 256 docs — and runs
    as a codegen'd JVM higher-order ``aggregate`` fold over each
    chain's array_sort'ed rows (r14: the Arrow-batched applyInPandas
    round-trip was the corpus block's slowest Python boundary): one
    shuffle on the chain key, then pure parallel map work at any
    corpus size, no Python in the row path. The
    oracle replays the identical greedy fold as a recursive CTE
    advancing all chains in lockstep, so the driver hash pins every
    packing decision."""
    from ..functions import tokenize
    from ..operators.sequence import pack_firstfit

    d = _load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        # arithmetic shift = exact int64 FLOOR division by 256 for the
        # whole id range, matching the oracle's `doc_id // 256`
        # (DuckDB floors). The old double-divide-then-cast truncated
        # toward zero (wrong for negative ids) and lost exactness
        # above 2^53; Spark's `DIV` would also truncate, not floor.
        F.shiftright(F.col("doc_id"), 8).cast("bigint").alias("bucket"),
        F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    return pack_firstfit(
        d, budget=2048, chain_cols=("source", "bucket"),
        order_col="doc_id", tokens_col="n_tokens",
    ).select("doc_id", "source", "bucket", "n_tokens", "pack_no",
             "fill_after")


@register(
    "pipeline_tokenizer_fertility",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_WORDS}) AS w FROM documents) t
      WHERE len(w) > 0 AND w NOT LIKE '%|%'
      GROUP BY w),
    s0 AS (
      SELECT cnt,
             '|' || array_to_string(
               list_filter(string_split(w, ''), c -> len(c) > 0),
               '||') || '|' AS s
      FROM words),
    {_bpe_round(1)},
    {_bpe_round(2)},
    {_bpe_round(3)},
    toks AS (
      SELECT doc_id, lang, w
      FROM (SELECT doc_id, lang, unnest({_WORDS}) AS w
            FROM documents) t
      WHERE len(w) > 0 AND w NOT LIKE '%|%'),
    enc AS (
      SELECT doc_id, lang, length(w) AS n_chars_w,
             replace(
               replace(
                 replace(
                   '|' || array_to_string(
                     list_filter(string_split(w, ''), c -> len(c) > 0),
                     '||') || '|',
                   '|' || m1.l || '||' || m1.r || '|',
                   '|' || m1.l || m1.r || '|'),
                 '|' || m2.l || '||' || m2.r || '|',
                 '|' || m2.l || m2.r || '|'),
               '|' || m3.l || '||' || m3.r || '|',
               '|' || m3.l || m3.r || '|') AS e
      FROM toks CROSS JOIN m1 CROSS JOIN m2 CROSS JOIN m3),
    perw AS (
      SELECT doc_id, lang, n_chars_w,
             len(string_split(substring(e, 2, length(e) - 2), '||'))
               AS n_sym_w
      FROM enc)
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_chars_w) AS BIGINT) AS n_chars,
           CAST(SUM(n_sym_w) AS BIGINT) AS n_symbols,
           round(CAST(SUM(n_sym_w) AS DOUBLE) / COUNT(*), 6)
             AS fertility,
           round(CAST(SUM(n_chars_w) AS DOUBLE) / SUM(n_sym_w), 6)
             AS compression
    FROM perw GROUP BY lang
    """,
    tags=("llm", "pipeline", "tokenizer", "bpe", "qa"),
    since=7,
    changed=11,
)
def pipeline_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by LANGUAGE — symbols per word under the
    learned BPE merges, the multilingual-fairness metric (an
    English-heavy tokenizer fragments other languages into more
    symbols per word, inflating their effective sequence length and
    per-token training cost; this is the table tokenizer papers
    report per language). Completes the BPE lifecycle: merges (the
    artifact) -> encode (per-doc compression) -> THIS (per-language
    equity of that compression). The oracle replays training AND the
    per-language rollup, so the hash pins the whole chain; output is
    |languages| rows. r11: merges come from the persisted tokenizer
    artifact, same as the encode query."""
    from ..operators.text import bpe_fertility, read_bpe_merges

    d = _load(spark, sf_dir, "documents")
    merges = read_bpe_merges(
        spark, _bpe_artifact_path(spark, sf_dir), n_merges=3
    )
    return bpe_fertility(d, group_col="lang", n_merges=3, merges=merges)


@register(
    "similarity_graph_link_prediction",
    changed=11,
    oracle=f"""
    WITH {_lsh_pairs_cte()},
    p AS (SELECT id1, id2 FROM scored WHERE score >= 0.3),
    e AS (SELECT id1 AS a, id2 AS b FROM p
          UNION ALL SELECT id2, id1 FROM p),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY a),
    cn AS (
      SELECT e1.a AS x, e2.a AS y, CAST(COUNT(*) AS BIGINT) AS common
      FROM e e1 JOIN e e2 ON e1.b = e2.b AND e1.a < e2.a
      GROUP BY 1, 2),
    new_p AS (
      SELECT cn.x, cn.y, cn.common FROM cn
      WHERE NOT EXISTS (SELECT 1 FROM p
                        WHERE p.id1 = cn.x AND p.id2 = cn.y))
    SELECT n.x AS id1, n.y AS id2,
           n.common AS common_neighbors,
           round(n.common / (dx.d + dy.d - n.common), 6) AS jaccard
    FROM new_p n
    JOIN deg dx ON dx.a = n.x
    JOIN deg dy ON dy.a = n.y
    """,
    tags=("llm", "similarity", "graph", "link-prediction"),
    since=7,
)
def similarity_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard LINK PREDICTION over the sign-LSH
    near-dup graph: pairs NOT currently connected, scored by the
    Jaccard of their neighbor sets (|common| / |union|) — the
    standard common-neighbors predictor, and in a dedup pipeline the
    recall auditor: a non-edge pair whose neighborhoods almost
    coincide is a near-dup the LSH banding probably MISSED (band
    collision is probabilistic), so the top of this list is exactly
    where a threshold/band-count review looks. All joins are
    node-keyed over the candidate-sized pair list (never corpus-
    sized); join volume is bounded by the same degree distribution
    `similarity_graph_degree` audits. r11: the pair list serves from
    the persisted edge artifact — the edge list, both self-join
    sides, and the existing-edge anti-join each read a pair-sized
    parquet scan; the per-invocation LSH pass is gone from the plan
    while the oracle still replays it (MATCH proves the round-trip)."""
    from .llm_ops import _neardup_edges_artifact_path

    path = _neardup_edges_artifact_path(spark, sf_dir)
    pairs = S.read_neardup_edges(spark, path, threshold=0.3).select(
        "id1", "id2"
    )
    return S.link_prediction_jaccard(pairs)


# ---------------------------------------------------------------------------
# Round-7 continuation wave 3: lexical retrieval (BM25), hybrid RRF
# fusion, and the within-doc / longitudinal repetition reports
# ---------------------------------------------------------------------------

_BM25_TERMS = ("dup", "spark", "merge")


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS dl,
             CAST(len(list_filter(w, x -> x = 'dup')) AS DOUBLE) AS tf0,
             CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) AS tf1,
             CAST(len(list_filter(w, x -> x = 'merge')) AS DOUBLE) AS tf2
      FROM (SELECT doc_id, {_WORDS} AS w FROM documents) t),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) AS sum_dl,
             CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      FROM base),
    scored AS (
      SELECT doc_id, dl,
             CAST((CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit,
             round(
               ((ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * tf0) * 2.2)
                 / (tf0 + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                                          / (sum_dl / n_docs)))
               + ((ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * tf1) * 2.2)
                 / (tf1 + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                                          / (sum_dl / n_docs)))
               + ((ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * tf2) * 2.2)
                 / (tf2 + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                                          / (sum_dl / n_docs))),
               6) AS bm25
      FROM base CROSS JOIN stats)
    SELECT doc_id, dl, n_hit, bm25
    FROM scored WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id LIMIT 25
    """,
    tags=("llm", "text", "retrieval", "bm25"),
    since=7,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-25 for the fixed query bag (dup, spark, merge) — the
    lexical retrieval rung next to the embedding ANN ladder, with a
    plan worth staring at: literal query terms turn per-term tf into
    a codegen'd array fold inside the ONE corpus scan (no explode,
    no token shuffle); N/avgdl/df collapse to a broadcast one-row
    aggregate; the only ordered movement is the k-row
    TakeOrderedAndProject merge. `dup` is the corpus's one
    discriminative term (df ~5%), so the idf spread is real. The
    rounded-score + doc_id sort is a total order — the top-25 SET is
    engine-stable."""
    d = _load(spark, sf_dir, "documents")
    return T.bm25_topk(d, _BM25_TERMS, k=25)


@register(
    "text_top_ngram_fraction",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    g AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, 2 AS n,
             unnest(list_transform(range(1, len(w)),
                 i -> concat_ws(' ', w[i], w[i+1]))) AS gram
      FROM norm WHERE len(w) >= 2
      UNION ALL
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, 3 AS n,
             unnest(list_transform(range(1, len(w)-1),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS gram
      FROM norm WHERE len(w) >= 3),
    cnt AS (
      SELECT doc_id, n_words, n, gram, COUNT(*) AS c
      FROM g GROUP BY 1, 2, 3, 4),
    pd AS (
      SELECT doc_id, n_words,
             MAX(CASE WHEN n = 2 THEN c END) AS m2,
             MAX(CASE WHEN n = 3 THEN c END) AS m3
      FROM cnt GROUP BY 1, 2)
    SELECT doc_id, n_words,
           round((CAST(COALESCE(m2, 0) AS DOUBLE) * 2.0) / n_words, 6)
             AS top2_frac,
           round((CAST(COALESCE(m3, 0) AS DOUBLE) * 3.0) / n_words, 6)
             AS top3_frac,
           CAST(CASE WHEN
                  round((CAST(COALESCE(m2, 0) AS DOUBLE) * 2.0)
                        / n_words, 6) > 0.20
                  OR round((CAST(COALESCE(m3, 0) AS DOUBLE) * 3.0)
                           / n_words, 6) > 0.18
                THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM pd
    """,
    tags=("llm", "text", "quality", "repetition"),
    since=7,
    changed=13,
)
def text_top_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition filter (Rae et al. 2021):
    per doc, the word-mass fraction covered by the most frequent
    2-gram and 3-gram, flagged at the published thresholds
    (0.20 / 0.18). Catches the one-phrase-repeated degenerate docs
    that cross-doc dedup can NEVER flag (no other doc shares the
    phrase). Multiplicity is the signal, hence raw (non-distinct)
    grams.

    r12: the (doc, n_words, n, gram, cnt) counts ARE the
    corpus_grams artifact's ``grams`` relation — the probe pays only
    the per-doc max fold; the oracle replays the live gram
    pipeline."""
    from .llm_ops import _corpus_grams_artifact_path

    path = _corpus_grams_artifact_path(spark, sf_dir)
    return T.top_ngram_fraction(
        None, gram_counts=T.read_corpus_grams(spark, path, "grams")
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    mx AS (SELECT MAX(doc_id) AS mx FROM documents),
    bg AS (
      SELECT DISTINCT bucket, gram FROM (
        SELECT CAST((doc_id * 10) // (mx + 1) AS BIGINT) AS bucket,
               unnest(shingles) AS gram
        FROM sh CROSS JOIN mx) t),
    fb AS (SELECT gram, MIN(bucket) AS fb FROM bg GROUP BY gram),
    agg AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN bucket = fb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM bg JOIN fb USING (gram) GROUP BY bucket)
    SELECT bucket, n_grams, n_novel,
           round(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty_rate
    FROM agg
    """,
    tags=("llm", "text", "dedup", "longitudinal"),
    since=7,
    changed=13,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: 10 id-ordered slices (crawl-increment
    proxy), per slice the fraction of its distinct 3-gram shingles
    first seen there. A flattening tail says new acquisition is
    mostly re-crawl — the data-budget go/no-go, and the longitudinal
    counterpart of pairwise dedup. Slice membership is integer bit
    math over a broadcast one-row max (no float percentile); text
    collapses to distinct (bucket, shingle) pairs before the
    shingle-keyed min-join.

    r12: the exploded (doc, shingle) stream serves from the
    corpus_grams artifact; the slice-boundary max still reads the
    document table (shingle-less docs count toward max doc_id). The
    oracle replays the live shingle pipeline."""
    from .llm_ops import _corpus_grams_artifact_path

    d = _load(spark, sf_dir, "documents")
    path = _corpus_grams_artifact_path(spark, sf_dir)
    return T.ngram_novelty(
        d, n_buckets=10,
        shingles=T.read_corpus_grams(spark, path, "shingles"),
    )


# The RRF CTE chain, shared by the fusion query and its recall gate.
# Appends to _SQL_ONEBIT_TOPK's chain (bits/obq/obc/ob_scored/
# ob_ranked); `rrf_final` holds the fused ranking, `bf_ranked` the
# exact cosine ranking (cutoff 20 feeds fusion, cutoff 5 is the
# recall gate's exact side).
_SQL_RRF_CTES = f"""
    q AS (SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cvec
          FROM embeddings),
    bf_scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_sql_cos("q.qvec", "c.cvec")} AS score
      FROM c CROSS JOIN q
      WHERE c.neighbor_id <> q.query_id),
    bf_ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM bf_scored),
    bf AS (SELECT query_id, neighbor_id,
                  CAST(rnk AS BIGINT) AS cos_rnk
           FROM bf_ranked WHERE rnk <= 20),
    ob AS (SELECT query_id, neighbor_id,
                  CAST(rnk AS BIGINT) AS ham_rnk
           FROM ob_ranked WHERE rnk <= 20),
    fused AS (
      SELECT COALESCE(bf.query_id, ob.query_id) AS query_id,
             COALESCE(bf.neighbor_id, ob.neighbor_id) AS neighbor_id,
             bf.cos_rnk, ob.ham_rnk
      FROM bf FULL JOIN ob
        ON bf.query_id = ob.query_id
       AND bf.neighbor_id = ob.neighbor_id),
    rrf_scored AS (
      SELECT query_id, neighbor_id, cos_rnk, ham_rnk,
             round(COALESCE(1.0 / (60.0 + CAST(cos_rnk AS DOUBLE)), 0.0)
                   + COALESCE(1.0 / (60.0 + CAST(ham_rnk AS DOUBLE)), 0.0),
                   6) AS rrf
      FROM fused),
    rrf_final AS (
      SELECT query_id, neighbor_id, cos_rnk, ham_rnk, rrf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, neighbor_id) AS rnk
      FROM rrf_scored)
"""


@register(
    "similarity_hybrid_rrf",
    oracle=f"""
    {_SQL_ONEBIT_TOPK},
    {_SQL_RRF_CTES}
    SELECT query_id, neighbor_id, cos_rnk, ham_rnk, rrf, rnk
    FROM rrf_final WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "hybrid", "fusion"),
    since=7,
)
def similarity_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of two retrieval
    rungs — exact float32 cosine and 1-bit Hamming — for queries
    vec_id < 20: each rung contributes 1/(60+rank) over its top-20
    candidates, the fused top-5 re-ranks the union. RRF consumes
    only integer RANKS (no score calibration across incomparable
    scales), which is both why production stacks fuse dense+binary/
    lexical this way and why the value hash is engine-stable. Each
    rung keeps its own broadcast-query single-scan plan; fusion
    itself is a full-outer join of two |Q| x 20 row sets — driver-
    scale regardless of corpus size."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return S.hybrid_rrf_topk(q, emb, k=5, k_cand=20)


@register(
    "similarity_recall_rrf",
    oracle=f"""
    {_SQL_ONEBIT_TOPK},
    {_SQL_RRF_CTES},
    ex AS (SELECT query_id, neighbor_id FROM bf_ranked WHERE rnk <= 5),
    ap AS (SELECT query_id, neighbor_id FROM rrf_final WHERE rnk <= 5),
    hits AS (
      SELECT ex.query_id, COUNT(*) AS n_hits
      FROM ex JOIN ap ON ex.query_id = ap.query_id
                     AND ex.neighbor_id = ap.neighbor_id
      GROUP BY ex.query_id)
    SELECT e.query_id,
           COUNT(*) AS n_exact,
           CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS DOUBLE)
                 / COUNT(*), 6) AS recall
    FROM ex e LEFT JOIN hits h ON e.query_id = h.query_id
    GROUP BY e.query_id
    """,
    tags=("llm", "similarity", "hybrid", "fusion", "qa"),
    since=7,
)
def similarity_recall_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the RRF fusion against exact cosine, per query —
    the QA gate for the fusion rung, mirroring the int8/PQ/onebit/
    IVFADC recall meters: it measures how much the binary rung's
    vote PERTURBS the exact ranking (fusion should mostly agree with
    the dense side while promoting binary-confirmed candidates).
    All audit joins are |Q| x k-sized — free at any corpus scale."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = S.cosine_topk_bruteforce(q, emb, k=5)
    approx = S.hybrid_rrf_topk(q, emb, k=5, k_cand=20)
    return S.topk_recall_audit(exact, approx, k=5)


@register(
    "similarity_topk_ivf_onebit",
    oracle=f"""
    WITH {_SQL_ONEBIT_WORDS},
    q AS (SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE vec_id < 20),
    reps AS (
      SELECT label AS cluster, embedding AS rvec FROM (
        SELECT label, embedding,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY vec_id) AS rn
        FROM embeddings) t WHERE rn = 1),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT q.query_id, r.cluster,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos("q.qvec", "r.rvec")} DESC,
                            r.cluster) AS pr
        FROM q CROSS JOIN reps r) t WHERE pr <= 2),
    qb AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1
           FROM bits WHERE vec_id < 20),
    cb AS (SELECT e.vec_id AS neighbor_id, e.label AS cluster,
                  b.w0 AS cw0, b.w1 AS cw1
           FROM embeddings e JOIN bits b ON b.vec_id = e.vec_id),
    scored AS (
      SELECT p.query_id, cb.neighbor_id,
             CAST(bit_count(xor(qb.qw0, cb.cw0))
                  + bit_count(xor(qb.qw1, cb.cw1)) AS BIGINT)
               AS hamming
      FROM cb JOIN probes p USING (cluster)
      JOIN qb ON qb.query_id = p.query_id
      WHERE cb.neighbor_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, hamming, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "ann", "ivf", "binary"),
    since=7,
)
def similarity_topk_ivf_onebit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed 1-bit retrieval: float cosine routes each query to
    its 2 nearest cluster representatives (same probe ranking as the
    float IVF rung), the fine scan inside the probed lists is
    XOR+POPCNT over sign-packed int64 words — the binary rung
    composed with list pruning, how a production binary index runs:
    at 100 TB the sign-word store is ~3 TB and a query touches
    n_probe/n_lists of even that. Reps and the |Q| x n_probe probe
    table broadcast; packing is a codegen'd fold in the scan
    projection; the corpus never shuffles. Integer-exact scoring."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return S.hamming_topk_ivf_onebit(q, emb, k=5, n_probe=2, dims=64)


def _logreg_step_ctes(n_steps: int) -> str:
    """Unrolled gradient-descent CTE chain (the BPE-merge pattern
    applied to model training): w{i} one-row weight CTEs, g{i}
    quantized-int64 gradient aggregates. Expression structure
    mirrors operators/text.langid_logreg token for token — the
    engine-stability argument is the int64 gradient sum."""
    parts = ["w0cte AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"]
    prev = "w0cte"
    for i in range(1, n_steps + 1):
        z = "((w.w0 + (w.w1 * x1)) + (w.w2 * x2))"
        r = f"(1.0 / (1.0 + exp(-{z})) - y)"
        parts.append(f"""g{i} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(round({r} * 1000000.0) AS BIGINT)) AS g0,
             SUM(CAST(round(({r} * x1) * 1000000.0) AS BIGINT)) AS g1,
             SUM(CAST(round(({r} * x2) * 1000000.0) AS BIGINT)) AS g2
      FROM lr_base CROSS JOIN {prev} w)""")
        parts.append(f"""w{i}cte AS (
      SELECT w.w0 - (0.1 * CAST(g.g0 AS DOUBLE))
               / (CAST(g.n AS DOUBLE) * 1000000.0) AS w0,
             w.w1 - (0.1 * CAST(g.g1 AS DOUBLE))
               / (CAST(g.n AS DOUBLE) * 1000000.0) AS w1,
             w.w2 - (0.1 * CAST(g.g2 AS DOUBLE))
               / (CAST(g.n AS DOUBLE) * 1000000.0) AS w2
      FROM {prev} w CROSS JOIN g{i} g)""")
        prev = f"w{i}cte"
    return ",\n    ".join(parts)


@register(
    "text_langid_logreg",
    oracle=f"""
    WITH lr_base AS (
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             CAST(len(list_filter(w, t -> t = 'the')) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS x1,
             CAST(len(w) AS DOUBLE) / 100.0 AS x2
      FROM (SELECT lang, {_WORDS} AS w FROM documents) t),
    {_logreg_step_ctes(3)}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(w.w0, 6) AS w_bias,
           round(w.w1, 6) AS w_the_ratio,
           round(w.w2, 6) AS w_len,
           CAST(SUM(CASE WHEN
                  (((w.w0 + (w.w1 * x1)) + (w.w2 * x2)) >= 0.0)
                  = (y = 1.0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(SUM(CASE WHEN
                  (((w.w0 + (w.w1 * x1)) + (w.w2 * x2)) >= 0.0)
                  = (y = 1.0)
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS accuracy
    FROM lr_base CROSS JOIN w3cte w
    GROUP BY w.w0, w.w1, w.w2
    """,
    tags=("llm", "text", "langid", "classifier", "iterative"),
    since=7,
)
def text_langid_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch logistic-regression TRAINING on the cluster (3 GD
    steps, lr 0.1): a fasttext-style linear probe predicting
    lang = 'en' from the 'the'-token ratio and scaled length — the
    train-a-tiny-filter-model pattern of every curation stack. The
    engine-stability trick is quantizing per-row gradient
    contributions to int64 micro-units before summing: the gradient
    is an exact integer sum (float-order-immune, sigmoid libm ulps
    die in the quantization), so the 3-step weight trajectory is
    bit-identical across engines and the oracle can replay the
    WHOLE training loop unrolled (the BPE-merge discipline applied
    to SGD). Per step the driver collects 4 scalars; accuracy uses
    z >= 0 (no sigmoid at predict)."""
    d = _load(spark, sf_dir, "documents")
    return T.langid_logreg(d, n_steps=3, lr=0.1)


# ---------------------------------------------------------------------------
# Round-8: OPQ — rotate-then-PQ, the rung between PQ and IVFADC
# ---------------------------------------------------------------------------

def _sql_opq_rotated(train_pred: str = "TRUE") -> str:
    """Rotation-build CTE chain: the Householder direction (power
    iteration) and the energy permutation are LEARNED on the
    ``train_pred`` subset of the corpus, then applied to EVERY vector
    (``ty``). With the default TRUE this is the plain in-batch OPQ
    replay; the incremental-ingest oracle trains on yesterday's
    corpus and rotates today's batch with the frozen transform."""
    return f"""qv_all AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT)) AS qv
      FROM embeddings),
    q AS (SELECT vec_id, qv FROM qv_all WHERE {train_pred}),
    v0 AS (SELECT list_transform(range(1, 65),
                                 i -> CAST(1024 AS BIGINT)) AS v),
    {_pi_iter(1, "v0")},
    {_pi_iter(2, "v1")},
    hh AS (
      SELECT v,
             CAST(floor(sqrt(CAST(list_sum(list_transform(v, x -> x * x))
                                  AS DOUBLE)) + 0.5) AS BIGINT) AS nv
      FROM v2),
    hu AS (
      SELECT list_transform(range(1, 65),
               j -> CASE WHEN j = 1 THEN v[1] - nv ELSE v[j] END) AS u
      FROM hh),
    huu AS (
      SELECT u, CAST(list_sum(list_transform(u, x -> x * x)) AS BIGINT)
               AS uu
      FROM hu),
    yd AS (
      SELECT qv_all.vec_id, qv_all.qv, huu.u, huu.uu,
             CAST(list_sum(list_transform(list_zip(qv_all.qv, huu.u),
                                          p -> p[1] * p[2])) AS BIGINT)
               AS dot
      FROM qv_all, huu),
    yt AS (
      SELECT vec_id,
             list_transform(range(1, 65), j ->
               CAST(uu * qv[j] - 2 * dot * u[j] AS DOUBLE)
                 / CAST(uu * 1024 AS DOUBLE)) AS y
      FROM yd),
    ep AS (
      SELECT r.pos,
             CAST(SUM(CAST(round(y[r.pos] * 1024) AS BIGINT)
                      * CAST(round(y[r.pos] * 1024) AS BIGINT))
                  AS BIGINT) AS e
      FROM yt, UNNEST(range(1, 65)) AS r(pos)
      WHERE {train_pred}
      GROUP BY r.pos),
    erk AS (
      SELECT pos AS dim,
             row_number() OVER (ORDER BY e DESC, pos) AS rnk
      FROM ep),
    perm AS (
      SELECT dim,
             row_number() OVER (ORDER BY (rnk - 1) % 2, rnk) AS newpos
      FROM erk),
    ty AS (
      SELECT vec_id, list(y[dim] ORDER BY newpos) AS embedding
      FROM yt, perm GROUP BY vec_id)"""


_SQL_OPQ_ROTATED = _sql_opq_rotated()


def _sql_opq_ctes(qfilter: str = "vec_id < 20") -> str:
    """Full rotate-then-PQ replay (rotation build + both Lloyd chains
    + encode + ADC rank) with a parametrizable query-batch filter —
    shared by the in-batch OPQ queries (vec_id < 20) and the
    artifact-probe query (a fresh batch)."""
    return f"""{_SQL_OPQ_ROTATED},
    {_pq_block("a", 1, 32, 16, src="ty")},
    {_pq_block("b", 33, 32, 16, src="ty")},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa WHERE {qfilter}),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb WHERE {qfilter}),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    scored AS (
      SELECT l0.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN luta l0 ON l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = l0.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> l0.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rnk
      FROM scored)"""


_SQL_OPQ_CTES = _sql_opq_ctes()


@register(
    "similarity_topk_opq",
    changed=10,
    oracle=f"""
    WITH {_SQL_OPQ_CTES}
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "opq", "quantization", "iterative"),
    since=8,
)
def similarity_topk_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimized Product Quantization (Ge et al. 2013, parametric
    recipe made deterministic), the full lifecycle driver-verified:
    2 rounds of quantized power iteration learn the top principal
    direction, an exact-integer Householder reflection aligns it
    with coordinate 1, an energy-balancing permutation deals the
    rotated dimensions round-robin to the 2 PQ blocks (eigenvalue
    allocation), and the UNCHANGED deterministic PQ lifecycle
    (per-block Lloyd codebooks -> code table -> broadcast ADC LUTs
    -> partial-pruned rank) runs in the rotated space. Both
    transform stages are exactly orthogonal, so approx_dist stays
    in original L2 units, directly comparable to
    `similarity_topk_pq`. The oracle replays EVERYTHING unrolled:
    power iteration, the Householder integers, the energy ranking,
    the permutation, both Lloyd chains, and the ADC tail — one
    wrong integer anywhere in the rotation build fails the hash.

    r10: served from the PERSISTED OPQ artifact
    (`_opq_artifact_path` — build-once / probe-many): the rotation +
    Lloyd build is priced once per process in
    `similarity_opq_build_artifact`; this query prices the SEARCH.
    Results are bit-identical to the in-process `S.topk_opq` (the
    artifact round-trip is lossless — pinned in tests), and the
    oracle still replays the full lifecycle, so the MATCH continues
    to verify build + probe end-to-end."""
    path = _opq_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_opq_artifact(
        emb.filter(F.col("vec_id") < 20), path, k=5, n_probe=None,
        subspaces=2, width=32,
    )


@register(
    "similarity_recall_opq",
    changed=10,
    oracle=f"""
    WITH {_SQL_OPQ_CTES},
    ann AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5),
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
               row_number() OVER (PARTITION BY query_id
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
    tags=("llm", "similarity", "opq", "qa", "iterative"),
    since=8,
)
def similarity_recall_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of OPQ against exact brute-force cosine, per query —
    the QA gate every rung of the quantization ladder carries
    (int8/PQ/onebit/IVFADC siblings); the number that justifies the
    rotation: OPQ should recover recall plain PQ loses when energy
    is lopsided across contiguous blocks. The oracle replays the
    full rotate-then-PQ lifecycle AND the exact side; audit joins
    are |Q| x k-sized, so at 100 TB the meter costs the sampled
    exact scan, nothing more.

    r10: the approx side probes the persisted OPQ artifact (build
    priced once per process in `similarity_opq_build_artifact`), so
    this meter costs the exact scan + one probe — the production
    shape of a recall monitor sampling a LIVE index."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    path = _opq_artifact_path(spark, sf_dir)
    exact = S.cosine_topk_bruteforce(q, emb, k=5)
    approx = S.topk_from_opq_artifact(
        q, path, k=5, n_probe=None, subspaces=2, width=32
    )
    return S.topk_recall_audit(exact, approx, k=5)


# ---------------------------------------------------------------------------
# Round-10: persisted OPQ artifact — the build-once / probe-many
# lifecycle extended to the rotated rungs (FAISS `OPQx[,IVFy],PQz`)
# ---------------------------------------------------------------------------


def _opq_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the persisted OPQ artifact (rotation + rotated-space
    codebooks/codes/reps) exists for this (process, scale factor) and
    return its path. Same contract as `_ivfpq_artifact_path`: PID-
    and sf-scoped, built at most once per process, explicit ``_done``
    marker written LAST with rmtree-before-rebuild so a crashed
    half-build can never serve. ONE artifact feeds the whole OPQ
    family — the flat probe (`similarity_topk_opq`), the recall gate
    (`similarity_recall_opq`), and the routed probe
    (`similarity_topk_ivf_opq`) — which is what retired the bench's
    three most expensive rows: each used to re-learn the rotation and
    both Lloyd chains per invocation. Contract in `ensure_artifact`."""

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.opq_build_artifact(
            emb, path, subspaces=2, codebook_k=16, iters=2,
            pca_iters=2, dims=64,
        )

    return ensure_artifact(spark, "ann_opq", sf_dir, build)


@register(
    "similarity_opq_build_artifact",
    oracle=f"""
    WITH {_SQL_OPQ_ROTATED},
    {_pq_block("a", 1, 32, 16, src="ty")},
    {_pq_block("b", 33, 32, 16, src="ty")},
    cb AS (
      SELECT CAST(0 AS BIGINT) AS block, cluster, s, c FROM c2a
      UNION ALL
      SELECT CAST(1 AS BIGINT) AS block, cluster, s, c FROM c2b),
    asg AS (
      SELECT CAST(0 AS BIGINT) AS block, cluster FROM afa
      UNION ALL
      SELECT CAST(1 AS BIGINT) AS block, cluster FROM afb),
    cnt AS (
      SELECT block, cluster, CAST(COUNT(*) AS BIGINT) AS n_codes
      FROM asg GROUP BY block, cluster),
    rot AS (
      SELECT huu.uu AS rot_uu,
             (SELECT string_agg(CAST(dim AS VARCHAR), ','
                                ORDER BY newpos)
              FROM perm) AS perm_str
      FROM huu)
    SELECT cb.block, CAST(cb.cluster AS BIGINT) AS codeword,
           cb.c AS n_members,
           array_to_string(cb.s, ',') AS s_str,
           COALESCE(cnt.n_codes, 0) AS n_codes,
           rot.rot_uu, rot.perm_str
    FROM cb
    LEFT JOIN cnt ON cnt.block = cb.block AND cnt.cluster = cb.cluster
    CROSS JOIN rot
    """,
    tags=("llm", "similarity", "ann", "index", "artifact", "opq",
          "iterative"),
    since=10,
)
def similarity_opq_build_artifact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Build half of build-once / probe-many for the OPQ family:
    learn the orthogonal rotation (quantized power iteration +
    exact-integer Householder + energy-balancing permutation), train
    both rotated-space Lloyd codebooks, and persist rotation /
    codes (hive-partitioned by cluster) / codebooks / reps as a
    parquet artifact (`operators/similarity.opq_build_artifact`,
    FAISS `index.write` of an `OPQ2,IVF,PQ2` index). The returned
    manifest is read BACK from the written artifact — per
    (block, codeword) the exact integer centroid state and assigned-
    code count, CROSS JOINed with the round-tripped rotation
    signature (uu and the permutation, as rot_uu / perm_str) — so
    the value hash proves the persisted rotation AND codebooks, not
    just the in-memory build. The oracle replays power iteration,
    the Householder integers, the energy permutation, and both
    Lloyd chains in SQL.

    Scale: the rotation pass and the Lloyd build are priced HERE and
    nowhere else; every probe query reads the index relations only."""
    path = _opq_artifact_path(spark, sf_dir)
    codes = _read_pq(spark, f"{path}/codes")
    asg = codes.select(
        F.lit(0).cast("long").alias("block"),
        F.col("c0").alias("cluster"),
    ).unionAll(
        codes.select(
            F.lit(1).cast("long").alias("block"),
            F.col("c1").alias("cluster"),
        )
    )
    cnt = asg.groupBy("block", "cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_codes")
    )
    book = _read_pq(spark, f"{path}/codebooks").select(
        F.col("block").cast("long").alias("block"),
        F.col("cluster").alias("cluster"),
        F.col("c").alias("n_members"),
        F.concat_ws(",", F.col("s").cast("array<string>")).alias(
            "s_str"
        ),
    )
    rot = _read_pq(spark, f"{path}/rotation").select(
        F.col("uu").alias("rot_uu"),
        F.concat_ws(
            ",",
            F.transform(
                F.col("perm"), lambda p: (p + 1).cast("string")
            ),
        ).alias("perm_str"),
    )
    return (
        book.join(F.broadcast(cnt), ["block", "cluster"], "left")
        .crossJoin(F.broadcast(rot))
        .select(
            "block",
            F.col("cluster").cast("long").alias("codeword"),
            "n_members",
            "s_str",
            F.coalesce(F.col("n_codes"), F.lit(0).cast("long")).alias(
                "n_codes"
            ),
            "rot_uu",
            "perm_str",
        )
    )


@register(
    "similarity_topk_from_opq_artifact",
    oracle=f"""
    WITH {_sql_opq_ctes("vec_id >= 20 AND vec_id < 40")}
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "ann", "index", "artifact",
          "opq"),
    since=10,
)
def similarity_topk_from_opq_artifact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Probe half of build-once / probe-many for OPQ: flat
    rotated-space ADC top-5 for a FRESH query batch (vec_id 20..39)
    served from the persisted artifact. The plan rotates the query
    batch with a codegen'd integer fold parameterized from the
    collected one-row rotation relation — NO power iteration, NO
    Lloyd stage, no corpus-vector scan (pinned in
    tests/test_plans.py); the only corpus-sized read is the PQ code
    table. The oracle replays the ENTIRE rotate-then-PQ lifecycle
    from scratch, so a MATCH proves the rotation + codebook
    round-trip is lossless at probe cost. At 100 TB this is the FAISS
    `OPQ` index on a lake: the rotation is index-header metadata, the
    codes are the only big relation, and a query batch pays one
    linear pass over codes at 2 bytes/vector."""
    path = _opq_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_opq_artifact(
        emb.filter(
            (F.col("vec_id") >= 20) & (F.col("vec_id") < 40)
        ),
        path,
        k=5,
        n_probe=None,
        subspaces=2,
        width=32,
    )


def _opq_inc_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the OPQ INCREMENTAL-ingest demo artifact: rotation +
    codebooks learned on yesterday's corpus (vec_id < 400), today's
    batch (vec_id >= 400) rotated with the FROZEN transform and
    encoded with the FROZEN codebooks — zero training on ingest.
    Separate path from the full OPQ artifact (appending there would
    duplicate codes); contract in `ensure_artifact`."""

    def build(path: str) -> None:
        emb = _load(spark, sf_dir, "embeddings")
        S.opq_build_artifact(
            emb.filter(F.col("vec_id") < 400), path,
            subspaces=2, codebook_k=16, iters=2, pca_iters=2, dims=64,
        )
        S.opq_encode_append(emb.filter(F.col("vec_id") >= 400), path)

    return ensure_artifact(spark, "ann_opq_inc", sf_dir, build)


@register(
    "similarity_opq_append_probe",
    oracle=f"""
    WITH {_sql_opq_rotated("vec_id < 400")},
    tyold AS (SELECT vec_id, embedding FROM ty WHERE vec_id < 400),
    {_pq_block("a", 1, 32, 16, src="tyold")},
    {_pq_block("b", 33, 32, 16, src="tyold")},
    qna AS (
      SELECT vec_id,
             list_transform(list_slice(embedding, 1, 32),
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT))
               AS qv
      FROM ty WHERE vec_id >= 400),
    qnb AS (
      SELECT vec_id,
             list_transform(list_slice(embedding, 33, 64),
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT))
               AS qv
      FROM ty WHERE vec_id >= 400),
    {_pq_assign("ana", "c2a", "qna")},
    {_pq_assign("anb", "c2b", "qnb")},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id
      UNION ALL
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM ana x JOIN anb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa WHERE vec_id < 20),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb WHERE vec_id < 20),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    scored AS (
      SELECT l0.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN luta l0 ON l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = l0.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> l0.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "ann", "index", "incremental", "opq",
          "iterative"),
    since=10,
)
def similarity_opq_append_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ingest for the OPQ index, end to end: rotation AND
    codebooks are learned on yesterday's corpus (vec_id < 400);
    today's batch (vec_id >= 400) is rotated with the FROZEN
    orthogonal transform (one codegen'd fold parameterized from the
    persisted one-row rotation relation — no power iteration) and
    encoded with the FROZEN rotated-space codebooks
    (`operators/similarity.opq_encode_append` — FAISS `index.add` on
    an `OPQ2,PQ2` index); the flat probe then searches the MERGED
    index and must see both generations. The oracle replays
    train-on-old / rotate-all / assign-new-against-frozen-codebooks,
    so a MATCH proves the no-retrain ingest is bit-identical to a
    from-scratch encode. The nightly OPQ shape at 100 TB: the
    rotation is frozen index-header state, each ingest batch costs
    one rotation fold + one broadcast-codebook argmin pass."""
    path = _opq_inc_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_opq_artifact(
        emb.filter(F.col("vec_id") < 20), path, k=5, n_probe=None,
        subspaces=2, width=32,
    )


def _ivfpq_cpt_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the COMPACTION demo artifact: the full-corpus IVF-PQ
    index with the delete probe's tombstone set (vec_id % 5 == 2,
    >= 20), then `ivfpq_compact` — the codes partitions are
    physically rewritten minus tombstones and the tombstone relation
    truncated. Separate path from the live probe artifact (compaction
    mutates codes; the delete probe must keep exercising the
    anti-join path).

    r14 cold-column diet: the pre-compaction state is a SNAPSHOT of
    the main artifact after its tombstones land — truer to production
    (compaction runs ON the standing index, never on a rebuild) and
    it retires a full redundant Lloyd train from the cold column. The
    k-means build is deterministic, so the snapshot's codebooks are
    bit-identical to what the rebuild produced; the probe's oracle
    (build-then-probe-with-deletes, replayed from scratch) pins that
    every rotation. Contract in `ensure_artifact`."""

    def build(path: str) -> None:
        src = _ivfpq_artifact_path(spark, sf_dir)
        # tombstones must land on the SOURCE before the copy — a
        # snapshot taken first would compact nothing and the
        # compacted probe would resurface deleted vectors
        _ivfpq_tombstones_ready(spark, sf_dir, src)
        _snapshot_artifact(src, path)
        S.ivfpq_compact(spark, path)

    return ensure_artifact(spark, "ann_ivfpq_cpt", sf_dir, build)


@register(
    "similarity_ivfpq_compact_probe",
    oracle=_sql_ivfpq_probe_oracle(
        "vec_id < 20",
        "\n        AND NOT (c.vec_id % 5 = 2 AND c.vec_id >= 20)",
    ),
    tags=("llm", "similarity", "ann", "index", "delete", "compact"),
    since=10,
    changed=14,
)
def similarity_ivfpq_compact_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compaction — the maintenance verb that finishes the deletion
    story: after `operators/similarity.ivfpq_compact` physically
    rewrites the inverted-list partitions minus the tombstones (one
    broadcast anti-join pass, partition-preserving, crash-safe swap)
    and truncates the tombstone relation, a PLAIN probe — no
    tombstone anti-join anywhere in the plan — must return exactly
    what the tombstone-filtered probe returned before. The oracle is
    the delete probe's (build-then-probe-with-deletes), so a MATCH
    proves storage-level reclamation equals the query-time predicate.
    At 100 TB compaction runs periodically over only the lists that
    contain tombstones; probes stop paying the anti-join and stop
    reading dead bytes."""
    path = _ivfpq_cpt_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_ivfpq_artifact(
        emb.filter(F.col("vec_id") < 20), path, k=5, n_probe=2,
        subspaces=2, width=32,
    )


@register(
    "similarity_hard_negatives",
    oracle=f"""
    WITH bfq AS (SELECT vec_id AS query_id, embedding AS qvec
                 FROM embeddings WHERE vec_id < 20),
    bfc AS (SELECT vec_id AS neighbor_id, embedding AS cvec
            FROM embeddings),
    scored AS (
      SELECT bfq.query_id, bfc.neighbor_id,
             round({_sql_cos("bfq.qvec", "bfc.cvec")}, 6) AS score
      FROM bfc CROSS JOIN bfq
      WHERE bfc.neighbor_id <> bfq.query_id),
    cand AS (
      SELECT query_id, neighbor_id, score FROM (
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored) t WHERE rnk <= 20),
    kept AS (SELECT * FROM cand WHERE score < 0.3)
    SELECT query_id, neighbor_id, score, neg_rank FROM (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id)
               AS neg_rank
      FROM kept) t WHERE neg_rank <= 5
    """,
    tags=("llm", "similarity", "training", "mining"),
    since=8,
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    5 highest-cosine candidates from the top-20 scan that sit BELOW
    the 0.3 near-dup threshold (the same threshold the semantic
    dedup family treats as duplicate) — informative negatives that
    are guaranteed not to be paraphrases, avoiding the
    false-negative poisoning that inflates contrastive loss. The
    candidate scan is the broadcast-query single-corpus-scan shape;
    the band cut and re-rank share its query_id partitioning (no
    extra exchange)."""
    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return S.hard_negative_mining(
        q, emb, n_neg=5, k_cand=20, dup_threshold=0.3
    )


@register(
    "pipeline_cluster_purity",
    changed=10,
    oracle=f"""
    WITH {_km_chain_cte()},
    lab AS (SELECT vec_id, label FROM embeddings),
    j AS (
      SELECT af.cluster, lab.label
      FROM af JOIN lab ON af.vec_id = lab.vec_id),
    cl AS (
      SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM j GROUP BY cluster, label),
    tot AS (
      SELECT cluster,
             CAST(SUM(n) AS BIGINT) AS n_vectors,
             CAST(COUNT(*) AS BIGINT) AS n_labels
      FROM cl GROUP BY cluster),
    top AS (
      SELECT cluster, label AS top_label, n AS n_top FROM (
        SELECT cluster, label, n,
               row_number() OVER (PARTITION BY cluster
                                  ORDER BY n DESC, label) AS rn
        FROM cl) t WHERE rn = 1)
    SELECT CAST(tot.cluster AS INT) AS cluster,
           tot.n_vectors, tot.n_labels,
           CAST(top.top_label AS INT) AS top_label, top.n_top,
           round(CAST(top.n_top AS DOUBLE) / tot.n_vectors, 6)
             AS purity
    FROM tot JOIN top ON tot.cluster = top.cluster
    """,
    tags=("llm", "embedding", "kmeans", "qa", "audit", "iterative"),
    since=8,
)
def pipeline_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality audit: run the deterministic k-means build
    (k=8, 2 Lloyd rounds — the IVF coarse quantizer) and score each
    learned cluster against the corpus' ground-truth labels: size,
    distinct labels absorbed, majority label, and purity
    (majority/size) — the topic-balance report a curation stack
    reads before trusting cluster-based sampling or SemDeDup-style
    per-cluster dedup (a low-purity cluster means the quantizer is
    mixing topics and per-cluster decisions will cross topics).

    Scale shape: the contingency table is (k x labels)-sized from
    ONE keyed aggregate over the assignment (vector rows never
    shuffle — inherited k-means pin); majority pick and totals are
    windows over that tiny table. The oracle replays the full Lloyd
    chain unrolled, then the same contingency arithmetic.

    r10: the assignment reads from the shared persisted k-means
    artifact (priced once per process by `embedding_kmeans_assign`)."""
    from .llm_ops import _kmeans_artifact_path

    emb = _load(spark, sf_dir, "embeddings")
    path = _kmeans_artifact_path(spark, sf_dir)
    assign = _read_pq(spark, f"{path}/assign")
    j = assign.select("vec_id", "cluster").join(
        emb.select("vec_id", "label"), "vec_id"
    )
    cl = j.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cl.groupBy("cluster").agg(
        F.sum("n").cast("long").alias("n_vectors"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n"), F.asc("label")
    )
    top = (
        cl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster",
            F.col("label").alias("top_label"),
            F.col("n").alias("n_top"),
        )
    )
    return tot.join(top, "cluster").select(
        F.col("cluster").cast("int").alias("cluster"),
        "n_vectors",
        "n_labels",
        F.col("top_label").cast("int").alias("top_label"),
        "n_top",
        F.round(
            F.col("n_top").cast("double") / F.col("n_vectors"), 6
        ).alias("purity"),
    )


@register(
    "multimodal_video_frames",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             2 * ((doc_id % 4) + 1) AS width,
             2 * ((n_chars % 3) + 1) AS height,
             n_chars % 7 + 4 AS n_frames
      FROM documents),
    fr AS (
      SELECT doc_id, width, height, n_frames, f.f AS frame_no
      FROM p, UNNEST(range(0, n_frames, 3)) AS f(f)),
    b AS (
      SELECT doc_id, width, height, n_frames, frame_no, i.i AS i,
             (i.i * 5 + frame_no * 11 + doc_id) % 256 AS byte
      FROM fr, UNNEST(range(0, (3 * width * height) // 2)) AS i(i))
    SELECT doc_id, width, height, n_frames, frame_no,
           CAST(SUM(byte) AS BIGINT) AS frame_checksum,
           round(CAST(SUM(CASE WHEN i < width * height
                          THEN byte ELSE 0 END) AS DOUBLE)
                 / (width * height), 6) AS mean_luma
    FROM b
    GROUP BY doc_id, width, height, n_frames, frame_no
    """,
    tags=("llm", "multimodal", "video", "pandas_udf"),
    since=8,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + temporal frame sampling: synthesize a
    playable YUV4MPEG2 clip per document (dims/length from row
    attributes), parse the actual container bytes (header tokens,
    FRAME markers, 4:2:0 plane math), keep every 3rd frame, and emit
    per-frame checksum + Y-plane mean luma — the third modality
    alongside the BMP image and WAV audio lanes, and the plumbing an
    ffmpeg keyframe sampler drops into when codec libs exist. The
    oracle predicts every statistic arithmetically from the synthesis
    formula: a wrong plane size, marker stride, or frame origin in
    the numpy walk fails the hash."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return M.video_frame_sample(M.synthesize_video(d), every_n=3)


@register(
    "text_pmi_cooccurrence",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    pr AS (
      SELECT w[i.i] AS w1, w[i.i + d.d] AS w2
      FROM base,
           UNNEST(range(1, 3)) AS d(d),
           UNNEST(range(1, len(w) + 1)) AS i(i)
      WHERE i.i + d.d <= len(w)),
    pc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM pr GROUP BY w1, w2),
    ug AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_w
      FROM (SELECT unnest(w) AS word FROM base) t GROUP BY word),
    tot AS (
      SELECT (SELECT CAST(SUM(n_w) AS BIGINT) FROM ug) AS nw,
             (SELECT CAST(SUM(n_pair) AS BIGINT) FROM pc) AS np),
    scored AS (
      SELECT pc.w1, pc.w2, pc.n_pair, a.n_w AS n_w1, b.n_w AS n_w2,
             round(ln(CAST(pc.n_pair * tot.nw * tot.nw AS DOUBLE)
                      / CAST(a.n_w * b.n_w * tot.np AS DOUBLE)), 6)
               AS pmi
      FROM pc
      JOIN ug a ON pc.w1 = a.word
      JOIN ug b ON pc.w2 = b.word, tot
      WHERE pc.n_pair >= 5)
    SELECT w1, w2, n_pair, n_w1, n_w2, pmi, rnk FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2)
                     AS BIGINT) AS rnk
      FROM scored) t WHERE rnk <= 20
    """,
    tags=("llm", "text", "collocation", "pmi"),
    since=8,
    changed=13,
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 directional word pairs by pointwise
    mutual information over a +/-2-token co-occurrence window — the
    phrase-detection statistic (word2vec's phrase pass, 'new york'
    style) a corpus pipeline runs before tokenizer/vocab decisions.

    r12: the pair and unigram count tables ARE the corpus_grams
    artifact's ``pairs`` / ``unigrams`` relations (the zip_with pair
    generation moved into the build, priced once per ingest) — the
    probe is vocab-sized end to end: two tiny parquet scans, the
    merge-pinned PMI joins, one TakeOrdered cut. No checkpoints
    needed — re-scanning a vocab-sized parquet beats pinning it.
    The PMI ratio is built from exact int64 products
    (n_pair*N_w^2 / (n_a*n_b*N_p), safe to ~SF1 corpus sizes in one
    partition-free product; shard the products past that), one
    division, one ln, round 6. The oracle replays the live
    pair-generation pipeline, so a MATCH proves the stored counts
    equal the live zip_with computation."""
    from .llm_ops import _corpus_grams_artifact_path

    path = _corpus_grams_artifact_path(spark, sf_dir)
    # pairs store per-OFFSET counts (layout 2, so the off=1 slice
    # doubles as the bigram LM); PMI's window statistic sums over
    # offsets — a vocab-sized aggregate
    pc = (
        T.read_corpus_grams(spark, path, "pairs")
        .groupBy("w1", "w2")
        .agg(F.sum("n_pair").cast("long").alias("n_pair"))
    )
    ug = T.read_corpus_grams(spark, path, "unigrams")
    tot = (
        ug.agg(F.sum("n_w").cast("long").alias("nw"))
        .crossJoin(
            pc.agg(F.sum("n_pair").cast("long").alias("np"))
        )
    )
    a = ug.select(F.col("word").alias("w1"), F.col("n_w").alias("n_w1"))
    b = ug.select(F.col("word").alias("w2"), F.col("n_w").alias("n_w2"))
    scored = (
        pc.filter(F.col("n_pair") >= 5)
        .hint("merge")
        .join(a.hint("merge"), "w1")
        .join(b.hint("merge"), "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (
                        F.col("n_pair") * F.col("nw") * F.col("nw")
                    ).cast("double")
                    / (
                        F.col("n_w1") * F.col("n_w2") * F.col("np")
                    ).cast("double")
                ),
                6,
            ),
        )
    )
    # TakeOrderedAndProject cut BEFORE the global rank window (the
    # pipeline_vocab_build discipline): the row_number orders 20
    # rows, never the vocab^2-bounded scored table
    top = scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(20)
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("w1", "w2", "n_pair", "n_w1", "n_w2", "pmi", "rnk")
    )


@register(
    "similarity_mutual_knn",
    oracle=f"""
    WITH s AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             {_sql_cos("a.embedding", "b.embedding")} AS score
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id <> b.vec_id),
    knn AS (
      SELECT src, dst, score FROM (
        SELECT src, dst, score,
               row_number() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst) AS rnk
        FROM s) t WHERE rnk <= 3)
    SELECT k1.src AS id1, k1.dst AS id2, k1.score
    FROM knn k1 JOIN knn k2
      ON k1.src = k2.dst AND k1.dst = k2.src
    WHERE k1.src < k1.dst
    """,
    tags=("llm", "similarity", "graph", "knn"),
    since=8,
)
def similarity_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph over the embedding corpus (k=3, label-
    blocked): edges that survive the mutuality test — a is in b's
    top-3 AND b in a's — the sparse high-precision neighborhood
    graph cluster-pruning and corpus-clustering stages consume,
    immune to hub nodes that a threshold graph would over-connect.
    Directed kNN prunes per-partition before the mutuality
    intersection of two |N| x k edge lists."""
    emb = _load(spark, sf_dir, "embeddings")
    return S.mutual_knn_edges(emb, k=3)


@register(
    "embedding_anisotropy",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1024) AS BIGINT)) AS qv
      FROM embeddings),
    v0 AS (SELECT list_transform(range(1, 65),
                                 i -> CAST(1024 AS BIGINT)) AS v),
    {_pi_iter(1, "v0")},
    {_pi_iter(2, "v1")},
    vv AS (
      SELECT v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
               AS vv
      FROM v2),
    rowstats AS (
      SELECT e.label,
             CAST(list_sum(list_transform(list_zip(q.qv, vv.v),
                                          p -> p[1] * p[2])) AS BIGINT)
               AS dot,
             CAST(list_sum(list_transform(q.qv, x -> x * x)) AS BIGINT)
               AS en
      FROM q JOIN embeddings e ON q.vec_id = e.vec_id, vv)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(en) AS BIGINT) AS energy_total,
           round(CAST(SUM(CAST(dot AS HUGEINT) * dot) AS DOUBLE)
                 / ((SELECT CAST(vv AS DOUBLE) FROM vv)
                    * CAST(SUM(en) AS DOUBLE)), 6)
             AS variance_explained
    FROM rowstats GROUP BY label
    """,
    tags=("llm", "embedding", "pca", "whitening", "iterative"),
    since=8,
    changed=11,
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy report — the all-but-the-top (Mu & Viswanath 2018)
    go/no-go diagnostic: per label, the fraction of total embedding
    energy lying along the corpus' top principal direction
    (Pythagoras over exact integers: ratio = sum(dot^2) / (|v|^2 *
    sum(|x|^2))). A high ratio says cosine similarities are dominated
    by one shared direction and the whitening step (project it out)
    will sharpen neighbors; near-uniform ratios say don't bother.
    One extra corpus pass after the power-iteration build; per-label
    sums are exact (dot^2 sums ride a decimal(38) escape hatch past
    int64, the k-means precedent). r11: the axis is one stored
    d-long row (powdir artifact) — the per-invocation power chain
    AND its unused projection job are gone; the oracle replays the
    full iteration."""
    emb = _load(spark, sf_dir, "embeddings")
    v = S.read_powdir(
        spark, _powdir_artifact_path(spark, sf_dir), iters=2, scale=1024
    )
    vv = sum(int(x) * int(x) for x in v)
    vl = F.array(*[F.lit(int(x)).cast("long") for x in v])
    qx = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1024).cast("long"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qx"), vl, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    en = F.aggregate(
        F.transform(F.col("qx"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    rows = emb.select(F.col("label"), qx.alias("qx")).select(
        "label", dot.alias("dot"), en.alias("en")
    )
    sd2 = F.sum(
        F.col("dot").cast("decimal(38,0)") * F.col("dot")
    ).cast("double")
    return rows.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("en").cast("long").alias("energy_total"),
        F.round(
            sd2
            / (
                F.lit(float(vv))
                * F.sum("en").cast("long").cast("double")
            ),
            6,
        ).alias("variance_explained"),
    )


@register(
    "similarity_topk_ivf_opq",
    changed=10,
    oracle=f"""
    WITH {_SQL_OPQ_ROTATED},
    tyl AS (
      SELECT ty.vec_id, ty.embedding, e.label
      FROM ty JOIN embeddings e ON ty.vec_id = e.vec_id),
    {_pq_block("a", 1, 32, 16, src="tyl")},
    {_pq_block("b", 33, 32, 16, src="tyl")},
    codes AS (
      SELECT x.vec_id, x.cluster AS c0, y.cluster AS c1
      FROM afa x JOIN afb y ON x.vec_id = y.vec_id),
    qqa AS (SELECT vec_id AS query_id, qv FROM qa WHERE vec_id < 20),
    qqb AS (SELECT vec_id AS query_id, qv FROM qb WHERE vec_id < 20),
    luta AS (
      SELECT query_id, c2a.cluster, {_pq_sq("c2a", "qqa")} AS dk
      FROM qqa CROSS JOIN c2a),
    lutb AS (
      SELECT query_id, c2b.cluster, {_pq_sq("c2b", "qqb")} AS dk
      FROM qqb CROSS JOIN c2b),
    qr AS (SELECT vec_id AS query_id, embedding AS qvec
           FROM tyl WHERE vec_id < 20),
    reps AS (
      SELECT label AS cluster, embedding AS rvec FROM (
        SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id)
                 AS rn
        FROM tyl) t WHERE rn = 1),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT qr.query_id, r.cluster,
               row_number() OVER (PARTITION BY qr.query_id
                   ORDER BY {_sql_cos("qr.qvec", "r.rvec")} DESC,
                            r.cluster) AS pr
        FROM qr CROSS JOIN reps r) t WHERE pr <= 2),
    memb AS (SELECT vec_id, label AS cluster FROM tyl),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             round((l0.dk + l1.dk) / 1048576.0, 6) AS approx_dist
      FROM codes c
      JOIN memb m ON m.vec_id = c.vec_id
      JOIN probes p ON p.cluster = m.cluster
      JOIN luta l0 ON l0.query_id = p.query_id AND l0.cluster = c.c0
      JOIN lutb l1 ON l1.query_id = p.query_id AND l1.cluster = c.c1
      WHERE c.vec_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, approx_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dist, neighbor_id)
               AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, approx_dist, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("llm", "similarity", "topk", "ivf", "opq", "ann", "iterative"),
    since=8,
)
def similarity_topk_ivf_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-OPQ — FAISS's `OPQx,IVFy,PQz` production shape, completing
    the quantization ladder's routed column (flat: PQ -> OPQ;
    routed: IVF-PQ -> this). The OPQ rotation (Householder + energy
    permutation) is applied to corpus and queries; coarse routing
    runs in rotated space (cosine is orthogonal-invariant, so the
    probes pick the same lists as raw routing) and ADC scores only
    the probed lists' rotated-space code entries. The oracle unrolls
    the ENTIRE stack: power iteration, rotation integers, energy
    permutation, both Lloyd chains, encode, probe ranking,
    membership restriction, LUTs, and the final rank.

    r10: served as the ROUTED probe of the persisted OPQ artifact
    (`n_probe=2` prunes the cluster-partitioned codes scan to the
    probed inverted lists — the same DPP shape as
    `similarity_topk_from_artifact`); the rotation + Lloyd build is
    priced once per process in `similarity_opq_build_artifact`."""
    path = _opq_artifact_path(spark, sf_dir)
    emb = _load(spark, sf_dir, "embeddings")
    return S.topk_from_opq_artifact(
        emb.filter(F.col("vec_id") < 20), path, k=5, n_probe=2,
        subspaces=2, width=32,
    )
