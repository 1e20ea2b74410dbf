"""Shared persisted-artifact lifecycle tests (r10 verdict Next #3/#6 +
r10 ADVICE): ONE ensure-helper now owns the _done-marker / rmtree /
lock / cache-invalidation contract for every artifact family, so the
contract is tested ONCE, parametrized over every family — an eighth
family added through `ensure_artifact` is covered automatically.
"""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from flink_connectors_spark.operators import artifacts as A
from flink_connectors_spark.operators import similarity as S
from flink_connectors_spark.plans import llm_ops, llm_ops2, llm_ops3
from flink_connectors_spark.plans import temporal as _temporal
from flink_connectors_spark.session import load_table

# every artifact family: (kind tag, ensure-helper). Parametrizing over
# the full population is the r10 verdict's ask — a helper that forgot
# the rmtree or the marker order fails here for its own family.
ALL_FAMILIES = [
    ("ann_ivfpq", llm_ops3._ivfpq_artifact_path),
    ("ann_ivfpq_inc", llm_ops3._ivfpq_inc_artifact_path),
    ("ann_ivfpq_cpt", llm_ops3._ivfpq_cpt_artifact_path),
    ("ann_ivfadc", llm_ops3._ivfadc_artifact_path),
    ("ann_opq", llm_ops3._opq_artifact_path),
    ("ann_opq_inc", llm_ops3._opq_inc_artifact_path),
    ("kmeans8", llm_ops._kmeans_artifact_path),
    ("kmeans8_old", llm_ops._kmeans_old_artifact_path),
    ("neardup_edges", llm_ops._neardup_edges_artifact_path),
    ("neardup_graph", llm_ops._neardup_graph_artifact_path),
    ("minhash_pairs", llm_ops._minhash_pairs_artifact_path),
    ("contain_pairs", llm_ops._containment_pairs_artifact_path),
    ("minhash_index", llm_ops._minhash_index_artifact_path),
    ("bpe_merges", llm_ops3._bpe_artifact_path),
    ("vocab50", llm_ops3._vocab_artifact_path),
    ("powdir", llm_ops3._powdir_artifact_path),
    ("sq8_stats", llm_ops2._sq8_artifact_path),
    ("corpus_grams", llm_ops._corpus_grams_artifact_path),
    ("minhash_index_cpt", llm_ops._minhash_index_cpt_artifact_path),
    ("corpus_grams_inc", llm_ops._corpus_grams_inc_artifact_path),
    ("corpus_grams_cpt", llm_ops._corpus_grams_cpt_artifact_path),
    ("simhash_fps", llm_ops._simhash_fps_artifact_path),
    ("neardup_edges_inc", llm_ops._neardup_edges_inc_artifact_path),
    ("minhash_pairs_inc", llm_ops._minhash_pairs_inc_artifact_path),
    ("contain_pairs_inc", llm_ops._containment_pairs_inc_artifact_path),
    ("cms_partkey", llm_ops3._cms_artifact_path),
    ("cms_partkey_inc", llm_ops3._cms_inc_artifact_path),
    ("bloom_words", llm_ops._bloom_words_artifact_path),
    ("hll_users", _temporal._hll_users_artifact_path),
]


@pytest.mark.parametrize(
    "kind,helper", ALL_FAMILIES, ids=[k for k, _ in ALL_FAMILIES]
)
def test_crashed_half_build_rebuilds(spark, sf_dir, kind, helper):
    """Completeness is the explicit ``_done`` marker written LAST —
    a directory with relations present but no marker (crash shape:
    Spark creates output dirs before the job commits) must be torn
    down wholesale and rebuilt, for EVERY family."""
    path = helper(spark, sf_dir)
    assert path == A.artifact_path(spark, kind, sf_dir)
    marker = os.path.join(path, "_done")
    assert os.path.exists(marker)
    os.unlink(marker)
    # plant a canary inside an existing relation dir: a rebuild that
    # forgot rmtree-before-rebuild would leave it behind
    rel = next(
        d for d in sorted(os.listdir(path))
        if os.path.isdir(os.path.join(path, d))
    )
    canary = os.path.join(path, rel, "_half_built_canary")
    open(canary, "w").close()
    path2 = helper(spark, sf_dir)
    assert path2 == path
    assert os.path.exists(marker), "rebuild did not complete"
    assert not os.path.exists(canary), (
        "half-built artifact served instead of rebuilt"
    )


def test_rebuild_invalidates_manifest_and_rotation_caches(spark, sf_dir):
    """r10 ADVICE (medium): the rotation cache was primed on first
    read but never invalidated — a rebuild at the same path would
    silently rotate queries with the stale Householder vector against
    the new codebooks. ensure_artifact must pop BOTH process caches
    before building and the build must re-prime them."""
    path = llm_ops3._opq_artifact_path(spark, sf_dir)
    S.read_artifact_manifest(spark, path)
    S.read_opq_rotation(spark, path)
    # poison the process caches; a rebuild must replace the poison
    # with freshly-built values (never serve it)
    S._MANIFEST_CACHE[path] = {"subspaces": -99}
    S._ROTATION_CACHE[path] = ([0], 1, [0])
    os.unlink(os.path.join(path, "_done"))
    llm_ops3._opq_artifact_path(spark, sf_dir)
    assert S._MANIFEST_CACHE[path]["subspaces"] == 2
    u, uu, perm = S.read_opq_rotation(spark, path)
    assert len(u) > 1 and len(perm) > 1


def test_rebuild_invalidates_schema_cache(spark, sf_dir):
    """r14 ADVICE (low) / r14 verdict Next #7: the session-level
    parquet schema cache is keyed on relation paths inside the
    artifact dir. A rebuild with schema-changing params (e.g. ivfpq
    ``subspaces`` changes the codes columns) must not be read through
    ``spark.read.schema(stale)`` — missing columns would silently
    come back NULL instead of erroring. ensure_artifact's cache
    invalidation must pop the schema cache for every sub-path."""
    import flink_connectors_spark.session as sess

    schemas = iter([("a", "b"), ("a", "b", "c")])

    def build(path: str) -> None:
        cols = next(schemas)
        row = {c: float(i) for i, c in enumerate(cols)}
        spark.createDataFrame([row]).select(*cols).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "rel"))

    path = A.ensure_artifact(spark, "schemaflip", sf_dir, build)
    rel = os.path.join(path, "rel")
    assert sess.read_parquet(spark, rel).columns == ["a", "b"]
    assert rel in sess._SCHEMA_CACHE
    os.unlink(os.path.join(path, "_done"))
    A.ensure_artifact(spark, "schemaflip", sf_dir, build)
    got = sess.read_parquet(spark, rel)
    assert got.columns == ["a", "b", "c"], (
        "stale cached schema served after a schema-changing rebuild"
    )
    assert got.first()["c"] == 2.0


def test_concurrent_ensure_builds_once(spark, sf_dir):
    """r10 ADVICE: two threads observing the missing marker must not
    run interleaved rmtree+overwrite builds — the per-path lock
    serializes; the second waiter sees the marker and skips."""
    calls: list[int] = []

    def build(path: str) -> None:
        calls.append(1)
        time.sleep(0.3)  # widen the race window
        os.makedirs(os.path.join(path, "rel"), exist_ok=True)

    errs: list[BaseException] = []

    def run() -> None:
        try:
            A.ensure_artifact(spark, "testrace", sf_dir, build)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(calls) == 1, f"build ran {len(calls)} times"


def test_stable_root_reuses_across_processes(spark, sf_dir, tmp_path):
    """Stable-path mode (r10 verdict Next #3): with an artifact root
    configured, the path drops the PID, a 'second process' (process
    caches + locks cleared) finds the marker and serves probes with
    ZERO rebuild, and param drift still errors via the manifest."""
    spark.conf.set(A.ARTIFACT_ROOT_CONF, str(tmp_path))
    try:
        path = llm_ops3._ivfpq_artifact_path(spark, sf_dir)
        assert path.startswith(str(tmp_path))
        assert str(os.getpid()) not in os.path.basename(path)
        q = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 5
        )
        first = S.topk_from_ivfpq_artifact(
            q, path, k=3, subspaces=None, width=None, scale=None
        ).collect()
        assert first
        # snapshot relation mtimes, then simulate a fresh process:
        # clear every process-level cache and the build locks
        mtimes = {
            f: os.path.getmtime(os.path.join(path, "codes", f))
            for f in os.listdir(os.path.join(path, "codes"))
        }
        A._PATH_LOCKS.clear()
        S._MANIFEST_CACHE.clear()
        S._ROTATION_CACHE.clear()
        path2 = llm_ops3._ivfpq_artifact_path(spark, sf_dir)
        assert path2 == path
        for f, m in mtimes.items():
            assert os.path.getmtime(os.path.join(path, "codes", f)) == m, (
                "stable artifact was rebuilt instead of reused"
            )
        again = S.topk_from_ivfpq_artifact(
            q, path2, k=3, subspaces=None, width=None, scale=None
        ).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, first))
        # params mismatch still errors (manifest validation)
        with pytest.raises(ValueError, match="mismatch"):
            S.topk_from_ivfpq_artifact(q, path2, k=3, subspaces=4)
    finally:
        spark.conf.unset(A.ARTIFACT_ROOT_CONF)


def test_probe_without_tombstone_relation_filters_nothing(
    spark, sf_dir, tmp_path
):
    """r10 ADVICE: apply_tombstones=True on an artifact where
    delete_ids was never called must filter nothing, not raise
    AnalysisException on the missing relation."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 80
    )
    path = str(tmp_path / "idx")
    S.ivfpq_build_artifact(emb, path, subspaces=2, codebook_k=16, iters=1)
    q = emb.filter(F.col("vec_id") < 3)
    plain = S.topk_from_ivfpq_artifact(
        q, path, k=3, n_probe=2, subspaces=2, width=None
    ).collect()
    tomb = S.topk_from_ivfpq_artifact(
        q, path, k=3, n_probe=2, subspaces=2, width=None,
        apply_tombstones=True,
    ).collect()
    assert sorted(map(tuple, tomb)) == sorted(map(tuple, plain))


def test_overlapping_deletes_dedupe_on_read(spark, sf_dir, tmp_path):
    """r10 ADVICE: delete_ids dedupes within a call only; overlapping
    calls grow the tombstone relation. Readers dedupe on read, so the
    probe result is identical however many times an id was deleted."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 80
    )
    path = str(tmp_path / "idx")
    S.ivfpq_build_artifact(emb, path, subspaces=2, codebook_k=16, iters=1)
    dead = emb.filter((F.col("vec_id") % 7 == 3) & (F.col("vec_id") >= 10))
    S.ivfpq_delete_ids(dead, path)
    q = emb.filter(F.col("vec_id") < 3)
    once = S.topk_from_ivfpq_artifact(
        q, path, k=5, n_probe=2, subspaces=2, width=None,
        apply_tombstones=True,
    ).collect()
    S.ivfpq_delete_ids(dead, path)  # overlapping second delete
    S.ivfpq_delete_ids(dead.limit(2), path)  # and a partial third
    twice = S.topk_from_ivfpq_artifact(
        q, path, k=5, n_probe=2, subspaces=2, width=None,
        apply_tombstones=True,
    ).collect()
    assert sorted(map(tuple, twice)) == sorted(map(tuple, once))
    deleted = {r[0] for r in dead.select("vec_id").collect()}
    assert not deleted & {r["neighbor_id"] for r in twice}


def test_probe_falls_back_to_precompact_codes(spark, sf_dir, tmp_path):
    """r10 ADVICE: a crash BETWEEN ivfpq_compact's two renames leaves
    no live codes dir. Probes must fall back to the preserved
    codes_precompact relation — whose tombstones are still intact —
    and keep returning the tombstone-filtered result."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 80
    )
    path = str(tmp_path / "idx")
    S.ivfpq_build_artifact(emb, path, subspaces=2, codebook_k=16, iters=1)
    dead = emb.filter((F.col("vec_id") % 7 == 3) & (F.col("vec_id") >= 10))
    S.ivfpq_delete_ids(dead, path)
    q = emb.filter(F.col("vec_id") < 3)
    want = S.topk_from_ivfpq_artifact(
        q, path, k=5, n_probe=2, subspaces=2, width=None,
        apply_tombstones=True,
    ).collect()
    # simulate the crash window: codes renamed away, swap not done
    os.rename(f"{path}/codes", f"{path}/codes_precompact")
    got = S.topk_from_ivfpq_artifact(
        q, path, k=5, n_probe=2, subspaces=2, width=None,
        apply_tombstones=True,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stable_root_reuses_pair_artifact(spark, sf_dir, tmp_path):
    """Stable-root reuse for the r11 corpus-side families (the
    ivfpq test's text twin): the MinHash pair artifact built under a
    durable root serves a 'second process' (caches + locks cleared)
    with ZERO rebuild — identical pair rows, no relation rewrite —
    and the audit-grade stats read works across the same boundary."""
    from flink_connectors_spark.operators import dedup as D
    from flink_connectors_spark.plans import llm_ops

    spark.conf.set(A.ARTIFACT_ROOT_CONF, str(tmp_path))
    try:
        path = llm_ops._minhash_pairs_artifact_path(spark, sf_dir)
        assert path.startswith(str(tmp_path))
        first = sorted(
            map(tuple, D.read_minhash_pairs(spark, path, 0.5).collect())
        )
        mtimes = {
            f: os.path.getmtime(os.path.join(path, "pairs", f))
            for f in os.listdir(os.path.join(path, "pairs"))
        }
        A._PATH_LOCKS.clear()
        S._MANIFEST_CACHE.clear()
        path2 = llm_ops._minhash_pairs_artifact_path(spark, sf_dir)
        assert path2 == path
        for f, m in mtimes.items():
            assert (
                os.path.getmtime(os.path.join(path, "pairs", f)) == m
            ), "stable pair artifact was rebuilt instead of reused"
        again = sorted(
            map(tuple, D.read_minhash_pairs(spark, path2, 0.5).collect())
        )
        assert again == first
        stats = D.read_minhash_candidate_stats(spark, path2)
        assert stats.count() >= len(first)
    finally:
        spark.conf.unset(A.ARTIFACT_ROOT_CONF)


def test_minhash_index_append_is_transactional(spark, sf_dir):
    """r11 ADVICE (medium): the signature-index append must be a
    transaction — a crash mid-append leaves the index serving
    exactly the pre-append pair set (never candidates without
    verify rows), and a retry with the same batch_id is idempotent
    (no duplicate pairs). Commit point = the per-batch marker,
    written LAST; readers partition-prune to committed batches."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build_artifact,
        minhash_lsh_pairs_vs_index,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    path = tempfile.mkdtemp(prefix="fcs_test_txn_index_")
    try:
        minhash_index_build_artifact(
            docs.filter(F.col("doc_id") % 3 == 0), path
        )
        probe = docs.filter(F.col("doc_id") % 3 == 2)
        # two append batches DISJOINT from the base corpus and from
        # each other (re-ingesting ids already indexed would
        # legitimately double their pairs — not the bug under test)
        batch1 = docs.filter(F.col("doc_id") % 6 == 1)
        batch2 = docs.filter(F.col("doc_id") % 6 == 4)

        def pairs():
            return sorted(
                map(
                    tuple,
                    minhash_lsh_pairs_vs_index(
                        probe, path, threshold=0.5
                    ).collect(),
                )
            )

        before = pairs()
        minhash_index_append(batch1, path, "b1")
        after = pairs()
        assert len(after) > len(before), (
            "appended batch contributed no pairs — the fixture "
            "must exercise the committed-read path"
        )
        assert len(set(after)) == len(after), "duplicate pairs"
        # idempotent retry: same batch_id, identical result
        minhash_index_append(batch1, path, "b1")
        assert pairs() == after
        # crash simulation: commit b2, then strip ONLY its marker —
        # the data directories stay on disk but every reader must
        # treat the batch as never-happened
        minhash_index_append(batch2, path, "b2")
        with_b2 = pairs()
        os.unlink(os.path.join(path, "_batches", "b2"))
        assert pairs() == after, (
            "uncommitted (crashed) append is visible to probes"
        )
        # retry re-commits: identical to the first committed read
        minhash_index_append(batch2, path, "b2")
        assert pairs() == with_b2
        assert len(set(with_b2)) == len(with_b2), "duplicate pairs"
        # batch_id is validated: path-unsafe or reserved ids error
        with pytest.raises(ValueError, match="invalid batch_id"):
            minhash_index_append(batch2, path, "base")
        with pytest.raises(ValueError, match="invalid batch_id"):
            minhash_index_append(batch2, path, "a/b")
        # "." / ".." pass the charset but resolve the marker to the
        # index dir itself (silent already-committed no-op)
        with pytest.raises(ValueError, match="invalid batch_id"):
            minhash_index_append(batch2, path, "..")
        with pytest.raises(ValueError, match="invalid batch_id"):
            minhash_index_append(batch2, path, ".")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stable_claim_two_processes_build_once(tmp_path):
    """r11 verdict What's-wrong #3: two COLD processes sharing a
    durable FCS_ARTIFACT_ROOT must not interleave rmtree+overwrite
    builds — the atomic .building claim serializes them, exactly one
    build runs, and both processes end up serving the same completed
    artifact. Real subprocesses (no shared interpreter state), a
    deliberately slow build to widen the race window."""
    import subprocess
    import sys

    root = tmp_path / "shared_root"
    builds = tmp_path / "builds"
    builds.mkdir()
    script = f"""
import os, sys, time, uuid
sys.path.insert(0, {repr(os.getcwd())})
os.environ["FCS_ARTIFACT_ROOT"] = {repr(str(root))}
from flink_connectors_spark.operators.artifacts import ensure_artifact

def build(path):
    open(os.path.join({repr(str(builds))}, uuid.uuid4().hex), "w").close()
    time.sleep(1.0)
    os.makedirs(os.path.join(path, "rel"), exist_ok=True)

# spark=None: artifact_root falls through to the env var
p = ensure_artifact(None, "xprocrace", "/root/testdata/sf0.001", build)
assert os.path.exists(os.path.join(p, "_done"))
print("OK")
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for _ in range(3)
    ]
    outs = [p.communicate(timeout=120) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]
        assert b"OK" in out
    assert len(list(builds.iterdir())) == 1, (
        "concurrent cold processes ran more than one build"
    )


def test_stable_claim_stale_takeover(tmp_path):
    """A claim left by a CRASHED builder (older than
    STALE_CLAIM_SECONDS) must be taken over instead of blocking
    every later session forever."""
    root = str(tmp_path / "root2")
    os.environ["FCS_ARTIFACT_ROOT"] = root
    try:
        path = A.artifact_path(None, "stalekind", "/root/testdata/sf0.001")
        claim = path + ".building"
        os.makedirs(claim)
        old = time.time() - A.STALE_CLAIM_SECONDS - 60
        os.utime(claim, (old, old))
        calls = []

        def build(p):
            calls.append(1)
            os.makedirs(os.path.join(p, "rel"), exist_ok=True)

        got = A.ensure_artifact(None, "stalekind", "/root/testdata/sf0.001", build)
        assert got == path and calls == [1]
        assert os.path.exists(os.path.join(path, "_done"))
        assert not os.path.exists(claim), "claim not released"
    finally:
        os.environ.pop("FCS_ARTIFACT_ROOT", None)


def test_stable_claim_waits_for_live_builder(tmp_path):
    """A FRESH claim means another process is mid-build: the waiter
    must poll until that builder's marker lands, then serve the
    completed artifact WITHOUT building (its own build fn never
    runs)."""
    root = str(tmp_path / "root3")
    os.environ["FCS_ARTIFACT_ROOT"] = root
    try:
        path = A.artifact_path(None, "waitkind", "/root/testdata/sf0.001")
        claim = path + ".building"
        os.makedirs(claim)

        def other_builder_finishes():
            time.sleep(0.6)
            os.makedirs(path, exist_ok=True)
            open(os.path.join(path, "_done"), "w").close()
            os.rmdir(claim)

        t = threading.Thread(target=other_builder_finishes)
        t.start()

        def build(p):  # pragma: no cover - must not run
            raise AssertionError("waiter ran a duplicate build")

        got = A.ensure_artifact(None, "waitkind", "/root/testdata/sf0.001", build)
        t.join()
        assert got == path
        assert os.path.exists(os.path.join(path, "_done"))
    finally:
        os.environ.pop("FCS_ARTIFACT_ROOT", None)


def test_minhash_index_compact_lifecycle(spark, sf_dir):
    """Compaction folds committed batches into one part=base per
    relation and clears the consumed markers; the probed pair set is
    identical before and after, the crash window between the two
    renames serves via the *_precompact fallback, and compacting a
    never-appended index is a no-op."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators.dedup import (
        _committed_index_parts,
        minhash_index_append,
        minhash_index_build_artifact,
        minhash_index_compact,
        minhash_lsh_pairs_vs_index,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    path = tempfile.mkdtemp(prefix="fcs_test_cpt_index_")
    try:
        minhash_index_build_artifact(
            docs.filter(F.col("doc_id") % 3 == 0), path
        )
        minhash_index_append(
            docs.filter(F.col("doc_id") % 3 == 1), path, "n1"
        )
        probe = docs.filter(F.col("doc_id") % 3 == 2)

        def pairs():
            return sorted(
                map(
                    tuple,
                    minhash_lsh_pairs_vs_index(
                        probe, path, threshold=0.5
                    ).collect(),
                )
            )

        before = pairs()
        minhash_index_compact(spark, path)
        assert _committed_index_parts(path) == ["base"]
        assert sorted(os.listdir(os.path.join(path, "bands"))) == [
            "part=base"
        ]
        assert pairs() == before, "compaction changed the relation"
        # crash window: no live bands dir, only the precompact copy
        os.rename(
            os.path.join(path, "bands"),
            os.path.join(path, "bands_precompact"),
        )
        assert pairs() == before, "precompact fallback not served"
        os.rename(
            os.path.join(path, "bands_precompact"),
            os.path.join(path, "bands"),
        )
        # no-op on an all-base index: relations untouched
        m = os.path.getmtime(os.path.join(path, "bands"))
        minhash_index_compact(spark, path)
        assert os.path.getmtime(os.path.join(path, "bands")) == m
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_minhash_index_compact_retry_after_rename_crash(spark, sf_dir):
    """Code-review regression (r12): a compact retry after a crash
    BETWEEN the two renames (live dir gone, only *_precompact left)
    must rebuild from the fallback and finish — the original rmtree-
    before-rename order deleted the fallback first and then raised
    FileNotFoundError on the missing live dir, stranding the
    relation entirely."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build_artifact,
        minhash_index_compact,
        minhash_lsh_pairs_vs_index,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    path = tempfile.mkdtemp(prefix="fcs_test_cpt_retry_")
    try:
        minhash_index_build_artifact(
            docs.filter(F.col("doc_id") % 3 == 0), path
        )
        minhash_index_append(
            docs.filter(F.col("doc_id") % 3 == 1), path, "n1"
        )
        probe = docs.filter(F.col("doc_id") % 3 == 2)
        before = sorted(
            map(
                tuple,
                minhash_lsh_pairs_vs_index(
                    probe, path, threshold=0.5
                ).collect(),
            )
        )
        # simulate the crash window: live bands renamed out, new base
        # never renamed in (and the markers still present, exactly as
        # a real crash leaves them)
        os.rename(
            os.path.join(path, "bands"),
            os.path.join(path, "bands_precompact"),
        )
        minhash_index_compact(spark, path)  # the retry
        assert os.path.isdir(os.path.join(path, "bands"))
        assert not os.path.isdir(os.path.join(path, "bands_precompact"))
        after = sorted(
            map(
                tuple,
                minhash_lsh_pairs_vs_index(
                    probe, path, threshold=0.5
                ).collect(),
            )
        )
        assert after == before
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_floor_must_be_representable_at_x100(spark, sf_dir, tmp_path):
    """Code-review regression (r12): the float-exact reader guard is
    only sound when the stored x100 floor EQUALS the build floor — a
    floor like 0.375 rounds UP to 38 and the reader would reject the
    artifact's own build threshold. Unrepresentable floors must
    error at build time; representable ones (0.3 despite its inexact
    float) must pass."""
    from flink_connectors_spark.operators.artifacts import floor_x100
    from flink_connectors_spark.operators.dedup import (
        minhash_pairs_build_artifact,
    )

    assert floor_x100(0.3, "x") == 30
    assert floor_x100(0.5, "x") == 50
    assert floor_x100(0.0, "x") == 0
    with pytest.raises(ValueError, match="not representable"):
        floor_x100(0.375, "x")
    docs = load_table(spark, sf_dir, "documents").limit(10)
    with pytest.raises(ValueError, match="not representable"):
        minhash_pairs_build_artifact(
            docs, str(tmp_path / "p375"), min_jac=0.375
        )


def test_neardup_signatures_validate_dim(spark, sf_dir):
    """Code-review regression (r12): a hyperplane-dimension mismatch
    is the nastiest silent failure (zip_with NULL-pads, so every
    band key differs with zero errors) — the manifest records dim
    and the reader validates it."""
    from flink_connectors_spark.operators import similarity as S
    from flink_connectors_spark.plans.llm_ops import (
        _neardup_edges_artifact_path,
    )

    path = _neardup_edges_artifact_path(spark, sf_dir)
    assert S.read_neardup_signatures(spark, path, dim=64).columns == [
        "vec_id", "band_id", "band_key"
    ]
    with pytest.raises(ValueError, match="params mismatch"):
        S.read_neardup_signatures(spark, path, dim=128)


def test_minhash_index_layout_is_versioned(spark, sf_dir, tmp_path):
    """Code-review regression (r12): appending the partitioned layout
    into a pre-r12 FLAT index would mix partition depths and brick
    the directory for every reader — APPEND requires layout=2.
    READS stay backward-compatible (a flat index is all-committed by
    construction and the column guard handles it), but an UNKNOWN
    future layout errors loudly on read too."""
    from flink_connectors_spark.operators.dedup import (
        minhash_index_append,
        minhash_lsh_pairs_vs_index,
    )
    from flink_connectors_spark.operators.similarity import (
        _write_artifact_manifest,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    flat = str(tmp_path / "flat_index")
    # a layout-less manifest, as an r11 build would have written
    _write_artifact_manifest(
        spark, flat,
        {"shingle_n": 3, "num_hashes": 8, "band_size": 2},
    )
    with pytest.raises(ValueError, match="params mismatch"):
        minhash_index_append(docs, flat, "b1")
    unknown = str(tmp_path / "future_index")
    _write_artifact_manifest(
        spark, unknown,
        {"shingle_n": 3, "num_hashes": 8, "band_size": 2,
         "layout": 99},
    )
    with pytest.raises(ValueError, match="unknown layout"):
        minhash_lsh_pairs_vs_index(docs, unknown, threshold=0.5)

def test_claim_acquire_writes_owner_token(tmp_path):
    """r12 ADVICE: every claimant stamps an ``owner`` token (uuid:pid)
    inside its claim dir so a taker-over can tell a crashed claim
    from a fresh one that slid under a stale stat."""
    path = str(tmp_path / "tokened_artifact")
    assert A._acquire_build_claim(path, until_marker=False)
    try:
        tok = A._read_owner_token(path + ".building")
        assert tok is not None and tok.endswith(f":{os.getpid()}")
    finally:
        A._release_build_claim(path)
    assert not os.path.exists(path + ".building")


def test_claim_takeover_token_mismatch_restores(tmp_path, monkeypatch):
    """r12 ADVICE: if the claim dir a taker-over renamed aside turns
    out to carry a DIFFERENT owner token than the stale one it
    stat'd (a fresh claimant raced in between stat and rename), the
    dir must be restored, never rmtree'd — the retry loop then takes
    over the genuinely-stale claim on its next pass."""
    import shutil

    root = str(tmp_path / "root_tok")
    monkeypatch.setenv("FCS_ARTIFACT_ROOT", root)
    path = A.artifact_path(None, "tokkind", "/root/testdata/sf0.001")
    claim = path + ".building"
    os.makedirs(claim)
    with open(os.path.join(claim, "owner"), "w") as fh:
        fh.write("crashed-builder-token")
    old = time.time() - A.STALE_CLAIM_SECONDS - 60
    os.utime(claim, (old, old))

    real = A._read_owner_token
    calls = {"n": 0}

    def race_once(p):
        calls["n"] += 1
        if calls["n"] == 2:
            # the post-rename aside verification of takeover #1 sees
            # a different token, as if a fresh claimant's dir had
            # been renamed instead of the crashed one
            return "fresh-claimants-token"
        return real(p)

    monkeypatch.setattr(A, "_read_owner_token", race_once)
    built = []

    def build(p):
        built.append(1)
        os.makedirs(os.path.join(p, "rel"), exist_ok=True)

    got = A.ensure_artifact(None, "tokkind", "/root/testdata/sf0.001", build)
    assert got == path and built == [1]
    assert os.path.exists(os.path.join(path, "_done"))
    # takeover #1 restored (mismatch), takeover #2 succeeded (match):
    # the mismatch branch really executed, and no aside orphan remains
    assert calls["n"] >= 4
    assert not any(".stale." in d for d in os.listdir(root))
    shutil.rmtree(root, ignore_errors=True)


def test_claim_wait_warns_then_max_wait_raises(tmp_path, monkeypatch, caplog):
    """r12 ADVICE: a waiter blocked on a peer's claim must (a) log a
    warning with the claim path/age instead of polling silently and
    (b) honor FCS_CLAIM_MAX_WAIT by raising a descriptive
    TimeoutError instead of blocking until the stale takeover."""
    import logging

    root = str(tmp_path / "root_wait")
    monkeypatch.setenv("FCS_ARTIFACT_ROOT", root)
    monkeypatch.setenv(A.CLAIM_MAX_WAIT_ENV, "0.9")
    monkeypatch.setattr(A, "CLAIM_WAIT_WARN_SECONDS", 0.1)
    path = A.artifact_path(None, "waitwarn", "/root/testdata/sf0.001")
    os.makedirs(path + ".building")  # a live peer's fresh claim

    def build(p):  # pragma: no cover - must not run
        raise AssertionError("waiter must time out, not build")

    with caplog.at_level(
        logging.WARNING, logger="flink_connectors_spark.artifacts"
    ):
        with pytest.raises(TimeoutError, match="gave up waiting"):
            A.ensure_artifact(None, "waitwarn", "/root/testdata/sf0.001", build)
    assert "waiting" in caplog.text and ".building" in caplog.text


def test_claim_heartbeat_retries_through_missing_claim(tmp_path, monkeypatch):
    """r12 ADVICE: the heartbeat must keep retrying on
    FileNotFoundError (the transient aside-rename window of a
    mistaken takeover) rather than exiting permanently — once the
    claim dir is back, beats resume refreshing its mtime."""
    import shutil

    monkeypatch.setattr(A, "STALE_CLAIM_SECONDS", 0.3)  # tick = 0.1s
    claim = str(tmp_path / "hb.building")
    os.makedirs(claim)
    with A._claim_heartbeat(claim):
        shutil.rmtree(claim)  # the aside window: beats now ENOENT
        time.sleep(0.35)
        os.makedirs(claim)  # claim restored
        stale = time.time() - 100
        os.utime(claim, (stale, stale))
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline:
            if time.time() - os.path.getmtime(claim) < 50:
                break
            time.sleep(0.05)
        assert time.time() - os.path.getmtime(claim) < 50, (
            "heartbeat never resumed after the claim reappeared"
        )


def test_neardup_signatures_pre_r12_fallback(spark, sf_dir, tmp_path):
    """r12 ADVICE (medium): a pre-r12 edge artifact has a trusted
    _done marker but no signatures relation — the reader must fall
    back to the live hyperplane fold (bit-identical: deterministic
    hyperplanes) when given the corpus, and raise a descriptive
    error (not a parquet path error) without it."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    p = str(tmp_path / "edges_pre_r12")
    S.neardup_edges_build_artifact(
        emb, p, n_planes=16, bits_per_band=4, min_score=0.3
    )
    stored = sorted(
        tuple(r) for r in S.read_neardup_signatures(spark, p).collect()
    )
    import shutil

    shutil.rmtree(os.path.join(p, "signatures"))
    with pytest.raises(ValueError, match="pre-r12"):
        S.read_neardup_signatures(spark, p)
    fallback = sorted(
        tuple(r)
        for r in S.read_neardup_signatures(spark, p, corpus=emb).collect()
    )
    assert fallback == stored


def test_neardup_build_rejects_ragged_vectors(spark, sf_dir, tmp_path):
    """r12 ADVICE: the build-time dim guard must validate the WHOLE
    corpus (min/max width aggregate), not just the first row — a
    ragged vector deep in the corpus NULL-pads just as silently."""
    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    ragged = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 7, F.slice("embedding", 1, 32)
        ).otherwise(F.col("embedding")),
    )
    with pytest.raises(ValueError, match="widths span"):
        S.neardup_edges_build_artifact(
            ragged, str(tmp_path / "ragged"),
            n_planes=16, bits_per_band=4, min_score=0.3,
        )

def test_corpus_grams_append_is_transactional(spark, sf_dir):
    """r12 verdict Next #1: the tokenized-corpus append must be the
    same transaction the signature index proved out — a crash
    mid-append leaves every relation serving exactly the pre-append
    state (commit marker written LAST; readers partition-prune to
    committed batches), a retry with the same batch_id is
    idempotent, and the merged count relations equal the
    from-scratch build's."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 4 != 3)
    new = docs.filter(F.col("doc_id") % 4 == 3)
    inc = tempfile.mkdtemp(prefix="fcs_test_grams_inc_")
    full = tempfile.mkdtemp(prefix="fcs_test_grams_full_")
    try:
        T.corpus_grams_build_artifact(docs, full)
        T.corpus_grams_build_artifact(old, inc)

        def uni(path):
            return sorted(
                tuple(r)
                for r in T.read_corpus_grams(
                    spark, path, "unigrams"
                ).collect()
            )

        before = uni(inc)
        T.corpus_grams_append(new, inc, "ingest1")
        merged = uni(inc)
        assert merged == uni(full), (
            "append + merge-on-read != from-scratch unigram counts"
        )
        assert merged != before
        # idempotent retry: same batch_id, identical contents
        T.corpus_grams_append(new, inc, "ingest1")
        assert uni(inc) == merged
        # crash simulation: strip the commit marker — every reader
        # must treat the batch as never-happened
        os.unlink(os.path.join(inc, "_batches", "ingest1"))
        assert uni(inc) == before, (
            "uncommitted (crashed) append is visible to readers"
        )
        # retry re-commits
        T.corpus_grams_append(new, inc, "ingest1")
        assert uni(inc) == merged
        # batch ids validate through the shared gate
        with pytest.raises(ValueError, match="invalid batch_id"):
            T.corpus_grams_append(new, inc, "base")
        # doc-keyed relations append: docstats row count is additive
        n_docs = T.read_corpus_grams(spark, inc, "docstats").count()
        assert n_docs == docs.count()
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(full, ignore_errors=True)


def test_corpus_grams_compact_lifecycle(spark, sf_dir):
    """Compaction folds committed batches into one part=base per
    relation, MATERIALIZES the count relations' SUM merge, clears
    the consumed markers, and preserves every relation's logical
    contents; compacting a never-appended artifact is a no-op."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators import text as T
    from flink_connectors_spark.operators.artifacts import (
        committed_parts,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    old = docs.filter(F.col("doc_id") % 4 != 3)
    new = docs.filter(F.col("doc_id") % 4 == 3)
    path = tempfile.mkdtemp(prefix="fcs_test_grams_cpt_")
    try:
        T.corpus_grams_build_artifact(old, path)
        T.corpus_grams_append(new, path, "ingest1")

        def snap(rel):
            return sorted(
                tuple(str(x) for x in r)
                for r in T.read_corpus_grams(spark, path, rel).collect()
            )

        before = {r: snap(r) for r in T._CORPUS_GRAMS_RELATIONS}
        T.corpus_grams_compact(spark, path)
        assert committed_parts(path) == ["base"]
        for rel in T._CORPUS_GRAMS_RELATIONS:
            assert snap(rel) == before[rel], f"{rel} changed"
            parts = sorted(
                d for d in os.listdir(os.path.join(path, rel))
                if d.startswith("part=")
            )
            assert parts == ["part=base"], f"{rel}: {parts}"
        # idempotent: a second compact is a no-op
        T.corpus_grams_compact(spark, path)
        for rel in ("unigrams", "pairs"):
            assert snap(rel) == before[rel]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_corpus_grams_layout_is_versioned(spark, sf_dir, tmp_path):
    """A flat pre-r13 artifact (layout 2) stays READABLE but rejects
    append/compact (a partition directory appended into a flat
    relation would mix partition depths); an unknown future layout
    errors loudly on read too."""
    from flink_connectors_spark.operators import text as T
    from flink_connectors_spark.operators.similarity import (
        _write_artifact_manifest,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    flat = str(tmp_path / "flat_grams")
    _write_artifact_manifest(
        spark, flat,
        {"shingle_n": 3, "gram_n_min": 2, "gram_n_max": 3,
         "pmi_window": 2, "layout": 2},
    )
    with pytest.raises(ValueError, match="does not support append"):
        T.corpus_grams_append(docs, flat, "b1")
    with pytest.raises(ValueError, match="does not support compact"):
        T.corpus_grams_compact(spark, flat)
    unknown = str(tmp_path / "future_grams")
    _write_artifact_manifest(
        spark, unknown,
        {"shingle_n": 3, "gram_n_min": 2, "gram_n_max": 3,
         "pmi_window": 2, "layout": 99},
    )
    with pytest.raises(ValueError, match="unknown layout"):
        T.read_corpus_grams(spark, unknown, "unigrams")

def test_neardup_edges_append_is_transactional(spark, sf_dir):
    """r12 verdict Next #3: the edge-artifact append must be the
    shared transaction — edges from an appended batch equal what a
    from-scratch build over old+new finds, a crash (marker stripped)
    reverts to the pre-append edge set, a retry is idempotent, and
    compaction preserves the logical relations."""
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    old = emb.filter(F.col("vec_id") % 4 != 3)
    new = emb.filter(F.col("vec_id") % 4 == 3)
    inc = tempfile.mkdtemp(prefix="fcs_test_edges_inc_")
    full = tempfile.mkdtemp(prefix="fcs_test_edges_full_")
    try:
        S.neardup_edges_build_artifact(
            emb, full, n_planes=16, bits_per_band=4, min_score=0.3
        )
        S.neardup_edges_build_artifact(
            old, inc, n_planes=16, bits_per_band=4, min_score=0.3
        )

        def edges(path):
            return sorted(
                tuple(r)
                for r in S.read_neardup_edges(
                    spark, path, threshold=0.3
                ).collect()
            )

        before = edges(inc)
        S.neardup_edges_append(new, old, inc, "ingest1")
        merged = edges(inc)
        assert merged == edges(full), (
            "append != from-scratch edge set over old+new"
        )
        assert len(merged) > len(before)
        # signatures relation merged too (rplsh consumers read it)
        n_sig = S.read_neardup_signatures(spark, inc).count()
        assert n_sig == S.read_neardup_signatures(spark, full).count()
        # idempotent retry
        S.neardup_edges_append(new, old, inc, "ingest1")
        assert edges(inc) == merged
        # crash simulation: strip the marker — batch invisible
        os.unlink(os.path.join(inc, "_batches", "ingest1"))
        assert edges(inc) == before
        S.neardup_edges_append(new, old, inc, "ingest1")
        assert edges(inc) == merged
        # compact folds to one base and preserves contents
        S.neardup_edges_compact(spark, inc)
        assert edges(inc) == merged
        parts = sorted(
            d for d in os.listdir(os.path.join(inc, "edges"))
            if d.startswith("part=")
        )
        assert parts == ["part=base"]
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(full, ignore_errors=True)


def test_neardup_edges_append_requires_partitioned_layout(
    spark, sf_dir, tmp_path
):
    """A flat pre-r13 edge artifact stays readable but rejects
    append/compact — a partition dir appended into a flat relation
    would mix partition depths."""
    from flink_connectors_spark.operators.similarity import (
        _write_artifact_manifest,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    flat = str(tmp_path / "flat_edges")
    _write_artifact_manifest(
        spark, flat,
        {"n_planes": 16, "bits_per_band": 4, "min_score_x100": 30,
         "dim": 64},
    )
    with pytest.raises(ValueError, match="does not support append"):
        S.neardup_edges_append(emb, emb, flat, "b1")
    with pytest.raises(ValueError, match="does not support compact"):
        S.neardup_edges_compact(spark, flat)

def test_minhash_pairs_append_is_transactional(spark, sf_dir):
    """r12 verdict Next #3 (text side): the pair-artifact append must
    be the shared transaction — pairs from an appended batch equal
    the from-scratch build over old+new, a crash (marker stripped)
    reverts to the pre-append pair set, a retry is idempotent, and
    compaction preserves the logical relations."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") % 4 != 3)
    new = docs.filter(F.col("doc_id") % 4 == 3)
    inc = tempfile.mkdtemp(prefix="fcs_test_pairs_inc_")
    full = tempfile.mkdtemp(prefix="fcs_test_pairs_full_")
    try:
        D.minhash_pairs_build_artifact(docs, full, min_jac=0.5)
        D.minhash_pairs_build_artifact(old, inc, min_jac=0.5)

        def pairs(path):
            return sorted(
                tuple(r)
                for r in D.read_minhash_pairs(
                    spark, path, threshold=0.5
                ).collect()
            )

        before = pairs(inc)
        D.minhash_pairs_append(new, inc, "ingest1", min_jac=0.5)
        merged = pairs(inc)
        assert merged == pairs(full), (
            "append != from-scratch pair set over old+new"
        )
        assert len(merged) > len(before)
        # idempotent retry
        D.minhash_pairs_append(new, inc, "ingest1", min_jac=0.5)
        assert pairs(inc) == merged
        # crash simulation: strip the marker — batch invisible
        os.unlink(os.path.join(inc, "_batches", "ingest1"))
        assert pairs(inc) == before
        D.minhash_pairs_append(new, inc, "ingest1", min_jac=0.5)
        assert pairs(inc) == merged
        # compact folds to one base per relation, contents preserved
        D.minhash_pairs_compact(spark, inc)
        assert pairs(inc) == merged
        for rel in ("pairs", "sigs"):
            parts = sorted(
                d for d in os.listdir(os.path.join(inc, rel))
                if d.startswith("part=")
            )
            assert parts == ["part=base"], f"{rel}: {parts}"
        # floor mismatch between build and append errors
        with pytest.raises(ValueError, match="params mismatch"):
            D.minhash_pairs_append(new, inc, "b2", min_jac=0.0)
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(full, ignore_errors=True)

def test_pointer_backend_compact_lifecycle(spark, sf_dir, monkeypatch):
    """r12 verdict Next #4: the compaction swap is a pluggable commit
    seam; with FCS_COMMIT_BACKEND=pointer the whole lifecycle (build
    -> append -> compact -> append -> compact) must hold with ZERO
    directory renames — generations committed by an atomic
    pointer-file replace (the object-store PUT analogue). Probed
    contents must match the rename backend's at every step."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build_artifact,
        minhash_index_compact,
        minhash_lsh_pairs_vs_index,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    probe = docs.filter(F.col("doc_id") % 3 == 2)
    path = tempfile.mkdtemp(prefix="fcs_test_ptr_index_")
    monkeypatch.setenv(A.COMMIT_BACKEND_ENV, "pointer")
    try:
        minhash_index_build_artifact(
            docs.filter(F.col("doc_id") % 3 == 0), path
        )

        def pairs():
            return sorted(
                map(
                    tuple,
                    minhash_lsh_pairs_vs_index(
                        probe, path, threshold=0.5
                    ).collect(),
                )
            )

        minhash_index_append(
            docs.filter(F.col("doc_id") % 6 == 1), path, "b1"
        )
        with_b1 = pairs()
        minhash_index_compact(spark, path)
        assert pairs() == with_b1, "pointer compact changed contents"
        # the live relation is a generation dir named by the pointer;
        # the legacy plain dir is GC'd; no *_precompact ever existed
        for rel in ("bands", "shingles"):
            gen = A._read_pointer(path, rel)
            assert gen and gen.startswith(f"{rel}__g")
            assert os.path.isdir(os.path.join(path, gen))
            assert not os.path.isdir(os.path.join(path, rel))
            assert not os.path.isdir(
                os.path.join(path, rel + "_precompact")
            )
            parts = sorted(
                d for d in os.listdir(os.path.join(path, gen))
                if d.startswith("part=")
            )
            assert parts == ["part=base"]
        # append AFTER the pointer swap lands in the live generation
        minhash_index_append(
            docs.filter(F.col("doc_id") % 6 == 4), path, "b2"
        )
        with_b2 = pairs()
        assert len(with_b2) > len(with_b1)
        gen = A._read_pointer(path, "bands")
        assert os.path.isdir(os.path.join(path, gen, "part=b2"))
        # second compact: generation increments, contents preserved
        minhash_index_compact(spark, path)
        assert pairs() == with_b2
        assert A._read_pointer(path, "bands").endswith("__g2")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_pointer_backend_crash_windows(spark, sf_dir, monkeypatch):
    """Pointer-backend crash windows: (a) a crash AFTER the pointer
    replace but BEFORE marker clearing serves the identical logical
    relation (stale markers prune to zero partitions — their rows
    are already in the new base) and a compact retry converges; (b)
    an orphan generation from a crash BEFORE the pointer replace is
    invisible to readers and garbage-collected by the next
    compact."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents").limit(200)
    old = docs.filter(F.col("doc_id") % 4 != 3)
    new = docs.filter(F.col("doc_id") % 4 == 3)
    path = tempfile.mkdtemp(prefix="fcs_test_ptr_crash_")
    monkeypatch.setenv(A.COMMIT_BACKEND_ENV, "pointer")
    try:
        T.corpus_grams_build_artifact(old, path)
        T.corpus_grams_append(new, path, "ingest1")

        def uni():
            return sorted(
                tuple(r)
                for r in T.read_corpus_grams(
                    spark, path, "unigrams"
                ).collect()
            )

        merged = uni()
        T.corpus_grams_compact(spark, path)
        assert uni() == merged
        # (a) simulate crash-after-pointer-before-marker-clear:
        # recreate a stale marker pointing at a batch absent from
        # the live generation — readers must serve identical rows
        open(os.path.join(path, "_batches", "ingest1"), "w").close()
        assert uni() == merged, "stale marker changed the read"
        # retry converges: clears the marker, bumps the generation
        T.corpus_grams_compact(spark, path)
        assert uni() == merged
        assert os.listdir(os.path.join(path, "_batches")) == []
        # (b) orphan generation never pointed at: invisible, GC'd
        orphan = os.path.join(path, "unigrams__g99")
        os.makedirs(orphan)
        assert uni() == merged
        open(os.path.join(path, "_batches", "x1"), "w").close()
        gen_dir = os.path.join(
            path, A._read_pointer(path, "unigrams")
        )
        # give the fake batch a real (empty-of-rows) partition so the
        # compact rewrite has a committed view to fold
        T.corpus_grams_compact(spark, path)
        assert not os.path.isdir(orphan), "orphan generation not GC'd"
        assert uni() == merged
    finally:
        shutil.rmtree(path, ignore_errors=True)

def test_backend_flip_pointer_to_rename_and_signature_resolution(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r13 self-review: (a) an edge artifact compacted under the
    POINTER backend must still serve its signatures relation (the
    plain dir is GC'd — the reader's existence check must resolve
    the pointer, not fall back to the pre-r12 path); (b) compacting
    the same artifact again under the default RENAME backend must
    retire the stale pointer + generation dir, or they would shadow
    the freshly renamed relation."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    old = emb.filter(F.col("vec_id") % 4 != 3)
    new = emb.filter(F.col("vec_id") % 4 == 3)
    path = str(tmp_path / "edges_flip")
    S.neardup_edges_build_artifact(
        old, path, n_planes=16, bits_per_band=4, min_score=0.3
    )
    S.neardup_edges_append(new, old, path, "b1")

    def sig_rows():
        return S.read_neardup_signatures(spark, path).count()

    def edges():
        return sorted(
            tuple(r)
            for r in S.read_neardup_edges(
                spark, path, threshold=0.3
            ).collect()
        )

    n_sig, e = sig_rows(), edges()
    monkeypatch.setenv(A.COMMIT_BACKEND_ENV, "pointer")
    S.neardup_edges_compact(spark, path)
    # (a) plain dir gone, pointer live — reader must NOT take the
    # pre-r12 fallback (which would raise without corpus=)
    assert not os.path.isdir(os.path.join(path, "signatures"))
    assert sig_rows() == n_sig and edges() == e
    # (b) flip back to rename: append a batch of genuinely NEW ids,
    # then compact again under the default backend
    monkeypatch.setenv(A.COMMIT_BACKEND_ENV, "rename")
    indexed = emb.select("vec_id", "embedding")
    batch2 = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") >= 200)
        .limit(50)
    )
    S.neardup_edges_append(batch2, indexed, path, "b2")
    S.neardup_edges_compact(spark, path)
    assert A._read_pointer(path, "edges") is None, "stale pointer"
    assert A._read_pointer(path, "signatures") is None
    assert os.path.isdir(os.path.join(path, "edges"))
    assert not any(
        d.startswith("edges__g") for d in os.listdir(path)
    ), "stale generation dir survived the rename compact"

def test_containment_pairs_append_is_transactional(spark, sf_dir):
    """r13: the containment-statistics append (the last rebuild-only
    pair family) must match the shared transaction contract — pairs
    from an appended batch equal the from-scratch build over
    old+new, a crash reverts, a retry is idempotent, compaction
    preserves."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    old = docs.filter(F.col("doc_id") % 4 != 3)
    new = docs.filter(F.col("doc_id") % 4 == 3)
    inc = tempfile.mkdtemp(prefix="fcs_test_contain_inc_")
    full = tempfile.mkdtemp(prefix="fcs_test_contain_full_")
    bc = ["lang", "source"]
    try:
        D.containment_pairs_build_artifact(
            docs, full, block_cols=bc, min_score=0.5
        )
        D.containment_pairs_build_artifact(
            old, inc, block_cols=bc, min_score=0.5
        )

        def pairs(path):
            return sorted(
                tuple(r)
                for r in D.read_containment_pairs(
                    spark, path, threshold=0.5
                ).collect()
            )

        before = pairs(inc)
        D.containment_pairs_append(
            new, inc, "ingest1", block_cols=bc, min_score=0.5
        )
        merged = pairs(inc)
        assert merged == pairs(full), (
            "append != from-scratch containment stats over old+new"
        )
        # idempotent retry
        D.containment_pairs_append(
            new, inc, "ingest1", block_cols=bc, min_score=0.5
        )
        assert pairs(inc) == merged
        # crash simulation
        os.unlink(os.path.join(inc, "_batches", "ingest1"))
        assert pairs(inc) == before
        D.containment_pairs_append(
            new, inc, "ingest1", block_cols=bc, min_score=0.5
        )
        assert pairs(inc) == merged
        # compact preserves
        D.containment_pairs_compact(spark, inc)
        assert pairs(inc) == merged
        for rel in ("pairs", "shingles"):
            parts = sorted(
                d for d in os.listdir(os.path.join(inc, rel))
                if d.startswith("part=")
            )
            assert parts == ["part=base"], f"{rel}: {parts}"
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(full, ignore_errors=True)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=14,
    ),
    splits=st.lists(st.integers(0, 2), min_size=14, max_size=14),
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grams_partial_sum_merge_is_split_invariant(spark, docs, splits):
    """Property (r13 merge algebra): for ANY corpus and ANY
    partition of it into base + up to two ingest batches, the
    tokenized-corpus artifact's merged count relations (unigrams,
    pairs) and doc-keyed relations (tokens) equal the from-scratch
    build's — the per-doc-fold additivity the merge-on-read SUM
    relies on, checked beyond the fixed 3/4-1/4 split the lifecycle
    tests use. Tiny 4-word alphabet so counts collide across docs
    and batches."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators import text as T

    rows = [
        (i, "en", "src", " ".join(words))
        for i, words in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    groups = {g: [] for g in (0, 1, 2)}
    for i in range(len(rows)):
        groups[splits[i]].append(i)
    inc = tempfile.mkdtemp(prefix="fcs_prop_grams_inc_")
    full = tempfile.mkdtemp(prefix="fcs_prop_grams_full_")
    try:
        T.corpus_grams_build_artifact(df, full)
        base_ids = groups[0]
        T.corpus_grams_build_artifact(
            df.filter(F.col("doc_id").isin(base_ids or [-1])), inc
        )
        for g in (1, 2):
            if groups[g]:
                T.corpus_grams_append(
                    df.filter(F.col("doc_id").isin(groups[g])),
                    inc, f"b{g}",
                )
        for rel in ("unigrams", "pairs", "tokens"):
            got = sorted(
                tuple(r)
                for r in T.read_corpus_grams(spark, inc, rel).collect()
            )
            want = sorted(
                tuple(r)
                for r in T.read_corpus_grams(spark, full, rel).collect()
            )
            assert got == want, f"{rel}: split-variant merge"
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(full, ignore_errors=True)


@pytest.mark.parametrize("backend", ["rename", "pointer"])
def test_compaction_ledger_blocks_replayed_batch(
    spark, tmp_path, monkeypatch, backend
):
    """r13 ADVICE (medium): ``compact_relations`` clears the live
    batch markers, so without a persistent record a delayed/retried
    append of an already-compacted batch_id would pass the marker
    check as fresh and re-commit — silently doubling every row of
    the batch. The ``_batches_done`` ledger must keep the batch
    reading as committed across compaction, under BOTH commit
    backends."""
    monkeypatch.setenv(A.COMMIT_BACKEND_ENV, backend)
    path = str(tmp_path / "art")
    os.makedirs(path)
    spark.range(5).withColumnRenamed("id", "k").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "rel", "part=base"))
    with A.transactional_append(path, "b1", ("rel",)) as fresh:
        assert fresh
        spark.range(5, 8).withColumnRenamed("id", "k").write.mode(
            "overwrite"
        ).parquet(A.append_part_dir(path, "rel", "b1"))
    assert A.read_committed_relation(spark, path, "rel").count() == 8
    A.compact_relations(spark, path, ("rel",))
    assert A.read_committed_relation(spark, path, "rel").count() == 8
    assert A.batch_already_consumed(path, "b1")
    # the delayed retry: must read as already committed, not fresh
    replayed = None
    with A.transactional_append(path, "b1", ("rel",)) as fresh:
        replayed = fresh
        if fresh:  # would double the rows — reproduce the hazard
            spark.range(5, 8).withColumnRenamed("id", "k").write.mode(
                "overwrite"
            ).parquet(A.append_part_dir(path, "rel", "b1"))
    assert replayed is False, (
        "compacted batch replayed as fresh — its rows would re-commit"
    )
    assert A.read_committed_relation(spark, path, "rel").count() == 8
    # a genuinely NEW batch still appends normally
    with A.transactional_append(path, "b2", ("rel",)) as fresh:
        assert fresh
        spark.range(8, 10).withColumnRenamed("id", "k").write.mode(
            "overwrite"
        ).parquet(A.append_part_dir(path, "rel", "b2"))
    assert A.read_committed_relation(spark, path, "rel").count() == 10
    # and a second compact keeps both ledger entries
    A.compact_relations(spark, path, ("rel",))
    assert A.batch_already_consumed(path, "b1")
    assert A.batch_already_consumed(path, "b2")
    assert A.read_committed_relation(spark, path, "rel").count() == 10


def test_stale_aside_litter_swept_on_claim_acquire(tmp_path):
    """r13 ADVICE (low): ``{path}.building.stale.*`` aside dirs from
    a failed takeover restore were never garbage-collected. The next
    successful claimant sweeps asides older than the stale horizon;
    a fresh aside (inside the restore-failure window) survives."""
    path = str(tmp_path / "art")
    old_aside = path + ".building.stale.111.222"
    fresh_aside = path + ".building.stale.333.444"
    os.makedirs(old_aside)
    os.makedirs(fresh_aside)
    past = time.time() - A.STALE_CLAIM_SECONDS - 60.0
    os.utime(old_aside, (past, past))
    assert A._acquire_build_claim(path, until_marker=False)
    try:
        assert not os.path.exists(old_aside), (
            "stale aside litter survived claim acquisition"
        )
        assert os.path.exists(fresh_aside), (
            "fresh aside (possible displaced live claim) was deleted"
        )
    finally:
        A._release_build_claim(path)
        import shutil

        shutil.rmtree(fresh_aside, ignore_errors=True)


def test_pointer_compact_gc_stranded_precompact(
    spark, tmp_path, monkeypatch
):
    """r13 ADVICE (low): a rename→pointer backend flip can strand a
    ``*_precompact`` fallback dir. Once a pointer-backend compaction
    commits, the fallback is unreachable (readers resolve the
    pointer) and must be GC'd with the stale generations."""
    monkeypatch.setenv(A.COMMIT_BACKEND_ENV, "pointer")
    path = str(tmp_path / "art")
    os.makedirs(path)
    spark.range(4).withColumnRenamed("id", "k").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "rel", "part=base"))
    # the stranded fallback a rename-era compact left behind
    spark.range(4).withColumnRenamed("id", "k").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "rel_precompact", "part=base"))
    with A.transactional_append(path, "b1", ("rel",)) as fresh:
        assert fresh
        spark.range(4, 6).withColumnRenamed("id", "k").write.mode(
            "overwrite"
        ).parquet(A.append_part_dir(path, "rel", "b1"))
    A.compact_relations(spark, path, ("rel",))
    assert not os.path.isdir(os.path.join(path, "rel_precompact")), (
        "backend-flip precompact fallback left as litter"
    )
    assert A.read_committed_relation(spark, path, "rel").count() == 6


def test_neardup_edges_append_tolerates_current_corpus(spark, sf_dir):
    """r13 ADVICE (low): the append contract says ``corpus`` = the
    PREVIOUSLY indexed vectors, but a caller passing the CURRENT
    corpus (batch rows included) would duplicate ids in the rescore
    union and write duplicate edge rows. The defensive anti-join
    must make that call shape produce exactly the rebuild's edges."""
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    old = emb.filter(F.col("vec_id") % 4 != 3)
    new = emb.filter(F.col("vec_id") % 4 == 3)
    inc = tempfile.mkdtemp(prefix="fcs_test_edges_cur_")
    full = tempfile.mkdtemp(prefix="fcs_test_edges_curf_")
    try:
        S.neardup_edges_build_artifact(
            emb, full, n_planes=16, bits_per_band=4, min_score=0.3
        )
        S.neardup_edges_build_artifact(
            old, inc, n_planes=16, bits_per_band=4, min_score=0.3
        )
        # WRONG-but-common call shape: corpus includes the batch
        S.neardup_edges_append(new, emb, inc, "ingest1")

        def edges(path):
            return sorted(
                tuple(r)
                for r in S.read_neardup_edges(
                    spark, path, threshold=0.3
                ).collect()
            )

        got = edges(inc)
        assert got == edges(full), (
            "current-corpus call shape corrupted the edge set"
        )
        assert len(got) == len(set(got)), "duplicate edge rows written"
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(full, ignore_errors=True)


# ---------------------------------------------------------------------------
# r14 verdict Next #4: the full-family lifecycle sweep under BOTH
# commit backends. Every family that adopted the shared transactional
# protocol runs its complete build -> append -> compact -> probe
# lifecycle under the default rename seam AND the rename-free pointer
# seam, pinned so both stay green as verbs accrete. The probe is
# compared at three points: after the append (uncompacted,
# merge-on-read path), after the compact (folded base), and against a
# from-scratch single build over the full input — so each (family,
# backend) cell re-proves append == compact == rebuild.
# ---------------------------------------------------------------------------

_SWEEP_FAMILIES = (
    "corpus_grams",
    "minhash_pairs",
    "minhash_index",
    "containment_pairs",
    "neardup_edges",
    "countmin",
    "bloom_words",
    "hll_registers",
)


def _sweep_driver(spark, sf_dir, family):
    """(relations, build(df, path), append(df, path, bid),
    compact(path), probe(path) -> sorted rows, (old_df, new_df,
    all_df)) for one lifecycle family."""
    from flink_connectors_spark.operators import dedup as D
    from flink_connectors_spark.operators import scale as SC
    from flink_connectors_spark.operators import text as T

    def rows(df):
        return sorted(
            map(tuple, df.collect()),
            key=lambda r: tuple(str(x) for x in r),
        )

    if family in ("corpus_grams",):
        docs = load_table(spark, sf_dir, "documents")
        old = docs.filter(F.col("doc_id") % 4 != 3)
        new = docs.filter(F.col("doc_id") % 4 == 3)
        rels = T._CORPUS_GRAMS_RELATIONS

        def probe(path):
            out = []
            for rel in rels:
                out.append(rows(T.read_corpus_grams(spark, path, rel)))
            return out

        return (
            rels,
            lambda df, p: T.corpus_grams_build_artifact(df, p),
            lambda df, p, b: T.corpus_grams_append(df, p, b),
            lambda p: T.corpus_grams_compact(spark, p),
            probe,
            (old, new, docs),
        )
    if family == "minhash_pairs":
        docs = load_table(spark, sf_dir, "documents")
        old = docs.filter(F.col("doc_id") % 4 != 3)
        new = docs.filter(F.col("doc_id") % 4 == 3)
        return (
            D._PAIRS_RELATIONS,
            lambda df, p: D.minhash_pairs_build_artifact(df, p),
            lambda df, p, b: D.minhash_pairs_append(df, p, b),
            lambda p: D.minhash_pairs_compact(spark, p),
            lambda p: rows(D.read_minhash_pairs(spark, p, threshold=0.5)),
            (old, new, docs),
        )
    if family == "minhash_index":
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        old = docs.filter(F.col("doc_id") % 4 != 3)
        new = docs.filter(F.col("doc_id") % 4 == 3)
        pr = docs.filter(F.col("doc_id") % 5 == 2)
        return (
            ("bands", "shingles"),
            lambda df, p: D.minhash_index_build_artifact(df, p),
            lambda df, p, b: D.minhash_index_append(df, p, b),
            lambda p: D.minhash_index_compact(spark, p),
            lambda p: rows(
                D.minhash_lsh_pairs_vs_index(pr, p, threshold=0.5)
            ),
            (old, new, docs),
        )
    if family == "containment_pairs":
        docs = load_table(spark, sf_dir, "documents")
        old = docs.filter(F.col("doc_id") % 4 != 3)
        new = docs.filter(F.col("doc_id") % 4 == 3)
        bc = ["lang", "source"]
        return (
            D._CONTAIN_RELATIONS,
            lambda df, p: D.containment_pairs_build_artifact(df, p, bc),
            lambda df, p, b: D.containment_pairs_append(df, p, b, bc),
            lambda p: D.containment_pairs_compact(spark, p),
            lambda p: rows(
                D.read_containment_pairs(spark, p, threshold=0.5)
            ),
            (old, new, docs),
        )
    if family == "neardup_edges":
        emb = load_table(spark, sf_dir, "embeddings")
        old = emb.filter(F.col("vec_id") % 4 != 3)
        new = emb.filter(F.col("vec_id") % 4 == 3)
        return (
            S._EDGES_RELATIONS,
            lambda df, p: S.neardup_edges_build_artifact(df, p),
            # the corpus side is the previously indexed vectors
            lambda df, p, b: S.neardup_edges_append(df, old, p, b),
            lambda p: S.neardup_edges_compact(spark, p),
            lambda p: rows(S.read_neardup_edges(spark, p, threshold=0.3)),
            (old, new, emb),
        )
    if family == "countmin":
        li = load_table(spark, sf_dir, "lineitem")
        old = li.filter(F.col("l_orderkey") % 4 != 3)
        new = li.filter(F.col("l_orderkey") % 4 == 3)
        return (
            SC._CMS_ART_RELATIONS,
            lambda df, p: SC.countmin_build_artifact(df, p, "l_partkey"),
            lambda df, p, b: SC.countmin_append(df, p, b, "l_partkey"),
            lambda p: SC.countmin_compact(spark, p),
            lambda p: rows(SC.read_countmin_counters(spark, p)),
            (old, new, li),
        )
    if family == "bloom_words":
        docs = load_table(spark, sf_dir, "documents")
        fps = docs.select(F.md5(F.col("text")).alias("fp"))
        # row-split batches whose fingerprint SETS may overlap —
        # OR is idempotent, so the family must absorb that
        old = docs.filter(F.col("doc_id") % 4 != 3).select(
            F.md5(F.col("text")).alias("fp")
        )
        new = docs.filter(F.col("doc_id") % 4 == 3).select(
            F.md5(F.col("text")).alias("fp")
        )
        m = SC.auto_bloom_bits(fps.count())
        return (
            SC._BLOOM_ART_RELATIONS,
            lambda df, p: SC.bloom_words_build_artifact(df, p, m),
            lambda df, p, b: SC.bloom_words_append(df, p, b),
            lambda p: SC.bloom_words_compact(spark, p),
            lambda p: rows(SC.read_bloom_bitmap(spark, p)),
            (old, new, fps),
        )
    assert family == "hll_registers"
    ev = load_table(spark, sf_dir, "events")
    old = ev.filter(F.col("user_id") % 4 != 3)
    new = ev.filter(F.col("user_id") % 4 == 3)
    return (
        SC._HLL_ART_RELATIONS,
        lambda df, p: SC.hll_build_artifact(df, p, "user_id"),
        lambda df, p, b: SC.hll_append(df, p, b, "user_id"),
        lambda p: SC.hll_compact(spark, p),
        lambda p: rows(SC.read_hll_registers(spark, p)),
        (old, new, ev),
    )


@pytest.mark.parametrize("backend", ["rename", "pointer"])
@pytest.mark.parametrize("family", _SWEEP_FAMILIES)
def test_lifecycle_sweep_both_commit_backends(
    spark, sf_dir, monkeypatch, family, backend
):
    import shutil
    import tempfile

    monkeypatch.setenv(A.COMMIT_BACKEND_ENV, backend)
    rels, build, append, compact, probe, (old, new, full_df) = (
        _sweep_driver(spark, sf_dir, family)
    )
    inc = tempfile.mkdtemp(prefix=f"fcs_sweep_{family}_{backend}_i_")
    ref = tempfile.mkdtemp(prefix=f"fcs_sweep_{family}_{backend}_r_")
    try:
        build(old, inc)
        append(new, inc, "b1")
        appended = probe(inc)
        compact(inc)
        assert probe(inc) == appended, (
            f"{family}/{backend}: compaction changed the probed "
            "contents"
        )
        if backend == "pointer":
            # rename-free structural pins: every relation serves
            # from a pointer-committed generation; the plain dir and
            # the rename seam's *_precompact fallback never exist
            for rel in rels:
                gen = A._read_pointer(inc, rel)
                assert gen and gen.startswith(f"{rel}__g"), (
                    f"{family}: relation {rel} not pointer-committed"
                )
                assert os.path.isdir(os.path.join(inc, gen))
                assert not os.path.isdir(os.path.join(inc, rel))
                assert not os.path.isdir(
                    os.path.join(inc, rel + "_precompact")
                )
        build(full_df, ref)
        assert probe(ref) == appended, (
            f"{family}/{backend}: build-on-old + append-new + "
            "compact != from-scratch build"
        )
    finally:
        shutil.rmtree(inc, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)
