"""Smoke the composed curation example end to end at sf0.001."""

from __future__ import annotations

import sys


def test_curate_corpus_end_to_end(spark, sf_dir, tmp_path):
    sys.path.insert(0, "examples")
    from curate_corpus import curate

    out = str(tmp_path / "curated")
    stats = curate(spark, sf_dir, out)
    assert stats["input_docs"] > 0
    assert 0 < stats["after_quality_gate"] <= stats["input_docs"]
    assert 0 < stats["after_dedup"] <= stats["after_quality_gate"]
    assert stats["chunks_written"] > 0
    back = spark.read.parquet(out)
    assert back.count() == stats["chunks_written"]
    assert {"doc_id", "chunk_id", "n_tokens", "chunk_text", "split"} <= set(
        back.columns
    )
    # every chunk carries a frozen split label
    splits = {r["split"] for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_nightly_ingest_loop_releases_caches(spark, sf_dir):
    """The advertised nightly-ingest loop must exercise the cache
    lifetime contract: each night's LSH shingle caches actually held
    memory at materialization (non-vacuous) and ZERO remain cached
    after the loop body released them — a naive loop leaks one
    corpus-sized cache per night."""
    sys.path.insert(0, "examples")
    from nightly_ingest import nightly_ingest

    stats = nightly_ingest(spark, sf_dir, n_nights=3)
    assert stats["corpus_final"] > 0
    assert len(stats["kept_per_night"]) == 3
    assert all(k >= 0 for k in stats["kept_per_night"])
    assert stats["caches_seen"] > 0, "check is vacuous — nothing was cached"
    assert stats["leaked_caches"] == 0, "LSH caches leaked past release"
    # r11: the PRODUCTION variant — probe a persisted signature
    # index, append accepted batches (O(batch) index maintenance) —
    # must keep night-for-night results identical to the live loop
    from nightly_ingest import nightly_ingest_indexed

    indexed = nightly_ingest_indexed(spark, sf_dir, n_nights=3)
    assert indexed["kept_per_night"] == stats["kept_per_night"], (
        "indexed nightly loop diverged from the live loop"
    )


def test_nightly_ingest_indexed_compacts_and_reruns_idempotently(
    spark, sf_dir, tmp_path
):
    """r12 verdict Next #6: the indexed nightly loop must exercise
    BOTH maintenance verbs — it compacts mid-loop (asserting the
    probed pair set is identical across the fold, inside the
    example) and, over a DURABLE index root, a full re-run of the
    same nights is safe: previously ingested docs near-dup
    themselves so nothing new survives the cut, the per-night
    appends are idempotent retries, and the index does not grow."""
    sys.path.insert(0, "examples")
    from nightly_ingest import nightly_ingest_indexed

    root = str(tmp_path / "nightly_idx")
    first = nightly_ingest_indexed(spark, sf_dir, n_nights=3,
                                   index_dir=root)
    assert first["nightly_index_rows"] > 0
    second = nightly_ingest_indexed(spark, sf_dir, n_nights=3,
                                    index_dir=root)
    # idempotent appends: the committed band-row count is unchanged
    assert second["nightly_index_rows"] == first["nightly_index_rows"]
    # re-ingesting an already-indexed night keeps (at most) only the
    # docs the index cannot see (shingle-less shorts) — never more
    # than the first run kept
    assert all(
        b <= a
        for a, b in zip(
            first["kept_per_night"], second["kept_per_night"]
        )
    )


def test_index_embeddings_lifecycle(spark, sf_dir):
    """The composed vector-index example: both ANN paths produce
    bounded recall against the exact baseline and the anisotropy
    report is a sane share."""
    sys.path.insert(0, "examples")
    from index_embeddings import index_and_audit

    stats = index_and_audit(spark, sf_dir, n_queries=10)
    assert stats["corpus_size"] > 0
    assert 0.0 <= stats["dominant_direction_share"] <= 1.0
    assert 0.0 <= stats["recall_ivf_at_5"] <= 1.0
    assert 0.0 <= stats["recall_pq_at_5"] <= 1.0
    # the cluster-probed path must beat random guessing by far
    assert stats["recall_ivf_at_5"] >= 0.2
    # drift is a finite non-negative distance in embedding units
    assert stats["max_centroid_drift"] >= 0.0


def test_nightly_sketch_maintenance_invariants(spark, sf_dir):
    """r14: the sketch-monoid leg of the nightly loop — the durable
    Bloom word-table guard in its production role. Pins the two
    invariants the family sells: ZERO false negatives across every
    night (a crashed/partial append could otherwise silently keep a
    true duplicate) and maintained-bitmap == from-scratch-rebuild
    over the final fingerprint set (merge == rebuild in the loop
    shape, not just the unit test)."""
    sys.path.insert(0, "examples")
    from nightly_ingest import nightly_sketch_maintenance

    sk = nightly_sketch_maintenance(spark, sf_dir, n_nights=3)
    assert len(sk["nights"]) == 3
    for n in sk["nights"]:
        assert n["n_kept"] == n["n_batch"] - n["n_true_dup"]
        assert n["n_true_dup"] <= n["n_bloom_pos"], (
            "a true duplicate was bloom-negative"
        )
    assert sk["false_negatives"] == 0
    assert sk["final_bitmap_equals_rebuild"]
