#!/usr/bin/env python
"""Nightly incremental-ingest dedup loop — the production shape
`minhash_lsh_pairs_bipartite` is built for, demonstrating the CACHE
LIFETIME contract end to end.

Each night a new batch of documents arrives. The loop:

1. builds the bipartite LSH plan (batch bands vs the standing corpus's
   band index — cost ~ batch x occupancy, never corpus^2),
2. drops batch docs that near-dup the corpus OR an earlier-kept doc of
   the same batch (exact self-dedup within the batch),
3. MATERIALIZES the survivors (`localCheckpoint` cuts the lineage so
   nothing downstream re-reads the LSH plan),
4. releases the plan's persisted shingle tables with
   `unpersist_inputs` — the step a naive loop forgets, leaking one
   corpus-sized cache per night into executor block managers until
   eviction noise replaces real working-set caching,
5. folds the survivors into the standing corpus for the next night.

At 100 TB the corpus band table would be a persistent on-disk index
(bucketed parquet) rather than a per-night recompute; the loop
structure and the release contract are identical.

Run:  python examples/nightly_ingest.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_connectors_spark.operators.dedup import (
    minhash_lsh_pairs_bipartite,
    unpersist_inputs,
)
from flink_connectors_spark.session import build_session, load_table, spread


def nightly_ingest(spark, sf_dir: str, n_nights: int = 3) -> dict:
    """Run the loop; returns per-night stats plus the cache-leak
    audit the test asserts on: ``caches_seen`` (tracked persisted
    frames that actually held memory blocks at materialization —
    proves the check is non-vacuous) and ``leaked_caches`` (tracked
    frames STILL holding blocks after their night's release — the
    contract says always 0)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    # day-0 corpus plus n_nights arriving batches, split by doc_id
    corpus = docs.filter(F.col("doc_id") % (n_nights + 1) == 0)
    corpus = corpus.localCheckpoint(eager=True)

    kept_per_night: list[int] = []
    caches_seen = 0
    leaked: list[object] = []
    for night in range(1, n_nights + 1):
        batch = docs.filter(F.col("doc_id") % (n_nights + 1) == night)
        pairs = minhash_lsh_pairs_bipartite(batch, corpus, threshold=0.5)
        dup_ids = pairs.select(F.col("new_id").alias("doc_id")).distinct()
        survivors = (
            batch.join(dup_ids, "doc_id", "left_anti")
            # batch-internal exact dedup: first id per fingerprint wins
            .withColumn("__fp__", F.md5("text"))
            .withColumn(
                "__rn__",
                F.row_number().over(
                    Window.partitionBy("__fp__").orderBy("doc_id")
                ),
            )
            .filter("__rn__ = 1")
            .drop("__fp__", "__rn__")
        )
        # (3) materialize BEFORE releasing: the checkpoint is the last
        # reader of the LSH caches
        survivors = survivors.localCheckpoint(eager=True)
        cached = getattr(pairs, "_fcs_cached_inputs", [])
        caches_seen += sum(1 for df in cached if df.storageLevel.useMemory)
        # (4) the lifetime contract: caller releases after materialization
        unpersist_inputs(pairs, blocking=True)
        leaked.extend(df for df in cached if df.storageLevel.useMemory)
        # (5) fold into the standing corpus
        corpus = corpus.unionByName(survivors).localCheckpoint(eager=True)
        kept_per_night.append(survivors.count())

    return {
        "corpus_final": corpus.count(),
        "kept_per_night": kept_per_night,
        "caches_seen": caches_seen,
        "leaked_caches": len(leaked),
    }


def nightly_ingest_indexed(
    spark, sf_dir: str, n_nights: int = 3, index_dir: str | None = None
) -> dict:
    """The r11 PRODUCTION variant of the loop: the standing corpus is
    a PERSISTED signature index (bands + shingles on disk) instead of
    a checkpointed DataFrame. Each night: probe the index with the
    live batch side only (O(batch) compute), cut, then APPEND the
    accepted batch's bands/shingles to the index — O(batch) storage,
    no rewrite. Night-for-night results are identical to the live
    loop (`nightly_ingest`), which the example asserts.

    r13 — the FULL maintenance lifecycle the verbs exist for:

    - mid-loop COMPACTION (`minhash_index_compact`) folds the
      accumulated night partitions into one base, with the example
      asserting the probe results are identical across the fold and
      that later nights append cleanly onto the compacted index;
    - a DURABLE index root (``index_dir``): point two runs at the
      same directory and the second run is a safe re-run of the same
      nights — probes recognize previously ingested docs (they
      near-dup themselves at Jaccard 1.0), and the per-night appends
      are idempotent retries (the night label is the idempotency
      key), so the index does not grow. ``nightly_index_rows``
      reports the committed band-row count the caller can assert on.
    """
    import shutil
    import tempfile

    from flink_connectors_spark.operators.dedup import (
        _read_index_relation,
        minhash_index_append,
        minhash_index_build_artifact,
        minhash_index_compact,
        minhash_lsh_pairs_vs_index,
    )

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    own = index_dir is None
    path = index_dir or tempfile.mkdtemp(prefix="fcs_nightly_index_")
    try:
        if not os.path.isdir(os.path.join(path, "bands")) and not any(
            d.startswith("bands__g") for d in (
                os.listdir(path) if os.path.isdir(path) else []
            )
        ):
            # day-0 build; a re-run over a durable root reuses it
            minhash_index_build_artifact(
                docs.filter(F.col("doc_id") % (n_nights + 1) == 0), path
            )
        kept_per_night: list[int] = []
        for night in range(1, n_nights + 1):
            batch = docs.filter(
                F.col("doc_id") % (n_nights + 1) == night
            )
            pairs = minhash_lsh_pairs_vs_index(batch, path, threshold=0.5)
            dup_ids = pairs.select(
                F.col("new_id").alias("doc_id")
            ).distinct()
            survivors = (
                batch.join(dup_ids, "doc_id", "left_anti")
                .withColumn("__fp__", F.md5("text"))
                .withColumn(
                    "__rn__",
                    F.row_number().over(
                        Window.partitionBy("__fp__").orderBy("doc_id")
                    ),
                )
                .filter("__rn__ = 1")
                .drop("__fp__", "__rn__")
            ).localCheckpoint(eager=True)
            unpersist_inputs(pairs, blocking=True)
            kept_per_night.append(survivors.count())
            # index maintenance: O(batch) transactional append —
            # the night label is the idempotency key a retry reuses
            minhash_index_append(survivors, path, f"night{night}")
            if night == (n_nights + 1) // 2:
                # mid-loop maintenance: fold the accumulated night
                # partitions into one base. The probe set must be
                # IDENTICAL across the fold — compaction is a
                # storage-level rewrite, never a semantic change —
                # and the remaining nights append onto the
                # compacted index.
                probe = docs.filter(
                    F.col("doc_id") % (n_nights + 1) == n_nights
                )
                before = sorted(
                    map(
                        tuple,
                        minhash_lsh_pairs_vs_index(
                            probe, path, threshold=0.5
                        ).collect(),
                    )
                )
                minhash_index_compact(spark, path)
                after = sorted(
                    map(
                        tuple,
                        minhash_lsh_pairs_vs_index(
                            probe, path, threshold=0.5
                        ).collect(),
                    )
                )
                assert after == before, (
                    "compaction changed the probed pair set"
                )
        return {
            "kept_per_night": kept_per_night,
            "nightly_index_rows": _read_index_relation(
                spark, path, "bands"
            ).count(),
        }
    finally:
        if own:
            shutil.rmtree(path, ignore_errors=True)


def nightly_sketch_maintenance(
    spark, sf_dir: str, n_nights: int = 3
) -> dict:
    """r14 — the sketch-monoid leg of the nightly loop: the standing
    corpus's EXACT-dup Bloom guard is a durable word-table artifact
    (`operators/scale.bloom_words_*`) maintained by O(batch) appends,
    in its production role as the pre-filter that turns the nightly
    batch-vs-corpus dedup join from batch-sized to duplicate-sized.

    Each night:

    1. probe the batch's fingerprints against the COMMITTED bitmap
       (one few-MB broadcast, zero shuffle) — bloom-negative rows are
       DEFINITIVELY new (no false negatives by construction) and skip
       the verify join entirely;
    2. only bloom-positive rows pay the exact verify join against the
       standing fingerprint set — duplicate-sized-plus-false-positive
       input, never batch-sized;
    3. the kept rows' fingerprints APPEND transactionally to the word
       artifact (the night label is the idempotency key), so night
       N's guard reflects nights < N exactly — crashed appends are
       invisible, which is precisely what keeps the no-false-negative
       invariant true across the lifecycle.

    Returns per-night stats plus two loop-level invariants the test
    pins: ``false_negatives`` (true duplicates the guard missed —
    the contract says always 0) and ``final_bitmap_equals_rebuild``
    (the maintained bitmap equals a from-scratch build over the final
    fingerprint set — merge == rebuild in the production loop shape,
    not just the unit test)."""
    import shutil
    import tempfile

    from flink_connectors_spark.operators.scale import (
        auto_bloom_bits,
        bloom_might_contain,
        bloom_words_append,
        bloom_words_build_artifact,
        read_bloom_bitmap,
    )

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.md5("text").alias("fp")
    )
    path = tempfile.mkdtemp(prefix="fcs_nightly_bloom_")
    try:
        # family width provisioned ONCE from expected corpus scale
        m_bits = auto_bloom_bits(docs.count())
        day0 = docs.filter(F.col("doc_id") % (n_nights + 1) == 0)
        standing = day0.select("fp").distinct().localCheckpoint(
            eager=True
        )
        bloom_words_build_artifact(standing, path, m_bits)
        nights = []
        false_negatives = 0
        for night in range(1, n_nights + 1):
            batch = docs.filter(
                F.col("doc_id") % (n_nights + 1) == night
            )
            bmp = read_bloom_bitmap(spark, path)
            probed = bloom_might_contain(batch, bmp).localCheckpoint(
                eager=True
            )
            # (1) bloom-negative: definitively new, no join needed
            fresh = probed.filter("bloom_hit = 0")
            # (2) only positives pay the exact verify join
            positives = probed.filter("bloom_hit = 1")
            true_dups = positives.join(standing, "fp", "left_semi")
            keep = probed.join(true_dups, "doc_id", "left_anti")
            # the invariant the guard sells: every true duplicate in
            # the WHOLE batch was bloom-positive (a negative that is
            # a true dup would have been silently kept)
            false_negatives += fresh.join(
                standing, "fp", "left_semi"
            ).count()
            kept_fps = keep.select("fp").distinct().localCheckpoint(
                eager=True
            )
            nights.append(
                {
                    "n_batch": batch.count(),
                    "n_bloom_pos": positives.count(),
                    "n_true_dup": true_dups.count(),
                    "n_kept": keep.count(),
                }
            )
            # (3) O(batch) transactional append; night label is the
            # idempotency key a retry reuses
            bloom_words_append(kept_fps, path, f"night{night}")
            standing = standing.unionByName(kept_fps).distinct(
            ).localCheckpoint(eager=True)
        got = read_bloom_bitmap(spark, path).first()["bf"]
        ref = tempfile.mkdtemp(prefix="fcs_nightly_bloomref_")
        try:
            bloom_words_build_artifact(standing, ref, m_bits)
            want = read_bloom_bitmap(spark, ref).first()["bf"]
        finally:
            shutil.rmtree(ref, ignore_errors=True)
        return {
            "nights": nights,
            "false_negatives": false_negatives,
            "final_bitmap_equals_rebuild": got == want,
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="nightly-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    stats = nightly_ingest(spark, sf_dir)
    for k, v in stats.items():
        print(f"{k:16s} {v}")
    indexed = nightly_ingest_indexed(spark, sf_dir)
    print(f"{'indexed_kept':16s} {indexed['kept_per_night']}")
    assert indexed["kept_per_night"] == stats["kept_per_night"], (
        "indexed loop diverged from the live loop"
    )
    print("indexed == live: True")
    sk = nightly_sketch_maintenance(spark, sf_dir)
    for n in sk["nights"]:
        print(f"{'bloom_night':16s} {n}")
    print(f"{'false_negatives':16s} {sk['false_negatives']}")
    print(
        f"{'merge==rebuild':16s} {sk['final_bitmap_equals_rebuild']}"
    )
    assert sk["false_negatives"] == 0
    assert sk["final_bitmap_equals_rebuild"]
    spark.stop()


if __name__ == "__main__":
    main()
