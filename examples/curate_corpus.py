#!/usr/bin/env python
"""End-to-end corpus curation: the engine's training-data operators
composed the way a production job would run them.

    documents.parquet
      |> PII scrub (redact emails/URLs/phones, keep audit counts)
      |> quality gate (alpha/stopword/TTR/length score >= threshold)
      |> repetition gate (duplicate-3-gram fraction, Gopher-style)
      |> exact dedup (md5 fingerprint, keep lowest doc_id)
      |> near-dup clustering (MinHash-LSH pairs -> connected
         components; keep each cluster's canonical doc)
      |> eval-set decontamination (fingerprint + shared-shingle)
      |> per-source quality quota (top-400 per source)
      |> temperature mixture sampling (multinomial alpha=0.5)
      |> frozen train/val/test split (md5, growth-stable)
      |> sequence packing (2048-token training sequences)
      |> global shuffle order (md5 shard + rank: frozen training order)
      |> chunking (32-token windows, 4 overlap)
      |> Z-ordered parquet (clustered on (source-hash, doc_id))

Run:  python examples/curate_corpus.py [SF_DIR] [OUT_DIR]

Every stage is a declarative DataFrame op from
flink_connectors_spark.operators — no collects, one keyed shuffle per
stage, Arrow only at the (stubbed) multimodal boundary. Stage yields
are printed from single-pass Observation metrics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from flink_connectors_spark.observability import observed_null_rate
from flink_connectors_spark.operators.dedup import (
    connected_components,
    decontaminate,
    exact_dedup,
    minhash_lsh_pairs,
    unpersist_inputs,
)
from flink_connectors_spark.operators.scale import write_zordered
from flink_connectors_spark.operators.text import (
    chunk_documents,
    pii_scrub,
    quality_score,
)
from flink_connectors_spark.session import build_session, load_table, spread


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    docs = spread(load_table(spark, sf_dir, "documents"))
    n0 = docs.count()

    # 1. PII scrub (audit counts kept as columns)
    scrubbed = pii_scrub(docs).join(
        docs.select("doc_id", "source", "lang", "n_chars"), "doc_id"
    ).withColumnRenamed("clean_text", "text")

    # 2. quality gate
    q = quality_score(scrubbed.select("doc_id", "text"))
    gated = scrubbed.join(
        q.filter(F.col("quality_score") >= 0.5).select("doc_id"), "doc_id"
    )
    n_gated = gated.count()

    # 2b. repetition gate: drop boilerplate/spam-shaped docs
    from flink_connectors_spark.functions import raw_word_ngrams, tokenize

    g3 = raw_word_ngrams(tokenize(F.col("text")), 3)
    rep_ok = (
        F.size(g3) < 3
    ) | (
        1.0
        - F.size(F.array_distinct(g3)).cast("double")
        / F.greatest(F.size(g3).cast("double"), F.lit(1.0))
        <= 0.6
    )
    gated = gated.filter(rep_ok)

    # 3. exact dedup: keep the canonical (lowest) doc id per fingerprint
    keep_exact = exact_dedup(gated).select(
        F.col("keep_id").alias("doc_id")
    )
    exact_kept = gated.join(keep_exact, "doc_id")

    # 4. near-dup clustering: drop every non-canonical cluster member
    pairs = minhash_lsh_pairs(exact_kept, threshold=0.5)
    clusters = connected_components(pairs)
    non_canonical = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    deduped = exact_kept.join(non_canonical, "doc_id", "left_anti")

    # 4b. decontaminate against a held-out eval slice
    eval_set = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    deduped = decontaminate(deduped, eval_set, min_overlap=2)
    # Materialize the dedup stage's survivors, then RELEASE the LSH
    # shingle/band caches — the cache-lifetime contract: the plan
    # persists them (several branches re-read the shingle table), the
    # caller owns release once nothing downstream re-reads the lineage.
    # The checkpoint cuts that lineage, so every later stage (quota,
    # mixture, packing, write) starts from the materialized survivors
    # instead of re-running the self-join with its caches evicted.
    deduped = deduped.localCheckpoint(eager=True)
    unpersist_inputs(pairs, blocking=True)
    n_deduped = deduped.count()

    # 5. per-source quality quota: no source may dominate the mix —
    # each contributes at most its 400 best docs by quality score
    from flink_connectors_spark.operators.sampling import (
        per_group_quota,
        split_assign,
        temperature_mixture_sample,
    )

    with_q = deduped.join(q.select("doc_id", "quality_score"), "doc_id")
    deduped = per_group_quota(
        with_q, "source", "quality_score", "doc_id", 400
    ).drop("rnk", "quality_score")

    # 5a. temperature mixture (multinomial alpha=0.5): low-resource
    # sources up-weighted relative to proportional, half-corpus budget
    sampled = temperature_mixture_sample(
        deduped, "source", "doc_id", target_fraction=0.5
    ).drop("ppm")

    # 5b. pack into fixed 2048-token training sequences
    from pyspark.sql import Window as W

    n_tok = F.size(tokenize(F.col("text")))
    pw = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sampled = sampled.withColumn("__nt__", n_tok.cast("long")).withColumn(
        "pack_id",
        ((F.sum("__nt__").over(pw) - F.col("__nt__")) / 2048).cast("bigint"),
    ).drop("__nt__")

    # 5c. frozen train/val/test assignment (never flips as corpus grows)
    sampled = split_assign(
        sampled, "doc_id", {"train": 90, "val": 5, "test": 5}
    )

    # 5d. deterministic global training order: shard + within-shard
    # position from md5 — a reproducible uniform permutation with one
    # bounded-key shuffle (no ORDER BY rand() global sort)
    from flink_connectors_spark.operators.sampling import (
        global_shuffle_order,
    )

    sampled = global_shuffle_order(sampled, "doc_id", n_shards=8)

    # 6. chunking for the context window; split joins back on doc_id
    chunks = chunk_documents(sampled, chunk_tokens=32, overlap=4).join(
        sampled.select("doc_id", "split"), "doc_id"
    )
    chunks, obs = observed_null_rate(chunks, "doc_id", "chunks")

    # 7. clustered layout for downstream scans
    out = chunks.withColumn(
        "source_bucket",
        F.pmod(F.xxhash64(F.lit("s"), F.col("doc_id")), F.lit(1024)),
    )
    write_zordered(
        out, out_dir, ["source_bucket", "doc_id"], n_files=8
    )
    m = obs.get
    return {
        "input_docs": n0,
        "after_quality_gate": n_gated,
        "after_dedup": n_deduped,
        "chunks_written": m["n_rows"],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = build_session(app_name="curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    stats = curate(spark, sf_dir, out_dir)
    for k, v in stats.items():
        print(f"{k:22s} {v}")
    spark.stop()


if __name__ == "__main__":
    main()
