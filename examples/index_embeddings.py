#!/usr/bin/env python
"""Embedding index lifecycle: the similarity operators composed the
way a vector-store build job would run them.

    embeddings.parquet
      |> power-iteration top direction (anisotropy report: how much
         of the corpus' energy sits on one axis — decides whether to
         whiten before indexing)
      |> deterministic k-means build (the IVF coarse quantizer)
      |> IVF top-5 search for a query batch (cluster-probed)
      |> PQ encode (2 blocks x 16 codewords) + ADC top-5 search
      |> recall audit: both ANN paths vs exact brute force
      |> centroid-drift refresh trigger: same-seed build on the
         older half vs the full corpus — rebuild only when clusters
         actually moved

Run:  python examples/index_embeddings.py [SF_DIR]

Every stage is a declarative plan from
flink_connectors_spark.operators.similarity — no driver-side vector
math beyond the k-vector/centroid control plane the deterministic
builds already use.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from flink_connectors_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    kmeans_assign_quantized,
    power_iteration_projection,
    topk_pq_adc,
)
from flink_connectors_spark.session import build_session, load_table, spread


def index_and_audit(spark, sf_dir: str, n_queries: int = 20) -> dict:
    emb = spread(load_table(spark, sf_dir, "embeddings")).persist()
    emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries)

    # 1. anisotropy report: energy share of the dominant direction.
    proj = power_iteration_projection(emb, iters=2)
    comp = proj._fcs_component
    stats = proj.agg(
        F.sum(F.col("proj").cast("double") * F.col("proj")).alias("pe"),
    ).first()
    comp_sq = float(sum(c * c for c in comp))
    total_e = emb.select(
        F.aggregate(
            F.transform(
                "embedding",
                lambda v: F.round(v.cast("double") * 1024).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x * x,
        ).alias("e")
    ).agg(F.sum(F.col("e").cast("double")).alias("te")).first()["te"]
    # Rayleigh quotient of the learned axis, as a share of total energy
    dominant_share = (stats["pe"] / comp_sq) / total_e if total_e else 0.0

    # 2. exact baseline + both ANN paths.
    exact = cosine_topk_bruteforce(queries, emb, k=5)
    assign = kmeans_assign_quantized(emb, k=16, iters=2).select(
        "vec_id", "cluster"
    ).localCheckpoint(eager=False)
    corpus = emb.join(assign, "vec_id")
    ivf = cosine_topk_ivf(
        queries, corpus, k=5, n_probe=2, cluster_col="cluster"
    )
    pq = topk_pq_adc(queries, emb, k=5, subspaces=2, codebook_k=16)

    def recall(ann_df) -> float:
        e = exact.select("query_id", "neighbor_id")
        a = ann_df.select("query_id", "neighbor_id")
        hits = e.join(a, ["query_id", "neighbor_id"]).count()
        return hits / e.count()

    # 3. refresh trigger: would yesterday's index still serve today?
    half = int(emb.count()) // 2
    old_cb = kmeans_assign_quantized(
        emb.filter(F.col("vec_id") < half), k=16, iters=2
    )._fcs_centroids
    new_cb = kmeans_assign_quantized(emb, k=16, iters=2)._fcs_centroids
    max_drift = 0.0
    for (cl, so, co), (_, sn, cn) in zip(old_cb, new_cb):
        d = sum(
            (x / co - y / cn) ** 2 for x, y in zip(so, sn)
        ) ** 0.5 / 1024.0
        max_drift = max(max_drift, d)

    out = {
        "corpus_size": emb.count(),
        "dominant_direction_share": round(float(dominant_share), 4),
        "recall_ivf_at_5": round(recall(ivf), 4),
        "recall_pq_at_5": round(recall(pq), 4),
        "max_centroid_drift": round(max_drift, 4),
    }
    emb.unpersist()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="index-embeddings")
    spark.sparkContext.setLogLevel("ERROR")
    stats = index_and_audit(spark, sf_dir)
    for k, v in stats.items():
        print(f"{k:28s} {v}")
    spark.stop()


if __name__ == "__main__":
    main()
