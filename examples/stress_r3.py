"""10x-union stress runs for the round-3 operators (SCALING.md input).

Unions the sf0.1 tables 10x with shifted ids (documents -> 50k rows,
embeddings -> 20k vectors) and times each round-3 operator end-to-end,
printing one line per run. Mirrors the round-2 volume-extension
methodology (SCALING.md "Round 2 volume extensions").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from flink_connectors_spark.operators import similarity as S
from flink_connectors_spark.operators import text as T
from flink_connectors_spark.operators.sampling import (
    temperature_mixture_sample,
)
from flink_connectors_spark.session import build_session, spread

SF_DIR = "/root/testdata/sf0.1"


def union_nx(df, id_col, n=10, step=10_000_000):
    big = df
    for i in range(1, n):
        big = big.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * step))
        )
    return big


def main() -> None:
    spark = build_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spread(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), 32
    ).cache()
    emb = spread(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), 32
    ).cache()
    n_docs, n_emb = docs.count(), emb.count()

    big_docs = union_nx(docs, "doc_id").cache()
    big_emb = union_nx(emb, "vec_id").cache()
    nd, ne = big_docs.count(), big_emb.count()
    print(f"docs {n_docs} -> {nd}; embeddings {n_emb} -> {ne}")

    # 1. temperature mixture sampling at 10x
    t0 = time.perf_counter()
    samp = temperature_mixture_sample(
        big_docs, "lang", "doc_id", target_fraction=0.5
    )
    kept = samp.count()
    t1 = time.perf_counter()
    print(
        f"mixture_sample_10x: {t1 - t0:.2f}s rows={kept} "
        f"frac={kept / nd:.4f}"
    )

    # 2. commonness score at 10x
    t0 = time.perf_counter()
    cs = T.commonness_score(big_docs, k=20)
    rows, mean = cs.agg(
        F.count(F.lit(1)), F.avg("commonness")
    ).first()  # single action
    t1 = time.perf_counter()
    print(f"commonness_10x: {t1 - t0:.2f}s rows={rows} mean={mean:.4f}")

    # 3. near-dup degree histogram at 10x (banding sized for 20k corpus)
    t0 = time.perf_counter()
    pairs = S.cosine_near_dup_pairs_lsh(
        big_emb, threshold=0.4, n_planes=32, bits_per_band=16
    )
    ends = pairs.select(F.col("id1").alias("vec_id")).unionAll(
        pairs.select(F.col("id2").alias("vec_id"))
    )
    deg = ends.groupBy("vec_id").agg(F.count(F.lit(1)).alias("degree"))
    hist = (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .collect()
    )
    t1 = time.perf_counter()
    # every vector has >= 9 identical twins -> min degree 9
    min_deg = min(r.degree for r in hist)
    n_vecs = sum(r.n_vectors for r in hist)
    print(
        f"graph_degree_10x: {t1 - t0:.2f}s vectors={n_vecs} "
        f"min_degree={min_deg} buckets={len(hist)}"
    )

    # 4. label-free IVF end-to-end at 10x: kmeans build + search
    t0 = time.perf_counter()
    assign = S.kmeans_assign_quantized(big_emb, k=16, iters=2, scale=1024)
    corpus = big_emb.join(assign.select("vec_id", "cluster"), "vec_id")
    out = S.cosine_topk_ivf(
        big_emb.filter(F.col("vec_id") < 20),
        corpus,
        k=5,
        n_probe=2,
        cluster_col="cluster",
    )
    res = out.collect()  # single action: build + search execute once
    rows = len(res)
    top1 = sum(
        1 for r in res if r.rnk == 1 and r.score >= 0.999999
    )
    t1 = time.perf_counter()
    print(
        f"ivf_unlabeled_10x: {t1 - t0:.2f}s rows={rows} "
        f"top1_twin_hits={top1}/20"
    )

    # 5. pipeline-QA batch (SCALING.md batch 3/4)
    from flink_connectors_spark.functions import normalize_text
    from flink_connectors_spark.operators.sampling import (
        global_shuffle_order,
    )
    from flink_connectors_spark.operators.scale import (
        bloom_bitmap,
        bloom_might_contain,
    )
    from flink_connectors_spark.operators.text import token_entropy

    t0 = time.perf_counter()
    gs = global_shuffle_order(big_docs.select("doc_id"), "doc_id", 64)
    n = gs.count()
    print(f"global_shuffle_10x: {time.perf_counter() - t0:.2f}s rows={n}")

    t0 = time.perf_counter()
    te = token_entropy(big_docs)
    n = te.count()
    print(f"token_entropy_10x: {time.perf_counter() - t0:.2f}s rows={n}")

    t0 = time.perf_counter()
    fps = big_docs.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
    )
    hist = fps.filter("doc_id % 3 = 0").select("fp").distinct()
    guarded = bloom_might_contain(fps, bloom_bitmap(hist))
    hits = guarded.filter("bloom_hit = 1").count()
    print(
        f"bloom_guard_10x: {time.perf_counter() - t0:.2f}s "
        f"bloom_hits={hits}"
    )

    t0 = time.perf_counter()
    na = S.norm_audit(big_emb)
    rows = na.count()
    print(f"norm_audit_10x: {time.perf_counter() - t0:.2f}s groups={rows}")

    spark.stop()


if __name__ == "__main__":
    main()
