#!/usr/bin/env python
"""Round-4 volume-extension runs (SCALING.md input): the two composed
operators the r3 verdict flagged as missing their scale curves.

- similarity_topk_ivf_unlabeled lifecycle (k-means build -> checkpoint
  -> IVF search) at 1x / 10x / 30x embeddings unions — composed
  exactly like the registered query (lazy localCheckpoint between
  build and search), so the curve measures the single-build plan the
  pin test (tests/test_plans.py::test_ivf_unlabeled_build_feeds_search_once)
  locks in.
- dedup_containment_rare_shingle at 1x / 10x / 30x documents unions —
  the prefix-filter candidate volume bound (max_df^2 per rare
  shingle) is the property under test: time should track the shingle
  exchange, never candidate blowup.

Method mirrors stress_r3: union sf0.1 N times with shifted ids,
cache+count inputs first, one timed action per operator, second run
timed as warm.

Run:  python examples/stress_r4.py [N ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from flink_connectors_spark.operators import dedup as D
from flink_connectors_spark.operators import similarity as S
from flink_connectors_spark.session import build_session, spread

SF_DIR = "/root/testdata/sf0.1"


def union_nx(df, id_col, n, step=10_000_000):
    big = df
    for i in range(1, n):
        big = big.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * step))
        )
    return big


def ivf_lifecycle(emb):
    """The registered query's exact composition at stress scale."""
    assign = (
        S.kmeans_assign_quantized(emb, k=16, iters=2, scale=1024)
        .select("vec_id", "cluster")
        .localCheckpoint(eager=False)
    )
    corpus = emb.join(assign, "vec_id")
    return S.cosine_topk_ivf(
        emb.filter(F.col("vec_id") < 20), corpus, k=5, n_probe=2,
        cluster_col="cluster",
    )


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = build_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = spread(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), 32
    ).cache()
    emb0 = spread(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), 32
    ).cache()
    docs0.count(), emb0.count()

    for n in ns:
        emb = union_nx(emb0, "vec_id", n).cache()
        ne = emb.count()
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            res = ivf_lifecycle(emb).collect()
            dt = time.perf_counter() - t0
            top1 = sum(1 for r in res if r.rnk == 1 and r.score >= 0.999999)
            print(
                f"ivf_unlabeled_{n}x_{label}: {dt:.2f}s vectors={ne} "
                f"rows={len(res)} top1_twin_hits={top1}/20",
                flush=True,
            )
        emb.unpersist()

        docs = union_nx(docs0, "doc_id", n).cache()
        nd = docs.count()
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            out = D.containment_pairs_rare_shingle(docs, threshold=0.5)
            rows = out.count()
            dt = time.perf_counter() - t0
            print(
                f"containment_rare_{n}x_{label}: {dt:.2f}s docs={nd} "
                f"pairs={rows}",
                flush=True,
            )
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
