#!/usr/bin/env python
"""Round-5 volume runs (SCALING.md input): scale curves for the two
composed flagship builds that had no curve yet (r4 verdict task #6).

- dedup_canonical_pagerank composition at 1x / 10x / 30x embeddings:
  ONE sign-LSH pair computation (eager localCheckpoint) feeding both
  the connected-components branch and the two-iteration PageRank
  branch, then the per-cluster rank window. The union makes every
  vector an exact twin of its N-1 shifted copies, so pair volume
  grows ~ C(N, 2) per original vector — the curve measures the
  composed detect -> cluster -> rank -> choose loop on a graph whose
  edge count grows quadratically in the duplication level while the
  node count grows linearly.
- embedding_centroid_drift at 1x / 10x / 30x: same-seed dual Lloyd
  chains — the OLD build always trains on the original 1x slice
  (vec_id < 10M: yesterday's corpus), the NEW build on the full Nx
  union, so the curve isolates the new-side build cost. The compare
  itself is k-sized and stays constant.

Method mirrors stress_r4: union sf0.1 N times with shifted ids,
cache+count inputs, one timed action per operator per pass, second
full pass as warm. Between passes the session releases pinned state
the way bench.py now does, so warm numbers measure the plan, not
accumulated block-manager pressure.

Run:  python examples/stress_r5.py [N ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_connectors_spark.operators import dedup as D
from flink_connectors_spark.operators import similarity as S
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = "/root/testdata/sf0.1"
STEP = 10_000_000


def union_nx(df, n):
    big = df
    for i in range(1, n):
        big = big.unionByName(
            df.withColumn("vec_id", F.col("vec_id") + F.lit(i * STEP))
        )
    return big


def release(spark):
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        try:
            jrdd.unpersist()
        except Exception:
            pass


def canonical_pagerank(emb, n_vec):
    """The registered dedup_canonical_pagerank composition over an
    arbitrary embeddings frame (plans/llm_ops3.py:1482) — with the
    ENFORCED auto-banding in place of the query's pinned 16x4 (the
    pin exists for oracle parity on the tiny test table). Measured
    consequence of keeping the pin at volume: at 10x (20k vectors)
    the 4-bit bands put ~1,250 vectors in every bucket, the
    candidate join's build side grows with occupancy^2 and the 32
    concurrent shuffled-hash builds die with "Can't acquire ...
    bytes to build hash relation" — the exact under-partitioning
    hazard auto_lsh_bands (bits = ceil(log2 N)) exists to prevent."""
    pairs = (
        S.cosine_near_dup_pairs_lsh(
            emb, threshold=0.4, corpus_count=n_vec
        )
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    comp = D.connected_components(pairs, src="id1", dst="id2").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )
    pr = D.pagerank_undirected(pairs, src="id1", dst="id2", iters=2)
    w = W.partitionBy("cluster_id").orderBy(F.desc("pagerank"), F.asc("vec_id"))
    return (
        comp.join(pr, "vec_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("vec_id").alias("keep_id"), "pagerank")
    )


def centroid_drift(spark, emb):
    """The registered embedding_centroid_drift composition
    (plans/llm_ops3.py:1599), old slice = the original 1x copy."""
    old_cb = S.kmeans_assign_quantized(
        emb.filter(F.col("vec_id") < STEP).filter(F.col("vec_id") < 300),
        k=8,
        iters=2,
    )._fcs_centroids
    new_cb = S.kmeans_assign_quantized(emb, k=8, iters=2)._fcs_centroids
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


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = build_session(app_name="stress-r5")
    spark.sparkContext.setLogLevel("ERROR")

    for n in ns:
        emb = union_nx(
            spread(load_table(spark, SF_DIR, "embeddings")), n
        ).persist()
        n_vec = emb.count()
        print(f"\n=== {n}x: {n_vec} vectors ===", flush=True)

        for label, thunk in (
            ("canonical_pagerank", lambda: canonical_pagerank(emb, n_vec)),
            ("centroid_drift", lambda: centroid_drift(spark, emb)),
        ):
            times = []
            rows = None
            for _ in range(2):  # cold, then warm
                t0 = time.perf_counter()
                rows = thunk().count()
                times.append(round(time.perf_counter() - t0, 1))
                # release the pass's build pins (checkpointed pair
                # lists etc.), then re-pin the input union untimed
                release(spark)
                emb.persist()
                emb.count()
            print(
                f"{label} {n}x: cold {times[0]} s / warm {times[1]} s, "
                f"{rows} rows",
                flush=True,
            )
        emb.unpersist()
        release(spark)

    spark.stop()


if __name__ == "__main__":
    main()
