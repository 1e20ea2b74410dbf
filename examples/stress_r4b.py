#!/usr/bin/env python
"""Round-4 wave-2 volume runs (SCALING.md input): scale curves for the
two new pair-generating operators.

- semantic_dedup_pairs (SemDeDup) at 1x / 10x / 30x embeddings with k
  SCALED to hold expected cluster size constant (k = 8 * N): the
  SemDeDup cost model is argmin build O(N*k) + intra-cluster pairs
  O(sum n_c^2) ~ O(N^2/k), so fixed k turns 30x data into 900x pair
  work — the k-scaling rule is the operator's sizing contract, and
  this run measures it.
- minhash_estimate_audit at 1x / 10x documents. Copies get a distinct
  leading token (shingles shift at the head only), so each copy stays
  a near-dup of its source: candidate volume grows ~ C(copies, 2) per
  source — the audit is candidate-pair-sized BY DESIGN, and the run
  makes that visible; production monitoring samples pairs instead.

Method mirrors stress_r4: union sf0.1 N times with shifted ids,
cache+count inputs, one timed action per operator, second timed run
as warm.

Run:  python examples/stress_r4b.py [N ...]
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
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = "/root/testdata/sf0.1"


def union_nx(df, id_col, n, step=10_000_000, text_tag=False):
    big = df
    for i in range(1, n):
        nxt = df.withColumn(id_col, F.col(id_col) + F.lit(i * step))
        if text_tag:
            nxt = nxt.withColumn(
                "text", F.concat(F.lit(f"copy{i} "), F.col("text"))
            )
        big = big.unionByName(nxt)
    return big


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = build_session(app_name="stress-r4b")
    spark.sparkContext.setLogLevel("ERROR")

    for n in ns:
        emb = spread(
            union_nx(load_table(spark, SF_DIR, "embeddings"), "vec_id", n)
        ).persist()
        n_vec = emb.count()
        k = 8 * n  # hold expected cluster size ~ constant
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            pairs = S.semantic_dedup_pairs(emb, k=k, iters=2, threshold=0.4)
            n_pairs = pairs.count()
            dt = time.perf_counter() - t0
            D.unpersist_inputs(pairs)
            print(
                f"semdedup {n}x vectors={n_vec} k={k} {label}: "
                f"{dt:.1f}s pairs={n_pairs}",
                flush=True,
            )
        emb.unpersist()

    for n in ns:
        if n > 10:
            continue  # audit is candidate-pair-sized; 30x duplication
            # is C(30,2)x pairs per source — sampled in production
        docs = spread(
            union_nx(
                load_table(spark, SF_DIR, "documents"),
                "doc_id",
                n,
                text_tag=True,
            )
        ).persist()
        n_docs = docs.count()
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            out = D.minhash_estimate_audit(docs)
            n_rows = out.count()
            dt = time.perf_counter() - t0
            D.unpersist_inputs(out)
            print(
                f"mh-audit {n}x docs={n_docs} {label}: "
                f"{dt:.1f}s pairs={n_rows}",
                flush=True,
            )
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
