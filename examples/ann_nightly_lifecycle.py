#!/usr/bin/env python
"""End-to-end nightly ANN index lifecycle — the composition story the
r9/r10 operators exist for, runnable as one script:

  day 0   BUILD the IVF-PQ artifact on the seed corpus
          (`ivfpq_build_artifact`: codes hive-partitioned by inverted
          list, exact-integer codebooks, routing medoids, params
          manifest — FAISS `index.write` parity)
  serve   PROBE it (`topk_from_ivfpq_artifact`: Lloyd-free plan,
          probed lists arrive as partition pruning)
  day 1   APPEND tonight's batch with the FROZEN codebooks
          (`ivfpq_encode_append`: one broadcast-argmin pass — FAISS
          `index.add`), re-probe, see the new generation
  monitor DRIFT-check the codebooks against the grown corpus
          (`kmeans_assign_quantized` old-vs-new centroid movement —
          the registry's `embedding_centroid_drift` shape) and decide
          retrain / keep
  day 2   DELETE a takedown set (`ivfpq_delete_ids`: tombstones,
          FAISS `remove_ids`), probe with the anti-join, then
          COMPACT (`ivfpq_compact`: rewrite partitions minus
          tombstones, crash-safe swap) and verify the plain probe
          returns the same rows

Every step asserts its contract, so this doubles as an integration
check of the whole lifecycle. At 100 TB each step is the same plan
shape — the corpus-sized relations are written once (build) or
streamed through one linear pass (append/compact); probes read
n_probe/n_lists of the index bytes; the driver holds index-header
state only (codebooks, manifest, rotation for the OPQ variant).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
           python examples/ann_nightly_lifecycle.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_connectors_spark.operators import similarity as S
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = build_session(app_name="fcs-ann-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spread(load_table(spark, SF_DIR, "embeddings"))
    n = emb.count()
    cut = int(n * 0.8)
    seed = emb.filter(F.col("vec_id") < cut)
    tonight = emb.filter(F.col("vec_id") >= cut)
    queries = emb.filter(F.col("vec_id") < 10)
    path = os.path.join(
        tempfile.gettempdir(), f"fcs_lifecycle_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)

    # --- day 0: build ---
    S.ivfpq_build_artifact(seed, path, subspaces=2, codebook_k=16, iters=2)
    man = S.read_artifact_manifest(spark, path)
    assert man == {
        "subspaces": 2, "width": 32, "scale": 1024, "codebook_k": 16
    }, man
    print(f"built on {cut} vectors; manifest {man}")

    def probe(tomb: bool = False):
        return S.topk_from_ivfpq_artifact(
            queries, path, k=5, n_probe=2, subspaces=None, width=None,
            scale=None, apply_tombstones=tomb,  # params from manifest
        )

    day0 = {(r["query_id"], r["neighbor_id"]) for r in probe().collect()}
    assert all(nid < cut for _, nid in day0)
    print(f"day-0 probe: {len(day0)} result rows, all from the seed corpus")

    # --- day 1: append tonight's batch, frozen codebooks ---
    S.ivfpq_encode_append(tonight, path, subspaces=None, scale=None)
    day1 = {(r["query_id"], r["neighbor_id"]) for r in probe().collect()}
    new_gen = {nid for _, nid in day1 if nid >= cut}
    print(f"day-1 probe sees {len(new_gen)} appended neighbors")

    # --- monitor: centroid drift old-vs-grown, retrain decision ---
    def centroids(df):
        asg = S.kmeans_assign_quantized(
            df.select("vec_id", F.slice("embedding", 1, 32).alias("sub")),
            k=16, iters=2, vec_col="sub",
        )
        return {cl: (s, c) for cl, s, c in asg._fcs_centroids}

    old_c, new_c = centroids(seed), centroids(emb)
    drifts = []
    for cl in old_c:
        (s0, c0), (s1, c1) = old_c[cl], new_c[cl]
        v0 = [x / (c0 * 1024) for x in s0]
        v1 = [x / (c1 * 1024) for x in s1]
        drifts.append(
            sum((a - b) ** 2 for a, b in zip(v0, v1)) ** 0.5
        )
    worst = max(drifts)
    decision = "RETRAIN" if worst > 0.5 else "KEEP"
    print(f"drift monitor: worst centroid movement {worst:.4f} -> {decision}")

    # --- day 2: takedown + compaction ---
    takedown = emb.filter(F.col("vec_id") % 7 == 3)
    S.ivfpq_delete_ids(takedown, path)
    gone = {r["vec_id"] for r in takedown.select("vec_id").collect()}
    tomb_rows = {
        (r["query_id"], r["neighbor_id"])
        for r in probe(tomb=True).collect()
    }
    assert not {nid for _, nid in tomb_rows} & gone
    print(f"delete: {len(gone)} ids tombstoned, none surface as neighbors")
    S.ivfpq_compact(spark, path)
    plain = {(r["query_id"], r["neighbor_id"]) for r in probe().collect()}
    assert plain == tomb_rows, "compaction changed the results"
    assert spark.read.parquet(f"{path}/tombstones").count() == 0
    print("compact: plain probe == tombstone probe; tombstones consumed")

    shutil.rmtree(path, ignore_errors=True)
    print("LIFECYCLE OK")
    spark.stop()


if __name__ == "__main__":
    main()
