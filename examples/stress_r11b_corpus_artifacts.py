#!/usr/bin/env python
"""10x stress for the r11 corpus-side artifact family: MinHash pair
statistics, containment sufficient statistics, the BPE tokenizer
artifact, and the incremental-dedup signature index.

Claim under test (the 100 TB argument): each artifact's BUILD is one
corpus-linear pass (cost grows ~linearly with corpus size), while
every PROBE is pair-/table-sized reads whose cost is flat in corpus
size once the relation exists. The adversarial shape mirrors
stress_r11_edge_artifact: the 10x corpus is the base corpus unioned
with shifted-id copies (duplicate-heavy — pair lists grow
super-linearly in the duplicate factor, the worst case for
pair-sized relations).

Checks per family:
- build(1x) vs build(10x): wall ratio reported (expect ~linear in
  rows for the corpus passes; pair writes grow with pair count).
- probe(1x artifact) vs probe(10x artifact): flat-ish (probe cost is
  candidate-sized, and at fixed query volume the candidate volume
  per query is bounded by band-bucket occupancy).
- invariants: probe plans stay build-free (no xxhash/array_intersect
  for the pair families, single documents scan for BPE encode), and
  the floored-build error contract holds at both scales.

Run:  python examples/stress_r11b_corpus_artifacts.py [SF_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from flink_connectors_spark.operators import dedup as D
from flink_connectors_spark.operators.text import (
    bpe_merges_build_artifact,
    read_bpe_merges,
)
from flink_connectors_spark.session import build_session, load_table


def _shifted_union(docs, copies: int):
    out = docs
    for i in range(1, copies):
        out = out.unionByName(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
        )
    return out


def _timed(fn):
    t = time.time()
    out = fn()
    return time.time() - t, out


def main(sf_dir: str) -> dict:
    spark = build_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, sf_dir, "documents").localCheckpoint(
        eager=True
    )
    docs10 = _shifted_union(docs1, 10).localCheckpoint(eager=True)
    n1, n10 = docs1.count(), docs10.count()
    report: dict = {"rows_1x": n1, "rows_10x": n10}
    roots: list[str] = []

    def root(tag: str) -> str:
        p = tempfile.mkdtemp(prefix=f"fcs_stress_r11b_{tag}_")
        roots.append(p)
        return p

    # --- MinHash pair statistics (audit-grade, floor 0) ---
    p1, p10 = root("mh1"), root("mh10")
    b1, _ = _timed(lambda: D.minhash_pairs_build_artifact(docs1, p1))
    b10, _ = _timed(lambda: D.minhash_pairs_build_artifact(docs10, p10))
    pr1, c1 = _timed(
        lambda: D.read_minhash_pairs(spark, p1, 0.5).count()
    )
    pr10, c10 = _timed(
        lambda: D.read_minhash_pairs(spark, p10, 0.5).count()
    )
    report["minhash"] = {
        "build_1x_s": round(b1, 2), "build_10x_s": round(b10, 2),
        "probe_1x_s": round(pr1, 2), "probe_10x_s": round(pr10, 2),
        "pairs_1x": c1, "pairs_10x": c10,
    }
    # invariant: probe plan stays LSH-free at both scales
    for p in (p1, p10):
        plan = (
            D.read_minhash_pairs(spark, p, 0.5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "xxhash" not in plan.lower()

    # --- Containment sufficient statistics ---
    q1, q10 = root("ct1"), root("ct10")
    # real (lang, source) blocking — flattening the blocks would
    # manufacture an artificial corpus^2 self-join no consumer runs
    cb1, _ = _timed(
        lambda: D.containment_pairs_build_artifact(
            docs1, q1, block_cols=["lang", "source"],
        )
    )
    cb10, _ = _timed(
        lambda: D.containment_pairs_build_artifact(
            docs10, q10, block_cols=["lang", "source"],
        )
    )
    cp1, k1 = _timed(
        lambda: D.read_containment_pairs(spark, q1, 0.5).count()
    )
    cp10, k10 = _timed(
        lambda: D.read_containment_pairs(spark, q10, 0.5).count()
    )
    report["containment"] = {
        "build_1x_s": round(cb1, 2), "build_10x_s": round(cb10, 2),
        "probe_1x_s": round(cp1, 2), "probe_10x_s": round(cp10, 2),
        "pairs_1x": k1, "pairs_10x": k10,
    }

    # --- BPE tokenizer artifact ---
    t1, t10 = root("bpe1"), root("bpe10")
    tb1, _ = _timed(lambda: bpe_merges_build_artifact(docs1, t1))
    tb10, _ = _timed(lambda: bpe_merges_build_artifact(docs10, t10))
    tp1, m1 = _timed(lambda: read_bpe_merges(spark, t1))
    tp10, m10 = _timed(lambda: read_bpe_merges(spark, t10))
    # duplicate-heavy 10x corpus multiplies every pair count by the
    # copy factor and changes no ordering: the learned merges are
    # IDENTICAL — the training loop is scale-invariant on counts
    assert [
        (m["left_sym"], m["right_sym"]) for m in m1
    ] == [(m["left_sym"], m["right_sym"]) for m in m10], (
        "10x duplicate corpus changed the learned merges"
    )
    report["bpe"] = {
        "build_1x_s": round(tb1, 2), "build_10x_s": round(tb10, 2),
        "read_1x_s": round(tp1, 2), "read_10x_s": round(tp10, 2),
    }

    # --- incremental-dedup signature index ---
    i1, i10 = root("ix1"), root("ix10")
    ib1, _ = _timed(
        lambda: D.minhash_index_build_artifact(docs1, i1)
    )
    ib10, _ = _timed(
        lambda: D.minhash_index_build_artifact(docs10, i10)
    )
    batch = docs1.limit(50).localCheckpoint(eager=True)
    pb1, r1 = _timed(
        lambda: D.minhash_lsh_pairs_vs_index(batch, i1).count()
    )
    pb10, r10 = _timed(
        lambda: D.minhash_lsh_pairs_vs_index(batch, i10).count()
    )
    report["index"] = {
        "build_1x_s": round(ib1, 2), "build_10x_s": round(ib10, 2),
        "probe_1x_s": round(pb1, 2), "probe_10x_s": round(pb10, 2),
        "matches_1x": r1, "matches_10x": r10,
    }

    for p in roots:
        shutil.rmtree(p, ignore_errors=True)
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = main(sf)
    import json

    print(json.dumps(rep, indent=2))
