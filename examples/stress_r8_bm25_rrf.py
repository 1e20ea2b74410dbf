"""r8 scale-readiness stress (verdict task 6): BM25 lexical retrieval
and the hybrid RRF fusion on 10x corpora — the two r7 operators whose
scale paths had not yet been stress-run.

Hazard class under test (same as stress_r7_ann): relations EXPANDED
from a small file inherit the file's size estimate, so a 10x union
must not flip any corpus-sized side into a broadcast, and the
single-scan / no-token-shuffle plan shape the pins assert at 1x must
survive the growth.

- `bm25_topk` over a 10x documents union: per-term tf stays a
  codegen'd array fold inside the scan projection (no Generate/
  explode, no token shuffle, no SortMergeJoin anywhere); the one-row
  stats frame is the ONLY broadcast side (BroadcastNestedLoopJoin);
  the corpus itself must never appear under a BroadcastExchange.
- `hybrid_rrf_topk` over a 10x embeddings union: both rungs keep
  their broadcast-query single-corpus-scan shape (two
  BroadcastNestedLoopJoins), rank limits prune partial
  (WindowGroupLimit), and the fusion join only ever sees
  |Q| x k_cand rows — wall must scale with the scans, not the join.

Run: python examples/stress_r8_bm25_rrf.py   (uses
$SPARK_GRAFT_SF_DIR, default sf0.1)
"""
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_connectors_spark.operators.similarity import hybrid_rrf_topk
from flink_connectors_spark.operators.text import bm25_topk
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = 10


def main() -> None:
    spark = build_session(app_name="fcs-stress-r8-bm25-rrf")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- BM25 on 10x documents -------------------------------------
    docs = load_table(spark, SF_DIR, "documents")
    d0 = docs.count()
    dunions = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            "text",
        )
        for i in range(MULT)
    ]
    dbig = spread(
        reduce(lambda a, b: a.unionByName(b), dunions), factor=2
    ).localCheckpoint(eager=True)
    nd = dbig.count()

    bm25_topk(docs, ("dup", "spark", "merge"), k=25).count()  # warm 1x
    t0 = time.perf_counter()
    out = bm25_topk(dbig, ("dup", "spark", "merge"), k=25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, "token explode appeared at 10x"
    assert "SortMergeJoin" not in plan, (
        "corpus-sized shuffle join appeared at 10x"
    )
    assert "BroadcastNestedLoopJoin" in plan, (
        "one-row stats frame no longer broadcasts"
    )
    # the only broadcast exchange feeding the BNLJ must be the
    # one-row stats aggregate, never the corpus scan: an Aggregate
    # sits between every BroadcastExchange and any corpus scan
    import re

    for m in re.finditer(r"BroadcastExchange", plan):
        tail = plan[m.start() : m.start() + 4000]
        assert "HashAggregate" in tail or "SortAggregate" in tail, (
            "a BroadcastExchange without an aggregate under it — "
            "corpus side got broadcast from a stale size estimate"
        )
    rows = out.count()
    dt = time.perf_counter() - t0
    print(
        f"bm25: {nd} docs ({MULT}x{d0}), 3 terms -> top-{rows} in "
        f"{dt:.1f}s, fold-in-scan shape held (no explode, no SMJ, "
        f"stats-only broadcast)"
    )

    # ---- RRF fusion on 10x embeddings --------------------------------
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    unions = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(MULT)
    ]
    big = spread(
        reduce(lambda a, b: a.unionByName(b), unions), factor=2
    ).localCheckpoint(eager=True)
    nb = big.count()
    q = big.filter(F.col("vec_id") < 20)

    hybrid_rrf_topk(q, emb, k=5, k_cand=20).count()  # warm 1x
    t0 = time.perf_counter()
    fused = hybrid_rrf_topk(q, big, k=5, k_cand=20)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") >= 2, (
        "a rung lost its broadcast-query scan shape at 10x"
    )
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan, "rank limit no longer prunes"
    rows = fused.count()
    dt = time.perf_counter() - t0
    print(
        f"rrf: {nb} vectors ({MULT}x{n0}), 20 queries -> {rows} fused "
        f"rows in {dt:.1f}s, both rungs broadcast-query (no cartesian)"
    )


if __name__ == "__main__":
    main()
