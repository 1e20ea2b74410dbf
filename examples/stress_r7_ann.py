"""r7 scale-readiness stress: the new ANN + containment operators on
10x corpora (the repo's join-bearing-operator discipline — exploded
or expanded relations must not get broadcast from stale small-file
size estimates, and runtime must scale ~linearly in candidate
volume, not quadratically).

- `topk_ivfadc` / `topk_ivfpq` over a 10x embeddings union (20k
  vectors at sf0.1 x 10 disjoint id spaces): code table stays
  unshuffled, reps/probes/LUTs broadcast, wall scales with corpus.
- `ngram_containment_pairs` over a 10x documents union: the shingle
  sides must plan as SortMergeJoin (merge-pinned), never broadcast.

Run: python examples/stress_r7_ann.py   (uses $SPARK_GRAFT_SF_DIR,
default sf0.1)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_connectors_spark.operators.dedup import ngram_containment_pairs
from flink_connectors_spark.operators.similarity import topk_ivfadc, topk_ivfpq
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = 10


def main() -> None:
    spark = build_session(app_name="fcs-stress-r7-ann")
    spark.sparkContext.setLogLevel("ERROR")

    def release():
        spark.catalog.clearCache()
        for jrdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            try:
                jrdd.unpersist()
            except Exception:
                pass

    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    unions = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(MULT)
    ]
    from functools import reduce

    big = spread(
        reduce(lambda a, b: a.unionByName(b), unions), factor=2
    ).localCheckpoint(eager=True)
    n_big = big.count()
    q = big.filter(F.col("vec_id") < 20)

    for name, fn in (("ivfpq", topk_ivfpq), ("ivfadc", topk_ivfadc)):
        fn(q, emb, k=5, n_probe=2).count()  # warm codegen at 1x
        # no release() here: it would drop `big`'s checkpoint blocks
        t0 = time.perf_counter()
        out = fn(q, big, k=5, n_probe=2, subspaces=2, codebook_k=16,
                 iters=2)
        rows = out.count()
        dt = time.perf_counter() - t0
        print(f"{name}: {n_big} vectors ({MULT}x{n0}), top-5 for 20 "
              f"queries -> {rows} rows in {dt:.1f}s")

    docs = load_table(spark, SF_DIR, "documents")
    d0 = docs.count()
    dunions = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            "text", "lang", "source",
        )
        for i in range(MULT)
    ]
    dbig = spread(
        reduce(lambda a, b: a.unionByName(b), dunions), factor=2
    ).localCheckpoint(eager=True)
    nd = dbig.count()
    t0 = time.perf_counter()
    pairs = ngram_containment_pairs(
        dbig, block_cols=["lang", "source"], threshold=0.5
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, (
        "shingle side got broadcast — stale size-estimate hazard"
    )
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    print(f"containment: {nd} docs ({MULT}x{d0}) -> {n_pairs} pairs "
          f"in {dt:.1f}s, merge-pinned (no broadcast in plan)")


if __name__ == "__main__":
    main()
