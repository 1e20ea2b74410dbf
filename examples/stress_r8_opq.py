"""r8 OPQ scale-readiness stress: rotate-then-PQ on a 10x embeddings
union (20k vectors at sf0.1), mirroring the ivfpq/ivfadc stress.

What must hold at 10x (same contracts as the 1x plan pins, now under
grown inputs whose size estimates are stale):
- the rotation build stays control-plane (power-iteration one-row
  aggregates + one energy aggregate);
- the rotated corpus materializes ONCE (ExistingRDD in the search
  plan — the concurrent Lloyd chains must not re-run the Householder
  fold per block);
- ADC LUTs broadcast, the code table never sort-merge-shuffles,
  rank-limit prunes partial;
- wall scales like the PQ family (control-plane dominated: ~1.5-2x
  for 10x data).

Run: python examples/stress_r8_opq.py   (uses $SPARK_GRAFT_SF_DIR,
default sf0.1)
"""
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_connectors_spark.operators.similarity import topk_opq
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = 10


def main() -> None:
    spark = build_session(app_name="fcs-stress-r8-opq")
    spark.sparkContext.setLogLevel("ERROR")

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
    q1 = emb.filter(F.col("vec_id") < 20)
    qb = big.filter(F.col("vec_id") < 20)

    # 1x timed reference (post-warm), then 10x
    topk_opq(q1, emb, k=5, subspaces=2, codebook_k=16, iters=2).count()
    t0 = time.perf_counter()
    topk_opq(q1, emb, k=5, subspaces=2, codebook_k=16, iters=2).count()
    t1x = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = topk_opq(qb, big, k=5, subspaces=2, codebook_k=16, iters=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "rotated corpus no longer checkpointed"
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1, (
        "corpus-sized shuffle join appeared at 10x"
    )
    assert "BroadcastHashJoin" in plan, "ADC LUTs no longer broadcast"
    rows = out.count()
    dt = time.perf_counter() - t0
    print(
        f"opq: 1x ({n0}) = {t1x:.1f}s; 10x ({nb}) -> {rows} rows in "
        f"{dt:.1f}s ({dt / t1x:.1f}x wall for 10x data); rotated "
        f"corpus checkpointed, LUTs broadcast, no corpus shuffle"
    )


if __name__ == "__main__":
    main()
