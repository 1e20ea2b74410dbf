"""r7-continuation scale-readiness stress: the new graph and packing
operators on 10x corpora (the join-bearing-operator discipline — the
common-neighbor self-join must scale with sum(deg^2) of the pair
list, not corpus size, and the first-fit chains must stay bounded so
the sequential unit never grows with the corpus).

- `link_prediction_jaccard` over a 10x PAIR LIST: the 1x LSH pair
  list unioned as 10 id-shifted copies (disjoint components by
  construction — exactly 10x edge volume, per-node degrees
  unchanged). The LSH build itself is NOT the unit under test here:
  growing the corpus under a FIXED 16x4 banding multiplies bucket
  occupancy and blows the candidate join up quadratically (measured:
  the shuffle-hash v-join build exhausts execution memory at 10x —
  that is the auto_lsh_bands sizing contract being violated, the
  SCALING.md hazard, not a link-prediction property). Replicating
  the pair list isolates the graph operator: wall must scale
  ~linearly with pair volume and the common-neighbor join must stay
  keyed (no nested-loop blowup).
- `pack_firstfit` over a 10x documents union: chain count grows
  10x, chain SIZE stays <= 256 — wall is the chain-keyed shuffle +
  parallel Arrow folds, so 10x data must cost far less than 10x
  wall on 32 cores.

Run: python examples/stress_r7b_graph_pack.py  (uses
$SPARK_GRAFT_SF_DIR, default sf0.1)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_connectors_spark.operators.sequence import pack_firstfit
from flink_connectors_spark.operators.similarity import (
    cosine_near_dup_pairs_lsh,
    link_prediction_jaccard,
)
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = 10


def main() -> None:
    spark = build_session(app_name="fcs-stress-r7b")
    spark.sparkContext.setLogLevel("ERROR")

    # --- link prediction at 1x and 10x pair volume -------------------
    emb = load_table(spark, SF_DIR, "embeddings")
    base_pairs = (
        cosine_near_dup_pairs_lsh(
            emb, threshold=0.3, n_planes=16, bits_per_band=4
        )
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    for mult in (1, MULT):
        sides = [
            base_pairs.select(
                (F.col("id1") + F.lit(i * 1_000_000)).alias("id1"),
                (F.col("id2") + F.lit(i * 1_000_000)).alias("id2"),
            )
            for i in range(mult)
        ]
        u = sides[0]
        for s in sides[1:]:
            u = u.unionAll(s)
        t0 = time.time()
        pairs = spread(u).localCheckpoint(eager=True)
        n_pairs = pairs.count()
        out = link_prediction_jaccard(pairs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_pred = out.count()
        dt = time.time() - t0
        assert "BroadcastNestedLoopJoin" not in plan, (
            "common-neighbor join degenerated to a nested loop"
        )
        print(
            f"link_prediction x{mult}: pairs={n_pairs} "
            f"predicted={n_pred} wall={dt:.1f}s"
        )

    # --- first-fit packing at 1x and 10x chain count -----------------
    from flink_connectors_spark.functions import tokenize

    docs = load_table(spark, SF_DIR, "documents")
    for mult in (1, MULT):
        sides = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
                "source",
            )
            for i in range(mult)
        ]
        u = sides[0]
        for s in sides[1:]:
            u = u.unionAll(s)
        d = spread(u).select(
            "doc_id",
            "source",
            (F.col("doc_id") / 256).cast("bigint").alias("bucket"),
            F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        t0 = time.time()
        packed = pack_firstfit(
            d, budget=2048, chain_cols=("source", "bucket")
        )
        agg = packed.groupBy().agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source", "bucket", "pack_no").alias("n_packs"),
            F.max("fill_after").alias("max_fill"),
        ).collect()[0]
        dt = time.time() - t0
        print(
            f"pack_firstfit x{mult}: docs={agg['n_docs']} "
            f"packs={agg['n_packs']} max_fill={agg['max_fill']} "
            f"wall={dt:.1f}s"
        )


if __name__ == "__main__":
    main()
