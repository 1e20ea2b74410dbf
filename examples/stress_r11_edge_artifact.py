#!/usr/bin/env python
"""r11 10x stress: the graph family's edge-list artifact under corpus
growth.

Question (the r7-r10 stress discipline): when the corpus grows 10x,
does the edge-artifact lifecycle keep its contract?

- BUILD runs the production AUTO-sized banding (`auto_lsh_bands`:
  bits = ceil(log2 N), bucket occupancy ~1) — the r5 scaling curve
  showed the pinned 16x4 test banding dying at 10x volume
  (occupancy^2 candidate blowup) while the auto path scales. The
  build is ONE pass: signature fold + band self-join + exact rescore
  + a partitioned parquet write of the pair-sized edge relation.
- PROBE (read_neardup_edges) must stay a single pushed-filter scan
  of the edge relation at ANY size — no signature stage, no band
  join, no corpus scan (the plan invariant, asserted at both
  scales).
- CONSUMERS (PageRank over the artifact) pay graph-sized work only:
  corpus growth reaches them exclusively through the edge count.

Corpus: the sf0.1 embeddings table (2,000 rows) unioned as
vec_id-shifted copies. Note the shifted copies DUPLICATE the vector
values, so near-dup edge density grows superlinearly across copies —
adversarial for the pair-sized relation, which is exactly the stress
the auto banding must absorb (wider bands -> fewer random
collisions; the true near-dups remain).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python examples/stress_r11_edge_artifact.py
Prints per-verb walls at 1x and 10x and the invariant checks; exits
nonzero on a broken invariant.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_connectors_spark.operators import similarity as S
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = build_session(app_name="fcs-stress-r11")
    spark.sparkContext.setLogLevel("ERROR")
    base = spread(load_table(spark, SF_DIR, "embeddings"))
    n = base.count()
    ok = True

    def corpus(mult: int):
        parts = [
            base.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                "embedding",
                "label",
            )
            for i in range(mult)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionAll(p)
        # materialize the synthetic corpus once so build timings
        # measure the BUILD, not the union fan-out
        return df.localCheckpoint(eager=True)

    def clock(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    for mult in (1, 10):
        df = corpus(mult)
        rows = df.count()
        path = os.path.join(
            tempfile.gettempdir(), f"fcs_stress_r11_edges_{os.getpid()}_{mult}x"
        )
        shutil.rmtree(path, ignore_errors=True)
        # production path: AUTO banding (n_planes/bits from corpus
        # size + threshold), not the 16x4 oracle-parity pins
        t_build = clock(
            lambda: S.neardup_edges_build_artifact(
                df, path, n_planes=None, bits_per_band=None,
                min_score=0.3,
            )
        )
        edges = S.read_neardup_edges(spark, path, 0.4)
        # warm-up then timed probe (codegen priced out)
        edges.count()
        t_probe = clock(edges.count)
        n_edges = S.read_neardup_edges(spark, path, 0.3).count()

        # invariant 1: probe plan is one pushed-filter scan, LSH-free
        plan = edges._jdf.queryExecution().executedPlan().toString()
        lsh_free = (
            "xxhash" not in plan.lower()
            and "ExistingRDD" not in plan
            and "GreaterThanOrEqual(score" in plan
        )
        # invariant 2: a consumer pays graph work only (PageRank over
        # the artifact; edge read checkpointed like the registered
        # queries do)
        from flink_connectors_spark.operators import dedup as D

        pairs = (
            S.read_neardup_edges(spark, path, 0.4)
            .select("id1", "id2")
            .localCheckpoint(eager=True)
        )
        pr = D.pagerank_undirected(pairs, src="id1", dst="id2", iters=2)
        t_pagerank = clock(pr.count)
        # invariant 3: below-floor probe errors
        try:
            S.read_neardup_edges(spark, path, 0.1)
            floor_guard = False
        except ValueError:
            floor_guard = True
        ok = ok and lsh_free and floor_guard
        print(
            f"{mult}x corpus={rows} edges@0.3={n_edges} "
            f"build={t_build}s probe={t_probe}s pagerank={t_pagerank}s "
            f"lsh_free={lsh_free} floor_guard={floor_guard}"
        )
        shutil.rmtree(path, ignore_errors=True)

    print("OK" if ok else "INVARIANT BROKEN")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
