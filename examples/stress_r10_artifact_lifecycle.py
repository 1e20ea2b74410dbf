#!/usr/bin/env python
"""r10 10x stress: the persisted-index lifecycle under corpus growth.

Question the round's additions must answer before they're called
scale-ready (the r7/r8/r9 stress discipline): when the corpus grows
10x, does each lifecycle verb keep its contract?

- BUILD should scale ~linearly (two Lloyd chains + one partitioned
  write are all single linear passes; the k-row centroid collects are
  corpus-size-independent control plane).
- PROBE should keep reading n_probe/n_lists of the index bytes — the
  pruning RATIO is corpus-independent, so probe wall grows with the
  probed lists' share of the corpus, never with Lloyd cost (there is
  none: the plan is pinned Lloyd-free at any size).
- DELETE stays index-metadata-sized (an id list write).
- COMPACT is one linear anti-join pass + O(1) renames; the probe
  after compaction must return exactly the tombstone-filtered rows.
- OPQ PROBE adds one codegen'd rotation fold over the QUERY BATCH
  only — corpus growth must not touch it.

Corpus: the sf0.1 embeddings table (2,000 rows, 10 labels) unioned
as vec_id-shifted copies (labels preserved, so the inverted-list
count stays 10 and each list grows 10x — the adversarial case where
pruning buys the least). Queries: the same 20 vectors at every scale.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python examples/stress_r10_artifact_lifecycle.py
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
    spark = build_session(app_name="fcs-stress-r10")
    spark.sparkContext.setLogLevel("ERROR")
    base = spread(load_table(spark, SF_DIR, "embeddings"))
    n = base.count()

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

    # NOT checkpointed: the probe-plan invariant below asserts
    # "no ExistingRDD" (Lloyd-free), and a checkpointed query frame
    # would itself scan as ExistingRDD and mask the check
    queries = base.filter(F.col("vec_id") < 20)

    def clock(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    results: dict = {}
    failures: list[str] = []
    for mult in (1, 10):
        c = corpus(mult)
        c.count()
        path = os.path.join(
            tempfile.gettempdir(), f"fcs_stress_r10_{os.getpid()}_{mult}x"
        )
        shutil.rmtree(path, ignore_errors=True)
        r: dict = {"rows": n * mult}
        r["build"] = clock(
            lambda: S.ivfpq_build_artifact(
                c, path, subspaces=2, codebook_k=16, iters=2
            )
        )
        probe = lambda tomb=False: S.topk_from_ivfpq_artifact(  # noqa: E731
            queries, path, k=5, n_probe=2, subspaces=2, width=32,
            apply_tombstones=tomb,
        )
        probe().write.format("noop").mode("overwrite").save()  # codegen warm
        r["probe_warm"] = min(
            clock(lambda: probe().write.format("noop").mode("overwrite").save())
            for _ in range(2)
        )
        # plan invariants at every scale: Lloyd-free, DPP on codes
        plan = probe()._jdf.queryExecution().executedPlan().toString()
        if "ExistingRDD" in plan:
            failures.append(f"{mult}x: probe plan grew a Lloyd stage")
        if "dynamicpruningexpression" not in plan:
            failures.append(f"{mult}x: probe lost partition pruning")
        tombs = c.filter(
            (F.col("vec_id") % 5 == 2) & (F.col("vec_id") >= 20)
        )
        r["delete"] = clock(lambda: S.ivfpq_delete_ids(tombs, path))
        del_rows = sorted(map(tuple, probe(tomb=True).collect()))
        r["compact"] = clock(lambda: S.ivfpq_compact(spark, path))
        post_rows = sorted(map(tuple, probe().collect()))
        if post_rows != del_rows:
            failures.append(f"{mult}x: compacted probe != tombstone probe")
        # OPQ probe: corpus growth must not touch the query-batch fold
        opath = path + "_opq"
        shutil.rmtree(opath, ignore_errors=True)
        r["opq_build"] = clock(
            lambda: S.opq_build_artifact(
                c, opath, subspaces=2, codebook_k=16, iters=2,
                pca_iters=2, dims=64,
            )
        )
        oprobe = lambda: S.topk_from_opq_artifact(  # noqa: E731
            queries, opath, k=5, n_probe=2, subspaces=2, width=32
        )
        oprobe().write.format("noop").mode("overwrite").save()
        r["opq_probe_warm"] = min(
            clock(lambda: oprobe().write.format("noop").mode("overwrite").save())
            for _ in range(2)
        )
        results[f"{mult}x"] = r
        print(f"{mult}x: {r}", flush=True)
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(opath, ignore_errors=True)

    b1, b10 = results["1x"]["build"], results["10x"]["build"]
    p1, p10 = results["1x"]["probe_warm"], results["10x"]["probe_warm"]
    print(
        f"build 10x/1x = {b10 / b1:.2f}x wall; "
        f"probe 10x/1x = {p10 / p1:.2f}x wall; "
        f"opq probe 10x/1x = "
        f"{results['10x']['opq_probe_warm'] / results['1x']['opq_probe_warm']:.2f}x"
    )
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL INVARIANTS HELD")
    spark.stop()


if __name__ == "__main__":
    main()
