#!/usr/bin/env python
"""r14 adjudication harness for the r13 verdict's two open perf
signals (VERDICT r13 "Next #1/#5"):

1. The OPQ family moved together in the r13 graded run
   (`similarity_topk_opq` 1.57->2.28, `similarity_recall_opq`
   2.04->2.48, `similarity_topk_ivf_opq` 1.80->1.99) on a 0.511 ann
   canary (reference 0.48). The family's own code is byte-identical
   to r12 (`git diff 5d3a92b..HEAD -- plans/llm_ops3.py` is changed=
   bumps only) and the OPQ read path does NOT go through the r13
   partitioned-read seam (its relations are flat parquet under the
   artifact root), so the prior is host-window — but the verdict is
   right that a whole family moving together warrants the A/B.
2. `sql_text_window_sessions` +0.36 s (0.52->0.87) on untouched code.

Method (v3 discipline + r13 A/B hygiene from SCALING.md): ONE fresh
JVM per arm invocation, bench-identical prep (warm-up query, table
prescan, worker prefork), per round each query runs 3x back-to-back
(cold first, warm = min of next two), canary per round, GC at query
boundaries only. ORDER-BALANCED across processes: drive as
A B B A (arm = tree root via $FCS_AB_TREE) with nothing else on the
host; compare warm medians and the last A/B pair via the canary.

Usage: FCS_AB_TREE=/root/repo python examples/ab_r14_opq.py [--rounds N]
"""

from __future__ import annotations

import json
import os
import sys
import time

TREE = os.environ.get(
    "FCS_AB_TREE",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, TREE)

from flink_connectors_spark.registry import all_specs  # noqa: E402
from flink_connectors_spark.session import (  # noqa: E402
    TABLES, build_session, load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = (
    "similarity_topk_opq",
    "similarity_topk_from_opq_artifact",
    "sql_text_window_sessions",
)


def main() -> None:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    spark = build_session(app_name="fcs-ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    def release() -> None:
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                try:
                    jrdd.unpersist()
                except Exception:
                    pass
        except Exception:
            pass

    def gc() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(400_000_000).selectExpr(
            "sum(id * 3 + (id % 7)) AS s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        release()
        return dt

    run("q3_shipping_priority")
    for t in TABLES:
        load_table(spark, SF_DIR, t).write.format("noop").mode(
            "overwrite"
        ).save()
    release()
    spark.range(256).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict = {
        "tree": TREE,
        "sf_dir": SF_DIR,
        "canary": [],
        **{f"{n}_cold": [] for n in NAMES},
        **{f"{n}_warm": [] for n in NAMES},
    }
    for r in range(rounds):
        gc()
        c = canary()
        out["canary"].append(c)
        print(f"round {r}: canary {c}", flush=True)
        for name in NAMES:
            gc()
            cold = run(name)
            warm = min(run(name), run(name))
            out[f"{name}_cold"].append(cold)
            out[f"{name}_warm"].append(warm)
            print(f"round {r}: {name} cold {cold} warm {warm}",
                  flush=True)

    # HEAD-only: price the artifact OPEN path the verdict fingered
    # (manifest read + committed-parts listing + pointer resolution)
    # on the OPQ artifact this very process just built. NOTE: the
    # manifest cache is already primed by the probes above, so this
    # measures the WARM open path — exactly what the warm-regression
    # adjudication needs, but NOT a cold/cross-process first open
    # (that pays one real manifest parquet read).
    try:
        from flink_connectors_spark.operators import artifacts as A
        from flink_connectors_spark.operators.similarity import (
            read_artifact_manifest,
        )

        path = A.artifact_path(spark, "ann_opq", SF_DIR)
        if os.path.isdir(path) and hasattr(A, "committed_parts"):
            t0 = time.perf_counter()
            n = 200
            for _ in range(n):
                read_artifact_manifest(spark, path)
                A.committed_parts(path)
                A.resolve_rel_dir(path, "codes")
            out["open_path_ms_per_call"] = round(
                (time.perf_counter() - t0) * 1000.0 / n, 4
            )
    except Exception as exc:  # r12 arm lacks the seam — fine
        out["open_path_err"] = repr(exc)

    for name in NAMES:
        ts = sorted(out[f"{name}_warm"])
        out[f"{name}_warm_median"] = ts[len(ts) // 2]
    out["canary_median"] = sorted(out["canary"])[len(out["canary"]) // 2]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
