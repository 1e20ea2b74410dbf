#!/usr/bin/env python
"""r15 generic A/B harness: time a set of registry queries in ONE
fresh JVM with bench-identical prep (warm-up, table prescan, worker
prefork), per round each query 3x back-to-back (cold first, warm =
min of next two), canary per round, GC at query boundaries only.

Arm selection: FCS_AB_TREE points at the tree root to import the
engine from (the working tree, or a git worktree of the round-open
commit). Drive order-balanced A B B A across processes and compare
warm medians at equal canary.

Usage:
  FCS_AB_TREE=/root/repo python examples/ab_r15.py \
      [--rounds N] [--sf-dir DIR] name1 name2 ...
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


def main() -> None:
    args = sys.argv[1:]
    rounds = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    names = args
    assert names, "pass query names"

    spark = build_session(app_name="fcs-ab-r15")
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
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        release()
        return dt

    run("q3_shipping_priority")
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()
    release()
    spark.range(256).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict = {
        "tree": TREE,
        "sf_dir": sf_dir,
        "canary": [],
        **{f"{n}_cold": [] for n in names},
        **{f"{n}_warm": [] for n in names},
    }
    for r in range(rounds):
        gc()
        out["canary"].append(canary())
        for name in names:
            gc()
            cold = run(name)
            warm = min(run(name), run(name))
            out[f"{name}_cold"].append(cold)
            out[f"{name}_warm"].append(warm)
    for name in names:
        ts = sorted(out[f"{name}_warm"])
        out[f"{name}_warm_median"] = ts[len(ts) // 2]
    out["canary_median"] = sorted(out["canary"])[len(out["canary"]) // 2]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
