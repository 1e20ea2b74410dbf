"""Split construction vs execution time for named queries at sf0.1 —
bench-identical prep, 3 runs each (cold + 2 warm), per-run split:
t_construct = specs[name].fn(...) wall, t_exec = noop write wall.

Usage: python plans/r15/profile_split.py name1 name2 ...
"""
import json
import os
import sys
import time

TREE = os.environ.get("FCS_AB_TREE", "/root/repo")
sys.path.insert(0, TREE)

from flink_connectors_spark.registry import all_specs  # noqa: E402
from flink_connectors_spark.session import (  # noqa: E402
    TABLES, build_session, load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = build_session(app_name="fcs-profile-split")
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


def run(name: str) -> tuple[float, float]:
    t0 = time.perf_counter()
    df = specs[name].fn(spark, SF_DIR)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    release()
    return round(t1 - t0, 3), round(t2 - t1, 3)


run("q3_shipping_priority")
for t in TABLES:
    load_table(spark, SF_DIR, t).write.format("noop").mode(
        "overwrite"
    ).save()
release()
spark.range(256).repartition(8).mapInPandas(
    lambda it: it, "id long"
).write.format("noop").mode("overwrite").save()

t0 = time.perf_counter()
spark.range(400_000_000).selectExpr("sum(id * 3 + (id % 7)) AS s").collect()
print(json.dumps({"canary": round(time.perf_counter() - t0, 3)}), flush=True)

for name in sys.argv[1:]:
    gc()
    runs = [run(name) for _ in range(3)]
    print(json.dumps({"name": name, "runs": runs}), flush=True)
spark.stop()
