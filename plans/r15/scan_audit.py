"""One-off audit: structural FileSourceScan counts for every
topk_recall_audit consumer (r14 rewrote the operator; pins must match
the audited shapes). Run: python plans/r15/scan_audit.py"""
import os
import sys

sys.path.insert(0, "/root/repo")

from flink_connectors_spark.session import build_session
from flink_connectors_spark.registry import all_specs

SPECS = all_specs()
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def count_file_scans(df) -> int:
    n = 0
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        if cls.startswith("FileSourceScan"):
            n += 1
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        subs = node.subqueries()
        for i in range(subs.size()):
            stack.append(subs.apply(i))
    return n


QUERIES = [
    "similarity_recall_audit",
    "similarity_recall_int8",
    "embedding_matryoshka_audit",
    "similarity_recall_sq8",
    "similarity_recall_ivfadc",
    "similarity_recall_onebit",
    "similarity_recall_rrf",
    "similarity_recall_opq",
]

spark = build_session(
    app_name="fcs-scan-audit",
    master="local[4]",
    shuffle_partitions=8,
    extra_conf={"spark.sql.warehouse.dir": "/tmp/fcs-warehouse-audit"},
)
for name in QUERIES:
    try:
        df = SPECS[name].fn(spark, SF_DIR)
        print(f"{name}: {count_file_scans(df)}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {e}", flush=True)
spark.stop()
