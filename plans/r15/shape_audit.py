"""One-off audit: scan counts + DPP + join nodes for the r15 LUT
collapse + q21/bigram rewrites. Run: python plans/r15/shape_audit.py"""
import io
import os
import sys
from contextlib import redirect_stdout

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
    "similarity_topk_ivfadc",
    "similarity_recall_ivfadc",
    "similarity_topk_from_artifact",
    "similarity_ivfpq_append_probe",
    "similarity_ivfpq_delete_probe",
    "similarity_ivfpq_compact_probe",
    "similarity_topk_refine",
    "similarity_topk_pq",
    "similarity_topk_opq",
    "similarity_topk_from_opq_artifact",
    "similarity_topk_ivf_opq",
    "similarity_opq_append_probe",
    "similarity_recall_opq",
    "similarity_recall_sq8",
    "q21_waiting_suppliers",
    "text_bigram_logprob",
]

spark = build_session(
    app_name="fcs-shape-audit",
    master="local[4]",
    shuffle_partitions=8,
    extra_conf={"spark.sql.warehouse.dir": "/tmp/fcs-warehouse-audit"},
)
spark.sparkContext.setLogLevel("ERROR")
for name in QUERIES:
    try:
        df = SPECS[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(
            f"{name}: scans={count_file_scans(df)} "
            f"dpp={'dynamicpruningexpression' in plan} "
            f"bhj={plan.count('BroadcastHashJoin')} "
            f"bnlj={plan.count('BroadcastNestedLoopJoin')} "
            f"smj={plan.count('SortMergeJoin')} "
            f"shj={plan.count('ShuffledHashJoin')} "
            f"cart={'CartesianProduct' in plan} "
            f"exch={plan.count('Exchange (')} "
            f"wgl={plan.count('WindowGroupLimit')}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {e}", flush=True)
spark.stop()
