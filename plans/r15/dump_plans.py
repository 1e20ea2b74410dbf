"""Dump .explain("formatted") for the round's touched queries.

Usage:
  FCS_AB_TREE=/tmp/fcs_r15_base SUFFIX=before python plans/r15/dump_plans.py q1 q2 ...
  FCS_AB_TREE=/root/repo       SUFFIX=after  python plans/r15/dump_plans.py q1 q2 ...

Writes /root/repo/plans/r15/<query>_<suffix>.txt
"""
import io
import os
import sys
from contextlib import redirect_stdout

TREE = os.environ.get("FCS_AB_TREE", "/root/repo")
SUFFIX = os.environ.get("SUFFIX", "after")
sys.path.insert(0, TREE)

from flink_connectors_spark.session import build_session  # noqa: E402
from flink_connectors_spark.registry import all_specs  # noqa: E402

SPECS = all_specs()
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
OUT = "/root/repo/plans/r15"

spark = build_session(
    app_name="fcs-dump-plans",
    master="local[4]",
    shuffle_partitions=8,
    extra_conf={"spark.sql.warehouse.dir": "/tmp/fcs-warehouse-dump"},
)
spark.sparkContext.setLogLevel("ERROR")
for name in sys.argv[1:]:
    try:
        df = SPECS[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: ok", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {e}", flush=True)
spark.stop()
