from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_connectors_spark.session import build_session

# Light up google.protobuf (and so the live transformWithStateInPandas
# test) from the container's bundled pure-python runtime when no real
# install exists — MUST run before the session fixture builds the JVM
# (workers inherit PYTHONPATH from the JVM's start environment). See
# tests/_protobuf_shim.py; a no-op where protobuf is installed.
from _protobuf_shim import ensure_protobuf

ensure_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="fcs-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/fcs-warehouse"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
