"""CLI smoke tests (in-process — reuses the session fixture's JVM)."""

from __future__ import annotations

import contextlib
import io

from flink_connectors_spark.__main__ import main


def _run(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_cli_list_and_tag_filter():
    rc, out = _run(["list"])
    assert rc == 0 and "q1_pricing_summary" in out
    rc, out = _run(["list", "--tag", "asof"])
    assert rc == 0
    assert "join_asof_last_view" in out and "q1_pricing_summary" not in out


def test_cli_oracle_print_and_rows_only():
    rc, out = _run(["oracle", "q6_revenue_forecast"])
    assert rc == 0 and "SELECT" in out
    rc, out = _run(["oracle", "agg_approx_distinct"])
    assert rc == 1 and "rows-only" in out


def test_cli_verify_single_query(spark, sf_dir):
    rc, out = _run(["verify", "q6_revenue_forecast", "--sf-dir", sf_dir])
    assert rc == 0 and "MATCH" in out
