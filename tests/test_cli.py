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


def test_cli_oracle_print_and_full_coverage():
    rc, out = _run(["oracle", "q6_revenue_forecast"])
    assert rc == 0 and "SELECT" in out
    # r2: the approx aggregates gained error-bound oracles, leaving
    # ZERO rows-only queries — every registered query is value-checked
    from flink_connectors_spark.registry import all_specs

    assert [n for n, s in all_specs().items() if s.oracle is None] == []
    rc, out = _run(["oracle", "agg_approx_distinct"])
    assert rc == 0 and "within_bound" in out


def test_cli_verify_single_query(spark, sf_dir):
    rc, out = _run(["verify", "q6_revenue_forecast", "--sf-dir", sf_dir])
    assert rc == 0 and "MATCH" in out


def test_bench_headline_names_registered():
    """bench.py's HEADLINE set must stay a subset of the registry —
    a renamed query would make the driver's per-round bench crash.
    The first 23 names are frozen for round-over-round comparison."""
    import bench

    from flink_connectors_spark.registry import all_specs

    specs = all_specs()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, missing
    frozen = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
        "q6_revenue_forecast", "q10_returned_items", "q21_waiting_suppliers",
        "window_rank_per_group", "join_asof_last_view",
        "pivot_daily_event_values", "stream_session_windows",
        "sink_replacing_state", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash", "similarity_topk_bruteforce", "similarity_topk_ivf",
        "similarity_topk_rplsh", "text_quality_score", "text_feature_hashing",
        "multimodal_features", "pipeline_clean_corpus",
        "funnel_signup_click_purchase", "resample_gapfill_hourly",
    ]
    assert bench.HEADLINE[: len(frozen)] == frozen


def test_cli_verify_all_subset(spark, sf_dir):
    """verify-all sweeps a name subset in one session with per-query
    state release — the repeatable form of the cross-SF hardening
    sweep (round-close hygiene: run once per sf dir; fixture-masked
    order-statistic divergences only show up across corpus sizes)."""
    rc, out = _run(
        [
            "verify-all",
            "--sf-dir",
            sf_dir,
            "--names",
            "dedup_exact,sort_limit_topk",
        ]
    )
    assert rc == 0
    assert "2/2 matched" in out
    assert out.count("MATCH") == 2


def test_cli_verify_all_reports_mismatch(spark, sf_dir, monkeypatch):
    """The sweep must FAIL loudly on a wrong oracle — exit 1 and a
    MISMATCH line — not report a polite success. Doctors one spec's
    oracle to return an extra row."""
    import dataclasses

    from flink_connectors_spark import registry

    specs = dict(registry.all_specs())
    good = specs["sort_limit_topk"]
    assert "LIMIT 25" in good.oracle
    specs["sort_limit_topk"] = dataclasses.replace(
        good, oracle=good.oracle.replace("LIMIT 25", "LIMIT 24")
    )
    monkeypatch.setattr(
        "flink_connectors_spark.__main__._specs", lambda: specs
    )
    rc, out = _run(
        ["verify-all", "--sf-dir", sf_dir, "--names", "sort_limit_topk"]
    )
    assert rc == 1
    assert "MISMATCH" in out and "FAILED: sort_limit_topk" in out
