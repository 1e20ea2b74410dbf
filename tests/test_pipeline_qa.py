"""Semantic property tests for the r3 pipeline-QA operators — checks
the *invariants* the docstrings promise (the oracle comparison in
test_correctness.py proves cross-engine equality; these prove the
numbers mean what they claim).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_connectors_spark.operators.sampling import global_shuffle_order
from flink_connectors_spark.operators.similarity import norm_audit
from flink_connectors_spark.operators.text import token_entropy
from flink_connectors_spark.session import load_table


def test_global_shuffle_is_dense_stable_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n_in = docs.count()
    out = global_shuffle_order(docs, "doc_id", 8)
    rows = out.collect()
    # a permutation: every input row appears exactly once
    assert len(rows) == n_in
    assert len({r["doc_id"] for r in rows}) == n_in
    # shard in range; pos dense 1..count within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # deterministic: a second evaluation yields the identical layout
    again = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in global_shuffle_order(docs, "doc_id", 8).collect()
    }
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in rows} == again


def test_token_entropy_bounds_and_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # zero entropy
            (2, "a b c d"),  # max entropy = log2(4)
            (3, "a a b b"),  # 1 bit
            (4, "x"),  # single token -> 0, not -0.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["entropy_bits"] == 0.0
    assert abs(got[2]["entropy_bits"] - 2.0) < 1e-9
    assert abs(got[3]["entropy_bits"] - 1.0) < 1e-9
    assert got[4]["entropy_bits"] == 0.0
    assert math.copysign(1.0, got[4]["entropy_bits"]) == 1.0, "-0.0 leaked"
    # bounds: 0 <= H <= log2(n_distinct) for every real document
    for r in got.values():
        assert 0.0 <= r["entropy_bits"] <= math.log2(max(r["n_distinct"], 2)) + 1e-9


def test_norm_audit_matches_bruteforce_and_flags_zero_vectors(spark):
    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0], 0),  # norm 5
            (2, [0.0, 0.0], 0),  # zero vector
            (3, [1.0, 0.0], 1),  # norm 1
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["group"]: r for r in norm_audit(df).collect()}
    g0 = got[0]
    assert g0["n_vecs"] == 2 and g0["n_zero_norm"] == 1
    assert g0["sum_norm_micros"] == 5_000_000
    assert g0["min_norm_micros"] == 0
    assert g0["max_norm_micros"] == 5_000_000
    assert abs(g0["avg_norm"] - 2.5) < 1e-9
    g1 = got[1]
    assert g1["n_vecs"] == 1 and g1["n_zero_norm"] == 0
    assert g1["sum_norm_micros"] == 1_000_000


def test_pack_efficiency_totals_reconcile_with_corpus(spark, sf_dir):
    from flink_connectors_spark.plans.llm_ops import (
        pipeline_pack_efficiency,
        pipeline_sequence_packing,
    )

    packed = pipeline_sequence_packing(spark, sf_dir)
    eff = pipeline_pack_efficiency(spark, sf_dir)
    tot = eff.agg(
        F.sum("n_docs").alias("d"), F.sum("total_tokens").alias("t")
    ).collect()[0]
    base = packed.agg(
        F.count(F.lit(1)).alias("d"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert (tot["d"], tot["t"]) == (base["d"], base["t"])
    for r in eff.collect():
        assert 0 <= r["n_straddlers"] <= r["n_docs"]
        assert r["n_packs"] >= 1


def test_histogram_quantiles_match_model(spark):
    """Bucket-resolution quantile bounds vs a pure-Python model over
    an awkward distribution (duplicates, edge values, one outlier
    clamped into the top bucket): the integer cut cum*100 >= n*q must
    agree with the model exactly, and the true quantile must lie
    within one bucket width below the reported bound."""
    import datetime
    import math

    from flink_connectors_spark.operators.rollup import (
        build_value_histogram,
        histogram_quantiles,
    )

    values = (
        [0.0] * 5 + [9.99] * 3 + [10.0] * 7 + [55.5] * 4 + [639.99] * 2
        + [9999.0]  # clamps into the last bucket
    )
    ts = datetime.datetime(2024, 1, 15, 12, 0, 0)
    df = spark.createDataFrame(
        [(ts, "et", v) for v in values], "ts timestamp, event_type string, value double"
    )
    hist = build_value_histogram(df, grain="day")
    got = histogram_quantiles(hist).collect()[0]

    cents = sorted(
        min(max(round(v * 100), 0), 63999) for v in values
    )
    n = len(cents)
    for q in (50, 95, 99):
        target = math.ceil(n * q / 100)
        true_cent = cents[target - 1]
        model_ub = (true_cent // 1000 + 1) * 1000
        assert got[f"p{q}_ub_cents"] == model_ub, (q, got)
        assert model_ub - 1000 <= true_cent < model_ub
