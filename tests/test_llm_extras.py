"""Behavioral tests for the r3 LLM-pipeline additions (their
cross-engine value equality is covered by test_correctness.py; these
pin the semantics the oracle can't express as neatly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_connectors_spark.operators.sampling import (
    temperature_mixture_rates,
    temperature_mixture_sample,
)
from flink_connectors_spark.operators.similarity import (
    cosine_near_dup_pairs_lsh,
)
from flink_connectors_spark.operators.text import commonness_score
from flink_connectors_spark.session import load_table


def test_temperature_mixture_upweights_low_resource(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rates = {
        r["lang"]: (r["n"], r["ppm"])
        for r in temperature_mixture_rates(d, "lang").collect()
    }
    assert all(0 < ppm <= 1_000_000 for _, ppm in rates.values())
    # alpha=0.5: smaller strata sample at a strictly higher rate
    by_n = sorted(rates.values())
    for (n1, p1), (n2, p2) in zip(by_n, by_n[1:]):
        if n1 < n2:
            assert p1 >= p2
    # and the mix is non-degenerate: not proportional sampling
    assert len({ppm for _, ppm in rates.values()}) > 1


def test_temperature_mixture_sample_hits_budget(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    total = d.count()
    got = temperature_mixture_sample(d, "lang", "doc_id", 0.5).count()
    # md5 buckets are uniform; allow generous slack on a small corpus
    assert 0.3 * total < got < 0.7 * total


def test_temperature_mixture_sample_is_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = sorted(
        r["doc_id"]
        for r in temperature_mixture_sample(d, "lang", "doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in temperature_mixture_sample(
            d.repartition(7), "lang", "doc_id"
        ).collect()
    )
    assert a == b and a


def test_commonness_score_full_vocab_is_one(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # k >= vocabulary size -> every token is "common"
    out = commonness_score(d, k=10_000).collect()
    assert out and all(r["commonness"] == 1.0 for r in out)
    assert all(r["n_tokens"] > 0 for r in out)


def test_commonness_score_small_k_discriminates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    vals = {r["commonness"] for r in commonness_score(d, k=5).collect()}
    assert len(vals) > 1
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_degree_histogram_accounts_for_every_pair_end(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_near_dup_pairs_lsh(
        emb, threshold=0.4, n_planes=16, bits_per_band=4
    )
    n_pairs = pairs.count()
    ends = pairs.select(F.col("id1").alias("v")).unionAll(
        pairs.select(F.col("id2").alias("v"))
    )
    deg = ends.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vectors"))
    mass = sum(r["degree"] * r["n_vectors"] for r in hist.collect())
    assert mass == 2 * n_pairs
