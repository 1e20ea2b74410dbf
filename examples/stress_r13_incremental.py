#!/usr/bin/env python
"""Stress for the r13 incremental-ingest lifecycle: the tokenized-
corpus, near-dup edge, and MinHash pair artifacts under multi-day
append loops at 1x and 4x corpus scale, plus the rename-free commit
backend.

Claim under test (the 100 TB argument): once an artifact exists,
APPENDING a fixed-size nightly batch costs O(batch) — flat in the
STANDING CORPUS size — while a from-scratch rebuild is corpus-linear.
A nightly delta job over a 100 TB corpus must not get slower as the
corpus grows; this is the difference between a nightly delta and a
nightly full re-tokenize (r12 verdict Next #1/#3).

Shape: the standing corpus is the base corpus (1x) or a 4x
shifted-id union (4x — duplicate-heavy, the worst case for pair
relations); the nightly batch is the SAME fixed slice in both runs.
For each family:

- build the standing index at each scale (corpus-linear, reported);
- append the fixed batch three times (distinct batch ids, disjoint
  id ranges) — wall per append reported; the 4x/1x append ratio must
  stay far below the 4x corpus ratio (the O(batch) claim; the edge /
  pair candidates DO grow with bucket occupancy, so the bound is
  "well below corpus-linear", checked loosely at < 2.5x);
- correctness at every step: the committed view equals the
  from-scratch build over the same rows (unigram counts for grams;
  edge/pair sets for the LSH families);
- compact mid-loop and re-verify (storage folding, no semantic
  change);
- the final loop runs under FCS_COMMIT_BACKEND=pointer to prove the
  lifecycle holds with zero directory renames.

Run:  python examples/stress_r13_incremental.py [SF_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from flink_connectors_spark.operators import dedup as D
from flink_connectors_spark.operators import similarity as S
from flink_connectors_spark.operators import text as T
from flink_connectors_spark.session import build_session, load_table


def _shifted_union(df, id_col: str, copies: int):
    out = df
    for i in range(1, copies):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000))
        )
    return out


def _clock(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def _batches(df, id_col: str, n: int = 3):
    """Three disjoint fixed-size batches with ids far above any
    corpus id (append contract: batch ids are NEW)."""
    out = []
    for i in range(n):
        out.append(
            df.withColumn(
                id_col, F.col(id_col) + F.lit((100 + i) * 10_000_000)
            )
        )
    return out


def stress_grams(spark, docs, batch_src, scale_tag: str) -> dict:
    path = tempfile.mkdtemp(prefix=f"fcs_s13_grams_{scale_tag}_")
    try:
        t_build = _clock(
            lambda: T.corpus_grams_build_artifact(docs, path)
        )
        t_appends = []
        appended = docs
        for i, b in enumerate(_batches(batch_src, "doc_id")):
            t_appends.append(
                _clock(
                    lambda b=b, i=i: T.corpus_grams_append(
                        b, path, f"night{i}"
                    )
                )
            )
            appended = appended.unionByName(b)
            if i == 1:
                T.corpus_grams_compact(spark, path)
        # committed view == from-scratch over the same rows
        got = sorted(
            tuple(r)
            for r in T.read_corpus_grams(spark, path, "unigrams").collect()
        )
        ref_path = tempfile.mkdtemp(prefix="fcs_s13_gref_")
        try:
            T.corpus_grams_build_artifact(appended, ref_path)
            want = sorted(
                tuple(r)
                for r in T.read_corpus_grams(
                    spark, ref_path, "unigrams"
                ).collect()
            )
        finally:
            shutil.rmtree(ref_path, ignore_errors=True)
        assert got == want, f"grams {scale_tag}: append != rebuild"
        return {"build": t_build, "appends": t_appends}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def stress_edges(spark, emb, batch_src, scale_tag: str) -> dict:
    path = tempfile.mkdtemp(prefix=f"fcs_s13_edges_{scale_tag}_")
    try:
        t_build = _clock(
            lambda: S.neardup_edges_build_artifact(
                emb, path, n_planes=16, bits_per_band=4, min_score=0.3
            )
        )
        t_appends = []
        indexed = emb
        for i, b in enumerate(_batches(batch_src, "vec_id")):
            t_appends.append(
                _clock(
                    lambda b=b, i=i, idx=indexed:
                    S.neardup_edges_append(b, idx, path, f"night{i}")
                )
            )
            indexed = indexed.unionByName(b)
            if i == 1:
                S.neardup_edges_compact(spark, path)
        got = S.read_neardup_edges(spark, path, threshold=0.3).count()
        ref_path = tempfile.mkdtemp(prefix="fcs_s13_eref_")
        try:
            S.neardup_edges_build_artifact(
                indexed, ref_path, n_planes=16, bits_per_band=4,
                min_score=0.3,
            )
            want = S.read_neardup_edges(
                spark, ref_path, threshold=0.3
            ).count()
        finally:
            shutil.rmtree(ref_path, ignore_errors=True)
        assert got == want, f"edges {scale_tag}: append != rebuild"
        return {"build": t_build, "appends": t_appends}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def stress_pairs(spark, docs, batch_src, scale_tag: str) -> dict:
    path = tempfile.mkdtemp(prefix=f"fcs_s13_pairs_{scale_tag}_")
    try:
        t_build = _clock(
            lambda: D.minhash_pairs_build_artifact(
                docs, path, min_jac=0.5
            )
        )
        t_appends = []
        appended = docs
        for i, b in enumerate(_batches(batch_src, "doc_id")):
            t_appends.append(
                _clock(
                    lambda b=b, i=i: D.minhash_pairs_append(
                        b, path, f"night{i}", min_jac=0.5
                    )
                )
            )
            appended = appended.unionByName(b)
            if i == 1:
                D.minhash_pairs_compact(spark, path)
        got = D.read_minhash_pairs(spark, path, threshold=0.5).count()
        ref_path = tempfile.mkdtemp(prefix="fcs_s13_pref_")
        try:
            D.minhash_pairs_build_artifact(
                appended, ref_path, min_jac=0.5
            )
            want = D.read_minhash_pairs(
                spark, ref_path, threshold=0.5
            ).count()
        finally:
            shutil.rmtree(ref_path, ignore_errors=True)
        assert got == want, f"pairs {scale_tag}: append != rebuild"
        return {"build": t_build, "appends": t_appends}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def stress_containment(spark, docs, batch_src, scale_tag: str) -> dict:
    path = tempfile.mkdtemp(prefix=f"fcs_s13_contain_{scale_tag}_")
    bc = ["lang", "source"]
    try:
        t_build = _clock(
            lambda: D.containment_pairs_build_artifact(
                docs, path, block_cols=bc, min_score=0.5
            )
        )
        t_appends = []
        appended = docs
        for i, b in enumerate(_batches(batch_src, "doc_id")):
            t_appends.append(
                _clock(
                    lambda b=b, i=i: D.containment_pairs_append(
                        b, path, f"night{i}", block_cols=bc,
                        min_score=0.5,
                    )
                )
            )
            appended = appended.unionByName(b)
            if i == 1:
                D.containment_pairs_compact(spark, path)
        got = D.read_containment_pairs(
            spark, path, threshold=0.5
        ).count()
        ref_path = tempfile.mkdtemp(prefix="fcs_s13_cref_")
        try:
            D.containment_pairs_build_artifact(
                appended, ref_path, block_cols=bc, min_score=0.5
            )
            want = D.read_containment_pairs(
                spark, ref_path, threshold=0.5
            ).count()
        finally:
            shutil.rmtree(ref_path, ignore_errors=True)
        assert got == want, (
            f"containment {scale_tag}: append != rebuild"
        )
        return {"build": t_build, "appends": t_appends}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def stress_countmin(spark, li, batch_src, scale_tag: str) -> dict:
    """r14: the SUM-monoid sketch family — appends re-sketch only the
    batch into a ≤ d*w-row partial, so the cost is batch-scan-bounded
    and the 4x standing corpus should not move it at all."""
    from flink_connectors_spark.operators import scale as SC

    path = tempfile.mkdtemp(prefix=f"fcs_s14_cms_{scale_tag}_")
    try:
        t_build = _clock(
            lambda: SC.countmin_build_artifact(li, path, "l_partkey")
        )
        t_appends = []
        appended = li
        for i, b in enumerate(_batches(batch_src, "l_orderkey")):
            t_appends.append(
                _clock(
                    lambda b=b, i=i: SC.countmin_append(
                        b, path, f"night{i}", "l_partkey"
                    )
                )
            )
            appended = appended.unionByName(b)
            if i == 1:
                SC.countmin_compact(spark, path)
        got = sorted(
            tuple(r)
            for r in SC.read_countmin_counters(spark, path).collect()
        )
        ref_path = tempfile.mkdtemp(prefix="fcs_s14_cmsref_")
        try:
            SC.countmin_build_artifact(appended, ref_path, "l_partkey")
            want = sorted(
                tuple(r)
                for r in SC.read_countmin_counters(
                    spark, ref_path
                ).collect()
            )
        finally:
            shutil.rmtree(ref_path, ignore_errors=True)
        assert got == want, f"countmin {scale_tag}: append != rebuild"
        return {"build": t_build, "appends": t_appends}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def stress_bloom(spark, docs, batch_src, scale_tag: str) -> dict:
    """r14: the OR-monoid family. The nightly batches deliberately
    OVERLAP the standing set (identical fingerprints) — OR is
    idempotent, so the family must absorb that, unlike the SUM
    families."""
    from flink_connectors_spark.operators import scale as SC

    fps = docs.select(F.md5(F.col("text")).alias("fp"))
    batch = batch_src.select(F.md5(F.col("text")).alias("fp"))
    m = SC.auto_bloom_bits(fps.count())
    path = tempfile.mkdtemp(prefix=f"fcs_s14_bloom_{scale_tag}_")
    try:
        t_build = _clock(
            lambda: SC.bloom_words_build_artifact(fps, path, m)
        )
        t_appends = []
        for i in range(3):
            t_appends.append(
                _clock(
                    lambda i=i: SC.bloom_words_append(
                        batch, path, f"night{i}"
                    )
                )
            )
            if i == 1:
                SC.bloom_words_compact(spark, path)
        got = SC.read_bloom_bitmap(spark, path).first()["bf"]
        ref_path = tempfile.mkdtemp(prefix="fcs_s14_bloomref_")
        try:
            SC.bloom_words_build_artifact(
                fps.unionByName(batch), ref_path, m
            )
            want = SC.read_bloom_bitmap(spark, ref_path).first()["bf"]
        finally:
            shutil.rmtree(ref_path, ignore_errors=True)
        assert got == want, f"bloom {scale_tag}: append != rebuild"
        return {"build": t_build, "appends": t_appends}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def stress_hll(spark, ev, batch_src, scale_tag: str) -> dict:
    """r14: the MAX-monoid family — overlapping user batches max into
    the same registers; the committed view must equal the rebuild
    register-for-register."""
    from flink_connectors_spark.operators import scale as SC

    path = tempfile.mkdtemp(prefix=f"fcs_s14_hll_{scale_tag}_")
    try:
        t_build = _clock(
            lambda: SC.hll_build_artifact(ev, path, "user_id")
        )
        t_appends = []
        appended = ev
        for i in range(3):
            t_appends.append(
                _clock(
                    lambda i=i: SC.hll_append(
                        batch_src, path, f"night{i}", "user_id"
                    )
                )
            )
            appended = appended.unionByName(batch_src)
            if i == 1:
                SC.hll_compact(spark, path)
        got = sorted(
            tuple(r)
            for r in SC.read_hll_registers(spark, path).collect()
        )
        ref_path = tempfile.mkdtemp(prefix="fcs_s14_hllref_")
        try:
            SC.hll_build_artifact(appended, ref_path, "user_id")
            want = sorted(
                tuple(r)
                for r in SC.read_hll_registers(
                    spark, ref_path
                ).collect()
            )
        finally:
            shutil.rmtree(ref_path, ignore_errors=True)
        assert got == want, f"hll {scale_tag}: append != rebuild"
        return {"build": t_build, "appends": t_appends}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="stress-r13-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    ev = load_table(spark, sf_dir, "events").select("user_id")
    # fixed nightly batch: one fifth of the base corpus, both scales
    doc_batch = docs.filter(F.col("doc_id") % 5 == 0)
    emb_batch = emb.filter(F.col("vec_id") % 5 == 0)
    li_batch = li.filter(F.col("l_orderkey") % 5 == 0)
    ev_batch = ev.filter(F.col("user_id") % 5 == 0)

    results: dict[str, dict] = {}
    # per-family append-cost bounds under 4x corpus growth: the LSH /
    # tokenize families are bucket-occupancy bounded (near-flat); the
    # BLOCKED containment family's candidates are batch x block-mates,
    # so its append legitimately grows with block occupancy — the
    # bound there is "clearly below the candidate-volume growth", not
    # flat (at 100 TB the fix is finer blocking or prefix filtering,
    # which `dedup_containment_rare_shingle` implements).
    bounds = {
        "grams": 2.5, "edges": 2.5, "pairs": 2.5, "contain": 5.0,
        # the r14 sketch monoids: appends are a batch scan into a
        # bounded-domain aggregate — near-flat by construction
        "countmin": 2.5, "bloom": 2.5, "hll": 2.5,
    }
    for fam, fn, base, batch, id_col in (
        ("grams", stress_grams, docs, doc_batch, "doc_id"),
        ("edges", stress_edges, emb, emb_batch, "vec_id"),
        ("pairs", stress_pairs, docs, doc_batch, "doc_id"),
        ("contain", stress_containment, docs, doc_batch, "doc_id"),
        ("countmin", stress_countmin, li, li_batch, "l_orderkey"),
        ("bloom", stress_bloom, docs, doc_batch, "doc_id"),
        ("hll", stress_hll, ev, ev_batch, "user_id"),
    ):
        r1 = fn(spark, base, batch, "1x")
        r4 = fn(spark, _shifted_union(base, id_col, 4), batch, "4x")
        a1 = min(r1["appends"][1:]) if len(r1["appends"]) > 1 else r1["appends"][0]
        a4 = min(r4["appends"][1:]) if len(r4["appends"]) > 1 else r4["appends"][0]
        ratio = a4 / a1 if a1 > 0 else float("inf")
        results[fam] = {
            "build_1x": r1["build"], "build_4x": r4["build"],
            "append_1x": a1, "append_4x": a4,
            "append_ratio_4x_over_1x": round(ratio, 2),
        }
        print(
            f"{fam:7s} build 1x={r1['build']:7.2f}s 4x={r4['build']:7.2f}s | "
            f"append 1x={a1:6.2f}s 4x={a4:6.2f}s ratio={ratio:5.2f} "
            f"(corpus grew 4.0x, bound {bounds[fam]})"
        )
        assert ratio < bounds[fam], (
            f"{fam}: appending a FIXED batch slowed {ratio:.2f}x when the "
            "standing corpus grew 4x — the O(batch) claim failed"
        )

    # the whole grams loop again, rename-free
    os.environ["FCS_COMMIT_BACKEND"] = "pointer"
    try:
        stress_grams(spark, docs, doc_batch, "ptr")
        print("pointer-backend grams lifecycle: OK (zero dir renames)")
    finally:
        os.environ.pop("FCS_COMMIT_BACKEND", None)
    print("ALL OK")
    spark.stop()


if __name__ == "__main__":
    main()
