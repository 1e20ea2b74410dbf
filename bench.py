#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full pipeline runs, no
driver-side collect cost). Methodology (round-over-round comparable):
runs are INTERLEAVED PER QUERY — each query runs 3x back-to-back
(cold = first run, paying plan analysis + whole-stage-codegen; warm =
min of the next two, the steady state that dominates a long-running /
100 TB deployment). A global cold pass followed by a global warm pass
let accumulated JVM/GC pressure from 60+ prior executions pollute the
warm numbers of late queries (observed r2: unchanged plans "regressed"
3-4x warm purely by queue position). Headline value = warm total;
cold times reported alongside under "queries_cold".

r9 session-crowding fix: 133+ headliners in ONE JVM produced
run-to-run swings on individual queries (similarity_topk_pq 4.5<->9.7s
warm, rollup_merge_day 0.26<->1.13s) bigger than a round's
optimization budget, plus warm>cold inversions from accumulated GC
pressure (~7,000 stages in one session). The harness now runs THREE
FRESH-JVM BLOCKS (relational / corpus / ANN — family-partitioned so
each block's working set is homogeneous), each a subprocess with its
own warm-up, table prescan, and worker prefork; the orchestrator sums
them into the same one-line record. Per-query numbers stay
round-over-round comparable (same per-query interleaving, same
release discipline); only the JVM neighborhood shrank.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q21_waiting_suppliers",
    "window_rank_per_group",
    "join_asof_last_view",
    "pivot_daily_event_values",
    "stream_session_windows",
    "sink_replacing_state",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_rplsh",
    "text_quality_score",
    "text_feature_hashing",
    "multimodal_features",
    "pipeline_clean_corpus",
    "funnel_signup_click_purchase",
    "resample_gapfill_hourly",
    # r2 additions: newly-oracle-checked families (the 23 names above
    # are stable for round-over-round regression comparison)
    "q9_product_profit",
    "scalar_string_funcs",
    "window_running_sum",
    "sql_text_window_sessions",
    "grouped_map_demean",
    "multimodal_decode",
    # r14: the compressed-codec decode (real PNG — CRC walk, inflate,
    # full predictive-filter inversion inside Arrow batches)
    "multimodal_png_decode",
    "dedup_incremental_batch",
    # r12: the compacted-index probe (build -> transactional append
    # -> compact lifecycle priced in ITS cold column via BUILD_ONCE)
    "dedup_index_compact_probe",
    # r13: the pair-artifact ingest lifecycle row (base build on 3/4
    # + transactional batch append read uncompacted)
    "dedup_pairs_append_probe",
    # r13: the containment-statistics ingest lifecycle row — the last
    # rebuild-only pair family adopts the shared protocol
    "dedup_containment_append_probe",
    "rollup_daily_from_hourly",
    # r14: the MAX-monoid lifecycle row — deterministic-HLL register
    # artifact over the event stream, exact register-table oracle —
    # and its consumer (distinct-count estimate off the registers,
    # bound-gated against the exact count)
    "rollup_hll_append_probe",
    "rollup_hll_distinct_estimate",
    # r3 additions
    "pipeline_mixture_sample",
    # r12: the tokenized-corpus artifact row runs BEFORE every
    # n-gram/token consumer in the corpus block so the one
    # tokenize/shingle/pair build is priced in ITS cold column
    # (BUILD_ONCE); the eight rewired reports below then price
    # statistic-sized artifact scans only. r14: this row's cold
    # column now prices the WHOLE grams chain — the full artifact is
    # a snapshot of the compacted lifecycle artifact (one corpus
    # tokenize total), so the two lifecycle rows below read
    # already-built state in their cold cells too.
    "text_corpus_grams_artifact",
    # r13: the incremental-ingest lifecycle rows — append probe
    # (build-on-3/4 + transactional batch append, read uncompacted
    # through the merge-on-read path) and compact probe (snapshot of
    # the append artifact + compaction)
    "text_corpus_grams_append_probe",
    "text_corpus_grams_compact_probe",
    "text_crossdoc_ngram_mass",
    "pipeline_source_overlap",
    "similarity_topk_ivf_unlabeled",
    "rollup_merge_day",
    # r3 late additions: pipeline-QA + bloom flagships
    "pipeline_global_shuffle",
    "text_token_entropy",
    "dedup_bloom_guard",
    # r14: the OR-monoid lifecycle row — bloom word-table artifact,
    # base(3/4)+append(1/4), bitmap packed from the merged committed
    # words (BUILD_ONCE prices the build in its cold column)
    "dedup_bloom_append_probe",
    "rollup_quantile_histogram",
    "sink_precompact_batch",
    # r4 additions
    "similarity_topk_int8",
    "text_tfidf_topk",
    "dedup_cluster_census",
    "join_asof_tolerance",
    "dedup_bloom_fill_audit",
    "pipeline_weighted_sample",
    "window_session_dynamic_gap",
    "similarity_recall_int8",
    "sql_text_lateral_topk",
    "agg_bitmap_distinct",
    # r4 wave 2
    "dedup_semantic_cluster",
    "agg_countmin_frequency",
    # r14: the Count-Min counter table is a persisted artifact
    # (verdict Next #3) — the frequency row prices the one sketch
    # build (BUILD_ONCE first toucher), the append-probe row its own
    # base(3/4)+append(1/4) ingest lifecycle
    "agg_countmin_append_probe",
    "dedup_minhash_estimate_audit",
    "events_cohort_retention",
    "events_transition_matrix",
    "pipeline_cdc_apply",
    "multimodal_audio_energy",
    "embedding_power_projection",
    "pipeline_quality_winsorize",
    "multimodal_image_resize",
    "join_asof_nearest",
    "sql_text_pivot_status",
    "similarity_topk_pq",
    "pipeline_vocab_build",
    "pipeline_tokenize_ids",
    "text_bigram_logprob",
    # r4 wave 3
    "pipeline_dsir_weights",
    "dedup_repeated_spans",
    "rollup_sketch_user_overlap",
    "similarity_graph_pagerank",
    "pipeline_dsir_select",
    "pipeline_curriculum_order",
    "join_ivm_delta",
    "rollup_bitmap_merge_day",
    "dedup_canonical_pagerank",
    "text_lang_margin",
    "text_zipf_alpha",
    "rollup_forecast_holt",
    "pipeline_token_budget",
    "embedding_centroid_drift",
    "agg_ols_two_features",
    "events_dau_wau",
    "dedup_rate_by_source",
    "pipeline_eval_burn_report",
    "pipeline_dataset_card",
    "agg_weighted_median",
    "pipeline_source_gini",
    "anomaly_daily_seasonal",
    # r6 additions
    "sink_map_struct_roundtrip",
    "sink_shard_routing_compat",
    # r7 additions
    "similarity_topk_ivfpq",
    "similarity_topk_ivfadc",
    "dedup_ngram_containment",
    "pipeline_zorder_layout",
    "dedup_containment_keeplist",
    "pipeline_zorder_skipping_gain",
    "similarity_recall_ivfadc",
    "embedding_matryoshka_audit",
    "events_pattern_match",
    "dedup_simhash_pairs",
    "sample_uniform_hash",
    "dedup_simhash_lsh",
    "similarity_topk_matryoshka",
    "pipeline_bpe_merges",
    "pipeline_bpe_encode",
    # r7 continuation additions
    "similarity_topk_onebit",
    "similarity_recall_onebit",
    "pipeline_pack_firstfit",
    "anomaly_changepoint_cusum",
    "pipeline_tokenizer_fertility",
    "stream_topk_heavy_hitters",
    "similarity_graph_link_prediction",
    # r7 continuation wave 3
    "text_bm25_topk",
    "similarity_hybrid_rrf",
    "text_top_ngram_fraction",
    "text_ngram_novelty",
    # r8 additions
    "similarity_topk_opq",
    "similarity_recall_opq",
    "similarity_hard_negatives",
    "pipeline_scd2_dimension",
    "pipeline_cluster_purity",
    "multimodal_video_frames",
    "stream_left_interval_join",
    "text_pmi_cooccurrence",
    "agg_robust_mad",
    "similarity_mutual_knn",
    "embedding_anisotropy",
    "anomaly_distribution_drift",
    "join_bucketed_colocated",
    "join_dynamic_partition_pruning",
    "join_pointintime_scd2",
    "similarity_topk_ivf_opq",
    # r9 additions
    "stream_dedup_within_watermark",
    "similarity_ivfpq_build_artifact",
    "similarity_topk_from_artifact",
    "similarity_ivfpq_append_probe",
    "similarity_topk_refine",
    # r10 additions
    "similarity_opq_build_artifact",
    "similarity_topk_from_opq_artifact",
    "similarity_ivfpq_delete_probe",
    "similarity_ivfpq_compact_probe",
    "similarity_opq_append_probe",
    # r11 additions: the graph edge-list artifact family.
    # similarity_neardup_edges_artifact prices the one LSH pass
    # (build-once); the census/adamic rows and the refactored graph
    # queries (pagerank x2, link prediction, triangles) price reads
    # of the persisted edge relation only.
    "similarity_neardup_edges_artifact",
    # r13: the edge-index ingest lifecycle row (base build on 3/4 +
    # transactional batch append; committed read through partition
    # pruning) — prices its own lifecycle in its cold column
    "similarity_neardup_append_probe",
    "similarity_graph_components_census",
    "similarity_graph_adamic_adar",
    "dedup_embedding_keeplist",
    # r11 wave 2: the per-dimension scalar-quantizer rung (FAISS
    # SQ8 parity — trained ranges + asymmetric distance); the recall
    # row prices the exact brute-force A/B alongside the probe.
    "similarity_topk_sq8",
    "similarity_recall_sq8",
]

# Build-once / probe-many queries: the *_build_artifact rows build
# their persisted index at most once per process, so their COLD run
# prices the build (Lloyd chains / rotation) and their warm runs
# price reading the manifest back — and every probe row downstream of
# the same artifact (topk_from_*, append/delete probes, and since r10
# the OPQ trio) prices the SEARCH only, in warm AND cold. Read the
# warm headline accordingly: the build cost appears exactly once, in
# queries_cold of whichever artifact-family row ran first (ADVICE r9).
BUILD_ONCE = [
    n for n in HEADLINE
    if n.endswith("_build_artifact") or n.endswith("_edges_artifact")
] + [
    # first-toucher build pricing without a dedicated *_build row:
    # dedup_minhash_lsh ensures the TEXT-side MinHash pair artifact
    # (its five sibling consumers then read it), and the drift
    # monitor ensures the yesterday's-slice k-means artifact — each
    # build lands once in that query's cold column (r11 wave 2)
    "dedup_minhash_lsh",
    "embedding_centroid_drift",
    # ...and the containment-statistics artifact (directed report is
    # its first toucher; min-side report + keeplist read it)
    "dedup_ngram_containment",
    # ...and the corpus-side MinHash signature index the incremental
    # probe reads (bands + shingles — the standing nightly index)
    "dedup_incremental_batch",
    # ...and the persisted BPE tokenizer artifact (merges table;
    # encode/fertility compile the stored rows into replace chains)
    "pipeline_bpe_merges",
    # ...and the vocab50 id table (tokenize_ids joins its top-30
    # prefix; vocab_build hashes the read-back)
    "pipeline_vocab_build",
    # ...and the persisted top-principal-direction (powdir); the
    # projection query prices the 2-round power iteration
    "embedding_power_projection",
    # ...and the SQ8 trained-range artifact (one-row mins/maxs); the
    # topk row prices the train pass, the recall meter injects it
    "similarity_topk_sq8",
    # ...and the tokenized-corpus gram relations (docstats/shingles/
    # tokens/grams/pairs/unigrams); eight n-gram/token reports read
    # them (r12 wave 1)
    "text_corpus_grams_artifact",
    # ...and the compacted signature index (base+append+compact
    # lifecycle) the compaction probe reads
    "dedup_index_compact_probe",
    # ...and the two tokenized-corpus LIFECYCLE artifacts (r13):
    # the append probe builds base(3/4)+append(1/4); the compact
    # probe builds the same then compacts — each cold column prices
    # its own lifecycle
    "text_corpus_grams_append_probe",
    "text_corpus_grams_compact_probe",
    # ...and the persisted SimHash fingerprint table (r13): the
    # fingerprint report prices the one tokenize->vote fold; the
    # exhaustive-pairs and banded-LSH rows read 2-byte-row scans
    "dedup_simhash",
    # ...and the edge-index ingest lifecycle (r13): base + append
    "similarity_neardup_append_probe",
    # ...and the text pair-artifact ingest lifecycle (r13)
    "dedup_pairs_append_probe",
    # ...and the containment-statistics ingest lifecycle (r13)
    "dedup_containment_append_probe",
    # ...and the Count-Min counter-table artifact + its ingest
    # lifecycle (r14): the frequency row ensures the full-stream
    # sketch, the append probe its base+append twin
    "agg_countmin_frequency",
    "agg_countmin_append_probe",
    # ...and the OR-monoid (bloom words) and MAX-monoid (HLL
    # registers) lifecycle artifacts (r14)
    "dedup_bloom_append_probe",
    "rollup_hll_append_probe",
    # ...and the two LAYOUT queries (r15, r14 verdict Next #8): both
    # write their pay-once-at-ingest copy (bucketed orders/lineitem;
    # date-partitioned events) once per process — the ingest write
    # lands in each row's cold column, warm runs read the standing
    # layout, exactly like production
    "join_bucketed_colocated",
    "join_dynamic_partition_pruning",
]


def _block_of(name: str) -> str:
    """Family partition: homogeneous working sets per JVM block.
    ANN/embedding queries carry Lloyd builds and broadcast LUT
    lifecycles; corpus queries carry shingle/token explodes; the
    relational block is the TPC-H/window/streaming/sink surface."""
    if name.startswith(("similarity_", "embedding_")):
        return "ann"
    if name.startswith(
        ("dedup_", "text_", "pipeline_", "multimodal_", "grouped_")
    ):
        return "corpus"
    return "relational"


BLOCK_ORDER = ("relational", "corpus", "ann")


def run_block(block: str, sf_dir: str, out_path: str) -> None:
    """One fresh-JVM measurement block: warm-ups, (relational only)
    sink throughput, then the block's headliners interleaved 3x each
    with full state release between runs."""
    from flink_connectors_spark.registry import all_specs
    from flink_connectors_spark.session import (
        TABLES,
        build_session,
        load_table,
        spread,
    )

    names = [n for n in HEADLINE if _block_of(n) == block]
    spark = build_session(app_name=f"fcs-bench-{block}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    def release() -> None:
        """Release everything a query's plan pinned in the session.

        Many plans persist()/localCheckpoint(eager=True) internal
        frames (LSH band tables, iterative-component pair lists,
        shingle indexes). Inside one long-lived session those pins
        accumulate in the block manager: r4's driver sweep showed
        unchanged plans "regressing" up to 16.9x warm purely from
        eviction churn. After every run, clear the catalog cache and
        unpersist every persistent RDD (covers localCheckpoint'd
        frames too — none are reused across invocations). Release
        time stays outside the measured window.

        The explicit System.gc() (BETWEEN QUERIES only, never
        between one query's three runs) is the r9 variance fix for
        the build-heavy ANN queries: their control-plane-dominated
        Lloyd chains allocate broadcast/codegen garbage whose
        DEFERRED collection landed inside later queries' timed
        windows — isolated ivfadc ran a steady 5-6 s while the same
        plan read 10.9 s late in the ANN block (both warm runs
        inflated, a warm>cold inversion). Paying collection at query
        boundaries keeps each timed window starting from a quiet
        heap; NOT gc'ing between a query's own runs matters because
        a full GC can unload the query's freshly generated codegen
        classes, which the warm runs would then silently recompile
        (measured: the OPQ trio read ~10%% higher with per-run GC)."""
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

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        release()
        return dt

    run("q3_shipping_priority")  # warm-up: JVM, codegen, parquet footers
    # Untimed first-scan of EVERY base table: footer reads, schema
    # inference, and OS page-cache fill must not land in whichever
    # query happens to touch a table first (r5: dedup_exact — the first
    # documents-scanning query — read 1.86 s warm vs its 0.5 s r1
    # class purely from absorbing the corpus' first scan).
    for _t in TABLES:
        load_table(spark, sf_dir, _t).write.format("noop").mode(
            "overwrite"
        ).save()
    release()
    # pre-fork the Python workers so the first mapInPandas query's cold
    # time measures its plan, not daemon spin-up (~7 s once per session)
    spark.range(256).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    record: dict = {}
    # Host-speed canary: a fixed, data-independent CPU-bound job
    # timed at block start. The sandbox host's effective CPU speed
    # drifts (r9: the sink number — pure CPU — read 1.63M rows/s at
    # 09:30 and 1.24M at 11:10 the same day on an idle guest), which
    # confounds round-over-round and even run-over-run comparisons.
    # The canary gives every block a contamination indicator: compare
    # query times ACROSS runs only after checking the canaries agree,
    # and deflate totals by the canary ratio when they don't.
    t0 = time.perf_counter()
    spark.range(400_000_000).selectExpr(
        "sum(id * 3 + (id % 7)) AS s"
    ).collect()
    record["canary_sec"] = round(time.perf_counter() - t0, 3)
    if block == "relational":
        # Sink throughput FIRST (before the query loop crowds the JVM):
        # the reference IS a sink connector, so rows/sec through the
        # batched writer (production batch-size 100k, README.md:21) is
        # the directly comparable number. Local parquet backend = no
        # network; measures the connector machinery itself. Measured at
        # session start so the number is a property of the writer, not
        # of prior query executions' GC state (r2 lesson).
        import shutil

        from flink_connectors_spark.sink.options import SinkOptions
        from flink_connectors_spark.sink.writer import write_batch

        sink_dir = tempfile.mkdtemp(prefix="fcs_bench_sink_")
        try:
            # spread + persist: the testdata lineitem is ONE parquet
            # file (3 row groups -> 3 scan tasks on 32 cores), so an
            # unspread write measures single-file scan parallelism,
            # not the connector. Cache the spread input so each timed
            # pass is the writer machinery alone.
            li = spread(load_table(spark, sf_dir, "lineitem")).persist()
            n_rows = li.count()
            opts = SinkOptions(
                url=f"parquet://{sink_dir}",
                table_name="lineitem_out",
                batch_size=100_000,
            )
            write_batch(li, opts)  # untimed warm-up: plan/codegen
            sink_secs = float("inf")
            for _ in range(3):  # best-of-3 steady state
                t0 = time.perf_counter()
                write_batch(li, opts)
                sink_secs = min(sink_secs, time.perf_counter() - t0)
        finally:
            li.unpersist()
            shutil.rmtree(sink_dir, ignore_errors=True)
        record["sink_rows_per_sec"] = round(n_rows / sink_secs)

    cold: dict[str, float] = {}
    times: dict[str, float] = {}
    for name in names:
        gc()  # quiet heap at the query boundary (see release())
        cold[name] = run(name)
        times[name] = min(run(name), run(name))
    record["queries"] = times
    record["queries_cold"] = cold
    with open(out_path, "w") as fh:
        json.dump(record, fh)
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--block" in sys.argv:
        block = sys.argv[sys.argv.index("--block") + 1]
        out = sys.argv[sys.argv.index("--out") + 1]
        run_block(block, sf_dir, out)
        return

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    block_secs: dict[str, float] = {}
    canary: dict[str, float] = {}
    sink_rows_per_sec = None
    here = os.path.dirname(os.path.abspath(__file__))
    for block in BLOCK_ORDER:
        with tempfile.NamedTemporaryFile(
            suffix=f"_{block}.json", delete=False
        ) as tf:
            out = tf.name
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--block",
                    block,
                    "--out",
                    out,
                ],
                cwd=here,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE,
            )
            if proc.returncode != 0:
                tail = proc.stderr.decode(errors="replace")[-2000:]
                raise RuntimeError(
                    f"bench block {block!r} failed "
                    f"(rc={proc.returncode}):\n{tail}"
                )
            with open(out) as fh:
                rec = json.load(fh)
        finally:
            try:
                os.unlink(out)
            except OSError:
                pass
        times.update(rec["queries"])
        cold.update(rec["queries_cold"])
        block_secs[block] = round(sum(rec["queries"].values()), 3)
        canary[block] = rec.get("canary_sec")
        if "sink_rows_per_sec" in rec:
            sink_rows_per_sec = rec["sink_rows_per_sec"]

    total = round(sum(times.values()), 3)
    # Canary-deflated total (r9 verdict: BENCH_r* totals are only
    # comparable through the canary ratio — the sandbox host's
    # effective CPU speed swings ±25% same-day). Each block's warm
    # total is scaled by REF_CANARY / that block's measured canary
    # (canary slower than reference => host slow => deflate), so the
    # shipped number self-adjudicates host drift. REF_CANARY is the
    # r9 canary-clean morning window (~0.48 s for the fixed
    # 400M-row integer aggregate on local[32]); it is a UNIT choice,
    # not a moving target — never re-pin it to a later round's host.
    REF_CANARY = 0.48
    adj = 0.0
    for b in BLOCK_ORDER:
        cny = canary.get(b)
        adj += block_secs[b] * (REF_CANARY / cny if cny else 1.0)
    canary_adj = round(adj, 3)
    # The driver captures only a bounded TAIL of stdout. r3 AND r4
    # both ended "parsed": null because the printed line still
    # carried the full per-query dict (~2.5 KB) and got
    # head-truncated. So: the FULL record (warm + cold dicts +
    # metadata) goes to BENCH_LOCAL.json next to this script, and
    # the printed line — the LAST line of output — is SCALARS ONLY,
    # < 200 bytes, guaranteed inside any sane capture window.
    record = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "value_canary_adj": canary_adj,
        "canary_ref_sec": REF_CANARY,
        "queries": times,
        "queries_cold": cold,
        "blocks": block_secs,
        "blocks_canary_sec": canary,
        # build-once rows: warm prices the manifest read-back, the
        # index build appears once in queries_cold (see BUILD_ONCE)
        "build_once_queries": BUILD_ONCE,
        "sink_rows_per_sec": sink_rows_per_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    local_path = os.path.join(here, "BENCH_LOCAL.json")
    with open(local_path, "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    # r15 (r14 verdict Next #6): the driver also runs the bench at a
    # LOW core count to judge scaling, but its per-query channel was
    # empty — the second run overwrote BENCH_LOCAL.json and only the
    # scalars line survives capture. Keep a per-core-count copy so
    # both legs' full per-query records coexist on disk and the
    # per-query scaling ratio is one file-diff away. Additions only:
    # the printed line and BENCH_LOCAL.json are unchanged.
    with open(
        os.path.join(here, f"BENCH_LOCAL_c{record['cpus']}.json"), "w"
    ) as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    printed = {
        "metric": record["metric"],
        "value": total,
        "unit": "sec",
        "canary_adj": canary_adj,
        "cold_total": round(sum(cold.values()), 3),
        "sink_rows_per_sec": sink_rows_per_sec,
        "n_queries": len(times),
        "sf": record["sf"],
        "full": "BENCH_LOCAL.json",
    }
    line = json.dumps(printed, separators=(",", ":"))
    if len(line) >= 200:
        # NEVER suppress the output this guard exists to protect (an
        # aborted print is the exact "parsed": null failure the scalars
        # -only line fixed). Drop low-value keys until it fits, then
        # print whatever we have.
        sys.stderr.write(f"WARN: bench line {len(line)}B >= 200B; trimming\n")
        for k in ("full", "n_queries", "cold_total", "sink_rows_per_sec"):
            printed.pop(k, None)
            line = json.dumps(printed, separators=(",", ":"))
            if len(line) < 200:
                break
    print(line)


if __name__ == "__main__":
    main()
