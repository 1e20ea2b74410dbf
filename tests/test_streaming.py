"""Live Structured Streaming tests: replay the static events table as
a file stream, run each pipeline with Trigger.availableNow into the
memory sink, and check the results against batch equivalents."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from flink_connectors_spark.session import load_table
from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink.writer import foreach_batch_writer
from flink_connectors_spark.streaming import pipelines as P


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Events replayed as parquet files with instant (LTZ) µs
    timestamps: ``withWatermark`` requires TIMESTAMP, and the raw
    table stores naive event time (TIMESTAMP_NTZ in the current
    testdata; formerly INT64 nanos), so cast under the UTC session
    timezone — value-preserving — before writing the replay files."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, stream_df, name, mode="append"):
    """mode='complete' for windowed aggregations: in append mode,
    windows newer than the final watermark are (correctly) withheld,
    so end-of-replay tail windows would be missing."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _events_stream(spark, events_stream_dir):
    static = spark.read.parquet(events_stream_dir)
    return spark.readStream.schema(static.schema).parquet(events_stream_dir)


def test_tumbling_counts_match_batch(spark, events_stream_dir):
    stream = _events_stream(spark, events_stream_dir)
    res = _run_stream(spark, P.tumbling_counts(stream), "t_tumbling", "complete")
    static = spark.read.parquet(events_stream_dir)
    batch = (
        static.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in res.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    assert got == want


def test_sliding_counts_double_assignment(spark, events_stream_dir):
    stream = _events_stream(spark, events_stream_dir)
    res = _run_stream(spark, P.sliding_counts(stream), "t_sliding", "complete")
    n_events = spark.read.parquet(events_stream_dir).count()
    total = res.agg(F.sum("n_events")).collect()[0][0]
    # 10-min window / 5-min slide => every event in exactly 2 windows
    assert total == 2 * n_events


def test_session_counts(spark, events_stream_dir):
    stream = _events_stream(spark, events_stream_dir)
    res = _run_stream(spark, P.session_counts(stream), "t_session", "complete")
    rows = res.collect()
    assert rows, "expected at least one session"
    n_events = spark.read.parquet(events_stream_dir).count()
    assert sum(r["n_events"] for r in rows) == n_events
    # sessions honor the gap: start <= end everywhere
    assert all(r["session_start"] <= r["session_end"] for r in rows)


def test_streaming_dedup(spark, events_stream_dir):
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    res = _run_stream(
        spark, P.dedup_events(stream, keys=["user_id", "event_type"]), "t_dedup"
    )
    got = res.select("user_id", "event_type").distinct().count()
    want = static.select("user_id", "event_type").distinct().count()
    assert res.count() == got == want


def test_stateful_running_totals(spark, events_stream_dir):
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    q = (
        P.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table("t_stateful")
    # final state per user matches the batch aggregate
    final = (
        res.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    )
    want = static.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    got_map = {r["user_id"]: r["n_events"] for r in final.collect()}
    want_map = {r["user_id"]: r["n_events"] for r in want.collect()}
    assert got_map == want_map


def test_stream_through_sink_foreach_batch(spark, events_stream_dir, tmp_path):
    """Full EP2 path: stream -> changelog translation -> batched sink
    writes (micro-batch as flush-interval)."""
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    cl = stream.select(
        F.col("user_id").alias("pk"),
        F.col("event_id").alias("ver"),
        F.col("value").alias("payload"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "purchase", "UB")
        .otherwise("UA")
        .alias("op"),
    )
    opts = SinkOptions(
        url=f"parquet://{tmp_path}/stream_sink",
        table_name="events_sink",
        write_mode="replacing",
        primary_key=("pk",),
        batch_size=256,
    )
    q = (
        cl.writeStream.foreachBatch(foreach_batch_writer(opts))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = glob.glob(f"{tmp_path}/stream_sink/events_sink/*.parquet")
    assert files
    written = spark.read.parquet(*files)
    assert written.count() == static.count()
    assert "deleted" in written.columns


def test_stateful_tws_matches_batch(spark, events_stream_dir):
    """transformWithStateInPandas (modern typed-state API) reaches the
    same final per-user state as the batch aggregate.

    Skipped where protobuf is unavailable: Spark 4.x's
    transformWithState driver<->worker state protocol imports
    google.protobuf; applyInPandasWithState (tested above) is the
    executed stateful path in that case."""
    pytest.importorskip("google.protobuf")
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    # transformWithState requires the RocksDB state store provider.
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            P.user_stats_tws(stream)
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    res = spark.table("t_tws")
    final = res.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    want = static.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    got_map = {r["user_id"]: r["n_events"] for r in final.collect()}
    want_map = {r["user_id"]: r["n_events"] for r in want.collect()}
    assert got_map == want_map


def test_stream_stream_interval_join_matches_batch(spark, events_stream_dir):
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    res = _run_stream(
        spark,
        P.clicks_before_errors_stream(stream),
        "t_ss_join",
        mode="append",
    )
    want = (
        static.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("c_user"),
        )
        .join(
            static.filter(F.col("event_type") == "error").select(
                F.col("event_id").alias("error_id"),
                F.col("ts").alias("error_ts"),
                F.col("user_id").alias("e_user"),
            ),
            (F.col("c_user") == F.col("e_user"))
            & (F.col("error_ts") > F.col("click_ts"))
            & (
                F.col("error_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        )
        .count()
    )
    assert res.count() == want and want > 0


def test_stream_static_enrichment(spark, events_stream_dir):
    static = spark.read.parquet(events_stream_dir)
    profile = (
        static.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") > 60, "heavy").otherwise("light").alias(
                "user_tier"
            ),
        )
    )
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    res = _run_stream(
        spark,
        P.enrich_with_static_profile(stream, profile),
        "t_enrich",
        mode="append",
    )
    assert res.count() == static.count()
    assert res.filter(F.col("user_tier").isNull()).count() == 0


def test_stream_sharded_foreach_batch_routes_per_shard(
    spark, events_stream_dir, tmp_path
):
    """EP3 live: streaming micro-batches through write-local shard
    routing — every micro-batch's rows land in the backend of the
    shard their key hashes to, across ALL epochs (routing must be
    stable batch-over-batch for MergeTree part locality)."""
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    rows = stream.select(
        F.col("user_id").alias("k"), F.col("value").alias("v")
    )
    opts = SinkOptions(
        url=f"parquet://{tmp_path}/shard_sink",
        table_name="ev",
        write_mode="insert_only",
        write_local=True,
        partition_strategy="hash",
        partition_key=("k",),
        local_nodes=("n1:8123", "n2:8123"),
        batch_size=512,
    )
    q = (
        rows.writeStream.foreachBatch(foreach_batch_writer(opts))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = 0
    for i in range(2):
        d = glob.glob(f"{tmp_path}/shard_sink/shard-{i}=*/ev")
        assert d, f"shard {i} missing"
        got = spark.read.parquet(d[0])
        n = got.count()
        total += n
        assert (
            got.filter(F.pmod(F.hash("k"), F.lit(2)) != F.lit(i)).count()
            == 0
        )
    assert total == static.count()


def test_live_streaming_rollup_matches_batch(spark, events_stream_dir):
    """Continuous-aggregate maintenance, live: a watermarked
    readStream windowed aggregation must land exactly the summary
    rows the batch build_rollup computes — the property that lets a
    streaming job maintain the hypertable summary while batch
    backfills share the same table."""
    from flink_connectors_spark.operators.rollup import build_rollup

    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("v_cents"))
        .select(
            F.col("window.start").alias("bucket"),
            "event_type",
            "n",
            "v_cents",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_live")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = {
        (r.bucket, r.event_type, r.n, r.v_cents)
        for r in spark.sql("SELECT * FROM rollup_live").collect()
    }
    batch = {
        (r.bucket, r.event_type, r.n, r.v_cents)
        for r in build_rollup(static, grain="hour").collect()
    }
    assert live == batch


def test_live_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """The nightly-ingest dedup loop run LIVE: new documents arrive as
    micro-batches; each batch runs bipartite MinHash-LSH against the
    standing corpus index inside foreachBatch (releasing the batch's
    persisted inputs afterwards — the cache-lifetime discipline from
    the r2 advice), and the union of per-batch pair lists must equal
    the one-shot bipartite run over all new docs. Holds structurally:
    each new doc's pairs depend only on (doc, corpus), never on other
    new docs."""
    from flink_connectors_spark.operators.dedup import (
        minhash_lsh_pairs_bipartite,
        unpersist_inputs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)

    # stream the new docs as 3 parquet files -> 3 micro-batches
    stream_dir = f"{tmp_path}/new_docs"
    for i in range(3):
        new_docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)

    got: list[tuple] = []

    def on_batch(batch_df, epoch_id):
        pairs = minhash_lsh_pairs_bipartite(
            batch_df, corpus, threshold=0.5
        )
        got.extend(
            (r["new_id"], r["corpus_id"], r["jac"]) for r in pairs.collect()
        )
        unpersist_inputs(pairs)

    stream = spark.readStream.schema(new_docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(stream_dir)
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    q.awaitTermination(120)

    want = sorted(
        (r["new_id"], r["corpus_id"], r["jac"])
        for r in minhash_lsh_pairs_bipartite(
            new_docs, corpus, threshold=0.5
        ).collect()
    )
    assert sorted(got) == want
    assert len(want) > 0  # non-degenerate: the corpus has near-dups


def test_live_bloom_guarded_exact_dedup_ingest(spark, sf_dir, tmp_path):
    """The bloom-guarded nightly EXACT-dedup loop run LIVE: the
    standing corpus bitmap is built once; each arriving micro-batch is
    (1) pre-filtered by bloom_might_contain — zero shuffle, one
    broadcast row — (2) only bloom-positive rows do the exact verify
    join, and (3) the batch's own bitmap is OR-merged into the
    standing bitmap so LATER batches are also guarded against earlier
    ones. The kept set must equal one-shot exact dedup over
    corpus + all batches in arrival order, proving no false negative
    ever dropped a duplicate and the merge kept earlier batches
    visible."""
    from flink_connectors_spark.functions import normalize_text
    from flink_connectors_spark.operators.scale import (
        auto_bloom_bits,
        bloom_bitmap,
        bloom_merge,
        bloom_might_contain,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    fp = F.md5(normalize_text(F.col("text"))).alias("fp")
    corpus = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", fp)
    new_docs = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", fp)

    stream_dir = f"{tmp_path}/new_fps"
    for i in range(3):
        new_docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)

    # OR-merge needs one family-wide width: size it ONCE from the
    # expected final corpus scale (current corpus + ingest headroom),
    # then pass it to every build — per-batch auto-sizing would give
    # mismatched widths and bloom_merge raises loudly on those.
    m_bits = auto_bloom_bits(corpus.count() * 2)
    state = {
        "bmp": bloom_bitmap(
            corpus, fp_col="fp", m_bits=m_bits
        ).localCheckpoint(eager=True)
    }
    seen_fps = {"df": corpus.select("fp").distinct().localCheckpoint(eager=True)}
    kept: list[int] = []

    def on_batch(batch_df, epoch_id):
        probed = bloom_might_contain(batch_df, state["bmp"], fp_col="fp")
        # bloom-negative rows are definitively new: no join at all
        fresh = probed.filter("bloom_hit = 0").select("doc_id", "fp")
        # bloom-positive rows verify against the exact fingerprint set
        verify = (
            probed.filter("bloom_hit = 1")
            .join(seen_fps["df"].hint("merge"), "fp", "left_anti")
            .select("doc_id", "fp")
        )
        batch_kept = fresh.unionByName(verify).localCheckpoint(eager=True)
        kept.extend(r["doc_id"] for r in batch_kept.collect())
        # fold this batch into the standing index for later batches
        state["bmp"] = bloom_merge(
            [state["bmp"], bloom_bitmap(batch_kept, fp_col="fp", m_bits=m_bits)]
        ).localCheckpoint(eager=True)
        seen_fps["df"] = (
            seen_fps["df"]
            .unionByName(batch_kept.select("fp"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    stream = spark.readStream.schema(new_docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(stream_dir)
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/ckpt_bloom")
        .start()
    )
    q.awaitTermination(120)

    # one-shot truth: keep each new doc unless its fingerprint is in
    # the corpus or belongs to an earlier-kept new doc (dropDuplicates
    # on fp after the corpus anti-join, lowest doc_id wins = arrival
    # order here because batches split by doc_id % 3 interleave ids —
    # so compare SETS of fingerprints kept, not ids)
    want_fps = {
        r["fp"]
        for r in new_docs.join(corpus.select("fp"), "fp", "left_anti")
        .select("fp")
        .distinct()
        .collect()
    }
    got_fps = {
        r["fp"]
        for r in new_docs.filter(F.col("doc_id").isin(kept))
        .select("fp")
        .distinct()
        .collect()
    }
    assert got_fps == want_fps
    assert len(kept) > 0


def test_live_streaming_histogram_rollup_matches_batch(spark, events_stream_dir):
    """The third summary kind (fixed-bucket value histograms — the
    quantile rollup) maintained LIVE: a watermarked streaming
    aggregation groups on (window, dims, hbucket) and must land
    exactly the rows batch build_value_histogram computes at the same
    grain. With count/sum (rollup), HLL distinct (sketch rollup), and
    histograms all stream-maintainable, every continuous-aggregate
    query the engine answers from summaries stays correct under live
    ingest."""
    from flink_connectors_spark.operators.rollup import (
        build_value_histogram,
    )

    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_stream_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    clamped = F.greatest(F.lit(0), F.least(cents, F.lit(63999)))
    hb = ((clamped - 0) / 1000).cast("long")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .withColumn("hbucket", hb)
        .groupBy(F.window("ts", "1 hour"), "event_type", "hbucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("bucket"),
            "event_type",
            "hbucket",
            "cnt",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hist_live")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = {
        (r.bucket, r.event_type, r.hbucket, r.cnt)
        for r in spark.sql("SELECT * FROM hist_live").collect()
    }
    batch = {
        (r.bucket, r.event_type, r.hbucket, r.cnt)
        for r in build_value_histogram(static, grain="hour").collect()
    }
    assert live == batch
    assert len(batch) > 0


def test_live_mixture_sampling_with_pinned_rates(spark, sf_dir, tmp_path):
    """Temperature-mixture sampling in the ingest loop: rates are
    computed ONCE from the standing corpus (the pinned snapshot the
    operator docstring prescribes for append stability) and applied
    to every arriving micro-batch as a pure md5-threshold filter. The
    union of per-batch keeps must equal the batch-mode sample of all
    new docs under the same rates — the append-stability property:
    a doc's keep/drop never depends on which batch carried it."""
    from flink_connectors_spark.operators.sampling import (
        hash_bucket,
        temperature_mixture_rates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    rates = temperature_mixture_rates(
        docs, "source", target_fraction=0.5
    ).drop("n")
    rates.persist().count()  # the pinned snapshot

    stream_dir = f"{tmp_path}/arrivals"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)

    key = F.concat(
        F.col("source").cast("string"),
        F.lit(":"),
        F.col("doc_id").cast("string"),
    )
    kept: list[int] = []

    def on_batch(batch_df, epoch_id):
        out = batch_df.join(F.broadcast(rates), "source").filter(
            hash_bucket(key, 1_000_000) < F.col("ppm")
        )
        kept.extend(r["doc_id"] for r in out.collect())

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(stream_dir)
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/ckpt_mix")
        .start()
    )
    q.awaitTermination(120)

    want = {
        r["doc_id"]
        for r in docs.join(F.broadcast(rates), "source")
        .filter(hash_bucket(key, 1_000_000) < F.col("ppm"))
        .collect()
    }
    assert set(kept) == want
    assert 0 < len(want) < docs.count()
    rates.unpersist()


def test_live_countmin_sketch_merge_matches_batch(
    spark, events_stream_dir, tmp_path
):
    """The CMS additive-merge contract LIVE: each micro-batch builds
    its own sketch-sized counter table, the driver folds them
    cell-wise (the counters are <= depth*width rows, so the fold is
    control-plane-sized) — and the standing sketch must equal the
    batch-built sketch over the full table exactly. maxFilesPerTrigger
    forces multiple micro-batches so the test proves MERGING, not a
    single-batch rebuild."""
    from collections import Counter

    from flink_connectors_spark.operators.scale import countmin_counters

    static = spark.read.parquet(events_stream_dir)
    multi = str(tmp_path / "cms_stream")
    static.repartition(6).write.mode("overwrite").parquet(multi)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(multi)
    )
    merged: Counter = Counter()
    epochs = []

    def on_batch(df, epoch_id):
        epochs.append(epoch_id)
        for r in countmin_counters(df, "user_id", depth=3, width=64).collect():
            merged[(r["j"], r["cell"])] += r["n"]

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(epochs) >= 2, "need multiple micro-batches to prove merge"
    batch = {
        (r["j"], r["cell"]): r["n"]
        for r in countmin_counters(static, "user_id", depth=3, width=64).collect()
    }
    assert dict(merged) == batch


def test_sliding_distinct_users_matches_batch(spark, events_stream_dir):
    """Streaming DAU/WAU shape: windowed distinct users computed with
    the streaming-legal two-level form (dedupe pairs, then count)
    must equal the batch COUNT(DISTINCT) per window."""
    from flink_connectors_spark.streaming import pipelines as P

    stream = _events_stream(spark, events_stream_dir)
    res = _run_stream(
        spark, P.sliding_distinct_users(stream), "t_slide_du", "complete"
    )
    static = spark.read.parquet(events_stream_dir)
    batch = (
        static.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(F.col("win.start").alias("window_start"), "n_users")
    )
    got = {(r["window_start"], r["n_users"]) for r in res.collect()}
    want = {(r["window_start"], r["n_users"]) for r in batch.collect()}
    assert got == want and got


def test_space_saving_fold_eviction_math():
    """Sketch math pinned without a stream: capacity-1 fold over
    a,a,b must evict a (count 2) and credit b with est 3 / err 2 —
    the Space-Saving overestimate-with-bound contract — while
    capacity >= distinct keys stays exact (err 0)."""
    from flink_connectors_spark.streaming.pipelines import (
        _space_saving_fold,
    )

    tbl = _space_saving_fold({}, [1, 1, 2], capacity=1)
    assert tbl == {2: [3, 2]}
    exact = _space_saving_fold({}, [1, 1, 2, 3, 2, 1], capacity=8)
    assert exact == {1: [3, 0], 2: [2, 0], 3: [1, 0]}


def test_streaming_heavy_hitters_match_batch_twin(
    spark, sf_dir, events_stream_dir
):
    """With capacity >= distinct users per window the Space-Saving
    stream is exact: the final emission per (window, type) must
    equal the registered batch twin stream_topk_heavy_hitters row
    for row, with every error bound zero."""
    from flink_connectors_spark.plans.streaming_batch import (
        stream_topk_heavy_hitters,
    )

    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(
        events_stream_dir
    )
    res = _run_stream(
        spark,
        P.windowed_heavy_hitters(stream, k=3, capacity=4096),
        "t_heavy_hitters",
        mode="update",
    )
    got = {
        (r["window_start_s"], r["event_type"], r["rnk"]): (
            r["user_id"],
            r["est_count"],
            r["err"],
        )
        for r in res.collect()
    }
    want = {
        (r["window_start_s"], r["event_type"], r["rnk"]): (
            r["user_id"],
            r["n_events"],
            0,
        )
        for r in stream_topk_heavy_hitters(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_left_outer_interval_join_matches_twin(
    spark, events_stream_dir, sf_dir
):
    """The LEFT OUTER stream-stream join's null-row emission is gated
    by state eviction: a null row appears only once the watermark
    passes the click's join window. The registered batch twin
    (`stream_left_interval_join`) models that horizon explicitly —
    live result and twin must agree ROW FOR ROW, including which
    tail clicks are withheld."""
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(
        events_stream_dir
    )
    res = _run_stream(
        spark,
        P.clicks_left_outer_errors_stream(stream),
        "t_lo_join",
        mode="append",
    )
    from flink_connectors_spark.registry import all_specs

    twin = all_specs()["stream_left_interval_join"].fn(spark, sf_dir)

    def key(rows):
        return sorted(
            (
                r["click_id"],
                r["error_id"],
                str(r["click_ts"]),
                str(r["error_ts"]),
            )
            for r in rows
        )

    live = key(res.collect())
    want = key(twin.collect())
    assert len(live) > 0
    assert live == want
    # both matched and withheld-null populations must be non-trivial
    n_null = sum(1 for r in live if r[1] is None)
    assert 0 < n_null < len(live)


def test_dedup_within_watermark_bounded_state(spark, events_stream_dir):
    """dropDuplicatesWithinWatermark must (a) produce the same result
    as full-history dedup when all duplicates arrive inside the
    watermark window (true for the replay: each event_id appears
    once), and (b) actually evict state — the final state rows must
    be far below the total row count (plain dropDuplicates keeps one
    state row per key forever)."""
    static = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(
        events_stream_dir
    )
    out = P.dedup_events_within_watermark(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_ddww")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = static.count()
    got = spark.table("t_ddww").count()
    assert got == static.select("event_id").distinct().count() == total
    # state eviction: the last progress's state rows must be a small
    # fraction of the stream (only ids newer than the final watermark)
    prog = q.lastProgress
    state_rows = sum(
        op["numRowsTotal"] for op in prog["stateOperators"]
    )
    assert state_rows < total * 0.5, (
        f"state holds {state_rows} of {total} rows — eviction broken"
    )


def test_dedup_within_watermark_matches_twin(spark, sf_dir, tmp_path):
    """The registered batch twin (`stream_dedup_within_watermark`)
    models the eviction horizon of dropDuplicatesWithinWatermark over
    a three-phase replay: live traffic + exact-copy retries, a
    watermark tick, then late re-occurrences. The LIVE operator over
    the same three files (one availableNow microbatch each) must
    agree ROW FOR ROW — including which replays are silently dropped
    because their key's state is still within the horizon."""
    import glob
    import os
    import shutil

    from flink_connectors_spark.registry import all_specs

    stream_dir = str(tmp_path / "ddww_stream")
    os.makedirs(stream_dir)
    base = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("phase", F.lit("live"))
    )
    m = base.agg(F.max("ts").alias("m"))
    retries = base.filter(F.col("event_id") % 3 == 0)
    tick = m.select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("m") + F.expr("INTERVAL 1 MINUTE")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("tick").alias("event_type"),
        F.lit("tick").alias("phase"),
    )
    # ALL id%5 candidates go on the wire; the live operator decides
    # which re-emit — the twin must predict that subset exactly.
    replay = (
        base.filter(F.col("event_id") % 5 == 0)
        .crossJoin(F.broadcast(m))
        .select(
            "event_id",
            (
                F.col("m")
                + (F.col("event_id") % 7 + 2)
                * F.expr("INTERVAL 1 MINUTE")
            ).alias("ts"),
            "user_id",
            "event_type",
            F.lit("replay").alias("phase"),
        )
    )
    for i, df in enumerate(
        (base.unionByName(retries), tick, replay)
    ):
        d = str(tmp_path / f"b{i}")
        df.coalesce(1).write.parquet(d)
        dst = f"{stream_dir}/{i:03d}.parquet"
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], dst)
        os.utime(dst, (1700000000 + i * 100,) * 2)

    static = spark.read.parquet(stream_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    res = _run_stream(
        spark,
        P.dedup_events_within_watermark(stream, delay="7 days"),
        "t_ddww_twin",
        mode="append",
    )

    def key(rows):
        return sorted(
            (r["event_id"], str(r["ts"]), r["user_id"],
             r["event_type"], r["phase"])
            for r in rows
        )

    twin = all_specs()["stream_dedup_within_watermark"].fn(
        spark, sf_dir
    )
    live = key(res.collect())
    want = key(
        twin.withColumn("ts", F.col("ts").cast("timestamp")).collect()
    )
    assert live == want
    # the horizon must be non-trivial: some replays emitted, some
    # withheld by still-live state
    n_replay_emitted = sum(1 for r in live if r[4] == "replay")
    n_candidates = replay.count()
    assert 0 < n_replay_emitted < n_candidates
