"""Scale-primitive tests: salting correctness + bucketed-join plan
shape (no exchange). These lock in the behaviors the 100 TB design
leans on when AQE alone can't save a skewed or shuffle-heavy plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from pyspark.sql import functions as F

from flink_connectors_spark.operators.scale import (
    bucketed_join,
    salted_agg,
    salted_join,
    with_salt,
    write_bucketed,
)
from flink_connectors_spark.session import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salt_domain_and_distribution(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = with_salt(li, 8).select("__salt__").distinct().collect()
    got = sorted(r["__salt__"] for r in s)
    assert got == list(range(8))


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["n"], r["qty"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["qty"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), F.sum),
                "qty": (F.sum(F.col("l_quantity").cast("long")), F.sum),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, cust, "o_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_agg_two_shuffles_partial_then_final(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan(
        salted_agg(
            li,
            ["l_returnflag"],
            {"n": (F.count(F.lit(1)), F.sum)},
            n_salts=8,
        )
    )
    # both aggregation phases present; second shuffle keys on the bare
    # group key (the salt is gone)
    assert plan.count("HashAggregate") >= 3
    assert "hashpartitioning" in plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(
        orders, "orders_b", "o_orderkey", 8, path=str(wh / "orders_b")
    )
    write_bucketed(li, "lineitem_b", "o_orderkey", 8, path=str(wh / "li_b"))
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the join strategy question: at test SF everything fits a
    # broadcast, which would bypass the bucket layout being tested
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = bucketed_join(spark, lt, rt, "o_orderkey").count()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert got == want


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    _, rt = bucketed_tables
    df = spark.table(rt).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(df)
    assert "Exchange" not in plan, "agg on bucket key must not shuffle"


def test_connected_components_chain_converges(spark):
    """A 5-node chain (diameter 4) exercises multiple propagation
    rounds; a separate 2-clique and the chain must not merge."""
    from flink_connectors_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["d1", "d2"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_salting_spreads_hot_key_across_partitions(spark):
    """90% of rows share one key: hash-partitioning on the bare key
    sends them all to ONE reducer; (key, salt) spreads them."""
    df = spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    plain_max = max(
        r["count"]
        for r in df.repartition(8, "k")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    salted_max = max(
        r["count"]
        for r in with_salt(df, 8)
        .repartition(8, "k", "__salt__")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    assert plain_max >= 9000, "hot key lands on one reducer unsalted"
    assert salted_max <= 6000, f"salt must spread the hot key, got {salted_max}"


def test_morton_code_matches_python_reference(spark):
    from flink_connectors_spark.operators.scale import morton_code

    def ref(x, y, bits=16):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_code(["x", "y"]).alias("z")
        ).collect()
    }
    assert got == {(x, y): ref(x, y) for x, y in rows}


def test_zorder_layout_audit_matches_python_reference(spark):
    """The audit's bucket assignment and per-bucket extrema equal a
    Python re-computation of the same normalize → interleave →
    bucket math on a deterministic 2-D grid."""
    from flink_connectors_spark.operators.scale import zorder_layout_audit

    rows = [
        (x * 7 + 3, y * 11 - 5) for x in range(16) for y in range(16)
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    bits, bucket_bits = 4, 4
    got = {
        r["zbucket"]: (r["n_rows"], r["min_a"], r["max_a"],
                       r["min_b"], r["max_b"])
        for r in zorder_layout_audit(
            df, ["a", "b"], ["a", "b"], bits=bits, bucket_bits=bucket_bits
        ).collect()
    }

    import math
    mn = [min(r[i] for r in rows) for i in (0, 1)]
    mx = [max(r[i] for r in rows) for i in (0, 1)]
    top = (1 << bits) - 1
    exp = {}
    for a, b in rows:
        r0 = math.floor((a - mn[0]) * top / max(mx[0] - mn[0], 1))
        r1 = math.floor((b - mn[1]) * top / max(mx[1] - mn[1], 1))
        z = 0
        for j in range(bits):
            z |= ((r0 >> j) & 1) << (2 * j)
            z |= ((r1 >> j) & 1) << (2 * j + 1)
        bk = z >> (2 * bits - bucket_bits)
        n, mna, mxa, mnb, mxb = exp.get(
            bk, (0, a, a, b, b)
        )
        exp[bk] = (n + 1, min(mna, a), max(mxa, a),
                   min(mnb, b), max(mxb, b))
    assert got == exp
    # the layout property: >1 bucket and every bucket's span is a
    # fraction of the global span in BOTH dimensions
    assert len(got) > 4
    for n, mna, mxa, mnb, mxb in got.values():
        assert (mxa - mna) <= (mx[0] - mn[0]) / 2
        assert (mxb - mnb) <= (mx[1] - mn[1]) / 2


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """After Z-order layout, each file's min/max span in EACH
    z-ordered column is far narrower than the global span — the
    property row-group pruning feeds on."""
    import pyarrow.parquet as pq
    import glob as g

    from flink_connectors_spark.operators.scale import write_zordered
    from flink_connectors_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "zordered")
    write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=16)
    spans = {"l_partkey": [], "l_suppkey": []}
    globals_ = {}
    for c in spans:
        r = li.agg(F.min(c), F.max(c)).first()
        globals_[c] = r[1] - r[0]
    for f in g.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for idx in range(row.num_columns):
                col = row.column(idx)
                name = col.path_in_schema
                if name in spans:
                    st = col.statistics
                    spans[name].append(st.max - st.min)
    for c, sp in spans.items():
        avg_span = sum(sp) / len(sp)
        assert avg_span < 0.62 * globals_[c], (
            f"{c}: avg row-group span {avg_span} not clustered vs "
            f"global {globals_[c]}"
        )


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_part"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    return out


def test_partition_pruning_on_partitioned_layout(spark, partitioned_events):
    """Hive-style partition layout: a day filter must prune at the
    directory level (PartitionFilters), never scanning other days."""
    df = spark.read.parquet(partitioned_events)
    one_day = df.select("day").distinct().orderBy("day").first()["day"]
    q = df.filter(F.col("day") == F.lit(one_day))
    plan = _plan(q)
    assert "PartitionFilters" in plan
    assert str(one_day) is not None and q.count() > 0
    # the pruned scan reads only the one partition's rows
    total = df.count()
    assert q.count() < total


def test_dynamic_partition_pruning_from_dim_filter(
    spark, partitioned_events
):
    """DPP: a filter on a joined dimension prunes the partitioned
    fact at runtime — the partition values come from executing the
    dim side, not from a static predicate."""
    fact = spark.read.parquet(partitioned_events)
    days = (
        fact.select("day").distinct().orderBy("day").limit(3)
        .withColumn("keep", F.lit(1))
    )
    # materialize the dim as a table so DPP sees a filterable relation
    days.write.mode("overwrite").saveAsTable("dpp_days")
    try:
        dim = spark.table("dpp_days").filter(F.col("keep") == 1)
        q = fact.join(dim, "day")
        plan = _plan(q)
        assert (
            "dynamicpruning" in plan.lower()
            or "PartitionFilters: [isnotnull(day" in plan
        ), "expected dynamic partition pruning on the fact scan"
        assert q.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS dpp_days")


def test_lsh_dedup_wide_bands_full_twin_recall(spark, sf_dir):
    """Codifies the 10x-union stress finding (SCALING.md): with band
    width sized to the corpus (bits_per_band ~ log2(N) - 6), sign-LSH
    dedup must find EVERY identical-twin pair — identical vectors
    share all sign bits, so recall on exact duplicates is structural,
    not probabilistic. 4x union of the embeddings table; 32 planes x
    16-bit bands keeps bucket occupancy ~1 so the candidate join
    stays near-linear."""
    from flink_connectors_spark.operators.similarity import (
        cosine_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    big = emb
    for i in range(1, 4):
        big = big.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        )
    out = cosine_near_dup_pairs_lsh(
        big, threshold=0.99, n_planes=32, bits_per_band=16
    )
    # 4 copies of each vector -> C(4,2)=6 twin pairs per original
    assert out.filter(F.col("score") >= 0.999999).count() == 6 * n


def test_auto_lsh_bands_sizing_rule():
    """SCALING.md's band-width rule is now enforced in code: a 50k-row
    corpus must auto-size to >=16-bit bands (occupancy ~1 so the
    candidate self-join stays linear), band count must come from the
    recall formula, and every (n_planes, bits) pair must divide
    evenly (partial bands would be silently dropped — see
    _band_keys)."""
    from flink_connectors_spark.operators.similarity import auto_lsh_bands

    n_planes, bits = auto_lsh_bands(50_000)
    assert bits >= 16
    assert n_planes % bits == 0
    # tighter threshold -> fewer bands needed for the same recall
    p_loose, _ = auto_lsh_bands(50_000, threshold=0.8)
    p_tight, _ = auto_lsh_bands(50_000, threshold=0.99)
    assert p_tight < p_loose
    for n in (2, 100, 5_000, 1_000_000, 10**9):
        p, b = auto_lsh_bands(n)
        assert p % b == 0 and 8 <= b <= 24 and p >= 2 * b


def test_band_keys_rejects_partial_band(spark, sf_dir):
    """n_planes not divisible by bits_per_band used to NULL out the
    final band's key and silently drop it from candidate generation;
    it must raise instead."""
    import pytest

    from flink_connectors_spark.operators.similarity import (
        cosine_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="multiple of bits_per_band"):
        cosine_near_dup_pairs_lsh(
            emb, threshold=0.9, n_planes=10, bits_per_band=4
        ).count()


def test_lsh_auto_sizing_twin_recall(spark, sf_dir):
    """Auto-sized banding (no explicit n_planes/bits_per_band) must
    still find every identical-twin pair: identical vectors share all
    sign bits, so exact-duplicate recall is structural regardless of
    the chosen width."""
    from flink_connectors_spark.operators.similarity import (
        cosine_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    n = emb.count()
    big = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    )
    out = cosine_near_dup_pairs_lsh(big, threshold=0.99)
    assert out.filter(F.col("score") >= 0.999999).count() == n


def test_bipartite_incremental_dedup_stress_twin_recall(spark, sf_dir):
    """Scale shape of the incremental-ingest dedup: corpus unioned 3x
    (the 'existing' index side grows), batch = pristine copy of the
    docs. Every batch doc has exact twins in the corpus; identical
    texts share all MinHash band keys, so recall on exact twins is
    structural — the bipartite join must find every (batch doc,
    corpus twin) pair with jac == 1.0 while never self-joining the
    corpus."""
    from flink_connectors_spark.operators.dedup import (
        minhash_lsh_pairs_bipartite,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(400)
    )
    # only docs with >= 3 words carry shingles (same guard as operator)
    eligible = docs.filter(
        F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")) >= 3
    )
    n = eligible.count()
    corpus = docs
    for i in range(1, 4):
        corpus = corpus.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    out = minhash_lsh_pairs_bipartite(docs, corpus, threshold=0.99).cache()
    twins = out.filter(F.col("jac") >= 0.999999)
    # each eligible batch doc matches >= 3 shifted copies (plus any
    # natural exact dups in the data)
    per_doc = twins.groupBy("new_id").count()
    assert per_doc.count() == n
    assert per_doc.filter(F.col("count") < 3).count() == 0


def test_rollup_nesting_additivity_all_grains(spark, sf_dir):
    """Hypertable rollup: answering week and month from the hourly
    summary must equal direct aggregation of facts — the additivity
    property that makes the summary table a safe substitute for the
    fact table at every coarser grain."""
    from flink_connectors_spark.operators import rollup as R
    from flink_connectors_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = R.build_rollup(ev, grain="hour")
    for grain in ("day", "week", "month"):
        via_rollup = {
            (r.bucket, r.event_type, r.n, r.v_cents)
            for r in R.answer_from_rollup(hourly, grain=grain).collect()
        }
        direct = {
            (r.bucket, r.event_type, r.n, r.v_cents)
            for r in R.build_rollup(ev, grain=grain).collect()
        }
        assert via_rollup == direct, grain


def test_diagnose_skew_reports_hot_keys(spark):
    """The skew report must surface the hot key first with the right
    share and mean-multiple."""
    from flink_connectors_spark.operators.scale import diagnose_skew

    rows = [("hot",)] * 80 + [("a",)] * 10 + [("b",)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = diagnose_skew(df, ["k"], top_n=2).collect()
    assert out[0].k == "hot" and out[0].n_rows == 80
    assert abs(out[0].share - 0.8) < 1e-9
    # 3 keys, 100 rows -> mean load 33.33; hot carries 2.4x
    assert abs(out[0].skew_x - 2.4) < 1e-6
    assert len(out) == 2


def test_resolve_lsh_banding_explicit_width_recomputes_band_count():
    """Regression (r2 advice): with an explicit bits_per_band the band
    count must come from the recall formula AT THAT WIDTH, not be
    reused from the auto width — narrower bands need more bands to hit
    the same recall. Also: the count thunk must not fire unless
    auto-sizing actually needs the corpus cardinality."""
    import math

    from flink_connectors_spark.operators.similarity import (
        resolve_lsh_banding,
    )

    def boom():
        raise AssertionError("count() must not run")

    # both pinned -> no count, passthrough
    assert resolve_lsh_banding(16, 4, boom) == (16, 4)

    # explicit width -> no count; band count from recall formula
    for bits in (4, 8, 12):
        n_planes, b = resolve_lsh_banding(None, bits, boom, threshold=0.8)
        assert b == bits and n_planes % bits == 0
        p_bit = 1.0 - math.acos(0.8) / math.pi
        p_band = p_bit**bits
        want = max(2, min(128, math.ceil(math.log(0.1) / math.log(1.0 - p_band))))
        assert n_planes // bits == want
    # wider bands are more selective per band -> need MORE bands for
    # the same recall (the r2 bug under-banded narrow widths by reusing
    # the auto-width band count)
    n4, _ = resolve_lsh_banding(None, 4, boom, threshold=0.8)
    n12, _ = resolve_lsh_banding(None, 12, boom, threshold=0.8)
    assert n12 // 12 >= n4 // 4

    # full auto path consumes the provided count
    n_planes, bits = resolve_lsh_banding(None, None, lambda: 50_000)
    assert bits >= 16 and n_planes % bits == 0


def test_lsh_dedup_caches_released_by_unpersist_inputs(spark, sf_dir):
    """minhash LSH plans persist their shingle/band tables; the caller
    owns release (the nightly-ingest loop shape). unpersist_inputs must
    drop every pinned frame back to StorageLevel NONE."""
    from flink_connectors_spark.operators.dedup import (
        minhash_lsh_pairs_bipartite,
        unpersist_inputs,
    )
    from flink_connectors_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = minhash_lsh_pairs_bipartite(docs, docs)
    out.count()  # materialize -> caches populated
    cached = out._fcs_cached_inputs
    assert cached and all(df.storageLevel.useMemory for df in cached)
    unpersist_inputs(out, blocking=True)
    assert all(not df.storageLevel.useMemory for df in cached)


def _checkpoint_rdd_ids(frames):
    """Backing RDD id of each localCheckpoint'ed frame (LogicalRDD)."""
    ids = []
    for df in frames:
        plan = df._jdf.queryExecution().analyzed()
        assert plan.getClass().getSimpleName() == "LogicalRDD", (
            "expected a checkpointed frame, got " + plan.getClass().getName()
        )
        ids.append(plan.rdd().id())
    return ids


def test_lsh_checkpoint_blocks_released_by_unpersist_inputs(spark, sf_dir):
    """minhash_lsh_pairs pins its shingle/band tables via eager
    localCheckpoint — those blocks live OUTSIDE the cache manager, so
    DataFrame.unpersist alone would be a silent no-op and nightly-loop
    callers would accumulate one corpus-sized checkpoint per batch.
    unpersist_inputs must release the backing checkpoint RDDs."""
    from flink_connectors_spark.operators.dedup import (
        minhash_lsh_pairs,
        unpersist_inputs,
    )
    from flink_connectors_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = minhash_lsh_pairs(docs)
    out.count()
    cached = out._fcs_cached_inputs
    rdd_ids = _checkpoint_rdd_ids(cached)
    persistent = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert all(i in persistent for i in rdd_ids), (
        "eager localCheckpoint should have registered persistent RDDs"
    )
    unpersist_inputs(out, blocking=True)
    persistent_after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert all(i not in persistent_after for i in rdd_ids), (
        "unpersist_inputs left checkpoint RDD blocks pinned"
    )


def test_link_prediction_pairs_released_by_unpersist_inputs(spark, sf_dir):
    """similarity_graph_link_prediction checkpoints its LSH pair list;
    the same caller-owns-release contract must actually free it."""
    from flink_connectors_spark.operators.dedup import unpersist_inputs
    from flink_connectors_spark.registry import all_specs

    out = all_specs()["similarity_graph_link_prediction"].fn(spark, sf_dir)
    out.count()
    cached = out._fcs_cached_inputs
    rdd_ids = _checkpoint_rdd_ids(cached)
    persistent = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert all(i in persistent for i in rdd_ids)
    unpersist_inputs(out, blocking=True)
    persistent_after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert all(i not in persistent_after for i in rdd_ids)


def test_bloom_guard_no_false_negatives(spark, sf_dir):
    """The soundness invariant that makes the Bloom pre-filter safe:
    every true member is bloom-positive (a false negative would drop
    a real duplicate from the verify join). False positives are
    allowed but must be a small minority at the auto-sized load
    factor (~10 bits/key, k=3 -> ~2% worst case)."""
    from flink_connectors_spark.registry import all_specs

    rows = all_specs()["dedup_bloom_guard"].fn(spark, sf_dir).collect()
    fn = sum(1 for r in rows if r["true_dup"] == 1 and r["bloom_hit"] == 0)
    assert fn == 0, f"{fn} false negatives — bloom construction broken"
    non_members = [r for r in rows if r["true_dup"] == 0]
    fp = sum(1 for r in non_members if r["bloom_hit"] == 1)
    assert fp <= max(2, len(non_members) // 20), (
        f"false-positive rate implausibly high: {fp}/{len(non_members)}"
    )


def test_bloom_bitmap_validation_and_shape(spark):
    import pytest as _pytest

    from flink_connectors_spark.operators.scale import bloom_bitmap

    df = spark.createDataFrame([("a" * 32,)], "fp string")
    with _pytest.raises(ValueError):
        bloom_bitmap(df, m_bits=1000)  # not a multiple of 62
    with _pytest.raises(ValueError):
        bloom_bitmap(df, n_hashes=5)
    bf = bloom_bitmap(df, m_bits=62 * 4, n_hashes=2).collect()[0]["bf"]
    assert len(bf) == 4
    assert sum(bin(w & ((1 << 62) - 1)).count("1") for w in bf) <= 2


def test_bloom_merge_equals_rebuild(spark):
    """OR-merging per-batch bitmaps must answer membership identically
    to one bitmap built over the union — the property that lets the
    nightly ingest skip rebuilding over the historical corpus."""
    from flink_connectors_spark.operators.scale import (
        bloom_bitmap,
        bloom_merge,
        bloom_might_contain,
    )

    import hashlib

    keys1 = [(hashlib.md5(f"a{i}".encode()).hexdigest(),) for i in range(40)]
    keys2 = [(hashlib.md5(f"b{i}".encode()).hexdigest(),) for i in range(40)]
    d1 = spark.createDataFrame(keys1, "fp string")
    d2 = spark.createDataFrame(keys2, "fp string")
    merged = bloom_merge([bloom_bitmap(d1), bloom_bitmap(d2)])
    rebuilt = bloom_bitmap(d1.unionByName(d2))
    assert merged.collect()[0]["bf"] == rebuilt.collect()[0]["bf"]
    probe = spark.createDataFrame(
        keys1 + [(hashlib.md5(f"c{i}".encode()).hexdigest(),) for i in range(40)],
        "fp string",
    )
    hits = {
        r["fp"]: r["bloom_hit"]
        for r in bloom_might_contain(probe, merged).collect()
    }
    assert all(hits[k] == 1 for (k,) in keys1), "merged filter lost members"


def test_bloom_bitmap_bits_match_python_model(spark):
    """Cross-check the bitmap's exact bit pattern against an
    independent Python model of the documented hash math (8-hex-char
    md5 slices -> pos mod m; 62-bit words) over random-ish keys — a
    flipped bit anywhere breaks equality."""
    import hashlib

    from flink_connectors_spark.operators.scale import bloom_bitmap

    keys = [hashlib.md5(f"k{i}".encode()).hexdigest() for i in range(137)]
    m_bits, n_hashes, w = 62 * 16, 3, 62
    words = [0] * 16
    for fp in keys:
        for j in range(n_hashes):
            pos = int(fp[8 * j : 8 * j + 8], 16) % m_bits
            words[pos // w] |= 1 << (pos % w)
    got = bloom_bitmap(
        spark.createDataFrame([(k,) for k in keys], "fp string"),
        m_bits=m_bits,
        n_hashes=n_hashes,
    ).collect()[0]["bf"]
    assert list(got) == words


def test_auto_bloom_bits_sizing_rule():
    """The corpus-derived sizing rule enforced in code: ~bits_per_key
    bits per member, rounded UP to a 62-bit word, floored at 992 —
    and identical to the DuckDB-side integer formula the oracles
    embed (((greatest(992, n*10) + 61) // 62) * 62)."""
    import pytest as _pytest

    from flink_connectors_spark.operators.scale import auto_bloom_bits

    for n in (0, 1, 50, 99, 100, 167, 1000, 12345, 10**7):
        m = auto_bloom_bits(n)
        assert m % 62 == 0
        assert m >= max(992, n * 10)
        assert m - 62 < max(992, n * 10)  # tight: no over-allocation
        assert m == ((max(992, n * 10) + 61) // 62) * 62  # oracle formula
    assert auto_bloom_bits(100, bits_per_key=20) >= 2000
    with _pytest.raises(ValueError):
        auto_bloom_bits(-1)
    with _pytest.raises(ValueError):
        auto_bloom_bits(10, bits_per_key=0)


def test_bloom_saturation_guard_is_loud(spark):
    """A deliberately undersized filter must REFUSE at build time
    (BloomSaturationError), not silently degrade every probe to
    bloom_hit=1; a correctly auto-sized filter over the same keys
    passes the same guard with fill near the ~0.26 design point."""
    import hashlib

    import pytest as _pytest

    from flink_connectors_spark.operators.scale import (
        BloomSaturationError,
        bloom_bitmap,
        bloom_fill_ratio,
    )

    keys = [(hashlib.md5(f"s{i}".encode()).hexdigest(),) for i in range(400)]
    df = spark.createDataFrame(keys, "fp string")
    with _pytest.raises(BloomSaturationError):
        # 400 keys * 3 hashes into 124 bits: hopelessly saturated
        bloom_bitmap(df, m_bits=62 * 2, assert_fill_below=0.5)
    ok = bloom_bitmap(df, assert_fill_below=0.5)  # auto-sized: passes
    fill = bloom_fill_ratio(ok).first()
    assert fill["m_bits"] >= 4000  # 400 keys * 10 bits/key
    assert 0.05 < fill["fill_ratio"] < 0.5
    assert fill["set_bits"] <= 3 * 400


def test_bloom_probe_null_fp_forces_verify(spark):
    """ADVICE fix: a NULL fingerprint must get verdict 1 (routed to
    the exact verify join), never NULL — a NULL verdict falls out of
    both branches of the guarded-ingest filter and silently drops
    the row."""
    import hashlib

    from flink_connectors_spark.operators.scale import (
        bloom_bitmap,
        bloom_might_contain,
    )

    members = [(hashlib.md5(f"m{i}".encode()).hexdigest(),) for i in range(10)]
    bmp = bloom_bitmap(spark.createDataFrame(members, "fp string"))
    probe = spark.createDataFrame(
        [(1, members[0][0]), (2, None)], "id long, fp string"
    )
    rows = {r["id"]: r["bloom_hit"] for r in bloom_might_contain(probe, bmp).collect()}
    assert rows[1] == 1
    assert rows[2] == 1  # NULL fp -> forced verify, not a silent drop


def test_bloom_probe_preserves_caller_bf_column(spark):
    """ADVICE fix: the probe name-spaces the bitmap column, so a
    caller whose DataFrame already has a `bf` column keeps it."""
    import hashlib

    from flink_connectors_spark.operators.scale import (
        bloom_bitmap,
        bloom_might_contain,
    )

    members = [(hashlib.md5(b"x").hexdigest(),)]
    bmp = bloom_bitmap(spark.createDataFrame(members, "fp string"))
    probe = spark.createDataFrame(
        [(members[0][0], "keep-me")], "fp string, bf string"
    )
    out = bloom_might_contain(probe, bmp)
    row = out.first()
    assert out.columns == ["fp", "bf", "bloom_hit"]
    assert row["bf"] == "keep-me"
    assert row["bloom_hit"] == 1


def test_bloom_merge_width_mismatch_raises(spark):
    """Merging bitmaps of different widths (a family NOT sized once)
    must raise at evaluation, not silently null out words."""
    import hashlib

    import pytest as _pytest

    from flink_connectors_spark.operators.scale import bloom_bitmap, bloom_merge

    keys = [(hashlib.md5(f"w{i}".encode()).hexdigest(),) for i in range(5)]
    df = spark.createDataFrame(keys, "fp string")
    a = bloom_bitmap(df, m_bits=62 * 4)
    b = bloom_bitmap(df, m_bits=62 * 8)
    with _pytest.raises(Exception, match="width mismatch"):
        bloom_merge([a, b]).collect()


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_countmin_estimate_never_underestimates(spark, sf_dir):
    """CMS structural guarantee: est >= exact for EVERY key (not just
    the probed top-10) — collisions only ever add."""
    from flink_connectors_spark.operators.scale import (
        countmin_counters,
        countmin_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_n"))
    counters = countmin_counters(li, "l_partkey", depth=4, width=64)
    est = countmin_estimate(exact, counters, "l_partkey", depth=4, width=64)
    bad = est.filter(F.col("cms_estimate") < F.col("exact_n")).count()
    assert bad == 0


def test_countmin_merge_equals_rebuild(spark, sf_dir):
    """Mergeability: sketch(A) + sketch(B) cell-wise == sketch(A∪B).
    The additive-summary contract that makes the nightly sketch an
    increment, not a rescan."""
    from flink_connectors_spark.operators.scale import countmin_counters

    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = (
        countmin_counters(a, "l_partkey", depth=2, width=32)
        .unionByName(countmin_counters(b, "l_partkey", depth=2, width=32))
        .groupBy("j", "cell")
        .agg(F.sum("n").alias("n"))
    )
    direct = countmin_counters(li, "l_partkey", depth=2, width=32)
    m = {(r["j"], r["cell"]): r["n"] for r in merged.collect()}
    d = {(r["j"], r["cell"]): r["n"] for r in direct.collect()}
    assert m == d


def test_countmin_counter_table_bounded(spark, sf_dir):
    """The sketch is sketch-sized: counter rows <= depth * width no
    matter the input."""
    from flink_connectors_spark.operators.scale import countmin_counters

    li = load_table(spark, sf_dir, "lineitem")
    n = countmin_counters(li, "l_partkey", depth=3, width=16).count()
    assert n <= 3 * 16


# ---------------------------------------------------------------------------
# Prefix-sharded Bloom family
# ---------------------------------------------------------------------------


def test_sharded_bloom_no_false_negatives_and_filters(spark, sf_dir):
    """Every member probes 1 across the family; non-members mostly
    probe 0 (the filter actually filters); NULL fps probe 1."""
    from flink_connectors_spark.operators.scale import (
        bloom_bitmap_sharded,
        bloom_might_contain_sharded,
    )

    docs = load_table(spark, sf_dir, "documents")
    members = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5(F.col("text")).alias("fp")
    )
    family = bloom_bitmap_sharded(members, n_shards=8).localCheckpoint()
    assert family.count() == 8
    probed_members = bloom_might_contain_sharded(
        members, family, n_shards=8
    )
    assert probed_members.filter(F.col("bloom_hit") == 0).count() == 0
    others = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.md5(F.concat(F.col("text"), F.lit("-x"))).alias("fp")
    )
    n_others = others.count()
    fp_hits = bloom_might_contain_sharded(others, family, n_shards=8).filter(
        F.col("bloom_hit") == 1
    ).count()
    assert fp_hits < 0.15 * n_others, f"{fp_hits}/{n_others} false positives"
    nulls = spark.createDataFrame([(None,)], "fp string")
    got = bloom_might_contain_sharded(nulls, family, n_shards=8).first()
    assert got["bloom_hit"] == 1  # forced verify, never silently dropped


def test_sharded_bloom_merge_equals_rebuild(spark, sf_dir):
    """family(A) OR family(B) == family(A ∪ B) word-for-word — the
    per-shard additive maintenance contract."""
    from flink_connectors_spark.operators.scale import (
        bloom_bitmap_sharded,
        bloom_merge_sharded,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("fp")
    )
    a = docs.filter(F.col("doc_id") % 2 == 0).select("fp")
    b = docs.filter(F.col("doc_id") % 2 == 1).select("fp")
    w = 62 * 40
    fa = bloom_bitmap_sharded(a, n_shards=8, m_bits=w)
    fb = bloom_bitmap_sharded(b, n_shards=8, m_bits=w)
    merged = {
        r["shard_id"]: list(r["bf"])
        for r in bloom_merge_sharded([fa, fb]).collect()
    }
    direct = {
        r["shard_id"]: list(r["bf"])
        for r in bloom_bitmap_sharded(
            docs.select("fp"), n_shards=8, m_bits=w
        ).collect()
    }
    assert merged == direct


def test_sharded_bloom_agrees_with_unsharded_semantics(spark, sf_dir):
    """A 1-shard family IS the flat bitmap: identical words, identical
    probe verdicts (sharding is pure routing, no bit-math change)."""
    from flink_connectors_spark.operators.scale import (
        bloom_bitmap,
        bloom_bitmap_sharded,
        bloom_might_contain,
        bloom_might_contain_sharded,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.md5(F.col("text")).alias("fp")
    )
    w = 62 * 64
    flat = bloom_bitmap(docs, m_bits=w)
    fam1 = bloom_bitmap_sharded(docs, n_shards=1, m_bits=w)
    assert list(flat.first()["bf"]) == list(fam1.first()["bf"])
    probe_flat = {
        r["fp"]: r["bloom_hit"]
        for r in bloom_might_contain(docs, flat, m_bits=w).collect()
    }
    probe_fam = {
        r["fp"]: r["bloom_hit"]
        for r in bloom_might_contain_sharded(
            docs, fam1, n_shards=1
        ).collect()
    }
    assert probe_flat == probe_fam


def test_mutual_knn_groupby_mutuality_no_pinned_blocks(spark, sf_dir):
    """r14: mutual_knn_edges replaced the eager-checkpoint +
    reversed-key self-join with a count-2 group-by over the directed
    top-k (cosine is bit-symmetric, so both directions of a mutual
    pair carry the same score). Pin (a) the mutuality semantics
    against a literal two-window replay and (b) that the operator no
    longer pins ANY block-manager state (the r8 checkpoint-leak class
    is structurally gone)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_connectors_spark.operators.similarity import (
        mutual_knn_edges,
    )
    from flink_connectors_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(60)
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    out = sorted(map(tuple, mutual_knn_edges(emb, k=2).collect()))
    after = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    assert after == before, (
        "mutual_knn_edges pinned block-manager state"
    )

    # literal replay: directed top-k both ways, edge iff both survive
    from flink_connectors_spark.operators.similarity import (
        dot_product,
        l2_norm,
    )

    v = emb.select(
        "label", "vec_id", "embedding",
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    a, b = v.alias("a"), v.alias("b")
    directed = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        F.round(
            F.try_divide(
                dot_product(F.col("a.embedding"), F.col("b.embedding")),
                F.col("a.nrm") * F.col("b.nrm"),
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    knn = (
        directed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("src", "dst", "score")
    )
    rev = knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    want = sorted(
        map(
            tuple,
            knn.join(rev, ["src", "dst"])
            .filter(F.col("src") < F.col("dst"))
            .select(
                F.col("src").alias("id1"),
                F.col("dst").alias("id2"),
                "score",
            )
            .collect(),
        )
    )
    assert out == want


def test_opq_reflected_corpus_released_by_unpersist_inputs(spark, sf_dir):
    """ADVICE r8: opq_rotation_build eager-checkpoints the reflected
    corpus (yc); topk_opq / topk_ivf_opq must tag it (plus whatever
    the PQ lifecycle already tracked) on their result so
    unpersist_inputs frees the corpus-scale blocks after
    materialization."""
    from flink_connectors_spark.operators.dedup import unpersist_inputs
    from flink_connectors_spark.operators.similarity import topk_opq
    from flink_connectors_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(80)
    q = emb.limit(5)
    out = topk_opq(q, emb, k=3, subspaces=2, codebook_k=4, iters=1)
    out.count()
    cached = out._fcs_cached_inputs
    assert cached, "topk_opq result must track its checkpointed inputs"
    rdd_ids = _checkpoint_rdd_ids(cached)
    persistent = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert all(i in persistent for i in rdd_ids)
    unpersist_inputs(out, blocking=True)
    persistent_after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert all(i not in persistent_after for i in rdd_ids), (
        "unpersist_inputs left the reflected-corpus checkpoint pinned"
    )


def test_corpus_grams_stress_counts_scale_exactly(spark, sf_dir, tmp_path):
    """4x-union stress for the tokenized-corpus artifact: corpus-level
    count relations must scale EXACTLY linearly (unigram counts x4,
    offset-tagged pair counts x4 — exact integers, so any drift is a
    build bug, not noise), and per-document statistics served from the
    stored relations must be copy-invariant (each shifted duplicate
    doc reports the same repetition fractions as its original). This
    is the duplication-invariance a 100 TB ingest relies on: growing
    the corpus never changes what a stored per-doc statistic says
    about an unchanged document."""
    from flink_connectors_spark.operators.text import (
        corpus_grams_build_artifact,
        read_corpus_grams,
        top_ngram_fraction,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    big = docs
    for i in range(1, 4):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    p1, p4 = str(tmp_path / "g1"), str(tmp_path / "g4")
    corpus_grams_build_artifact(docs, p1)
    corpus_grams_build_artifact(big, p4)
    ug1 = {
        r["word"]: r["n_w"]
        for r in read_corpus_grams(spark, p1, "unigrams").collect()
    }
    ug4 = {
        r["word"]: r["n_w"]
        for r in read_corpus_grams(spark, p4, "unigrams").collect()
    }
    assert ug4 == {w: 4 * c for w, c in ug1.items()}
    pr1 = {
        (r["off"], r["w1"], r["w2"]): r["n_pair"]
        for r in read_corpus_grams(spark, p1, "pairs").collect()
    }
    pr4 = {
        (r["off"], r["w1"], r["w2"]): r["n_pair"]
        for r in read_corpus_grams(spark, p4, "pairs").collect()
    }
    assert pr4 == {k: 4 * c for k, c in pr1.items()}
    # per-doc statistic from the stored grams: copy-invariant
    rep = top_ngram_fraction(
        None, gram_counts=read_corpus_grams(spark, p4, "grams")
    ).collect()
    by_id = {r["doc_id"]: (r["top2_frac"], r["top3_frac"], r["flagged"])
             for r in rep}
    originals = {k: v for k, v in by_id.items() if k < 1_000_000}
    assert originals, "fixture produced no original-copy rows"
    for k, v in by_id.items():
        assert v == by_id[k % 1_000_000 if k >= 1_000_000 else k], k


def test_bloom_words_family_guards(spark, sf_dir):
    """r14 review findings: (a) the artifact build rejects the
    provisioning mistakes bloom_bitmap rejects (n_hashes outside
    md5's 4 slices, non-positive width) instead of persisting NULL
    word rows that crash reads far away; (b) read_bloom_bitmap pins
    the caller's probe n_hashes against the family's build value —
    a mismatch would silently produce Bloom false negatives."""
    import shutil
    import tempfile

    import pytest as _pytest

    from flink_connectors_spark.operators.scale import (
        bloom_words_build_artifact,
        read_bloom_bitmap,
    )
    from flink_connectors_spark.session import load_table

    fps = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5(F.col("text")).alias("fp"))
        .limit(50)
    )
    path = tempfile.mkdtemp(prefix="fcs_test_bloomguards_")
    try:
        with _pytest.raises(ValueError, match="n_hashes"):
            bloom_words_build_artifact(fps, path, 992, n_hashes=5)
        with _pytest.raises(ValueError, match="positive multiple"):
            bloom_words_build_artifact(fps, path, 0)
        shutil.rmtree(path, ignore_errors=True)
        bloom_words_build_artifact(fps, path, 992, n_hashes=2)
        with _pytest.raises(ValueError, match="mismatch"):
            read_bloom_bitmap(spark, path, n_hashes=3)
        assert read_bloom_bitmap(spark, path, n_hashes=2).count() == 1
    finally:
        shutil.rmtree(path, ignore_errors=True)
