"""Sink writer end-to-end: changelog modes against local backends,
compacted-state oracles per FIXTURES.md §B, retry behavior,
partitioner routing."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from pyspark.sql import functions as F

from flink_connectors_spark.sink.backends import (
    DuckDBBackendFactory,
    ParquetDirBackendFactory,
)
from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink.partitioner import apply_partitioning
from flink_connectors_spark.sink.writer import (
    _flush_with_retry,
    foreach_batch_writer,
    translate_changelog,
    write_batch,
)

# FIXTURES.md §B changelog: key (name, grade); ops I/UB/UA/D.
CHANGELOG = [
    ("alice", 1, 10.0, 1, "I"),
    ("bob", 1, 20.0, 2, "I"),
    ("alice", 1, 10.0, 3, "UB"),
    ("alice", 1, 11.0, 4, "UA"),
    ("carol", 2, 30.0, 5, "I"),
    ("bob", 1, 20.0, 6, "UB"),
    ("bob", 1, 21.0, 7, "UA"),
    ("carol", 2, 30.0, 8, "D"),
]
SCHEMA = "name string, grade int, rate double, ver long, op string"


def _changelog_df(spark):
    return spark.createDataFrame(CHANGELOG, SCHEMA)


def _opts(tmp_path, mode, **kw):
    base = dict(
        url=f"parquet://{tmp_path}/sink",
        table_name="sink_t",
        write_mode=mode,
        batch_size=3,
    )
    if mode in ("replacing", "upsert"):
        base["primary_key"] = ("name", "grade")
    base.update(kw)
    return SinkOptions(**base)


def _read_sink(tmp_path):
    files = glob.glob(f"{tmp_path}/sink/sink_t/*.parquet")
    assert files
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT * FROM read_parquet({files!r})"
    ).fetchall()
    cols = [d[0] for d in con.description]
    con.close()
    return cols, rows


def test_insert_only_drops_retractions(spark, tmp_path):
    write_batch(_changelog_df(spark), _opts(tmp_path, "insert_only"))
    cols, rows = _read_sink(tmp_path)
    # I/UA kept (5 rows), UB/D dropped, op column stripped
    assert "op" not in cols
    assert len(rows) == 5
    vers = sorted(r[cols.index("ver")] for r in rows)
    assert vers == [1, 2, 4, 5, 7]


def test_collapsing_appends_sign(spark, tmp_path):
    write_batch(_changelog_df(spark), _opts(tmp_path, "collapsing"))
    cols, rows = _read_sink(tmp_path)
    assert "sign" in cols
    assert len(rows) == len(CHANGELOG)
    # MergeTree-collapse oracle: per-key sign sum != 0 -> key survives
    by_key: dict = {}
    for r in rows:
        k = (r[cols.index("name")], r[cols.index("grade")])
        by_key[k] = by_key.get(k, 0) + r[cols.index("sign")]
    surviving = {k for k, s in by_key.items() if s != 0}
    assert surviving == {("alice", 1), ("bob", 1)}


def test_replacing_appends_deleted_flag(spark, tmp_path):
    write_batch(_changelog_df(spark), _opts(tmp_path, "replacing"))
    cols, rows = _read_sink(tmp_path)
    assert "deleted" in cols
    # Replacing oracle: last-by-ver per key with deleted=0
    latest: dict = {}
    for r in rows:
        k = (r[cols.index("name")], r[cols.index("grade")])
        v = r[cols.index("ver")]
        if k not in latest or v > latest[k][0]:
            latest[k] = (v, r[cols.index("deleted")], r[cols.index("rate")])
    state = {k: v for k, v in latest.items() if v[1] == 0}
    assert set(state) == {("alice", 1), ("bob", 1)}
    assert state[("alice", 1)][2] == 11.0
    assert state[("bob", 1)][2] == 21.0


def test_upsert_mode_applies_mutations(spark, tmp_path):
    db = f"{tmp_path}/upsert.db"
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE sink_t(name VARCHAR, grade INT, rate DOUBLE, ver BIGINT)"
    )
    con.close()
    opts = _opts(tmp_path, "upsert", url=f"duckdb://{db}")
    # single partition => single writer => DuckDB single-writer safe
    df = _changelog_df(spark).repartition(1)
    write_batch(df, opts, backend_factory=DuckDBBackendFactory(db))
    con = duckdb.connect(db)
    rows = con.execute(
        "SELECT name, grade, rate FROM sink_t ORDER BY name"
    ).fetchall()
    con.close()
    # carol deleted; alice/bob updated in place
    assert rows == [("alice", 1, 11.0), ("bob", 1, 21.0)]


def test_upsert_requires_op_column(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "name string, grade int")
    with pytest.raises(ValueError, match="op"):
        translate_changelog(df, _opts(tmp_path, "collapsing"))


def test_insert_only_strict_rejects_deletes(spark, tmp_path):
    with pytest.raises(ValueError, match="insert_only"):
        translate_changelog(
            _changelog_df(spark),
            _opts(tmp_path, "insert_only", ignore_delete=False),
        )


def test_retry_linear_backoff(monkeypatch):
    opts = SinkOptions(
        url="parquet:///tmp/x", table_name="t", max_retries=3
    )
    sleeps: list[float] = []
    monkeypatch.setattr(
        "flink_connectors_spark.sink.writer.time.sleep", sleeps.append
    )
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")

    _flush_with_retry(flaky, opts)
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # linear 1s*attempt, like the reference

    calls["n"] = 0

    def always_fails():
        calls["n"] += 1
        raise IOError("hard")

    with pytest.raises(RuntimeError, match="after 3 attempts"):
        _flush_with_retry(always_fails, opts)
    assert calls["n"] == 3


@pytest.mark.parametrize("strategy", ["balanced", "shuffle", "hash"])
def test_partitioning_strategies(spark, tmp_path, strategy):
    opts = SinkOptions(
        url="parquet:///tmp/x",
        table_name="t",
        partition_strategy=strategy,
        partition_key=("name",) if strategy == "hash" else (),
    )
    df = _changelog_df(spark)
    out = apply_partitioning(df, opts, 4)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == len(CHANGELOG)
    if strategy == "hash":
        # hash routing must co-locate key-equal rows in one partition
        parts = out.select("name").rdd.mapPartitions(
            lambda it: [set(r["name"] for r in it)]
        ).collect()
        seen: dict[str, int] = {}
        for i, names in enumerate(parts):
            for n in names:
                assert n not in seen, f"{n} split across partitions"
                seen[n] = i


def test_partitioning_missing_key(spark):
    opts = SinkOptions(
        url="parquet:///tmp/x",
        table_name="t",
        partition_strategy="hash",
        partition_key=("nope",),
    )
    with pytest.raises(ValueError, match="nope"):
        apply_partitioning(_changelog_df(spark), opts, 4)


def test_foreach_batch_writer_adapter(spark, tmp_path):
    opts = _opts(tmp_path, "insert_only")
    fn = foreach_batch_writer(opts)
    fn(_changelog_df(spark), 0)
    _, rows = _read_sink(tmp_path)
    assert len(rows) == 5


def test_replacing_replay_is_effectively_once(spark, tmp_path):
    """At-least-once delivery + ReplacingMergeTree versions =
    effectively-once: writing the same micro-batch TWICE (a retried
    epoch) must compact to the same final state as writing it once —
    the fault-tolerance contract the reference's README recommends
    version columns for (README.md:20)."""
    opts = _opts(tmp_path, "replacing")
    df = _changelog_df(spark)
    write_batch(df, opts)
    write_batch(df, opts)  # replayed epoch
    cols, rows = _read_sink(tmp_path)
    # ReplacingMergeTree compaction: max ver per key, deleted = 0
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(" + ", ".join(repr(v) for v in r) + ")" for r in rows
        )
        + f") v({', '.join(cols)})"
    )
    final = con.execute(
        """
        SELECT name, grade, rate FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY name, grade
                                       ORDER BY ver DESC) AS rn
          FROM t) WHERE rn = 1 AND deleted = 0
        ORDER BY name
        """
    ).fetchall()
    con.close()
    assert final == [("alice", 1, 11.0), ("bob", 1, 21.0)]


def test_idempotent_epoch_writer_no_duplicates(spark, tmp_path):
    """Replaying the SAME epoch must not duplicate rows (overwrite of
    the epoch directory), while a new epoch appends."""
    from flink_connectors_spark.sink.writer import (
        idempotent_foreach_batch_writer,
    )

    opts = _opts(tmp_path, "insert_only")
    w = idempotent_foreach_batch_writer(opts)
    df = _changelog_df(spark)
    w(df, 7)
    w(df, 7)  # retried epoch — replaces, not appends
    base = f"{tmp_path}/sink/sink_t"
    once = spark.read.parquet(f"{base}/epoch=7").count()
    # insert-only translation keeps I/UA rows only
    assert once == sum(1 for r in CHANGELOG if r[4] in ("I", "UA"))
    w(df, 8)  # genuinely new epoch appends alongside
    total = spark.read.parquet(base).count()
    assert total == 2 * once


def test_idempotent_writer_requires_parquet_target(tmp_path):
    from flink_connectors_spark.sink.writer import (
        idempotent_foreach_batch_writer,
    )

    opts = _opts(tmp_path, "insert_only", url="duckdb:///x.db")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="parquet://"):
        idempotent_foreach_batch_writer(opts)


def test_snapshot_changelog_through_replacing_sink_roundtrip(spark, tmp_path):
    """Closes the CDC loop the repo now covers end-to-end: the
    snapshot-diff changelog producer (pipeline layer) feeds the
    replacing-mode sink (connector layer), and the compacted sink
    state must equal the NEW snapshot exactly — i.e. shipping only
    the delta reconstructs the full refresh."""
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc"), (4, "dd")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 edited, 3 deleted, 5 inserted
        [(1, "aa"), (2, "bb2"), (4, "dd"), (5, "ee")], "doc_id long, fp string"
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    op = (
        F.when(F.col("o.doc_id").isNull(), "I")
        .when(F.col("n.doc_id").isNull(), "D")
        .otherwise("UA")
    )
    changelog = (
        joined.filter(
            F.col("o.doc_id").isNull()
            | F.col("n.doc_id").isNull()
            | (F.col("o.fp") != F.col("n.fp"))
        )
        .select(
            F.coalesce(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_id"),
            F.coalesce(F.col("n.fp"), F.col("o.fp")).alias("fp"),
            F.lit(2).cast("long").alias("ver"),  # snapshot epoch
            op.alias("op"),
        )
    )
    # seed the sink with the OLD snapshot as inserts (epoch 1)...
    seed = old.select(
        "doc_id", "fp", F.lit(1).cast("long").alias("ver"), F.lit("I").alias("op")
    )
    opts = SinkOptions(
        url=f"parquet://{tmp_path}/sink",
        table_name="sink_t",
        write_mode="replacing",
        primary_key=("doc_id",),
        version_column="ver",
        batch_size=16,
    )
    write_batch(seed, opts)
    # ...then ship only the delta
    write_batch(changelog, opts)

    cols, rows = _read_sink(tmp_path)
    latest: dict = {}
    for r in rows:
        k = r[cols.index("doc_id")]
        v = r[cols.index("ver")]
        if k not in latest or v > latest[k][0]:
            latest[k] = (v, r[cols.index("deleted")], r[cols.index("fp")])
    state = {k: fp for k, (v, d, fp) in latest.items() if d == 0}
    expected = {r.doc_id: r.fp for r in new.collect()}
    assert state == expected


def test_precompact_replacing_preserves_final_state(spark, tmp_path):
    """Pre-compacted batch through the replacing sink must land the
    identical final table state as the raw changelog — while shipping
    one row per key instead of the full update history."""
    from flink_connectors_spark.sink.writer import (
        precompact_changelog,
        translate_changelog,
    )

    rows = [
        (1, 1, 10.0, "I"),
        (1, 2, 10.0, "UB"),
        (1, 3, 11.0, "UA"),
        (1, 4, 11.0, "UB"),
        (1, 5, 12.0, "UA"),  # key 1: five rows, net = one UA v5
        (2, 6, 20.0, "I"),
        (2, 7, 20.0, "D"),  # key 2: net = deleted
        (3, 8, 30.0, "I"),  # key 3: untouched single insert
    ]
    df = spark.createDataFrame(rows, "pk long, ver long, payload double, op string")
    opts = SinkOptions(
        url="x", table_name="t", write_mode="replacing",
        primary_key=("pk",), version_column="ver",
    )

    def final_state(changelog):
        translated = translate_changelog(changelog, opts)
        # MergeTree semantics: last version per key, visible if deleted=0
        keep = translated.groupBy("pk").agg(
            F.max_by("payload", "ver").alias("payload"),
            F.max_by("deleted", "ver").alias("deleted"),
        )
        return {
            (r["pk"], r["payload"])
            for r in keep.filter("deleted = 0").collect()
        }

    compacted = precompact_changelog(df, opts)
    assert compacted.count() == 3, "one surviving row per key"
    assert final_state(compacted) == final_state(df) == {(1, 12.0), (3, 30.0)}


def test_precompact_collapsing_cancels_pairs(spark):
    from flink_connectors_spark.sink.writer import precompact_changelog

    rows = [
        (1, 10.0, "I"),
        (1, 10.0, "UB"),   # cancels the insert of the same value row
        (1, 11.0, "UA"),   # survives
        (2, 20.0, "I"),    # survives
    ]
    df = spark.createDataFrame(rows, "pk long, payload double, op string")
    opts = SinkOptions(url="x", table_name="t", write_mode="collapsing")
    got = sorted(
        (r["pk"], r["payload"], r["op"])
        for r in precompact_changelog(df, opts).collect()
    )
    assert got == [(1, 11.0, "I"), (2, 20.0, "I")]


def test_precompact_version_tie_breaks_by_arrival_order(spark):
    """ADVICE fix: on EQUAL versions per key the compacted winner must
    be deterministic and match ReplacingMergeTree's
    keep-last-inserted rule for the raw stream — the latest row in
    batch arrival order, not whichever row_number happened to see
    first. Single partition so arrival order is total (across
    partitions the raw path itself races; see docstring)."""
    from flink_connectors_spark.sink.writer import precompact_changelog

    rows = [
        (1, 7, 10.0, "I"),
        (1, 7, 11.0, "UA"),
        (1, 7, 12.0, "UA"),  # same version 7 three times: last arrival wins
        (2, 3, 20.0, "I"),
        (2, 3, 21.0, "UA"),
    ]
    df = spark.createDataFrame(
        rows, "pk long, ver long, payload double, op string"
    ).coalesce(1)
    opts = SinkOptions(
        url="x", table_name="t", write_mode="replacing",
        primary_key=("pk",), version_column="ver",
    )
    for _ in range(3):  # determinism: same winner on every evaluation
        got = {
            r["pk"]: r["payload"]
            for r in precompact_changelog(df, opts).collect()
        }
        assert got == {1: 12.0, 2: 21.0}


def test_precompact_requires_version_for_keyed_modes(spark):
    from flink_connectors_spark.sink.writer import precompact_changelog

    df = spark.createDataFrame([(1, 1.0, "I")], "pk long, payload double, op string")
    opts = SinkOptions(
        url="x", table_name="t", write_mode="upsert", primary_key=("pk",),
        version_column="missing",
    )
    with pytest.raises(ValueError, match="version"):
        precompact_changelog(df, opts)


def test_precompact_option_through_foreach_batch(spark, tmp_path):
    """`precompact=true` as a sink option: the foreachBatch writer
    lands the identical replacing-mode final state while writing one
    row per key per batch."""
    import duckdb

    from flink_connectors_spark.sink.backends import DuckDBBackendFactory
    from flink_connectors_spark.sink.writer import foreach_batch_writer

    rows = [
        (1, 1, 10.0, "I"), (1, 2, 10.0, "UB"), (1, 3, 12.0, "UA"),
        (2, 4, 20.0, "I"), (2, 5, 20.0, "D"),
        (3, 6, 30.0, "I"),
    ]
    df = spark.createDataFrame(
        rows, "pk long, ver long, payload double, op string"
    )
    states = {}
    for pre in (False, True):
        db = f"{tmp_path}/pre_{pre}.db"
        con = duckdb.connect(db)
        con.execute(
            "CREATE TABLE t(pk BIGINT, ver BIGINT, payload DOUBLE, "
            "deleted BIGINT)"
        )
        con.close()
        opts = SinkOptions(
            url=f"duckdb://{db}", table_name="t", write_mode="replacing",
            primary_key=("pk",), version_column="ver", precompact=pre,
        )
        foreach_batch_writer(opts, backend_factory=DuckDBBackendFactory(db))(
            df.repartition(1), 0
        )
        con = duckdb.connect(db)
        states[pre] = {
            tuple(r)
            for r in con.execute(
                "SELECT pk, payload FROM (SELECT *, ROW_NUMBER() OVER ("
                "PARTITION BY pk ORDER BY ver DESC) rn FROM t) "
                "WHERE rn = 1 AND deleted = 0"
            ).fetchall()
        }
        n_written = con.execute("SELECT COUNT(*) FROM t").fetchone()[0]
        con.close()
        if pre:
            assert n_written == 3, "compacted batch writes one row per key"
    assert states[False] == states[True] == {(1, 12.0), (3, 30.0)}
