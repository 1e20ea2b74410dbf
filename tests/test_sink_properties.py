"""Property-based sink-semantics tests (SURVEY.md §5: the reference
ships no test corpus, so the changelog -> MergeTree translation is
specified here against an independent model).

For arbitrary changelog sequences, replaying through each write mode
and then applying the target engine's compaction rule must reproduce
the state a plain dict-replay produces:

- replacing + version: per key, the row with the max version wins;
  present iff its deleted flag is 0  (ReplacingMergeTree semantics,
  reference `ClickHouseRowConverter.java:83-94` + `README.md:20`).
- collapsing: per (key, value) the sign sum is the surviving row
  multiplicity; a consistent changelog nets to {0, 1}
  (CollapsingMergeTree, `ClickHouseRowConverter.java:71-82`).
- insert_only: deletes/update_befores silently dropped
  (`ClickHouseBatchExecutor.java:49-53`).

Spark jobs are slow per example, so the DataFrame round-trip runs
with few, large examples; the generator produces *consistent*
changelogs (UPDATE_BEFORE/DELETE always carry the key's current
value) the way Flink's planner would emit them.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink.writer import translate_changelog

KEYS = st.integers(min_value=0, max_value=4)
VALS = st.integers(min_value=0, max_value=100)


@st.composite
def consistent_changelog(draw):
    """Sequence of (op, key, value) where retractions match the
    current state, as a changelog produced by a keyed operator
    would."""
    n = draw(st.integers(min_value=1, max_value=40))
    state: dict[int, int] = {}
    out = []
    for _ in range(n):
        k = draw(KEYS)
        if k in state and draw(st.booleans()):
            if draw(st.booleans()):
                # update: retract old, assert new
                old = state[k]
                new = draw(VALS)
                out.append(("UB", k, old))
                out.append(("UA", k, new))
                state[k] = new
            else:
                out.append(("D", k, state.pop(k)))
        else:
            v = draw(VALS)
            if k not in state:
                out.append(("I", k, v))
                state[k] = v
    return out, state


def _df(spark, rows):
    return spark.createDataFrame(
        [(op, k, v, i) for i, (op, k, v) in enumerate(rows)],
        "op string, k int, v int, ver int",
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=consistent_changelog())
def test_replacing_replay_reaches_dict_state(spark, data):
    rows, expected = data
    opts = SinkOptions(
        url="parquet://x", table_name="t", write_mode="replacing",
        primary_key=("k",),
    )
    out = translate_changelog(_df(spark, rows), opts)
    # ReplacingMergeTree compaction: max version per key, deleted=0
    last = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("k").orderBy(
                    F.desc("ver")
                )
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("deleted") == 0))
        .select("k", "v")
    )
    got = {r["k"]: r["v"] for r in last.collect()}
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=consistent_changelog())
def test_collapsing_replay_nets_to_live_rows(spark, data):
    rows, expected = data
    opts = SinkOptions(
        url="parquet://x", table_name="t", write_mode="collapsing"
    )
    out = translate_changelog(_df(spark, rows), opts)
    # CollapsingMergeTree compaction: net sign per (key, value)
    net = (
        out.groupBy("k", "v")
        .agg(F.sum("sign").alias("net"))
        .filter(F.col("net") != 0)
    )
    rows_net = net.collect()
    assert all(r["net"] == 1 for r in rows_net), "consistent log nets to 1"
    got = {r["k"]: r["v"] for r in rows_net}
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=consistent_changelog())
def test_insert_only_keeps_adds_drops_retractions(spark, data):
    rows, _ = data
    opts = SinkOptions(url="parquet://x", table_name="t")
    out = translate_changelog(_df(spark, rows), opts)
    want = [(k, v) for (op, k, v) in rows if op in ("I", "UA")]
    got = [(r["k"], r["v"]) for r in out.orderBy("ver").collect()]
    assert got == want
    assert "op" not in out.columns


# ---------------------------------------------------------------------------
# Pre-compaction equivalence under random changelogs
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _final_replacing_state(rows):
    """Reference model of ReplacingMergeTree visibility: last version
    per key wins, visible iff its deleted flag is 0. UB rows write
    deleted=1 at their version like any UB/D (mirror of
    translate_changelog)."""
    best = {}
    for pk, ver, payload, op in rows:
        deleted = 0 if op in ("I", "UA") else 1
        if pk not in best or ver > best[pk][0]:
            best[pk] = (ver, payload, deleted)
    return {
        (pk, payload)
        for pk, (ver, payload, deleted) in best.items()
        if deleted == 0
    }


@given(
    logs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # pk
            st.floats(
                min_value=0, max_value=100, allow_nan=False
            ),  # payload
            st.sampled_from(["I", "UB", "UA", "D"]),  # op
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_precompact_equivalence_random_changelogs(spark, logs):
    """For ANY changelog sequence (versions = arrival order), the
    pre-compacted batch must land the same replacing-mode final state
    as the raw batch — the property that makes sink.precompact safe
    to enable blindly."""
    from flink_connectors_spark.sink.options import SinkOptions
    from flink_connectors_spark.sink.writer import precompact_changelog

    rows = [
        (pk, ver + 1, payload, op)
        for ver, (pk, payload, op) in enumerate(logs)
    ]
    df = spark.createDataFrame(
        rows, "pk long, ver long, payload double, op string"
    )
    opts = SinkOptions(
        url="x", table_name="t", write_mode="replacing",
        primary_key=("pk",), version_column="ver",
    )
    compacted = [
        (r["pk"], r["ver"], r["payload"], r["op"])
        for r in precompact_changelog(df, opts).collect()
    ]
    # 1. state equivalence against the reference model
    assert _final_replacing_state(compacted) == _final_replacing_state(rows)
    # 2. compaction bound: at most one surviving row per key
    pks = [pk for pk, *_ in compacted]
    assert len(pks) == len(set(pks))
    # 3. no fabricated rows
    assert set(compacted) <= set(rows)


def _final_replacing_state_tie_arrival(rows):
    """Tie-aware model: on EQUAL versions the later arrival wins
    (ReplacingMergeTree keeps the last-inserted row on a version
    tie) — `>=` instead of `>` while scanning in arrival order."""
    best = {}
    for pk, ver, payload, op in rows:
        deleted = 0 if op in ("I", "UA") else 1
        if pk not in best or ver >= best[pk][0]:
            best[pk] = (ver, payload, deleted)
    return {
        (pk, payload)
        for pk, (ver, payload, deleted) in best.items()
        if deleted == 0
    }


@given(
    logs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # pk: few keys
            st.integers(min_value=1, max_value=3),  # ver: DUPLICATES likely
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.sampled_from(["I", "UB", "UA", "D"]),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_precompact_equivalence_duplicate_versions(spark, logs):
    """ADVICE gap closed: with NON-unique versions per key the
    compacted winner must match the tie-aware reference model
    (last arrival wins among max-version rows), on a single
    partition where arrival order is total. The unique-version
    property above can never exercise this branch."""
    from flink_connectors_spark.sink.options import SinkOptions
    from flink_connectors_spark.sink.writer import precompact_changelog

    rows = [(pk, ver, payload, op) for pk, ver, payload, op in logs]
    df = spark.createDataFrame(
        rows, "pk long, ver long, payload double, op string"
    ).coalesce(1)
    opts = SinkOptions(
        url="x", table_name="t", write_mode="replacing",
        primary_key=("pk",), version_column="ver",
    )
    compacted = [
        (r["pk"], r["ver"], r["payload"], r["op"])
        for r in precompact_changelog(df, opts).collect()
    ]
    assert _final_replacing_state_tie_arrival(
        compacted
    ) == _final_replacing_state_tie_arrival(rows)
    pks = [pk for pk, *_ in compacted]
    assert len(pks) == len(set(pks))
    assert set(compacted) <= set(rows)


def _final_collapsing_state(rows):
    """Net sign per (pk, payload) value row — CollapsingMergeTree's
    merge outcome."""
    from collections import Counter

    net = Counter()
    for pk, payload, op in rows:
        net[(pk, payload)] += 1 if op in ("I", "UA") else -1
    return {k: v for k, v in net.items() if v != 0}


@given(
    logs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.sampled_from([1.0, 2.0]),  # few distinct value rows
            st.sampled_from(["I", "UB", "UA", "D"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_precompact_collapsing_equivalence_random(spark, logs):
    """Collapsing pre-compaction must preserve the per-value net sign
    for ANY changelog — including nets beyond ±1 (malformed but
    possible), which the explode-|net| path must reproduce."""
    from flink_connectors_spark.sink.options import SinkOptions
    from flink_connectors_spark.sink.writer import precompact_changelog

    df = spark.createDataFrame(
        list(logs), "pk long, payload double, op string"
    )
    opts = SinkOptions(url="x", table_name="t", write_mode="collapsing")
    out = [
        (r["pk"], r["payload"], r["op"])
        for r in precompact_changelog(df, opts).collect()
    ]
    assert _final_collapsing_state(out) == _final_collapsing_state(logs)


def _final_upsert_state(rows):
    """Model of the upsert executor: ops apply in version order; UB
    is dropped (`ClickHouseUpsertExecutor.java:60-79`); final row per
    key is the last I/UA, absent if the last effective op was D."""
    state = {}
    for pk, ver, payload, op in sorted(rows, key=lambda r: r[1]):
        if op in ("I", "UA"):
            state[pk] = payload
        elif op == "D":
            state.pop(pk, None)
    return set(state.items())


@given(
    logs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.sampled_from(["I", "UB", "UA", "D"]),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_precompact_upsert_equivalence_random(spark, logs):
    """Upsert-mode pre-compaction (which DOES drop UB — inert in this
    executor, unlike replacing) must preserve the applied final state
    for any changelog sequence."""
    from flink_connectors_spark.sink.options import SinkOptions
    from flink_connectors_spark.sink.writer import precompact_changelog

    rows = [
        (pk, ver + 1, payload, op)
        for ver, (pk, payload, op) in enumerate(logs)
    ]
    df = spark.createDataFrame(
        rows, "pk long, ver long, payload double, op string"
    )
    opts = SinkOptions(
        url="x", table_name="t", write_mode="upsert",
        primary_key=("pk",), version_column="ver",
    )
    compacted = [
        (r["pk"], r["ver"], r["payload"], r["op"])
        for r in precompact_changelog(df, opts).collect()
    ]
    assert _final_upsert_state(compacted) == _final_upsert_state(rows)
    pks = [pk for pk, *_ in compacted]
    assert len(pks) == len(set(pks))
    assert all(op != "UB" for *_, op in compacted)


# ---------------------------------------------------------------------------
# hash-compat string keys: property vs the pure-Python Java emulation
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.text(
            # full unicode incl. supplementary planes; exclude
            # surrogates (not encodable as real text)
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x10FFFF
            ),
            max_size=24,
        )
        | st.none(),
        min_size=1,
        max_size=24,
        unique=True,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_java_string_hash_property_matches_emulation(spark, vals):
    """For arbitrary unicode strings (incl. supplementary codepoints
    -> surrogate pairs in Java's char view) and NULLs, the codegen'd
    hash-compat expression equals java.lang.String.hashCode exactly
    (via the pure-Python emulation in test_sink_sharding)."""
    from test_sink_sharding import _java_list_hash_py

    from flink_connectors_spark.sink.partitioner import java_list_hash

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r.v: r.h
        for r in df.select(
            "v", java_list_hash(df.schema, ("v",)).alias("h")
        ).collect()
    }
    for v in vals:
        assert got[v] == _java_list_hash_py([v], ["string"]), repr(v)
