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
