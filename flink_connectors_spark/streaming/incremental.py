"""Incremental aggregation -> changelog production.

The reference sink consumes the *changelog* of an aggregation — the
INSERT / UPDATE_BEFORE / UPDATE_AFTER stream Flink's planner derives
from `INSERT INTO sink SELECT k, agg(...) GROUP BY k`
(`README.md:11`, `table/ClickHouseDynamicTableSink.java:26-38`).
Spark's Structured Streaming has update-mode aggregation but does not
expose retractions; this module produces them explicitly, closing the
loop: the engine both *emits* and *consumes* Flink-style changelogs.

``merge_aggregate_delta`` is the foreachBatch kernel: per micro-batch
  1. partially aggregate the batch (map-side sums/counts — only the
     touched groups shuffle),
  2. outer-join against the persisted state table on the group key,
  3. emit I for new groups, UB(old)+UA(new) for changed groups,
  4. return the merged state for the next epoch.

State is a plain keyed table (parquet/Delta at scale); each epoch
touches |touched groups| state rows via one keyed shuffle, never the
full history. Replaying the emitted changelog through the sink's
replacing/collapsing/upsert modes reproduces the state exactly —
tested in tests/test_incremental.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sink.writer import OP_INSERT, OP_UPDATE_AFTER, OP_UPDATE_BEFORE


def merge_aggregate_delta(
    state: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, str],
    count_col: str = "n",
    op_col: str = "op",
) -> tuple[DataFrame, DataFrame]:
    """Merge a micro-batch into keyed (count + sums) aggregate state.

    ``sum_cols`` maps output column -> input column to sum (int64 or
    decimal for exactness). Returns ``(new_state, changelog)``:
    new_state has columns keys + count_col + sum_cols; changelog has
    the same plus ``op_col`` in {I, UB, UA}, ordered so UB precedes
    its UA for each key (sort by keys, op rank).
    """
    keys = list(keys)
    delta = batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(f"__d_{count_col}"),
        *[
            F.sum(F.col(src)).alias(f"__d_{dst}")
            for dst, src in sum_cols.items()
        ],
    )
    metric_cols = [count_col, *sum_cols.keys()]
    if state is None:
        new_state = delta.select(
            *keys,
            *[
                F.col(f"__d_{m}").alias(m)
                for m in metric_cols
            ],
        )
        changelog = new_state.withColumn(op_col, F.lit(OP_INSERT))
        return new_state, changelog

    joined = state.alias("s").join(
        delta.alias("d"), on=keys, how="full_outer"
    )
    touched = F.col(f"__d_{count_col}").isNotNull()
    existed = F.col(f"s.{count_col}").isNotNull()
    merged_metrics = [
        (
            F.coalesce(F.col(f"s.{m}"), F.lit(0))
            + F.coalesce(F.col(f"__d_{m}"), F.lit(0))
        ).alias(m)
        for m in metric_cols
    ]
    new_state = joined.select(*keys, *merged_metrics)

    inserts = (
        joined.filter(touched & ~existed)
        .select(
            *keys,
            *[F.col(f"__d_{m}").alias(m) for m in metric_cols],
        )
        .withColumn(op_col, F.lit(OP_INSERT))
    )
    before = (
        joined.filter(touched & existed)
        .select(*keys, *[F.col(f"s.{m}").alias(m) for m in metric_cols])
        .withColumn(op_col, F.lit(OP_UPDATE_BEFORE))
    )
    after = (
        joined.filter(touched & existed)
        .select(*keys, *merged_metrics)
        .withColumn(op_col, F.lit(OP_UPDATE_AFTER))
    )
    op_rank = (
        F.when(F.col(op_col) == OP_UPDATE_BEFORE, 0)
        .when(F.col(op_col) == OP_UPDATE_AFTER, 1)
        .otherwise(2)
    )
    changelog = (
        inserts.unionByName(before).unionByName(after)
        .orderBy(*keys, op_rank)
    )
    return new_state, changelog
