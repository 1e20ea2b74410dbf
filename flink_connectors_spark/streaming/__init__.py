"""Structured Streaming pipelines (SURVEY.md §2.2 streaming rows,
build plan Phase 3).

The reference sits downstream of Flink SQL streaming; the equivalent
surface here is `readStream` -> event-time transformations ->
`writeStream`, with:

- tumbling / sliding / session windows + watermark (``pipelines``)
- streaming dedup (`dropDuplicates` with watermark)
- stateful per-key processing via applyInPandasWithState
- the sink's foreachBatch writer as the output stage

The batch twins of these pipelines (same semantics, oracle-checkable)
live in ``flink_connectors_spark.plans.streaming_batch``.
"""
