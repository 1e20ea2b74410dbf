"""Named query plans (DataFrame-first) with ANSI-SQL oracles.

Modules register into ``flink_connectors_spark.registry`` on import:

- ``relational``      : scans, joins, aggregations, set ops, subqueries
- ``windows``         : window functions with frames
- ``scalar``          : scalar function families (string/date/math/json)
- ``llm_ops``         : dedup / similarity / text-analysis operators
- ``sink_semantics``  : the connector's changelog->table translation
- ``streaming_batch`` : batch-expressible streaming semantics (windows,
                        sessionization, dedup, watermark horizon)
"""
