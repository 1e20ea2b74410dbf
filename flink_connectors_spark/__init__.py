"""flink_connectors_spark — a PySpark-native analytics engine.

A ground-up Spark-first re-expression of the capabilities of the
reference repo (Rowen110/flink-connectors, a Flink->ClickHouse dynamic
table sink connector), extended with the relational query surface the
reference delegates to its host engine (Flink SQL -> here Spark SQL /
Catalyst) and with large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``    : SparkSession builders + table loading helpers
- ``plans``      : named relational query plans (DataFrame-first) with
                   ANSI-SQL oracles for the correctness harness
- ``sink``       : the connector core — options, statement generation,
                   partitioners, batched writers, changelog modes
- ``operators``  : dedup / similarity / text-analysis operators
- ``functions``  : reusable column expression builders (vector math,
                   text metrics) kept JVM-side where possible
- ``sources``    : read helpers and source registration
- ``streaming``  : Structured Streaming pipelines (windows, watermark,
                   streaming dedup, stateful ops)
- ``registry``   : the query/oracle registry consumed by
                   ``__spark_entry__.py`` (the driver contract)
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
