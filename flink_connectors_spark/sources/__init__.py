"""Source-side connectors and read helpers.

The reference repo is sink-only; its host engine supplies sources
(SURVEY.md §2.2 'Sources / scans'). Here:

- ``readers``: schema-explicit batch readers for parquet/csv/json and
  view registration (Spark SQL surface).
- ``replay``: a Python Data Source *streaming reader* that replays a
  parquet changelog in event order with real offset bookkeeping — the
  source-side twin of the sink connector, demonstrating the full
  Structured Streaming connector surface (initialOffset /
  latestOffset / partitions / read / commit).
"""
