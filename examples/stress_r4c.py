#!/usr/bin/env python
"""Round-4 wave-3 volume runs (SCALING.md input): scale curves for
the DSIR importance-weight scorer and the repeated-span dedup report.

- dsir_logweights at 1x / 10x / 30x documents with the PRODUCTION
  bucket count (10k): cost model is one token explode reduced to
  per-(doc, bucket) counts (shuffle volume ~ docs x occupied
  buckets, NOT token count), one <=B-row model aggregate, one
  broadcast join back. Expected: linear in corpus, flat in B.
- duplicated_spans at 1x / 10x / 30x with text-tagged copies (each
  copy gets a distinct leading token, so the copy BODIES become
  corpus-repeated — the worst realistic case: nearly every window
  duplicated, dup rows ~ corpus windows). Expected: linear in
  corpus window count; the gram aggregate's HAVING >= 2 cut does no
  work here by construction, which makes this the upper bound.

Method mirrors stress_r4: union sf0.1 N times with shifted ids,
cache+count inputs, one timed action per operator, second timed run
as warm.

Run:  python examples/stress_r4c.py [N ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from flink_connectors_spark.operators.text import (
    dsir_logweights,
    duplicated_spans,
)
from flink_connectors_spark.session import build_session, load_table, spread

SF_DIR = "/root/testdata/sf0.1"


def union_nx(df, id_col, n, step=10_000_000, text_tag=False):
    big = df
    for i in range(1, n):
        nxt = df.withColumn(id_col, F.col(id_col) + F.lit(i * step))
        if text_tag:
            nxt = nxt.withColumn(
                "text", F.concat(F.lit(f"copy{i} "), F.col("text"))
            )
        big = big.unionByName(nxt)
    return big


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = build_session(app_name="stress-r4c")
    spark.sparkContext.setLogLevel("ERROR")

    for n in ns:
        docs = spread(
            union_nx(load_table(spark, SF_DIR, "documents"), "doc_id", n)
        ).persist()
        n_docs = docs.count()
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            out = dsir_logweights(
                docs, F.col("lang") == "en", n_buckets=10_000
            )
            n_rows = out.count()
            dt = time.perf_counter() - t0
            print(
                f"dsir {n}x docs={n_docs} {label}: {dt:.1f}s rows={n_rows}",
                flush=True,
            )
        docs.unpersist()

    for n in ns:
        docs = spread(
            union_nx(
                load_table(spark, SF_DIR, "documents"),
                "doc_id",
                n,
                text_tag=True,
            )
        ).persist()
        n_docs = docs.count()
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            out = duplicated_spans(docs, k=5)
            n_rows = out.count()
            dt = time.perf_counter() - t0
            print(
                f"spans {n}x docs={n_docs} {label}: {dt:.1f}s rows={n_rows}",
                flush=True,
            )
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
