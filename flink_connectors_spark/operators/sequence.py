"""Row-pattern matching over keyed event sequences — the
MATCH_RECOGNIZE surface (Flink SQL 1.12 / ISO SQL:2016 row pattern
recognition) Spark SQL lacks natively.

The reference's host engine ships `MATCH_RECOGNIZE` upstream of the
sink (SURVEY §2.2); this module emulates its core exactly for the
dominant production shape — per-key ordered sequences, a regular
pattern over row classifiers, AFTER MATCH SKIP PAST LAST ROW:

1. each row maps to a one-character SYMBOL via a classifier
   expression (the DEFINE clause, restricted to per-row predicates),
2. each key's rows collapse into ONE ordered symbol string
   (`array_sort` over (order-cols, symbol) structs — deterministic
   total order, no window, a single keyed shuffle),
3. the PATTERN clause compiles to a regex evaluated per key by
   codegen'd string expressions (`regexp_count` / `regexp_extract`):
   non-overlapping left-to-right matches == SKIP PAST LAST ROW.

Restrictions vs full MATCH_RECOGNIZE (deliberate, scale-safe):
per-row classifiers only (no running aggregates in DEFINE), and the
whole per-key sequence must fit in one row after collapse — true for
session/user histories (thousands of events), the shape the feature
is used for. MEASURES beyond match count/first-match text are the
caller's follow-up join.

Scale: the sequence build IS the one shuffle (same cost class as
sessionization); pattern evaluation is a per-row scalar. At 100 TB,
pre-bucketing the events table by the key makes even that shuffle a
local sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def match_recognize(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """Count non-overlapping occurrences of ``pattern`` (a regex over
    one-char symbols produced by ``symbol``) in each key's ordered
    event sequence.

    Returns one row per key: (*key_cols, n_events, n_matches,
    first_match) — n_matches with AFTER MATCH SKIP PAST LAST ROW
    semantics, first_match the first matched symbol run ('' if
    none)."""
    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")
    sym = df.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c) for c in order_cols],
        symbol.alias("__sym__"),
    )
    seq = sym.groupBy(*key_cols).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            *[F.col(c) for c in order_cols],
                            F.col("__sym__"),
                        )
                    )
                ),
                lambda st: st["__sym__"],
            ),
            "",
        ).alias("__seq__")
    )
    return seq.select(
        *key_cols,
        F.length("__seq__").cast("long").alias("n_events"),
        F.regexp_count(F.col("__seq__"), F.lit(pattern))
        .cast("long")
        .alias("n_matches"),
        F.regexp_extract(F.col("__seq__"), pattern, 0).alias(
            "first_match"
        ),
    )
