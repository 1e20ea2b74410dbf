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


def pack_firstfit(
    docs: DataFrame,
    budget: int = 2048,
    chain_cols: Sequence[str] = ("source", "bucket"),
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """EXACT greedy first-fit sequence packing — the stateful sibling
    of the window-expressible concat-and-chunk packing
    (``pipeline_sequence_packing``): docs are walked in ``order_col``
    order within each chain and a doc that would overflow the current
    pack CLOSES it and starts the next one, so documents are never
    split across packs and the tail capacity of each closed pack is
    wasted (the utilization tradeoff `fill_after` exposes — this is
    the "no cross-document attention contamination" packing variant
    used when training recipes forbid doc splits).

    The fold is inherently sequential per chain (each decision
    depends on the running fill), which is exactly why the operator
    takes a bounded CHAIN key (e.g. (source, doc_id // 256)): the
    sequential unit is capped at a few hundred docs and the chains
    themselves are embarrassingly parallel. r14 (guide §4.1): the
    per-chain fold runs as a codegen'd JVM higher-order ``aggregate``
    over the chain's ``array_sort``-ordered rows — the
    ``applyInPandas`` this replaces shipped every row across the
    JVM↔Python boundary (a FlatMapGroupsInPandas node and an Arrow
    round-trip) just to run a 256-step integer loop. Same one shuffle
    on the chain key, then pure map work; pre-bucketing the corpus by
    the chain key turns even that shuffle into a local sort.

    Input must carry ``chain_cols``, ``order_col`` and ``tokens_col``;
    output appends (pack_no, fill_after) — pack ids are per-chain,
    globally unique as (*chain_cols, pack_no). Deterministic: layout
    depends only on the chain partition and ``order_col`` order
    (``order_col`` leads the sort struct; ties fall back to the
    remaining row fields, deterministic where the old stable
    pandas sort depended on arrival order)."""
    rest = [c for c in docs.columns if c not in chain_cols]
    if order_col not in rest or tokens_col not in rest:
        raise ValueError(
            f"docs must carry {order_col!r} and {tokens_col!r} outside "
            f"the chain key"
        )
    ordered = [order_col] + [c for c in rest if c != order_col]
    seq = docs.groupBy(*[F.col(c) for c in chain_cols]).agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in ordered]))
        ).alias("__rows__")
    )
    fold = f"""
      aggregate(
        __rows__,
        named_struct(
          'pack', CAST(0 AS BIGINT), 'fill', CAST(0 AS BIGINT),
          'out', CAST(array() AS
            array<struct<pack_no: bigint, fill_after: bigint>>)),
        (acc, x) -> CASE
          WHEN acc.fill > 0 AND acc.fill + x.`{tokens_col}` > {int(budget)}
          THEN named_struct(
            'pack', acc.pack + 1, 'fill', x.`{tokens_col}`,
            'out', concat(acc.out, array(named_struct(
              'pack_no', acc.pack + 1,
              'fill_after', x.`{tokens_col}`))))
          ELSE named_struct(
            'pack', acc.pack, 'fill', acc.fill + x.`{tokens_col}`,
            'out', concat(acc.out, array(named_struct(
              'pack_no', acc.pack,
              'fill_after', acc.fill + x.`{tokens_col}`))))
          END,
        acc -> arrays_zip(__rows__, acc.out))
    """
    return (
        seq.select(
            *[F.col(c) for c in chain_cols],
            F.explode(F.expr(fold)).alias("__e__"),
        )
        .select(
            *[
                F.col(c)
                if c in chain_cols
                else F.col(f"__e__.__rows__.{c}").alias(c)
                for c in docs.columns
            ],
            F.col("__e__.out.pack_no").cast("long").alias("pack_no"),
            F.col("__e__.out.fill_after").cast("long").alias("fill_after"),
        )
    )
