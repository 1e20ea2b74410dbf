"""Deterministic sampling for training-data curation.

`df.sample()`/`sampleBy()` use engine-private RNG streams — fine for
exploration, wrong for reproducible corpus construction: re-running
the pipeline (or running it on a different engine) would pick a
different subset. Here the keep/drop decision is a pure function of
the row key: bucket = md5(stratum:key) mod 100, keep if bucket <
rate[stratum]. Same subset every run, every engine, any partitioning
— and the sample is stable under corpus growth (existing rows never
flip when new rows arrive).

Scale: a narrow filter — no shuffle, no state; composes with
predicate pushdown (the md5 can't push to parquet, but every other
predicate still does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hex_prefix_to_long


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the key."""
    return F.pmod(hex_prefix_to_long(F.md5(key), 12), F.lit(buckets))


def sample_uniform(
    df: DataFrame, key_col: str, pct: int
) -> DataFrame:
    """Keep a deterministic ~pct% of rows keyed by ``key_col``."""
    key = F.col(key_col).cast("string")
    return df.filter(hash_bucket(key) < pct)


def sample_stratified(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum
    value -> percentage kept (0-100); unlisted strata keep
    ``default_pct``%. The bucket key is stratum:key so rate changes in
    one stratum never reshuffle another's sample."""
    key = F.concat(
        F.col(stratum_col).cast("string"),
        F.lit(":"),
        F.col(key_col).cast("string"),
    )
    rate = F.lit(default_pct)
    for value, pct in rates.items():
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(key) < rate)
