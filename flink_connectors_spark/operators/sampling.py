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


def temperature_mixture_rates(
    df: DataFrame,
    stratum_col: str,
    target_fraction: float = 0.5,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Per-stratum inclusion rates for the standard multinomial-
    with-temperature pretraining mix (alpha = 0.5): stratum weight
    w_s = sqrt(n_s) / sum(sqrt(n)), per-row keep probability
    rate_s = min(1, w_s * target_fraction * N / n_s) — up-weighting
    low-resource strata relative to proportional sampling.

    Determinism discipline: sqrt is IEEE-exact and the weight
    normalizer is a SEQUENTIAL fold over the strata in sorted order
    (array_sort + aggregate — the kmeans regroup pattern), so every
    engine computes bit-identical doubles; the rate is then quantized
    to an integer parts-per-million threshold, making the inclusion
    decision pure integer math (no float row ever crosses engines).

    Scale shape: one keyed count over the corpus, a one-row pack of
    the (tiny) stratum list, explode back to a strata-sized rate
    table — broadcast-joinable against any corpus size.

    Returns (stratum_col, n, ppm).
    """
    cnt = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    packed = cnt.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(stratum_col).alias("s"), F.col("n"))
            )
        ).alias("sn")
    )
    wsum = F.aggregate(
        F.col("sn"),
        F.lit(0.0),
        lambda acc, x: acc + F.sqrt(x["n"].cast("double")),
    )
    total = F.aggregate(
        F.col("sn"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x["n"],
    )
    nd = F.col("n").cast("double")
    rate = F.least(
        F.lit(1.0),
        (F.sqrt(nd) / F.col("wsum"))
        * (
            (F.lit(target_fraction) * F.col("total").cast("double")) / nd
        ),
    )
    return (
        packed.select(
            F.explode("sn").alias("x"),
            wsum.alias("wsum"),
            total.alias("total"),
        )
        .select(
            F.col("x.s").alias(stratum_col),
            F.col("x.n").alias("n"),
            "wsum",
            "total",
        )
        .select(
            stratum_col,
            "n",
            F.round(rate * ppm_scale).cast("long").alias("ppm"),
        )
    )


def temperature_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    target_fraction: float = 0.5,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic temperature-mixed corpus sample: md5-bucket per
    row against the stratum's ppm threshold from
    :func:`temperature_mixture_rates`. Same subset every run, every
    engine, any partitioning; stable under corpus growth within a
    stratum only insofar as the stratum's rate is stable (rates
    depend on corpus counts by design — pin a rates snapshot for
    strict append-stability).

    Returns the sampled rows plus the stratum's ``ppm``.
    """
    rates = temperature_mixture_rates(
        df, stratum_col, target_fraction, ppm_scale
    )
    key = F.concat(
        F.col(stratum_col).cast("string"),
        F.lit(":"),
        F.col(key_col).cast("string"),
    )
    return (
        df.join(F.broadcast(rates.drop("n")), stratum_col)
        .filter(hash_bucket(key, ppm_scale) < F.col("ppm"))
    )


def per_group_quota(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """Per-group quality quota: keep the top ``n`` rows of each group
    ranked by (score DESC, id ASC) — the domain-cap stage of a corpus
    mix (no single source may contribute more than its quota, and the
    quota takes that source's BEST documents, not a random subset).

    Deterministic: the id tie-break makes the cut identical across
    engines even when scores tie at the boundary.

    Scale shape: one hash shuffle on the group key + a per-partition
    rank — the same single-exchange plan as windowed top-k; at 100 TB
    group skew (one giant source) is the hazard, mitigated upstream by
    splitting oversized sources before the mix (or AQE skew handling).

    Returns the kept rows plus their ``rnk``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= n)
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int],
) -> DataFrame:
    """Deterministic train/val/test assignment: ``splits`` maps split
    name -> percentage (must sum to 100); each row lands in exactly
    one split by md5 bucket of its key. Reproducible across engines
    and runs, stable under corpus growth (a row's split never changes
    when other rows arrive) — the property RNG-based splitters lack.
    Split boundaries walk the dict in sorted-name order so the
    mapping is itself deterministic.

    Scale: a narrow projection — no shuffle, no state.
    """
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    b = hash_bucket(F.col(key_col).cast("string"))
    expr = None
    lo = 0
    for name in sorted(splits):
        hi = lo + splits[name]
        cond = b < hi if expr is None else (b >= lo) & (b < hi)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
        lo = hi
    return df.withColumn("split", expr)


def global_shuffle_order(
    df: DataFrame,
    key_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic global training-order assignment — the "shuffle
    the corpus before training" step, reproducibly: every row gets a
    ``shard`` in [0, n_shards) and a dense 1-based ``pos`` within its
    shard, both pure functions of the row key (shard = md5 bucket;
    within-shard order = full md5 hex, key tie-break). Readers stream
    shard files in pos order and see a uniform random permutation of
    the corpus — identical every run, every engine, any partitioning,
    with no RNG state to snapshot.

    Scale shape: ONE hash shuffle on ``shard`` (n_shards bounded
    partitions) + a per-partition rank — this replaces the global
    ORDER BY rand() sort (a full-corpus range exchange) that the
    naive formulation pays. Each shard's rank is independent, so
    skew is impossible by construction (md5 buckets are uniform).

    NULL keys propagate to a NULL shard (SQL semantics) — such rows
    never land in [0, n_shards) and would silently fall out of the
    training set; enforce key non-nullability upstream (the QA audit
    queries exist for exactly this).
    """
    from pyspark.sql.window import Window

    key = F.col(key_col).cast("string")
    w = Window.partitionBy("shard").orderBy(
        F.col("__h__").asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__h__", F.md5(key))
        .withColumn(
            "shard",
            F.pmod(
                hex_prefix_to_long(F.col("__h__"), 12), F.lit(n_shards)
            ).cast("long"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h__")
    )


def sample_k_per_stratum(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Unbiased deterministic carve-out: the ``k`` rows of each
    stratum with the smallest md5(stratum:key) — an order statistic
    over a uniform hash, so the pick is uniform-without-replacement
    yet fully reproducible (the eval-set carve-out recipe: quota
    picks the BEST rows, this picks RANDOM-but-frozen rows).

    One stratum-keyed shuffle + per-partition rank, same single
    exchange as per_group_quota.

    Returns the kept rows plus ``pick_rank`` (1-based).
    """
    from pyspark.sql.window import Window

    h = hex_prefix_to_long(
        F.md5(
            F.concat(
                F.col(stratum_col).cast("string"),
                F.lit(":"),
                F.col(key_col).cast("string"),
            )
        ),
        12,
    )
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= k)
    )


def curriculum_order(
    df: DataFrame,
    quality_col: str,
    key_col: str,
    n_shards: int = 8,
    n_buckets: int = 10,
) -> DataFrame:
    """Deterministic curriculum training order: documents grouped
    into quality bands (bucket = floor(quality * n_buckets), clamped)
    and uniformly md5-shuffled WITHIN each band — the reader consumes
    bands best-first (or an anneal schedule across bands), getting
    curriculum learning's easy/clean-first ordering while keeping the
    within-band order an unbiased reproducible permutation (the
    ``global_shuffle_order`` construction applied per band).

    The band boundary is a single IEEE multiply + floor on the
    already-rounded quality score, so a doc's band can never differ
    across engines; ordering needs ONE bounded-key shuffle
    (n_buckets x n_shards keys), never a full-corpus range sort.
    Returns (key, bucket, shard, pos).
    """
    from pyspark.sql.window import Window

    from ..functions import hex_prefix_to_long

    key = F.col(key_col).cast("string")
    bucket = F.least(
        F.floor(F.col(quality_col) * n_buckets), F.lit(n_buckets - 1)
    ).cast("long")
    out = df.select(
        key_col,
        bucket.alias("bucket"),
        F.md5(key).alias("__hx__"),
        F.pmod(hex_prefix_to_long(F.md5(key), 12), F.lit(n_shards))
        .cast("long")
        .alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("__hx__", key_col)
    return out.select(
        key_col,
        "bucket",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
