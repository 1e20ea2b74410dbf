"""Scale-out primitives: skew salting and bucketed co-located joins.

These are the two knobs the engine reaches for when AQE alone isn't
enough at 100 TB:

- **Salting** splits a hot key across N sub-partitions. A join
  against a salted fact requires replicating the matching dimension
  rows N ways (explode over the salt domain) — bounded, explicit
  cost instead of one straggler task holding the whole hot key.
  Aggregations salt cheaper: partial-agg on (key, salt), then final
  agg on key — two small shuffles instead of one skewed one.
- **Bucketing** pre-shuffles a table ONCE at write time
  (`bucketBy(n, key)` + sortBy); every later equi-join or
  aggregation on that key reads co-located buckets and skips the
  exchange entirely. The write is the shuffle you never pay again —
  the Spark analogue of the reference's direct-to-shard layout
  (`ClickHouseShardOutputFormat`, SURVEY.md §2.1 S4): rows land
  hash-routed by key at rest.

Both are plan-shape-tested in tests/test_scale.py (salted agg never
exceeds the unsalted row width; bucketed join plans contain no
Exchange).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt__") -> DataFrame:
    """Append a uniform int salt in [0, n_salts). Uses a hash of
    monotonically_increasing_id — deterministic within a run, no RNG
    state on executors."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast(
            "int"
        ),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof aggregation: partial aggregate on (keys + salt),
    final aggregate on keys.

    ``aggs`` maps output column name -> (partial_agg_expr,
    final_agg_expr_over_partial); e.g. a count is
    ``(F.count(F.lit(1)), F.sum(...))``, a sum is (sum, sum), a min is
    (min, min). Only algebraic (decomposable) aggregates qualify —
    exactly the ones Spark itself computes with map-side partials.

    The first shuffle spreads any hot key over ``n_salts`` reducers;
    the second shuffles at most |groups| * n_salts tiny rows.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt__").agg(
        *[p.alias(f"__p_{name}") for name, (p, _) in aggs.items()]
    )
    final_exprs = []
    for name, (_, fin) in aggs.items():
        final_exprs.append(fin(F.col(f"__p_{name}")).alias(name))
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a random salt, the
    (smaller) dim side is replicated across the full salt domain, and
    the join key becomes (key, salt). A hot fact key now lands on
    n_salts reducers instead of one. Dim replication cost is
    |dim| * n_salts — use for moderate dims when broadcast is too big
    and AQE's skew split isn't available (e.g. bucketed inputs)."""
    f = with_salt(fact, n_salts)
    d = dim.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt__"),
    )
    out = f.join(d, on=[key, "__salt__"], how=how)
    return out.drop("__salt__")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Materialize a table bucketed (and optionally sorted) by key —
    pay the shuffle once at rest, never again on reads that join or
    aggregate on the bucket key."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts Spark plans a sort-merge join with NO exchange on
    either side (verify: no Exchange above either scan in .explain)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def morton_code(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Z-order (Morton) interleaving of N non-negative int columns,
    `bits` bits each — the multi-dimensional clustering key behind
    Delta/Iceberg OPTIMIZE ZORDER. Rows close in EVERY dimension get
    close codes, so sorting by the code co-locates them into the same
    parquet row groups and min/max stats prune on all dimensions at
    once (a plain sort only prunes its leading column).

    Pure JVM bit expressions (shift/and/or), whole-stage codegen'd;
    values are masked to `bits` bits. N*bits must fit in int64."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    mask = (1 << bits) - 1
    cs = [c.cast("long").bitwiseAND(F.lit(mask)) for c in cs]
    code = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, b * n + i))
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Materialize parquet clustered on a Z-order of ``zorder_cols``:
    min-max normalize each dimension into the full `bits` range (an
    un-normalized Morton is dominated by whichever column has the
    widest magnitude — narrow columns would get no clustering),
    range-partition by the code (balanced files), sort within
    partitions (clustered row groups), drop helpers. The bounds pass
    is one tiny all-min/max aggregate. Pay the layout shuffle once;
    every later scan filtering on ANY z-ordered dimension prunes row
    groups via min/max stats."""
    aggs = []
    for c in zorder_cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs).first()
    top = (1 << bits) - 1
    scaled = []
    for c in zorder_cols:
        mn, mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
        span = max(int(mx) - int(mn), 1)
        scaled.append(
            ((F.col(c).cast("long") - int(mn)) * top / span).cast("long")
        )
    z = df.withColumn("__z__", morton_code(scaled, bits))
    (
        z.repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_layout_audit(
    df: DataFrame,
    dim_cols: Sequence[Column | str],
    dim_names: Sequence[str],
    bits: int = 8,
    bucket_bits: int = 8,
) -> DataFrame:
    """Data-skipping effectiveness audit for a Z-order layout: the
    per-file min/max-stats report a 100 TB OPTIMIZE ZORDER job is
    judged by. Each dimension is min-max normalized into `bits` bits
    with EXACT integer math (``(x - mn) * top // span`` — floor
    division, so the rank is engine-reproducible, unlike the float
    scaling a layout writer can afford), the ranks interleave into a
    Morton code, and rows group into the top ``bucket_bits`` of the
    code — one bucket ≈ one output file of the clustered layout.

    The payoff is visible in the output: every bucket's [min, max]
    range is narrow in EVERY dimension simultaneously, which is what
    lets parquet row-group stats prune scans filtering on ANY of the
    z-ordered columns (a plain sort gives narrow ranges only on its
    leading column). Scale shape: one tiny all-min/max aggregate
    broadcast back (one row), the code is pure codegen bit math, and
    the report is one bounded-key shuffle (2^bucket_bits groups)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in dim_cols]
    aggs = []
    for i, c in enumerate(cs):
        aggs += [F.min(c).alias(f"mn{i}"), F.max(c).alias(f"mx{i}")]
    bounds = F.broadcast(df.agg(*aggs))
    top = (1 << bits) - 1
    with_dims = df.select(
        *[c.alias(f"d{i}") for i, c in enumerate(cs)]
    ).crossJoin(bounds)
    ranks = [
        F.floor(
            (F.col(f"d{i}") - F.col(f"mn{i}"))
            * F.lit(top)
            / F.greatest(F.col(f"mx{i}") - F.col(f"mn{i}"), F.lit(1))
        ).cast("long")
        for i in range(len(cs))
    ]
    # F.floor over a true division of exact ints == integer floor-div
    # only when the numerator stays within float53; (x-mn)*255 on
    # id/cents-scaled dims is far inside it.
    z = morton_code(ranks, bits)
    bucket = F.shiftright(z, len(cs) * bits - bucket_bits)
    out = with_dims.select(
        bucket.alias("zbucket"),
        *[F.col(f"d{i}") for i in range(len(cs))],
    )
    per_dim = []
    for i, name in enumerate(dim_names):
        per_dim += [
            F.min(f"d{i}").alias(f"min_{name}"),
            F.max(f"d{i}").alias(f"max_{name}"),
        ]
    return out.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"), *per_dim
    )


def diagnose_skew(
    df: DataFrame, keys: Sequence[str], top_n: int = 10
) -> DataFrame:
    """One-pass shuffle-key skew report: per-key row counts for the
    ``top_n`` heaviest keys plus each key's share of the total and
    its ratio to the MEAN key load (`skew_x` — how many times an
    average reducer's work the hottest partition carries).

    Run this BEFORE keying a 100 TB join/agg on a candidate column:
    `skew_x` >> number of salts you can afford means pick a different
    key, pre-aggregate, or isolate the hot keys (AQE's skew-join
    splits sort-merge partitions but cannot fix a hot GROUP BY key).
    Cost: one hash aggregate over the keys (map-side combined) plus a
    top_n collect of aggregate rows — safe at any scale."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total__"),
        F.count(F.lit(1)).alias("__n_keys__"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            F.round(
                F.col("n_rows") / F.col("__total__").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("n_rows")
                * F.col("__n_keys__").cast("double")
                / F.col("__total__").cast("double"),
                2,
            ).alias("skew_x"),
        )
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top_n)
    )


# ---------------------------------------------------------------------------
# Bloom-guarded membership: join-free pre-filter against a massive
# fingerprint set
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 62  # shifts stay <= 61: no int64 sign-bit edge in
#                        either engine (DuckDB range-checks 1 << 63)

_BLOOM_MIN_BITS = 16 * _BLOOM_WORD_BITS  # 992 — floor so tiny corpora
#                                          still get a non-degenerate filter


class BloomSaturationError(RuntimeError):
    """Raised when a Bloom bitmap's fill ratio exceeds the configured
    bound — the loud form of the silent failure where an undersized
    filter saturates toward all-ones and ``bloom_hit`` degrades to a
    constant 1, turning the join-free pre-filter into a no-op in
    front of a batch-sized verify join."""


def auto_bloom_bits(
    n_members: int,
    bits_per_key: int = 10,
    min_bits: int = _BLOOM_MIN_BITS,
) -> int:
    """Corpus-derived bitmap size: ``bits_per_key`` bits per expected
    member (the classic ~10 bits/key ≈ 1% FPR operating point for
    k=3), rounded UP to a multiple of the 62-bit word width, floored
    at ``min_bits``. The Bloom analogue of ``auto_lsh_bands`` — the
    sizing rule enforced in code, not prose: at 10 bits/key the fill
    ratio converges to 1 - exp(-k/10) ≈ 0.26 regardless of corpus
    size, so saturation is structurally impossible when the member
    count is honest. Mirrors the same DuckDB-expressible integer
    math the bitmap itself uses:
    ``((greatest(min, n*bpk) + 61) // 62) * 62``."""
    if n_members < 0:
        raise ValueError(f"n_members must be >= 0: {n_members}")
    if bits_per_key < 1:
        raise ValueError(f"bits_per_key must be >= 1: {bits_per_key}")
    raw = max(min_bits, n_members * bits_per_key)
    return ((raw + _BLOOM_WORD_BITS - 1) // _BLOOM_WORD_BITS) * _BLOOM_WORD_BITS


def bloom_bitmap(
    fps: DataFrame,
    fp_col: str = "fp",
    m_bits: int | None = None,
    n_hashes: int = 3,
    member_count: int | None = None,
    bits_per_key: int = 10,
    assert_fill_below: float | None = None,
) -> DataFrame:
    """Build a Bloom-filter bitmap from a fingerprint column as a
    ONE-ROW DataFrame carrying a dense array<int64> of bit words —
    the broadcastable membership index for :func:`bloom_might_contain`.

    Why: the incremental-ingest exact-dedup join ("is this new doc's
    fingerprint in the 100 TB historical corpus?") shuffles the whole
    batch against the historical fingerprint table every night. A
    Bloom pre-filter drops the (vast) non-duplicate majority with ZERO
    shuffle — the bitmap is a few MB broadcast — and only
    bloom-positive rows proceed to the exact verify join, whose input
    is now duplicate-sized, not batch-sized. No false negatives by
    construction; false positives only cost a wasted verify row.

    Everything is exact integer math on md5 hex slices (8 hex chars
    per hash, disjoint slices), so a DuckDB oracle reproduces the
    exact bitmap bit-for-bit. Word width is 62 bits (not 64) so the
    shift never touches the int64 sign bit in any engine.

    Plan: explode n_hashes positions per fingerprint -> one keyed
    aggregate over <= m_bits/62 words (bit_or map-side combines) ->
    one-row pack. Spark's built-in bloom_filter_agg is not exposed to
    SQL/Python (verified: UNRESOLVED_ROUTINE); this construction is
    also portable, which the built-in's opaque bytes are not.

    **Sizing** (enforced, not advisory): when ``m_bits`` is None the
    bitmap is sized from the member count via :func:`auto_bloom_bits`
    (~``bits_per_key`` bits/key). Pass ``member_count`` to skip the
    extra ``count()`` pass when the caller already knows it (the
    ``corpus_count`` pattern from rplsh banding). An explicit
    ``m_bits`` is honored for bitmap FAMILIES that must share a width
    (nightly OR-merge requires equal widths) — size the family once
    from the expected corpus scale, then pass that width everywhere.

    **Saturation guard**: ``assert_fill_below`` materializes the
    bitmap eagerly (``localCheckpoint`` — one row, a few KB; callers
    reusing a bitmap across probes want this anyway to avoid rebuild)
    and raises :class:`BloomSaturationError` if popcount/m meets the
    bound, so an undersized filter fails loudly at build time instead
    of silently degrading every probe to ``bloom_hit=1``. Lazy
    callers can audit later via :func:`bloom_fill_ratio`.

    **Past broadcast size** the plan is prefix sharding, not a wider
    row: band fingerprints by a hex prefix (e.g. first 2 chars -> 256
    shards), build one auto-sized bitmap per shard (an array of
    one-row bitmaps, each still a few MB), probe by routing each row
    to its prefix's bitmap, and OR-maintain each shard independently
    with the existing :func:`bloom_merge`. Nothing in the math
    changes — the shard key is just more hex characters of the same
    md5 the hashes already slice.
    """
    if m_bits is None:
        n = member_count if member_count is not None else fps.count()
        m_bits = auto_bloom_bits(n, bits_per_key=bits_per_key)
    if m_bits % _BLOOM_WORD_BITS != 0:
        raise ValueError(
            f"m_bits must be a multiple of {_BLOOM_WORD_BITS}: {m_bits}"
        )
    if not 1 <= n_hashes <= 4:
        raise ValueError("n_hashes must be in [1, 4] (md5 has 4 slices)")
    out = _pack_word_table(
        _bloom_word_table(fps, fp_col, m_bits, n_hashes),
        m_bits // _BLOOM_WORD_BITS,
    )
    if assert_fill_below is not None:
        if not 0.0 < assert_fill_below <= 1.0:
            raise ValueError(
                f"assert_fill_below must be in (0, 1]: {assert_fill_below}"
            )
        out = out.localCheckpoint(eager=True)
        fill = out.select(
            (
                F.aggregate(
                    F.transform("bf", F.bit_count),
                    F.lit(0),
                    lambda a, x: a + x,
                )
                / F.lit(float(m_bits))
            ).alias("fill")
        ).first()["fill"]
        if fill >= assert_fill_below:
            raise BloomSaturationError(
                f"Bloom bitmap fill ratio {fill:.3f} >= "
                f"{assert_fill_below} at m_bits={m_bits}: the filter is "
                "saturating and every probe will degrade toward "
                "bloom_hit=1. Re-size with auto_bloom_bits(member_count) "
                "or shard by fingerprint prefix (see bloom_bitmap "
                "docstring)."
            )
    return out


def _bloom_word_table(
    fps: DataFrame, fp_col: str, m_bits: int, n_hashes: int
) -> DataFrame:
    """The sparse (w, word) bit-word rows of a Bloom bitmap — the
    aggregate state BEFORE dense packing. Two word tables over
    different member sets merge by per-``w`` ``bit_or`` (OR is the
    Bloom monoid), which is what the partitioned artifact family
    stores per batch."""
    pos = fps.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.conv(
                            F.substring(F.col(fp_col), 1 + 8 * j, 8), 16, 10
                        ).cast("bigint"),
                        F.lit(m_bits),
                    )
                    for j in range(n_hashes)
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.floor(F.col("pos") / _BLOOM_WORD_BITS).cast("long").alias("w"),
            F.pmod(F.col("pos"), _BLOOM_WORD_BITS).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("word"))
    )


def _pack_word_table(words: DataFrame, n_words: int) -> DataFrame:
    """Fold sparse (w, word) rows into the dense ONE-ROW ``bf``
    array<int64> that :func:`bloom_might_contain` broadcasts."""
    packed = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("__m__")
    )
    return packed.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m__"), i.cast("long")),
                F.lit(0).cast("long"),
            ),
        ).alias("bf")
    )


def bloom_fill_ratio(bitmap: DataFrame) -> DataFrame:
    """Saturation audit as a one-row DataFrame over a
    :func:`bloom_bitmap` output: ``(m_bits, set_bits, fill_ratio)``.
    Healthy auto-sized filters sit near 1 - exp(-k/bits_per_key)
    (~0.26 at the k=3 / 10-bits-per-key default); a ratio drifting
    toward 1.0 means the member count outgrew the width and probes
    are degrading toward constant ``bloom_hit=1`` — re-size or
    prefix-shard. Pure expression over the one broadcastable row:
    free to emit next to any nightly merge."""
    m = F.size("bf") * _BLOOM_WORD_BITS
    set_bits = F.aggregate(
        F.transform("bf", F.bit_count), F.lit(0), lambda a, x: a + x
    )
    return bitmap.select(
        m.cast("long").alias("m_bits"),
        set_bits.cast("long").alias("set_bits"),
        F.round(set_bits / m.cast("double"), 6).alias("fill_ratio"),
    )


def bloom_might_contain(
    df: DataFrame,
    bitmap: DataFrame,
    fp_col: str = "fp",
    m_bits: int | None = None,
    n_hashes: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col`` (int64 0/1): 1 iff every hash position of
    the row's fingerprint is set in ``bitmap`` (from
    :func:`bloom_bitmap` — same n_hashes or the bits won't line up).
    Broadcast of one row + per-row integer expressions: no shuffle,
    no join against the membership set. Guaranteed 1 for every true
    member; a 0 definitively rules membership out.

    ``m_bits`` defaults to the bitmap's own width (``size(bf) * 62``
    as an expression over the broadcast row), so auto-sized bitmaps
    probe correctly with no width bookkeeping at the call site; pass
    it explicitly only as a belt-and-braces literal for constant
    folding.

    **NULL semantics**: a NULL fingerprint gets verdict 1, NOT NULL —
    a NULL verdict would fall out of both the ``bloom_hit = 0`` and
    ``bloom_hit = 1`` branches of the guarded-ingest pattern and
    silently drop the row (the hazard ``embedding_norm_audit`` was
    hardened against). Verdict 1 routes the row to the exact verify
    join, which preserves no-false-negative soundness and surfaces
    the NULL to the caller's join logic instead of swallowing it."""
    bmp = bitmap.select(F.col("bf").alias("__bf__"))
    out = df.crossJoin(F.broadcast(bmp))
    m = (
        F.lit(m_bits)
        if m_bits is not None
        else F.size(F.col("__bf__")) * _BLOOM_WORD_BITS
    )
    hit = None
    for j in range(n_hashes):
        pj = F.pmod(
            F.conv(F.substring(F.col(fp_col), 1 + 8 * j, 8), 16, 10).cast(
                "bigint"
            ),
            m,
        )
        out = out.withColumn(f"__b{j}__", F.pmod(pj, _BLOOM_WORD_BITS).cast("int"))
        word = F.element_at(
            F.col("__bf__"),
            (F.floor(pj / _BLOOM_WORD_BITS) + 1).cast("int"),
        )
        h = (
            word.bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), __b{j}__)")
            )
            != 0
        )
        hit = h if hit is None else (hit & h)
    return out.withColumn(
        out_col, F.coalesce(hit.cast("long"), F.lit(1).cast("long"))
    ).drop("__bf__", *[f"__b{j}__" for j in range(n_hashes)])


def bloom_merge(bitmaps: Sequence[DataFrame]) -> DataFrame:
    """Union Bloom bitmaps (same m_bits/n_hashes family) into one by
    element-wise OR of their word arrays — the nightly maintenance
    step: yesterday's corpus bitmap OR today's batch bitmap, no
    rebuild over the historical corpus. Bloom filters are exactly
    mergeable under OR (the merged filter answers membership for the
    union with zero extra false negatives), the same additive-summary
    property the rollup sketches lean on. Cost: k one-row frames
    cross-joined — driver-trivial at any corpus size.

    A width mismatch (bitmaps NOT sized as a family — e.g. two
    independently auto-sized days) raises at evaluation time rather
    than silently nulling words: ``zip_with`` pads the shorter array
    with NULLs, which the merge lambda converts to an explicit
    ``raise_error``. Size the family once from expected corpus scale
    and pass that ``m_bits`` to every build."""
    if not bitmaps:
        raise ValueError("bloom_merge needs at least one bitmap")
    out = bitmaps[0]
    for i, nxt in enumerate(bitmaps[1:]):
        out = (
            out.crossJoin(nxt.select(F.col("bf").alias(f"__o{i}__")))
            .select(
                F.zip_with(
                    "bf",
                    f"__o{i}__",
                    lambda a, b: F.when(
                        a.isNull() | b.isNull(),
                        F.raise_error(
                            F.lit(
                                "bloom_merge: bitmap width mismatch — "
                                "merge inputs must share m_bits (size "
                                "the family once, pass it to every "
                                "bloom_bitmap build)"
                            )
                        ).cast("long"),
                    ).otherwise(a.bitwiseOR(b)),
                ).alias("bf")
            )
        )
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency summary
# ---------------------------------------------------------------------------


def _cms_cell(key: Column, j: int, width: int) -> Column:
    """Row j's counter index for ``key``: md5('<j>|'||key) first 8 hex
    chars as int, mod width — deterministic, engine-portable (the
    DuckDB oracle re-derives the identical cell), independent across
    rows j by the salt prefix."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}|"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def countmin_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a Count-Min sketch over ``df[key_col]`` as a counter
    table ``(j, cell, n)`` — at most ``depth * width`` rows,
    regardless of input size.

    This is the streaming/mergeable answer to "how often does each
    key occur" when the key domain is too large to count exactly: ONE
    scan, the explode is depth× but feeds a map-side-combining hash
    aggregate whose key domain is bounded by depth*width, so the
    shuffle ships at most depth*width rows PER MAP PARTITION and the
    result is sketch-sized, never domain-sized. Two sketches over
    disjoint batches merge by cell-wise ``SUM`` (same additive-
    summary property as the rollup histograms), so a nightly sketch
    is yesterday's sketch + today's delta — no rescan.

    Estimates from :func:`countmin_estimate` are biased UP only
    (collisions add, never subtract): est >= true always, and
    P[est > true + 2N/width] <= (1/2)^depth for N total rows.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_cell(F.col(key_col), j, width).alias("cell"),
            )
            for j in range(depth)
        ]
    )
    ex = df.select(F.explode(cells).alias("jc"))
    return (
        ex.groupBy(
            F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point-estimate frequencies for ``keys[key_col]`` from a
    :func:`countmin_counters` sketch: min over the depth counters the
    key hashes to. The counter table (<= depth*width rows) broadcasts;
    per queried key the probe is a depth-way explode + broadcast join
    + min — query cost scales with |keys|, never with the sketched
    input. A key absent from every counter row estimates 0 (only
    possible when nothing hashed there — consistent with CMS
    semantics)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_cell(F.col(key_col), j, width).alias("cell"),
            )
            for j in range(depth)
        ]
    )
    probed = keys.select(
        "*", F.explode(cells).alias("jc")
    ).select("*", F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    joined = probed.join(F.broadcast(counters), ["j", "cell"], "left")
    others = [c for c in keys.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias(out_col))
    )


# ---------------------------------------------------------------------------
# Count-Min ARTIFACT: the persisted, append-able counter table
# ---------------------------------------------------------------------------
#
# The r13 taxonomy (SCALING.md) classifies the CMS counter table as
# APPEND-able: every cell is an integer count additive over disjoint
# row batches, so sketch(old) + sketch(delta), cell-wise SUM, equals
# sketch(old ∪ delta) EXACTLY — the same partial-sum contract as the
# corpus_grams count relations. The artifact stores per-batch partial
# counter partitions under the shared commit-marker protocol; reads
# SUM-merge committed partitions (a ≤ depth*width-row shuffle), and
# compaction materializes the merge. The r13 verdict's Next #3: the
# counter build re-scanned its input on every estimate query; build
# once, append nightly, probe sketch-sized forever.

_CMS_ART_LAYOUT = 1
_CMS_ART_RELATIONS = ("counters",)


def _cms_counters_merge(df: DataFrame) -> DataFrame:
    """Fold per-batch partial counters into one exact row per (j,
    cell) — used both at read time (merge-on-read between an append
    and the next compact) and as the compact finalize."""
    return df.groupBy("j", "cell").agg(
        F.sum("n").cast("long").alias("n")
    )


_CMS_MERGE = {"counters": _cms_counters_merge}


def _validate_sketch_manifest(
    spark: SparkSession,
    path: str,
    family: str,
    layout: int,
    given: dict,
) -> dict:
    """The one validator every sketch-monoid family verb goes
    through (r14 review): layout pin + caller-params-vs-manifest
    check via the shared `similarity._validate_artifact_params`
    (None values are DISCOVERED from the manifest — how the bloom
    append inherits its family width). Every verb — append, compact,
    probe — validates, so a layout bump or param drift fails loudly
    at the first touch instead of being silently served."""
    from .similarity import (
        _validate_artifact_params,
        read_artifact_manifest,
    )

    man = read_artifact_manifest(spark, path)
    if man.get("layout") != layout:
        raise ValueError(
            f"{family} artifact at {path!r} layout "
            f"{man.get('layout')!r} does not match the supported "
            f"layout {layout} — rebuild first"
        )
    return _validate_artifact_params(spark, path, given)


def countmin_build_artifact(
    df: DataFrame,
    path: str,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> None:
    """Persist the Count-Min counter table ``(j, cell, n)`` for
    ``df[key_col]`` as a partitioned artifact (part=base + the shared
    ``_batches`` commit-marker dir). The manifest pins (depth, width)
    — estimating against a sketch built at another shape would read
    the wrong cells, so every probe/append validates first. The
    stored relation is at most depth*width rows: index-metadata-
    sized, broadcastable at any corpus scale."""
    import os

    from .similarity import _write_artifact_manifest

    spark = df.sparkSession
    _write_artifact_manifest(
        spark, path,
        {
            "depth": int(depth),
            "width": int(width),
            "layout": _CMS_ART_LAYOUT,
        },
    )
    (
        countmin_counters(df, key_col, depth=depth, width=width)
        .write.mode("overwrite")
        .parquet(f"{path}/counters/part=base")
    )
    os.makedirs(f"{path}/_batches", exist_ok=True)


def countmin_append(
    new_rows: DataFrame,
    path: str,
    batch_id: str,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> None:
    """Fold a NEW row batch into the standing sketch TRANSACTIONALLY:
    only the batch is scanned (O(batch)), its partial counter table
    lands as ``part=<batch_id>``, and the commit marker is written
    LAST (shared ``artifacts.transactional_append`` — idempotent
    batch ids, writer claim, heal-on-entry, compaction ledger).
    Unlike the doc-keyed families there is NO new-keys precondition:
    CMS is additive over ROWS, so re-sketching any disjoint slice of
    the stream composes exactly; only replaying the SAME rows twice
    (same batch_id — which the ledger rejects) would double-count."""
    from .artifacts import append_part_dir, transactional_append

    spark = new_rows.sparkSession
    _validate_sketch_manifest(
        spark, path, "countmin", _CMS_ART_LAYOUT,
        {"depth": depth, "width": width},
    )
    with transactional_append(
        path, batch_id, _CMS_ART_RELATIONS
    ) as fresh:
        if not fresh:
            return
        (
            countmin_counters(new_rows, key_col, depth=depth, width=width)
            .write.mode("overwrite")
            .parquet(append_part_dir(path, "counters", batch_id))
        )


def countmin_compact(spark: SparkSession, path: str) -> None:
    """Fold every committed append batch into one ``part=base``,
    MATERIALIZING the cell-wise SUM merge (finalize) so post-compact
    reads serve one exact row per (j, cell) with no merge shuffle.
    Shared implementation + crash-window analysis:
    ``artifacts.compact_relations``."""
    from .artifacts import compact_relations

    _validate_sketch_manifest(spark, path, "countmin", _CMS_ART_LAYOUT, {})
    compact_relations(
        spark, path, _CMS_ART_RELATIONS, finalize=_CMS_MERGE
    )


def read_countmin_counters(
    spark: SparkSession, path: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Read the committed counter table, merging per-batch partials
    by SUM when appended batches are outstanding (≤ depth*width rows
    out — the merge shuffle is sketch-sized, paid only between an
    append and the next compact). Validates (depth, width) against
    the manifest; crashed appends are invisible (partition-pruned to
    committed batches)."""
    from .artifacts import committed_parts, read_committed_relation

    _validate_sketch_manifest(
        spark, path, "countmin", _CMS_ART_LAYOUT,
        {"depth": depth, "width": width},
    )
    df = read_committed_relation(spark, path, "counters")
    if len(committed_parts(path)) > 1:
        df = _cms_counters_merge(df)
    return df


# ---------------------------------------------------------------------------
# Bloom word-table ARTIFACT: the OR-monoid member of the lifecycle
# protocol
# ---------------------------------------------------------------------------
#
# r14 completes the shared transactional protocol's merge algebra:
# partitioned count relations merge by SUM (grams, CMS), Bloom bit
# words by bitwise OR, HLL registers by MAX — any commutative monoid
# works, because merge-on-read and the compact finalize are plain
# per-family aggregations over the committed partitions. OR and MAX
# are additionally IDEMPOTENT, so unlike the SUM families these two
# tolerate OVERLAPPING batches (re-sketching a row twice cannot
# change a bit/register) — only the batch_id replay guard is needed,
# and only to avoid wasted work.

_BLOOM_ART_LAYOUT = 1
_BLOOM_ART_RELATIONS = ("words",)


def _bloom_words_merge(df: DataFrame) -> DataFrame:
    return df.groupBy("w").agg(F.expr("bit_or(word)").alias("word"))


_BLOOM_ART_MERGE = {"words": _bloom_words_merge}


def bloom_words_build_artifact(
    fps: DataFrame,
    path: str,
    m_bits: int,
    fp_col: str = "fp",
    n_hashes: int = 3,
) -> None:
    """Persist the sparse Bloom word table ``(w, word)`` as a
    partitioned artifact. ``m_bits`` is REQUIRED (no auto-sizing):
    an append-able bitmap family must fix its width at provisioning
    time from expected corpus scale — auto-sizing per batch would
    produce incompatible words (the :func:`bloom_merge` width
    contract, enforced here by the manifest)."""
    import os

    from .similarity import _write_artifact_manifest

    if m_bits <= 0 or m_bits % _BLOOM_WORD_BITS != 0:
        raise ValueError(
            f"m_bits must be a positive multiple of "
            f"{_BLOOM_WORD_BITS}: {m_bits}"
        )
    if not 1 <= n_hashes <= 4:
        # same guard as bloom_bitmap (r14 review): md5 has 4 slices;
        # a 5th hash would persist NULL word rows that crash every
        # later read far from the provisioning mistake
        raise ValueError("n_hashes must be in [1, 4] (md5 has 4 slices)")
    spark = fps.sparkSession
    _write_artifact_manifest(
        spark, path,
        {
            "m_bits": int(m_bits),
            "n_hashes": int(n_hashes),
            "layout": _BLOOM_ART_LAYOUT,
        },
    )
    (
        _bloom_word_table(fps, fp_col, m_bits, n_hashes)
        .write.mode("overwrite")
        .parquet(f"{path}/words/part=base")
    )
    os.makedirs(f"{path}/_batches", exist_ok=True)


def bloom_words_append(
    new_fps: DataFrame,
    path: str,
    batch_id: str,
    fp_col: str = "fp",
) -> None:
    """Fold a new fingerprint batch into the standing Bloom family
    TRANSACTIONALLY: only the batch hashes (O(batch)); its word rows
    land as ``part=<batch_id>`` under the shared protocol. OR is
    idempotent, so a fingerprint present in BOTH the base and a
    batch is harmless — the one precondition the SUM families need
    (disjoint batches) does not apply here."""
    from .artifacts import append_part_dir, transactional_append

    spark = new_fps.sparkSession
    man = _validate_sketch_manifest(
        spark, path, "bloom word", _BLOOM_ART_LAYOUT,
        {"m_bits": None, "n_hashes": None},
    )
    with transactional_append(
        path, batch_id, _BLOOM_ART_RELATIONS
    ) as fresh:
        if not fresh:
            return
        (
            _bloom_word_table(
                new_fps, fp_col, man["m_bits"], man["n_hashes"]
            )
            .write.mode("overwrite")
            .parquet(append_part_dir(path, "words", batch_id))
        )


def bloom_words_compact(spark: SparkSession, path: str) -> None:
    """Fold committed batches into one ``part=base``, materializing
    the per-word OR (finalize) — post-compact reads serve one row
    per word. Shared implementation: ``artifacts.compact_relations``."""
    from .artifacts import compact_relations

    _validate_sketch_manifest(
        spark, path, "bloom word", _BLOOM_ART_LAYOUT, {}
    )
    compact_relations(
        spark, path, _BLOOM_ART_RELATIONS, finalize=_BLOOM_ART_MERGE
    )


def read_bloom_bitmap(
    spark: SparkSession, path: str, n_hashes: int | None = 3
) -> DataFrame:
    """Serve the committed family as the dense ONE-ROW ``bf`` bitmap
    :func:`bloom_might_contain` broadcasts: committed-pruned word
    rows, OR-merged when appended batches are outstanding (a
    ≤ words-sized shuffle), packed to width. The result answers
    membership for the UNION of base + committed batches with zero
    false negatives — crashed appends are invisible, so a bit can
    never be set for a fingerprint whose batch did not commit.

    ``n_hashes`` is the hash count the CALLER will probe with
    (r14 review): it must equal the family's build value or probing
    checks a bit position that was never set and true members read
    ``bloom_hit=0`` — the exact silent-false-negative hazard the
    manifest exists to prevent. Pass the value you will hand to
    :func:`bloom_might_contain` (its default, 3, matches this
    default); ``None`` skips the pin only when the caller reads the
    count out of band."""
    from .artifacts import committed_parts, read_committed_relation

    man = _validate_sketch_manifest(
        spark, path, "bloom word", _BLOOM_ART_LAYOUT,
        {"m_bits": None, "n_hashes": n_hashes},
    )
    words = read_committed_relation(spark, path, "words")
    if len(committed_parts(path)) > 1:
        words = _bloom_words_merge(words)
    return _pack_word_table(words, man["m_bits"] // _BLOOM_WORD_BITS)


# ---------------------------------------------------------------------------
# HLL register-table ARTIFACT: the MAX-monoid member
# ---------------------------------------------------------------------------
#
# A deterministic, engine-portable HyperLogLog register table:
# register index = first md5 word mod 2^p, rho = 1-based position of
# the first set bit in the second md5 word's 32-bit slice (33 when
# the slice is zero). Everything is integer/string expressions both
# Spark and DuckDB evaluate bit-identically — unlike the built-in
# DataSketches HLL (opaque binary, bound-predicate oracles only),
# this register table is EXACTLY hash-verifiable, and two tables
# over any row batches merge by per-register MAX.


def hll_registers(
    df: DataFrame, key_col: str, p: int = 6
) -> DataFrame:
    """The (reg, rho) register table of ``df[key_col]``: at most
    ``2**p`` rows regardless of input size (the explode-free CMS
    cousin — one md5 per row, one bounded-domain map-side-combining
    aggregate)."""
    h = F.md5(F.col(key_col).cast("string"))
    t = df.select(
        F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
            F.lit(2 ** p),
        ).alias("reg"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("__x__"),
    )
    rho = F.when(F.col("__x__") == 0, F.lit(33)).otherwise(
        F.instr(F.lpad(F.bin(F.col("__x__")), 32, "0"), "1")
    )
    return (
        t.select("reg", rho.cast("int").alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


_HLL_ART_LAYOUT = 1
_HLL_ART_RELATIONS = ("registers",)


def _hll_registers_merge(df: DataFrame) -> DataFrame:
    return df.groupBy("reg").agg(F.max("rho").alias("rho"))


_HLL_ART_MERGE = {"registers": _hll_registers_merge}


def hll_build_artifact(
    df: DataFrame, path: str, key_col: str, p: int = 6
) -> None:
    """Persist the register table as a partitioned artifact (manifest
    pins the precision ``p``; ≤ 2**p rows — index-metadata-sized at
    any corpus scale)."""
    import os

    from .similarity import _write_artifact_manifest

    spark = df.sparkSession
    _write_artifact_manifest(
        spark, path, {"p": int(p), "layout": _HLL_ART_LAYOUT}
    )
    (
        hll_registers(df, key_col, p=p)
        .write.mode("overwrite")
        .parquet(f"{path}/registers/part=base")
    )
    os.makedirs(f"{path}/_batches", exist_ok=True)


def hll_append(
    new_rows: DataFrame,
    path: str,
    batch_id: str,
    key_col: str,
    p: int = 6,
) -> None:
    """Fold a new row batch into the standing register table
    TRANSACTIONALLY — O(batch), per-batch partial registers merged by
    MAX on read. Like OR (and unlike SUM), MAX is idempotent:
    overlapping batches are harmless, which is exactly why
    distinct-count sketches are the nightly-rollup workhorse — the
    same user seen on two days maxes into the same register."""
    from .artifacts import append_part_dir, transactional_append

    spark = new_rows.sparkSession
    _validate_sketch_manifest(
        spark, path, "hll register", _HLL_ART_LAYOUT, {"p": p}
    )
    with transactional_append(
        path, batch_id, _HLL_ART_RELATIONS
    ) as fresh:
        if not fresh:
            return
        (
            hll_registers(new_rows, key_col, p=p)
            .write.mode("overwrite")
            .parquet(append_part_dir(path, "registers", batch_id))
        )


def hll_compact(spark: SparkSession, path: str) -> None:
    """Fold committed batches into one ``part=base``, materializing
    the per-register MAX. Shared implementation:
    ``artifacts.compact_relations``."""
    from .artifacts import compact_relations

    _validate_sketch_manifest(
        spark, path, "hll register", _HLL_ART_LAYOUT, {}
    )
    compact_relations(
        spark, path, _HLL_ART_RELATIONS, finalize=_HLL_ART_MERGE
    )


def read_hll_registers(
    spark: SparkSession, path: str, p: int = 6
) -> DataFrame:
    """Read the committed register table, MAX-merging per-batch
    partials when appended batches are outstanding (≤ 2**p rows
    out)."""
    from .artifacts import committed_parts, read_committed_relation

    _validate_sketch_manifest(
        spark, path, "hll register", _HLL_ART_LAYOUT, {"p": p}
    )
    df = read_committed_relation(spark, path, "registers")
    if len(committed_parts(path)) > 1:
        df = _hll_registers_merge(df)
    return df


# ---------------------------------------------------------------------------
# Prefix-sharded Bloom: the past-broadcast-size growth path
# ---------------------------------------------------------------------------


def _bloom_shard_key(fp_col: str, n_shards: int) -> Column:
    """Shard route from the LAST two md5 hex chars — the slice the
    probe hashes don't touch at the sharded mode's n_hashes<=3 cap,
    so routing stays independent of the probed bits."""
    return F.pmod(
        F.conv(F.substring(F.col(fp_col), 31, 2), 16, 10).cast("int"),
        F.lit(n_shards),
    )


def bloom_bitmap_sharded(
    fps: DataFrame,
    fp_col: str = "fp",
    n_shards: int = 16,
    m_bits: int | None = None,
    n_hashes: int = 3,
    shard_count_hint: int | None = None,
    bits_per_key: int = 10,
) -> DataFrame:
    """The growth path :func:`bloom_bitmap`'s docstring promises,
    implemented: when one bitmap row outgrows comfortable broadcast
    size, band fingerprints by an md5 prefix into ``n_shards``
    independent auto-sized bitmaps — a DataFrame of
    ``(shard_id, bf)`` rows, each row still a few MB, the FAMILY
    scaling to any corpus by raising ``n_shards``. Probing routes
    each row to its shard's bitmap with a broadcast join
    (:func:`bloom_might_contain_sharded`); nightly maintenance ORs
    per-shard with :func:`bloom_merge_sharded`. Nothing in the bit
    math changes — the shard key is just two more hex characters of
    the same md5 the hashes already slice (the last two, disjoint
    from the probe slices, hence the ``n_hashes <= 3`` cap here).

    Every shard gets the SAME width (``m_bits``, or auto-sized from
    the mean members-per-shard via :func:`auto_bloom_bits`) so the
    family merges row-for-row; a shard spine guarantees all
    ``n_shards`` rows exist even for empty shards."""
    if not 1 <= n_hashes <= 3:
        raise ValueError(
            "sharded mode supports n_hashes in [1, 3]: the 4th md5 "
            "slice is the shard key"
        )
    if m_bits is None:
        n = shard_count_hint if shard_count_hint is not None else fps.count()
        per_shard = (n + n_shards - 1) // n_shards
        m_bits = auto_bloom_bits(per_shard, bits_per_key=bits_per_key)
    if m_bits % _BLOOM_WORD_BITS != 0:
        raise ValueError(
            f"m_bits must be a multiple of {_BLOOM_WORD_BITS}: {m_bits}"
        )
    n_words = m_bits // _BLOOM_WORD_BITS
    spark = fps.sparkSession
    pos = fps.select(
        _bloom_shard_key(fp_col, n_shards).alias("shard_id"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.conv(
                            F.substring(F.col(fp_col), 1 + 8 * j, 8), 16, 10
                        ).cast("bigint"),
                        F.lit(m_bits),
                    )
                    for j in range(n_hashes)
                ]
            )
        ).alias("pos"),
    )
    words = (
        pos.select(
            "shard_id",
            F.floor(F.col("pos") / _BLOOM_WORD_BITS).cast("long").alias("w"),
            F.pmod(F.col("pos"), _BLOOM_WORD_BITS).cast("int").alias("b"),
        )
        .groupBy("shard_id", "w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("word"))
    )
    packed = words.groupBy("shard_id").agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias(
            "__m__"
        )
    )
    spine = spark.range(n_shards).select(F.col("id").cast("int").alias("shard_id"))
    return (
        spine.join(packed, "shard_id", "left")
        .select(
            "shard_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m__"), i.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("bf"),
        )
    )


def bloom_might_contain_sharded(
    df: DataFrame,
    bitmaps: DataFrame,
    fp_col: str = "fp",
    n_shards: int = 16,
    n_hashes: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe a :func:`bloom_bitmap_sharded` family: route each row to
    its shard's bitmap row via a BROADCAST join on the prefix key
    (n_shards rows — still no shuffle of the probed data), then the
    identical bit tests as the one-row probe. Same NULL contract:
    NULL fingerprints get verdict 1 (forced exact verify, never a
    silent drop)."""
    bmp = bitmaps.select(
        F.col("shard_id").alias("__sid__"), F.col("bf").alias("__bf__")
    )
    routed = df.join(
        F.broadcast(bmp),
        _bloom_shard_key(fp_col, n_shards) == F.col("__sid__"),
        "left",
    )
    m = F.size(F.col("__bf__")) * _BLOOM_WORD_BITS
    hit = None
    out = routed
    for j in range(n_hashes):
        pj = F.pmod(
            F.conv(F.substring(F.col(fp_col), 1 + 8 * j, 8), 16, 10).cast(
                "bigint"
            ),
            m,
        )
        out = out.withColumn(
            f"__b{j}__", F.pmod(pj, _BLOOM_WORD_BITS).cast("int")
        )
        word = F.element_at(
            F.col("__bf__"),
            (F.floor(pj / _BLOOM_WORD_BITS) + 1).cast("int"),
        )
        h = (
            word.bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), __b{j}__)")
            )
            != 0
        )
        hit = h if hit is None else (hit & h)
    return out.withColumn(
        out_col, F.coalesce(hit.cast("long"), F.lit(1).cast("long"))
    ).drop("__sid__", "__bf__", *[f"__b{j}__" for j in range(n_hashes)])


def bloom_merge_sharded(families: Sequence[DataFrame]) -> DataFrame:
    """OR-merge :func:`bloom_bitmap_sharded` families shard-by-shard
    (equal n_shards and width required — same family contract as
    :func:`bloom_merge`, enforced by the same raise-on-NULL zip). The
    nightly maintenance step at sharded scale: each shard's bitmap
    merges independently, so the work is n_shards tiny rows however
    large the corpus."""
    if not families:
        raise ValueError("bloom_merge_sharded needs at least one family")
    out = families[0]
    for i, nxt in enumerate(families[1:]):
        out = (
            out.join(
                nxt.select(
                    "shard_id", F.col("bf").alias(f"__o{i}__")
                ),
                "shard_id",
                "full",
            )
            .select(
                "shard_id",
                F.zip_with(
                    "bf",
                    f"__o{i}__",
                    lambda a, b: F.when(
                        a.isNull() | b.isNull(),
                        F.raise_error(
                            F.lit(
                                "bloom_merge_sharded: width or shard "
                                "mismatch — families must share "
                                "n_shards and m_bits"
                            )
                        ).cast("long"),
                    ).otherwise(a.bitwiseOR(b)),
                ).alias("bf"),
            )
        )
    return out
