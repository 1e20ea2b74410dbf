"""Reusable column-expression builders (all JVM-side built-ins).

These stay inside whole-stage codegen — no Python UDFs in any hot
path. Vector math uses higher-order array functions (`zip_with` +
`aggregate`), which fold sequentially left-to-right: the same order
DuckDB's `list_sum` uses, so results are bit-identical cross-engine
(verified empirically in tests/test_correctness.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float|double> columns,
    computed in float64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm (sqrt is IEEE-correctly-rounded → deterministic)."""
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in float64, deterministic cross-engine.
    Zero vectors yield NULL (try_divide) instead of an ANSI
    DIVIDE_BY_ZERO error — same hazard class as jaccard([], [])."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def normalize_text(c: Column) -> Column:
    """Canonical text normalization for dedup: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def tokenize(c: Column) -> Column:
    """Whitespace tokenization to array<string>."""
    return F.split(normalize_text(c), " ")


def word_shingles(words: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from a token array (array<string>).
    Built entirely from higher-order functions — no explode, no UDF:
    transform(sequence(1, len-n+1), i -> words[i..i+n-1] joined).
    Docs shorter than n words get an empty array (guarded explicitly:
    Spark's sequence(1, 0) would count *down*, not return empty)."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
    empty = F.array().cast("array<string>")
    return F.when(
        F.size(words) >= n, F.array_distinct(F.transform(idx, parts))
    ).otherwise(empty)


def raw_word_ngrams(words: Column, n: int = 3) -> Column:
    """NON-distinct n-word grams (one per position) — the repetition
    signals need multiplicity, unlike the dedup shingle set. Same
    higher-order-function construction as ``word_shingles`` minus the
    array_distinct."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
    empty = F.array().cast("array<string>")
    return F.when(
        F.size(words) >= n, F.transform(idx, parts)
    ).otherwise(empty)


def minhash_value(shingles: Column, seed: int) -> Column:
    """One MinHash signature component: the lexicographic min of
    md5(seed || '|' || shingle) over the shingle set. Using the hex
    digest *string* ordering keeps the oracle trivially portable
    (DuckDB md5 produces the identical digest)."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


def hex_prefix_to_long(hexstr: Column, n_chars: int) -> Column:
    """First ``n_chars`` hex digits as a non-negative BIGINT
    (n_chars <= 15 keeps it under 2^60, no sign issues)."""
    return F.conv(F.substring(hexstr, 1, n_chars), 16, 10).cast("bigint")


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays.

    Two empty arrays yield NULL (SQL 0/0 semantics) rather than an
    ANSI DIVIDE_BY_ZERO error — found by the property suite: the
    dedup pipelines always filter short docs first, but the public
    operator API must not crash a whole job on one empty pair."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.try_divide(inter, union)


def jaccard_distinct(a: Column, b: Column) -> Column:
    """Jaccard for KNOWN-distinct-element arrays:
    |A∩B| / (|A| + |B| - |A∩B|). Skips :func:`jaccard`'s array_union
    hash pass — one fewer O(|A|+|B|) traversal per pair, which is
    ~40% of the work on the dedup verify joins where this runs
    millions of times. Valid ONLY when both sides are distinct
    (``word_shingles`` guarantees it; the size identity breaks on
    duplicate-bearing inputs — use :func:`jaccard` there). Values are
    bit-identical to jaccard() on distinct inputs: both divisions see
    the same exact integer counts. NULL on two empty arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.try_divide(inter, union)
