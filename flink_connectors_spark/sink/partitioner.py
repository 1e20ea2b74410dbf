"""Shard-routing strategies as Spark repartition plans.

The reference routes each row to a shard inside the task
(`table/internal/ClickHouseShardOutputFormat.java:72-81` calling a
partitioner: balanced `BalancedPartitioner.java:10-14`, shuffle
`ShufflePartitioner.java:10-13`, hash `HashPartitioner.java:18-25`).
Idiomatic Spark inverts this (SURVEY.md §2.1 S4): routing IS a
shuffle — `repartition(nShards, ...)` — so each task then writes
exactly one shard over one connection. At 1000 executors this is the
only shape that scales: shard-locality comes from the partitioner,
connection count stays O(tasks), and AQE can still coalesce.

Key-not-in-schema validation mirrors
`AbstractClickHouseOutputFormat.java:190-195`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .options import SinkOptions

SHARD_COLUMN = "__fcs_shard__"

_WRAP_MASK = 0xFFFFFFFF
_SIGN_BIT = 0x80000000


def _wrap32(col):
    """Truncate a 64-bit expression to Java 32-bit int semantics
    (two's-complement wraparound), staying in long arithmetic so the
    formula also works where CAST overflow would throw (ANSI mode)."""
    low = col.bitwiseAND(F.lit(_WRAP_MASK))
    return low.bitwiseXOR(F.lit(_SIGN_BIT)) - F.lit(_SIGN_BIT)


def java_list_hash(schema, keys: tuple[str, ...]):
    """`java.util.Objects.hashCode(List<Object>)` of the key fields as
    a Spark Column — the EXACT hash the reference's shard router
    computes (`HashPartitioner.java:18-25` builds an ArrayList of the
    key values and takes its hashCode: h = 1; h = 31*h + e.hashCode()
    per element, 32-bit overflow arithmetic; null hashes 0).

    Supported key types: the integral ones (Long.hashCode =
    (int)(v ^ v>>>32); Integer/Short/Byte hash to their int value)
    and String (h = 31*h + codeUnit per UTF-16 code unit — the
    codegen'd fold expands non-BMP codepoints into their surrogate
    pair, exactly what Java's char iteration sees). Other types
    raise: a silent fallback to a different hash would route rows to
    DIFFERENT shards than the reference, which is the one thing this
    expression exists to prevent."""
    from pyspark.sql import types as T

    h = F.lit(1).cast("long")
    by_name = {f.name: f.dataType for f in schema.fields}
    for k in keys:
        dt = by_name[k]
        v = F.col(k).cast("long")
        if isinstance(dt, T.LongType):
            hc = _wrap32(v.bitwiseXOR(F.shiftrightunsigned(v, 32)))
        elif isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            hc = v  # Integer/Short/Byte.hashCode == the int value
        elif isinstance(dt, T.StringType):
            hc = _java_string_hash(F.col(k))
        else:
            raise TypeError(
                f"hash-compat partition key '{k}' has type "
                f"{dt.simpleString()}; reference-exact routing is "
                "implemented for integral and string keys only"
            )
        hc = F.when(F.col(k).isNull(), F.lit(0)).otherwise(hc)
        h = _wrap32(h * F.lit(31) + hc)
    return h


def _java_string_hash(col):
    """`java.lang.String.hashCode` as a codegen'd fold: h = 31*h + c
    over the UTF-16 CODE UNITS (not codepoints — a supplementary
    character contributes its surrogate pair, two iterations in
    Java's char loop, so the fold expands cp > 0xFFFF into
    high/low halves). split('') yields one element per codepoint and
    [''] for the empty string; empty elements are filtered so '' hashes
    to 0, matching Java."""
    chars = F.filter(
        F.split(col, ""), lambda c: F.length(c) > 0
    )

    def step(acc, ch):
        cp = F.ascii(ch).cast("long")
        bmp = _wrap32(acc * F.lit(31) + cp)
        hi = F.lit(0xD800) + F.shiftright(cp - F.lit(0x10000), 10)
        lo = F.lit(0xDC00) + (cp - F.lit(0x10000)).bitwiseAND(F.lit(0x3FF))
        sup = _wrap32(_wrap32(acc * F.lit(31) + hi) * F.lit(31) + lo)
        return F.when(cp > F.lit(0xFFFF), sup).otherwise(bmp)

    return F.aggregate(chars, F.lit(0).cast("long"), step)


def shard_expr(opts: SinkOptions, n_shards: int, columns: list[str], schema=None):
    """Column expression computing the target shard id for each row."""
    if opts.partition_strategy in ("hash", "hash-compat"):
        missing = [k for k in opts.partition_key if k not in columns]
        if missing:
            raise ValueError(
                f"partition key field(s) {missing} not found in schema "
                f"{columns}"
            )
    if opts.partition_strategy == "hash-compat":
        # Bit-exact reference routing ((h % n + n) % n over the Java
        # list hash, HashPartitioner.java:18-25) for migrations that
        # must keep the reference deployment's row->shard placement
        # (shard-local replacing/collapsing state lives where the old
        # writer put it). Needs the schema for type dispatch.
        if schema is None:
            raise ValueError("hash-compat requires the DataFrame schema")
        return F.pmod(
            java_list_hash(schema, opts.partition_key), F.lit(n_shards)
        ).cast("int")
    if opts.partition_strategy == "hash":
        # Spark-native Murmur3 hash-modulo (better avalanche than the
        # reference's Java hashCode; documented deviation — use
        # 'hash-compat' when placement parity with a live reference
        # deployment matters). pmod keeps negatives out.
        return F.pmod(F.hash(*[F.col(k) for k in opts.partition_key]), F.lit(n_shards))
    if opts.partition_strategy == "shuffle":
        return F.floor(F.rand() * n_shards).cast("int")
    # balanced (round-robin): monotonically_increasing_id mod n gives a
    # per-partition-interleaved assignment; Spark's native round-robin
    # (plain repartition(n)) is used in apply_partitioning instead.
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_shards)).cast("int")


def apply_partitioning(
    df: DataFrame, opts: SinkOptions, n_shards: int
) -> DataFrame:
    """Repartition so each output partition maps to one shard.

    - hash:     repartition on an explicit shard-id column derived
                from the key hash (co-locates key-equal rows).
    - shuffle:  random uniform redistribution.
    - balanced: Spark's native RoundRobinPartitioning.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    if opts.partition_strategy == "balanced":
        return df.repartition(n_shards)
    sid = shard_expr(opts, n_shards, df.columns, df.schema)
    return df.repartition(n_shards, sid)


def with_shard_column(
    df: DataFrame, opts: SinkOptions, n_shards: int
) -> DataFrame:
    """Alternative in-task routing shape: append the shard id as a
    column (for writers that keep per-shard buffers inside one task,
    like the reference's ShardOutputFormat)."""
    return df.withColumn(
        SHARD_COLUMN, shard_expr(opts, n_shards, df.columns, df.schema)
    )
