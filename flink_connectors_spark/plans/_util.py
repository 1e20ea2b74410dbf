"""Cross-engine determinism helpers.

The driver compares Spark results against DuckDB oracles by value hash,
so floating-point aggregates must be *bit-identical* across engines.
Strategy: do money arithmetic in DECIMAL (exact in both engines, same
SQL semantics), and only cast the final aggregate to DOUBLE. Converting
the same exact decimal to binary64 rounds identically everywhere
(IEEE 754 nearest), so sums/products of prices hash-match.

Plain SUM(double) would NOT: Spark and DuckDB sum in different orders
and the last few ulps diverge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    """Column as exact DECIMAL(18,2) for order-independent arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def one_minus(col: str) -> Column:
    """(1 - col) in exact decimal."""
    return F.lit(1).cast(DEC) - dec(col)


def one_plus(col: str) -> Column:
    """(1 + col) in exact decimal."""
    return F.lit(1).cast(DEC) + dec(col)


def dsum(c: Column) -> Column:
    """Exact decimal SUM cast to double (bit-identical cross-engine)."""
    return F.sum(c).cast("double")


def davg(c: Column) -> Column:
    """Deterministic average: exact decimal sum cast to double, divided
    by the exact count. Both engines produce the same double."""
    return F.sum(c).cast("double") / F.count(F.lit(1))


def cents(col: str) -> Column:
    """2-dp money column as exact int64 hundredths. For the hottest
    full-scan aggregates: integer multiply/add stays in whole-stage
    codegen (no 128-bit decimal path), and integer sums are exact in
    any order, so the final double matches DuckDB bit-for-bit.
    Domain note: products of two/three cents-scaled factors keep row
    values < ~1e9 and running sums safe to ~9e18 — fine through
    SF~1000 lineitem; beyond that, fall back to the decimal helpers."""
    return F.round(F.col(col) * 100).cast("long")


# SQL-side mirrors (DuckDB) of the helpers above, for oracle strings.
SQL_DEC = "DECIMAL(18,2)"


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS {SQL_DEC})"


def sql_cents(col: str) -> str:
    """DuckDB mirror of :func:`cents`."""
    return f"CAST(round({col} * 100) AS BIGINT)"


def ntz(df, *cols: str):
    """Timestamp outputs as TIMESTAMP_NTZ (naive, matching DuckDB's
    TIMESTAMP exactly). The session runs in UTC so the cast is
    value-preserving; emitting tz-aware TIMESTAMP_LTZ instead risks
    the driver's value hash seeing a different Arrow type
    (timestamp[us, tz=UTC] vs timestamp[us]) for identical instants —
    the same hazard class as DuckDB HUGEINT vs Spark BIGINT.
    Parquet-sourced timestamp columns (e.g. o_orderdate) already read
    as NTZ; this aligns derived event-time columns with them."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return out
