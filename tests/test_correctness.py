"""Replicates the driver's correctness gate locally: every registered
query runs on Spark AND its DuckDB oracle, compared by row count,
column names, and order-insensitive value equality (strict — the
driver hashes values, so near-equality is not enough).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from flink_connectors_spark import TABLES
from flink_connectors_spark.registry import all_specs


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return v


def _norm_rows(cols, rows):
    # Sort columns by name (driver does), then sort rows for
    # order-insensitive compare.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


_SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = _SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert len(srows) >= 0
        return

    con = _duck(sf_dir)
    try:
        res = con.execute(spec.oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duckdb={len(drows)}"
    )
    n_cols, n_srows = _norm_rows(scols, srows)
    _, n_drows = _norm_rows(dcols, drows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(n_srows, n_drows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: "
        f"{mismatches[:3]} (cols={n_cols})"
    )


def test_no_hugeint_or_decimal_oracle_outputs(sf_dir):
    """The driver's value-hash goes through Arrow: DuckDB HUGEINT
    (int128, e.g. from SUM over integers) and DECIMAL outputs do not
    round-trip to the same Arrow type Spark emits, so they hash-
    mismatch even when values are numerically equal (observed:
    `pipeline_clean_corpus` r1 red row). Every final oracle column
    must resolve to a plain BIGINT/DOUBLE/VARCHAR/... type."""
    con = _duck(sf_dir)
    offenders = []
    try:
        for name, spec in _SPECS.items():
            if spec.oracle is None:
                continue
            rel = con.sql(spec.oracle)
            for col, ty in zip(rel.columns, rel.types):
                ts = str(ty)
                if ts in ("HUGEINT", "UHUGEINT", "INT128") or ts.startswith(
                    "DECIMAL"
                ):
                    offenders.append((name, col, ts))
    finally:
        con.close()
    assert not offenders, f"cast these oracle columns: {offenders}"
