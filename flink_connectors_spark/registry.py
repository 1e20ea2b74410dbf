"""Query/oracle registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and by the local test harness.

Every implemented operator from SURVEY.md §2 registers a ``QuerySpec``:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string
that DuckDB runs over the same parquet tables. Column names/aliases
MUST match between the two — the driver sorts columns by name before
value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    # Round this query was first registered (0 = predates the field).
    # Auditable metadata (git history shows when each registration
    # landed), used ONLY to order the never-checked queue fairly:
    # queries that have waited longer for a driver row go first.
    since: int = 0
    # Round this query's IMPLEMENTATION last materially changed
    # (refactor, new serving path, semantics-preserving rewrite).
    # The r10 verdict's rotation blind spot: the window rule
    # (red > never-checked > stalest-green) cannot see code churn, so
    # a query refactored AFTER its last driver green would wait its
    # staleness turn while running new code. A green row OLDER than
    # ``changed`` is treated as provisional: the query fronts the
    # verified tier until the driver re-greens it post-change.
    changed: int = 0


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    since: int = 0,
    changed: int = 0,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags,
            doc=doc or (fn.__doc__ or ""), since=since,
            changed=changed,
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver-facing ordering — self-maintaining rotation.
#
# The correctness driver oracle-checks the FIRST 50 entries of
# ``queries()`` in iteration order each round (observed r1/r2: its
# CORRECTNESS keys were exactly ``list(queries())[:50]``). With ~150
# registered queries we rotate so every query earns a driver row, and
# previously-verified queries periodically cycle back through the
# checked window so regressions are caught.
#
# The rotation is derived entirely from the machine-readable
# ``CORRECTNESS_r{N}.json`` files the driver itself writes at the repo
# root — no hand-curated name lists. Ordering rule (deterministic):
#
#   1. RED rows (latest driver verdict not fully green) — re-check first.
#   2. Never-checked queries, in registration order.
#   3. Verified queries whose implementation changed AFTER their last
#      green row (``QuerySpec.changed`` > green round) — the green is
#      provisional; front them ahead of plain staleness (r10 verdict:
#      the rotation cannot see code churn).
#   4. Verified queries, stalest first (ascending round of their latest
#      green row, then registration order). Once all queries have rows,
#      this degenerates to a round-robin: each round the driver re-checks
#      the 50 least-recently-verified queries.
#
# Every name found in a CORRECTNESS file must exist in the registry —
# a renamed query raises loudly instead of silently dropping out of
# the rotation.
# ---------------------------------------------------------------------------

import json
import re
from pathlib import Path


def _driver_history(root: Path | None = None) -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a row, was that row fully green)."""
    if root is None:
        root = Path(__file__).resolve().parent.parent
    hist: dict[str, tuple[int, bool]] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") in (None, "")
            )
            prev = hist.get(name)
            if prev is None or rnd >= prev[0]:
                hist[name] = (rnd, green)
    return hist


def _driver_order(names: list[str]) -> list[str]:
    hist = _driver_history()
    unknown = sorted(set(hist) - set(names))
    if unknown:
        raise ValueError(
            "CORRECTNESS_r*.json references queries missing from the "
            f"registry (renamed or deleted?): {unknown}"
        )
    reg_index = {n: i for i, n in enumerate(names)}

    def key(n: str) -> tuple[int, int, int]:
        if n not in hist:
            # never checked: longest-waiting first (since = round the
            # registration landed), then registration order
            return (1, _REGISTRY[n].since, reg_index[n])
        rnd, green = hist[n]
        if not green:
            return (0, rnd, reg_index[n])  # red: front of the line
        if _REGISTRY[n].changed > rnd:
            # green predates a code change: provisional — re-check
            # before plain stale greens (stalest green first among
            # the refactored set too)
            return (2, rnd, reg_index[n])
        return (3, rnd, reg_index[n])  # verified: stalest first

    return sorted(names, key=key)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return {n: _REGISTRY[n] for n in _driver_order(list(_REGISTRY))}


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every plan module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from .plans import (  # noqa: F401
        llm_ops,
        llm_ops2,
        llm_ops3,
        relational,
        relational2,
        relational3,
        relational4,
        scalar,
        scalar2,
        scalar3,
        sink_semantics,
        sql_surface,
        streaming_batch,
        temporal,
        windows,
    )

    _LOADED = True
