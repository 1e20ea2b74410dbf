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


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


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
