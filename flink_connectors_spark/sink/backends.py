"""Pluggable sink transports.

The reference talks JDBC to ClickHouse
(`table/internal/connection/ClickHouseConnectionProvider.java:40-64`).
Here the transport is a small protocol so the writer machinery is
testable without a server:

- ``ParquetDirBackend``: each flush lands one parquet file in a
  directory — safe under arbitrary task parallelism and retries
  (unique file names), the natural local stand-in for an
  append-only MergeTree part.
- ``DuckDBBackend``: a real SQL store supporting the mutation
  statements (upsert mode's ALTER-equivalents); single-writer, used
  from one task or driver-side in tests.
- ``ClickHouseHTTPBackend``: the production transport over
  clickhouse-connect (import-gated — not installed here).

Backends are constructed *inside* the task (factories are picklable,
connections are not), mirroring the reference's lazy per-task
connection (`ClickHouseConnectionProvider.java:40-46`).
"""

from __future__ import annotations

import os
import re
import uuid
from dataclasses import dataclass
from typing import Any, Protocol


class SinkBackend(Protocol):
    def insert_rows(
        self, table: str, columns: list[str], rows: list[tuple]
    ) -> None: ...

    def execute(self, sql: str, params: tuple = ()) -> None: ...

    def query(self, sql: str, params: tuple = ()) -> list[tuple]: ...

    def insert_arrow(self, table: str, arrow_table) -> None: ...

    def close(self) -> None: ...


@dataclass(frozen=True)
class ParquetDirBackendFactory:
    path: str

    def __call__(self) -> "ParquetDirBackend":
        return ParquetDirBackend(self.path)


class ParquetDirBackend:
    """Append-only local sink: one parquet file per flush."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def insert_rows(
        self, table: str, columns: list[str], rows: list[tuple]
    ) -> None:
        import pyarrow as pa

        if not rows:
            return
        cols = list(zip(*rows))
        self.insert_arrow(
            table, pa.table({c: pa.array(list(v)) for c, v in zip(columns, cols)})
        )

    def insert_arrow(self, table: str, arrow_table) -> None:
        """Zero-copy fast path: one parquet part per flush, straight
        from the Arrow batch — no per-row Python."""
        import pyarrow.parquet as pq

        if arrow_table.num_rows == 0:
            return
        tdir = os.path.join(self.path, table)
        os.makedirs(tdir, exist_ok=True)
        pq.write_table(
            arrow_table, os.path.join(tdir, f"part-{uuid.uuid4().hex}.parquet")
        )

    def execute(self, sql: str, params: tuple = ()) -> None:
        raise NotImplementedError(
            "ParquetDirBackend is append-only; mutations need DuckDBBackend "
            "or ClickHouseHTTPBackend"
        )

    def query(self, sql: str, params: tuple = ()) -> list[tuple]:
        raise NotImplementedError(
            "ParquetDirBackend has no query surface; topology discovery "
            "needs DuckDBBackend or ClickHouseHTTPBackend"
        )

    def close(self) -> None:
        pass


@dataclass(frozen=True)
class DuckDBBackendFactory:
    db_path: str

    def __call__(self) -> "DuckDBBackend":
        return DuckDBBackend(self.db_path)


class DuckDBBackend:
    """SQL-capable local backend (single concurrent writer).

    Translates the ClickHouse mutation dialect emitted by
    ``sink.statements`` (ALTER TABLE ... UPDATE/DELETE, backtick
    quoting) to standard SQL so the upsert executor is testable
    without a ClickHouse server."""

    _ALTER_UPDATE = re.compile(
        r"^ALTER TABLE (\S+) UPDATE (.*) WHERE (.*)$", re.DOTALL
    )
    _ALTER_DELETE = re.compile(
        r"^ALTER TABLE (\S+) DELETE WHERE (.*)$", re.DOTALL
    )

    def __init__(self, db_path: str) -> None:
        import duckdb

        self.con = duckdb.connect(db_path)

    @classmethod
    def _translate(cls, sql: str) -> str:
        sql = sql.replace("`", '"')
        m = cls._ALTER_UPDATE.match(sql)
        if m:
            return f"UPDATE {m.group(1)} SET {m.group(2)} WHERE {m.group(3)}"
        m = cls._ALTER_DELETE.match(sql)
        if m:
            return f"DELETE FROM {m.group(1)} WHERE {m.group(2)}"
        return sql

    def insert_rows(
        self, table: str, columns: list[str], rows: list[tuple]
    ) -> None:
        if not rows:
            return
        ph = ", ".join(["?"] * len(columns))
        cols = ", ".join(columns)
        self.con.executemany(
            f"INSERT INTO {table}({cols}) VALUES ({ph})", rows
        )

    def execute(self, sql: str, params: tuple = ()) -> None:
        # DuckDB shares the reference statements' `?` placeholder style.
        self.con.execute(self._translate(sql), list(params))

    def query(self, sql: str, params: tuple = ()) -> list[tuple]:
        return self.con.execute(self._translate(sql), list(params)).fetchall()

    def insert_arrow(self, table: str, arrow_table) -> None:
        """Arrow-native ingestion: DuckDB scans the registered Arrow
        table directly (vectorized, no row conversion)."""
        if arrow_table.num_rows == 0:
            return
        self.con.register("__arrow_batch__", arrow_table)
        try:
            self.con.execute(
                f"INSERT INTO {table} SELECT * FROM __arrow_batch__"
            )
        finally:
            self.con.unregister("__arrow_batch__")

    def close(self) -> None:
        self.con.close()


@dataclass(frozen=True)
class ClickHouseHTTPBackendFactory:
    url: str
    database: str = "default"
    username: str | None = None
    password: str | None = None

    def __call__(self) -> "ClickHouseHTTPBackend":
        return ClickHouseHTTPBackend(
            self.url, self.database, self.username, self.password
        )


class ClickHouseHTTPBackend:
    """Production transport (clickhouse-connect, HTTP). Discovery of
    local shard nodes would issue the reference's two system queries
    (`ClickHouseConnectionProvider.java:98` system.clusters,
    `:161` system.tables engine lookup) through this client."""

    def __init__(
        self,
        url: str,
        database: str,
        username: str | None,
        password: str | None,
    ) -> None:
        try:
            import clickhouse_connect  # type: ignore
        except ImportError as e:  # pragma: no cover - not installed here
            raise ImportError(
                "clickhouse-connect is required for the ClickHouse HTTP "
                "backend; use ParquetDirBackend/DuckDBBackend locally"
            ) from e
        self.client = clickhouse_connect.get_client(  # pragma: no cover
            dsn=url, database=database, username=username, password=password
        )

    def insert_rows(  # pragma: no cover - needs a live server
        self, table: str, columns: list[str], rows: list[tuple]
    ) -> None:
        self.client.insert(table, rows, column_names=columns)

    def execute(self, sql: str, params: tuple = ()) -> None:  # pragma: no cover
        self.client.command(sql, parameters=list(params))

    def query(self, sql: str, params: tuple = ()) -> list[tuple]:  # pragma: no cover
        return [tuple(r) for r in self.client.query(sql, parameters=list(params)).result_rows]

    def insert_arrow(self, table: str, arrow_table) -> None:  # pragma: no cover
        self.client.insert_arrow(table, arrow_table)

    def close(self) -> None:  # pragma: no cover
        self.client.close()


def backend_factory_for(opts: Any):
    """Choose a backend factory from sink options' url scheme:
    ``parquet://<dir>``, ``duckdb://<file>``, else ClickHouse HTTP."""
    url = opts.url
    if url.startswith("parquet://"):
        return ParquetDirBackendFactory(url[len("parquet://"):])
    if url.startswith("duckdb://"):
        return DuckDBBackendFactory(url[len("duckdb://"):])
    return ClickHouseHTTPBackendFactory(
        url, opts.database, opts.username, opts.password
    )
