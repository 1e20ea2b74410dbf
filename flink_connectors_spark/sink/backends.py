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
    local shard nodes issues the reference's two system queries
    (`ClickHouseConnectionProvider.java:98` system.clusters,
    `:161` system.tables engine lookup) through this client.

    Placeholder dialect: ``sink.statements`` / ``sink.topology`` emit
    JDBC-style ``?`` positional placeholders (the reference's dialect,
    `ClickHouseUpsertExecutor.java:60-79`), which clickhouse-connect
    does NOT understand — it supports ``%s`` client-side binding with
    a sequence or ``{name:Type}`` server-side binding with a dict.
    ``_qmarks_to_pyformat`` rewrites ``?`` -> ``%s`` (skipping string
    literals, escaping pre-existing ``%``) so every statement binds
    correctly against a real server."""

    def __init__(
        self,
        url: str,
        database: str,
        username: str | None,
        password: str | None,
        client=None,
    ) -> None:
        if client is not None:
            # injected client (contract tests mock the transport)
            self.client = client
            return
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

    @staticmethod
    def _qmarks_to_pyformat(sql: str) -> str:
        """Rewrite JDBC ``?`` placeholders to pyformat ``%s``.

        A ``?`` inside a single-quoted SQL string literal is data, not
        a placeholder; literal ``%`` (e.g. ``LIKE '%x%'``) must double
        to ``%%`` or clickhouse-connect's client-side formatting
        consumes it."""
        out: list[str] = []
        in_str = False
        i = 0
        while i < len(sql):
            ch = sql[i]
            if in_str:
                if ch == "'" and i + 1 < len(sql) and sql[i + 1] == "'":
                    out.append("''")
                    i += 2
                    continue
                if ch == "'":
                    in_str = False
                out.append("%%" if ch == "%" else ch)
            elif ch == "'":
                in_str = True
                out.append(ch)
            elif ch == "?":
                out.append("%s")
            elif ch == "%":
                out.append("%%")
            else:
                out.append(ch)
            i += 1
        return "".join(out)

    def insert_rows(
        self, table: str, columns: list[str], rows: list[tuple]
    ) -> None:
        self.client.insert(table, rows, column_names=columns)

    def execute(self, sql: str, params: tuple = ()) -> None:
        self.client.command(
            self._qmarks_to_pyformat(sql), parameters=list(params)
        )

    def query(self, sql: str, params: tuple = ()) -> list[tuple]:
        return [
            tuple(r)
            for r in self.client.query(
                self._qmarks_to_pyformat(sql), parameters=list(params)
            ).result_rows
        ]

    def insert_arrow(self, table: str, arrow_table) -> None:
        self.client.insert_arrow(table, arrow_table)

    def close(self) -> None:
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


def shard_backend_factories(opts: Any, addresses: list[str]) -> list:
    """One backend factory per shard node — the write-local fan-out
    the reference's `ClickHouseShardOutputFormat.java:72-81` does with
    per-shard connections. ``addresses`` comes from
    ``topology.shard_addresses`` (configured write-local-nodes, or
    system.clusters discovery).

    ClickHouse targets get one HTTP client per shard address; the
    local test transports map each shard to its own directory/file so
    routing is observable without a server (shard i of a
    ``parquet://base`` target lands in ``base/shard-i=<address>``)."""
    url = opts.url
    out = []
    for i, addr in enumerate(addresses):
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", addr)
        if url.startswith("parquet://"):
            base = url[len("parquet://"):]
            out.append(
                ParquetDirBackendFactory(
                    os.path.join(base, f"shard-{i}={safe}")
                )
            )
        elif url.startswith("duckdb://"):
            base = url[len("duckdb://"):]
            out.append(DuckDBBackendFactory(f"{base}.shard-{i}-{safe}"))
        else:
            host, _, port = addr.partition(":")
            out.append(
                ClickHouseHTTPBackendFactory(
                    f"http://{host}:{port or 8123}",
                    opts.database,
                    opts.username,
                    opts.password,
                )
            )
    return out
