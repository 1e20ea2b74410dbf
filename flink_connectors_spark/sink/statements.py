"""SQL statement generation for the sink.

Mirrors the reference's statement factory
(`table/internal/ClickHouseStatementFactory.java`): INSERT (`:11-25`),
ALTER TABLE ... UPDATE (`:61-88`), ALTER TABLE ... DELETE (`:90-106`),
row-exists probe (`:108-114`), backtick quoting (`:116-118`) — with
the reference's quirk *fixed*: its replacing/collapsing insert
variants ignore their extra-column argument and rely on the caller
appending it to the field list (`:27-59`); here the extra column is an
explicit parameter.
"""

from __future__ import annotations


def quote(identifier: str) -> str:
    """Backtick-quote an identifier (reference `:116-118`)."""
    return f"`{identifier}`"


def _cols(field_names: tuple[str, ...] | list[str]) -> str:
    return ", ".join(quote(f) for f in field_names)


def _placeholders(n: int) -> str:
    return ", ".join(["?"] * n)


def insert_statement(
    table: str,
    field_names: list[str] | tuple[str, ...],
    extra_column: str | None = None,
) -> str:
    """INSERT INTO t(cols...) VALUES (?...) — reference `:11-25`;
    ``extra_column`` covers the collapsing sign / replacing deleted
    flag explicitly (reference appended it to fieldNames instead,
    `AbstractClickHouseOutputFormat.java:84-119`)."""
    fields = list(field_names) + ([extra_column] if extra_column else [])
    return (
        f"INSERT INTO {table}({_cols(fields)}) "
        f"VALUES ({_placeholders(len(fields))})"
    )


def update_statement(
    table: str,
    field_names: list[str] | tuple[str, ...],
    key_fields: list[str] | tuple[str, ...],
    on_cluster: str | None = None,
) -> str:
    """ALTER TABLE ... UPDATE set WHERE keys — reference `:61-88`.
    Non-key fields are SET; key fields form the WHERE."""
    setters = ", ".join(
        f"{quote(f)}=?" for f in field_names if f not in set(key_fields)
    )
    conds = " AND ".join(f"{quote(k)}=?" for k in key_fields)
    cluster = f" ON CLUSTER {on_cluster}" if on_cluster else ""
    return f"ALTER TABLE {table}{cluster} UPDATE {setters} WHERE {conds}"


def delete_statement(
    table: str,
    key_fields: list[str] | tuple[str, ...],
    on_cluster: str | None = None,
) -> str:
    """ALTER TABLE ... DELETE WHERE keys — reference `:90-106`."""
    conds = " AND ".join(f"{quote(k)}=?" for k in key_fields)
    cluster = f" ON CLUSTER {on_cluster}" if on_cluster else ""
    return f"ALTER TABLE {table}{cluster} DELETE WHERE {conds}"


def row_exists_statement(
    table: str, key_fields: list[str] | tuple[str, ...]
) -> str:
    """SELECT 1 FROM t WHERE keys — reference `:108-114`."""
    conds = " AND ".join(f"{quote(k)}=?" for k in key_fields)
    return f"SELECT 1 FROM {table} WHERE {conds}"
