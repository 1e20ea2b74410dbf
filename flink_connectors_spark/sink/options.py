"""Sink options model + validation.

Mirrors the reference's option surface and validation rules
(`table/ClickHouseDynamicTableFactory.java:21-120` option definitions,
`:166-184` custom validation; holder
`table/internal/options/ClickHouseOptions.java`) with the fixes SURVEY
§2.1 calls out:

- `ignore_delete` is actually honored by the insert-only executor
  (the reference parses but never reads it).
- `upsert` is a selectable write mode (dead code in the reference).
"""

from __future__ import annotations

from dataclasses import dataclass, field

PARTITION_STRATEGIES = ("balanced", "shuffle", "hash", "hash-compat")
WRITE_MODES = ("insert_only", "collapsing", "replacing", "upsert")


@dataclass(frozen=True)
class SinkOptions:
    """Immutable, validated sink configuration.

    Defaults follow the reference exactly: batch_size 1000
    (`ClickHouseDynamicTableFactory.java:69-74`), flush_interval 1s
    (`:76-81`), max_retries 3 (`:83-87`), partition_strategy
    'balanced' (`:103-107`).
    """

    url: str
    table_name: str
    database: str = "default"
    username: str | None = None
    password: str | None = None
    batch_size: int = 1000
    flush_interval_s: float = 1.0
    max_retries: int = 3
    write_local: bool = False
    partition_strategy: str = "balanced"
    partition_key: tuple[str, ...] = field(default_factory=tuple)
    local_nodes: tuple[str, ...] = field(default_factory=tuple)
    ignore_delete: bool = True
    primary_key: tuple[str, ...] = field(default_factory=tuple)
    write_mode: str = "insert_only"
    sign_column: str = "sign"
    deleted_column: str = "deleted"
    version_column: str = "ver"
    op_column: str = "op"
    # Drop rows superseded within the same micro-batch before the wire
    # (writer.precompact_changelog) — an extension over the reference,
    # which ships every row and compacts at MergeTree merge time.
    precompact: bool = False

    def __post_init__(self) -> None:
        # Required options (reference `:138-144`).
        if not self.url:
            raise ValueError("option 'url' is required")
        if not self.table_name:
            raise ValueError("option 'table-name' is required")
        # Strategy whitelist (reference `:170-174`).
        if self.partition_strategy not in PARTITION_STRATEGIES:
            raise ValueError(
                f"unknown sink.partition-strategy "
                f"'{self.partition_strategy}', expected one of "
                f"{PARTITION_STRATEGIES}"
            )
        # hash strategies require a partition key (reference `:175-177`).
        if (
            self.partition_strategy in ("hash", "hash-compat")
            and not self.partition_key
        ):
            raise ValueError(
                f"sink.partition-strategy '{self.partition_strategy}' "
                "requires sink.partition-key"
            )
        # username and password must come together (reference `:179-183`).
        if bool(self.username) != bool(self.password):
            raise ValueError(
                "either both username and password must be set, or neither"
            )
        if self.write_mode not in WRITE_MODES:
            raise ValueError(
                f"unknown write mode '{self.write_mode}', expected one of "
                f"{WRITE_MODES}"
            )
        # Update-capable modes need a primary key, matching the
        # reference's changelog check
        # (`ClickHouseDynamicTableSink.java:34-38`).
        if self.write_mode in ("replacing", "upsert") and not self.primary_key:
            raise ValueError(
                f"write mode '{self.write_mode}' requires primary_key"
            )
        if self.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if self.max_retries < 0:
            raise ValueError("max_retries must be >= 0")

    @property
    def qualified_table(self) -> str:
        return f"{self.database}.{self.table_name}"

    @classmethod
    def from_dict(cls, opts: dict[str, str]) -> SinkOptions:
        """Parse the string-typed option map a DataSource receives
        (DDL OPTIONS / .option() calls), using the reference's option
        names with '.'->'_' normalization."""

        def split_cols(v: str | None) -> tuple[str, ...]:
            return tuple(c.strip() for c in v.split(",") if c.strip()) if v else ()

        def get(name: str, default: str | None = None) -> str | None:
            for k in (name, name.replace("-", "_"), f"sink.{name}"):
                if k in opts:
                    return opts[k]
            return default

        def as_bool(v: str | None, default: bool) -> bool:
            return default if v is None else v.lower() in ("true", "1", "yes")

        return cls(
            url=get("url", "") or "",
            table_name=get("table-name", "") or "",
            database=get("database-name", "default") or "default",
            username=get("username"),
            password=get("password"),
            batch_size=int(get("batch-size", "1000")),
            flush_interval_s=float(get("flush-interval", "1.0")),
            max_retries=int(get("max-retries", "3")),
            write_local=as_bool(get("write-local"), False),
            partition_strategy=get("partition-strategy", "balanced"),
            partition_key=split_cols(get("partition-key")),
            local_nodes=split_cols(get("write-local-nodes")),
            ignore_delete=as_bool(get("ignore-delete"), True),
            primary_key=split_cols(get("primary-key")),
            write_mode=get("write-mode", "insert_only"),
            sign_column=get("sign-column", "sign"),
            deleted_column=get("deleted-column", "deleted"),
            version_column=get("version-column", "ver"),
            op_column=get("op-column", "op"),
            precompact=as_bool(get("precompact"), False),
        )
