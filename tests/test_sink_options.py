"""Option validation — mirrors the reference's factory validation
rules (`ClickHouseDynamicTableFactory.java:138-184`)."""

from __future__ import annotations

import pytest

from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink import statements


def _ok(**kw):
    base = dict(url="duckdb:///tmp/x.db", table_name="t")
    base.update(kw)
    return SinkOptions(**base)


def test_required_options():
    with pytest.raises(ValueError, match="url"):
        SinkOptions(url="", table_name="t")
    with pytest.raises(ValueError, match="table-name"):
        SinkOptions(url="u", table_name="")


def test_partition_strategy_whitelist():
    for s in ("balanced", "shuffle"):
        assert _ok(partition_strategy=s).partition_strategy == s
    with pytest.raises(ValueError, match="partition-strategy"):
        _ok(partition_strategy="bogus")


def test_hash_requires_partition_key():
    with pytest.raises(ValueError, match="partition-key"):
        _ok(partition_strategy="hash")
    assert _ok(
        partition_strategy="hash", partition_key=("a",)
    ).partition_key == ("a",)


def test_username_password_pairing():
    with pytest.raises(ValueError, match="username and password"):
        _ok(username="u")
    with pytest.raises(ValueError, match="username and password"):
        _ok(password="p")
    assert _ok(username="u", password="p").username == "u"


def test_update_modes_require_primary_key():
    with pytest.raises(ValueError, match="primary_key"):
        _ok(write_mode="replacing")
    with pytest.raises(ValueError, match="primary_key"):
        _ok(write_mode="upsert")
    assert _ok(write_mode="replacing", primary_key=("k",)).write_mode == "replacing"


def test_from_dict_option_names():
    o = SinkOptions.from_dict(
        {
            "url": "parquet:///tmp/out",
            "table-name": "sink_t",
            "sink.batch-size": "50000",
            "sink.flush-interval": "30",
            "sink.max-retries": "5",
            "sink.partition-strategy": "hash",
            "sink.partition-key": "a, b",
            "sink.write-local": "true",
            "primary-key": "a",
            "write-mode": "replacing",
        }
    )
    assert o.batch_size == 50000
    assert o.flush_interval_s == 30.0
    assert o.max_retries == 5
    assert o.partition_key == ("a", "b")
    assert o.write_local is True
    assert o.write_mode == "replacing"


def test_statement_generation():
    ins = statements.insert_statement("db.t", ["a", "b"])
    assert ins == "INSERT INTO db.t(`a`, `b`) VALUES (?, ?)"
    ins_sign = statements.insert_statement("db.t", ["a"], extra_column="sign")
    assert ins_sign == "INSERT INTO db.t(`a`, `sign`) VALUES (?, ?)"
    upd = statements.update_statement("t", ["a", "b", "k"], ["k"])
    assert upd == "ALTER TABLE t UPDATE `a`=?, `b`=? WHERE `k`=?"
    upd_c = statements.update_statement("t", ["a", "k"], ["k"], on_cluster="c1")
    assert upd_c == "ALTER TABLE t ON CLUSTER c1 UPDATE `a`=? WHERE `k`=?"
    dele = statements.delete_statement("t", ["k1", "k2"])
    assert dele == "ALTER TABLE t DELETE WHERE `k1`=? AND `k2`=?"
    probe = statements.row_exists_statement("t", ["k"])
    assert probe == "SELECT 1 FROM t WHERE `k`=?"
