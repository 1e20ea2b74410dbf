"""Rotation-protocol tests: the driver checks ``list(queries())[:50]``
each round, so the ordering must (a) be derived only from the
machine-readable CORRECTNESS_r*.json history, (b) front red rows and
never-checked queries, and (c) cycle previously-verified queries back
through the window stalest-first so regressions get re-caught.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from flink_connectors_spark import registry

ROOT = Path(registry.__file__).resolve().parent.parent


def _history():
    return registry._driver_history()


def test_every_query_has_spec_fields():
    specs = registry.all_specs()
    assert len(specs) >= 147
    for name, spec in specs.items():
        assert spec.name == name
        assert callable(spec.fn)


def test_history_names_all_exist_in_registry():
    names = set(registry.all_specs())
    hist = _history()
    assert hist, "driver history should be non-empty once CORRECTNESS files ship"
    missing = set(hist) - names
    assert not missing, f"renamed/deleted queries still in history: {missing}"


def test_front_is_red_then_unchecked_then_stalest_verified():
    names = list(registry.all_specs())
    hist = _history()

    def phase(n):
        if n not in hist:
            return 1
        rnd, green = hist[n]
        return 0 if not green else 2

    phases = [phase(n) for n in names]
    assert phases == sorted(phases), "order must be red < unchecked < verified"

    # verified block is sorted by the round of its latest green row
    verified = [n for n in names if phase(n) == 2]
    rounds = [hist[n][0] for n in verified]
    assert rounds == sorted(rounds), "verified queries must be stalest-first"


def test_front_50_maximizes_unchecked_coverage():
    """Every never-checked query must land in the driver's window before
    any already-verified query occupies a slot."""
    names = list(registry.all_specs())
    hist = _history()
    unchecked = [n for n in names if n not in hist]
    front = names[:50]
    if len(unchecked) <= 50:
        assert set(unchecked) <= set(front)
        # spare slots go to stalest verified queries (regression re-checks)
        spare = [n for n in front if n in hist and hist[n][1]]
        if spare:
            stalest_round = min(hist[n][0] for n in names if n in hist and hist[n][1])
            assert all(hist[n][0] == stalest_round for n in spare)
    else:
        assert all(n in unchecked or (n in hist and not hist[n][1]) for n in front)


def test_unknown_history_name_raises(tmp_path, monkeypatch):
    hist = dict(_history())
    hist["no_such_query_xyz"] = (1, True)
    monkeypatch.setattr(registry, "_driver_history", lambda: hist)
    with pytest.raises(ValueError, match="no_such_query_xyz"):
        registry.all_specs()


def test_malformed_correctness_file_is_ignored(tmp_path):
    # _driver_history must tolerate junk files without crashing the entry point
    (tmp_path / "CORRECTNESS_r99.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q": {"rows_match": True, "hash_match": True, "err": None}})
    )
    hist = registry._driver_history(tmp_path)
    assert hist == {"q": (1, True)}


def test_later_round_supersedes_earlier(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q": {"rows_match": True, "hash_match": True, "err": None}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q": {"rows_match": True, "hash_match": False, "err": None}})
    )
    assert registry._driver_history(tmp_path) == {"q": (2, False)}


def test_rows_only_check_counts_as_green(tmp_path):
    # rows-only rows (no oracle) lack hash_match — absence is not a failure
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q": {"rows_match": True, "err": None}})
    )
    assert registry._driver_history(tmp_path) == {"q": (1, True)}


def test_never_checked_queue_is_longest_waiting_first():
    """Fairness of the never-checked queue: queries that predate this
    round (since == 0) must all sort before this round's additions
    (since == 3) — a new registration may not displace a query that
    has already waited a round for its driver row."""
    specs = registry.all_specs()
    hist = registry._driver_history()
    never = [n for n in specs if n not in hist]
    seen_new = False
    for n in never:
        if registry._REGISTRY[n].since > 0:
            seen_new = True
        else:
            assert not seen_new, (
                f"pre-existing never-checked query {n} sorted after a "
                "newer registration"
            )


def test_zero_rows_only_queries():
    """Every registered query carries a DuckDB oracle — the driver's
    strong (value-hash) gate applies to the whole surface. A rows-only
    registration is a deliberate exception that must be argued here,
    not an accident."""
    from flink_connectors_spark.registry import all_specs

    missing = [n for n, s in all_specs().items() if s.oracle is None]
    assert missing == [], f"queries without oracles: {missing}"


def test_post_backlog_window_degenerates_to_stalest_first_recheck(monkeypatch):
    """Once the round-5 window lands (the 49 never-checked + 1 stale,
    all green), every query has a driver row and the rotation must
    degenerate to a pure stalest-first regression re-check: the r6
    window is exactly the 50 least-recently-verified queries, which
    puts the r1-green TPC-H rows (unchecked since round 1) at the
    front of the line."""
    names = list(registry.all_specs())
    hist = dict(registry._driver_history())
    simulated_r5 = names[:50]
    for n in simulated_r5:
        hist[n] = (5, True)
    assert all(n in hist for n in names), "backlog must be cleared"

    monkeypatch.setattr(registry, "_driver_history", lambda: hist)
    order = list(registry.all_specs())

    # no red, no never-checked => ascending latest-green-round order
    rounds = [hist[n][0] for n in order]
    assert rounds == sorted(rounds)

    front = order[:50]
    # window takes only queries at least as stale as anything outside it
    worst_in = max(hist[n][0] for n in front)
    best_out = min(hist[n][0] for n in order[50:])
    assert worst_in <= best_out

    # the r1 block (stalest: TPC-H shapes et al.) fits in and fronts it
    r1_block = [n for n in names if hist[n][0] == 1]
    assert 0 < len(r1_block) <= 50
    assert set(r1_block) <= set(front)
    tpch = [n for n in r1_block if n[0] == "q" and n[1].isdigit()]
    assert tpch, "r1 TPC-H greens must be due for re-check in the r6 window"
