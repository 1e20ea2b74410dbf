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
    specs = registry.all_specs()
    names = list(specs)
    hist = _history()

    def phase(n):
        if n not in hist:
            return 1
        rnd, green = hist[n]
        if not green:
            return 0
        # green row older than the implementation's last material
        # change: provisional — re-check before plain stale greens
        return 2 if specs[n].changed > rnd else 3

    phases = [phase(n) for n in names]
    assert phases == sorted(phases), (
        "order must be red < unchecked < refactored-provisional < verified"
    )

    # each verified block is sorted by the round of its latest green row
    for ph in (2, 3):
        block = [n for n in names if phase(n) == ph]
        rounds = [hist[n][0] for n in block]
        assert rounds == sorted(rounds), "verified queries must be stalest-first"


def test_refactored_after_green_fronts_verified_tier():
    """A green query whose ``changed`` round post-dates its latest
    driver row is provisional (r10 verdict: the rotation cannot see
    code churn) and must precede every plain stale green."""
    specs = registry.all_specs()
    names = list(specs)
    hist = _history()
    provisional = [
        n for n in names
        if n in hist and hist[n][1] and specs[n].changed > hist[n][0]
    ]
    plain = [
        n for n in names
        if n in hist and hist[n][1] and specs[n].changed <= hist[n][0]
    ]
    if provisional and plain:
        last_prov = max(names.index(n) for n in provisional)
        first_plain = min(names.index(n) for n in plain)
        assert last_prov < first_plain
    # r11 state: the r10 artifact waves refactored 12 queries whose
    # driver green predates the refactor — they must sit in the window
    for n in ("similarity_topk_pq", "dedup_semantic_cluster",
              "embedding_centroid_drift"):
        if specs[n].changed > hist.get(n, (99, True))[0]:
            assert names.index(n) < 50


def test_front_50_maximizes_unchecked_coverage():
    """Every never-checked query must land in the driver's window before
    any already-verified query occupies a slot, and the verified slots
    that do make the window must be a stalest-first prefix: no verified
    query OUTSIDE the window may be staler than one inside it.

    (Round-5 lesson: asserting every window slot sits at THE single
    stalest round broke the moment the history held 48 round-1 rows —
    two round-2 rows then legitimately fill the window.)"""
    names = list(registry.all_specs())
    hist = _history()
    unchecked = [n for n in names if n not in hist]
    front = names[:50]
    if len(unchecked) <= 50:
        assert set(unchecked) <= set(front)
        # spare slots go to stalest verified queries (regression
        # re-checks) — refactored-provisional rows jump the staleness
        # queue by design, so compare within the plain-green tier only
        specs = registry.all_specs()

        def plain_green(n):
            return n in hist and hist[n][1] and specs[n].changed <= hist[n][0]

        spare = [n for n in front if plain_green(n)]
        outside = [n for n in names[50:] if plain_green(n)]
        if spare and outside:
            assert max(hist[n][0] for n in spare) <= min(
                hist[n][0] for n in outside
            ), "a verified query outside the window is staler than one inside"
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
    """Once every query has a (green) driver row the rotation must
    degenerate to a pure stalest-first regression re-check: each round's
    window is exactly the 50 least-recently-verified queries.

    The history here is FULLY SYNTHETIC — fabricated from the registry's
    name list alone, never from the on-disk CORRECTNESS_r*.json files —
    so the test stays valid no matter which round's artifacts the driver
    has landed in the working tree (round-5 lesson: a simulation seeded
    from the live history broke the moment CORRECTNESS_r05.json
    appeared)."""
    names = sorted(registry.all_specs())  # registration set, order-independent
    assert len(names) > 50
    # fabricate: 48 stalest rows, 2 next, the remainder spread over
    # three later rounds — all green, no never-checked, no red. Rounds
    # start at 101 so every green post-dates every ``changed`` mark
    # (a refactored-provisional row would legitimately jump the
    # staleness queue and is tested separately).
    hist = {}
    for i, n in enumerate(names):
        if i < 48:
            rnd = 101
        elif i < 50:
            rnd = 102
        else:
            rnd = 103 + (i % 3)
        hist[n] = (rnd, True)

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

    # the synthetic stalest block fits in and fronts the window
    r1_block = [n for n in names if hist[n][0] == 101]
    assert 0 < len(r1_block) <= 50
    assert set(order[: len(r1_block)]) == set(r1_block)


def test_census_counts_match_registry():
    """Census-drift tripwire (the r6/r7 verdicts both caught stale
    counts): the registered-query counts written in README.md and
    COVERAGE.md must equal the live registry size, so any
    registration without a doc refresh fails the suite instead of
    shipping a drifted census."""
    import re
    from pathlib import Path

    from flink_connectors_spark.registry import all_specs

    n = len(all_specs())
    root = Path(__file__).resolve().parent.parent
    readme = (root / "README.md").read_text()
    m = re.search(r"(\d+) named query plans", readme)
    assert m, "README.md census line missing"
    assert int(m.group(1)) == n, (
        f"README.md says {m.group(1)} query plans; registry has {n}"
    )
    coverage = (root / "COVERAGE.md").read_text()
    m = re.search(r"Census \(current, r\d+\): (\d+) registered", coverage)
    assert m, "COVERAGE.md current-census line missing"
    assert int(m.group(1)) == n, (
        f"COVERAGE.md says {m.group(1)} registered; registry has {n}"
    )


def test_bench_headliners_and_build_once_are_registered():
    """Bench-list tripwires: every HEADLINE name must be a registered
    query (a renamed query would silently vanish from the benchmark),
    and every BUILD_ONCE annotation must point at a headliner (the
    cold-column build-pricing documentation must describe rows that
    actually run)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    from flink_connectors_spark.registry import all_specs

    names = set(all_specs())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, f"HEADLINE names not in registry: {missing}"
    stray = [n for n in bench.BUILD_ONCE if n not in bench.HEADLINE]
    assert not stray, f"BUILD_ONCE names not in HEADLINE: {stray}"
