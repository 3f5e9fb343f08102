"""The driver's correctness run checks the FIRST 50 `queries()` entries.

Round 10 executes the first post-ledger maintenance window (the rotation
ledger closed in r9): the window is ALL-mandatory — the 2 owed
re-verifications, the 48 highest-priority queries changed by the r10
quantization audit / operators-pipe change — and the 12 displaced changed
queries are recorded as _R10_CARRYOVER owed at the top of r11. This test
freezes the composition so a later addition to an early-imported module
cannot silently shift queries out of the window before their CORRECTNESS
row lands, and pins the policy's three-part split.
"""

from __future__ import annotations

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.plans.catalog import (
    _R10_AUDIT,
    _R10_CARRYOVER,
    _R10_OWED,
    _R10_PIPE,
    _R10_WINDOW,
)

load_all()


def test_driver_window_is_the_planned_composition():
    assert len(_R10_WINDOW) == 50
    assert list(QUERIES)[:50] == _R10_WINDOW


def test_window_queries_all_have_oracles():
    from hadoop_spark.plans import ORACLES

    assert [n for n in _R10_WINDOW if n not in ORACLES] == []


def test_policy_split_is_disjoint_and_complete():
    parts = [_R10_OWED, _R10_AUDIT, _R10_PIPE, _R10_CARRYOVER]
    names = [n for p in parts for n in p]
    assert len(names) == len(set(names))  # no query counted twice
    assert set(_R10_WINDOW) == set(_R10_OWED + _R10_AUDIT + _R10_PIPE)
    # carryover is real catalog content, owed next round
    assert [n for n in _R10_CARRYOVER if n not in QUERIES] == []


def _prior_green() -> set[str]:
    # Every name with a GREEN driver row in r1-r9 (red rows don't count).
    import json
    import pathlib

    green: set[str] = set()
    for f in sorted(
        pathlib.Path(__file__).parent.parent.glob("CORRECTNESS_r0[1-9].json")
    ):
        for name, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            if row.get("err") is None and all(
                row.get(k, False)
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                green.add(name)
    assert green, "expected prior CORRECTNESS files in repo root"
    return green


def test_every_window_query_was_previously_green():
    # Post-ledger invariant: the ledger is closed, so every window row is
    # a re-verification of a query that has held a green driver row —
    # a name missing from the prior-green set would mean the ledger
    # regressed (or a rename slipped in unnoticed).
    green = _prior_green()
    assert sorted(set(_R10_WINDOW) - green) == []
    assert sorted(set(_R10_CARRYOVER) - green) == []
