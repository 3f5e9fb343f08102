"""The driver's correctness run checks the FIRST 50 `queries()` entries.

Round 11 (optimization round 2/2) executes the second post-ledger
maintenance window: the 25 _R10_CARRYOVER rows displaced from the r10
window, the 7 r10-changed queries the r10 ADVICE found missing from both
the r10 window and the carryover (_R11_ADVICE_OWED), every query changed
in r11 (_R11_CHANGED), and rotation restart from the r1 ledger rows. This
test freezes the composition so a later addition to an early-imported
module cannot silently shift queries out of the window before their
CORRECTNESS row lands, and pins the policy's split.
"""

from __future__ import annotations

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.plans.catalog import (
    _R10_CARRYOVER,
    _R11_ADVICE_OWED,
    _R11_CHANGED,
    _R11_ROTATION,
    _R11_WINDOW,
)

load_all()


def test_driver_window_is_the_planned_composition():
    assert len(_R11_WINDOW) == 50
    assert list(QUERIES)[:50] == _R11_WINDOW


def test_window_queries_all_have_oracles():
    from hadoop_spark.plans import ORACLES

    assert [n for n in _R11_WINDOW if n not in ORACLES] == []


def test_policy_split_is_disjoint_and_mandatory_rows_made_the_cut():
    parts = [_R10_CARRYOVER, _R11_ADVICE_OWED, _R11_CHANGED]
    names = [n for p in parts for n in p]
    assert len(names) == len(set(names))  # no mandatory query counted twice
    # every mandatory row must actually land in the 50-slot window — only
    # rotation fill may be truncated
    assert [n for n in names if n not in _R11_WINDOW] == []
    # rotation rows are real catalog content
    assert [n for n in _R11_ROTATION if n not in QUERIES] == []


def _prior_green() -> set[str]:
    # Every name with a GREEN driver row in r1-r10 (red rows don't count).
    import json
    import pathlib

    green: set[str] = set()
    for f in sorted(
        pathlib.Path(__file__).parent.parent.glob("CORRECTNESS_r[0-9][0-9].json")
    ) + sorted(pathlib.Path(__file__).parent.parent.glob("CORRECTNESS_r[1-9].json")):
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
    assert sorted(set(_R11_WINDOW) - green) == []
