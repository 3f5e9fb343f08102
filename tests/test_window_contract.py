"""The driver's correctness run checks the FIRST 50 `queries()` entries.
Round 9 rotates the final 41 never-driver-checked queries into that window
(closing the rotation ledger — COVERAGE.md), debuts the two r9 catalog
additions, and spends the last 7 slots on deliberate re-verifications of
long-green high-value rows (r8 verdict task #1). This test freezes the
composition so a later addition to an early-imported module cannot
silently shift queries out of the window before their CORRECTNESS row
lands."""

from __future__ import annotations

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.plans.catalog import (
    _R9_ADDITIONS,
    _R9_REVERIFY,
    _R9_SCHEDULED,
    _R9_WINDOW,
)

load_all()


def test_driver_window_is_the_planned_rotation():
    assert len(_R9_WINDOW) == 50
    assert list(QUERIES)[:50] == _R9_WINDOW


def test_window_queries_all_have_oracles():
    from hadoop_spark.plans import ORACLES

    assert [n for n in _R9_WINDOW if n not in ORACLES] == []


def _prior_green() -> set[str]:
    # Every name with a GREEN driver row in r1-r8. Red rows do NOT count:
    # a query that failed in its window round is exactly the one the
    # rotation must re-attempt.
    import json
    import pathlib

    green: set[str] = set()
    for f in sorted(pathlib.Path(__file__).parent.parent.glob("CORRECTNESS_r0[1-8].json")):
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


def test_scheduled_rows_are_first_time_verifications():
    # The 41 ledger rows + 2 additions must be new to the driver — a
    # repeat there wastes the slot that closes the ledger.
    green = _prior_green()
    assert sorted(set(_R9_SCHEDULED) & green) == []
    assert sorted(set(_R9_ADDITIONS) & green) == []


def test_reverify_rows_are_known_green_repeats():
    # The 7 re-verification slots are the opposite: each MUST already be
    # driver-green (that's what makes re-verifying it pure signal).
    green = _prior_green()
    assert sorted(set(_R9_REVERIFY) - green) == []
