"""The driver's correctness run checks the FIRST 50 `queries()` entries.
Round 8 rotates 50 never-driver-checked queries into that window per the
COVERAGE.md ledger rows marked "r8 window (this round)"; this
test freezes the composition so a later addition to an early-imported
module cannot silently shift queries out of the window before their
CORRECTNESS row lands."""

from __future__ import annotations

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.plans.catalog import _R8_WINDOW

load_all()


def test_driver_window_is_the_planned_rotation():
    assert list(QUERIES)[:50] == _R8_WINDOW


def test_window_queries_all_have_oracles():
    from hadoop_spark.plans import ORACLES

    assert [n for n in _R8_WINDOW if n not in ORACLES] == []


def test_window_has_no_repeats_of_prior_rounds():
    # Every name that already has a GREEN driver row (r1–r7) must stay out
    # of the r8 window — a repeat wastes a verification slot. Red rows do
    # NOT count: a query that failed in its window round is exactly the
    # one the rotation must re-attempt (r1's four red rows were re-greened
    # in r2/r3 this way).
    import json
    import pathlib

    green: set[str] = set()
    for f in sorted(pathlib.Path(__file__).parent.parent.glob("CORRECTNESS_r0[1-7].json")):
        for name, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            if row.get("err") is None and all(
                row.get(k, False)
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                green.add(name)
    assert green, "expected prior CORRECTNESS files in repo root"
    assert sorted(set(_R8_WINDOW) & green) == []
