"""The driver's correctness run checks the FIRST 50 `queries()` entries.
Round 5 rotates 50 never-driver-checked queries into that window per the
COVERAGE.md ledger rows marked "r5 scheduled"; this
test freezes the composition so a later addition to an early-imported
module cannot silently shift queries out of the window before their
CORRECTNESS row lands."""

from __future__ import annotations

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.plans.catalog import _R5_WINDOW

load_all()


def test_driver_window_is_the_planned_rotation():
    assert list(QUERIES)[:50] == _R5_WINDOW


def test_window_queries_all_have_oracles():
    from hadoop_spark.plans import ORACLES

    assert [n for n in _R5_WINDOW if n not in ORACLES] == []
