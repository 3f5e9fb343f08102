"""Plan-shape audit over the whole catalog — the sweep that found the r7
union-loop re-planning disease (rich_club_coefficient 114 exchanges,
ab_quantile_effect 72) and the missing nb_langid exchange sharing.

For every registered query, build the DataFrame at the given sf and count
in the INITIAL physical plan:
- unique Exchange nodes (deduped by plan_id — a cached subplan is printed
  once per reference but executes once),
- CartesianProduct / BroadcastNestedLoopJoin (should be zero outside
  audited 1-row crossJoins),
- repeated FileScans of the same (table, ReadSchema) pair, split into
  cached (under InMemoryRelation) and raw occurrences.

READING THE OUTPUT — two false-positive classes, learned the hard way:
1. A persisted frame's InMemoryRelation reprints its ENTIRE child plan at
   every reference, so FileScan/Exchange counts inflate cosmetically.
   Cross-check `imts` (InMemoryTableScan count) before believing a number.
2. AQE's stage cache reuses identical shuffle map stages AT RUNTIME, with
   no trace in the initial plan — repeated identical subtrees are usually
   NOT repeated work. What IS repeated work: result-stage computation
   duplicated across union branches (aggregates feeding a per-branch
   select), which no cache catches. That is the shape worth fixing, and
   it shows up here as exchange counts far above the query's logical
   shuffle count (compare tests/test_plan_quality.py budgets).
Verdicts need an A/B timing on a QUIET machine (contended timings
reversed a conclusion once — see COVERAGE r7 notes); this audit is the
finder, not the judge.

CAVEAT — this audit EXECUTES REAL WORK for some queries (r7 ADVICE):
building the DataFrame runs each query's eager side effects — xml_records
writes its fixture and runs an eager localCheckpoint, the sorted-run /
roundtrip queries write parquet under .tmp/io, JDBC queries populate the
embedded Derby table. "Initial plan" means the plan of the RETURNED
frame; fixture construction ahead of it is not elided. Corollary: do
NOT run this concurrently with scripts/drive_contract.py at the same
sf — both write the same .tmp/io fixture paths and the commit-rename
protocols race (observed r8: a concurrent sweep failed
pyds_fixed_width_roundtrip's os.replace commit).

Usage: python scripts/plan_audit.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.plans.audit import build_plan, measure
from hadoop_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main() -> None:
    load_all()
    spark = get_session(app_name="plan_audit")
    rows, errors = [], {}
    for name in QUERIES:
        if ONLY and name not in ONLY:
            continue
        try:
            plan = build_plan(spark, SF, name)
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        m = measure(plan)
        rows.append(
            (
                name,
                m["unique_exchanges"],
                m["imts"],
                m["cartesian"],
                m["bnlj"],
                m["repeated_scans"],
            )
        )
    print(f"audited {len(rows)} plans, {len(errors)} errors")
    for name, err in errors.items():
        print(f"ERROR {name}: {err}")
    flagged = [r for r in rows if r[3] or r[4]]
    print(f"\n-- cartesian/BNLJ ({len(flagged)}) --")
    for name, _, _, nc, nb, _ in flagged:
        print(f"{name}: cartesian={nc} bnlj={nb}")
    print("\n-- >=3 identical (table, schema) scans — check imts first --")
    for name, uniq_ex, imts, _, _, dup in rows:
        if dup:
            print(f"{name} (imts={imts}): {dict(dup)}")
    print("\n-- most unique exchanges (top 25) --")
    for name, uniq_ex, imts, *_ in sorted(rows, key=lambda r: -r[1])[:25]:
        print(f"{name}: unique_exchanges={uniq_ex} imts={imts}")
    spark.stop()


if __name__ == "__main__":
    main()
