"""Plan-shape measurement shared by scripts/plan_audit.py (the manual
sweep) and tests/test_plan_audit_gate.py (the commit-time gate, r7
verdict optional #6).

The measured quantities and their two documented false-positive classes
(InMemoryRelation reprints; AQE runtime stage reuse) are described in
scripts/plan_audit.py's docstring — this module only extracts numbers
from a printed physical plan.
"""

from __future__ import annotations

import re
from collections import Counter


def build_plan(spark, sf_dir: str, name: str) -> str:
    """Printed initial physical plan of a registered catalog query.

    NOTE: building the DataFrame executes eager side effects for the
    io-fixture queries (parquet/Derby/xml writes, localCheckpoints) —
    see the caveat in scripts/plan_audit.py.
    """
    from hadoop_spark.plans import QUERIES

    # Earlier queries' shared() persists swap subtrees for
    # InMemoryRelation and change the printed plan; grade the cold shape.
    spark.catalog.clearCache()
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def measure(plan: str) -> dict:
    """Counters over one printed plan. Exchange dedupe is by plan_id —
    a cached subplan is printed once per reference but executes once.
    Any SHUFFLE partitioning scheme counts (RoundRobinPartitioning from
    repartition(n) included — r7 ADVICE; the original
    hash/range/single list undercounted repartition-heavy plans). The
    lookbehind excludes BroadcastExchange — broadcasts are not
    shuffles, and counting them both skewed round-over-round
    comparisons and made broadcast-heavy plans trip the exchange
    ceiling (r8 review finding)."""
    uniq_ex = len(
        set(re.findall(r"(?<![A-Za-z])Exchange \w+.*?\[plan_id=(\d+)\]", plan))
    )
    scans = Counter(
        re.findall(
            r"FileScan parquet[^\n]*?(\w+)\.parquet[^\n]*?"
            r"ReadSchema: (struct<[^>]*>)",
            plan,
        )
    )
    return {
        "unique_exchanges": uniq_ex,
        "imts": plan.count("InMemoryTableScan"),
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "repeated_scans": {k: v for k, v in scans.items() if v >= 3},
    }
