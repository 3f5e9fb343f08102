"""Property tests for the scalable order-statistics operators: the
histogram rank-selection median/quantiles must agree with the sequential
definitions on arbitrary data, at any partitioning."""

from __future__ import annotations

import math
import random

from hadoop_spark.operators.stats import group_median, group_quantiles


def _median_ref(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    lo = s[(n + 1) // 2 - 1]
    hi = s[n // 2]
    return (lo + hi) / 2.0


def test_group_median_matches_reference(spark):
    rng = random.Random(42)
    rows = []
    data: dict[str, list[float]] = {}
    for g in ["a", "b", "c", "d"]:
        n = rng.randrange(1, 40)
        # duplicates on purpose: the histogram path must weight them
        xs = [round(rng.uniform(-5, 5), 1) for _ in range(n)]
        data[g] = xs
        rows += [(g, x) for x in xs]
    df = spark.createDataFrame(rows, "g string, v double").repartition(7)
    got = {
        r["g"]: r["med"]
        for r in group_median(df, "g", "v", "med").collect()
    }
    for g, xs in data.items():
        assert math.isclose(got[g], _median_ref(xs), rel_tol=0, abs_tol=0), (
            g,
            got[g],
            _median_ref(xs),
        )


def test_group_quantiles_nearest_rank(spark):
    rng = random.Random(7)
    rows = []
    data: dict[str, list[float]] = {}
    for g in ["x", "y"]:
        n = rng.randrange(5, 60)
        xs = [round(rng.uniform(0, 100), 2) for _ in range(n)]
        data[g] = xs
        rows += [(g, x) for x in xs]
    df = spark.createDataFrame(rows, "g string, v double").repartition(5)
    qs = {"p05": 0.05, "p50": 0.5, "p95": 0.95}
    got = {r["g"]: r for r in group_quantiles(df, "g", "v", qs).collect()}
    for g, xs in data.items():
        s = sorted(xs)
        n = len(s)
        for name, q in qs.items():
            expect = s[max(math.ceil(q * n), 1) - 1]
            assert got[g][name] == expect, (g, name, got[g][name], expect)


def test_group_median_partitioning_invariant(spark):
    rows = [("k", float(v)) for v in [3, 1, 4, 1, 5, 9, 2, 6]]
    outs = set()
    for p in (1, 3, 8):
        df = spark.createDataFrame(rows, "g string, v double").repartition(p)
        outs.add(group_median(df, "g", "v", "med").collect()[0]["med"])
    assert len(outs) == 1, outs
