"""Semantic invariants for the data-prep queries, checked independently of
the DuckDB oracle (the oracle proves engine agreement; these prove the
OPERATOR's contract: dense grids, correct carry-forward, threshold math)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR

load_all()


def test_gap_fill_grid_is_dense_and_carries_forward(spark):
    rows = QUERIES["gap_fill_events"](spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user, "no output"
    for user, urows in by_user.items():
        urows.sort(key=lambda r: r.d)
        days = [r.d for r in urows]
        # dense: every day between min and max appears exactly once
        assert days == list(range(days[0], days[-1] + 1)), user
        # endpoints are observed (the grid spans observed days only)
        assert urows[0].observed and urows[-1].observed, user
        # forward fill: unobserved days carry the last observed value
        last = None
        for r in urows:
            if r.observed:
                last = r.filled_value
            else:
                assert r.filled_value == last, (user, r.d)


def test_gap_fill_observed_days_match_raw_events(spark):
    out = QUERIES["gap_fill_events"](spark, SF_DIR)
    observed = (
        out.filter(F.col("observed")).groupBy("user_id").count().collect()
    )
    raw = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("bigint").alias("d"),
        )
        .distinct()
        .groupBy("user_id")
        .count()
        .collect()
    )
    assert sorted(map(tuple, observed)) == sorted(map(tuple, raw))


def test_heavy_hitters_threshold_exact(spark):
    got = {r.o_custkey: r.cnt for r in QUERIES["heavy_hitters"](spark, SF_DIR).collect()}
    counts = {
        r.o_custkey: r["count"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .count()
        .collect()
    }
    nkeys, total = len(counts), sum(counts.values())
    want = {k: c for k, c in counts.items() if c * nkeys > 2 * total}
    assert got == want
