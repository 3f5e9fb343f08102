"""Invariant tests for the round-4b operators — properties that must hold
by construction, independent of the oracle hash checks:

- quantile_normalize: the mapping is monotone per group and maps into the
  global bucket domain;
- rank_profile: percent_rank/cume_dist bounds and monotonicity;
- snapshot_diff: the four statuses partition the key universe |A ∪ B|;
- bloom_filter_join: result equals the plain join (no false negatives,
  false positives removed by the verify join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.plans import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_quantile_normalize_monotone_and_in_domain(spark):
    out = QUERIES["quantile_normalize"](spark, SF_DIR)
    rows = out.collect()
    by_group: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        assert r.mapped_vb is not None
        by_group.setdefault(r.event_type, []).append((r.vb, r.mapped_vb))
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    domain = {
        r[0]
        for r in src.select(
            F.round(F.col("value") * 100).cast("bigint")
        ).distinct().collect()
    }
    for g, pairs in by_group.items():
        pairs.sort()
        mapped = [m for _, m in pairs]
        assert mapped == sorted(mapped), f"non-monotone mapping for {g}"
        assert set(mapped) <= domain, f"mapped bucket outside global domain for {g}"


def test_rank_profile_bounds_and_monotonicity(spark):
    out = QUERIES["rank_profile"](spark, SF_DIR).collect()
    by_group: dict[str, list[tuple[int, float, float]]] = {}
    for r in out:
        assert 0.0 <= r.pr <= 1.0
        assert 0.0 < r.cd <= 1.0
        by_group.setdefault(r.o_orderpriority, []).append((r.bucket, r.pr, r.cd))
    for g, triples in by_group.items():
        triples.sort()
        prs = [p for _, p, _ in triples]
        cds = [c for _, _, c in triples]
        assert prs == sorted(prs), g
        assert cds == sorted(cds), g


def test_snapshot_diff_partitions_key_universe(spark):
    out = {r.status: r.n for r in QUERIES["snapshot_diff"](spark, SF_DIR).collect()}
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # statuses partition |A ∪ B|: every A key is same/changed/removed;
    # added keys are B-only (re-keyed inserts, disjoint by construction)
    assert out.get("same", 0) + out.get("changed", 0) + out.get("removed", 0) == n_events
    assert out.get("added", 0) > 0 and out.get("removed", 0) > 0


def test_bloom_filter_join_equals_plain_join(spark):
    got = {
        tuple(r)
        for r in QUERIES["bloom_filter_join"](spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    from hadoop_spark.functions.numeric import dsum

    want = {
        tuple(r)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .collect()
    }
    assert got == want


def test_concurrent_sessions_user_bound(spark):
    out = QUERIES["concurrent_sessions"](spark, SF_DIR).collect()
    assert out, "no coverage rows"
    for r in out:
        assert 1 <= r.n_users <= r.n_sessions


def test_hll_estimate_within_sketch_error(spark):
    """m=64 HLL has ~13% standard error. The query's contract fields are
    the exact sketch state (register-hit count + exact harmonic
    numerator); the CLIENT-side small-range correction (LinearCounting
    when zero registers remain, the standard HLL recipe — ln() is applied
    here, outside the cross-engine contract) must land within 3σ (±40%)
    of the exact distinct count."""
    import math

    m = 64
    rows = QUERIES["hll_sketch"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        n = exact[r.event_type]
        est = r.est_distinct
        zeros = m - r.n_regs_hit
        if est <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        assert abs(est - n) / n < 0.40, (r.event_type, est, n)


def test_user_growth_accumulates_to_total(spark):
    rows = sorted(
        QUERIES["user_growth"](spark, SF_DIR).collect(), key=lambda r: r.day
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = (
        ev.filter(F.col("user_id").isNotNull()).select("user_id").distinct().count()
    )
    running = 0
    for r in rows:
        running += r.new_users
        assert r.cum_users == running
    assert running == total


def test_login_streaks_cover_all_users(spark):
    rows = QUERIES["login_streaks"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = (
        ev.filter(F.col("user_id").isNotNull()).select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == total
    assert all(r.streak_days >= 1 for r in rows)


def test_activity_heatmap_accounts_every_event(spark):
    rows = QUERIES["activity_heatmap"](spark, SF_DIR).collect()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n for r in rows) == n_events
    assert all(0 <= r.dow <= 6 and 0 <= r.hod <= 23 for r in rows)


def test_asof_forward_matches_earliest_following(spark):
    """Forward as-of must pick the SMALLEST right time >= left time."""
    from hadoop_spark.operators.join import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5)], "k int, t bigint"
    )
    right = spark.createDataFrame(
        [(1, 12, "a"), (1, 25, "b"), (1, 20, "eq"), (2, 4, "z")],
        "k int, t bigint, v string",
    )
    got = {
        (r.k, r.t): r.v
        for r in asof_join_forward(
            left, right, key="k", time_col="t", value_cols=["v"]
        ).collect()
    }
    # ties inclusive: left t=20 matches right t=20
    assert got == {(1, 10): "a", (1, 20): "eq", (1, 30): None, (2, 5): None}


def test_asof_tolerance_nulls_stale_matches(spark):
    from hadoop_spark.operators.join import asof_join_tolerance

    left = spark.createDataFrame([(1, 100), (1, 200)], "k int, t bigint")
    right = spark.createDataFrame(
        [(1, 95, "fresh"), (1, 90, "old")], "k int, t bigint, v string"
    )
    got = {
        (r.k, r.t): r.v
        for r in asof_join_tolerance(
            left, right, key="k", time_col="t", tolerance=10, value_cols=["v"]
        ).collect()
    }
    # t=100 matches 95 (distance 5 ≤ 10); t=200's latest match 95 is 105 away → NULL
    assert got == {(1, 100): "fresh", (1, 200): None}


def test_kmv_set_algebra_estimates_near_exact(spark):
    """K=64 KMV has ~12% relative error; union and intersection estimates
    must land within 3σ of the exact counts carried in the same row."""
    r = QUERIES["kmv_set_algebra"](spark, SF_DIR).collect()[0]
    exact_union = r.exact_a + r.exact_b - r.exact_inter
    assert abs(r.est_union - exact_union) / max(1, exact_union) < 0.4, r
    assert abs(r.est_inter - r.exact_inter) / max(1, r.exact_inter) < 0.6, r
