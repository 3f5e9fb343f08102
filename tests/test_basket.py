"""Invariants for the market-basket / attribution module beyond the
oracle equality already enforced by test_catalog: the a-priori algebra
(support bounds, confidence/lift identities) and attribution mass
conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.plans.queries_basket import _MINSUP_ITEM, _MINSUP_PAIR
from tests.conftest import SF_DIR

load_all()


def test_assoc_rules_apriori_algebra(spark):
    rows = QUERIES["assoc_rules"](spark, SF_DIR).collect()
    for r in rows:
        assert r.p1 < r.p2
        assert r.pair_n >= _MINSUP_PAIR
        assert r.n1 >= _MINSUP_ITEM and r.n2 >= _MINSUP_ITEM
        # pair support can never exceed either item's support
        assert r.pair_n <= min(r.n1, r.n2)
        assert 0.0 < r.confidence <= 1.0
        assert abs(r.confidence - r.pair_n / r.n1) < 1e-12
        assert r.lift > 0.0


def test_attribution_conserves_purchases(spark):
    from hadoop_spark.sources.tables import load_table

    out = QUERIES["attribution_touch"](spark, SF_DIR)
    attributed = out.agg(F.sum("purchases")).collect()[0][0]
    purchases = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert attributed == purchases


def test_benford_probabilities_sum_to_one(spark):
    rows = QUERIES["benford_digits"](spark, SF_DIR).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.p_obs for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r.chi2_term >= 0.0


def test_degree_distribution_counts_nodes_once(spark):
    rows = QUERIES["degree_distribution"](spark, SF_DIR).collect()
    assert all(r.deg >= 1 for r in rows)
    # handshake: sum(deg * n_nodes) = 2 * |edges|, hence even
    assert sum(r.deg * r.n_nodes for r in rows) % 2 == 0


def test_assoc_rules_broadcasts_dimensions(spark):
    """The frequent-item prune and the rule-closing joins must broadcast —
    the fact stream never shuffles against a dimension."""
    spark.catalog.clearCache()
    df = QUERIES["assoc_rules"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_temperature_mix_upsamples_small_sources(spark):
    """The point of T=2 mixing: smaller sources keep a HIGHER fraction of
    their docs than larger sources (monotone rate inversion), and no
    target exceeds what sqrt-weighting allocates."""
    rows = QUERIES["temperature_mix"](spark, SF_DIR).collect()
    assert rows
    by_size = sorted(rows, key=lambda r: r.n_total)
    rates = [r.n_target / r.n_total for r in by_size]
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total


def test_label_propagation_labels_are_min_members(spark):
    """After any number of min-label rounds each community's label is the
    minimum id among its members, and communities partition the nodes."""
    rows = QUERIES["label_propagation"](spark, SF_DIR).collect()
    seen_nodes = sum(r.n_nodes for r in rows)
    assert len({r.community for r in rows}) == len(rows)
    for r in rows:
        # label <= every member id => label * n <= sum of member ids
        assert r.community * r.n_nodes <= r.member_ids_sum
    assert seen_nodes > 0
