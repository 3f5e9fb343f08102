"""Mathematical invariants of the round-4c statistical/graph operators —
properties the oracle hash can't articulate but a reviewer would check
first: estimator monotonicity, normalization, and value ranges."""

from __future__ import annotations

import math

from hadoop_spark.plans import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_kaplan_meier_survival_is_monotone_nonincreasing(spark):
    rows = QUERIES["kaplan_meier"](spark, SF_DIR).orderBy("dur").collect()
    assert rows, "empty KM curve"
    last = 1.0 + 1e-12
    for r in rows:
        assert 0.0 <= r.survival <= last + 1e-12, r
        last = r.survival
    # at-risk counts shrink as duration grows
    ns = [r.n_at_risk for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:])), ns[:10]


def test_pca_component_is_unit_norm(spark):
    rows = QUERIES["pca_power_iteration"](spark, SF_DIR).collect()
    assert len(rows) == 64
    norm = math.sqrt(sum(r.component**2 for r in rows))
    assert abs(norm - 1.0) < 1e-6, norm
    assert all(r.eigenvalue_proxy > 0 for r in rows)


def test_assortativity_is_a_correlation(spark):
    row = QUERIES["degree_assortativity"](spark, SF_DIR).collect()[0]
    assert -1.0 <= row.assortativity <= 1.0, row
    assert row.n_edges > 0 and row.n_nodes > 0


def test_clustering_coefficient_in_unit_interval(spark):
    rows = QUERIES["clustering_coefficient"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.cc <= 1.0, r
        # a node's triangles cannot exceed its neighbor-pair count
        assert r.n_triangles <= r.d * (r.d - 1) // 2, r


def test_rfm_scores_cover_expected_range(spark):
    rows = QUERIES["rfm_segmentation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
    # quartile cuts must actually split customers: every score level occupied
    assert {r.r_score for r in rows} == {1, 2, 3, 4}


def test_simpson_diversity_bounds(spark):
    rows = QUERIES["event_type_diversity"](spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 <= r.simpson_diversity < 1.0, r


def test_incremental_merge_equals_full_recompute(spark):
    """The IVM merge law asserted directly Spark-vs-Spark (the oracle
    already pins it against DuckDB's full recompute)."""
    from pyspark.sql import functions as F

    from hadoop_spark.sources.tables import load_table

    merged = {
        r.o_orderpriority: (r.n_orders, r.revenue_cents)
        for r in QUERIES["incremental_agg_merge"](spark, SF_DIR).collect()
    }
    full = {
        r.o_orderpriority: (r.n_orders, r.revenue_cents)
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .collect()
    }
    assert merged == full


def test_link_prediction_excludes_existing_edges(spark):
    from pyspark.sql import functions as F

    from hadoop_spark.operators.graph import cooccurrence_pairs
    from hadoop_spark.sources.tables import load_table

    preds = QUERIES["link_prediction_cn"](spark, SF_DIR).collect()
    assert preds
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    edges = {
        (r.u, r.v)
        for r in cooccurrence_pairs(li, "l_orderkey", "l_partkey").collect()
    }
    for p in preds:
        a, b = sorted((p.part_a, p.part_b))
        assert (a, b) not in edges, p
        assert p.common_neighbors >= 1


def test_civil_date_algorithm_matches_native_calendar(ddb):
    """date_dimension's Hinnant civil-from-days integer arithmetic vs
    DuckDB's native proleptic-Gregorian calendar over 109 years: the
    query's TZ-immunity comes from sharing the algorithm on both engines,
    so this independent reference check is what rules out a shared bug."""
    r = ddb.sql("""
WITH days AS (SELECT unnest(generate_series(0, 40000)) AS day),
c1 AS (SELECT day, day + 719468 AS z FROM days),
c2 AS (SELECT day, z, z // 146097 AS era, z - (z // 146097) * 146097 AS doe FROM c1),
c3 AS (SELECT day, era, doe, (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365 AS yoe FROM c2),
c4 AS (SELECT day, era, yoe, doe - (365 * yoe + yoe // 4 - yoe // 100) AS doy FROM c3),
c5 AS (SELECT day, era, yoe, doy, (5 * doy + 2) // 153 AS mp FROM c4),
c6 AS (SELECT day, yoe + era * 400 AS y0, doy - (153 * mp + 2) // 5 + 1 AS dom,
       CASE WHEN mp < 10 THEN mp + 3 ELSE mp - 9 END AS m FROM c5),
alg AS (SELECT day, y0 + CASE WHEN m <= 2 THEN 1 ELSE 0 END AS yr, m, dom FROM c6),
ref AS (SELECT day, EXTRACT(year FROM DATE '1970-01-01' + CAST(day AS INT)) yr,
        EXTRACT(month FROM DATE '1970-01-01' + CAST(day AS INT)) m,
        EXTRACT(day FROM DATE '1970-01-01' + CAST(day AS INT)) dom FROM days)
SELECT count(*) FROM alg JOIN ref USING (day)
WHERE alg.yr <> ref.yr OR alg.m <> ref.m OR alg.dom <> ref.dom
""").fetchone()
    assert r[0] == 0


def test_lorenz_curve_is_monotone_and_convex_ordered(spark):
    rows = QUERIES["lorenz_curve"](spark, SF_DIR).orderBy("bucket").collect()
    assert rows
    last_c, last_r = 0.0, 0.0
    for r in rows:
        assert r.cust_share >= last_c - 1e-12
        assert r.revenue_share >= last_r - 1e-12
        # Lorenz property: poorer prefix holds no more than its headcount share
        assert r.revenue_share <= r.cust_share + 1e-9, r
        last_c, last_r = r.cust_share, r.revenue_share
    assert abs(last_c - 1.0) < 1e-9 and abs(last_r - 1.0) < 1e-9


def test_graph_modularity_total_in_range(spark):
    rows = QUERIES["graph_modularity"](spark, SF_DIR).collect()
    q = sum(r.q_contrib for r in rows)
    assert -1.0 <= q <= 1.0, q


def test_subspace_energy_shares_sum_to_one(spark):
    rows = QUERIES["subspace_energy"](spark, SF_DIR).collect()
    assert len(rows) == 8
    s = sum(r.energy_share for r in rows)
    assert abs(s - 1.0) < 1e-9, s
    assert all(r.energy > 0 for r in rows)


def test_anova_sums_of_squares_nonnegative(spark):
    row = QUERIES["anova_oneway"](spark, SF_DIR).collect()[0]
    assert row.ssb >= 0 and row.ssw > 0 and row.f_stat > 0
    assert row.k == 5 and row.n > 0
