"""The driver's correctness run checks the FIRST 50 `queries()` entries.
Round 3 rotated the never-driver-checked r1/r2 queries into that window
(see COVERAGE.md); this test freezes the composition so a later addition
to an early-imported module cannot silently shift queries out of the
window before their CORRECTNESS row lands."""

from __future__ import annotations

from hadoop_spark.plans import QUERIES, load_all

load_all()

# tpch2 (16) + sorts (8) + joins (13) + similarity (4) + text head (9)
_ROUND3_WINDOW = [
    "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "total_order_sort", "total_order_rank", "secondary_sort",
    "topk_per_group", "global_topk", "keyfield_sort", "running_totals",
    "zorder_layout",
    "composite_join_inner", "composite_join_outer", "override_join",
    "broadcast_dim_join", "semi_join", "anti_join", "join_multiplicity",
    "salted_skew_join", "asof_join_events", "range_join_events",
    "cdc_merge", "bucketed_join_agg", "map_lookup_enrich",
    "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_materialized", "ann_recall",
    "lang_id", "quality_score", "token_count", "doc_fingerprint",
    "source_profile", "json_props_agg", "vocab_coverage", "pii_scrub",
    "word_cooccurrence",
]


def test_driver_window_is_the_planned_rotation():
    assert list(QUERIES)[:50] == _ROUND3_WINDOW
