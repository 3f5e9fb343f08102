"""Named query catalog — the driver/judge contract.

Every operator claimed in SURVEY.md §2 registers here twice: a Spark builder
``(spark, sf_dir) -> DataFrame`` in ``QUERIES`` and (when SQL-expressible) an
equivalent ANSI-SQL string for the DuckDB oracle in ``ORACLES``. The driver
runs both at sf0.01 and compares row count + schema + order-insensitive value
hash, so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are computed via per-row DOUBLE arithmetic
  (IEEE-exact, engine-independent) quantized with a cast to DECIMAL before
  SUM (exact integer arithmetic), then cast back to DOUBLE — bit-identical
  across Spark and DuckDB with no rounding heuristics;
- anything order-sensitive (top-k, ranks) ties-breaks on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL.

    Queries without an oracle get the driver's weaker rows-only check — keep
    those to genuinely non-SQL-expressible ops (streaming state, subprocess
    pipes).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness run checks the FIRST 50 registry entries per
# round, so the window is rotated each round until every query has a green
# driver row (rotation ledger: COVERAGE.md). Round 7's window, per the r6
# verdict's next-round task #1: the four r6-added queries FIRST (they give
# DBInputFormat / DBOutputFormat / DBCountPageView / NLineInputFormat /
# BinaryPartitioner their first driver rows — the verdict names them as
# belonging in this window), then the first 46 of the "r7 scheduled
# (r6 overflow)" ledger rows in ledger order. The 89-row remainder
# (33 overflow rows + the 56 r4d rows) is re-marked "r8 scheduled".
# No repeats of any r1–r6 driver-green row. All 50 were contract-green in
# the judge's full strict re-run AND in the r6 ×30 probe-ahead sweep.
#
# ROUND-8 PLAN (next session: replace _R7_WINDOW with _R8_WINDOW): take
# the FIRST 50 of the ledger rows marked "r8 scheduled" in COVERAGE.md
# (the 33-row r7 overflow first, then the r4d rows); re-mark the 39-row
# remainder "r9 scheduled". Update tests/test_window_contract.py and the
# ledger in the same commit.
_R7_WINDOW = [
    "db_pageview_roundtrip",
    "composite_join_expr",
    "nline_fanout",
    "binary_partition_slice",
    "stream_heavy_hitters",
    "missing_days",
    "ab_split_metrics",
    "asof_forward_events",
    "asof_tolerance_events",
    "kmv_set_algebra",
    "weighted_sssp",
    "rolling_active_users",
    "order_cycle_time",
    "seasonal_baseline",
    "daily_metric_corr",
    "zipf_profile",
    "market_concentration",
    "hourly_burst_flags",
    "kcore_peel",
    "curriculum_tiers",
    "token_budget_allocator",
    "relational_division",
    "unpivot_metrics",
    "rfm_segmentation",
    "mean_shift_detect",
    "autocorrelation",
    "rolling_median",
    "trigram_search",
    "degree_assortativity",
    "clustering_coefficient",
    "event_type_diversity",
    "incremental_agg_merge",
    "table_fingerprint",
    "order_backlog_curve",
    "supplier_fill_rate",
    "embedding_norm_outliers",
    "feature_hashing",
    "label_balance_weights",
    "duplication_profile",
    "year_over_year_growth",
    "reorder_intervals",
    "label_top_terms",
    "semantic_keep_best",
    "pca_power_iteration",
    "link_prediction_cn",
    "kaplan_meier",
    "ridge_regression_2f",
    "dedup_prefix",
    "price_index",
    "topn_with_other",
]


def load_all() -> None:
    """Import every query module (side effect: registry population)."""
    global _LOADED
    if _LOADED:
        return
    from hadoop_spark.plans import (  # noqa: F401
        queries_tpch2,
        queries_sort,
        queries_join,
        queries_similarity,
        queries_text,
        queries_cluster,
        queries_stream,
        queries_mlprep,
        queries_workloads,
        queries_agg,
        queries_core,
        queries_dedup,
        queries_io,
        queries_tpch,
        queries_lm,
        queries_graph,
        queries_stats,
        queries_link,
        queries_basket,
    )

    # Deterministic window rotation: pull this round's 50-query window to
    # the front of the registry (dict order IS driver order); everything
    # else keeps its registration order behind it.
    missing = [n for n in _R7_WINDOW if n not in QUERIES]
    if missing:  # a renamed query must fail loudly, not silently shrink
        raise RuntimeError(f"_R7_WINDOW names not registered: {missing}")
    front = {n: QUERIES[n] for n in _R7_WINDOW}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)

    _LOADED = True
