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
# driver row (rotation ledger: COVERAGE.md). Round 8's window, per the r7
# verdict's next-round task #1: the FIRST 50 of the ledger rows marked
# "r8 scheduled" — the 33-row r7 overflow first (`centroid_distances`
# through `token_position_profile`), then the first 17 r4d rows
# (`mann_kendall_trend` through `interval_overlap_join`). The 39-row
# remainder (r4d rows `recursive_order_chain` through `rank_stability`)
# is re-marked "r9 scheduled". No repeats of any r1-r7 driver-green row.
# All 50 were green in the judge's independent full strict 388/388 re-run
# at sf0.01 (r7 verdict) and in the r6 x30 probe-ahead sweep.
#
# ROUND-9 PLAN (next session: replace _R8_WINDOW with _R9_WINDOW): take
# ALL 41 ledger rows marked "r9 scheduled" in COVERAGE.md, in ledger
# order, as the front of the window — the 39 final r4d rows plus the two
# r8 additions (`sorted_input_validate`, `lazy_output_manifest`, the
# pytest-ceiling graduations the r7 verdict endorsed); this closes the
# rotation ledger — every one of the 390 catalog queries will then have
# a driver row. The remaining 9 window slots may be filled with newly
# added queries or left to re-verify high-value rows. Update
# tests/test_window_contract.py and the ledger in the same commit.
_R8_WINDOW = [
    "centroid_distances",
    "shingle_sensitivity",
    "weighted_systematic_sample",
    "value_migration_matrix",
    "seasonal_decompose",
    "knn_graph",
    "graph_modularity",
    "ks_distance",
    "rank_auc",
    "decision_stump",
    "silhouette_simplified",
    "target_encoding",
    "lorenz_curve",
    "lead_lag_corr",
    "dataset_card",
    "cube_serving",
    "shard_manifest",
    "audio_silence_trim",
    "range_boundaries",
    "encoding_advisor",
    "lateral_topk_sql",
    "udtf_chunker",
    "anova_oneway",
    "approx_quantile_check",
    "countmin_error_eval",
    "date_dimension",
    "posting_compression",
    "bucket_skew_advisor",
    "functional_dependencies",
    "duplicate_payment_flags",
    "shipment_sequence_audit",
    "subspace_energy",
    "token_position_profile",
    "mann_kendall_trend",
    "theil_sen_slope",
    "spearman_rho",
    "paragraph_filter_reassemble",
    "clamped_running_stock",
    "local_peaks",
    "poisson_bootstrap_ci",
    "isotonic_fit",
    "funnel_greedy_match",
    "ivm_join_delta",
    "jl_norm_distortion",
    "survivorship_golden_record",
    "weighted_median_price",
    "abc_inventory_classes",
    "price_ending_bias",
    "dbscan_core_flags",
    "interval_overlap_join",
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
    missing = [n for n in _R8_WINDOW if n not in QUERIES]
    if missing:  # a renamed query must fail loudly, not silently shrink
        raise RuntimeError(f"_R8_WINDOW names not registered: {missing}")
    front = {n: QUERIES[n] for n in _R8_WINDOW}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)

    _LOADED = True
