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
# driver row (rotation ledger: COVERAGE.md). Round 9's window, per the r8
# verdict's next-round task #1: ALL 41 ledger rows marked "r9 scheduled",
# in ledger order — the 39 final r4d rows (`recursive_order_chain`
# through `rank_stability`) plus the two r8 pytest-ceiling graduations
# (`sorted_input_validate`, `lazy_output_manifest`). This CLOSES the
# rotation ledger: with these 41 green, every query that existed at the
# start of r9 has a driver row (debt 41 -> 0). The remaining 9 slots:
# the two r9 catalog additions (`tb_vector_pipe`,
# `combine_compaction_bins` — typed-bytes VECTOR pipe and write-side
# CombineFileInputFormat compaction, per r8 verdict task #4), then 7
# re-verifications of the highest-value rows (explicitly endorsed by the
# r8 verdict; these are deliberate REPEATS of long-green rows, exempted
# in tests/test_window_contract.py).
_R9_SCHEDULED = [
    "recursive_order_chain",
    "capture_recapture",
    "asof_nearest_events",
    "kwic_windows",
    "calibration_bins",
    "community_conductance",
    "chi2_independence",
    "privacy_risk_audit",
    "temporal_split_audit",
    "clv_cohort_curve",
    "catalog_coverage_curve",
    "churn_risk_flags",
    "json_nested_shred",
    "image_channel_stats",
    "audio_peak_normalize",
    "stream_bloom_membership",
    "cuped_adjusted_ab",
    "ab_quantile_effect",
    "srm_check",
    "p_chart_control_limits",
    "rich_club_coefficient",
    "slo_burn_rate",
    "hierarchical_share",
    "ann_mrr",
    "pit_feature_join",
    "business_day_latency",
    "latency_percentile_trend",
    "dispersion_index",
    "substitute_candidates",
    "doc_quality_ensemble_gate",
    "activity_islands",
    "langid_prf1",
    "revenue_waterfall",
    "daily_active_span",
    "naive_forecast_mae",
    "multigrain_distinct",
    "attribute_split_profile",
    "error_cascade_rate",
    "rank_stability",
    "sorted_input_validate",
    "lazy_output_manifest",
]

_R9_ADDITIONS = [
    "tb_vector_pipe",
    "combine_compaction_bins",
]

# Re-verification slots (intentional repeats of driver-green rows).
_R9_REVERIFY = [
    "tpch_q1",
    "dedup_components",
    "teragen_sort",
    "composite_join_inner",
    "composite_join_outer",
    "dedup_minhash",
    "pagerank",
]

_R9_WINDOW = _R9_SCHEDULED + _R9_ADDITIONS + _R9_REVERIFY

# POST-LEDGER MAINTENANCE POLICY (r8 verdict task #3 — in force from r10,
# once CORRECTNESS_r09.json lands the final 41 first-time rows): with
# rotation debt at 0, each round's 50-slot window becomes re-verification
# budget, allocated in priority order:
#   1. MANDATORY: every query whose builder, oracle, or any operator/
#      function module it imports changed that round (a changed query
#      re-earns its driver row the same round the change ships);
#   2. any newly added catalog query (additions always debut in their
#      add-round's window, strict+TZ-verified and x30-probed on add day);
#   3. the remainder filled by rotating coverage of the untouched catalog
#      in ledger order, oldest driver row first, so every query re-earns
#      a driver row at least every ~8 rounds (392 queries / ~45 rotating
#      slots per round).
#
# ROUND-10 PLAN (next session: replace _R9_WINDOW with _R10_WINDOW):
# apply the policy above — (1) queries touched in r10 PLUS the one r9
# post-window change (`seasonal_decompose` — its quantization fix
# shipped after its r8 driver row; r9-verified at 3 SFs but owed a
# fresh driver row), (2) r10 additions, (3) rotation restart in ledger
# order from the top of COVERAGE.md (wordcount, grep,
# kv_text_roundtrip, ... — the r1 rows, which by then hold the oldest
# driver rows). Update tests/test_window_contract.py and the COVERAGE
# ledger in the same commit, as every round has.
#
# R10 CANDIDATE TASK (from the r9 ×10-SF full-strict finding): ~25
# remaining `.cast("decimal(18,N)").cast("double")` finalizations of
# COMPUTED quotients (queries_stats 16, cluster 4, lm 3, graph 1,
# text 1, + multiline-styled sites e.g. queries_sort's
# violation_share) are the same latent cross-engine tie class fixed in
# calibration_bins/seasonal_decompose this round: Spark rounds the
# exact binary value HALF_UP, DuckDB rounds the 10^N-scaled double
# half-even, so the SAME double can quantize differently — and
# string-mediated quantization is no better (the engines' double→
# string reprs differ: Java shortest-roundtrip vs DuckDB %.17g-style).
# All 25 are empirically green at sf0.001/0.01/0.1 today; the durable
# convention is the one those two fixes applied — make final outputs
# RAW IEEE quotients of engine-identical exact operands and delete the
# quantization. Convert one query at a time, each verified at 3 SFs;
# a site whose raw form mismatches is masking an operand divergence
# and needs restructuring (exact sums), not a rounding cast.


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
    missing = [n for n in _R9_WINDOW if n not in QUERIES]
    if missing:  # a renamed query must fail loudly, not silently shrink
        raise RuntimeError(f"_R9_WINDOW names not registered: {missing}")
    front = {n: QUERIES[n] for n in _R9_WINDOW}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)

    _LOADED = True
