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
# driver row (rotation ledger: COVERAGE.md). Round 4's window = the red r3
# row (source_profile, oracle typing fixed this round) + 49 queries that
# have never had a driver row in r1-r3 (text-tail, cluster, ALL of stream,
# ALL of mlprep, workloads head). The remaining never-checked queries are
# scheduled for the r5 window.
#
# ROUND-5 PLAN (next session: replace _R4_WINDOW with _R5_WINDOW): take
# the 50 ledger rows marked "r5 scheduled" in COVERAGE.md (io tails,
# graph, lm, stats, cluster remainders, r4-first-half additions); the
# ~41 r4b additions (ledger: "r6 scheduled") fill round 6's window.
_R4_WINDOW = [
    "source_profile",
    "repetition_signals",
    "source_cap_sample",
    "tfidf_topterms",
    "word_lift",
    "kmeans_assign",
    "ann_pq_adc",
    "ann_pq_recall",
    "ann_ivfpq_topk",
    "cluster_purity",
    "tumbling_window",
    "sliding_window",
    "session_window_agg",
    "stream_dedup",
    "late_events",
    "stateful_running_agg",
    "hierarchical_rollup",
    "stream_stream_join",
    "incremental_merge",
    "batch_sessionize",
    "time_weighted_avg",
    "ohlc_bars",
    "cohort_retention",
    "funnel_counts",
    "stream_static_enrich",
    "stream_kmv_distinct",
    "stream_windowed_kmv",
    "session_funnel_pipeline",
    "validity_intervals",
    "top_movers",
    "pivot_flag_status",
    "heavy_hitters",
    "train_test_split",
    "gap_fill_events",
    "numeric_profile",
    "zscore_by_group",
    "sequence_packing",
    "decontaminate",
    "stratified_sample",
    "data_quality_audit",
    "gap_fill_interp",
    "numeric_histogram",
    "pretrain_mix",
    "mixture_sample",
    "length_buckets",
    "teragen_sort",
    "teravalidate",
    "pi_estimate",
    "random_text_stats",
    "xml_records",
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
    missing = [n for n in _R4_WINDOW if n not in QUERIES]
    if missing:  # a renamed query must fail loudly, not silently shrink
        raise RuntimeError(f"_R4_WINDOW names not registered: {missing}")
    front = {n: QUERIES[n] for n in _R4_WINDOW}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)

    _LOADED = True
