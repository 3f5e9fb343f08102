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
# driver row (rotation ledger: COVERAGE.md). Round 6's window = the FIRST
# 50 of the 130 ledger rows that were marked "r6 scheduled" at the end of
# round 5 (r4-second-half additions + the r4b head + value_iter_reset +
# distcp_incremental, in ledger order); the 80-row overflow is re-marked
# "r7 scheduled". No repeats of any r1–r5 driver-green row.
#
# ROUND-7 PLAN (next session: replace _R6_WINDOW with _R7_WINDOW): take
# the FIRST 50 of the ledger rows marked "r7 scheduled" in COVERAGE.md
# (the 80-row r6 overflow first, then the r4c remainder / r4d rows);
# re-mark the overflow "r8 scheduled". Update
# tests/test_window_contract.py and the ledger in the same commit.
_R6_WINDOW = [
    "span_corruption_plan",
    "char_ngram_profile",
    "doc_sim_sparse",
    "stream_value_histogram",
    "rolling_1h_count",
    "bpe_encode",
    "calendar_revenue",
    "bloom_filter_join",
    "value_iter_reset",
    "distcp_incremental",
    "skipgram_pairs",
    "rank_profile",
    "revenue_deciles",
    "embedding_dim_stats",
    "embedding_int8_quantize",
    "predicate_sweep",
    "debounce_events",
    "novelty_ngrams",
    "stream_ohlc",
    "stream_capped_sample",
    "bm25_scores",
    "interarrival_profile",
    "cv_folds",
    "tokenizer_fertility",
    "label_centroids",
    "ann_hard_negatives",
    "event_trigrams",
    "quantile_normalize",
    "conversion_latency",
    "langid_confusion",
    "join_size_estimate",
    "trending_parts",
    "snapshot_diff",
    "gdpr_delete",
    "concurrent_sessions",
    "freshness_report",
    "audience_overlap",
    "source_overlap",
    "length_percentiles",
    "hll_sketch",
    "lag_features",
    "activity_heatmap",
    "user_growth",
    "video_frame_sample",
    "login_streaks",
    "ann_lsh_topk",
    "ann_lsh_recall",
    "dedup_containment",
    "nb_langid",
    "bbp_pi_digits",
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
    missing = [n for n in _R6_WINDOW if n not in QUERIES]
    if missing:  # a renamed query must fail loudly, not silently shrink
        raise RuntimeError(f"_R6_WINDOW names not registered: {missing}")
    front = {n: QUERIES[n] for n in _R6_WINDOW}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)

    _LOADED = True
