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
# driver row (rotation ledger: COVERAGE.md). Round 5's window = the 50
# ledger rows marked "r5 window (this round)": io tails (compression,
# commit, multimodal plumbing), graph head (pagerank/bfs/triangles),
# lm/text remainders, stats remainders, and the r4-first-half additions.
#
# ROUND-6 PLAN (next session: replace _R5_WINDOW with _R6_WINDOW): take
# the FIRST 50 of the ~129 ledger rows marked "r6 scheduled" in
# COVERAGE.md (r4-second-half + r4b additions + value_iter_reset +
# distcp_incremental); re-mark the overflow "r7 scheduled". Update
# tests/test_window_contract.py and the ledger in the same commit.
_R5_WINDOW = [
    "bad_record_skip",
    "multi_input_union",
    "search_fanout_nqueens",
    "job_pipeline",
    "bigram_counts",
    "inverted_index",
    "triangle_count",
    "lsh_candidate_quality",
    "pipe_counter_rows",
    "gzip_text_read",
    "multimodal_decode",
    "schema_evolution_read",
    "distcp_roundtrip",
    "compact_small_files",
    "pipe_shipped_script",
    "multi_named_outputs",
    "combine_small_read",
    "auto_input_mixed",
    "partition_overwrite",
    "pyds_fixed_width_roundtrip",
    "image_patch_grid",
    "audio_rms_windows",
    "dedup_paragraph",
    "bigram_lm_score",
    "quality_classifier",
    "chunk_documents",
    "incremental_dedup",
    "bpe_pair_counts",
    "chi2_terms",
    "source_tv_divergence",
    "token_gini",
    "pagerank",
    "bfs_hops",
    "ewma_smooth",
    "linreg_per_group",
    "anomaly_mad",
    "winsorized_stats",
    "linreg_residuals",
    "pareto_frontier",
    "repeated_substrings",
    "fuzzy_match_names",
    "event_transitions",
    "bpe_learn_merges",
    "assoc_rules",
    "attribution_touch",
    "benford_digits",
    "degree_distribution",
    "kmeans_iterate",
    "temperature_mix",
    "label_propagation",
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
    missing = [n for n in _R5_WINDOW if n not in QUERIES]
    if missing:  # a renamed query must fail loudly, not silently shrink
        raise RuntimeError(f"_R5_WINDOW names not registered: {missing}")
    front = {n: QUERIES[n] for n in _R5_WINDOW}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)

    _LOADED = True
