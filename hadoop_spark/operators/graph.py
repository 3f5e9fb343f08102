"""Graph construction primitives shared by the graph analytics queries
(`plans/queries_graph.py`, `triangle_count`).

The supplier co-occurrence graph ("suppliers sharing an order") is built
WITHOUT a fact-table self-join: lineitem groups by order (one shuffle,
group size bounded by the lines-per-order cap, TPC-H <= 7), and the
<= C(7,2) = 21 pairs per order are generated MAP-SIDE from the collected
per-order supplier set. A self-join on l_orderkey computes the same pairs
but pays a second full sort of the fact table and emits the pre-distinct
pair stream through a join operator — measured 3.5x slower at sf0.1 and
strictly worse at 100 TB, where sorting the fact table twice dominates.
The bounded group size is what makes collect_set safe here (it is NOT a
general pattern for unbounded groups).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One shuffle partition per this many edge rows inside bounded-round
# driver loops — the same scale-adaptive formula the connected-components
# loop uses (operators/dedup.py). A 450 k-edge graph runs 2-wide rounds
# (per-round cost is scheduler/task dispatch, not data); a billion-edge
# graph gets the full session width.
_LOOP_ROWS_PER_PARTITION = 1_000_000


@contextmanager
def loop_width(spark, n_rows: int):
    """Pin shuffle width for a bounded-round driver loop, derived from the
    MATERIALIZED row count of the loop's edge table — never a constant, so
    the driver's lower-core bench runs and a real cluster both get a width
    proportional to their data (guide §2: scale-adaptive partitioning).
    Only stages that EXECUTE inside the context inherit the width: the
    loop must materialize per round (eager localCheckpoint / count), which
    is exactly the regime the iterative queries here run. Restores the
    session width on exit.

    r10 A/B on pagerank (454 k-edge supplier graph, balanced ABBA ×3):
    session-width 32 rounds med 8.08 s / min 7.41 vs pinned med 4.98 /
    min 4.23 — identical ranks (fsum-exact, partitioning-independent)."""
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    width = max(2, min(session_width, n_rows // _LOOP_ROWS_PER_PARTITION + 2))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        yield width
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def cooccurrence_pairs(
    fact: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Distinct undirected co-occurrence pairs (u < v) of `item_col`
    values sharing a `group_col` value. One shuffle (the groupBy) +
    map-side pair expansion + the distinct."""
    # r10 opt note: a fanout_small(fact) spread of the map side was A/B'd
    # (alternating, one session) and REJECTED — the scan's partial
    # collect_set rides the fact file's orderkey clustering, so the extra
    # round-robin exchange costs more than the parallelism it buys
    # (1.3-1.6 s vs 1.7-1.9 s per build at sf0.1).
    grouped = fact.groupBy(group_col).agg(
        F.array_sort(F.collect_set(item_col)).alias("a")
    )
    pairs = (
        grouped.filter(F.size("a") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.size("a") - 1),
                        lambda i: F.transform(
                            F.sequence(i + 1, F.size("a")),
                            lambda j: F.struct(
                                F.element_at("a", i).alias("u"),
                                F.element_at("a", j).alias("v"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
    )
    return pairs


def symmetrize(pairs: DataFrame) -> DataFrame:
    """Undirected (u < v) pair set -> directed edge list (s, d) with both
    orientations."""
    return pairs.select(F.col("u").alias("s"), F.col("v").alias("d")).unionAll(
        pairs.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
