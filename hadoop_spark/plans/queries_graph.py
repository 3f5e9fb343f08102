"""Iterative graph analytics (extension): PageRank over the supplier
co-occurrence graph.

PageRank is THE canonical iterative-MapReduce workload — the reference
project exists because Nutch needed exactly this loop (scan links, emit
rank/deg contributions, sum per target, repeat; see the MapReduce lineage
in `EXAMPLES/` and the join/aggregate primitives it composes). The Spark
form keeps the loop on the driver but every iteration is one declarative
join + aggregation: edges persist once, ranks are node-sized, shuffle
width per iteration is O(edges) keyed on the join key — the shape that
holds on a 1000-executor cluster with a trillion-edge graph (edges would
be bucketed by src so the per-iteration join is co-located).

Determinism at any parallelism: per-target contribution sums run through
the decimal-quantization discipline (`functions/numeric.dsum`), so ranks
are bit-identical regardless of partitioning — which is also what makes
the unrolled-CTE DuckDB oracle able to match a distributed run exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.functions.numeric import dsum, dsum_sql
from hadoop_spark.operators.graph import cooccurrence_pairs, symmetrize
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table, shared

_ITERS = 5
_DAMP = "0.85"
_JUMP = "0.15"
_SCALE = 12  # contribution quantization scale


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (recursive CTEs
    cannot aggregate in the recursive term, so the loop is unrolled —
    the oracle mirrors the driver loop exactly)."""
    head = """
WITH pairs AS (
  SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS u,
                  GREATEST(a.l_suppkey, b.l_suppkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
edges AS (
  SELECT u AS s, v AS d FROM pairs UNION ALL SELECT v AS s, u AS d FROM pairs
),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS dg FROM edges GROUP BY s),
nodes AS (SELECT DISTINCT s AS node FROM edges),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT node, CAST(1 AS DOUBLE) / CAST((SELECT n FROM nn) AS DOUBLE) AS r
  FROM nodes
)"""
    iters = []
    for k in range(1, _ITERS + 1):
        contrib = dsum_sql("r.r / CAST(dg.dg AS DOUBLE)", _SCALE)
        iters.append(f"""
r{k} AS (
  SELECT n.node,
         CAST({_JUMP} AS DOUBLE) / CAST((SELECT n FROM nn) AS DOUBLE)
           + CAST({_DAMP} AS DOUBLE) * COALESCE(c.contrib, CAST(0 AS DOUBLE))
           AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS node, {contrib} AS contrib
    FROM edges e
    JOIN r{k - 1} r ON e.s = r.node
    JOIN deg dg ON dg.s = e.s
    GROUP BY e.d
  ) c ON c.node = n.node
)""")
    tail = f"""
SELECT node,
       CAST(CAST(r AS DECIMAL(18,{_SCALE})) AS DOUBLE) AS pr
FROM r{_ITERS}"""
    return head + "," + ",".join(iters) + tail


@query("pagerank", _pagerank_oracle())
def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank, 5 Lloyd-style driver iterations, decimal-exact."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = shared(symmetrize(cooccurrence_pairs(li, "l_orderkey", "l_suppkey")))
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    # Degrees fold into the persisted edge table ONCE — each iteration
    # then costs a single join + aggregation instead of two joins.
    edges_deg = shared(edges.join(deg, "s"))
    nodes = shared(edges.select(F.col("s").alias("node")).distinct())
    # O(1) scalar (node count) — same class of driver-side scalar as the
    # connected-components convergence flag; at 100 TB this is one count.
    n = nodes.count()
    if n == 0:
        # empty graph (zero-split inputs): no nodes -> no ranks; the 1/n
        # seed would otherwise constant-fold into an ANSI divide-by-zero
        return spark.createDataFrame([], "node bigint, pr double")
    damp, jump = float(_DAMP), float(_JUMP)
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("r"))
    for _ in range(_ITERS):
        contribs = (
            edges_deg.join(ranks, edges_deg["s"] == ranks["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(dsum(F.col("r") / F.col("dg").cast("double"), _SCALE).alias("contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(jump) / F.lit(float(n))
                + F.lit(damp) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("r"),
        )
        # Cut lineage growth per iteration (same discipline as
        # dedup_components): ranks stays node-sized.
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        "node", F.col("r").cast(f"decimal(18,{_SCALE})").cast("double").alias("pr")
    )


# ----------------------------------------------------------------------
# bfs_hops — multi-source BFS (bounded frontier expansion): hop distance
# from the seed set (suppliers of nation 0) to every node of the supplier
# co-occurrence graph, capped at 3 hops. The MapReduce lineage is the
# iterative "expand frontier, min-combine distances" job chain; the Spark
# form is K rounds of (edges JOIN dists) -> groupBy(dst).min — shuffle
# width O(edges) per round, all-integer arithmetic (bit-exact under any
# partitioning, no quantization needed), lineage cut per round.
# ----------------------------------------------------------------------

_HOPS = 3
_INF = 2147483647  # in-loop sentinel so LEAST/min never sees NULL


def _bfs_oracle() -> str:
    head = f"""
WITH pairs AS (
  SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS u,
                  GREATEST(a.l_suppkey, b.l_suppkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
edges AS (
  SELECT u AS s, v AS d FROM pairs UNION ALL SELECT v AS s, u AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
d0 AS (
  SELECT node,
         CASE WHEN node IN (SELECT s_suppkey FROM supplier
                            WHERE s_nationkey = 0)
              THEN 0 ELSE {_INF} END AS dist
  FROM nodes
)"""
    iters = []
    for k in range(1, _HOPS + 1):
        iters.append(f"""
d{k} AS (
  SELECT n.node,
         LEAST(n.dist, COALESCE(c.mind, {_INF})) AS dist
  FROM d{k - 1} n LEFT JOIN (
    SELECT e.d AS node, MIN(r.dist + 1) AS mind
    FROM edges e JOIN d{k - 1} r ON e.s = r.node
    WHERE r.dist < {_INF}
    GROUP BY e.d
  ) c ON c.node = n.node
)""")
    tail = f"""
SELECT node,
       CASE WHEN dist = {_INF} THEN NULL ELSE CAST(dist AS INT) END AS hops
FROM d{_HOPS}"""
    return head + "," + ",".join(iters) + tail


@query("bfs_hops", _bfs_oracle())
def bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances, 3 frontier-expansion rounds."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = shared(symmetrize(cooccurrence_pairs(li, "l_orderkey", "l_suppkey")))
    nodes = edges.select(F.col("s").alias("node")).distinct()
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select(F.col("s_suppkey").alias("node"), F.lit(0).alias("seed_d"))
    )
    # seeds is nation-sized-small relative to the graph: broadcast it
    dists = nodes.join(F.broadcast(seeds), "node", "left").select(
        "node", F.coalesce(F.col("seed_d"), F.lit(_INF)).alias("dist")
    )
    for _ in range(_HOPS):
        contribs = (
            edges.join(dists, edges["s"] == dists["node"])
            .filter(F.col("dist") < _INF)
            .groupBy(F.col("d").alias("node"))
            .agg(F.min(F.col("dist") + 1).alias("mind"))
        )
        dists = dists.join(contribs, "node", "left").select(
            "node",
            F.least(
                F.col("dist"), F.coalesce(F.col("mind"), F.lit(_INF))
            ).alias("dist"),
        )
        dists = dists.localCheckpoint(eager=False)
    return dists.select(
        "node",
        F.when(F.col("dist") == _INF, F.lit(None).cast("int"))
        .otherwise(F.col("dist").cast("int"))
        .alias("hops"),
    )
