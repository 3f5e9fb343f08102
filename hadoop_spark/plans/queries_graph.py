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
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    edges = shared(
        pairs.select(F.col("u").alias("s"), F.col("v").alias("d")).unionAll(
            pairs.select(F.col("v").alias("s"), F.col("u").alias("d"))
        )
    )
    deg = shared(edges.groupBy("s").agg(F.count(F.lit(1)).alias("dg")))
    nodes = shared(edges.select(F.col("s").alias("node")).distinct())
    # O(1) scalar (node count) — same class of driver-side scalar as the
    # connected-components convergence flag; at 100 TB this is one count.
    n = nodes.count()
    damp, jump = float(_DAMP), float(_JUMP)
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("r"))
    for _ in range(_ITERS):
        contribs = (
            edges.join(ranks, edges["s"] == ranks["node"])
            .join(deg, "s")
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
