"""Semantic invariants of the iterative graph operators — properties the
oracle hash-match alone would not explain to a reader:

- PageRank conserves probability mass: with a symmetric (dangling-free)
  graph, sum(pr) stays 1 through every damped iteration (up to the
  documented decimal quantization).
- BFS distances are frontier-consistent: seeds are 0, and every node at
  hop h > 0 has at least one neighbor at h - 1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.plans import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_pagerank_mass_conserved(spark):
    rows = QUERIES["pagerank"](spark, SF_DIR).collect()
    assert rows
    total = sum(r["pr"] for r in rows)
    # 5 iterations x per-node 1e-12 quantization -> tolerance well above
    # accumulated rounding, far below any real mass leak (a dropped node
    # or mis-normalized degree shifts mass by >= 1/n ~ 1e-2).
    assert abs(total - 1.0) < 1e-6, total


def test_bfs_hops_frontier_consistent(spark):
    from hadoop_spark.operators.graph import cooccurrence_pairs, symmetrize
    from hadoop_spark.sources.tables import load_table

    hops = QUERIES["bfs_hops"](spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    edges = symmetrize(cooccurrence_pairs(li, "l_orderkey", "l_suppkey"))

    seeds = {
        r["s_suppkey"]
        for r in load_table(spark, SF_DIR, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select("s_suppkey")
        .collect()
    }
    h = {r["node"]: r["hops"] for r in hops.collect()}
    adj = {}
    for r in edges.collect():
        adj.setdefault(r["s"], set()).add(r["d"])

    for node, d in h.items():
        if d == 0:
            assert node in seeds, node
        elif d is not None:
            assert any(h.get(nb) == d - 1 for nb in adj[node]), (node, d)
        else:  # unreached within 3 hops: no neighbor may sit at hop <= 2
            assert all(
                h.get(nb) is None or h[nb] >= 3 for nb in adj[node]
            ), node
