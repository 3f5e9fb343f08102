"""wedge_closure (operators/graph.py, r11) replaces the degree-oriented
wedge self-join of triangle_count / clustering_coefficient /
link_prediction_cn with a vectorized numpy kernel. These tests pin every
mode to a brute-force Python enumeration of the SAME degree-oriented
wedge space, including tiny flush budgets that force the strip-chunk
retry path mid-node."""

from __future__ import annotations

import random

import pytest

from hadoop_spark.operators.graph import wedge_closure


@pytest.fixture(scope="module")
def spark():
    from hadoop_spark.session import get_session

    return get_session(app_name="test_wedge_closure", master="local[2]")


def _orient(edges):
    """(u < v) pair set -> oriented edge list [(s, t, dt)] + degree map,
    mirroring the queries' (deg, id) orientation exactly."""
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    oriented = []
    for u, v in edges:
        if (deg[u], u) < (deg[v], v):
            oriented.append((u, v, deg[v]))
        else:
            oriented.append((v, u, deg[u]))
    return oriented, deg


def _brute(edges):
    """Brute-force closed/open wedge stats over the oriented graph."""
    oriented, deg_map = _orient(edges)
    adj: dict[int, list] = {}
    dt_of = {(s, t): dt for s, t, dt in oriented}
    eset = {(s, t) for s, t, _ in oriented}
    for s, t, dt in oriented:
        adj.setdefault(s, []).append((dt, t))
    n_closed = 0
    per_node: dict[int, int] = {}
    open_pairs: dict[tuple, int] = {}
    for s, nbrs in adj.items():
        nbrs = sorted(nbrs)
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                cs, ct = nbrs[i][1], nbrs[j][1]
                if (cs, ct) in eset:
                    n_closed += 1
                    for n in (s, cs, ct):
                        per_node[n] = per_node.get(n, 0) + 1
                else:
                    open_pairs[(cs, ct)] = open_pairs.get((cs, ct), 0) + 1
    return n_closed, per_node, open_pairs, deg_map


def _random_graph(n_nodes, n_edges, seed):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < n_edges:
        u, v = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if u == v:
            continue
        edges.add((min(u, v), max(u, v)))
    return sorted(edges)


def _run_all_modes(spark, edges, flush_n):
    from pyspark.sql import functions as F

    odf = spark.createDataFrame(edges, "u bigint, v bigint")
    out = {}
    cnt = wedge_closure(spark, odf, "count", flush_n=flush_n)
    out["count"] = (
        cnt.out.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"))
        .collect()[0]["n"]
    )
    out["n_edges"], out["n_nodes"] = cnt.n_edges, cnt.n_nodes
    out["deg"] = {r["node"]: r["d"] for r in cnt.deg.collect()}
    pn = wedge_closure(spark, odf, "per_node", flush_n=flush_n)
    out["per_node"] = {
        r["node"]: r["t"]
        for r in pn.out.groupBy("node").agg(F.sum("t").alias("t")).collect()
    }
    op = wedge_closure(spark, odf, "open_pairs", flush_n=flush_n)
    out["open_pairs"] = {
        (r["k"] >> 32, r["k"] & 0xFFFFFFFF): r["w"]
        for r in op.out.groupBy("k").agg(F.sum("w").alias("w")).collect()
    }
    return out


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 80), (2, 12, 50), (3, 60, 120)])
def test_kernel_matches_bruteforce(spark, seed, n_nodes, n_edges):
    edges = _random_graph(n_nodes, n_edges, seed)
    n_closed, per_node, open_pairs, deg_map = _brute(edges)
    got = _run_all_modes(spark, edges, flush_n=2_000_000)
    assert got["count"] == n_closed
    assert got["per_node"] == per_node
    assert got["open_pairs"] == open_pairs
    assert got["n_edges"] == len(edges)
    assert got["n_nodes"] == len(deg_map)
    assert got["deg"] == deg_map


def test_kernel_strip_chunk_paths(spark):
    """flush budget far smaller than a single node's pair count: the
    _pair_block retry path and mid-node flushes must lose nothing."""
    edges = _random_graph(12, 50, seed=7)  # dense: out-degrees up to ~8
    n_closed, per_node, open_pairs, _ = _brute(edges)
    for flush_n in (1, 3, 17):
        got = _run_all_modes(spark, edges, flush_n=flush_n)
        assert got["count"] == n_closed, flush_n
        assert got["per_node"] == per_node, flush_n
        assert got["open_pairs"] == open_pairs, flush_n


def _brute_topk(open_pairs, k):
    ranked = sorted(
        open_pairs.items(), key=lambda it: (-it[1], it[0][0], it[0][1])
    )
    return ranked[:k]


@pytest.mark.parametrize("k", [1, 3, 20])
def test_open_pairs_topk_pruning_is_exact(spark, k):
    """topk pruning (per-x then per-chunk) must reproduce the global
    top-k under the exact (count desc, cs asc, ct asc) tie-break."""
    from pyspark.sql import functions as F

    edges = _random_graph(25, 90, seed=11)
    _, _, open_pairs, _ = _brute(edges)
    odf = spark.createDataFrame(edges, "u bigint, v bigint")
    res = wedge_closure(spark, odf, "open_pairs", flush_n=7, topk=k)
    got = (
        res.out.groupBy("k")
        .agg(F.sum("w").alias("w"))
        .orderBy(F.col("w").desc(), F.col("k"))
        .limit(k)
        .collect()
    )
    got_pairs = [((r["k"] >> 32, r["k"] & 0xFFFFFFFF), r["w"]) for r in got]
    assert got_pairs == _brute_topk(open_pairs, k)


def test_kernel_empty_and_wedgeless(spark):
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "u bigint, v bigint")
    res = wedge_closure(spark, empty, "count")
    assert res.out.count() == 0 and res.n_edges == 0 and res.n_nodes == 0
    # a perfect matching has edges but zero wedges
    matching = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "u bigint, v bigint"
    )
    res = wedge_closure(spark, matching, "open_pairs")
    assert res.out.count() == 0
    assert res.n_edges == 3 and res.n_nodes == 6
    assert {r["node"]: r["d"] for r in res.deg.collect()} == {
        i: 1 for i in range(1, 7)
    }


def test_kernel_declines_out_of_range_ids(spark):
    big = spark.createDataFrame(
        [(5, 1 << 31), (5, 7)], "u bigint, v bigint"
    )
    assert wedge_closure(spark, big, "count") is None
    neg = spark.createDataFrame([(-1, 5)], "u bigint, v bigint")
    assert wedge_closure(spark, neg, "count") is None


def test_kernel_declines_above_edge_cap(spark, monkeypatch):
    import hadoop_spark.operators.graph as g

    monkeypatch.setattr(g, "_WEDGE_KERNEL_MAX_EDGES", 2)
    odf = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "u bigint, v bigint"
    )
    assert g.wedge_closure(spark, odf, "count") is None
