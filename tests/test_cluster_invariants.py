"""Invariants of the iterative k-means loop beyond oracle equality:
cluster membership partitions the input, and the exact integer inertia
behaves like a squared distance (non-negative, bounded by the seed
assignment's inertia — Lloyd never increases it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.plans import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_kmeans_iterate_partitions_input(spark):
    from hadoop_spark.sources.tables import load_table

    rows = QUERIES["kmeans_iterate"](spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    # every vector id is in exactly one cluster: id sums partition 0..n-1
    assert sum(r.sum_vec_ids for r in rows) == n_vecs * (n_vecs - 1) // 2
    for r in rows:
        assert r.inertia >= 0


def test_kmeans_iterate_lloyd_does_not_increase_inertia(spark):
    """Each Lloyd round reassigns to the nearest centroid, so total
    inertia after 3 rounds must be <= the seed assignment's inertia.
    The seed inertia is recomputed here directly (nearest seed centroid
    by exact integer L2)."""
    from hadoop_spark.operators.similarity import int_dot, with_quantized
    from hadoop_spark.plans.queries_cluster import _KM_K
    from hadoop_spark.sources.tables import load_table

    emb = with_quantized(load_table(spark, SF_DIR, "embeddings"))
    seeds = (
        emb.filter(F.col("vec_id") < _KM_K)
        .select(F.col("vec_id").alias("cid"), "q", "n2")
        .collect()
    )
    if not seeds:
        return
    cent_arr = F.array(
        *[
            F.struct(
                F.array(*[F.lit(int(v)) for v in r.q]).alias("cq"),
                F.lit(int(r.n2)).alias("cn2"),
            )
            for r in seeds
        ]
    )
    d2 = F.aggregate(
        cent_arr,
        F.lit(None).cast("bigint"),
        lambda acc, c: F.least(
            F.coalesce(acc, F.lit(2**62)),
            F.col("n2") + c["cn2"] - 2 * int_dot(F.col("q"), c["cq"]),
        ),
    )
    seed_inertia = emb.select(d2.alias("d2")).agg(F.sum("d2")).collect()[0][0]
    final_inertia = (
        QUERIES["kmeans_iterate"](spark, SF_DIR)
        .agg(F.sum("inertia"))
        .collect()[0][0]
    )
    assert final_inertia <= seed_inertia
