"""Distributed clustering queries over the embeddings table (extension):
the k-means Lloyd step — the primitive behind IVF index builds, data-mix
curation, and semantic dedup. Split from queries_similarity.py so catalog
registration order keeps the driver's 50-query correctness window aligned
(see catalog.load_all and COVERAGE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.operators.similarity import int_dot, int_dot_sql, quantize_sql, with_quantized
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import fanout_small, load_table, shared

_EMB_CTE = f"""
e AS (SELECT vec_id, {quantize_sql('embedding')} AS q FROM embeddings),
en AS (SELECT vec_id, q, {int_dot_sql('q', 'q')} AS n2 FROM e)
"""

_KM_K = 8  # k-means K: seed centroids are vec_id < _KM_K (deterministic init)

_KMEANS_ORACLE = f"""
WITH {_EMB_CTE},
cents AS (SELECT vec_id AS cid, q AS cq, n2 AS cn2 FROM en WHERE vec_id < {_KM_K}),
assign AS (
  SELECT vec_id, cid AS cluster_id, q FROM (
    SELECT v.vec_id, c.cid, v.q,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY v.n2 + c.cn2 - 2 * {int_dot_sql('v.q', 'c.cq')}, c.cid
           ) AS rn
    FROM en v CROSS JOIN cents c
  ) WHERE rn = 1
),
members AS (
  SELECT cluster_id,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(vec_id) AS BIGINT) AS sum_vec_ids
  FROM assign GROUP BY cluster_id
),
dims AS (
  SELECT cluster_id, generate_subscripts(q, 1) AS dim, unnest(q) AS val
  FROM assign
),
dimsums AS (
  SELECT cluster_id, dim, CAST(SUM(val) AS BIGINT) AS s
  FROM dims GROUP BY cluster_id, dim
),
newcent AS (
  SELECT d.cluster_id, d.dim,
         CAST(ROUND(CAST(d.s AS DOUBLE) / CAST(m.n_members AS DOUBLE)) AS BIGINT)
           AS mean_q
  FROM dimsums d JOIN members m ON d.cluster_id = m.cluster_id
)
SELECT m.cluster_id, m.n_members, m.sum_vec_ids,
       CAST(SUM(ABS(n.mean_q)) AS BIGINT) AS centroid_l1_q,
       CAST(SUM(n.dim * n.mean_q) AS BIGINT) AS centroid_dim_checksum
FROM members m JOIN newcent n ON m.cluster_id = n.cluster_id
GROUP BY m.cluster_id, m.n_members, m.sum_vec_ids
"""


@query("kmeans_assign", _KMEANS_ORACLE)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of distributed k-means over the embedding table
    (the clustering primitive behind IVF index builds, data-mix curation,
    and semantic dedup): assign every vector to its nearest of {_KM_K}
    seed centroids by EXACT integer squared-L2 (quantized: d² = |v|² +
    |c|² − 2·v·c, all BIGINT, ties → smallest centroid id), then recompute
    each centroid as the per-dimension mean of its members.

    Scale shape — the canonical broadcast-iterate pattern: centroids are
    K tiny rows COLLECTED to the driver (bounded by construction — the
    DistributedCache literal pattern, same discipline as
    map_lookup_enrich) and folded into a per-row `aggregate` expression,
    so assignment is purely MAP-SIDE: no shuffle of the vector table at
    all (gated in tests/test_plan_quality.py). The only shuffles are the
    per-(cluster,dim) mean recomputation and the tiny per-cluster
    rollups. Per iteration at 100 TB: one scan + one agg shuffle; nothing
    driver-side but the K×dim centroid matrix. The oracle pins membership
    counts, member-id sums, and two exact checksums of the NEW centroid
    matrix (L1 mass + dim-weighted), so a wrong assignment, a lost
    member, or a transposed dimension cannot hash-match."""
    emb = shared(with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings"))))
    cent_rows = (
        emb.filter(F.col("vec_id") < _KM_K)
        .select(F.col("vec_id").alias("cid"), "q", "n2")
        .collect()
    )  # K rows — bounded scalar collect, the broadcast side of the pattern
    if not cent_rows:  # empty-input regime: no seeds -> no clusters
        return spark.createDataFrame(
            [],
            "cluster_id bigint, n_members bigint, sum_vec_ids bigint, "
            "centroid_l1_q bigint, centroid_dim_checksum bigint",
        )
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(r.cid)).alias("cid"),
                F.array(*[F.lit(int(v)) for v in r.q]).alias("cq"),
                F.lit(int(r.n2)).alias("cn2"),
            )
            for r in sorted(cent_rows, key=lambda r: r.cid)
        ]
    )

    def d2_to(c):  # exact BIGINT squared-L2 to centroid struct c
        return F.col("n2") + c["cn2"] - 2 * int_dot(F.col("q"), c["cq"])

    # map-side argmin: fold the centroid array, keep (best_d2, best_cid);
    # strict < keeps the SMALLEST cid on ties (the array is cid-ascending)
    best = F.aggregate(
        cent_arr,
        F.struct(
            F.lit(None).cast("bigint").alias("d2"),
            F.lit(None).cast("int").alias("cid"),
        ),
        lambda acc, c: F.when(
            acc["cid"].isNull() | (d2_to(c) < acc["d2"]),
            F.struct(d2_to(c).alias("d2"), c["cid"].alias("cid")),
        ).otherwise(acc),
    )
    assign = emb.select(
        "vec_id", best["cid"].cast("bigint").alias("cluster_id"), "q"
    )
    assign = shared(assign)
    members = assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("vec_id").alias("sum_vec_ids"),
    )
    dims = assign.select(
        "cluster_id", F.posexplode("q").alias("pos", "val")
    ).select("cluster_id", (F.col("pos") + 1).alias("dim"), "val")
    dimsums = dims.groupBy("cluster_id", "dim").agg(F.sum("val").alias("s"))
    newcent = dimsums.join(F.broadcast(members), "cluster_id").select(
        "cluster_id",
        "dim",
        F.round(F.col("s").cast("double") / F.col("n_members").cast("double"))
        .cast("bigint")
        .alias("mean_q"),
    )
    cent_stats = newcent.groupBy("cluster_id").agg(
        F.sum(F.abs(F.col("mean_q"))).alias("centroid_l1_q"),
        F.sum(F.col("dim") * F.col("mean_q")).alias("centroid_dim_checksum"),
    )
    return members.join(cent_stats, "cluster_id").select(
        "cluster_id",
        "n_members",
        "sum_vec_ids",
        "centroid_l1_q",
        "centroid_dim_checksum",
    )
