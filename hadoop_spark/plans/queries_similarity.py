"""Similarity-search queries (SURVEY §7 M9): exact cosine top-k baseline
and IVF cell-probed ANN, both oracle-checked (deterministic by integer
quantization — operators/similarity.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_spark.operators.similarity import (
    cos_q,
    cos_q_sql,
    int_dot,
    int_dot_sql,
    quantize_sql,
    with_quantized,
)
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import fanout_small, load_table, shared

N_QUERIES = 3  # vec_id < 3 are the query vectors
TOP_K = 10
N_CENTROIDS = 8  # vec_id < 8 are the IVF centroids
N_PROBE = 2
IVF_TOP_K = 5

_EMB_CTE = f"""
e AS (SELECT vec_id, {quantize_sql('embedding')} AS q FROM embeddings),
en AS (SELECT vec_id, q, {int_dot_sql('q', 'q')} AS n2 FROM e)
"""

_BRUTE_ORACLE = f"""
WITH {_EMB_CTE},
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         {cos_q_sql(int_dot_sql('q.q', 'v.q'), 'q.n2', 'v.n2')} AS cos_q
  FROM en q JOIN en v ON v.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cos_q,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_q DESC, neighbor_id
  ) AS rnk
  FROM scored
)
WHERE rnk <= {TOP_K}
"""


@query("ann_cosine_topk", _BRUTE_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (tiny) query set against every
    vector — one map-side pass over n, then a per-query top-k (Spark turns
    the window + filter into a partial top-k under AQE; no full sort of n).
    Ties break on neighbor_id so ranks are deterministic."""
    emb = with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings")))
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    scored = (
        emb.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos_q(int_dot(F.col("qq"), F.col("q")), F.col("qn2"), F.col("n2")).alias("cos_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_q", "rnk")
    )


_IVF_ORACLE = f"""
WITH {_EMB_CTE},
cents AS (SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM en WHERE vec_id < {N_CENTROIDS}),
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT v.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {cos_q_sql(int_dot_sql('v.q', 'c.cq'), 'v.n2', 'c.cn2')} DESC, c.cent_id
           ) AS rn
    FROM en v CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cent_id AS cell FROM (
    SELECT q.vec_id AS query_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {cos_q_sql(int_dot_sql('q.q', 'c.cq'), 'q.n2', 'c.cn2')} DESC, c.cent_id
           ) AS rn
    FROM en q CROSS JOIN cents c WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {N_PROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos_q, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT cand.query_id, cand.neighbor_id,
         {cos_q_sql(int_dot_sql('q.q', 'v.q'), 'q.n2', 'v.n2')} AS cos_q,
         ROW_NUMBER() OVER (
           PARTITION BY cand.query_id
           ORDER BY {cos_q_sql(int_dot_sql('q.q', 'v.q'), 'q.n2', 'v.n2')} DESC, cand.neighbor_id
         ) AS rnk
  FROM cand
  JOIN en q ON q.vec_id = cand.query_id
  JOIN en v ON v.vec_id = cand.neighbor_id
)
WHERE rnk <= {IVF_TOP_K}
"""


@query("ann_ivf_topk", _IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of {N_CENTROIDS}
    centroids (broadcast centroids → map-side argmax, ties → smallest
    cent_id); each query probes its {N_PROBE} nearest cells and ranks only
    candidates in those cells. The 100 TB shape: the big side is touched
    once map-side for assignment, candidate search prunes ~(1 - nprobe/
    ncells) of the data, and cells can be written `partitionBy(cell)` so
    probes become partition-pruned scans. Exact-rank parity with the oracle
    because assignment and scoring are integer-exact."""
    emb = shared(with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings"))))
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("q").alias("cq"), F.col("n2").alias("cn2")
    )

    def nearest_cells(vecs: DataFrame, id_out: str, keep: int) -> DataFrame:
        scored = vecs.crossJoin(F.broadcast(cents)).select(
            F.col("vec_id").alias(id_out),
            "cent_id",
            cos_q(int_dot(F.col("q"), F.col("cq")), F.col("n2"), F.col("cn2")).alias("c"),
        )
        w = Window.partitionBy(id_out).orderBy(F.desc("c"), F.asc("cent_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select(id_out, F.col("cent_id").alias("cell"))
        )

    assign = nearest_cells(emb, "vec_id", keep=1)
    probes = nearest_cells(emb.filter(F.col("vec_id") < N_QUERIES), "query_id", keep=N_PROBE)
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qsides = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    vsides = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("vq"), F.col("n2").alias("vn2")
    )
    scored = (
        cand.join(F.broadcast(qsides), "query_id")
        .join(vsides, "neighbor_id")
        .withColumn(
            "cos_q",
            cos_q(int_dot(F.col("qq"), F.col("vq")), F.col("qn2"), F.col("vn2")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "cos_q", "rnk")
    )


_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_ivf_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """Materialize the IVF index: every vector stored under its cell via
    `partitionBy("cell")`. This is the build-once step of a real ANN
    service — at 100 TB the index write is the only full pass over the
    vectors; every probe afterwards opens ONLY the nprobe cell directories
    (partition pruning), never the other (1 - nprobe/ncells) of the data."""
    emb = shared(with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings"))))
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("q").alias("cq"), F.col("n2").alias("cn2")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "q",
        "n2",
        "cent_id",
        cos_q(int_dot(F.col("q"), F.col("cq")), F.col("n2"), F.col("cn2")).alias("c"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("cent_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "q", "n2", F.col("cent_id").alias("cell"))
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(index_path)


def probe_cells_for_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (query_id, cell) probe list: each query's N_PROBE nearest
    centroids. Tiny by construction (queries × nprobe rows)."""
    emb = with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings")))
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("q").alias("cq"), F.col("n2").alias("cn2")
    )
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    scored = qs.crossJoin(F.broadcast(cents)).select(
        F.col("vec_id").alias("query_id"),
        "cent_id",
        cos_q(int_dot(F.col("q"), F.col("cq")), F.col("n2"), F.col("cn2")).alias("c"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", F.col("cent_id").alias("cell"))
    )


INDEX_SCHEMA = "vec_id bigint, q array<bigint>, n2 bigint, cell bigint"


def pruned_candidates(
    spark: SparkSession, index_path: str, probes: DataFrame
) -> DataFrame:
    """Read ONLY the probed cells from the materialized index. The
    `cell IN (...)` filter hits the partition column, so the scan's
    PartitionFilters prune every non-probed cell directory — gated by
    tests/test_plan_quality.py. The probe-cell list is queries×nprobe
    values; collecting it to build the IN-list is the same affordable
    driver scalar as an IVF service's query-side routing. Schema is pinned
    (an index built from ZERO vectors has no data files to infer from)."""
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    return (
        spark.read.schema(INDEX_SCHEMA).parquet(index_path).filter(F.col("cell").isin(cells))
    )


@query("ann_ivf_materialized", _IVF_ORACLE)
def ann_ivf_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the index MATERIALIZED `partitionBy(cell)` (the scale path
    the `ann_ivf_topk` docstring promises): build once, then candidate
    search is a partition-pruned scan of only the probed cells. Result is
    rank-identical to `ann_ivf_topk` / the oracle — integer-exact scoring
    makes assignment and ranking deterministic."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    index_path = os.path.join(_REPO, ".tmp", "ivf", tag, "index")
    build_ivf_index(spark, sf_dir, index_path)

    probes = shared(probe_cells_for_queries(spark, sf_dir))
    cand_src = pruned_candidates(spark, index_path, probes)
    cand = (
        probes.join(cand_src, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "q", "n2")
    )
    emb = with_quantized(load_table(spark, sf_dir, "embeddings"))
    qsides = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    scored = cand.join(F.broadcast(qsides), "query_id").withColumn(
        "cos_q", cos_q(int_dot(F.col("qq"), F.col("q")), F.col("qn2"), F.col("n2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "cos_q", "rnk")
    )


_RECALL_ORACLE = f"""
WITH brute AS ({_BRUTE_ORACLE}),
ivf AS ({_IVF_ORACLE})
SELECT i.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST({IVF_TOP_K} AS BIGINT) AS k
FROM ivf i
JOIN brute b ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
WHERE b.rnk <= {IVF_TOP_K}
GROUP BY i.query_id
"""


@query("ann_recall", _RECALL_ORACLE)
def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@{IVF_TOP_K} of the IVF candidate
    path against the exact brute-force ranking — the measurement that
    justifies (or rejects) an index's nprobe/ncells setting before it
    ships. Composes the two existing ANN plans and joins their top-k sets;
    output is (query_id, n_matched, k), exact integers."""
    brute = ann_cosine_topk(spark, sf_dir).filter(F.col("rnk") <= IVF_TOP_K)
    ivf = ann_ivf_topk(spark, sf_dir)
    return (
        ivf.join(
            brute.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.lit(IVF_TOP_K).cast("bigint").alias("k"),
        )
    )


# ----------------------------------------------------------------------
# embedding_dim_stats — per-dimension profile of the embedding column
# (n / min / max / decimal-exact mean): the feature-normalization stats
# every vector pipeline computes before quantization or whitening.
# posexplode fans each vector into (dim, x) pairs map-side (x64 rows,
# the columnar pivot of the array layout) and ONE partial-aggregated
# groupBy(dim) shuffle — 64 output rows regardless of corpus size.
# FLOAT → DOUBLE casts are exact, min/max are order-independent, and the
# mean goes through `dsum` quantization, so the profile is bit-identical
# at any parallelism.
# ----------------------------------------------------------------------

_DIM = 64  # embedding dimensionality (model constant, asserted in tests)

from hadoop_spark.functions.numeric import dsum_sql as _dsum_sql  # noqa: E402
from hadoop_spark.functions.numeric import fsum as _fsum  # noqa: E402
from hadoop_spark.functions.numeric import fsum_sql as _fsum_sql  # noqa: E402

_DIM_STATS_ORACLE = f"""
WITH d AS (
  SELECT j - 1 AS dim, CAST(embedding[CAST(j AS INT)] AS DOUBLE) AS x
  FROM embeddings, range(1, {_DIM + 1}) r(j)
  WHERE j <= len(embedding)
)
SELECT dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(x) AS lo,
       MAX(x) AS hi,
       ({_fsum_sql("x", 8)} / CAST(COUNT(*) AS DOUBLE)) AS mean
FROM d GROUP BY dim
"""


@query("embedding_dim_stats", _DIM_STATS_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.numeric import dsum

    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    return d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        # fsum: float32-origin embedding values can land on exact decimal
        # tie boundaries where the engines' cast rules differ (r10 audit).
        _fsum(F.col("x"), 8).alias("mean_sum"),
    ).select(
        "dim",
        "n",
        "lo",
        "hi",
        (F.col("mean_sum") / F.col("n").cast("double")).alias("mean"),
    )


# ----------------------------------------------------------------------
# embedding_int8_quantize — symmetric per-dimension int8 quantization,
# the storage/bandwidth prep step before shipping vectors to an ANN
# index (4× smaller than float32; the PQ stack in queries_cluster
# compresses further). Per-dim scale = absmax (one 64-row aggregate,
# collected under the same bounded-side-data rule as the PQ codebook),
# then code_i = clamp(floor(x_i / absmax_d * 127 + 0.5), ±127) computed
# MAP-SIDE via a transform() over the array with the scales as a literal
# — zero shuffles after the stats pass. Every arithmetic op is IEEE
# double (÷, ×, +, floor), so codes are bit-identical across engines —
# verified by the oracle recomputing the scales and codes itself from
# scratch. Output: per-vector code checksums + saturation count (the
# quantization-quality report).
# ----------------------------------------------------------------------

_INT8_ORACLE = f"""
WITH d AS (
  SELECT vec_id, j - 1 AS dim, CAST(embedding[CAST(j AS INT)] AS DOUBLE) AS x
  FROM embeddings, range(1, {_DIM + 1}) r(j)
  WHERE j <= len(embedding)
),
scales AS (
  SELECT dim, MAX(ABS(x)) AS amax FROM d GROUP BY dim
),
codes AS (
  SELECT d.vec_id,
         CAST(GREATEST(-127, LEAST(127,
           CASE WHEN s.amax = 0 THEN 0
                ELSE FLOOR(d.x / s.amax * 127 + 0.5) END)) AS BIGINT) AS code
  FROM d JOIN scales s ON d.dim = s.dim
)
SELECT vec_id,
       CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(SUM(ABS(code)) AS BIGINT) AS code_l1,
       CAST(SUM(CASE WHEN ABS(code) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat
FROM codes GROUP BY vec_id
"""


@query("embedding_int8_quantize", _INT8_ORACLE)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    stats = (
        emb.select(F.posexplode("embedding").alias("dim", "xf"))
        .groupBy("dim")
        .agg(F.max(F.abs(F.col("xf").cast("double"))).alias("amax"))
        .collect()
    )
    amax = [0.0] * _DIM
    for r in stats:
        amax[r["dim"]] = r["amax"]
    scales = F.array(*[F.lit(a) for a in amax])
    codes = F.transform(
        F.col("embedding"),
        lambda x, i: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.when(F.element_at(scales, i + 1) == 0.0, F.lit(0)).otherwise(
                    F.floor(
                        x.cast("double")
                        / F.element_at(scales, i + 1)
                        * 127
                        + 0.5
                    )
                ).cast("int"),
            ),
        ).cast("bigint"),
    )
    rows = emb.select("vec_id", codes.alias("code"))
    return rows.select(
        "vec_id",
        F.aggregate(
            "code", F.lit(0).cast("bigint"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.aggregate(
            "code", F.lit(0).cast("bigint"), lambda acc, c: acc + F.abs(c)
        ).alias("code_l1"),
        F.aggregate(
            "code",
            F.lit(0).cast("bigint"),
            lambda acc, c: acc
            + F.when(F.abs(c) == 127, F.lit(1).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            ),
        ).alias("n_sat"),
    )


# ----------------------------------------------------------------------
# ann_hard_negatives — contrastive-training data mining: for each query
# vector, the top-K most similar vectors with a DIFFERENT label (the
# "hard negatives" an embedding trainer pairs against positives). Same
# plan spine as ann_cosine_topk — tiny query set broadcast against the
# corpus, integer-quantized cosine, per-query partial top-k — plus the
# label-inequality predicate evaluated map-side in the same stage, so
# mining negatives costs exactly one corpus pass at any scale.
# ----------------------------------------------------------------------

_HARDNEG_K = 5

_HARDNEG_ORACLE = f"""
WITH {_EMB_CTE},
lab AS (SELECT vec_id, label FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         lv.label AS neg_label,
         {cos_q_sql(int_dot_sql('q.q', 'v.q'), 'q.n2', 'v.n2')} AS cos_q
  FROM en q
  JOIN lab lq ON lq.vec_id = q.vec_id
  JOIN en v ON v.vec_id <> q.vec_id
  JOIN lab lv ON lv.vec_id = v.vec_id
  WHERE q.vec_id < {N_QUERIES} AND lv.label <> lq.label
)
SELECT query_id, neighbor_id, neg_label, cos_q, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_q DESC, neighbor_id
  ) AS rnk
  FROM scored
)
WHERE rnk <= {_HARDNEG_K}
"""


@query("ann_hard_negatives", _HARDNEG_ORACLE)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings")))
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("n2").alias("qn2"),
        F.col("label").alias("q_label"),
    )
    scored = emb.join(
        F.broadcast(qs),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") != F.col("q_label")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neg_label"),
        cos_q(int_dot(F.col("qq"), F.col("q")), F.col("qn2"), F.col("n2")).alias(
            "cos_q"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _HARDNEG_K)
        .select("query_id", "neighbor_id", "neg_label", "cos_q", "rnk")
    )


# ----------------------------------------------------------------------
# ann_lsh_topk — the LSH-bucketed ANN variant (sign-random-projection):
# 8 fixed hyperplanes (integer weights derived from md5 at build time —
# embedded as LITERALS in both engines) hash every vector to an 8-bit
# bucket MAP-SIDE (integer dot signs, no shuffle); each query probes its
# own bucket plus the 8 one-bit-flip neighbors (multiprobe) and rescores
# only those candidates with the exact integer cosine. Complements the
# IVF family: no training/centroid pass at all — the bucket function is
# data-independent, so the index is a pure projection (writable
# partitionBy(bucket) exactly like the IVF index). All arithmetic exact:
# |q|≤1e7, |w|≤1000, 64 dims ⇒ |dot| < 6.4e11 < 2^53.
# ----------------------------------------------------------------------

import hashlib as _hashlib

_LSH_PLANES = 8
_LSH_TOP_K = 5
_LSH_W = [
    [
        (int(_hashlib.md5(f"lsh{j}_{d}".encode()).hexdigest()[:8], 16) % 2001)
        - 1000
        for d in range(64)
    ]
    for j in range(_LSH_PLANES)
]


def _lsh_bucket_sql(qcol: str) -> str:
    bits = " + ".join(
        f"(CASE WHEN CAST(list_dot_product({qcol}, "
        f"{_LSH_W[j]}) AS BIGINT) >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_LSH_PLANES)
    )
    return f"({bits})"


_LSH_ORACLE = f"""
WITH {_EMB_CTE},
bk AS (
  SELECT vec_id, q, n2, {_lsh_bucket_sql('q')} AS bucket FROM en
),
probes AS (
  SELECT vec_id AS query_id, xor(bucket, flip) AS pbucket
  FROM bk, (SELECT unnest([0{"".join(f", {1 << j}" for j in range(_LSH_PLANES))}]) AS flip)
  WHERE vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT p.query_id, v.vec_id AS neighbor_id
  FROM probes p JOIN bk v ON v.bucket = p.pbucket
  WHERE v.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos_q, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT cand.query_id, cand.neighbor_id,
         {cos_q_sql(int_dot_sql('q.q', 'v.q'), 'q.n2', 'v.n2')} AS cos_q,
         ROW_NUMBER() OVER (
           PARTITION BY cand.query_id
           ORDER BY {cos_q_sql(int_dot_sql('q.q', 'v.q'), 'q.n2', 'v.n2')} DESC,
                    cand.neighbor_id
         ) AS rnk
  FROM cand
  JOIN en q ON q.vec_id = cand.query_id
  JOIN en v ON v.vec_id = cand.neighbor_id
)
WHERE rnk <= {_LSH_TOP_K}
"""


@query("ann_lsh_topk", _LSH_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.operators.similarity import sign_projection_buckets

    emb = shared(with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings"))))

    # r10: the 8-plane sign-projection hash runs as ONE integer-matmul
    # Arrow kernel over the cached corpus instead of 8 chained interpreted
    # F.aggregate/zip_with HOFs (512-literal plan tree, no codegen —
    # measured ~4.8 s warm for the bucket pass alone at sf0.1; kernel is
    # milliseconds; bit-identical incl. the malformed-row -> bucket-0
    # degrade, pinned by tests/test_sign_projection.py). The (vec_id,
    # bucket) frame is persisted: probes and the candidate join both
    # consume it, and a Python map is the subtree the stage cache cannot
    # dedupe (the knn_graph lesson); it is 2 bigints/row — cache cost nil.
    buckets = shared(
        sign_projection_buckets(
            emb, _LSH_W, keep=["vec_id"], schema="vec_id bigint, bucket bigint"
        )
    )

    flips = F.array(
        F.lit(0), *[F.lit(1 << j) for j in range(_LSH_PLANES)]
    )
    probes = (
        buckets.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(flips).alias("flip"),
            "bucket",
        )
        .select(
            "query_id",
            F.col("bucket").bitwiseXOR(F.col("flip")).alias("pbucket"),
        )
    )
    cand = (
        probes.join(
            buckets.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("bucket").alias("pbucket"),
            ),
            "pbucket",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qsides = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    vsides = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("vq"), F.col("n2").alias("vn2")
    )
    scored = (
        cand.join(F.broadcast(qsides), "query_id")
        .join(vsides, "neighbor_id")
        .withColumn(
            "cos_q",
            cos_q(int_dot(F.col("qq"), F.col("vq")), F.col("qn2"), F.col("vn2")),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rnk") <= _LSH_TOP_K)
        .select("query_id", "neighbor_id", "cos_q", "rnk")
    )


_LSH_RECALL_ORACLE = f"""
WITH brute AS ({_BRUTE_ORACLE}),
lsh AS ({_LSH_ORACLE})
SELECT l.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST({_LSH_TOP_K} AS BIGINT) AS k
FROM lsh l
JOIN brute b ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
WHERE b.rnk <= {_LSH_TOP_K}
GROUP BY l.query_id
"""


@query("ann_lsh_recall", _LSH_RECALL_ORACLE)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{_LSH_TOP_K} of the sign-LSH multiprobe path vs the exact
    ranking — the planes/probes sizing measurement, completing the eval
    set (ann_recall for IVF, ann_pq_recall for PQ, lsh_candidate_quality
    for minhash banding)."""
    brute = ann_cosine_topk(spark, sf_dir).filter(F.col("rnk") <= _LSH_TOP_K)
    lsh = ann_lsh_topk(spark, sf_dir)
    return (
        lsh.join(
            brute.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.lit(_LSH_TOP_K).cast("bigint").alias("k"),
        )
    )


# ----------------------------------------------------------------------
# embedding_norm_outliers — vector-quality gate for an embedding corpus:
# flag vectors whose squared norm falls outside the robust Tukey fence
# (Q3 + 3·IQR / Q1 − 3·IQR) of the corpus distribution. Degenerate norms
# are the standard symptom of truncated inputs or collapsed encoders,
# and gating them precedes any ANN/dedup stage. Exactness: the norm is
# the integer dot product of the 1e7-quantized vector with itself (the
# repo's embedding discipline), quantile cuts come from the bounded
# value histogram of norm KILO-buckets (`operators/stats.group_quantiles`
# — one partial-aggregated shuffle, broadcast back), and the fence test
# is pure integer comparison. No floats anywhere.
# ----------------------------------------------------------------------

_NORM_QS = {"q1": 0.25, "q3": 0.75}


def _norm_outlier_oracle() -> str:
    from hadoop_spark.operators.stats import group_quantiles_sql

    return f"""
WITH nrm AS (
  SELECT vec_id,
         {int_dot_sql(quantize_sql("embedding"), quantize_sql("embedding"))}
           AS n2
  FROM embeddings
),
nb AS (SELECT vec_id, n2, CAST(n2 // 1000 AS BIGINT) AS nk FROM nrm),
nq_src AS (SELECT 1 AS g, nk FROM nb),
{group_quantiles_sql("nq_src", "g", "nk", _NORM_QS, "nq")}
SELECT nb.vec_id, nb.n2,
       (nb.nk > nq.q3 + 3 * (nq.q3 - nq.q1)
        OR nb.nk < nq.q1 - 3 * (nq.q3 - nq.q1)) AS is_outlier
FROM nb, nq
"""


@query("embedding_norm_outliers", _norm_outlier_oracle())
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.operators.stats import group_quantiles

    emb = with_quantized(load_table(spark, sf_dir, "embeddings"))
    nb = emb.select(
        "vec_id", "n2", F.floor(F.col("n2") / 1000).cast("bigint").alias("nk")
    )
    cuts = group_quantiles(
        nb.select(F.lit(1).alias("g"), "nk"), "g", "nk", _NORM_QS
    ).select("q1", "q3")
    iqr3 = (F.col("q3") - F.col("q1")) * 3
    return nb.join(F.broadcast(cuts)).select(
        "vec_id",
        "n2",
        (
            (F.col("nk") > F.col("q3") + iqr3)
            | (F.col("nk") < F.col("q1") - iqr3)
        ).alias("is_outlier"),
    )


# ----------------------------------------------------------------------
# knn_graph — exact k-nearest-neighbor graph (k = 5, cosine) over the
# embedding corpus: the construction step of graph-based ANN indexes
# (HNSW/NN-descent seeds), dedup-cluster refinement, and label
# propagation over semantic neighborhoods. Exact-baseline shape: the
# blocked-GEMM all-pairs kernel (`block_near_dup_pairs` with the
# threshold floored) streams each unordered pair once, both directions
# are restored map-side, and a per-source top-k window picks the 5
# strongest edges (ties break on neighbor id). At 100 TB the all-pairs
# stage swaps for IVF/LSH candidate generation feeding the SAME top-k —
# the documented recall-vs-cost dial of `ann_ivf_topk`/`ann_lsh_recall`.
# ----------------------------------------------------------------------

_KNN_K = 5

_KNN_ORACLE = f"""
WITH {_EMB_CTE.replace("embeddings", "embeddings")},
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         {cos_q_sql(int_dot_sql('a.q', 'b.q'), 'a.n2', 'b.n2')} AS cos_q
  FROM en a JOIN en b ON a.vec_id <> b.vec_id
),
rk AS (
  SELECT src, dst, cos_q,
         row_number() OVER (
           PARTITION BY src ORDER BY cos_q DESC, dst
         ) AS rnk
  FROM pairs
)
SELECT src AS vec_id, CAST(rnk AS BIGINT) AS rnk,
       dst AS neighbor_id, cos_q
FROM rk WHERE rnk <= {_KNN_K}
"""


@query("knn_graph", _KNN_ORACLE)
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.operators.similarity import block_near_dup_pairs

    emb = shared(
        with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings")))
    )
    # threshold below cosine's range → every pair once (id_a < id_b).
    # Persisted: the symmetrizing union below consumes the pair stream
    # TWICE, and a Python cogroup is exactly the subtree the stage cache
    # cannot dedupe (shared() caveat; plan check r10: the unpersisted plan
    # instantiates FlatMapCoGroupsInPandas 4x with 0 ReusedExchange — both
    # branches re-run the GEMM; persisted, both read the cache). At 100 TB
    # the blocked GEMM is the dominant stage — running it once is the point.
    pairs = shared(
        block_near_dup_pairs(emb, threshold_micro=-1_000_001, num_blocks=8)
    )
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cos_q"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "cos_q"
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_q").desc(), F.col("dst"))
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _KNN_K)
        .select(
            F.col("src").alias("vec_id"), "rnk",
            F.col("dst").alias("neighbor_id"), "cos_q",
        )
    )


# ----------------------------------------------------------------------
# subspace_energy — PQ-subspace diagnostics: the 64-dim embedding space
# splits into eight 8-dim blocks (exactly the product-quantizer's
# subspaces, `ann_pq_adc`) and each block reports its share of the total
# centered variance. A skewed energy profile means PQ codebooks are
# misallocated (rotate or re-block before training); a flat one blesses
# the split. Exact arithmetic end-to-end: per-dim Σx and Σx² are
# integer sums of 1e7-quantized values, the centered energy clears to
# the common denominator n (DECIMAL(38,0)), and only the final share
# divides — the anova_oneway discipline applied per dimension block.
# ----------------------------------------------------------------------

_SUBSPACE_BLOCK = 8


def _subspace_oracle() -> str:
    return f"""
WITH x AS (
  SELECT vec_id, CAST(j - 1 AS BIGINT) AS dim,
         CAST(ROUND(CAST(embedding[CAST(j AS INT)] AS DOUBLE) * 10000000)
              AS BIGINT) AS q
  FROM embeddings, range(1, 65) r(j)
  WHERE j <= len(embedding)
),
d AS (
  SELECT dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS ss
  FROM x GROUP BY dim
),
e AS (
  -- centered energy * n (exact integer): n*Σq² − (Σq)²
  SELECT CAST(dim // {_SUBSPACE_BLOCK} AS BIGINT) AS block,
         CAST(n * ss - s * s AS DECIMAL(38,0)) AS en,
         n
  FROM d
),
b AS (
  SELECT block,
         CAST(SUM(en) AS DECIMAL(38,0)) AS block_en,
         MAX(n) AS n
  FROM e GROUP BY block
),
t AS (SELECT CAST(SUM(block_en) AS DECIMAL(38,0)) AS tot FROM b)
SELECT b.block,
       CAST(CAST(b.block_en AS VARCHAR) AS DOUBLE)
         / (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE) * 1e14) AS energy,
       CAST(CAST(b.block_en AS VARCHAR) AS DOUBLE)
         / CAST(CAST(t.tot AS VARCHAR) AS DOUBLE) AS energy_share
FROM b, t
"""


@query("subspace_energy", _subspace_oracle())
def subspace_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim_i", "xf")
    ).select(
        F.col("dim_i").cast("bigint").alias("dim"),
        F.round(F.col("xf").cast("double") * 10_000_000)
        .cast("bigint")
        .alias("q"),
    )
    d = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    e = d.select(
        F.floor(F.col("dim") / _SUBSPACE_BLOCK).cast("bigint").alias("block"),
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        .cast("decimal(38,0)")
        .alias("en"),
        "n",
    )
    b = e.groupBy("block").agg(
        F.sum("en").cast("decimal(38,0)").alias("block_en"),
        F.max("n").alias("n"),
    )
    t = b.agg(F.sum("block_en").cast("decimal(38,0)").alias("tot"))
    energy = F.col("block_en").cast("string").cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double") * F.lit(1e14)
    )
    # r10 audit: raw IEEE share of exact integer block energies.
    share = F.col("block_en").cast("string").cast("double") / F.col(
        "tot"
    ).cast("string").cast("double")
    return b.join(F.broadcast(t)).select(
        "block", energy.alias("energy"), share.alias("energy_share")
    )


# ----------------------------------------------------------------------
# jl_norm_distortion — Johnson-Lindenstrauss random projection (±1
# signs, 64 → 16 dims) with an exact distortion audit. The sign matrix
# is a deterministic md5-derived literal shared by both engines (the
# DistributedCache/codebook pattern, as `_LSH_W` above); vectors are
# re-quantized at 1e4 so every projected coordinate, squared norm, and
# the 5*pn2 DIV 4*n2 bucket index stay EXACT integers below 2^53 (DuckDB
# evaluates list_dot_product in doubles — the quantization scale is
# chosen so that is still exact). The whole operator is one map-side
# expression pass over the corpus plus a 21-cell aggregation: the shape
# that projects 100 TB of embeddings without a shuffle beyond the final
# histogram. Distortion profile: histogram of ||proj||^2/(K*||v||^2)
# in 0.05 buckets, with the exact mean ratio per bucket.
# ----------------------------------------------------------------------

import hashlib as _jl_hashlib

_JL_K, _JL_D, _JL_SCALE = 16, 64, 10_000
_JL_SIGNS = [
    [
        1
        if int(_jl_hashlib.md5(f"jl:{k}:{d}".encode()).hexdigest()[:15], 16) % 2 == 0
        else -1
        for d in range(_JL_D)
    ]
    for k in range(_JL_K)
]


def _jl_oracle() -> str:
    rows = ", ".join(
        "list_dot_product(q4, [" + ", ".join(str(s) for s in sk) + "])"
        for sk in _JL_SIGNS
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * {_JL_SCALE}) AS BIGINT)) AS q4
  FROM embeddings
), pr AS (
  SELECT vec_id,
         CAST(list_dot_product(q4, q4) AS BIGINT) AS n2,
         list_transform([{rows}], p -> CAST(p AS BIGINT) * CAST(p AS BIGINT))
           AS p2
  FROM q
), r AS (
  SELECT vec_id, n2,
         CAST(list_sum(p2) AS BIGINT) AS pn2
  FROM pr WHERE n2 > 0
)
SELECT (5 * pn2) // (4 * n2) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       -- both engines divide IDENTICAL floor-quantized exact sums by
       -- identical counts: the raw IEEE quotient is bit-equal, and any
       -- DECIMAL quantization would only reintroduce the
       -- HALF_UP/half-even tie divergence (observed 1-ulp flip)
       {_fsum_sql(f"CAST(pn2 AS DOUBLE) / ({_JL_K}.0 * CAST(n2 AS DOUBLE))", 12)}
         / CAST(COUNT(*) AS DOUBLE) AS mean_ratio
FROM r GROUP BY 1
"""


@query("jl_norm_distortion", _jl_oracle())
def jl_norm_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL ±1 projection 64→16 with exact-integer norm-distortion histogram.

    The tie-sensitive quantization (F.round HALF_UP) stays JVM-side; the
    17 integer dot products run in an Arrow-batched numpy kernel. The
    previous all-JVM form chained zip_with/aggregate higher-order
    functions, which Spark evaluates with INTERPRETED per-element
    lambdas (no whole-stage codegen) — ~1.2 ms/row map-side, i.e. CPU-
    hours per 10⁹ vectors. The int64 matmul is the same exact integers
    (|q|≤1e4·64 dims → pn2 ≤ 6.4e12, far under 2^63) — r8 A/B:
    bit-equal, 4.0→0.57 s at sf0.1 and 11.2→1.9 s at ×30. The one
    exception to "prefer built-ins over Python" the guide itself makes:
    HOF lambda chains are not the vectorized JVM path that rule
    protects.

    Intentional divergence from the retired HOF form (ADVICE r8 #3): a
    row whose embedding length != 64 is treated as MALFORMED and dropped.
    The old ``zip_with``/``aggregate`` chain kept such a row with a valid
    ``n2 > 0`` and a null ``pn2`` (zip_with null-pads the shorter side),
    surfacing it as a null-bucket histogram row; this kernel drops it at
    the length gate instead — a short vector carries no 64-dim projection
    semantics, so a null-keyed bucket row was noise, not signal. The
    fixture (and any well-formed embeddings table) is all-64-dim, where
    the two forms are bit-equal (r8 A/B)."""
    import numpy as np
    import pandas as pd

    from hadoop_spark.functions.numeric import dsum

    emb = load_table(spark, sf_dir, "embeddings")
    q4 = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * _JL_SCALE).cast("bigint")
    )
    q = emb.select("vec_id", q4.alias("q4"))
    S = np.array(_JL_SIGNS, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            # null/malformed rows: the HOF form propagated a null element
            # to a null n2 which the n2 > 0 filter dropped — reproduce
            # that drop (r8 review: np.int64 conversion would crash on a
            # null ELEMENT instead). Detect via float64 (None -> nan;
            # exact below 2^53, and |q4| <= 1e4 scale), length-gate first
            # so a short array can't make the ndarray ragged.
            pdf = pdf[pdf["q4"].notna()]
            pdf = pdf[pdf["q4"].map(len) == _JL_D]
            if not len(pdf):
                continue
            A = np.array(pdf["q4"].tolist(), dtype=np.float64)
            clean = ~np.isnan(A).any(axis=1)
            pdf = pdf[clean]
            if not len(pdf):
                continue
            Q = A[clean].astype(np.int64)  # (n, 64), exact
            n2 = (Q * Q).sum(axis=1)
            P = Q @ S.T  # (n, 16), exact int64
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "n2": n2, "pn2": (P * P).sum(axis=1)}
            )

    r = q.mapInPandas(kernel, "vec_id bigint, n2 bigint, pn2 bigint").filter(
        F.col("n2") > 0
    )
    ratio = F.col("pn2").cast("double") / (
        F.lit(float(_JL_K)) * F.col("n2").cast("double")
    )
    return r.select(
        F.expr("(5 * pn2) DIV (4 * n2)").alias("bucket"), ratio.alias("ratio")
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        (_fsum(F.col("ratio"), 12) / F.count(F.lit(1)).cast("double")).alias(
            "mean_ratio"
        ),
    )


# ----------------------------------------------------------------------
# ann_mrr — mean reciprocal rank of the exact nearest neighbor inside
# the IVF top-k: the ranking-quality companion to `ann_recall` (recall
# counts membership; MRR penalizes the index for burying the true #1).
# Reciprocal ranks are EXACT integers via the LCM trick (60/r for
# r ≤ 5), summed exactly; the final MRR is one IEEE division. Composes
# the two existing ANN plans — no new index machinery.
# ----------------------------------------------------------------------

_MRR_LCM = 60  # lcm(1..IVF_TOP_K)

_ANN_MRR_ORACLE = f"""
WITH brute AS ({_BRUTE_ORACLE}),
ivf AS ({_IVF_ORACLE}),
true1 AS (
  SELECT query_id, neighbor_id FROM brute WHERE rnk = 1
), hit AS (
  SELECT t.query_id, i.rnk
  FROM true1 t JOIN ivf i
    ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
)
SELECT CAST((SELECT COUNT(*) FROM true1) AS BIGINT) AS n_queries,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(SUM({_MRR_LCM} // rnk) AS BIGINT) AS rr_scaled,
       CAST(SUM({_MRR_LCM} // rnk) AS DOUBLE)
         / ({_MRR_LCM}.0 * CAST((SELECT COUNT(*) FROM true1) AS DOUBLE))
         AS mrr
FROM hit
"""


@query("ann_mrr", _ANN_MRR_ORACLE)
def ann_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR of the exact #1 neighbor within the IVF top-k (LCM-exact)."""
    brute = ann_cosine_topk(spark, sf_dir).filter(F.col("rnk") == 1)
    ivf = ann_ivf_topk(spark, sf_dir)
    true1 = brute.select("query_id", "neighbor_id")
    hit = ivf.join(true1, ["query_id", "neighbor_id"]).select("query_id", "rnk")
    nq = true1.agg(F.count(F.lit(1)).cast("bigint").alias("n_queries"))
    agg = hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.sum(F.floor(_MRR_LCM / F.col("rnk"))).cast("bigint").alias("rr_scaled"),
    )
    return agg.join(F.broadcast(nq)).select(
        "n_queries",
        "n_hits",
        "rr_scaled",
        (
            F.col("rr_scaled").cast("double")
            / (float(_MRR_LCM) * F.col("n_queries").cast("double"))
        ).alias("mrr"),
    )
