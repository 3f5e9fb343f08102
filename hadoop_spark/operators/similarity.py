"""Similarity search over embedding columns (`array<float>`): exact cosine
top-k as the baseline, IVF cell-probing as the scale path.

No reference analogue (SURVEY §7 M9 extension). Spark-first design:

- Dot products ride `zip_with` + `aggregate` (JVM higher-order functions)
  when they appear O(1) times per row — no Python, no UDF. CAVEAT
  (measured, r8): Spark evaluates HOF lambdas INTERPRETED, outside
  whole-stage codegen, at ~1 µs per element — fine for one 64-dim dot
  per row, CPU-hours per 10⁹ rows once a row folds over K centroids or
  K projections. Those K-fold sites use `int_argmin_assign` below (or
  the jl kernel in queries_similarity.py): the same exact BIGINT
  arithmetic as an Arrow-batched numpy int64 matmul.
- **Integer quantization for determinism**: each float is quantized to a
  BIGINT at 1e7 scale; dot products and squared norms are then *exact*
  integer arithmetic (bounds: |q| < 1e7 ⇒ 64-dim dot < 6.4e15 < 2^63, and
  < 2^53 so DuckDB's DOUBLE-returning list_dot_product is also exact).
  The only float ops left are one sqrt+divide per pair — single IEEE ops on
  exactly-representable ints, bit-identical across engines. Cosine is
  reported as micro-units (`cos_q` = round(cos·1e6), BIGINT).
- Scale shape: brute force is O(n·q) per q queries — fine for reranking,
  wrong for n=10^9. IVF assigns every vector to its nearest centroid
  (map-side after a tiny broadcast of centroids), queries probe the
  `NPROBE` nearest cells — the candidate set shrinks by ~#cells; the
  centroid assignment join is a broadcast join, never a shuffle of the big
  side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 10_000_000  # 1e7: float32 → BIGINT micro-units
COS_SCALE = 1_000_000  # cosine reported in micro-units


def quantize(vec: Column) -> Column:
    """array<float> → array<bigint> at 1e7 scale (exact thereafter)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("bigint")
    )


def quantize_sql(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> CAST(ROUND(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def int_dot_sql(a: str, b: str) -> str:
    # list_dot_product returns DOUBLE; exact while |value| < 2^53 (see module
    # doc for bounds), cast back to BIGINT.
    return f"CAST(list_dot_product({a}, {b}) AS BIGINT)"


def int_argmin_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[int], int]],
    keep: list[str],
    schema: str,
    out: str = "cluster_id",
    d2_col: str | None = None,
    q_col: str = "q",
    n2_col: str = "n2",
) -> DataFrame:
    """Exact nearest-centroid assignment as an Arrow+numpy kernel.

    Semantically identical to the K-way ``F.aggregate`` fold it replaces
    (kmeans_assign / kmeans_iterate / cluster_purity, r8): per row the
    squared L2 to each centroid is the exact BIGINT
    ``n2 + cn2 − 2·(q·cq)``; ties keep the SMALLEST cid (``centroids``
    must be cid-ascending; ``argmin`` returns the first minimum, the
    fold's strict ``<`` kept the first too). int64 matmul bounds: with
    |q| < 1e7 (QUANT_SCALE) a 64-dim dot is < 6.4e15 and d2 < 2.6e16,
    far under 2^63 — bit-equal to the fold (A/B-verified).

    Why Python here: the fold evaluates K×dim interpreted lambda calls
    per row (HOFs run outside whole-stage codegen) — ~1.5 ms/row at
    K=8, dim=64. The kernel is one BLAS-shaped integer matmul per Arrow
    batch; the assignment stays map-side (zero shuffles), exactly as
    before.

    ``keep``: input columns copied through; ``schema``: output schema
    string for keep + out (+ d2_col when requested). Rows with a null
    ``q``/``n2`` get the first centroid and a null d2 — the fold's
    null-propagation behavior.
    """
    import numpy as np
    import pandas as pd

    cids = np.array([c[0] for c in centroids], dtype=np.int64)
    CQ = np.array([c[1] for c in centroids], dtype=np.int64)
    cn2 = np.array([c[2] for c in centroids], dtype=np.int64)
    keep = list(keep)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_df = pdf[keep].copy()
            dim = CQ.shape[1]
            ok = (
                ~pdf[q_col].isna()
                & ~pdf[n2_col].isna()
                & (pdf[q_col].map(lambda a: hasattr(a, "__len__") and len(a) == dim))
            ).to_numpy()
            if ok.any():
                # float64 pass detects null ELEMENTS (None -> nan) without
                # crashing the int64 conversion (r8 review); exact below
                # 2^53, and |q| < 1e7 per element
                A = np.array(pdf[q_col][ok].tolist(), dtype=np.float64)
                ok[np.flatnonzero(ok)[np.isnan(A).any(axis=1)]] = False
            cid_out = np.full(len(pdf), cids[0], dtype=np.int64)
            d2_vals = np.zeros(len(pdf), dtype=np.int64)  # stays int64: d2 > 2^53 must not round through float
            if ok.any():
                Q = np.array(pdf[q_col][ok].tolist(), dtype=np.int64)
                n2 = pdf[n2_col][ok].to_numpy(dtype=np.int64)
                D2 = n2[:, None] + cn2[None, :] - 2 * (Q @ CQ.T)
                idx = D2.argmin(axis=1)
                cid_out[ok] = cids[idx]
                d2_vals[ok] = D2[np.arange(len(idx)), idx]
            out_df[out] = cid_out
            if d2_col is not None:
                out_df[d2_col] = pd.arrays.IntegerArray(d2_vals, mask=~ok)
            yield out_df

    return df.select(*dict.fromkeys(keep + [q_col, n2_col])).mapInPandas(
        kernel, schema
    )


def sign_projection_buckets(
    df: DataFrame,
    planes: list[list[int]],
    keep: list[str],
    schema: str,
    out: str = "bucket",
    q_col: str = "q",
) -> DataFrame:
    """Sign-random-projection LSH bucket id as an Arrow+numpy kernel.

    Semantically identical to the chained-HOF fold it replaces
    (ann_lsh_topk, r10): per row and plane j the exact BIGINT dot
    ``q · w_j`` contributes ``1 << j`` when >= 0. The fold's degraded
    path is preserved bit-for-bit: a null ``q``, a null ELEMENT, or a
    length mismatch makes every plane's ``F.when(dot >= 0, ...)`` see a
    null dot and fall to the 0 branch — bucket 0 — and the kernel routes
    exactly those rows to bucket 0. int64 bounds: |q| < 1e7, |w| <= 1000,
    64 dims => |dot| < 6.4e11, far under 2^63 (integer matmul is exact
    and order-independent). Why Python: the fold evaluates
    planes x dim interpreted lambda calls per row OUTSIDE whole-stage
    codegen (measured ~4.8 s warm for 25 k x 8 x 64 at sf0.1, plus a
    512-literal plan tree rebuilt per run); the kernel is one integer
    matmul per Arrow batch, map-side, zero shuffles — the
    int_argmin_assign discipline applied to the hash family.
    """
    import numpy as np

    W = np.array(planes, dtype=np.int64)  # planes x dim
    pw = (np.int64(1) << np.arange(W.shape[0], dtype=np.int64)).astype(np.int64)
    keep = list(keep)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_df = pdf[keep].copy()
            dim = W.shape[1]
            ok = (
                ~pdf[q_col].isna()
                & (pdf[q_col].map(lambda a: hasattr(a, "__len__") and len(a) == dim))
            ).to_numpy()
            if ok.any():
                # float64 pass detects null elements (None -> nan) without
                # crashing the int64 conversion; exact below 2^53
                A = np.array(pdf[q_col][ok].tolist(), dtype=np.float64)
                ok[np.flatnonzero(ok)[np.isnan(A).any(axis=1)]] = False
            bucket = np.zeros(len(pdf), dtype=np.int64)
            if ok.any():
                Q = np.array(pdf[q_col][ok].tolist(), dtype=np.int64)
                B = Q @ W.T  # rows x planes, exact int64
                bucket[ok] = ((B >= 0) * pw[None, :]).sum(axis=1)
            out_df[out] = bucket
            yield out_df

    return df.select(*dict.fromkeys(keep + [q_col])).mapInPandas(kernel, schema)


def cos_q(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """Quantized cosine in micro-units from exact integer dot/norms."""
    cos = dot.cast("double") / (
        F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double"))
    )
    return F.round(cos * COS_SCALE).cast("bigint")


def cos_q_sql(dot: str, norm2_a: str, norm2_b: str) -> str:
    cos = (
        f"(CAST({dot} AS DOUBLE) / (sqrt(CAST({norm2_a} AS DOUBLE)) * "
        f"sqrt(CAST({norm2_b} AS DOUBLE))))"
    )
    return f"CAST(ROUND({cos} * {COS_SCALE}) AS BIGINT)"


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add quantized vector `q` and its exact squared norm `n2` (map-side)."""
    q = quantize(F.col(vec_col))
    return df.withColumn("q", q).withColumn("n2", int_dot(F.col("q"), F.col("q")))


def block_near_dup_pairs(
    emb: DataFrame, threshold_micro: int, num_blocks: int = 8
) -> DataFrame:
    """All-pairs cosine ≥ threshold via BLOCKED matrix multiply — the 100 TB
    shape for exact near-dup search:

    - vectors are bucketed into `num_blocks` blocks; the (NB+1 choose 2)
      unordered block pairs are enumerated (a fixed, tiny driver-side list)
      and each task computes one block-pair with a vectorized numpy GEMM
      over the Arrow-delivered batch. Replication factor is ~NB/2 per
      vector — the standard blocked all-pairs tradeoff — and no O(n²) row
      set ever materializes in the plan.
    - Determinism: the quantized vectors are BIGINTs with |dot| < 2^53 and
      every partial sum an exactly-representable integer, so float64 BLAS
      GEMM is EXACT regardless of summation order; the remaining
      sqrt/divide/round are single IEEE ops — bit-identical to the JVM and
      DuckDB expressions. Rounding is explicit HALF-UP (numpy's round is
      half-even, Spark's is half-up).
    """
    import pandas as pd

    spark = emb.sparkSession
    e = emb.select(
        "vec_id", "q", "n2", (F.col("vec_id") % num_blocks).alias("blk")
    )
    pairs = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(num_blocks) if i <= j],
        "bi int, bj int",
    )
    def side(join_col: str, tag: str) -> DataFrame:
        return (
            e.alias(f"e{tag}")
            .join(
                F.broadcast(pairs.alias(f"p{tag}")),
                F.col(f"e{tag}.blk") == F.col(f"p{tag}.{join_col}"),
            )
            .select(
                F.col(f"p{tag}.bi").alias("bi"),
                F.col(f"p{tag}.bj").alias("bj"),
                F.col(f"e{tag}.vec_id").alias("vec_id"),
                F.col(f"e{tag}.q").alias("q"),
                F.col(f"e{tag}.n2").alias("n2"),
            )
        )

    left = side("bi", "l")
    right = side("bj", "r")

    out_schema = "id_a bigint, id_b bigint, cos_q bigint"

    def gemm(key, lt: pd.DataFrame, rt: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if lt.empty or rt.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_q": []}).astype("int64")
        a = np.stack([np.asarray(v, dtype="float64") for v in lt["q"]])
        b = np.stack([np.asarray(v, dtype="float64") for v in rt["q"]])
        rn = np.sqrt(rt["n2"].to_numpy(dtype="float64"))[None, :]
        ln = np.sqrt(lt["n2"].to_numpy(dtype="float64"))
        ida_all = lt["vec_id"].to_numpy()
        idb = rt["vec_id"].to_numpy()[None, :]
        # Strip-chunk the GEMM: a whole block-pair similarity matrix is
        # (|block|)^2 doubles — at a fixed num_blocks that grows
        # quadratically with the corpus and OOMed the x100 probe (25k x
        # 25k x 8 B = 5 GB per task, 32 concurrent). Row strips bound
        # peak task memory at STRIP x |block| (~200 MB here) regardless
        # of corpus size, with bit-identical results (the integer GEMM
        # is exact in any chunking; each row's arithmetic is unchanged).
        STRIP = 1024
        outs = []
        for s0 in range(0, a.shape[0], STRIP):
            sl = slice(s0, s0 + STRIP)
            dots = a[sl] @ b.T  # exact: every intermediate an int < 2^53
            denom = ln[sl][:, None] * rn
            cos = dots / denom * COS_SCALE
            cos_q_m = (np.sign(cos) * np.floor(np.abs(cos) + 0.5)).astype(
                "int64"
            )
            ida = ida_all[sl][:, None]
            mask = (cos_q_m >= threshold_micro) & (ida != idb)
            ii, jj = np.nonzero(mask)
            if len(ii):
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(ida[ii, 0], idb[0, jj]),
                            "id_b": np.maximum(ida[ii, 0], idb[0, jj]),
                            "cos_q": cos_q_m[ii, jj],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_q": []}).astype("int64")
        out = pd.concat(outs, ignore_index=True)
        # same-block pairs appear twice in the matrix (x,y) and (y,x):
        # keep one; cross-block pairs appear once.
        return out.drop_duplicates(["id_a", "id_b"])

    # Pin the cogroup shuffle to the block-pair count: there are only
    # (NB+1 choose 2) groups, so the session default (200 on a vanilla
    # session) would fan the grouped-Python stage into hundreds of empty
    # tasks whose worker round-trips dominate wall-clock at small scale.
    # Pre-clustering on the group keys satisfies the cogroup's required
    # distribution, so no second shuffle is inserted.
    n_pairs = num_blocks * (num_blocks + 1) // 2
    left = left.repartition(n_pairs, "bi", "bj")
    right = right.repartition(n_pairs, "bi", "bj")
    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(gemm, out_schema)
    )


QUANTIZED_SQL_CTE = (
    "SELECT vec_id, {q} AS q, {n2} AS n2, label FROM embeddings"
).format(q=quantize_sql("embedding"), n2="CAST(list_dot_product({0}, {0}) AS BIGINT)".format(quantize_sql("embedding")))
