"""Distributed statistics over the event log (extension): finite-kernel
EWMA smoothing, per-group least-squares trend fitting, and robust
(median/MAD) anomaly flagging.

These are the aggregate/window statistics a metrics pipeline computes at
100 TB: everything is a grouped aggregation or a keyed window — one
shuffle on the group key, partial-aggregated map-side, no driver-side
data paths. Determinism follows the repo-wide discipline: exact-integer
or decimal-quantized sums (`functions/numeric.dsum`), identical
expression trees on the Spark and oracle sides, and DECIMAL-quantized
values wherever a comparison could flip on sub-ulp noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64_sql
from hadoop_spark.functions.numeric import dsum, dsum_sql, fsum, fsum_sql
from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import fanout_small, load_table, shared

# ----------------------------------------------------------------------
# ewma_smooth — 8-tap exponential moving average per user. The infinite-
# memory EWMA recurrence is inherently sequential and order-sensitive, so
# it has no batch-slicing-independent streaming-state form (the stateful
# ops in `streaming/windows.py` are deliberately commutative: count/sum,
# KMV set-union); the batch-scalable form of smoothing is the truncated
# kernel: y_t = sum_j w_j x_{t-j}
# / sum_j w_j over the taps present, with w_j = a(1-a)^j. A keyed window
# with 8 lag() taps — one shuffle on user_id, whole-stage-codegen'd, and
# at 100 TB each user's history sorts within its partition (no global
# sort, no single-partition window).
# Numerics (r10 quantization audit): numer and denom are identical
# left-associated IEEE chains of literal-weight multiplies over the same
# lag taps on both engines, so the raw quotient is bit-equal — the former
# DECIMAL(18,8) output cast was the only cross-engine divergence risk
# (Spark HALF_UP on the exact binary value vs DuckDB half-even on the
# 10^8-scaled double) and is deleted per the seasonal_decompose r9 fix.
# ----------------------------------------------------------------------

_ALPHA = 0.25
_TAPS = 8
_W = [repr(_ALPHA * (1.0 - _ALPHA) ** j) for j in range(_TAPS)]


def _ewma_oracle() -> str:
    lags = ",\n         ".join(
        f"lag(value, {j}) OVER w AS x{j}" for j in range(1, _TAPS)
    )
    numer = " + ".join(
        [f"CAST({_W[0]} AS DOUBLE) * value"]
        + [
            f"COALESCE(CAST({_W[j]} AS DOUBLE) * x{j}, CAST(0 AS DOUBLE))"
            for j in range(1, _TAPS)
        ]
    )
    denom = " + ".join(
        [f"CAST({_W[0]} AS DOUBLE)"]
        + [
            f"CASE WHEN x{j} IS NULL THEN CAST(0 AS DOUBLE)"
            f" ELSE CAST({_W[j]} AS DOUBLE) END"
            for j in range(1, _TAPS)
        ]
    )
    return f"""
WITH lagged AS (
  SELECT event_id, user_id, value,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, value,
       ({numer}) / ({denom}) AS ewma
FROM lagged
"""


@query("ewma_smooth", _ewma_oracle())
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-kernel EWMA per user over the event stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_id",
        "user_id",
        "value",
        *[F.lag("value", j).over(w).alias(f"x{j}") for j in range(1, _TAPS)],
    )
    numer = F.lit(float(_W[0])) * F.col("value")
    denom: F.Column = F.lit(float(_W[0]))
    for j in range(1, _TAPS):
        numer = numer + F.coalesce(
            F.lit(float(_W[j])) * F.col(f"x{j}"), F.lit(0.0)
        )
        denom = denom + F.when(
            F.col(f"x{j}").isNull(), F.lit(0.0)
        ).otherwise(F.lit(float(_W[j])))
    return lagged.select(
        "event_id",
        "user_id",
        "value",
        (numer / denom).alias("ewma"),
    )


# ----------------------------------------------------------------------
# linreg_per_group — per-event-type OLS trend (value vs. hours since the
# epoch origin) from the five classic sufficient statistics. All sums are
# exact (BIGINT for integer x, decimal-quantized for y and x*y), so slope
# and intercept are bit-identical at any parallelism; the closed form
# means ONE aggregation — no iteration, no collect, 100 TB = same plan.
# ----------------------------------------------------------------------

_T0 = 1704067200  # 2024-01-01T00:00:00Z, the fixture's epoch origin

_LINREG_ORACLE = f"""
WITH pts AS (
  SELECT event_type,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
           AS x,
         CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS y
  FROM events
), sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         {dsum_sql("y", 4)} AS sy,
         {dsum_sql("CAST(x AS DOUBLE) * y", 4)} AS sxy
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
FROM sums
"""


@query("linreg_per_group", _LINREG_ORACLE)
def linreg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-sufficient-statistics OLS slope/intercept per event_type."""
    ev = load_table(spark, sf_dir, "events")
    x = ((F.unix_timestamp("ts") - F.lit(_T0)) / F.lit(3600)).cast("long")
    y = F.col("value").cast("decimal(18,4)").cast("double")
    pts = ev.select("event_type", x.alias("x"), y.alias("y"))
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        dsum(F.col("y"), 4).alias("sy"),
        dsum(F.col("x").cast("double") * F.col("y"), 4).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    intercept = (F.col("sy") - slope * sxd) / nd
    # r10 audit: slope/intercept are raw IEEE quotients of exact,
    # engine-identical sufficient statistics (BIGINT sx/sxx, dsum sy/sxy)
    # — bit-equal without the former DECIMAL(18,10) finalization, which
    # was itself the only cross-engine tie risk.
    return sums.select(
        "event_type",
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


# ----------------------------------------------------------------------
# anomaly_mad — robust per-group outlier counts: |x - median| > 3 * MAD.
# Exact medians come from `operators/stats.group_median` — value-histogram
# rank selection, NOT percentile(): an exact percentile aggregate buffers
# every value of a group, and with few huge groups (5 event types x 20 B
# rows at 100 TB) that is a reducer OOM by construction. The histogram
# form's shuffle is bounded by |distinct values|, and its explicit
# (lo + hi) / 2 interpolation is mirrored verbatim in the oracle so the
# result is bit-identical (engine-internal quantile interpolation is
# not). r10 audit: med/mad/adev are all exact IEEE values over identical
# operands ((lo+hi)/2 of data values, |x-med|, 3*mad — every op exactly
# defined), so outputs AND the outlier comparison use the raw doubles;
# the former DECIMAL(18,6) casts were the only cross-engine tie risk and
# could themselves flip the flag they meant to stabilize.
# ----------------------------------------------------------------------

from hadoop_spark.operators.stats import group_median, group_median_sql  # noqa: E402

_MAD_ORACLE = f"""
WITH {group_median_sql("events", "event_type", "value", "med", "m1")},
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN m1 m ON e.event_type = m.event_type
),
{group_median_sql("dev", "event_type", "adev", "mad", "m2")}
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(d.med) AS med,
       MIN(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > 3 * m.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN m2 m ON d.event_type = m.event_type
GROUP BY d.event_type
"""


@query("anomaly_mad", _MAD_ORACLE)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection per event_type."""
    ev = load_table(spark, sf_dir, "events")
    med = group_median(ev, "event_type", "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = group_median(dev, "event_type", "adev", "mad")
    j = dev.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.sum(
            F.when(
                F.col("adev") > F.lit(3) * F.col("mad"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )


# ----------------------------------------------------------------------
# winsorized_stats — per-group p05/p95 clipping (winsorized mean + clip
# counts), the standard robust-mean prep before z-scoring noisy metrics.
# Cut points come from `operators/stats.group_quantiles`: ONE histogram
# shuffle yields every quantile (nearest-rank, so cut points are actual
# data values — identical doubles in both engines); the clip pass joins
# them back as a broadcast. No value-buffering percentile, no giant
# window.
# ----------------------------------------------------------------------

from hadoop_spark.operators.stats import (  # noqa: E402
    group_quantiles,
    group_quantiles_sql,
)

_WINSOR_ORACLE = f"""
WITH {group_quantiles_sql("events", "event_type", "value",
                          {"p05": 0.05, "p95": 0.95}, "qq")},
clipped AS (
  SELECT e.event_type, e.value, q.p05, q.p95,
         CASE WHEN e.value < q.p05 THEN q.p05
              WHEN e.value > q.p95 THEN q.p95
              ELSE e.value END AS w
  FROM events e JOIN qq q ON e.event_type = q.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi,
       MIN(p05) AS p05, MIN(p95) AS p95,
       ({dsum_sql("w", 4)} / CAST(COUNT(*) AS DOUBLE)) AS winsor_mean
FROM clipped GROUP BY event_type
"""


@query("winsorized_stats", _WINSOR_ORACLE)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P05/P95 winsorized mean per event_type, histogram-exact quantiles."""
    ev = load_table(spark, sf_dir, "events")
    q = group_quantiles(ev, "event_type", "value", {"p05": 0.05, "p95": 0.95})
    j = ev.join(F.broadcast(q), "event_type")
    w = (
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_lo"),
        F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_hi"),
        F.min("p05").alias("p05"),
        F.min("p95").alias("p95"),
        (dsum(w, 4) / F.count(F.lit(1)).cast("double")).alias("winsor_mean"),
    )


# ----------------------------------------------------------------------
# linreg_residuals — fit-then-score: the per-group OLS trend from
# `linreg_per_group` joined back (broadcast — group count is tiny) to
# score every event's residual against its group's trend line, flagging
# |residual| > 3 sigma. This is the standard model-fit-then-apply shape:
# ONE aggregation pass to fit, ONE map-side pass to score — at 100 TB the
# model rides a broadcast, the scoring never shuffles. Sigma comes from
# the same sufficient statistics (RSS via the closed form), so the whole
# query is two passes over the data, both partial-aggregated/map-only.
# ----------------------------------------------------------------------

_RESID_ORACLE = f"""
WITH pts AS (
  SELECT event_id, event_type,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
           AS x,
         CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS y
  FROM events
), sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         {dsum_sql("y", 4)} AS sy,
         {dsum_sql("CAST(x AS DOUBLE) * y", 4)} AS sxy,
         {dsum_sql("y * y", 4)} AS syy
  FROM pts GROUP BY event_type
), fits AS (
  SELECT event_type, n, sx, sy,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
         syy, sxy, sxx
  FROM sums
), fits2 AS (
  SELECT event_type, n, slope,
         (sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS icept,
         -- RSS = syy - icept*sy - slope*sxy (closed form), computed after
         -- icept so both engines share one expression tree
         syy, sxy, sy
  FROM fits
), sigma AS (
  SELECT event_type, slope, icept,
         -- quantized-sum RSS can come out fractionally negative on a
         -- near-perfect fit; DuckDB errors on SQRT(<0) while Spark
         -- returns NaN — clamp on BOTH sides
         SQRT(GREATEST(0.0, (syy - icept * sy - slope * sxy))
              / CAST(n AS DOUBLE)) AS s
  FROM fits2
)
SELECT p.event_id,
       p.y - (g.icept + g.slope * CAST(p.x AS DOUBLE)) AS residual,
       (ABS(p.y - (g.icept + g.slope * CAST(p.x AS DOUBLE)))
        > 3 * g.s) AS is_outlier
FROM pts p JOIN sigma g ON p.event_type = g.event_type
"""


@query("linreg_residuals", _RESID_ORACLE)
def linreg_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event residual vs the group OLS trend + 3-sigma outlier flag."""
    ev = load_table(spark, sf_dir, "events")
    x = ((F.unix_timestamp("ts") - F.lit(_T0)) / F.lit(3600)).cast("long")
    y = F.col("value").cast("decimal(18,4)").cast("double")
    pts = ev.select("event_id", "event_type", x.alias("x"), y.alias("y"))
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        dsum(F.col("y"), 4).alias("sy"),
        dsum(F.col("x").cast("double") * F.col("y"), 4).alias("sxy"),
        dsum(F.col("y") * F.col("y"), 4).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    fits = sums.select(
        "event_type", "n", "sx", "sy", "syy", "sxy", slope.alias("slope")
    )
    icept = (F.col("sy") - F.col("slope") * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    fits2 = fits.select(
        "event_type", "n", "slope", icept.alias("icept"), "syy", "sxy", "sy"
    )
    s = F.sqrt(
        F.greatest(
            F.lit(0.0),
            F.col("syy")
            - F.col("icept") * F.col("sy")
            - F.col("slope") * F.col("sxy"),
        )
        / F.col("n").cast("double")
    )
    sigma = fits2.select("event_type", "slope", "icept", s.alias("s"))
    j = pts.join(F.broadcast(sigma), "event_type")
    # r10 audit: slope/icept/s and hence resid are identical IEEE chains of
    # exact sufficient statistics on both engines (sqrt is correctly
    # rounded), so the residual and the 3-sigma comparison use raw doubles
    # — the deleted DECIMAL(18,6) casts were the only divergence risk.
    resid = F.col("y") - (F.col("icept") + F.col("slope") * F.col("x").cast("double"))
    return j.select(
        "event_id",
        resid.alias("residual"),
        (F.abs(resid) > F.lit(3) * F.col("s")).alias("is_outlier"),
    )


# ----------------------------------------------------------------------
# pareto_frontier — per-group 2-D Pareto frontier over (value, recency):
# the points not dominated by any other (higher value AND more recent).
# Scalable shape: raw rows first collapse to the (group, value) -> max-ts
# histogram (partial-aggregated, bounded by |distinct values| like
# group_median), and the frontier scan is a cummax window over that
# HISTOGRAM — never a window over raw data. All-integer comparisons.
# ----------------------------------------------------------------------

_PARETO_ORACLE = """
WITH hist AS (
  SELECT event_type, value, MAX(epoch_us(ts)) AS t_us
  FROM events GROUP BY event_type, value
),
scanned AS (
  SELECT event_type, value, t_us,
         MAX(t_us) OVER (
           PARTITION BY event_type ORDER BY value DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS best_prev_t
  FROM hist
)
SELECT event_type, value, t_us
FROM scanned
WHERE best_prev_t IS NULL OR t_us > best_prev_t
"""


@query("pareto_frontier", _PARETO_ORACLE)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-dominated (value, recency) points per event_type."""
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy("event_type", "value").agg(
        F.max(F.unix_micros("ts")).alias("t_us")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("value").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scanned = hist.withColumn("best_prev_t", F.max("t_us").over(w))
    return scanned.filter(
        F.col("best_prev_t").isNull() | (F.col("t_us") > F.col("best_prev_t"))
    ).select("event_type", "value", "t_us")


# ----------------------------------------------------------------------
# rank_profile — exact per-group percent_rank / cume_dist WITHOUT a
# whole-group window. A naive `percent_rank() OVER (PARTITION BY grp
# ORDER BY v)` puts each group's entire row set through one window
# partition — 5 priority groups at 100 TB means 5 tasks doing all the
# work. The scalable form recovers the same numbers from the VALUE
# HISTOGRAM: rank(first row with value v) = cum(v) - c(v) + 1 and
# cume_dist numerator = cum(v), so the window runs over histogram-sized
# data (distinct values per group) and every raw row is tagged by a
# broadcast join — same discipline as `group_median`. The final division
# is one IEEE double op over integers, bit-identical in any engine; the
# oracle uses DuckDB's NATIVE percent_rank()/cume_dist() so the
# histogram reconstruction is verified against the SQL-standard window
# semantics themselves.
# ----------------------------------------------------------------------

_RANK_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       bucket,
       CAST(percent_rank() OVER w AS DOUBLE) AS pr,
       CAST(cume_dist() OVER w AS DOUBLE) AS cd
FROM (
  SELECT o_orderkey, o_orderpriority,
         CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bucket
  FROM orders
)
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY bucket)
"""


@query("rank_profile", _RANK_ORACLE)
def rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per priority via histogram rank algebra."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bucket"),
    )
    hist = shared(
        orders.groupBy("o_orderpriority", "bucket").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    tot = hist.groupBy("o_orderpriority").agg(
        F.sum("c").cast("long").alias("n")
    )
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("o_orderpriority").orderBy("bucket")
        ),
    )
    ranks = cum.join(F.broadcast(tot), "o_orderpriority").select(
        "o_orderpriority",
        "bucket",
        (F.col("cum") - F.col("c") + 1).alias("rnk"),
        F.col("cum").alias("cume"),
        "n",
    )
    # Tag every raw row map-side: the rank table is histogram-sized.
    tagged = orders.join(F.broadcast(ranks), ["o_orderpriority", "bucket"])
    pr = F.when(F.col("n") > 1, (F.col("rnk") - 1).cast("double") / (F.col("n") - 1).cast("double")).otherwise(F.lit(0.0))
    cd = F.col("cume").cast("double") / F.col("n").cast("double")
    return tagged.select(
        "o_orderkey", "o_orderpriority", "bucket", pr.alias("pr"), cd.alias("cd")
    )


# ----------------------------------------------------------------------
# revenue_deciles — equi-DEPTH histogram per group: 9 exact nearest-rank
# cut points from ONE value-histogram shuffle (`group_quantiles`), rows
# assigned to their decile MAP-SIDE against the broadcast boundary
# table, then per-decile occupancy + exact revenue mass. The
# equi-width histogram (`numeric_histogram`) bins by value; this bins by
# POPULATION — the form batch planners (and feature bucketizers) want.
# Degenerate value distributions collapse deciles honestly: a value
# spanning multiple cut points lands in the decile of the LAST boundary
# below it, so occupancy can exceed n/10 — mirrored exactly in SQL.
# ----------------------------------------------------------------------

_DECILE_QS = {f"d{i}": i / 10.0 for i in range(1, 10)}


def _decile_oracle() -> str:
    cuts_cond = " + ".join(
        f"(CASE WHEN o.bucket > q.d{i} THEN 1 ELSE 0 END)" for i in range(1, 10)
    )
    return f"""
WITH src AS (
  SELECT o_orderpriority, CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bucket,
         o_totalprice
  FROM orders
),
{group_quantiles_sql("src", "o_orderpriority", "bucket", _DECILE_QS, "q")}
SELECT o.o_orderpriority,
       CAST(1 + {cuts_cond} AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o.bucket) AS BIGINT) AS lo_bucket,
       CAST(MAX(o.bucket) AS BIGINT) AS hi_bucket,
       {dsum_sql('o.o_totalprice')} AS revenue
FROM src o JOIN q ON o.o_orderpriority = q.o_orderpriority
GROUP BY 1, 2
"""


@query("revenue_deciles", _decile_oracle())
def revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile occupancy + revenue mass per order priority."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bucket"),
        "o_totalprice",
    )
    cuts = group_quantiles(src, "o_orderpriority", "bucket", _DECILE_QS)
    tagged = src.join(F.broadcast(cuts), "o_orderpriority")
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + F.when(
            F.col("bucket") > F.col(f"d{i}"), 1
        ).otherwise(0)
    return tagged.groupBy(
        "o_orderpriority", decile.cast("bigint").alias("decile")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("bucket").alias("lo_bucket"),
        F.max("bucket").alias("hi_bucket"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


# ----------------------------------------------------------------------
# debounce_events — drop rapid-fire duplicate signals: an event is noise
# if the SAME (user, event_type) fired within the previous 60 s. The
# one-keyed-window form (lag over user/type ordered by event time) is
# deliberate: the greedy "60 s after the last KEPT event" variant is a
# sequential recurrence with no parallel form, while lag-vs-previous is
# order-exact, one shuffle, and what dedup/debounce stages actually
# deploy. Integer microsecond arithmetic end-to-end. Output is the
# cleaned stream (kept rows only) — the filter composes in front of any
# downstream query.
# ----------------------------------------------------------------------

_DEBOUNCE_ORACLE = """
SELECT event_id, user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us
FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS prev_ts
  FROM events
)
WHERE prev_ts IS NULL
   OR CAST(epoch_us(ts) AS BIGINT) - CAST(epoch_us(prev_ts) AS BIGINT)
      >= 60 * 1000000
"""


@query("debounce_events", _DEBOUNCE_ORACLE)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep events ≥60 s after the previous same-(user, type) event."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(F.lag("ts").over(w)).alias("prev_us"),
    )
    return lagged.filter(
        F.col("prev_us").isNull()
        | (F.col("ts_us") - F.col("prev_us") >= 60 * 1_000_000)
    ).select("event_id", "user_id", "event_type", "ts_us")


# ----------------------------------------------------------------------
# interarrival_profile — burstiness analysis: the distribution of gaps
# between consecutive same-(user, event_type) events, bucketed on a log2
# scale (bucket = binary digit count of the µs gap — exact integers, the
# repo's log-free convention). The shape a capacity planner reads to
# size session timeouts and state TTLs. One keyed lag window + one
# bounded (type, bucket ≤ 64) aggregation; gaps never leave integer
# arithmetic.
# ----------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT)
         - CAST(epoch_us(lag(ts) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id
           )) AS BIGINT) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(length(bin(gap_us)) AS BIGINT) AS gap_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1, 2
"""


@query("interarrival_profile", _INTERARRIVAL_ORACLE)
def interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2-bucketed inter-arrival gap histogram per event type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy(
        "event_type",
        F.length(F.bin("gap_us")).cast("bigint").alias("gap_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


# ----------------------------------------------------------------------
# event_trigrams — sequential pattern mining: the most frequent 3-step
# event-type paths per user timeline (the order-3 extension of
# `event_transitions`' Markov pairs). Trigram generation is two lead()
# taps on ONE keyed window (per-user event-time order — the secondary-
# sort shape), then a combiner-style count on the bounded type³ key
# space; top paths ranked with a deterministic tie-break.
# ----------------------------------------------------------------------

_TRIGRAM_TOPN = 30

_TRIGRAM_ORACLE = f"""
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS cnt
FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY cnt DESC, e1, e2, e3 LIMIT {_TRIGRAM_TOPN}
"""


@query("event_trigrams", _TRIGRAM_ORACLE)
def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top {_TRIGRAM_TOPN} 3-step event-type paths across user timelines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "e1", "e2", "e3")
        .limit(_TRIGRAM_TOPN)
    )


# ----------------------------------------------------------------------
# quantile_normalize — map each event_type's value distribution onto the
# GLOBAL value distribution (the batch-effect correction / feature
# alignment transform): a value at within-group quantile p is replaced
# by the global value at the same p (nearest-rank). Everything runs on
# HISTOGRAMS, which are DOMAIN-sized (value quantized to cents: ≤ ~50 k
# buckets regardless of row count), never data-sized:
#   1. per-(group, bucket) counts + within-group cumulative rank  — one
#      partial-aggregated shuffle + per-group window;
#   2. target global rank gr = ceil(cum·N / n_g), exact integer ceil;
#   3. the "smallest global bucket with gcum ≥ gr" lookup is a merge of
#      the two sorted histograms: union + ONE descending-key window
#      carrying last_value(global bucket) — a single-partition window,
#      legal here because its input is domain-bounded by construction
#      (the same argument as the PQ codebook collect, kept distributed).
# Output is the (group, bucket → normalized bucket) mapping table — the
# artifact a pipeline broadcast-joins onto raw rows to apply.
# ----------------------------------------------------------------------

_QN_ORACLE = """
WITH vb AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vb FROM events
),
gh AS (
  SELECT event_type, vb, CAST(COUNT(*) AS BIGINT) AS c
  FROM vb GROUP BY event_type, vb
),
gcd AS (
  SELECT event_type, vb, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY vb) AS cum
  FROM gh
),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_g FROM gh GROUP BY event_type),
ghist AS (
  SELECT vb AS gvb, CAST(COUNT(*) AS BIGINT) AS gc FROM vb GROUP BY vb
),
globcum AS (
  SELECT gvb, SUM(gc) OVER (ORDER BY gvb) AS gcum FROM ghist
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM vb),
targets AS (
  SELECT g.event_type, g.vb, g.cum,
         (g.cum * n.n_all + t.n_g - 1) // t.n_g AS gr
  FROM gcd g JOIN tot t ON g.event_type = t.event_type CROSS JOIN n
)
SELECT tg.event_type, tg.vb,
       CAST(MIN(CASE WHEN gl.gcum >= tg.gr THEN gl.gvb END) AS BIGINT)
         AS mapped_vb
FROM targets tg CROSS JOIN globcum gl
GROUP BY tg.event_type, tg.vb
"""


@query("quantile_normalize", _QN_ORACLE)
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("vb")
    )
    # one scan: every downstream histogram (group, global, totals) reads
    # the cached (event_type, vb) projection
    gh = shared(ev.groupBy("event_type", "vb").agg(F.count(F.lit(1)).alias("c")))
    cum = gh.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("event_type").orderBy("vb"))
    )
    tot = gh.groupBy("event_type").agg(F.sum("c").cast("long").alias("n_g"))
    glob = gh.groupBy("vb").agg(F.sum("c").alias("gc")).select(
        F.col("vb").alias("gvb"), "gc"
    )
    globcum = glob.withColumn(
        "gcum", F.sum("gc").over(Window.orderBy("gvb"))
    ).select("gvb", "gcum")
    n_all = gh.agg(F.sum("c").cast("long").alias("n_all"))
    targets = (
        cum.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(n_all))
        .select(
            "event_type",
            "vb",
            # exact integer ceil(cum·N / n_g): (cum·N + n_g − 1) div n_g
            F.expr("(cum * n_all + n_g - 1) div n_g").cast("long").alias("gr"),
        )
    )
    # Merge the sorted histograms: A rows carry (k=gcum, gvb); B rows carry
    # (k=gr, group bucket). Scanning keys DESCENDING, the last A bucket
    # seen is the SMALLEST gcum ≥ the current B row's gr — the nearest-
    # rank lookup. tag orders A before B at equal keys so gcum == gr hits.
    a = globcum.select(
        F.col("gcum").alias("k"),
        F.lit(0).alias("tag"),
        F.col("gvb").alias("gvb"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("vb"),
    )
    b = targets.select(
        F.col("gr").alias("k"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("gvb"),
        "event_type",
        "vb",
    )
    w = (
        Window.orderBy(F.desc("k"), F.asc("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = a.unionByName(b).withColumn(
        "mapped_vb", F.last("gvb", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_type", "vb", F.col("mapped_vb").cast("bigint").alias("mapped_vb")
    )


# ----------------------------------------------------------------------
# conversion_latency — the click→purchase time-to-convert distribution:
# each purchase matched to the user's latest prior click (the as-of
# union-window idiom from operators/join.py — one keyed shuffle, never a
# range-join explosion), latencies bucketed on the log2 scale. The
# funnel-health report behind attribution windows: "how long do
# conversions actually take" decides the stream-stream join's state TTL.
# ----------------------------------------------------------------------

_CONV_LATENCY_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, epoch_us(ts)
),
matched AS (
  SELECT p.user_id, p.ts_us - c.ts_us AS lat_us
  FROM purchases p
  ASOF JOIN clicks c ON p.user_id = c.user_id AND c.ts_us <= p.ts_us
)
SELECT CAST(length(bin(lat_us)) AS BIGINT) AS lat_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(lat_us) AS BIGINT) AS min_lat_us,
       CAST(MAX(lat_us) AS BIGINT) AS max_lat_us
FROM matched GROUP BY 1
"""


@query("conversion_latency", _CONV_LATENCY_ORACLE)
def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2-bucketed click→purchase latency histogram (inner as-of)."""
    from hadoop_spark.operators.join import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("ts_us"))
        .distinct()
    )
    matched = asof_join(
        purchases,
        clicks.withColumn("click_ts_us", F.col("ts_us")),
        key="user_id",
        time_col="ts_us",
        value_cols=["click_ts_us"],
    )
    lat = matched.filter(F.col("click_ts_us").isNotNull()).select(
        (F.col("ts_us") - F.col("click_ts_us")).alias("lat_us")
    )
    return lat.groupBy(
        F.length(F.bin("lat_us")).cast("bigint").alias("lat_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lat_us").alias("min_lat_us"),
        F.max("lat_us").alias("max_lat_us"),
    )


# ----------------------------------------------------------------------
# login_streaks — gaps-and-islands: each user's LONGEST run of
# consecutive active days, reported as the corpus-wide streak-length
# histogram. The islands trick (day − row_number is constant within a
# consecutive run) needs only one keyed window over the per-(user, day)
# distinct table, then two bounded aggregations — no self-joins, no
# recursion; the engagement metric every growth dashboard carries.
# ----------------------------------------------------------------------

_STREAK_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL
),
isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM ud
),
runs AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM isl GROUP BY user_id, grp
),
best AS (
  SELECT user_id, MAX(run_len) AS best_streak FROM runs GROUP BY user_id
)
SELECT CAST(best_streak AS BIGINT) AS streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM best GROUP BY best_streak
"""


@query("login_streaks", _STREAK_ORACLE)
def login_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ud = ev.select(
        "user_id", F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.withColumn("grp", F.col("day") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    best = runs.groupBy("user_id").agg(F.max("run_len").alias("best_streak"))
    return best.groupBy(
        F.col("best_streak").cast("bigint").alias("streak_days")
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ----------------------------------------------------------------------
# ab_split_metrics — the experimentation readout: users hash-assigned to
# two arms (portable hash — the same deterministic membership contract
# as train_test_split, so the assignment is stable across reruns and
# engines), per-arm funnel conversion (a click followed later by a
# purchase) with exact integer counts and one IEEE rate division. Per-
# user reduction is a single aggregation carrying min-click / max-
# purchase times; no self-join, no window.
# ----------------------------------------------------------------------

_AB_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         {portable_hash64_sql('user_id', salt='#ab')} % 2 AS arm,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_click,
         MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_purchase
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN first_click IS NOT NULL
                      AND last_purchase IS NOT NULL
                      AND first_click < last_purchase
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       (CAST(SUM(CASE WHEN first_click IS NOT NULL
                       AND last_purchase IS NOT NULL
                       AND first_click < last_purchase
                      THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE)) AS conv_rate
FROM per_user GROUP BY arm
"""


@query("ab_split_metrics", _AB_ORACLE)
def ab_split_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.unix_micros("ts"))
        ).alias("first_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("last_purchase"),
    ).withColumn("arm", portable_hash64(F.col("user_id"), salt="#ab") % 2)
    converted = (
        F.col("first_click").isNotNull()
        & F.col("last_purchase").isNotNull()
        & (F.col("first_click") < F.col("last_purchase"))
    )
    return per_user.groupBy(F.col("arm").cast("bigint").alias("arm")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(converted, 1).otherwise(0)).cast("bigint").alias("n_converted"),
        (
            F.sum(F.when(converted, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conv_rate"),
    )


# ----------------------------------------------------------------------
# daily_metric_corr — cross-table metric correlation: Pearson r between
# daily order revenue and daily event volume. Each table collapses to
# its |days|-sized daily series first (one bounded aggregation each);
# the five correlation sufficient statistics are EXACT (revenue in
# integer cents, DECIMAL(38) sums so squares can't overflow), and r is
# one fixed IEEE expression over them, quantized for the cross-engine
# hash. The "do these two 100 TB feeds move together" question at the
# cost of two rollups.
# ----------------------------------------------------------------------

_CORR_ORACLE = """
WITH rev0 AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS BIGINT)
           AS day,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS x
  FROM orders GROUP BY 1
),
ev0 AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
-- the two feeds cover DISJOINT calendar ranges (the fixture's orders are
-- 1995-2001, events are a 30-day 2024 window), so each series aligns to
-- its own first day and correlates on the day INDEX — the standard
-- day-of-campaign alignment; a raw calendar join would be vacuously empty
rev AS (SELECT day - (SELECT MIN(day) FROM rev0) AS day, x FROM rev0),
ev AS (SELECT day - (SELECT MIN(day) FROM ev0) AS day, y FROM ev0),
j AS (SELECT rev.x, ev.y FROM rev JOIN ev ON rev.day = ev.day),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS syy
  FROM j
)
SELECT n,
       (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
               - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
       AS pearson_r
FROM s
"""


@query("daily_metric_corr", _CORR_ORACLE)
def daily_metric_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    rev0 = orders.groupBy(
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("x")
    )
    evd0 = ev.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    # align each feed to its own first day (disjoint calendar ranges in
    # the fixture — a raw calendar join is vacuously empty)
    rmin = rev0.agg(F.min("day").alias("rm"))
    emin = evd0.agg(F.min("day").alias("em"))
    rev = rev0.join(F.broadcast(rmin)).select(
        (F.col("day") - F.col("rm")).alias("day"), "x"
    )
    evd = evd0.join(F.broadcast(emin)).select(
        (F.col("day") - F.col("em")).alias("day"), "y"
    )
    j = rev.join(evd, "day").select("x", "y")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38("x")).cast("decimal(38,0)").alias("sx"),
        F.sum(d38("y")).cast("decimal(38,0)").alias("sy"),
        F.sum(d38("x") * d38("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(d38("x") * d38("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d38("y") * d38("y")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    r = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        F.sqrt(nd * F.col("sxx").cast("double") - sxd * sxd)
        * F.sqrt(nd * F.col("syy").cast("double") - syd * syd)
    )
    # r10 audit: raw IEEE Pearson r — all six sufficient statistics are
    # exact DECIMAL(38,0), rendered to double by correctly-rounded paths
    # on both engines (Spark BigDecimal.doubleValue, DuckDB strtod via
    # VARCHAR), so the quotient is bit-equal without quantization.
    return s.select("n", r.alias("pearson_r"))


# ----------------------------------------------------------------------
# hourly_burst_flags — burst detection on the hourly activity series:
# an (event_type, hour) is bursty when its count exceeds the trailing
# 24-hour mean by 3σ. The window runs over the HOUR SERIES (bounded by
# the time span, never by row count); mean/σ come from exact integer
# window sums, so the burst margin is an identical IEEE chain on both
# engines and the decision compares the raw double (r10 audit — the
# former DECIMAL quantization was itself the only tie risk).
# ----------------------------------------------------------------------

_BURST_ORACLE = """
WITH hc AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, hr, cnt,
         CAST(SUM(cnt) OVER w AS BIGINT) AS s,
         CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS s2,
         CAST(COUNT(*) OVER w AS BIGINT) AS n
  FROM hc
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, CAST(hr AS BIGINT) AS hr, cnt,
       CAST(CASE WHEN n >= 6 THEN
         (CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
          - 3.0 * sqrt(GREATEST(0.0,
              CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))))) > 0
       ELSE FALSE END AS BOOLEAN) AS burst
FROM win
"""


@query("hourly_burst_flags", _BURST_ORACLE)
def hourly_burst_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / 3_600_000_000).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
    win = hc.select(
        "event_type",
        F.col("hr").cast("bigint").alias("hr"),
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("bigint").alias("s2"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = F.greatest(
        F.lit(0.0), F.col("s2").cast("double") / nd - mean * mean
    )
    # r10 audit: the burst margin is an identical IEEE chain of exact
    # integer window sums on both engines (sqrt correctly rounded), so the
    # comparison runs on the raw double — the former DECIMAL(18,6)
    # quantization was the only cross-engine tie risk.
    margin = F.col("cnt").cast("double") - mean - F.lit(3.0) * F.sqrt(var)
    burst = F.when(F.col("n") >= 6, margin > 0).otherwise(F.lit(False))
    return win.select("event_type", "hr", "cnt", burst.alias("burst"))


# ----------------------------------------------------------------------
# rfm_segmentation — classic customer RFM scoring: recency (days since
# last order), frequency (order count), monetary (exact integer cents),
# each cut into quartiles, customers bucketed into 64 "RFM cells". The
# scalable form NEVER runs a global NTILE (a single-partition window):
# quartile cut points come from `operators/stats.group_quantiles` — one
# partial-aggregated value-histogram shuffle per dimension, bounded by
# the distinct-value count, broadcast back as a 1-row literal — and the
# score is a map-side comparison against the three cuts. Monetary is
# bucketed to $500 cells before the histogram so its distinct-value
# count stays bounded at any scale.
# ----------------------------------------------------------------------

_RFM_QS = {"c1": 0.25, "c2": 0.50, "c3": 0.75}


def _rfm_oracle() -> str:
    blocks = []
    for dim, prefix in (("last_day", "rq"), ("freq", "fq"), ("mon_bucket", "mq")):
        blocks.append(
            group_quantiles_sql(f"{prefix}_src", "g", dim, _RFM_QS, prefix)
        )
    score = lambda v, p: (  # noqa: E731
        f"CAST(1 + (CASE WHEN {v} > {p}.c1 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {v} > {p}.c2 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {v} > {p}.c3 THEN 1 ELSE 0 END) AS BIGINT)"
    )
    return f"""
WITH rfm0 AS (
  SELECT o_custkey,
         CAST(MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000)
              AS BIGINT) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS mon_cents
  FROM orders GROUP BY o_custkey
),
rfm AS (
  SELECT *, CAST(mon_cents // 50000 AS BIGINT) AS mon_bucket FROM rfm0
),
rq_src AS (SELECT 1 AS g, last_day FROM rfm),
fq_src AS (SELECT 1 AS g, freq FROM rfm),
mq_src AS (SELECT 1 AS g, mon_bucket FROM rfm),
{",".join(blocks)},
scored AS (
  SELECT {score("r.last_day", "rq")} AS r_score,
         {score("r.freq", "fq")} AS f_score,
         {score("r.mon_bucket", "mq")} AS m_score,
         r.mon_cents
  FROM rfm r, rq, fq, mq
)
SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment,
       r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(CAST(mon_cents AS DECIMAL(38,0))) AS BIGINT) AS DOUBLE)
         / CAST(100 AS DOUBLE) AS revenue
FROM scored
GROUP BY 1, 2, 3, 4
"""


@query("rfm_segmentation", _rfm_oracle())
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile-cut RFM cells without a global NTILE window."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max(
            F.floor(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / 86_400_000_000
            )
        )
        .cast("bigint")
        .alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("mon_cents"),
    )
    rfm = rfm.withColumn(
        "mon_bucket", F.floor(F.col("mon_cents") / 50000).cast("bigint")
    )
    # rfm feeds 7 plan branches (3 quantile cuts x hist/tot + the scored
    # pass) — deliberately NOT persisted: AQE stage-reuse dedupes the
    # o_custkey exchange at runtime, and a shared() here measured 1.7x
    # SLOWER at sf0.1 (1.5 s -> 2.6 s median — cache materialization
    # barrier for work the stage cache already skips).
    cuts = []
    for dim in ("last_day", "freq", "mon_bucket"):
        q = group_quantiles(
            rfm.select(F.lit(1).alias("g"), dim), "g", dim, _RFM_QS
        ).select(
            *[F.col(c).alias(f"{dim}_{c}") for c in _RFM_QS]
        )
        cuts.append(q)

    def _score(dim: str):
        s = F.lit(1)
        for c in _RFM_QS:
            s = s + F.when(F.col(dim) > F.col(f"{dim}_{c}"), 1).otherwise(0)
        return s.cast("bigint")

    scored = rfm
    for q in cuts:
        scored = scored.join(F.broadcast(q))
    scored = scored.select(
        _score("last_day").alias("r_score"),
        _score("freq").alias("f_score"),
        _score("mon_bucket").alias("m_score"),
        "mon_cents",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.sum(F.col("mon_cents").cast("decimal(38,0)"))
            .cast("bigint")
            .cast("double")
            / F.lit(100).cast("double")
        ).alias("revenue"),
    ).select(
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
        "r_score",
        "f_score",
        "m_score",
        "n_customers",
        "revenue",
    )


# ----------------------------------------------------------------------
# mean_shift_detect — changepoint candidates on the daily revenue series:
# a day is flagged when the mean of the NEXT 7 days departs from the mean
# of the PREVIOUS 7 days by more than 30%. The recursive CUSUM statistic
# is inherently sequential (S_t depends on S_{t-1}); the batch-parallel
# changepoint form is this two-sided window contrast — and the window
# runs over the DAY-AGGREGATED series (bounded by the calendar span, not
# the row count), so the fact-table work is one partial-aggregated
# groupBy. Entirely integer-cent arithmetic: the flag is the integer
# cross-multiplication `10*|s_next - s_prev| > 3*s_prev`, which cannot
# flip on float noise on either engine.
# ----------------------------------------------------------------------

_MEAN_SHIFT_ORACLE = """
WITH rev AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, x,
         CAST(SUM(x) OVER (ORDER BY day
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s_prev,
         CAST(COUNT(*) OVER (ORDER BY day
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n_prev,
         CAST(SUM(x) OVER (ORDER BY day
              ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS BIGINT) AS s_next,
         CAST(COUNT(*) OVER (ORDER BY day
              ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS BIGINT) AS n_next
  FROM rev
)
SELECT day, x AS revenue_cents,
       CAST(ABS(s_next - s_prev) AS BIGINT) AS shift_cents,
       (10 * ABS(s_next - s_prev)) > (3 * s_prev) AS shifted
FROM win
WHERE n_prev = 7 AND n_next = 7
"""


@query("mean_shift_detect", _MEAN_SHIFT_ORACLE)
def mean_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("x")
    )
    # Window over the day series: bounded by the calendar span (the
    # 100 TB fact table has already collapsed to one row per day).
    wp = W.orderBy("day").rowsBetween(-7, -1)
    wn = W.orderBy("day").rowsBetween(1, 7)
    win = rev.select(
        "day",
        "x",
        F.sum("x").over(wp).cast("bigint").alias("s_prev"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n_prev"),
        F.sum("x").over(wn).cast("bigint").alias("s_next"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n_next"),
    )
    diff = F.abs(F.col("s_next") - F.col("s_prev"))
    return win.filter((F.col("n_prev") == 7) & (F.col("n_next") == 7)).select(
        "day",
        F.col("x").alias("revenue_cents"),
        diff.cast("bigint").alias("shift_cents"),
        ((diff * 10) > (F.col("s_prev") * 3)).alias("shifted"),
    )


# ----------------------------------------------------------------------
# autocorrelation — ACF of the daily revenue series at lags 1..7 (the
# weekly-seasonality diagnostic a forecasting pipeline runs before model
# choice). One pass computes all seven lag columns over the bounded
# day-aggregated series, an explode stacks them long, and each lag's
# Pearson term sums run in exact DECIMAL(38,0) integer-cent arithmetic
# (the `daily_metric_corr` discipline); only the final ratio is floating,
# with the DuckDB side reading decimals through the VARCHAR round-trip
# because its direct INT128→DOUBLE cast is not correctly rounded.
# ----------------------------------------------------------------------

_ACF_LAGS = 7


def _acf_oracle() -> str:
    lag_cols = ",\n         ".join(
        f"lag(x, {k}) OVER (ORDER BY day) AS lx{k}"
        for k in range(1, _ACF_LAGS + 1)
    )
    arms = "\n  UNION ALL\n".join(
        f"  SELECT {k} AS lag, x, lx{k} AS y FROM lagged WHERE lx{k} IS NOT NULL"
        for k in range(1, _ACF_LAGS + 1)
    )
    dd = lambda v: f"CAST(CAST({v} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH rev AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT day, x,
         {lag_cols}
  FROM rev
),
pairs AS (
{arms}
),
comp AS (
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n,
       (CAST(n AS DOUBLE) * {dd("sxy")} - {dd("sx")} * {dd("sy")})
       / (SQRT(CAST(n AS DOUBLE) * {dd("sxx")} - {dd("sx")} * {dd("sx")})
          * SQRT(CAST(n AS DOUBLE) * {dd("syy")} - {dd("sy")} * {dd("sy")}))
       AS acf
FROM comp
"""


@query("autocorrelation", _acf_oracle())
def autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("x")
    )
    w = W.orderBy("day")
    lagged = rev.select(
        "x",
        *[F.lag("x", k).over(w).alias(f"lx{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    pairs = (
        lagged.select(
            "x",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("bigint").alias("lag"),
                            F.col(f"lx{k}").alias("y"),
                        )
                        for k in range(1, _ACF_LAGS + 1)
                    ]
                )
            ).alias("p"),
        )
        .select("x", "p.lag", "p.y")
        .filter(F.col("y").isNotNull())
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    comp = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38("x")).cast("decimal(38,0)").alias("sx"),
        F.sum(d38("y")).cast("decimal(38,0)").alias("sy"),
        F.sum(d38("x") * d38("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(d38("x") * d38("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d38("y") * d38("y")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    acf = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        F.sqrt(nd * F.col("sxx").cast("double") - sxd * sxd)
        * F.sqrt(nd * F.col("syy").cast("double") - syd * syd)
    )
    # r10 audit: raw IEEE acf — exact DECIMAL(38,0) sufficient statistics
    # through correctly-rounded decimal->double paths on both engines.
    return comp.select("lag", "n", acf.alias("acf"))


# ----------------------------------------------------------------------
# rolling_median — exact per-user trailing-5-event median of `value`
# (robust smoothing a metrics pipeline applies before thresholding). A
# median over a SMALL FIXED frame is the one case where collecting the
# frame is the right distributed plan: the per-row state is 5 doubles
# (collect_list over a keyed bounded window, sorted map-side), never a
# per-group unbounded buffer. Both engines select identical ranks from
# the sorted frame and interpolate with the same (lo + hi) / 2, so the
# result is bit-exact.
# ----------------------------------------------------------------------

_ROLLMED_ORACLE = """
WITH framed AS (
  SELECT event_id, user_id,
         list_sort(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
         )) AS arr
  FROM events
)
SELECT event_id, user_id,
       (arr[CAST((len(arr) + 1) // 2 AS INT)]
        + arr[CAST(len(arr) // 2 + 1 AS INT)]) / CAST(2 AS DOUBLE)
         AS rolling_median
FROM framed
"""


@query("rolling_median", _ROLLMED_ORACLE)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    framed = ev.select(
        "event_id",
        "user_id",
        F.sort_array(F.collect_list("value").over(w)).alias("arr"),
    )
    n = F.size("arr")
    lo = F.element_at("arr", F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at("arr", (F.floor(n / 2) + 1).cast("int"))
    return framed.select(
        "event_id",
        "user_id",
        ((lo + hi) / F.lit(2).cast("double")).alias("rolling_median"),
    )


# ----------------------------------------------------------------------
# event_type_diversity — per-user behavioral diversity as the
# Gini–Simpson index D = 1 − Σ c_i(c_i−1) / (n(n−1)) (the probability
# two events drawn without replacement differ in type). Chosen over
# Shannon entropy deliberately: D is an EXACT integer ratio — no
# cross-engine transcendental (ln differs by ulps between Java's Math
# and libm, which the repo-wide log-free discipline exists to avoid).
# Two partial-aggregated shuffles: (user, type) counts, then user.
# ----------------------------------------------------------------------

_DIVERSITY_ORACLE = """
WITH ct AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ag AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS ss
  FROM ct GROUP BY 1
)
SELECT user_id, n,
       CASE WHEN n >= 2 THEN
         CAST(1 AS DOUBLE) - CAST(ss AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
       ELSE CAST(0 AS DOUBLE) END AS simpson_diversity
FROM ag
"""


@query("event_type_diversity", _DIVERSITY_ORACLE)
def event_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ct = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    ag = ct.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("ss"),
    )
    # r10 audit: raw IEEE — 1 - ss/(n(n-1)) over exact int64 operands is
    # bit-equal across engines; the DECIMAL(18,12) finalization is gone.
    div = F.when(
        F.col("n") >= 2,
        F.lit(1).cast("double")
        - F.col("ss").cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return ag.select("user_id", "n", div.alias("simpson_diversity"))


# ----------------------------------------------------------------------
# order_backlog_curve — open-order backlog over time: each day, how many
# orders have been placed but not yet fully shipped (completion = the
# order's LAST lineitem ship day). Interval-overlap counting at scale is
# NEVER a per-day range join — it is two day-aggregated event series
# (placements, completions) and one cumulative-sum window over the
# bounded calendar axis: backlog(d) = cum_placed(d) − cum_completed(d).
# The fact-table work is one groupBy per series; integers end-to-end.
# ----------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH placed AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS placed
  FROM orders GROUP BY 1
),
done_per_order AS (
  SELECT l_orderkey,
         CAST(MAX(epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000)
              AS BIGINT) AS done_day
  FROM lineitem GROUP BY 1
),
completed AS (
  SELECT done_day AS day, CAST(COUNT(*) AS BIGINT) AS completed
  FROM done_per_order GROUP BY 1
),
days AS (
  SELECT COALESCE(p.day, c.day) AS day,
         COALESCE(p.placed, 0) AS placed,
         COALESCE(c.completed, 0) AS completed
  FROM placed p FULL OUTER JOIN completed c ON p.day = c.day
)
SELECT day, placed, completed,
       CAST(SUM(placed) OVER w - SUM(completed) OVER w AS BIGINT) AS backlog
FROM days
WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("order_backlog_curve", _BACKLOG_ORACLE)
def order_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    day_of = lambda c: F.floor(  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp")) / 86_400_000_000
    ).cast("bigint")
    placed = orders.groupBy(day_of("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("placed")
    )
    completed = (
        li.groupBy("l_orderkey")
        .agg(F.max(day_of("l_shipdate")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("completed"))
    )
    days = (
        placed.join(completed, "day", "full_outer")
        .select(
            "day",
            F.coalesce("placed", F.lit(0)).alias("placed"),
            F.coalesce("completed", F.lit(0)).alias("completed"),
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return days.select(
        "day",
        "placed",
        "completed",
        (F.sum("placed").over(w) - F.sum("completed").over(w))
        .cast("bigint")
        .alias("backlog"),
    )


# ----------------------------------------------------------------------
# reorder_intervals — per-customer repurchase cadence: the exact median
# of day gaps between consecutive orders. The gap stream is one keyed
# window (lag over each customer's order history — partition-parallel at
# any scale); the median is `operators/stats.group_median`'s bounded
# value-histogram rank selection, never a collect of a customer's gap
# list into one buffer. Day arithmetic is all-integer; the only float is
# the (lo+hi)/2 midpoint, identical on both engines.
# ----------------------------------------------------------------------

_REORDER_ORACLE = f"""
WITH seq AS (
  SELECT o_custkey,
         CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         o_orderkey
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         day - lag(day) OVER (
           PARTITION BY o_custkey ORDER BY day, o_orderkey
         ) AS gap
  FROM seq
),
g AS (SELECT o_custkey, gap FROM gaps WHERE gap IS NOT NULL),
{group_median_sql("g", "o_custkey", "gap", "median_gap_days", "gm")},
n AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps FROM g GROUP BY 1
)
SELECT n.o_custkey, n.n_gaps, gm.median_gap_days
FROM n JOIN gm ON n.o_custkey = gm.o_custkey
"""


@query("reorder_intervals", _REORDER_ORACLE)
def reorder_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        "o_custkey",
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day"),
        "o_orderkey",
    )
    w = W.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    g = seq.select(
        "o_custkey", (F.col("day") - F.lag("day").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    g = shared(g)
    med = group_median(g, "o_custkey", "gap", "median_gap_days")
    n = g.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_gaps"))
    return n.join(med, "o_custkey").select(
        "o_custkey", "n_gaps", "median_gap_days"
    )


# ----------------------------------------------------------------------
# kaplan_meier — survival analysis of the repurchase interval: S(t) =
# P(customer takes more than t days to reorder), with each customer's
# tail (last order → horizon) entering as a RIGHT-CENSORED observation —
# the estimator that separates "hasn't reordered YET" from "never
# reorders", which a naive gap histogram conflates. Scale shape: the
# fact table collapses to one keyed-window gap stream plus a per-
# customer censor row; everything after is windows over the bounded
# duration axis. The product Π(1 − dᵤ/nᵤ) is floating and order-
# sensitive, so BOTH engines fold the identical frame-ordered factor
# list left-to-right (Spark collect_list+aggregate, DuckDB windowed
# list+list_reduce) over 1e-12-quantized factors — bit-identical, no
# reliance on either engine's internal aggregation tree.
# ----------------------------------------------------------------------

_KM_ORACLE = """
WITH seq AS (
  SELECT o_custkey,
         CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         o_orderkey
  FROM orders
),
horizon AS (SELECT MAX(day) AS h FROM seq),
gaps AS (
  SELECT day - lag(day) OVER (
           PARTITION BY o_custkey ORDER BY day, o_orderkey
         ) AS dur
  FROM seq
),
obs AS (
  SELECT dur, 1 AS ev FROM gaps WHERE dur IS NOT NULL
  UNION ALL
  SELECT (SELECT h FROM horizon) - MAX(day) AS dur, 0 AS ev
  FROM seq GROUP BY o_custkey
),
hist AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS a
  FROM obs GROUP BY dur
),
risk AS (
  SELECT dur, d,
         CAST(SUM(a) OVER (ORDER BY dur DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n
  FROM hist
),
evt AS (
  SELECT dur, d, n,
         1 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS f
  FROM risk WHERE d > 0
),
km AS (
  SELECT dur, d, n,
         list(f) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl
  FROM evt
)
SELECT dur, d, n AS n_at_risk,
       list_reduce(fl, (a, b) -> a * b) AS survival
FROM km
"""


@query("kaplan_meier", _KM_ORACLE)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        "o_custkey",
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day"),
        "o_orderkey",
    )
    seq = shared(seq)
    horizon = seq.agg(F.max("day").alias("h"))
    wl = W.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    events = (
        seq.select((F.col("day") - F.lag("day").over(wl)).alias("dur"))
        .filter(F.col("dur").isNotNull())
        .select("dur", F.lit(1).alias("ev"))
    )
    censored = (
        seq.groupBy("o_custkey")
        .agg(F.max("day").alias("last_day"))
        .join(F.broadcast(horizon))
        .select((F.col("h") - F.col("last_day")).alias("dur"), F.lit(0).alias("ev"))
    )
    hist = events.unionByName(censored).groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("a"),
    )
    w_desc = W.orderBy(F.col("dur").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = hist.select(
        "dur", "d", F.sum("a").over(w_desc).cast("bigint").alias("n")
    )
    # r10 audit: f = 1 - d/n is a raw IEEE quotient of int64 operands
    # (bit-equal), and the survival product folds the factors in the SAME
    # unique ascending-dur order on both engines (Spark aggregate from
    # 1.0 vs DuckDB list_reduce from f1 — multiplying by 1.0 is exact),
    # so each partial product is bit-equal with no quantization anywhere.
    factor = F.lit(1).cast("double") - F.col("d").cast("double") / F.col(
        "n"
    ).cast("double")
    evt = risk.filter(F.col("d") > 0).select("dur", "d", "n", factor.alias("f"))
    w_asc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    km = evt.select(
        "dur", "d", "n", F.collect_list("f").over(w_asc).alias("fl")
    )
    surv = F.aggregate(
        F.col("fl"),
        F.lit(1.0).cast("double"),
        lambda acc, x: acc * x,
    )
    return km.select("dur", "d", F.col("n").alias("n_at_risk"), surv.alias("survival"))


# ----------------------------------------------------------------------
# ridge_regression_2f — closed-form multivariate (2-feature) ridge fit
# per return flag: w = (XᵀX + λI)⁻¹ Xᵀy with the 2×2 inverse written
# out explicitly. The 100 TB shape of "train a small linear model on a
# huge table" is exactly this: one partial-aggregated shuffle computes
# the five Gram/moment sums, and the solve is O(1) arithmetic on the
# aggregate row — no iterative optimizer, no driver-side data.
# Exactness: features enter in INTEGER units (quantity, discount in
# percent points, price in cents), so every moment is an exact
# DECIMAL(38,0) sum — quantizing float products invites half-way-tie
# rounding skew between engines; integer moments cannot. Only the 2×2
# solve is floating, as the identical IEEE tree — emitted RAW (r10
# audit: the former output quantization was itself the only tie risk).
# ----------------------------------------------------------------------

_RIDGE_LAMBDA = "1000.0"


def _ridge_oracle() -> str:
    m = lambda e: (  # noqa: E731
        f"CAST(CAST(SUM(CAST({e} AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)"
    )
    q = "CAST(l_quantity AS DECIMAL(38,0))"
    d = "CAST(l_discount * 100 AS DECIMAL(38,0))"
    y = "CAST(l_extendedprice * 100 AS DECIMAL(38,0))"
    return f"""
WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         {m(f"{q} * {q}")} AS a11,
         {m(f"{q} * {d}")} AS a12,
         {m(f"{d} * {d}")} AS a22,
         {m(f"{q} * {y}")} AS b1,
         {m(f"{d} * {y}")} AS b2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ((a22 + {_RIDGE_LAMBDA}) * b1 - a12 * b2)
       / ((a11 + {_RIDGE_LAMBDA}) * (a22 + {_RIDGE_LAMBDA}) - a12 * a12)
         AS w_qty,
       ((a11 + {_RIDGE_LAMBDA}) * b2 - a12 * b1)
       / ((a11 + {_RIDGE_LAMBDA}) * (a22 + {_RIDGE_LAMBDA}) - a12 * a12)
         AS w_disc
FROM g
"""


@query("ridge_regression_2f", _ridge_oracle())
def ridge_regression_2f(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qv = F.col("l_quantity").cast("decimal(38,0)")
    dv = (F.col("l_discount") * 100).cast("decimal(38,0)")
    yv = (F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    m = lambda e: F.sum(e).cast("decimal(38,0)").cast("double")  # noqa: E731
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        m(qv * qv).alias("a11"),
        m(qv * dv).alias("a12"),
        m(dv * dv).alias("a22"),
        m(qv * yv).alias("b1"),
        m(dv * yv).alias("b2"),
    )
    lam = F.lit(float(_RIDGE_LAMBDA))
    det = (F.col("a11") + lam) * (F.col("a22") + lam) - F.col("a12") * F.col("a12")
    w_qty = ((F.col("a22") + lam) * F.col("b1") - F.col("a12") * F.col("b2")) / det
    w_disc = ((F.col("a11") + lam) * F.col("b2") - F.col("a12") * F.col("b1")) / det
    # r10 audit: raw IEEE 2x2 solve — the Gram/moment sums are exact
    # DECIMAL(38,0) rendered through correctly-rounded decimal->double
    # paths, and the solve is the same expression tree on both engines.
    return g.select(
        "l_returnflag",
        "n",
        w_qty.alias("w_qty"),
        w_disc.alias("w_disc"),
    )


# ----------------------------------------------------------------------
# value_migration_matrix — customer spend-quartile mobility between
# consecutive years: the (from-quartile → to-quartile) transition counts
# a retention team reads as "are our big spenders staying big". Quartile
# cuts are computed PER YEAR by the same broadcast value-histogram
# machinery as `rfm_segmentation` (no global NTILE anywhere), spend is
# bucketed to $500 cells so the histogram stays bounded, and the
# year-over-year pairing is a customer-keyed self-join of the tiny
# (customer, year, quartile) table. All-integer arithmetic.
# ----------------------------------------------------------------------

_VMM_QS = {"c1": 0.25, "c2": 0.50, "c3": 0.75}


def _vmm_oracle() -> str:
    score = (
        "CAST(1 + (CASE WHEN s.bucket > q.c1 THEN 1 ELSE 0 END)"
        " + (CASE WHEN s.bucket > q.c2 THEN 1 ELSE 0 END)"
        " + (CASE WHEN s.bucket > q.c3 THEN 1 ELSE 0 END) AS BIGINT)"
    )
    return f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
         CAST(CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0)))
              AS BIGINT) // 50000 AS BIGINT) AS bucket
  FROM orders GROUP BY 1, 2
),
vq_src AS (SELECT yr AS g, bucket FROM spend),
{group_quantiles_sql("vq_src", "g", "bucket", _VMM_QS, "vq")},
scored AS (
  SELECT s.o_custkey, s.yr, {score} AS q_score
  FROM spend s JOIN vq q ON s.yr = q.g
)
SELECT a.yr AS yr_from,
       a.q_score AS from_q,
       b.q_score AS to_q,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored a JOIN scored b
  ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
GROUP BY 1, 2, 3
"""


@query("value_migration_matrix", _vmm_oracle())
def value_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("timestamp")).alias("yr"),
    ).agg(
        F.floor(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            / 50000
        )
        .cast("bigint")
        .alias("bucket")
    )
    spend = shared(spend)
    cuts = group_quantiles(
        spend.select(F.col("yr").alias("g"), "bucket"), "g", "bucket", _VMM_QS
    )
    s = F.lit(1)
    for c in _VMM_QS:
        s = s + F.when(F.col("bucket") > F.col(c), 1).otherwise(0)
    scored = spend.join(
        F.broadcast(cuts), spend.yr == cuts.g
    ).select("o_custkey", "yr", s.cast("bigint").alias("q_score"))
    a = scored.select(
        F.col("o_custkey").alias("ck"),
        F.col("yr").alias("yr_from"),
        F.col("q_score").alias("from_q"),
    )
    b = scored.select(
        F.col("o_custkey").alias("ck"),
        F.col("yr").alias("yr_to"),
        F.col("q_score").alias("to_q"),
    )
    return (
        a.join(b, (a.ck == b.ck) & (F.col("yr_to") == F.col("yr_from") + 1))
        .groupBy("yr_from", "from_q", "to_q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


# ----------------------------------------------------------------------
# seasonal_decompose — additive decomposition of the daily revenue
# series: trend (centered 7-day moving mean), day-of-week seasonal
# (mean of the detrended series per weekday), residual. The windows run
# over the DAY-AGGREGATED series (bounded by the calendar), never raw
# facts. Exactness trick: everything scales by 7 so the moving mean
# stays INTEGER (detr7 = 7x − Σ₇x); the only floats are the three final
# /7-style divisions and the seasonal mean — RAW IEEE quotients of
# engine-identical exact operands (s7/detr7 are int64 < 2^53, the
# seasonal sum goes through the decimal→varchar→double path), so they
# are bit-equal with NO final quantization. The r9 ×10-SF probe caught
# the previous form's DECIMAL(18,6) output casts flipping one digit:
# s7/7's 17-digit shortest repr ends in '5' one place past scale 6, and
# DuckDB's double→decimal cast rounds the SHORTEST REPR half-even while
# Spark's BigDecimal rounds the exact binary value — the same lesson
# the jl_norm_distortion oracle records: quantizing an identical-
# operand quotient only reintroduces the tie divergence.
# dow is epoch-day mod 7 — calendar-library-free and engine-identical.
# ----------------------------------------------------------------------

_DECOMP_ORACLE = """
WITH rev AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, x, CAST(day % 7 AS BIGINT) AS dow,
         CAST(SUM(x) OVER (ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
         CAST(COUNT(*) OVER (ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS n7
  FROM rev
),
det AS (
  SELECT day, x, dow, s7, 7 * x - s7 AS detr7
  FROM win WHERE n7 = 7
),
seas AS (
  SELECT dow,
         CAST(CAST(SUM(CAST(detr7 AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS seasonal7
  FROM det GROUP BY dow
)
SELECT d.day, d.x AS revenue_cents,
       CAST(d.s7 AS DOUBLE) / 7 AS trend,
       s.seasonal7 / 7 AS seasonal,
       (CAST(d.detr7 AS DOUBLE) - s.seasonal7) / 7 AS residual
FROM det d JOIN seas s ON d.dow = s.dow
"""


@query("seasonal_decompose", _DECOMP_ORACLE)
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("x")
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    win = rev.select(
        "day",
        "x",
        (F.col("day") % 7).cast("bigint").alias("dow"),
        F.sum("x").over(w7).cast("bigint").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("n7"),
    )
    det = shared(
        win.filter(F.col("n7") == 7).select(
            "day", "x", "dow", "s7", (F.col("x") * 7 - F.col("s7")).alias("detr7")
        )
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(F.col("detr7").cast("decimal(38,0)"))
            .cast("string")
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("seasonal7")
    )
    return det.join(F.broadcast(seas), "dow").select(
        "day",
        F.col("x").alias("revenue_cents"),
        (F.col("s7").cast("double") / 7).alias("trend"),
        (F.col("seasonal7") / 7).alias("seasonal"),
        ((F.col("detr7").cast("double") - F.col("seasonal7")) / 7).alias(
            "residual"
        ),
    )


# ----------------------------------------------------------------------
# ks_distance — two-sample Kolmogorov–Smirnov distance of each source's
# document-length distribution against the rest of the corpus: the
# drift detector a curation pipeline runs per ingest feed. Exact and
# log-free: D·(n_src·n_rest) = max |cum_src·n_rest − cum_rest·n_src| is
# pure integer arithmetic over the bounded (source × distinct-length)
# grid; only the final normalization divides. The grid is built from
# two bounded aggregates (distinct lengths × sources), never from rows.
# ----------------------------------------------------------------------

_KS_ORACLE = """
WITH h AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
vals AS (SELECT DISTINCT v FROM h),
srcs AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM h GROUP BY source
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tot FROM h),
grid AS (
  SELECT s.source, s.n_src, vals.v, COALESCE(h.c, 0) AS c
  FROM srcs s CROSS JOIN vals
  LEFT JOIN h ON h.source = s.source AND h.v = vals.v
),
cums AS (
  SELECT source, n_src, v,
         CAST(SUM(c) OVER (PARTITION BY source ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_src
  FROM grid
),
cumt AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS ct FROM h GROUP BY v
),
cumt2 AS (
  SELECT v, CAST(SUM(ct) OVER (ORDER BY v
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tot
  FROM cumt
),
d AS (
  SELECT c.source, c.n_src,
         (SELECT n_tot FROM tot) - c.n_src AS n_rest,
         ABS(c.cum_src * ((SELECT n_tot FROM tot) - c.n_src)
             - (t.cum_tot - c.cum_src) * c.n_src) AS d_scaled
  FROM cums c JOIN cumt2 t ON c.v = t.v
)
SELECT source, n_src, n_rest,
       CAST(MAX(d_scaled) AS BIGINT) AS d_scaled,
       CAST(MAX(d_scaled) AS DOUBLE)
         / (CAST(n_src AS DOUBLE) * CAST(n_rest AS DOUBLE)) AS ks_d
FROM d GROUP BY source, n_src, n_rest
"""


@query("ks_distance", _KS_ORACLE)
def ks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = shared(
        docs.groupBy("source", F.col("n_chars").alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
    )
    vals = h.select("v").distinct()
    srcs = h.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_src"))
    tot = h.agg(F.sum("c").cast("bigint").alias("n_tot"))
    grid = (
        srcs.crossJoin(F.broadcast(vals))
        .join(h, ["source", "v"], "left")
        .select("source", "n_src", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_src = (
        W.partitionBy("source").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    )
    cums = grid.select(
        "source", "n_src", "v",
        F.sum("c").over(w_src).cast("bigint").alias("cum_src"),
    )
    cumt = h.groupBy("v").agg(F.sum("c").cast("bigint").alias("ct"))
    w_tot = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cumt2 = cumt.select(
        "v", F.sum("ct").over(w_tot).cast("bigint").alias("cum_tot")
    )
    d = (
        cums.join(cumt2, "v")
        .join(F.broadcast(tot))
        .select(
            "source",
            "n_src",
            (F.col("n_tot") - F.col("n_src")).alias("n_rest"),
            F.abs(
                F.col("cum_src") * (F.col("n_tot") - F.col("n_src"))
                - (F.col("cum_tot") - F.col("cum_src")) * F.col("n_src")
            ).alias("d_scaled"),
        )
    )
    agg = d.groupBy("source", "n_src", "n_rest").agg(
        F.max("d_scaled").cast("bigint").alias("d_scaled")
    )
    # r10 audit: raw IEEE quotient of exact int64 operands — bit-equal.
    ks = F.col("d_scaled").cast("double") / (
        F.col("n_src").cast("double") * F.col("n_rest").cast("double")
    )
    return agg.select("source", "n_src", "n_rest", "d_scaled", ks.alias("ks_d"))


# ----------------------------------------------------------------------
# rank_auc — Mann–Whitney U / rank-biserial AUC between the purchase and
# click value distributions: "how separable are the two event types on
# value", the exact number behind every ROC-AUC report. Midrank (tie-
# corrected) arithmetic stays INTEGER by working on doubled ranks over
# the combined cent-value histogram: 2·R₁ = Σ c₁ᵥ·(2·cum_before + cᵥ+1).
# One histogram shuffle, bounded windows, a single exact division.
# ----------------------------------------------------------------------

_AUC_ORACLE = """
WITH src AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
         CAST(CAST(value * 100 AS DECIMAL(38,0)) AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'click')
),
h AS (
  SELECT v,
         CAST(SUM(grp) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM src GROUP BY v
),
cum AS (
  SELECT v, c1, c,
         CAST(COALESCE(SUM(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS before
  FROM h
),
s AS (
  SELECT CAST(SUM(c1 * (2 * before + c + 1)) AS BIGINT) AS r1x2,
         CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c - c1) AS BIGINT) AS n2
  FROM cum
)
SELECT n1, n2,
       CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
         / (2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc
FROM s
"""


@query("rank_auc", _AUC_ORACLE)
def rank_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    src = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        (F.col("value") * 100).cast("decimal(38,0)").cast("bigint").alias("v"),
    )
    h = src.groupBy("v").agg(
        F.sum("grp").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cum = h.select(
        "v", "c1", "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("bigint").alias("before"),
    )
    s = cum.agg(
        F.sum(F.col("c1") * (F.col("before") * 2 + F.col("c") + 1))
        .cast("bigint")
        .alias("r1x2"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("bigint").alias("n2"),
    )
    u1x2 = (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).cast("bigint")
    # r10 audit: raw IEEE quotient of exact int64 midrank statistics.
    # (n1*n2)*2 here vs the oracle's (2*n1)*n2 are bit-equal: scaling by
    # a power of two is exact and commutes with IEEE rounding.
    auc = u1x2.cast("double") / (
        F.col("n1").cast("double") * F.col("n2").cast("double") * 2
    )
    return s.select("n1", "n2", u1x2.alias("u1_x2"), auc.alias("auc"))


# ----------------------------------------------------------------------
# target_encoding — smoothed mean-target category encoding (the ML
# feature-engineering staple): enc(nation) = (Σ target + m·prior) /
# (n + m) with m = 100 pseudo-observations of the global mean, which
# shrinks rare categories toward the prior instead of memorizing noise.
# Two aggregations (per-category, global) + one broadcast; the encoding
# is a single division of exact integer-cent statistics on both engines.
# ----------------------------------------------------------------------

_TENC_M = 100

_TENC_ORACLE = f"""
WITH j AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(CAST(o.o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT nationkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS s
  FROM j GROUP BY nationkey
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(CAST(s AS DECIMAL(38,0)))
         AS BIGINT) AS ts
  FROM g
)
SELECT g.nationkey, g.n,
       (CAST(g.s AS DOUBLE)
        + {_TENC_M} * (CAST(tot.ts AS DOUBLE) / CAST(tot.tn AS DOUBLE)))
       / (CAST(g.n AS DOUBLE) + {_TENC_M}) / 100 AS encoded_value
FROM g, tot
"""


@query("target_encoding", _TENC_ORACLE)
def target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        bcast_if_small(cust.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").alias("nationkey"),
        (F.col("o_totalprice") * 100)
        .cast("decimal(38,0)")
        .cast("bigint")
        .alias("cents"),
    )
    g = j.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("bigint").alias("s"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum(F.col("s").cast("decimal(38,0)")).cast("bigint").alias("ts"),
    )
    # r10 audit: raw IEEE smoothing quotient of exact integer-cent sums.
    enc = (
        F.col("s").cast("double")
        + F.lit(_TENC_M)
        * (F.col("ts").cast("double") / F.col("tn").cast("double"))
    ) / (F.col("n").cast("double") + F.lit(_TENC_M)) / 100
    return g.join(F.broadcast(tot)).select(
        "nationkey", "n", enc.alias("encoded_value")
    )


# ----------------------------------------------------------------------
# lorenz_curve — revenue-concentration polyline: customers sorted by
# spend into $500 buckets, each bucket reporting the cumulative share of
# customers and of revenue below it (the Gini/Lorenz inequality read —
# "the top x% of customers carry y% of revenue"). The scalable form
# works entirely on the BOUNDED spend-bucket histogram: one customer
# aggregation, one histogram aggregation, cumulative windows over
# buckets, two exact divisions per output row.
# ----------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
hist AS (
  SELECT CAST(cents // 50000 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS s
  FROM spend GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_cust) AS BIGINT) AS tn,
         CAST(SUM(CAST(s AS DECIMAL(38,0))) AS BIGINT) AS ts
  FROM hist
),
cum AS (
  SELECT bucket, n_cust,
         CAST(SUM(n_cust) OVER w AS BIGINT) AS cum_cust,
         CAST(SUM(s) OVER w AS BIGINT) AS cum_cents
  FROM hist
  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT bucket, n_cust, cum_cust,
       CAST(cum_cust AS DOUBLE) / CAST((SELECT tn FROM tot) AS DOUBLE)
         AS cust_share,
       CAST(cum_cents AS DOUBLE) / CAST((SELECT ts FROM tot) AS DOUBLE)
         AS revenue_share
FROM cum
"""


@query("lorenz_curve", _LORENZ_ORACLE)
def lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("cents")
    )
    hist = spend.groupBy(
        F.floor(F.col("cents") / 50000).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("bigint").alias("s"),
    )
    hist = shared(hist)
    tot = hist.agg(
        F.sum("n_cust").cast("bigint").alias("tn"),
        F.sum(F.col("s").cast("decimal(38,0)")).cast("bigint").alias("ts"),
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        "n_cust",
        F.sum("n_cust").over(w).cast("bigint").alias("cum_cust"),
        F.sum("s").over(w).cast("bigint").alias("cum_cents"),
    )
    # r10 audit: raw IEEE shares — exact int64 cumulative sums over totals.
    return cum.join(F.broadcast(tot)).select(
        "bucket",
        "n_cust",
        "cum_cust",
        (F.col("cum_cust").cast("double") / F.col("tn").cast("double")).alias(
            "cust_share"
        ),
        (
            F.col("cum_cents").cast("double") / F.col("ts").cast("double")
        ).alias("revenue_share"),
    )


# ----------------------------------------------------------------------
# lead_lag_corr — cross-correlation function between the daily order-
# revenue and event-count series at lags −7..+7, with the peak flagged:
# does activity LEAD revenue (negative lag) or trail it? The lead-lag
# read a growth team runs before attributing causality. One explode
# fans the bounded day series across all 15 lag hypotheses; every
# Pearson component is an exact DECIMAL(38,0) integer sum (the
# `daily_metric_corr` discipline); the peak is the max |r| on QUANTIZED
# values with a deterministic smallest-lag tie-break.
# ----------------------------------------------------------------------

_LL_LAGS = 7


def _leadlag_oracle() -> str:
    dd = lambda v: f"CAST(CAST({v} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH rev0 AS (
  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
ev0 AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
-- series cover disjoint calendar ranges: align each to its own first day
-- (day-of-campaign index) before the lag join
rev AS (SELECT day - (SELECT MIN(day) FROM rev0) AS day, x FROM rev0),
ev AS (SELECT day - (SELECT MIN(day) FROM ev0) AS day, y FROM ev0),
lags AS (SELECT unnest(range(-{_LL_LAGS}, {_LL_LAGS + 1})) AS lag),
j AS (
  SELECT l.lag, r.x, e.y
  FROM rev r CROSS JOIN lags l
  JOIN ev e ON e.day = r.day + l.lag
),
comp AS (
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS syy
  FROM j GROUP BY lag
),
r AS (
  SELECT CAST(lag AS BIGINT) AS lag, n,
         (CAST(n AS DOUBLE) * {dd("sxy")} - {dd("sx")} * {dd("sy")})
         / (SQRT(CAST(n AS DOUBLE) * {dd("sxx")} - {dd("sx")} * {dd("sx")})
            * SQRT(CAST(n AS DOUBLE) * {dd("syy")} - {dd("sy")} * {dd("sy")}))
           AS r
  FROM comp
)
SELECT lag, n, r,
       ABS(r) = (SELECT MAX(ABS(r)) FROM r)
         AND lag = (SELECT MIN(lag) FROM r r2
                    WHERE ABS(r2.r) = (SELECT MAX(ABS(r)) FROM r))
         AS is_peak
FROM r
"""


@query("lead_lag_corr", _leadlag_oracle())
def lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    rev0 = orders.groupBy(
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("x")
    )
    evd0 = ev.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint").alias("eday")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    rmin = rev0.agg(F.min("day").alias("rm"))
    emin = evd0.agg(F.min("eday").alias("em"))
    rev = rev0.join(F.broadcast(rmin)).select(
        (F.col("day") - F.col("rm")).alias("day"), "x"
    )
    evd = evd0.join(F.broadcast(emin)).select(
        (F.col("eday") - F.col("em")).alias("eday"), "y"
    )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(-_LL_LAGS, _LL_LAGS + 1)])
    ).alias("lag")
    j = (
        rev.select("day", "x", lags)
        .join(evd, F.col("eday") == F.col("day") + F.col("lag"))
        .select("lag", "x", "y")
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    comp = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38("x")).cast("decimal(38,0)").alias("sx"),
        F.sum(d38("y")).cast("decimal(38,0)").alias("sy"),
        F.sum(d38("x") * d38("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(d38("x") * d38("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d38("y") * d38("y")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    # r10 audit: raw IEEE r (exact DECIMAL(38,0) statistics both sides);
    # the peak-equality test still matches because max(|r|) IS one of the
    # bit-identical |r| values on both engines.
    rr = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        F.sqrt(nd * F.col("sxx").cast("double") - sxd * sxd)
        * F.sqrt(nd * F.col("syy").cast("double") - syd * syd)
    )
    r = shared(
        comp.select(F.col("lag").cast("bigint").alias("lag"), "n", rr.alias("r"))
    )
    peak = r.agg(F.max(F.abs(F.col("r"))).alias("mx"))
    peak_lag = (
        r.join(F.broadcast(peak))
        .filter(F.abs(F.col("r")) == F.col("mx"))
        .agg(F.min("lag").alias("peak_lag"))
    )
    return (
        r.join(F.broadcast(peak))
        .join(F.broadcast(peak_lag))
        .select(
            "lag",
            "n",
            "r",
            (
                (F.abs(F.col("r")) == F.col("mx"))
                & (F.col("lag") == F.col("peak_lag"))
            ).alias("is_peak"),
        )
    )


# ----------------------------------------------------------------------
# anova_oneway — one-way ANOVA of order value across the five order
# priorities: between/within sums of squares and the F statistic, the
# first hypothesis test an analyst runs on "does this dimension matter".
# Exactness discipline, learned the hard way: double→DECIMAL quantizing
# of the per-group terms round-ties DIFFERENTLY across engines (Spark
# HALF_UP, DuckDB HALF_EVEN — a term landing exactly on .5 flipped the
# hash), and scaled decimals overflow DuckDB's exact conversion above
# 2^63. So NO double→decimal conversion happens anywhere: the five
# groups pivot into one row of integer sufficient statistics and the
# rational Σs²/n is cleared to the common denominator Πn — pure
# DECIMAL(38,0) integer arithmetic (fits: 36 digits at this k) — before
# ONE final double expression evaluates SSB/SSW/F identically on both
# engines. Bounded by construction: k = 5 known priority levels.
# ----------------------------------------------------------------------

_ANOVA_GROUPS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _anova_oracle() -> str:
    ks = range(len(_ANOVA_GROUPS))
    conds = [f"o_orderpriority = '{g}'" for g in _ANOVA_GROUPS]
    cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS n{i},\n"
        f"         CAST(SUM(CASE WHEN {c} THEN CAST(o_totalprice * 100 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS s{i},\n"
        f"         CAST(SUM(CASE WHEN {c} THEN CAST(o_totalprice * 100 AS DECIMAL(38,0)) * CAST(o_totalprice * 100 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS ss{i}"
        for i, c in zip(ks, conds)
    )
    # fixed-order per-group s²/n sum: each s² stays a DECIMAL(38,0)
    # (33 digits even at petabyte scale), read through the VARCHAR
    # round-trip, divided and summed LEFT-TO-RIGHT in one expression —
    # deterministic because it is column arithmetic over the pivoted
    # row, never an aggregation (the common-denominator Σs²·Πn variant
    # overflowed 38 digits at sf0.1)
    s2n = " + ".join(
        f"CAST(CAST(s{i} * s{i} AS VARCHAR) AS DOUBLE)"
        f" / CAST(CAST(n{i} AS VARCHAR) AS DOUBLE)"
        for i in ks
    )
    tn = " + ".join(f"n{i}" for i in ks)
    ts = " + ".join(f"s{i}" for i in ks)
    sst = " + ".join(f"ss{i}" for i in ks)
    dd = lambda v: f"CAST(CAST({v} AS VARCHAR) AS DOUBLE)"
    return f"""
WITH p AS (
  SELECT {cols}
  FROM orders
),
e AS (
  SELECT CAST(({tn}) AS BIGINT) AS tn,
         CAST(CAST(({ts}) AS VARCHAR) AS DOUBLE) AS tsd,
         {dd(f"({sst})")} AS sstd,
         ({s2n}) AS s2n
  FROM p
)
SELECT CAST({len(_ANOVA_GROUPS)} AS BIGINT) AS k, tn AS n,
       s2n - tsd * tsd / CAST(tn AS DOUBLE) AS ssb,
       sstd - s2n AS ssw,
       ((s2n - tsd * tsd / CAST(tn AS DOUBLE))
        / CAST({len(_ANOVA_GROUPS) - 1} AS DOUBLE))
       / ((sstd - s2n) / CAST(tn - {len(_ANOVA_GROUPS)} AS DOUBLE))
         AS f_stat
FROM e
"""


@query("anova_oneway", _anova_oracle())
def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice") * 100).cast("decimal(38,0)")
    ks = range(len(_ANOVA_GROUPS))
    aggs = []
    for i, gname in zip(ks, _ANOVA_GROUPS):
        cond = F.col("o_orderpriority") == gname
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("decimal(38,0)").alias(f"n{i}"),
            F.sum(F.when(cond, cents)).cast("decimal(38,0)").alias(f"s{i}"),
            F.sum(F.when(cond, cents * cents)).cast("decimal(38,0)").alias(f"ss{i}"),
        ]
    p = orders.agg(*aggs)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tn_d = d38(sum(F.col(f"n{i}") for i in ks))
    ts_d = d38(sum(F.col(f"s{i}") for i in ks))
    sst_d = d38(sum(F.col(f"ss{i}") for i in ks))
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    s2n = None
    for i in ks:
        term = dd(d38(F.col(f"s{i}") * F.col(f"s{i}"))) / dd(
            d38(F.col(f"n{i}"))
        )
        s2n = term if s2n is None else s2n + term
    e = p.select(
        tn_d.cast("bigint").alias("tn"),
        dd(ts_d).alias("tsd"),
        dd(sst_d).alias("sstd"),
        s2n.alias("s2n"),
    )
    k = len(_ANOVA_GROUPS)
    ssb = F.col("s2n") - F.col("tsd") * F.col("tsd") / F.col("tn").cast("double")
    ssw = F.col("sstd") - F.col("s2n")
    f_stat = (ssb / F.lit(float(k - 1))) / (
        ssw / (F.col("tn") - k).cast("double")
    )
    return e.select(
        F.lit(k).cast("bigint").alias("k"),
        F.col("tn").alias("n"),
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        f_stat.alias("f_stat"),
    )


# ----------------------------------------------------------------------
# mann_kendall_trend — non-parametric monotone-trend test over the
# monthly revenue series per order priority: S = sum_{i<j} sign(y_j-y_i).
# Rank statistics need no distributional assumptions and, unlike the OLS
# slope (`linreg_per_group`), are exact in integer arithmetic end-to-end:
# revenue is aggregated to integer cents, sign comparisons are integer,
# S is an integer sum. The pairwise stage is bounded by the CALENDAR
# (80 months at any fact scale), not the fact table — at 100 TB the
# month aggregation is the only full-data shuffle (partial-aggregated
# map-side); the self-join runs on a broadcast-sized series. Parity:
# the reference computes trend statistics in per-key reducers over
# sorted input (secondary sort, MAPREDUCE/.../Reducer.java); here the
# sorted-pairs semantics compile to one agg + one broadcast self-join.
# ----------------------------------------------------------------------

_MK_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS pri,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
)
SELECT a.pri AS o_orderpriority,
       CAST(COUNT(DISTINCT a.mi) + 1 AS BIGINT) AS n_months,
       CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                     WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT)
         AS s_stat,
       CASE WHEN SUM(CASE WHEN b.cents > a.cents THEN 1
                          WHEN b.cents < a.cents THEN -1 ELSE 0 END) > 0
            THEN 'increasing'
            WHEN SUM(CASE WHEN b.cents > a.cents THEN 1
                          WHEN b.cents < a.cents THEN -1 ELSE 0 END) < 0
            THEN 'decreasing' ELSE 'flat' END AS trend
FROM m a JOIN m b ON a.pri = b.pri AND b.mi > a.mi
GROUP BY a.pri
"""


@query("mann_kendall_trend", _MK_ORACLE)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S statistic per priority over monthly revenue cents."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    m = (
        orders.groupBy(
            F.col("o_orderpriority").alias("pri"),
            (F.year(ts) * 12 + F.month(ts)).cast("long").alias("mi"),
        )
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    a, b = m.alias("a"), m.alias("b")
    sgn = F.when(F.col("b.cents") > F.col("a.cents"), 1).when(
        F.col("b.cents") < F.col("a.cents"), -1
    ).otherwise(0)
    s = F.sum(sgn).cast("bigint")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.pri") == F.col("b.pri")) & (F.col("b.mi") > F.col("a.mi")),
        )
        .groupBy(F.col("a.pri").alias("o_orderpriority"))
        .agg(
            (F.count_distinct(F.col("a.mi")) + 1).cast("bigint").alias("n_months"),
            s.alias("s_stat"),
            F.when(s > 0, "increasing")
            .when(s < 0, "decreasing")
            .otherwise("flat")
            .alias("trend"),
        )
    )


# ----------------------------------------------------------------------
# theil_sen_slope — robust trend slope per priority: the MEDIAN of all
# pairwise slopes (cents_j - cents_i) / (mi_j - mi_i) over the monthly
# series. Each slope is one IEEE division of two exact integers —
# bit-identical across engines — and the median is an exact ordered
# selection (row_number over the total order (slope, mi_i, mi_j), average
# of the middle one-or-two), never an engine-internal percentile
# interpolation. Pair count is calendar-bounded (~3.2k per group); the
# only full-data shuffle is the month aggregation.
# ----------------------------------------------------------------------

_TS_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS pri,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
), sl AS (
  SELECT a.pri,
         CAST(b.cents - a.cents AS DOUBLE)
           / CAST(b.mi - a.mi AS DOUBLE) AS slope,
         ROW_NUMBER() OVER (
           PARTITION BY a.pri
           ORDER BY CAST(b.cents - a.cents AS DOUBLE)
                      / CAST(b.mi - a.mi AS DOUBLE), a.mi, b.mi
         ) AS rn,
         COUNT(*) OVER (PARTITION BY a.pri) AS np
  FROM m a JOIN m b ON a.pri = b.pri AND b.mi > a.mi
)
SELECT pri AS o_orderpriority,
       CAST(MAX(np) AS BIGINT) AS n_pairs,
       (SUM(slope) / COUNT(*)) AS sen_slope_cents_per_month
FROM sl
WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
GROUP BY pri
"""


@query("theil_sen_slope", _TS_ORACLE)
def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-pairwise-slopes trend estimate per priority (exact pick)."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    m = (
        orders.groupBy(
            F.col("o_orderpriority").alias("pri"),
            (F.year(ts) * 12 + F.month(ts)).cast("long").alias("mi"),
        )
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    a, b = m.alias("a"), m.alias("b")
    slope = (F.col("b.cents") - F.col("a.cents")).cast("double") / (
        F.col("b.mi") - F.col("a.mi")
    ).cast("double")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.pri") == F.col("b.pri")) & (F.col("b.mi") > F.col("a.mi")),
        )
        .select(
            F.col("a.pri").alias("pri"),
            slope.alias("slope"),
            F.col("a.mi").alias("mi1"),
            F.col("b.mi").alias("mi2"),
        )
    )
    w = Window.partitionBy("pri").orderBy("slope", "mi1", "mi2")
    ranked = pairs.select(
        "pri",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("pri")).alias("np"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("np") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("np") + 2) / 2))
    )
    return mid.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        (F.sum("slope") / F.count(F.lit(1))).alias("sen_slope_cents_per_month"),
    )


# ----------------------------------------------------------------------
# spearman_rho — rank correlation between part size and retail price per
# brand. Average-rank tie handling is expressed in closed integer form
# (doubled average rank = 2*RANK() + tie_count - 1, so halves never
# appear); Pearson over the doubled ranks equals Pearson over the ranks
# (the factor 2 cancels), computed from exact integer sufficient sums
# carried as DECIMAL(38,0) — rank-square sums grow as n^3 and would
# overflow BIGINT at cluster scale — with ONE final double expression
# quantized on both sides. One shuffle on brand; windows and the agg
# share the same partitioning.
# ----------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH r AS (
  SELECT p_brand,
         2 * RANK() OVER (PARTITION BY p_brand ORDER BY p_size)
           + COUNT(*) OVER (PARTITION BY p_brand, p_size) - 1 AS ra,
         2 * RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice)
           + COUNT(*) OVER (PARTITION BY p_brand, p_retailprice) - 1 AS rb
  FROM part
), s AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ra AS DECIMAL(38,0))) AS VARCHAR) AS sa,
         CAST(SUM(CAST(rb AS DECIMAL(38,0))) AS VARCHAR) AS sb,
         CAST(SUM(CAST(ra AS DECIMAL(38,0)) * rb) AS VARCHAR) AS sab,
         CAST(SUM(CAST(ra AS DECIMAL(38,0)) * ra) AS VARCHAR) AS saa,
         CAST(SUM(CAST(rb AS DECIMAL(38,0)) * rb) AS VARCHAR) AS sbb
  FROM r GROUP BY p_brand
)
SELECT p_brand, n,
       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
          - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       / SQRT(GREATEST(
           (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
              - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)),
           1e-300)) AS rho
FROM s
"""


@query("spearman_rho", _SPEARMAN_ORACLE)
def spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (average-rank ties) per brand."""
    part = load_table(spark, sf_dir, "part")
    ra = (
        2 * F.rank().over(Window.partitionBy("p_brand").orderBy("p_size"))
        + F.count(F.lit(1)).over(Window.partitionBy("p_brand", "p_size"))
        - 1
    )
    rb = (
        2 * F.rank().over(Window.partitionBy("p_brand").orderBy("p_retailprice"))
        + F.count(F.lit(1)).over(Window.partitionBy("p_brand", "p_retailprice"))
        - 1
    )
    r = part.select("p_brand", ra.alias("ra"), rb.alias("rb"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = r.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d38(F.col("ra"))).cast("string").alias("sa"),
        F.sum(d38(F.col("rb"))).cast("string").alias("sb"),
        F.sum(d38(F.col("ra")) * F.col("rb")).cast("string").alias("sab"),
        F.sum(d38(F.col("ra")) * F.col("ra")).cast("string").alias("saa"),
        F.sum(d38(F.col("rb")) * F.col("rb")).cast("string").alias("sbb"),
    )
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    num = dd("n") * dd("sab") - dd("sa") * dd("sb")
    den = F.sqrt(
        F.greatest(
            (dd("n") * dd("saa") - dd("sa") * dd("sa"))
            * (dd("n") * dd("sbb") - dd("sb") * dd("sb")),
            F.lit(1e-300),
        )
    )
    # r10 audit: raw IEEE rho of exact integer doubled-rank statistics.
    return s.select("p_brand", "n", (num / den).alias("rho"))


# ----------------------------------------------------------------------
# clamped_running_stock — per-supplier inventory level replay: receipts
# (+qty) and returns (-qty) in shipdate order, with the level clamped at
# zero (you cannot ship below empty). The clamp makes the recursion
# L_t = max(0, L_{t-1} + x_t) NON-associative, so it looks like a
# sequential fold — but the Lindley equation has the closed form
#     L_t = S_t - min(0, min_{k<=t} S_k)
# over the plain prefix sum S_t, which compiles to TWO keyed window sums
# (running sum + running min), both whole-stage-codegen'd and partitioned
# by supplier: no fold, no collect_list, no state. A clamp event at t is
# S_t < min(0, min_{k<t} S_k), read off a lag of the running min. All
# arithmetic is integer (quantities). At 100 TB each supplier's history
# sorts within its hash partition — the same shape as `ewma_smooth`.
# ----------------------------------------------------------------------

_CLAMP_ORACLE = """
WITH flow AS (
  SELECT l_suppkey,
         CAST(epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS BIGINT)
           AS day,
         l_orderkey, l_linenumber,
         CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
              ELSE CAST(l_quantity AS BIGINT) END AS x
  FROM lineitem
), p1 AS (
  SELECT l_suppkey, day, l_orderkey, l_linenumber,
         SUM(x) OVER (PARTITION BY l_suppkey
                      ORDER BY day, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM flow
), p2 AS (
  SELECT l_suppkey, day, l_orderkey, l_linenumber, s,
         MIN(s) OVER (PARTITION BY l_suppkey
                      ORDER BY day, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS runmin
  FROM p1
), pre AS (
  SELECT l_suppkey, day, l_orderkey, l_linenumber, s, runmin,
         LAG(runmin) OVER (PARTITION BY l_suppkey
                           ORDER BY day, l_orderkey, l_linenumber) AS prevmin
  FROM p2
), lvl AS (
  SELECT l_suppkey,
         s - LEAST(0, runmin) AS level,
         CASE WHEN s < LEAST(0, COALESCE(prevmin, 0)) THEN 1 ELSE 0 END
           AS clamped,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY day DESC, l_orderkey DESC,
                                     l_linenumber DESC) AS rn_last
  FROM pre
)
SELECT l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_moves,
       CAST(MAX(CASE WHEN rn_last = 1 THEN level END) AS BIGINT)
         AS final_level,
       CAST(MAX(level) AS BIGINT) AS peak_level,
       CAST(SUM(clamped) AS BIGINT) AS n_clamps
FROM lvl GROUP BY l_suppkey
"""


@query("clamped_running_stock", _CLAMP_ORACLE)
def clamped_running_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-clamped inventory replay via the Lindley closed form (2 windows)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.when(
        F.col("l_returnflag") == "R", -F.col("l_quantity").cast("bigint")
    ).otherwise(F.col("l_quantity").cast("bigint"))
    flow = li.select(
        "l_suppkey",
        F.floor(
            F.unix_micros(F.col("l_shipdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day"),
        "l_orderkey",
        "l_linenumber",
        x.alias("x"),
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("day", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("l_suppkey").orderBy("day", "l_orderkey", "l_linenumber")
    pre = flow.select(
        "l_suppkey",
        "day",
        "l_orderkey",
        "l_linenumber",
        F.sum("x").over(w).alias("s"),
    )
    pre = pre.select(
        "l_suppkey",
        "day",
        "l_orderkey",
        "l_linenumber",
        "s",
        F.min("s").over(w).alias("runmin"),
    )
    pre = pre.select(
        "l_suppkey",
        "day",
        "l_orderkey",
        "l_linenumber",
        "s",
        "runmin",
        F.lag("runmin").over(wo).alias("prevmin"),
    )
    lvl = pre.select(
        "l_suppkey",
        (F.col("s") - F.least(F.lit(0), F.col("runmin"))).alias("level"),
        F.when(
            F.col("s") < F.least(F.lit(0), F.coalesce(F.col("prevmin"), F.lit(0))),
            1,
        )
        .otherwise(0)
        .alias("clamped"),
        F.row_number()
        .over(
            Window.partitionBy("l_suppkey").orderBy(
                F.col("day").desc(), F.col("l_orderkey").desc(),
                F.col("l_linenumber").desc()
            )
        )
        .alias("rn_last"),
    )
    return lvl.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.max(F.when(F.col("rn_last") == 1, F.col("level")))
        .cast("bigint")
        .alias("final_level"),
        F.max("level").cast("bigint").alias("peak_level"),
        F.sum("clamped").cast("bigint").alias("n_clamps"),
    )


# ----------------------------------------------------------------------
# local_peaks — local-maximum detection on the daily event-count series:
# a day is a peak when its count strictly exceeds both neighbors
# (missing neighbor = series edge, never a peak). The prominence-lite
# margin (count - max(neighbors)) ranks the peaks. The window runs over
# the DAY series — one aggregation of the fact table, then a
# calendar-bounded window; the neighbor test is lag/lead on the day-dense
# series (the fixture's event feed has no missing days inside its span;
# adjacency is by day INDEX so a gap would simply compare across it,
# exactly like the reference's sorted-reduce neighbor scan).
# ----------------------------------------------------------------------

_PEAKS_ORACLE = """
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), w AS (
  SELECT day, cnt,
         LAG(cnt) OVER (ORDER BY day) AS prv,
         LEAD(cnt) OVER (ORDER BY day) AS nxt
  FROM d
)
SELECT day - (SELECT MIN(day) FROM d) AS day_index,
       cnt,
       CAST(cnt - GREATEST(prv, nxt) AS BIGINT) AS prominence
FROM w
WHERE prv IS NOT NULL AND nxt IS NOT NULL AND cnt > prv AND cnt > nxt
"""


@query("local_peaks", _PEAKS_ORACLE)
def local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima of the daily event-count series."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wd = Window.orderBy("day")
    w = d.select(
        "day",
        "cnt",
        F.lag("cnt").over(wd).alias("prv"),
        F.lead("cnt").over(wd).alias("nxt"),
    )
    m = d.agg(F.min("day").alias("d0"))
    peaks = w.filter(
        F.col("prv").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("cnt") > F.col("prv"))
        & (F.col("cnt") > F.col("nxt"))
    )
    return peaks.join(F.broadcast(m)).select(
        (F.col("day") - F.col("d0")).alias("day_index"),
        "cnt",
        (F.col("cnt") - F.greatest("prv", "nxt")).cast("bigint").alias("prominence"),
    )


# ----------------------------------------------------------------------
# poisson_bootstrap_ci — bootstrap confidence interval for the mean order
# value per priority, in the resampling form that was INVENTED for
# map-reduce scale (Chamandy et al., "Estimating Uncertainty for Massive
# Data Streams", Google 2012): instead of materializing B resamples, each
# row draws a deterministic Poisson(1) weight per replicate from a
# portable hash, so replicate b's mean is a weighted aggregate and all B
# replicates ride ONE map-side-combined shuffle of 5*B cells. The CI is
# an exact ordered selection over the 48 replicate means (2nd/47th of
# 48 ≈ 95.8% interval), never an engine percentile. Every weight is an
# integer threshold comparison on the hash; means are exact-integer
# ratios evaluated once in IEEE double on both engines.
# ----------------------------------------------------------------------

import math as _math

_BOOT_B = 48
# One md5 per (row, group-of-8): the 32 hex chars of a single digest are
# split into EIGHT independent 16-bit draws, so 48 replicates cost 6 md5
# calls per row instead of 48 — the x30 scale probe showed the digest,
# not the aggregation, dominating the one-pass plan. Thresholds are the
# cumulative Poisson(1) CDF at 16-bit granularity, shared verbatim by
# both engines (weights cap at 4).
_BOOT_G = 6  # md5 groups of 8 draws each
_BOOT_M = 1 << 16
_BOOT_C = [
    int(_math.floor(sum(_math.exp(-1) / _math.factorial(j) for j in range(k + 1))
                    * _BOOT_M))
    for k in range(4)
]


def _boot_w_sql(u: str) -> str:
    c0, c1, c2, c3 = _BOOT_C
    return (
        f"CASE WHEN {u} < {c0} THEN 0 WHEN {u} < {c1} THEN 1 "
        f"WHEN {u} < {c2} THEN 2 WHEN {u} < {c3} THEN 3 ELSE 4 END"
    )


_BOOT_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority AS pri, o_orderkey,
         CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) AS cents
  FROM orders
), hashed AS (
  SELECT pri, cents, CAST(g.g AS INTEGER) AS g,
         md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(g.g AS VARCHAR)) AS h
  FROM base CROSS JOIN UNNEST(range({_BOOT_G})) AS g(g)
), drawn AS (
  SELECT pri, CAST(g * 8 + j.j AS INTEGER) AS b, cents,
         {_boot_w_sql(
             "CAST('0x' || substr(h, CAST(j.j * 4 + 1 AS INTEGER), 4)"
             " AS INTEGER)")} AS w
  FROM hashed CROSS JOIN UNNEST(range(8)) AS j(j)
), reps AS (
  SELECT pri, b,
         CAST(SUM(CAST(w AS DECIMAL(38,0)) * cents) AS VARCHAR) AS swc,
         CAST(SUM(w) AS BIGINT) AS sw
  FROM drawn WHERE w > 0 GROUP BY pri, b
), means AS (
  SELECT pri, b,
         CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE) AS m,
         ROW_NUMBER() OVER (PARTITION BY pri
                            ORDER BY CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE),
                                     b) AS rn
  FROM reps
)
SELECT pri AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_reps,
       MAX(CASE WHEN rn = 2 THEN m END) AS ci_lo_cents,
       MAX(CASE WHEN rn = {_BOOT_B - 1} THEN m END) AS ci_hi_cents
FROM means GROUP BY pri
"""


@query("poisson_bootstrap_ci", _BOOT_ORACLE)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson(1) bootstrap CI for mean order cents per priority."""
    from hadoop_spark.functions.hashing import portable_hash64

    orders = load_table(spark, sf_dir, "orders")
    # r10 opt (guide §2.5 input-splits / §1.2 step 1): the whole 6-md5-per-
    # row replicate-weight map phase sits BEFORE the first exchange, so on
    # an under-split scan (one parquet row group at bench scale) it ran on
    # one core. fanout_small spreads the 3 narrow columns across the
    # cluster first (no-op at real scale, where the fact table already
    # carries enough splits). Measured sf0.1: 7.97 s -> 2.0 s median.
    base = fanout_small(
        orders.select(
            F.col("o_orderpriority").alias("pri"),
            "o_orderkey",
            (F.col("o_totalprice") * 100).cast("decimal(38,0)").cast("bigint")
            .alias("cents"),
        )
    )
    hashed = base.select(
        "pri",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_G - 1))).alias("g"),
        "o_orderkey",
    ).select(
        "pri",
        "cents",
        "g",
        F.md5(F.concat_ws(":", F.col("o_orderkey"), F.col("g"))).alias("h"),
    )
    drawn = hashed.select(
        "pri",
        "cents",
        "g",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"),
    )
    u = F.conv(
        F.col("h").substr(F.col("j") * 4 + 1, F.lit(4)), 16, 10
    ).cast("int")
    c0, c1, c2, c3 = _BOOT_C
    w = (
        F.when(u < c0, 0)
        .when(u < c1, 1)
        .when(u < c2, 2)
        .when(u < c3, 3)
        .otherwise(4)
    )
    reps = (
        drawn.select(
            "pri",
            (F.col("g") * 8 + F.col("j")).cast("int").alias("b"),
            "cents",
            w.alias("w"),
        )
        .filter(F.col("w") > 0)
        .groupBy("pri", "b")
        .agg(
            F.sum(F.col("w").cast("decimal(38,0)") * F.col("cents"))
            .cast("string")
            .alias("swc"),
            F.sum("w").cast("bigint").alias("sw"),
        )
    )
    m = F.col("swc").cast("double") / F.col("sw").cast("double")
    means = reps.select(
        "pri",
        "b",
        m.alias("m"),
        F.row_number()
        .over(Window.partitionBy("pri").orderBy(m, "b"))
        .alias("rn"),
    )
    return means.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
        F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo_cents"),
        F.max(F.when(F.col("rn") == _BOOT_B - 1, F.col("m"))).alias("ci_hi_cents"),
    )


# ----------------------------------------------------------------------
# isotonic_fit — exact weighted isotonic regression (the PAVA fit used to
# CALIBRATE model scores in ML pipelines) of mean retail price against
# part size. Pool-Adjacent-Violators is a sequential pooling algorithm,
# but its solution has the closed minimax form
#     fit_i = max_{j<=i} min_{k>=i} weighted_mean(y_j .. y_k)
# which is pure relational algebra over the SIZE-BUCKET table: prefix
# sums, a bounded pair join, a bounded (j,i,k) grid, min-then-max. The
# fact-table scan aggregates to one row per distinct size (domain-bounded
# — 50 here, never data-bounded), so the cubic grid is a few thousand
# rows at ANY fact scale; every mean is an exact-integer ratio evaluated
# once in IEEE double identically on both engines.
# ----------------------------------------------------------------------

_ISO_ORACLE = """
WITH b AS (
  SELECT p_size AS x,
         CAST(COUNT(*) AS BIGINT) AS w,
         CAST(SUM(CAST(p_retailprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS s
  FROM part GROUP BY p_size
), p AS (
  SELECT x, w, s,
         SUM(w) OVER (ORDER BY x) AS cw,
         SUM(s) OVER (ORDER BY x) AS cs
  FROM b
), pairs AS (
  SELECT j.x AS xj, k.x AS xk,
         CAST(k.cs - (j.cs - j.s) AS DOUBLE)
           / CAST(k.cw - (j.cw - j.w) AS DOUBLE) AS m
  FROM p j JOIN p k ON k.x >= j.x
), inner_min AS (
  SELECT g.x, pr.xj, MIN(pr.m) AS mn
  FROM pairs pr JOIN b g ON pr.xj <= g.x AND g.x <= pr.xk
  GROUP BY g.x, pr.xj
)
SELECT i.x AS p_size, i.w AS n_parts,
       CAST(i.s AS DOUBLE) / CAST(i.w AS DOUBLE) AS raw_mean_cents,
       MAX(im.mn) AS fit_cents
FROM inner_min im JOIN b i ON im.x = i.x
GROUP BY i.x, i.w, i.s
"""


@query("isotonic_fit", _ISO_ORACLE)
def isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact isotonic (monotone) calibration fit via the minimax closed form."""
    part = load_table(spark, sf_dir, "part")
    b = shared(
        part.groupBy(F.col("p_size").alias("x")).agg(
            F.count(F.lit(1)).cast("bigint").alias("w"),
            F.sum((F.col("p_retailprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("s"),
        )
    )
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = b.select(
        "x", "w", "s",
        F.sum("w").over(wx).alias("cw"),
        F.sum("s").over(wx).alias("cs"),
    )
    j, k = p.alias("j"), p.alias("k")
    m = (
        (F.col("k.cs") - (F.col("j.cs") - F.col("j.s"))).cast("double")
        / (F.col("k.cw") - (F.col("j.cw") - F.col("j.w"))).cast("double")
    )
    pairs = j.join(F.broadcast(k), F.col("k.x") >= F.col("j.x")).select(
        F.col("j.x").alias("xj"), F.col("k.x").alias("xk"), m.alias("m")
    )
    g = b.select(F.col("x"))
    inner_min = (
        pairs.join(
            F.broadcast(g),
            (F.col("xj") <= F.col("x")) & (F.col("x") <= F.col("xk")),
        )
        .groupBy("x", "xj")
        .agg(F.min("m").alias("mn"))
    )
    return (
        inner_min.join(F.broadcast(b.alias("i")), "x")
        .groupBy(
            F.col("x").alias("p_size"),
            F.col("w").alias("n_parts"),
            (F.col("s").cast("double") / F.col("w").cast("double")).alias(
                "raw_mean_cents"
            ),
        )
        .agg(F.max("mn").alias("fit_cents"))
    )


# ----------------------------------------------------------------------
# funnel_greedy_match — ordered-funnel completion with GREEDY step
# matching: step k matches the EARLIEST event of its type that falls
# strictly after the matched step k-1, per user. `funnel_counts` uses
# first-occurrence times (first click must follow the first view), which
# misses users whose stray early click precedes their first view; greedy
# matching — the semantics analytics products implement — catches them.
# The sequential scan compiles to ONE keyed window pass: a running min of
# view times feeds the click qualifier, a running min of qualified-click
# times feeds the purchase qualifier; one shuffle on user_id, no joins,
# no per-user collect. All comparisons are integer microseconds.
# ----------------------------------------------------------------------

_GREEDY_FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase') AND user_id IS NOT NULL
), w1 AS (
  SELECT user_id, event_type, t,
         MIN(CASE WHEN event_type = 'view' THEN t END)
           OVER (PARTITION BY user_id ORDER BY t, event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vmin
  FROM e
), w2 AS (
  SELECT user_id, event_type, t,
         CASE WHEN event_type = 'click' AND vmin < t THEN t END AS cq
  FROM w1
), w3 AS (
  SELECT user_id, event_type, t,
         MIN(cq) OVER (PARTITION BY user_id ORDER BY t, event_type
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cmin
  FROM w2
), per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
         MAX(CASE WHEN event_type = 'click' AND cmin IS NOT NULL
                   AND cmin <= t THEN 1 ELSE 0 END) AS s2_raw,
         MAX(CASE WHEN event_type = 'purchase' AND cmin < t
                  THEN 1 ELSE 0 END) AS s3
  FROM w3 GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(s1) AS BIGINT) AS step_view,
       CAST(SUM(CASE WHEN s2_raw = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS step_click,
       CAST(SUM(s3) AS BIGINT) AS step_purchase
FROM per_user
"""


@query("funnel_greedy_match", _GREEDY_FUNNEL_ORACLE)
def funnel_greedy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy view->click->purchase funnel in one keyed window pass."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
        & F.col("user_id").isNotNull()
    ).select("user_id", "event_type", F.unix_micros("ts").alias("t"))
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w1 = e.select(
        "user_id",
        "event_type",
        "t",
        F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(wrun)
        .alias("vmin"),
    )
    w2 = w1.select(
        "user_id",
        "event_type",
        "t",
        F.when(
            (F.col("event_type") == "click") & (F.col("vmin") < F.col("t")),
            F.col("t"),
        ).alias("cq"),
    )
    w3 = w2.select(
        "user_id",
        "event_type",
        "t",
        F.min("cq").over(wrun).alias("cmin"),
    )
    per_user = w3.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("s1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("cmin").isNotNull()
                & (F.col("cmin") <= F.col("t")),
                1,
            ).otherwise(0)
        ).alias("s2_raw"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("cmin") < F.col("t")),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("s1").cast("bigint").alias("step_view"),
        F.sum(F.when(F.col("s2_raw") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("step_click"),
        F.sum("s3").cast("bigint").alias("step_purchase"),
    )


# ----------------------------------------------------------------------
# price_ending_bias — forensic round-number analysis of order totals:
# the distribution of the cents-ending (the two digits after the decimal
# point) against the uniform 1% expectation, the companion test to
# `benford_digits` (leading digit) that payment auditors run for
# hand-keyed or fabricated amounts. Pure map-side bucketing + one
# 100-cell aggregation; the over-representation ratio is an exact
# integer-ratio expression.
# ----------------------------------------------------------------------

_ENDING_ORACLE = """
WITH e AS (
  SELECT CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) % 100
           AS ending
  FROM orders
), c AS (
  SELECT ending, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS tot
  FROM e GROUP BY ending
)
SELECT ending, n,
       CAST(100 AS DOUBLE) * CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
         AS lift_vs_uniform
FROM c
ORDER BY n DESC, ending
LIMIT 10
"""


@query("price_ending_bias", _ENDING_ORACLE)
def price_ending_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 over-represented cents endings of order totals."""
    orders = load_table(spark, sf_dir, "orders")
    e = orders.select(
        ((F.col("o_totalprice") * 100).cast("decimal(38,0)").cast("bigint") % 100)
        .alias("ending")
    )
    c = e.groupBy("ending").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("tot"))
    lift = F.lit(100.0) * F.col("n").cast("double") / F.col("tot").cast("double")
    return (
        c.join(F.broadcast(tot))
        .select("ending", "n", lift.alias("lift_vs_uniform"))
        .orderBy(F.col("n").desc(), "ending")
        .limit(10)
    )


# ----------------------------------------------------------------------
# capture_recapture — Lincoln-Petersen / Chapman population estimation
# from two deterministic hash samples: the survey-statistics trick a
# data platform uses to estimate a TRUE entity count (here: distinct
# customers in the order feed) when full deduplication is too expensive
# — draw two independent 30% samples, count the overlap, estimate
# N ≈ (n1+1)(n2+1)/(m+1) - 1. Both samples are pure functions of the
# key (`portable_hash64` with different salts — the reference's
# PercentFilter with two seeds, SequenceFileInputFilter.java:154), so
# the estimate is reproducible under any partitioning. One distinct-agg
# shuffle; the estimator is one exact-integer-fed double expression,
# audited against the true count in the same result row.
# ----------------------------------------------------------------------

_CR_ORACLE = f"""
WITH c AS (
  SELECT DISTINCT o_custkey FROM orders
), flags AS (
  SELECT o_custkey,
         CASE WHEN {portable_hash64_sql('o_custkey', 's1')} % 10 < 3
              THEN 1 ELSE 0 END AS in1,
         CASE WHEN {portable_hash64_sql('o_custkey', 's2')} % 10 < 3
              THEN 1 ELSE 0 END AS in2
  FROM c
)
SELECT CAST(SUM(in1) AS BIGINT) AS n1,
       CAST(SUM(in2) AS BIGINT) AS n2,
       CAST(SUM(in1 * in2) AS BIGINT) AS m,
       CAST((CAST(SUM(in1) AS DOUBLE) + 1) * (CAST(SUM(in2) AS DOUBLE) + 1)
            / (CAST(SUM(in1 * in2) AS DOUBLE) + 1) - 1 AS DOUBLE) AS n_hat,
       CAST(COUNT(*) AS BIGINT) AS true_n
FROM flags
"""


@query("capture_recapture", _CR_ORACLE)
def capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the distinct-customer count."""
    from hadoop_spark.functions.hashing import portable_hash64

    orders = load_table(spark, sf_dir, "orders")
    c = orders.select("o_custkey").distinct()
    flags = c.select(
        F.when(portable_hash64(F.col("o_custkey"), "s1") % 10 < 3, 1)
        .otherwise(0)
        .alias("in1"),
        F.when(portable_hash64(F.col("o_custkey"), "s2") % 10 < 3, 1)
        .otherwise(0)
        .alias("in2"),
    )
    n1 = F.sum("in1").cast("bigint")
    n2 = F.sum("in2").cast("bigint")
    m = F.sum(F.col("in1") * F.col("in2")).cast("bigint")
    n_hat = (
        (n1.cast("double") + 1) * (n2.cast("double") + 1) / (m.cast("double") + 1)
        - 1
    )
    return flags.agg(
        n1.alias("n1"),
        n2.alias("n2"),
        m.alias("m"),
        n_hat.alias("n_hat"),
        F.count(F.lit(1)).cast("bigint").alias("true_n"),
    )


# ----------------------------------------------------------------------
# calibration_bins — the reliability diagram / expected-calibration-error
# report every scored model ships with: events are scored by min-max-
# normalized value (the propensity proxy), binned into 10 equal-width
# score bins, and each bin reports predicted-vs-actual purchase rate and
# the |gap| that sums (count-weighted) to ECE. Min/max come from one
# 1-row aggregate broadcast back (never a global window); the actual
# rate is an exact integer ratio and the gap a difference of
# engine-identical doubles.
#
# mean_score uses LINEARITY — mean(s) = (mean(value) − lo)/(hi − lo) —
# so the decimal-quantized sum runs over the RAW 2-decimal currency
# column (tie-free at scale 6: a cents double's binary error is ~1e-14
# relative, never near the 5e-7 rounding boundary) and the
# normalization is two scalar double ops identical in both engines.
# The r9 ×10-SF probe caught the previous form — dsum over the per-row
# NORMALIZED score s at scale 12 — flipping one quantization ulp at
# sf0.1: one of 100k rows landed on s = 0.5358704771425000235…, whose
# shortest repr terminates in …1425 exactly at digit 13; Spark's
# BigDecimal HALF_UP rounds the EXACT binary value (…143 — correctly
# rounded), DuckDB's double→DECIMAL cast rounds the shortest repr
# half-even (…142). Quantizing an arbitrary-quotient double is
# tie-prone at any scale; quantizing the fixed-decimal source never is.
# ----------------------------------------------------------------------

_CALIB_ORACLE = f"""
WITH mm AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
), scored AS (
  SELECT CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         e.value AS value,
         (e.value - mm.lo) / (mm.hi - mm.lo) AS s
  FROM events e CROSS JOIN mm
), binned AS (
  SELECT LEAST(CAST(FLOOR(s * 10) AS BIGINT), 9) AS bin, y, value FROM scored
), g AS (
  SELECT bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         {dsum_sql("value", 6)} / CAST(COUNT(*) AS DOUBLE) AS mean_value
  FROM binned GROUP BY bin
)
SELECT bin, n, n_pos,
       (mean_value - mm.lo) / (mm.hi - mm.lo) AS mean_score,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS actual_rate,
       ABS((mean_value - mm.lo) / (mm.hi - mm.lo)
           - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) AS gap
FROM g CROSS JOIN mm
"""


@query("calibration_bins", _CALIB_ORACLE)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (predicted vs actual rate + |gap|)."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    scored = ev.join(F.broadcast(mm)).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        "value",
        ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias("s"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("s") * 10).cast("bigint"), F.lit(9)).alias("bin"),
        "y",
        "value",
    )
    n = F.count(F.lit(1))
    g = binned.groupBy("bin").agg(
        n.cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        (dsum(F.col("value"), 6) / n.cast("double")).alias("mean_value"),
    )
    mean_score = (F.col("mean_value") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    actual = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return g.join(F.broadcast(mm)).select(
        "bin",
        "n",
        "n_pos",
        mean_score.alias("mean_score"),
        actual.alias("actual_rate"),
        F.abs(mean_score - actual).alias("gap"),
    )


# ----------------------------------------------------------------------
# chi2_independence — Pearson chi-square test of independence between
# order month and priority (seasonality-of-mix check). `chi2_terms` uses
# the statistic for feature SELECTION; this is the hypothesis-test form
# over a full contingency table: chi² = Σ_cells (o − rc/n)²/(rc/n) with
# o/r/c/n exact integers, each cell term evaluated once in IEEE double
# (identical both engines) and summed under the decimal-quantized dsum
# so the 60-cell addition order cannot flip a bit. One fact shuffle for
# the contingency table; margins are broadcast-sized.
# ----------------------------------------------------------------------

_CHI2_IND_ORACLE = f"""
WITH cells AS (
  SELECT CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mth,
         o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
), rows_m AS (
  SELECT mth, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY mth
), cols_p AS (
  SELECT pri, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY pri
), n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT cells.mth, cells.pri,
         POWER(CAST(cells.o AS DOUBLE)
               - CAST(rows_m.r AS DOUBLE) * CAST(cols_p.c AS DOUBLE)
                 / CAST(n.n AS DOUBLE), 2)
           / (CAST(rows_m.r AS DOUBLE) * CAST(cols_p.c AS DOUBLE)
              / CAST(n.n AS DOUBLE)) AS t
  FROM cells JOIN rows_m USING (mth) JOIN cols_p USING (pri) CROSS JOIN n
)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n,
       CAST((SELECT COUNT(*) FROM rows_m) - 1 AS BIGINT)
         * CAST((SELECT COUNT(*) FROM cols_p) - 1 AS BIGINT) AS dof,
       {fsum_sql("t", 8)} AS chi2
FROM terms
"""


@query("chi2_independence", _CHI2_IND_ORACLE)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month × priority chi-square independence statistic."""
    orders = load_table(spark, sf_dir, "orders")
    cells = shared(
        orders.groupBy(
            F.month(F.col("o_orderdate").cast("timestamp"))
            .cast("bigint")
            .alias("mth"),
            F.col("o_orderpriority").alias("pri"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rows_m = cells.groupBy("mth").agg(F.sum("o").cast("bigint").alias("r"))
    cols_p = cells.groupBy("pri").agg(F.sum("o").cast("bigint").alias("c"))
    n = cells.agg(F.sum("o").cast("bigint").alias("n"))
    exp = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast(
        "double"
    )
    t = F.pow(F.col("o").cast("double") - exp, 2) / exp
    terms = (
        cells.join(F.broadcast(rows_m), "mth")
        .join(F.broadcast(cols_p), "pri")
        .join(F.broadcast(n))
        .select(t.alias("t"))
    )
    nr = rows_m.agg(F.count(F.lit(1)).alias("nr"))
    nc = cols_p.agg(F.count(F.lit(1)).alias("nc"))
    return (
        terms.agg(fsum(F.col("t"), 8).alias("chi2"))  # generic-quotient addends
        .join(F.broadcast(n))
        .join(F.broadcast(nr))
        .join(F.broadcast(nc))
        .select(
            F.col("n"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
            "chi2",
        )
    )


# ----------------------------------------------------------------------
# privacy_risk_audit — k-anonymity + l-diversity screening before a
# dataset release: quasi-identifiers (nation, account-balance band)
# partition customers into equivalence classes; a class smaller than
# k = 5 re-identifies its members, and a class whose sensitive attribute
# (market segment) shows fewer than l = 2 distinct values discloses it
# even at size ≥ k. Reported per nation: classes, k-violations, records
# at risk, l-violations — the release gate a governance pipeline runs.
# Two grouped aggregations, all exact integers; the class table is
# bounded by the QI domain, never the customer count.
# ----------------------------------------------------------------------

_PRIV_K, _PRIV_L = 5, 2

_PRIVACY_ORACLE = f"""
WITH classes AS (
  SELECT c_nationkey,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS sz,
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM customer GROUP BY 1, 2
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN sz < {_PRIV_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS k_violations,
       CAST(SUM(CASE WHEN sz < {_PRIV_K} THEN sz ELSE 0 END) AS BIGINT)
         AS records_at_risk,
       CAST(SUM(CASE WHEN l_div < {_PRIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS l_violations
FROM classes GROUP BY c_nationkey
"""


@query("privacy_risk_audit", _PRIVACY_ORACLE)
def privacy_risk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release audit per nation."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.count_distinct("c_mktsegment").cast("bigint").alias("l_div"),
    )
    return classes.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("sz") < _PRIV_K, 1).otherwise(0))
        .cast("bigint")
        .alias("k_violations"),
        F.sum(F.when(F.col("sz") < _PRIV_K, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("records_at_risk"),
        F.sum(F.when(F.col("l_div") < _PRIV_L, 1).otherwise(0))
        .cast("bigint")
        .alias("l_violations"),
    )


# ----------------------------------------------------------------------
# clv_cohort_curve — cumulative revenue per customer by acquisition
# cohort: customers are grouped by first-order month, and each cohort's
# revenue is accumulated over months-since-acquisition (the CLV payback
# curve next to `cohort_retention`'s count triangle). Cohort assignment
# is one keyed min; the curve is a cumulative window over the
# (cohort × age) aggregate — calendar-bounded, never data-sized. Revenue
# exact integer cents; the per-customer rate one final IEEE division.
# ----------------------------------------------------------------------

_CLV_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi,
         CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) AS cents
  FROM orders
), firsts AS (
  SELECT o_custkey, MIN(mi) AS cohort FROM o GROUP BY o_custkey
), sizes AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY cohort
), cells AS (
  SELECT f.cohort, o.mi - f.cohort AS age,
         CAST(SUM(o.cents) AS BIGINT) AS rev
  FROM o JOIN firsts f ON o.o_custkey = f.o_custkey
  GROUP BY f.cohort, o.mi - f.cohort
), curve AS (
  SELECT cohort, age,
         SUM(rev) OVER (PARTITION BY cohort ORDER BY age
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev
  FROM cells
)
SELECT c.cohort, c.age, CAST(c.cum_rev AS BIGINT) AS cum_rev_cents,
       s.cohort_size,
       CAST(c.cum_rev AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS cum_rev_per_customer
FROM curve c JOIN sizes s ON c.cohort = s.cohort
WHERE c.age <= 12
"""


@query("clv_cohort_curve", _CLV_ORACLE)
def clv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer by acquisition cohort (age ≤ 12)."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    o = shared(
        orders.select(
            "o_custkey",
            (F.year(ts) * 12 + F.month(ts)).cast("bigint").alias("mi"),
            (F.col("o_totalprice") * 100)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("cents"),
        )
    )
    firsts = o.groupBy("o_custkey").agg(F.min("mi").alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    cells = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort", (F.col("mi") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = cells.select(
        "cohort", "age", F.sum("rev").over(w).alias("cum_rev")
    ).filter(F.col("age") <= 12)
    return curve.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "age",
        F.col("cum_rev").cast("bigint").alias("cum_rev_cents"),
        "cohort_size",
        (F.col("cum_rev").cast("double") / F.col("cohort_size").cast("double"))
        .alias("cum_rev_per_customer"),
    )


# ----------------------------------------------------------------------
# catalog_coverage_curve — assortment penetration over time: by month,
# the cumulative number of DISTINCT parts ever ordered and the fraction
# of the catalog covered (the coupon-collector read that sizes how fast
# a marketplace explores its catalog). Cumulative distinct is first-seen
# month per part (one keyed min) + a cumulative count over the
# calendar-bounded month axis — the sliding-COUNT-DISTINCT trap (state
# proportional to data) never appears.
# ----------------------------------------------------------------------

_COVERAGE_ORACLE = """
WITH firsts AS (
  SELECT l_partkey,
         MIN(CAST(EXTRACT(year FROM l_shipdate) * 12
                  + EXTRACT(month FROM l_shipdate) AS BIGINT)) AS mi
  FROM lineitem GROUP BY l_partkey
), per_month AS (
  SELECT mi, CAST(COUNT(*) AS BIGINT) AS new_parts FROM firsts GROUP BY mi
), curve AS (
  SELECT mi, new_parts,
         SUM(new_parts) OVER (ORDER BY mi
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_parts
  FROM per_month
)
SELECT mi, new_parts, CAST(cum_parts AS BIGINT) AS cum_parts,
       CAST(cum_parts AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM part) AS DOUBLE) AS catalog_frac
FROM curve
"""


@query("catalog_coverage_curve", _COVERAGE_ORACLE)
def catalog_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-parts-ordered curve by month."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ts = F.col("l_shipdate").cast("timestamp")
    firsts = li.groupBy("l_partkey").agg(
        F.min((F.year(ts) * 12 + F.month(ts)).cast("bigint")).alias("mi")
    )
    per_month = firsts.groupBy("mi").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_parts")
    )
    w = Window.orderBy("mi").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = part.agg(F.count(F.lit(1)).alias("n_catalog"))
    curve = per_month.select(
        "mi", "new_parts", F.sum("new_parts").over(w).alias("cum_parts")
    )
    return curve.join(F.broadcast(tot)).select(
        "mi",
        "new_parts",
        F.col("cum_parts").cast("bigint").alias("cum_parts"),
        (F.col("cum_parts").cast("double") / F.col("n_catalog").cast("double"))
        .alias("catalog_frac"),
    )


# ----------------------------------------------------------------------
# churn_risk_flags — per-nation churn watch: a customer is AT RISK when
# the gap from their last order to the feed's end exceeds 3× their own
# median reorder gap (minimum 3 orders — you cannot call churn on one
# purchase). Median gap is an exact per-customer ordered selection over
# the gap window (`rolling_median`'s discipline); the staleness test is
# all-integer day arithmetic against the 1-row feed watermark broadcast
# back. Reported per nation so the result is domain-bounded.
# ----------------------------------------------------------------------

_CHURN_ORACLE = """
WITH d AS (
  SELECT o.o_custkey, c.c_nationkey,
         CAST(epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), wm AS (SELECT MAX(day) AS feed_end FROM d),
gaps AS (
  SELECT o_custkey, c_nationkey, day,
         day - LAG(day) OVER (PARTITION BY o_custkey ORDER BY day)
           AS gap
  FROM d
), med AS (
  SELECT o_custkey,
         MAX(c_nationkey) AS c_nationkey,
         CAST(MAX(day) AS BIGINT) AS last_day,
         CAST(COUNT(*) + 1 AS BIGINT) AS n_orders
  FROM gaps WHERE gap IS NOT NULL GROUP BY o_custkey
), medsel AS (
  SELECT g.o_custkey,
         MAX(CASE WHEN rn = (cnt + 1) // 2 THEN gap END) AS med_gap
  FROM (
    SELECT o_custkey, gap,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY gap, day) AS rn,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
    FROM gaps WHERE gap IS NOT NULL
  ) g GROUP BY g.o_custkey
)
SELECT m.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN m.n_orders >= 3
                      AND (SELECT feed_end FROM wm) - m.last_day
                          > 3 * s.med_gap
                     THEN 1 ELSE 0 END) AS BIGINT) AS at_risk
FROM med m JOIN medsel s ON m.o_custkey = s.o_custkey
GROUP BY m.c_nationkey
"""


@query("churn_risk_flags", _CHURN_ORACLE)
def churn_risk_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose current silence exceeds 3× their median reorder gap."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    d = orders.select(
        "o_custkey",
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day"),
    ).join(bcast_if_small(cust), "o_custkey")
    wo = Window.partitionBy("o_custkey").orderBy("day")
    gaps = d.select(
        "o_custkey",
        "c_nationkey",
        "day",
        (F.col("day") - F.lag("day").over(wo)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    wm = d.agg(F.max("day").alias("feed_end"))
    med = gaps.groupBy("o_custkey").agg(
        F.max("c_nationkey").alias("c_nationkey"),
        F.max("day").cast("bigint").alias("last_day"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_orders"),
    )
    ranked = gaps.select(
        "o_custkey",
        "gap",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("gap", "day"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("cnt"),
    )
    medsel = ranked.groupBy("o_custkey").agg(
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("cnt") + 1) / 2), F.col("gap")
            )
        ).alias("med_gap")
    )
    j = med.join(medsel, "o_custkey").join(F.broadcast(wm))
    at_risk = F.when(
        (F.col("n_orders") >= 3)
        & (F.col("feed_end") - F.col("last_day") > 3 * F.col("med_gap")),
        1,
    ).otherwise(0)
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(at_risk).cast("bigint").alias("at_risk"),
    )


# ----------------------------------------------------------------------
# cuped_adjusted_ab — variance-reduced experiment readout (CUPED, the
# industry-standard A/B adjustment): per user, X = pre-period spend and
# Y = post-period spend (first/second half of the feed's day span, each
# user's arm a deterministic hash); θ = cov(X,Y)/var(X) estimated from
# the pooled exact integer sufficient statistics, and each arm reports
# mean(Y) and the CUPED-adjusted mean(Y) − θ·(mean(X) − mean(X_pooled)).
# All moments are DECIMAL(38,0) sums of scale-4 integer spend — the
# `linreg_per_group` discipline — with the θ and adjustment expressions
# evaluated once in IEEE double identically on both engines.
# ----------------------------------------------------------------------

_CUPED_ORACLE = f"""
WITH d AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
  FROM events WHERE user_id IS NOT NULL
), span AS (SELECT MIN(day) AS lo FROM d),
per_user AS (
  SELECT user_id,
         {portable_hash64_sql('user_id', salt='#cuped')} % 2 AS arm,
         CAST(SUM(CASE WHEN day < lo + 15 THEN v ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN day >= lo + 15 THEN v ELSE 0 END) AS BIGINT) AS y
  FROM d CROSS JOIN span GROUP BY user_id
), pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS VARCHAR) AS DOUBLE)
           AS sxx,
         CAST(CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS VARCHAR) AS DOUBLE)
           AS sxy
  FROM per_user
), arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS ax,
         CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS ay
  FROM per_user GROUP BY arm
)
SELECT a.arm, a.n_users,
       a.ay / a.n_users / 10000 AS raw_mean_post,
       (a.ay / a.n_users
        - ((p.n * p.sxy - p.sx * p.sy) / (p.n * p.sxx - p.sx * p.sx))
          * (a.ax / a.n_users - p.sx / p.n)) / 10000 AS cuped_mean_post,
       (p.n * p.sxy - p.sx * p.sy) / (p.n * p.sxx - p.sx * p.sx) AS theta
FROM arms a CROSS JOIN pooled p
"""


@query("cuped_adjusted_ab", _CUPED_ORACLE)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced per-arm post-period means."""
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    d = ev.select(
        "user_id",
        F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint").alias("day"),
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("v"),
    )
    span = d.agg(F.min("day").alias("lo"))
    per_user = (
        d.join(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < F.col("lo") + 15, F.col("v")).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("day") >= F.col("lo") + 15, F.col("v")).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .select(
            (portable_hash64(F.col("user_id"), "#cuped") % 2).alias("arm"),
            "x",
            "y",
        )
    )
    per_user = shared(per_user)
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dd(F.sum(d38("x"))).alias("sx"),
        dd(F.sum(d38("y"))).alias("sy"),
        dd(F.sum(d38("x") * F.col("x"))).alias("sxx"),
        dd(F.sum(d38("x") * F.col("y"))).alias("sxy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        dd(F.sum(d38("x"))).alias("ax"),
        dd(F.sum(d38("y"))).alias("ay"),
    )
    j = arms.join(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    nu = F.col("n_users").cast("double")
    theta = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    raw = F.col("ay") / nu / 10000
    adj = (
        F.col("ay") / nu
        - theta * (F.col("ax") / nu - F.col("sx") / nd)
    ) / 10000
    return j.select(
        "arm",
        "n_users",
        raw.alias("raw_mean_post"),
        adj.alias("cuped_mean_post"),
        theta.alias("theta"),
    )


# ----------------------------------------------------------------------
# ab_quantile_effect — quantile treatment effects: the per-decile gap
# between the two experiment arms' event-value distributions (means hide
# tail effects; QTE is how experimentation platforms report them). Arms
# are deterministic hash assignments; each arm's d10..d90 are exact
# nearest-rank cuts from ONE value histogram (`operators/stats.
# group_quantiles` — never a per-arm sort), unpivoted and joined so each
# row is (quantile, control, treatment, diff). Values scale-4 integers;
# the diff is integer-exact.
# ----------------------------------------------------------------------

from hadoop_spark.operators.stats import group_quantiles, group_quantiles_sql  # noqa: E402

_QTE_QS = {f"q{i}0": i / 10.0 for i in range(1, 10)}


def _qte_oracle() -> str:
    stack = " UNION ALL ".join(
        f"SELECT arm, '{name}' AS q, {name} AS v FROM cuts"
        for name in _QTE_QS
    )
    return f"""
WITH src AS (
  SELECT {portable_hash64_sql('user_id', salt='#qte')} % 2 AS arm,
         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
  FROM events WHERE user_id IS NOT NULL
),
{group_quantiles_sql("src", "arm", "v", _QTE_QS, "cuts")},
long AS ({stack})
SELECT a.q AS quantile,
       a.v AS control_v,
       b.v AS treatment_v,
       CAST(b.v - a.v AS BIGINT) AS qte
FROM long a JOIN long b ON a.q = b.q AND a.arm = 0 AND b.arm = 1
"""


@query("ab_quantile_effect", _qte_oracle())
def ab_quantile_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile treatment effect between hash-assigned arms."""
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    src = ev.select(
        (portable_hash64(F.col("user_id"), "#qte") % 2).alias("arm"),
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("v"),
    )
    cuts = group_quantiles(src, "arm", "v", _QTE_QS)
    # Wide -> long via ONE map-side explode, then arms pivot back in ONE
    # conditional aggregation. The previous per-quantile union loop +
    # a/b self-join re-PLANNED the un-persisted group_quantiles histogram
    # per branch (measured: 36 events scans / 72 exchanges — ~18x the
    # one-pass work). The count(when) guards keep the inner-join
    # semantics: a quantile row appears only when BOTH arms exist.
    long = cuts.select(
        "arm",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("q"), F.col(name).alias("v"))
                    for name in _QTE_QS
                ]
            )
        ).alias("r"),
    ).select("arm", F.col("r.q").alias("q"), F.col("r.v").alias("v"))
    return (
        long.groupBy(F.col("q").alias("quantile"))
        .agg(
            F.count(F.when(F.col("arm") == 0, 1)).alias("has0"),
            F.count(F.when(F.col("arm") == 1, 1)).alias("has1"),
            F.max(F.when(F.col("arm") == 0, F.col("v"))).alias("control_v"),
            F.max(F.when(F.col("arm") == 1, F.col("v"))).alias("treatment_v"),
        )
        .filter((F.col("has0") > 0) & (F.col("has1") > 0))
        .select(
            "quantile",
            "control_v",
            "treatment_v",
            (F.col("treatment_v") - F.col("control_v")).cast("bigint").alias("qte"),
        )
    )


# ----------------------------------------------------------------------
# srm_check — the sample-ratio-mismatch guardrail every experiment
# platform runs before reading any metric: the per-arm USER counts must
# be compatible with the designed 50/50 split; chi² (1 dof) =
# (n0 − n1)²/(n0 + n1), flagged above the 95% critical value 3.841. A
# failed SRM invalidates the experiment regardless of lift. One distinct
# aggregation; the statistic is one IEEE expression over exact counts.
# ----------------------------------------------------------------------

_SRM_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id,
         {portable_hash64_sql('user_id', salt='#cuped')} % 2 AS arm
  FROM events WHERE user_id IS NOT NULL
), c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM u
)
SELECT n0, n1,
       CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
         / CAST(n0 + n1 AS DOUBLE) AS chi2,
       CASE WHEN CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE) > 3.841 THEN 1 ELSE 0 END
         AS srm_flag
FROM c
"""


@query("srm_check", _SRM_ORACLE)
def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch chi² over the hash-assigned arms."""
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = ev.select(
        "user_id",
        (portable_hash64(F.col("user_id"), "#cuped") % 2).alias("arm"),
    ).distinct()
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    diff = (F.col("n0") - F.col("n1")).cast("double")
    chi2 = diff * diff / (F.col("n0") + F.col("n1")).cast("double")
    return c.select(
        "n0",
        "n1",
        chi2.alias("chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("srm_flag"),
    )


# ----------------------------------------------------------------------
# p_chart_control_limits — statistical process control over the weekly
# late-commit proportion (lineitem shipped >30 days after its order):
# each week's defect rate is charted against the POOLED rate's 3σ
# binomial control limits p̄ ± 3·sqrt(p̄(1−p̄)/n_week), the Shewhart
# p-chart a fulfilment operation runs. Counts exact integers; p̄ and the
# per-week limits are single IEEE expressions (sqrt of a correctly-
# rounded quotient — identical both engines); the out-of-control flag
# compares those identical doubles. One fact-fact join (the bucketed-
# layout shape) + one week aggregation + a broadcast pooled row.
# ----------------------------------------------------------------------

_PCHART_ORACLE = """
WITH j AS (
  SELECT CAST(epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 604800000000
              AS BIGINT) AS wk,
         CASE WHEN epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
                   - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                   > 30 * 86400000000 THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), wkagg AS (
  SELECT wk, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(late) AS BIGINT) AS n_late
  FROM j GROUP BY wk
), pooled AS (
  SELECT CAST(SUM(n_late) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS pbar
  FROM wkagg
)
SELECT w.wk - (SELECT MIN(wk) FROM wkagg) AS week_index,
       w.n, w.n_late,
       CAST(w.n_late AS DOUBLE) / CAST(w.n AS DOUBLE) AS p_week,
       p.pbar,
       CASE WHEN ABS(CAST(w.n_late AS DOUBLE) / CAST(w.n AS DOUBLE) - p.pbar)
                 > 3 * SQRT(p.pbar * (1 - p.pbar) / CAST(w.n AS DOUBLE))
            THEN 1 ELSE 0 END AS out_of_control
FROM wkagg w CROSS JOIN pooled p
"""


@query("p_chart_control_limits", _PCHART_ORACLE)
def p_chart_control_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart of the weekly late-shipment proportion."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.floor(us("l_shipdate") / 604_800_000_000).cast("bigint").alias("wk"),
        F.when(
            us("l_shipdate") - us("o_orderdate") > 30 * 86_400_000_000, 1
        )
        .otherwise(0)
        .alias("late"),
    )
    wkagg = shared(
        j.groupBy("wk").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("late").cast("bigint").alias("n_late"),
        )
    )
    pooled = wkagg.agg(
        (F.sum("n_late").cast("double") / F.sum("n").cast("double")).alias("pbar")
    )
    w0 = wkagg.agg(F.min("wk").alias("wk0"))
    pw = F.col("n_late").cast("double") / F.col("n").cast("double")
    lim = 3 * F.sqrt(
        F.col("pbar") * (1 - F.col("pbar")) / F.col("n").cast("double")
    )
    return (
        wkagg.join(F.broadcast(pooled))
        .join(F.broadcast(w0))
        .select(
            (F.col("wk") - F.col("wk0")).alias("week_index"),
            "n",
            "n_late",
            pw.alias("p_week"),
            "pbar",
            F.when(F.abs(pw - F.col("pbar")) > lim, 1)
            .otherwise(0)
            .alias("out_of_control"),
        )
    )


# ----------------------------------------------------------------------
# slo_burn_rate — SRE error-budget burn: per hour, the error-event rate
# divided by the budget (1 − SLO); burn > 14.4 is the standard
# page-immediately threshold (burns a 30-day budget in 2 days). Counts
# exact integers from one hour aggregation; the burn ratio is one IEEE
# expression; the flag compares engine-identical doubles against the
# repr-exact literal.
# ----------------------------------------------------------------------

_SLO = 0.95  # synthetic feed's error share is ~20%, so budget = 5% burns hot

_SLO_ORACLE = f"""
WITH h AS (
  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS errors
  FROM events GROUP BY 1
)
SELECT hr - (SELECT MIN(hr) FROM h) AS hour_index,
       n, errors,
       -- burn = (err/n)/(1-SLO) is algebraically 20*err/n at SLO=0.95;
       -- the reciprocal 20 is EXACTLY representable, so the whole burn is
       -- one multiply (exact, integer-valued) + one correctly-rounded
       -- division — dividing by the non-representable 0.05 instead was
       -- observed to round differently across engines (1-ulp flip)
       (20.0 * CAST(errors AS DOUBLE)) / CAST(n AS DOUBLE) AS burn_rate,
       CASE WHEN (20.0 * CAST(errors AS DOUBLE)) / CAST(n AS DOUBLE) > 14.4
            THEN 1 ELSE 0 END AS page_now
FROM h
"""


@query("slo_burn_rate", _SLO_ORACLE)
def slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error-budget burn rate against a 95% SLO."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.floor(F.unix_micros("ts") / 3_600_000_000).cast("bigint").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errors"),
    )
    h0 = h.agg(F.min("hr").alias("hr0"))
    # 20 = 1/(1-SLO) exactly representable: multiply-then-divide is
    # engine-identical where divide-by-0.05 was not (see oracle note)
    burn = (20.0 * F.col("errors").cast("double")) / F.col("n").cast("double")
    return h.join(F.broadcast(h0)).select(
        (F.col("hr") - F.col("hr0")).alias("hour_index"),
        "n",
        "errors",
        burn.alias("burn_rate"),
        F.when(burn > 14.4, 1).otherwise(0).alias("page_now"),
    )


# ----------------------------------------------------------------------
# latency_percentile_trend — the ops dashboard's weekly p50/p90 latency
# trend (order→ship days): exact nearest-rank cuts per week from ONE
# value histogram (`group_quantiles` — any number of percentiles, one
# partial-aggregated shuffle), never a per-week sort or an engine
# percentile aggregate. Integer day latencies; week axis calendar-
# bounded.
# ----------------------------------------------------------------------

_LPT_QS = {"p50": 0.50, "p90": 0.90}

_LPT_ORACLE = f"""
WITH src AS (
  SELECT CAST(epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 604800000000
              AS BIGINT) AS wk,
         CAST(epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000
              - epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS lat
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
{group_quantiles_sql("src", "wk", "lat", _LPT_QS, "q")}
SELECT wk - (SELECT MIN(wk) FROM src) AS week_index,
       CAST(p50 AS BIGINT) AS p50_days,
       CAST(p90 AS BIGINT) AS p90_days
FROM q
"""


@query("latency_percentile_trend", _LPT_ORACLE)
def latency_percentile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly p50/p90 ship latency from one histogram shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    src = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.floor(us("l_shipdate") / 604_800_000_000).cast("bigint").alias("wk"),
        (
            F.floor(us("l_shipdate") / 86_400_000_000)
            - F.floor(us("o_orderdate") / 86_400_000_000)
        )
        .cast("bigint")
        .alias("lat"),
    )
    src = shared(src)
    cuts = group_quantiles(src, "wk", "lat", _LPT_QS)
    w0 = src.agg(F.min("wk").alias("wk0"))
    return cuts.join(F.broadcast(w0)).select(
        (F.col("wk") - F.col("wk0")).alias("week_index"),
        F.col("p50").cast("bigint").alias("p50_days"),
        F.col("p90").cast("bigint").alias("p90_days"),
    )


# ----------------------------------------------------------------------
# dispersion_index — the count-model diagnostic for lines-per-order:
# index of dispersion D = var/mean (Poisson ⇒ 1; D>1 overdispersed ⇒
# negative-binomial modeling). Exact integer sufficient statistics
# (n, Σk, Σk²) as DECIMAL(38,0); variance uses the population form so D
# is one final double expression from exact integers.
# ----------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH k AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS lines
  FROM lineitem GROUP BY l_orderkey
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(lines AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
           AS sk,
         CAST(CAST(SUM(CAST(lines AS DECIMAL(38,0)) * lines) AS VARCHAR)
              AS DOUBLE) AS skk
  FROM k
)
SELECT n,
       sk / CAST(n AS DOUBLE) AS mean_lines,
       (skk / CAST(n AS DOUBLE))
         - (sk / CAST(n AS DOUBLE)) * (sk / CAST(n AS DOUBLE)) AS var_lines,
       ((skk / CAST(n AS DOUBLE))
         - (sk / CAST(n AS DOUBLE)) * (sk / CAST(n AS DOUBLE)))
         / (sk / CAST(n AS DOUBLE)) AS dispersion
FROM s
"""


@query("dispersion_index", _DISPERSION_ORACLE)
def dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio of basket size (Poissonness check)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("lines")
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d38("lines")).cast("string").cast("double").alias("sk"),
        F.sum(d38("lines") * F.col("lines"))
        .cast("string")
        .cast("double")
        .alias("skk"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sk") / nd
    var = F.col("skk") / nd - mean * mean
    return s.select(
        "n",
        mean.alias("mean_lines"),
        var.alias("var_lines"),
        (var / mean).alias("dispersion"),
    )


# ----------------------------------------------------------------------
# activity_islands — gaps-and-islands with RANGE output: each user's
# maximal runs of consecutive active days as (start, end, length) rows
# (`login_streaks` reports the max length; downstream session/coverage
# logic needs the actual ranges). Island id = day − dense day rank per
# user (the classic difference trick — one keyed window), then one
# grouped aggregation per island.
# ----------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL
), marked AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
)
SELECT user_id,
       CAST(MIN(day) AS BIGINT) AS start_day,
       CAST(MAX(day) AS BIGINT) AS end_day,
       CAST(COUNT(*) AS BIGINT) AS run_days
FROM marked GROUP BY user_id, island
"""


@query("activity_islands", _ISLANDS_ORACLE)
def activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal consecutive-day activity ranges per user."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    d = ev.select(
        "user_id",
        F.floor(F.unix_micros("ts") / 86_400_000_000).cast("bigint").alias("day"),
    ).distinct()
    island = F.col("day") - F.row_number().over(
        W.partitionBy("user_id").orderBy("day")
    )
    marked = d.select("user_id", "day", island.alias("island"))
    return marked.groupBy("user_id", "island").agg(
        F.min("day").cast("bigint").alias("start_day"),
        F.max("day").cast("bigint").alias("end_day"),
        F.count(F.lit(1)).cast("bigint").alias("run_days"),
    ).drop("island")


# ----------------------------------------------------------------------
# daily_active_span — engagement depth: per (user, day), the span from
# first to last event in minutes, rolled up into the span histogram (the
# "how long are users around each day" read next to DAU counts). Two
# grouped aggregations, all integer microsecond arithmetic; the span
# axis is bounded by the day (≤ 1440 buckets).
# ----------------------------------------------------------------------

_SPAN_ORACLE = """
WITH s AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 60000000 AS BIGINT)
           AS span_min
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT)
)
SELECT span_min,
       CAST(COUNT(*) AS BIGINT) AS n_user_days
FROM s GROUP BY span_min
"""


@query("daily_active_span", _SPAN_ORACLE)
def daily_active_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-(user, day) first-to-last activity spans (minutes)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    us = F.unix_micros("ts")
    s = ev.groupBy(
        "user_id",
        F.floor(us / 86_400_000_000).cast("bigint").alias("day"),
    ).agg(
        F.floor((F.max(us) - F.min(us)) / 60_000_000)
        .cast("bigint")
        .alias("span_min")
    )
    return s.groupBy("span_min").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_user_days")
    )


# ----------------------------------------------------------------------
# naive_forecast_mae — the forecast-eval floor: predict each order's
# value as the SAME customer's previous order value, report MAE/bias in
# exact integer cents per priority (`seasonal_baseline` grades the
# series-level naive model; this is the entity-level one every fancier
# model must beat). One keyed lag window + one aggregation.
# ----------------------------------------------------------------------

_NAIVE_MAE_ORACLE = """
WITH w AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) AS c,
         LAG(CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(ABS(c - prev)) AS BIGINT) AS abs_err_cents,
       CAST(SUM(c - prev) AS BIGINT) AS bias_cents,
       CAST(SUM(ABS(c - prev)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mae_cents
FROM w WHERE prev IS NOT NULL
GROUP BY o_orderpriority
"""


@query("naive_forecast_mae", _NAIVE_MAE_ORACLE)
def naive_forecast_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous-order naive predictor MAE/bias per priority (exact cents)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    c = (F.col("o_totalprice") * 100).cast("decimal(38,0)").cast("bigint")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    scored = orders.select(
        "o_orderpriority", c.alias("c"), F.lag(c).over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return scored.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum(F.abs(F.col("c") - F.col("prev")))
        .cast("bigint")
        .alias("abs_err_cents"),
        F.sum(F.col("c") - F.col("prev")).cast("bigint").alias("bias_cents"),
        (
            F.sum(F.abs(F.col("c") - F.col("prev"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mae_cents"),
    )


# ----------------------------------------------------------------------
# multigrain_distinct — exact COUNT DISTINCT users at day, week, AND
# month grain from ONE fact-table deduplication: exact distinct counts
# are NOT re-aggregable (a week's distinct is not the sum of its days'),
# but the (user, day) DEDUP IS the sufficient input for every coarser
# grain — so the fact table is deduplicated once and each coarser grain
# re-dedups the (already tiny) finer pair set. The cascade is the shape
# that makes exact multi-grain DAU/WAU/MAU affordable at 100 TB; the
# sketch alternative (`hll_sketch`/KMV) trades it for mergeability.
# ----------------------------------------------------------------------

_MULTIGRAIN_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL
), d AS (
  SELECT 'day' AS grain, day AS grain_key,
         CAST(COUNT(*) AS BIGINT) AS distinct_users
  FROM ud GROUP BY day
), uw AS (
  SELECT DISTINCT user_id, day // 7 AS wk FROM ud
), w AS (
  SELECT 'week' AS grain, wk AS grain_key,
         CAST(COUNT(*) AS BIGINT) AS distinct_users
  FROM uw GROUP BY wk
), um AS (
  SELECT DISTINCT user_id, day // 30 AS mo FROM ud
), m AS (
  SELECT 'month30' AS grain, mo AS grain_key,
         CAST(COUNT(*) AS BIGINT) AS distinct_users
  FROM um GROUP BY mo
)
SELECT * FROM d UNION ALL SELECT * FROM w UNION ALL SELECT * FROM m
"""


@query("multigrain_distinct", _MULTIGRAIN_ORACLE)
def multigrain_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users at day/week/month30 grain from one fact dedup."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ud = shared(
        ev.select(
            "user_id",
            F.floor(F.unix_micros("ts") / 86_400_000_000)
            .cast("bigint")
            .alias("day"),
        ).distinct()
    )

    def grain(df, key, label):
        return (
            df.distinct()
            .groupBy(F.col(key).alias("grain_key"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("distinct_users"))
            .select(
                F.lit(label).alias("grain"), "grain_key", "distinct_users"
            )
        )

    d = grain(ud.select("user_id", "day"), "day", "day")
    w = grain(
        ud.select("user_id", (F.col("day") / 7).cast("bigint").alias("wk")),
        "wk",
        "week",
    )
    m = grain(
        ud.select("user_id", (F.col("day") / 30).cast("bigint").alias("mo")),
        "mo",
        "month30",
    )
    return d.unionByName(w).unionByName(m)


# ----------------------------------------------------------------------
# error_cascade_rate — retry-storm detection: the share of error events
# followed by ANOTHER error from the same user within 60 s (cascades
# mean clients are hammering a broken path; isolated errors are noise).
# One keyed lead() window over the error stream in integer microseconds,
# rolled up per event hour so the ops dashboard sees the storm start.
# ----------------------------------------------------------------------

_CASCADE_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'error' AND user_id IS NOT NULL
), w AS (
  SELECT user_id, t,
         LEAD(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt
  FROM e
), h AS (
  SELECT CAST(t // 3600000000 AS BIGINT) AS hr,
         CASE WHEN nxt IS NOT NULL AND nxt - t <= 60000000
              THEN 1 ELSE 0 END AS cascaded
  FROM w
)
SELECT hr - (SELECT MIN(hr) FROM h) AS hour_index,
       CAST(COUNT(*) AS BIGINT) AS n_errors,
       CAST(SUM(cascaded) AS BIGINT) AS n_cascaded,
       CAST(SUM(cascaded) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS cascade_rate
FROM h GROUP BY hr
"""


@query("error_cascade_rate", _CASCADE_ORACLE)
def error_cascade_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly share of errors re-fired by the same user within 60 s."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "error") & F.col("user_id").isNotNull()
    )
    e = ev.select("user_id", F.unix_micros("ts").alias("t"))
    w = e.select(
        "t",
        F.lead("t").over(W.partitionBy("user_id").orderBy("t")).alias("nxt"),
    )
    h = w.select(
        F.floor(F.col("t") / 3_600_000_000).cast("bigint").alias("hr"),
        F.when(
            F.col("nxt").isNotNull() & (F.col("nxt") - F.col("t") <= 60_000_000),
            1,
        )
        .otherwise(0)
        .alias("cascaded"),
    )
    h0 = h.agg(F.min("hr").alias("hr0"))
    g = h.groupBy("hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_errors"),
        F.sum("cascaded").cast("bigint").alias("n_cascaded"),
    )
    return g.join(F.broadcast(h0)).select(
        (F.col("hr") - F.col("hr0")).alias("hour_index"),
        "n_errors",
        "n_cascaded",
        (F.col("n_cascaded").cast("double") / F.col("n_errors").cast("double"))
        .alias("cascade_rate"),
    )


# ----------------------------------------------------------------------
# rank_stability — does part importance persist across years? Spearman
# rank correlation between each part's first-year and last-year revenue
# ranks (parts present in both), on the same doubled-average-rank
# integer algebra as `spearman_rho` — the catalog-drift read that
# decides whether last year's top-sellers still deserve their shelf
# space. Two year aggregates from one scan, one join on partkey, exact
# DECIMAL(38) rank moments, one final double.
# ----------------------------------------------------------------------

_RANK_STAB_ORACLE = """
WITH yr AS (
  SELECT l_partkey,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS y,
         CAST(SUM(CAST(l_extendedprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1, 2
), span AS (
  SELECT MIN(y) AS y0, MAX(y) AS y1 FROM yr
), both_yr AS (
  SELECT a.l_partkey, a.cents AS c0, b.cents AS c1
  FROM yr a JOIN yr b ON a.l_partkey = b.l_partkey
  CROSS JOIN span s
  WHERE a.y = s.y0 AND b.y = s.y1
), r AS (
  SELECT 2 * RANK() OVER (ORDER BY c0) + COUNT(*) OVER (PARTITION BY c0) - 1
           AS ra,
         2 * RANK() OVER (ORDER BY c1) + COUNT(*) OVER (PARTITION BY c1) - 1
           AS rb
  FROM both_yr
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ra AS DECIMAL(38,0))) AS VARCHAR) AS sa,
         CAST(SUM(CAST(rb AS DECIMAL(38,0))) AS VARCHAR) AS sb,
         CAST(SUM(CAST(ra AS DECIMAL(38,0)) * rb) AS VARCHAR) AS sab,
         CAST(SUM(CAST(ra AS DECIMAL(38,0)) * ra) AS VARCHAR) AS saa,
         CAST(SUM(CAST(rb AS DECIMAL(38,0)) * rb) AS VARCHAR) AS sbb
  FROM r
)
SELECT n,
       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
          - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       / SQRT(GREATEST(
           (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
              - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)),
           1e-300)) AS rank_corr
FROM s
"""


@query("rank_stability", _RANK_STAB_ORACLE)
def rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman correlation of part revenue ranks: first vs last year."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    yr = shared(
        li.groupBy(
            "l_partkey",
            F.year(F.col("l_shipdate").cast("timestamp")).cast("bigint").alias("y"),
        ).agg(
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    span = yr.agg(F.min("y").alias("y0"), F.max("y").alias("y1"))
    a = yr.join(F.broadcast(span)).filter(F.col("y") == F.col("y0")).select(
        "l_partkey", F.col("cents").alias("c0")
    )
    b = yr.join(F.broadcast(span)).filter(F.col("y") == F.col("y1")).select(
        "l_partkey", F.col("cents").alias("c1")
    )
    both = a.join(b, "l_partkey")
    ra = 2 * F.rank().over(W.orderBy("c0")) + F.count(F.lit(1)).over(
        W.partitionBy("c0")
    ) - 1
    rb = 2 * F.rank().over(W.orderBy("c1")) + F.count(F.lit(1)).over(
        W.partitionBy("c1")
    ) - 1
    r = both.select(ra.alias("ra"), rb.alias("rb"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d38("ra")).cast("string").alias("sa"),
        F.sum(d38("rb")).cast("string").alias("sb"),
        F.sum(d38("ra") * F.col("rb")).cast("string").alias("sab"),
        F.sum(d38("ra") * F.col("ra")).cast("string").alias("saa"),
        F.sum(d38("rb") * F.col("rb")).cast("string").alias("sbb"),
    )
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    num = dd("n") * dd("sab") - dd("sa") * dd("sb")
    den = F.sqrt(
        F.greatest(
            (dd("n") * dd("saa") - dd("sa") * dd("sa"))
            * (dd("n") * dd("sbb") - dd("sb") * dd("sb")),
            F.lit(1e-300),
        )
    )
    # r10 audit: raw IEEE Spearman over exact doubled-rank statistics.
    return s.select("n", (num / den).alias("rank_corr"))
