"""Training-data preparation queries (extension beyond the reference).

The reference's closest surface is the declarative aggregate framework
(`hadoop-mapreduce-client-core/.../lib/aggregate/ValueAggregatorJob.java:85`)
and hash-deterministic sampling (`lib/input/SequenceFileInputFilter.java:154`
PercentFilter). These queries extend that to the operations a large-scale
LLM-data pipeline runs daily: reshaping (pivot), skew diagnosis (heavy
hitters), deterministic dataset splits, time-series regularization
(gap-fill + forward-fill), feature statistics (correlation profile), and
group-wise normalization.

Determinism conventions (see plans/catalog.py): every float aggregate goes
through decimal quantization; derived statistics (corr, stddev, z-score) are
computed from those exact sums with the SAME arithmetic expression text on
both engines, so IEEE-754 evaluation is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64, portable_hash64_sql
from hadoop_spark.functions.numeric import (
    PRECISION,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    fsum,
    fsum_sql,
)
from hadoop_spark.functions.text import ws_token_count, ws_token_count_sql
from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table, shared

# ---------------------------------------------------------------------------
# decimal(38) variants — for sums of squares/products whose unscaled totals
# outgrow decimal(18,4) (price² at sf≥0.1 already exceeds 10^14). Precision 38
# keeps the same order-independence argument as functions/numeric.py with
# headroom to ~10^34: safe for any realistic scale factor.


def _dsum38(expr: F.Column, scale: int = 4) -> F.Column:
    return F.sum(expr.cast(f"decimal(38,{scale})")).cast("double")


def _dsum38_sql(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS VARCHAR) AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# pivot — wide reshaping, the MultipleOutputs-per-category idea
# (`lib/output/MultipleOutputs.java:186`) turned into columns instead of files.

_PIVOT_ORACLE = f"""
SELECT l_returnflag,
       {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
       {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("pivot_flag_status", _PIVOT_ORACLE)
def pivot_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot lineitem quantity over (returnflag × linestatus).

    The pivot value list is pinned, so the schema is data-independent (a
    driver-visible contract) and the plan is a single hash aggregate — the
    conditional sums are map-side partials, one shuffle on the grouping key
    at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            dsum(F.col("l_quantity")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return piv.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        (F.coalesce(F.col("F_n"), zero) + F.coalesce(F.col("O_n"), zero)).alias(
            "n_rows"
        ),
    )


# ---------------------------------------------------------------------------
# heavy hitters — key-skew diagnosis; what you run BEFORE choosing salting
# (operators/skew.py) or AQE skew-join. The reference's answer to skew was a
# blind re-hash (`lib/partition/RehashPartitioner.java:35`); measuring first
# is strictly better.

_HEAVY_ORACLE = """
WITH c AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nkeys, CAST(SUM(cnt) AS BIGINT) AS total FROM c
)
SELECT o_custkey, cnt FROM c, s WHERE cnt * nkeys > 2 * total
"""


@query("heavy_hitters", _HEAVY_ORACLE)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys whose frequency exceeds 2× the mean — pure integer arithmetic
    (cnt·nkeys > 2·total), so the threshold is engine- and order-exact.

    Scale shape: one shuffle for the per-key count (map-side combined); the
    stats side collapses to a single row broadcast back — no sort, no
    global window, no driver collect.
    """
    orders = load_table(spark, sf_dir, "orders")
    # shared(): both consumers (threshold stats + the filter) read the
    # per-key counts from cache instead of re-running the scan+aggregate.
    counts = shared(
        orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("nkeys"), F.sum("cnt").alias("total")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .filter(F.col("cnt") * F.col("nkeys") > 2 * F.col("total"))
        .select("o_custkey", "cnt")
    )


# ---------------------------------------------------------------------------
# train/test split — deterministic hash split (the PercentFilter idea,
# `lib/input/SequenceFileInputFilter.java:154`: membership is a pure function
# of the key, not of the scheduler), the way every reproducible dataset
# release assigns examples to train/validation/test.

_SPLIT_BUCKET = f"({portable_hash64_sql('doc_id', 'split')} % 100)"
_SPLIT_ORACLE = f"""
SELECT CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
            WHEN {_SPLIT_BUCKET} < 90 THEN 'validation'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       {davg_sql("n_chars")} AS avg_chars
FROM documents
GROUP BY 1
"""


@query("train_test_split", _SPLIT_ORACLE)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split of `documents` by portable hash of doc_id.

    Membership is stable under repartitioning, re-runs, added files, and
    engine choice — the property that makes a 100 TB split auditable. The
    plan is a map-side expression + one aggregate; writing the actual split
    is `df.write.partitionBy('split')` on the same expression.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id"), "split") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            davg(F.col("n_chars")).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# gap-fill + forward-fill — time-series regularization: expand each user's
# observed day range to a dense grid and carry the last observation forward.
# (No reference analogue; the per-key sorted pass is the secondary-sort
# pattern, `EXAMPLES/SecondarySort.java:51`, expressed as a window.)

_DAY_US = 86_400_000_000

_GAPFILL_ORACLE = f"""
WITH daily AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS d,
         {dsum_sql("value")} AS day_value
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS d FROM span)
SELECT g.user_id, g.d,
       LAST_VALUE(dy.day_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       dy.day_value IS NOT NULL AS observed
FROM grid g LEFT JOIN daily dy ON g.user_id = dy.user_id AND g.d = dy.d
"""


@query("gap_fill_events", _GAPFILL_ORACLE)
def gap_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid per user with last-value-forward fill.

    Epochs are integer microsecond arithmetic (TZ-proof, matches the
    oracle's `epoch_us`). Instead of the textbook grid⋈observations
    left-join (which scans the input twice and needs a join), each observed
    day looks ONE row ahead (`lead`) and emits itself plus the gap rows up
    to the next observation, carrying its value — gap-fill as a pure
    per-key streaming pass. The leading repartition on user_id makes the
    (user, day) aggregate and the lead-window both subsets of one
    hash(user_id) clustering: the whole pipeline is a SINGLE shuffle, one
    scan, zero joins. Grid size is bounded by Σ per-key spans, never n².
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_micros(F.col("ts")) / F.lit(_DAY_US)).cast("bigint").alias("d"),
            "value",
        )
        .repartition("user_id")
    )
    daily = ev.groupBy("user_id", "d").agg(dsum(F.col("value")).alias("day_value"))
    w = Window.partitionBy("user_id").orderBy("d")
    return (
        daily.withColumn("next_d", F.lead("d").over(w))
        .select(
            "user_id",
            F.col("day_value"),
            F.col("d").alias("od"),
            F.explode(
                F.sequence(
                    F.col("d"), F.coalesce(F.col("next_d") - F.lit(1), F.col("d"))
                )
            ).alias("d"),
        )
        .select(
            "user_id",
            "d",
            F.col("day_value").alias("filled_value"),
            (F.col("d") == F.col("od")).alias("observed"),
        )
    )


# ---------------------------------------------------------------------------
# numeric profile — feature statistics from exact decimal sums. Streaming
# co-moment corr/stddev are order-dependent in any engine; deriving them
# from quantized sums with ONE shared formula text makes the doubles
# bit-identical across Spark and the oracle (IEEE ops are deterministic
# given identical inputs and expression shape).

_CORR_F = (
    "(nd * sxy - sx * sy) / "
    "(sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))"
)
_COVAR_F = "(sxy - sx * sy / nd) / (nd - 1)"
_STDDEV_F = "sqrt((syy - sy * sy / nd) / (nd - 1))"

_PROFILE_ORACLE = f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) AS DOUBLE) AS nd,
         {_dsum38_sql("l_quantity")} AS sx,
         {_dsum38_sql("l_extendedprice")} AS sy,
         {_dsum38_sql("l_quantity * l_quantity")} AS sxx,
         {_dsum38_sql("l_extendedprice * l_extendedprice")} AS syy,
         {_dsum38_sql("l_quantity * l_extendedprice")} AS sxy
  FROM lineitem
)
SELECT n AS n_rows,
       {_CORR_F} AS corr_qty_price,
       {_COVAR_F} AS covar_qty_price,
       {_STDDEV_F} AS stddev_price
FROM s
"""


@query("numeric_profile", _PROFILE_ORACLE)
def numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr/covar/stddev of lineitem numerics via exact-sum identities.

    One map-side-combined aggregate pass (the products are per-row doubles,
    IEEE-exact in both engines, quantized before summing); the six sums are
    a single row, so the derived statistics cost nothing. This is the
    mergeable-statistics design: partial sums from 190 000 map tasks
    combine associatively — same contract as the reference's combiner
    (`Job.setCombinerClass`, `mapreduce/Job.java:935`).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        _dsum38(F.col("x")).alias("sx"),
        _dsum38(F.col("y")).alias("sy"),
        _dsum38(F.col("x") * F.col("x")).alias("sxx"),
        _dsum38(F.col("y") * F.col("y")).alias("syy"),
        _dsum38(F.col("x") * F.col("y")).alias("sxy"),
    )
    return sums.select(
        F.col("n").alias("n_rows"),
        F.expr(_CORR_F).alias("corr_qty_price"),
        F.expr(_COVAR_F).alias("covar_qty_price"),
        F.expr(_STDDEV_F).alias("stddev_price"),
    )


# ---------------------------------------------------------------------------
# group-wise z-score — feature normalization without a giant window: stats
# per group from exact sums, broadcast back, normalize row-side. The
# window-function alternative (AVG() OVER (PARTITION BY flag)) buffers whole
# partitions; the aggregate+broadcast shape streams.

_Z_MEAN_F = "sx / nd"
_Z_STD_F = "sqrt((sxx - sx * sx / nd) / (nd - 1))"

_ZSCORE_ORACLE = f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) AS DOUBLE) AS nd,
         {_dsum38_sql("l_quantity")} AS sx,
         {_dsum38_sql("l_quantity * l_quantity")} AS sxx
  FROM lineitem GROUP BY l_returnflag
),
st AS (
  SELECT l_returnflag, n, {_Z_MEAN_F} AS mean_x, {_Z_STD_F} AS std_x FROM s
)
SELECT li.l_returnflag,
       MIN(st.n) AS n_rows,
       MIN((li.l_quantity - st.mean_x) / st.std_x) AS min_z,
       MAX((li.l_quantity - st.mean_x) / st.std_x) AS max_z,
       {fsum_sql("(li.l_quantity - st.mean_x) / st.std_x", 6)} AS sum_z
FROM lineitem li JOIN st ON li.l_returnflag = st.l_returnflag
GROUP BY li.l_returnflag
"""


@query("zscore_by_group", _ZSCORE_ORACLE)
def zscore_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag standardization check: min/max/sum of z-scores.

    Two aggregate passes over the fact table plus a broadcast of the
    3-row stats side; the per-row z is identical double arithmetic in both
    engines because mean/std come from the same exact decimal sums. At
    100 TB the stats side is still 3 rows — the broadcast join never
    becomes the bottleneck, unlike a PARTITION BY window over the fact.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").alias("x")
    )
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        _dsum38(F.col("x")).alias("sx"),
        _dsum38(F.col("x") * F.col("x")).alias("sxx"),
    )
    stats = sums.select(
        "l_returnflag",
        "n",
        F.expr(_Z_MEAN_F).alias("mean_x"),
        F.expr(_Z_STD_F).alias("std_x"),
    )
    z = li.join(F.broadcast(stats), "l_returnflag").select(
        "l_returnflag",
        "n",
        ((F.col("x") - F.col("mean_x")) / F.col("std_x")).alias("z"),
    )
    return z.groupBy("l_returnflag").agg(
        F.min("n").alias("n_rows"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
        # fsum: z-scores are generic quotients (r10 audit).
        fsum(F.col("z"), 6).alias("sum_z"),
    )


# ---------------------------------------------------------------------------
# sequence packing — concatenate documents into fixed-token-budget training
# sequences. The standard pretraining packer: docs are ordered inside a
# shard, the running token total assigns each doc to bin floor(tokens-
# before / budget) (documents straddle bin boundaries, exactly like causal-
# LM concat-and-chunk packing). Sharding first (hash of doc_id) is the 100
# TB shape: packing is embarrassingly parallel per shard — the window sort
# runs per-shard, never a global single-partition sort.

_PACK_SHARDS = 8
_PACK_BUDGET = 4096

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         ({portable_hash64_sql('doc_id', 'pack')} % {_PACK_SHARDS}) AS shard,
         {ws_token_count_sql('text')} AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
packed AS (
  SELECT shard, doc_id, n_tokens,
         CAST(floor(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {_PACK_BUDGET}) AS BIGINT) AS bin
  FROM toks
)
SELECT shard, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc
FROM packed
GROUP BY shard, bin
"""


@query("sequence_packing", _PACK_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {_PACK_BUDGET}-token training sequences, 8-way
    sharded. Per (shard, bin): doc count, token total, first doc — the
    manifest a sequence-builder job would consume."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        (portable_hash64(F.col("doc_id"), "pack") % _PACK_SHARDS).alias("shard"),
        ws_token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _PACK_BUDGET
        ).cast("bigint"),
    )
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination — flag training docs sharing any word-8-gram
# with an eval/benchmark set (here: every 97th doc stands in as "eval").
# The scalable shape is the inverted-index join on shingle HASH (posting
# lists, like dedup_ngram_jaccard): cost is proportional to total shingle
# occurrences on the eval side — tiny — never |train| × |eval|.

_DECON_N = 8  # 8-gram overlap, the common contamination criterion


def _ngram_sql(col: str, n: int) -> str:
    # word n-grams in DuckDB: slide over the token list
    return (
        f"list_transform(range(1, len({col}) - {n} + 2), "
        f"i -> array_to_string({col}[i:i+{n - 1}], ' '))"
    )


_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id, unnest({_ngram_sql('w', _DECON_N)}) AS g
  FROM toks WHERE len(w) >= {_DECON_N}
),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
train_grams AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
SELECT t.doc_id AS train_doc,
       CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM train_grams t JOIN eval_grams e ON t.g = e.g
GROUP BY t.doc_id
"""


@query("decontaminate", _DECON_ORACLE)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set contamination scan: training docs sharing ≥1 distinct
    word-{_DECON_N}-gram with the eval set, with the shared-gram count.
    Eval grams are deduped and (being small) broadcast; the train side
    streams map-side against them — no shuffle of the training corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w"),
    ).filter(F.size("w") >= _DECON_N)
    grams = shared(
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _DECON_N),
                    lambda i: F.concat_ws(" ", F.slice("w", i + 1, _DECON_N)),
                )
            ).alias("g"),
        )
    )
    eval_grams = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    train_grams = grams.filter(F.col("doc_id") % 97 != 0).select("doc_id", "g").distinct()
    # eval_grams scales with the CORPUS (~1% of documents' n-grams), not
    # with a dim table — size-guard the broadcast so at 100 TB the join
    # degrades to a shuffled hash/sort-merge on `g` instead of shipping
    # tens of GB of strings to every executor.
    return (
        train_grams.join(bcast_if_small(eval_grams), "g")
        .groupBy(F.col("doc_id").alias("train_doc"))
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# ---------------------------------------------------------------------------
# stratified sampling — per-stratum deterministic hash sampling (sampleBy
# with reproducibility): each stratum gets its own rate, membership is a
# pure function of (doc_id, salt) exactly like train_test_split, so the
# sample is stable under retries/repartitioning and auditable at 100 TB.

_STRATA_RATES = {"en": 50, "de": 20, "fr": 20, "es": 20}  # percent per lang


def _strata_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items()
    )
    return f"(CASE lang {whens} ELSE 10 END)"


_STRAT_ORACLE = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE ({portable_hash64_sql('doc_id', 'strat')} % 100) < {_strata_case_sql()}
GROUP BY lang
"""


@query("stratified_sample", _STRAT_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling (50% en, 20% de/fr/es, 10%
    otherwise): the `df.sampleBy` use-case with hash membership instead of
    RNG, so the sample is identical across engines, retries, and runs.
    Map-side filter + one aggregate — no shuffle of unsampled rows."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id"), "strat") % 100
    rate = F.lit(10)
    for k, v in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# data-quality audit — declarative expectations over a table, one report
# row per check. The validation pass every ingest runs before a 100 TB job
# wastes a cluster-day on bad data. Checks are plain aggregates (one pass
# per table + one anti-join for the FK) — no row-level data leaves the
# executors, only violation COUNTS.

_DQ_ORACLE = """
SELECT 'orders' AS tbl, 'unique o_orderkey' AS chk,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
UNION ALL
SELECT 'orders', 'o_custkey not null',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders', 'o_totalprice > 0',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem', 'l_quantity in [1,50]',
       CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem', 'fk l_orderkey -> orders',
       CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
"""


@query("data_quality_audit", _DQ_ORACLE)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations report: uniqueness, null, range, and referential checks
    as (tbl, chk, n_violations, n_rows) rows. Each check is a single
    aggregate pass; the FK check is a left-anti join count."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(tbl: str, chk: str, viol: F.Column, n: F.Column, src: DataFrame) -> DataFrame:
        return src.agg(
            F.lit(tbl).alias("tbl"),
            F.lit(chk).alias("chk"),
            viol.cast("bigint").alias("n_violations"),
            n.cast("bigint").alias("n_rows"),
        )

    cnt = F.count(F.lit(1))
    checks = [
        row("orders", "unique o_orderkey",
            cnt - F.countDistinct("o_orderkey"), cnt, orders),
        row("orders", "o_custkey not null",
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)), cnt, orders),
        row("orders", "o_totalprice > 0",
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)), cnt, orders),
        row("lineitem", "l_quantity in [1,50]",
            F.sum(F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)),
            cnt, li),
    ]
    orphans = li.join(
        orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("viol"))
    li_n = li.agg(F.count(F.lit(1)).alias("n"))
    fk = orphans.crossJoin(li_n).select(
        F.lit("lineitem").alias("tbl"),
        F.lit("fk l_orderkey -> orders").alias("chk"),
        F.col("viol").cast("bigint").alias("n_violations"),
        F.col("n").cast("bigint").alias("n_rows"),
    )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.unionByName(fk)


# ---------------------------------------------------------------------------
# gap-fill with LINEAR interpolation — the second classic fill policy
# (forward-fill above). Interpolated values are emitted as exact integer
# rationals (numerator over day-span denominator) so the contract is
# engine-exact with no float division; callers divide at the edge.

_INTERP_ORACLE = f"""
WITH daily AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS d,
         CAST(ROUND({dsum_sql("value")} * 1000000) AS BIGINT) AS v_micro
  FROM events GROUP BY 1, 2
),
stepped AS (
  SELECT user_id, d, v_micro,
         LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d,
         LEAD(v_micro) OVER (PARTITION BY user_id ORDER BY d) AS next_v
  FROM daily
),
expanded AS (
  SELECT user_id, d AS d0, v_micro, next_d, next_v,
         unnest(generate_series(d, COALESCE(next_d - 1, d))) AS day
  FROM stepped
)
SELECT user_id, CAST(day AS BIGINT) AS d,
       CAST(CASE WHEN day = d0 THEN v_micro
                 ELSE v_micro * (next_d - d0) + (next_v - v_micro) * (day - d0)
            END AS BIGINT) AS interp_num,
       CAST(CASE WHEN day = d0 THEN 1 ELSE next_d - d0 END AS BIGINT) AS interp_den,
       day = d0 AS observed
FROM expanded
"""


@query("gap_fill_interp", _INTERP_ORACLE)
def gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid with linear interpolation across gaps: the same
    single-shuffle lead+explode shape as `gap_fill_events`, but gap days
    carry v0 + (v1-v0)·(day-d0)/(d1-d0) as an exact (numerator,
    denominator) pair — micro-quantized integers, no float division, so
    Spark and the oracle agree bit-for-bit."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_micros(F.col("ts")) / F.lit(_DAY_US)).cast("bigint").alias("d"),
            "value",
        )
        .repartition("user_id")
    )
    daily = ev.groupBy("user_id", "d").agg(
        F.round(dsum(F.col("value")) * 1_000_000).cast("bigint").alias("v_micro")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    stepped = daily.withColumn("next_d", F.lead("d").over(w)).withColumn(
        "next_v", F.lead("v_micro").over(w)
    )
    expanded = stepped.select(
        "user_id",
        F.col("d").alias("d0"),
        "v_micro",
        "next_d",
        "next_v",
        F.explode(
            F.sequence(F.col("d"), F.coalesce(F.col("next_d") - 1, F.col("d")))
        ).alias("day"),
    )
    on_obs = F.col("day") == F.col("d0")
    return expanded.select(
        "user_id",
        F.col("day").alias("d"),
        F.when(on_obs, F.col("v_micro"))
        .otherwise(
            F.col("v_micro") * (F.col("next_d") - F.col("d0"))
            + (F.col("next_v") - F.col("v_micro")) * (F.col("day") - F.col("d0"))
        )
        .cast("bigint")
        .alias("interp_num"),
        F.when(on_obs, F.lit(1)).otherwise(F.col("next_d") - F.col("d0"))
        .cast("bigint")
        .alias("interp_den"),
        on_obs.alias("observed"),
    )


# ---------------------------------------------------------------------------
# equi-width numeric histogram — the profiling sibling of value_histogram
# (which bins by VALUE FREQUENCY): fixed-width buckets over a numeric
# range, one map-side bucket expression + one aggregate. The same IEEE
# divide+floor on both engines keeps bucket assignment bit-identical.

_HIST_WIDTH = 50_000.0

_NUMHIST_ORACLE = f"""
SELECT CAST(floor(o_totalprice / {_HIST_WIDTH}) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY 1
"""


@query("numeric_histogram", _NUMHIST_ORACLE)
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: bucket = floor(x / width),
    per-bucket count and observed min/max. Single hash aggregate — the
    1-pass distribution profile run before choosing salting thresholds,
    partition widths, or split points at scale."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / _HIST_WIDTH).cast("bigint")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# End-to-end pretraining-mix pipeline: the composition a real corpus build
# runs nightly — quality gate -> exact near-dup removal -> per-source quota
# -> mix accounting. Each stage reuses an already-verified primitive
# (ws_token_count, fingerprint, portable md5 order), and the oracle replays
# the ENTIRE chain, so a bug in any stage (or in stage ORDERING — capping
# before dedup would keep different docs) cannot hash-match.

_MIX_MIN_TOKENS = 20
_MIX_MAX_TOKENS = 90
_MIX_SOURCE_CAP = 15


def _pretrain_mix_oracle() -> str:
    from hadoop_spark.functions.text import fingerprint_sql

    h = portable_hash64_sql("doc_id", salt="mix")
    return f"""
WITH gated AS (
  SELECT doc_id, source,
         {ws_token_count_sql('text')} AS n_tokens,
         {fingerprint_sql('text')} AS fp
  FROM documents
  WHERE text IS NOT NULL
    AND {ws_token_count_sql('text')} BETWEEN {_MIX_MIN_TOKENS} AND {_MIX_MAX_TOKENS}
),
deduped AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
capped AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY {h}, doc_id
    ) AS rn
    FROM deduped
  ) WHERE rn <= {_MIX_SOURCE_CAP}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS kept_ids_sum
FROM capped GROUP BY source
"""


@query("pretrain_mix", _pretrain_mix_oracle())
def pretrain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly corpus-build chain, end to end: (1) token-count quality
    gate ({_MIX_MIN_TOKENS}..{_MIX_MAX_TOKENS} whitespace tokens), (2)
    exact near-dup removal on the normalization-stable fingerprint (keep
    the smallest doc_id per fingerprint — deterministic canonical pick),
    (3) per-source quota of {_MIX_SOURCE_CAP} docs in portable-md5 order,
    (4) per-source mix accounting (docs, tokens, id-checksum).

    Scale shape: the gate and fingerprint are map-side expressions pushed
    against the scan; dedup is one window keyed on fingerprint (parallel
    across fingerprints); the quota is one window keyed on source; the
    accounting reuses the quota shuffle's clustering. Nothing global,
    nothing driver-side, no UDFs."""
    from hadoop_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    gated = docs.select(
        "doc_id",
        "source",
        ws_token_count(F.col("text")).alias("n_tokens"),
        fingerprint(F.col("text")).alias("fp"),
    ).filter(F.col("n_tokens").between(_MIX_MIN_TOKENS, _MIX_MAX_TOKENS))
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )
    w_src = Window.partitionBy("source").orderBy(
        portable_hash64("doc_id", salt="mix"), F.asc("doc_id")
    )
    capped = (
        deduped.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= _MIX_SOURCE_CAP)
    )
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("doc_id").alias("kept_ids_sum"),
    )


# ---------------------------------------------------------------------------
# Mixture-weighted sampling: apply a per-source sampling RATE (the mixture
# spec of a training run: upsample wiki, downsample crawl) with the
# hash-deterministic keep rule rate > hash(doc)/2^60 — scheduler- and
# retry-independent, and exactly replayable in the oracle.

_MIX_RATES = {  # fixture sources are src0..src19
    "src0": 1.0,
    "src1": 0.8,
    "src2": 0.5,
    "src3": 0.35,
    "src4": 0.1,
}
_MIX_DEFAULT_RATE = 0.2
_HASH_SPACE = float(2**60)  # portable_hash64 is 60-bit


def _mixture_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {r!r}" for s, r in sorted(_MIX_RATES.items())
    )
    h = portable_hash64_sql("doc_id", salt="mixture")
    return f"""
WITH rated AS (
  SELECT doc_id, source,
         CASE {cases} ELSE {_MIX_DEFAULT_RATE!r} END AS rate,
         CAST({h} AS DOUBLE) / {_HASH_SPACE!r} AS u
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN u < rate THEN doc_id ELSE 0 END) AS BIGINT) AS kept_ids_sum
FROM rated GROUP BY source
"""


@query("mixture_sample", _mixture_oracle())
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture sampling: each source keeps docs at its
    configured rate, decided by comparing the portable 60-bit hash
    (normalized to [0,1)) against the rate — a pure function of the data,
    so the SAME docs are kept on every run, every retry, every cluster
    size (the property `df.sample()` does NOT have). Rates ride a literal
    CASE (the broadcast-side of a tiny dim); one map-side filter + one
    aggregate. The oracle replays the exact keep set per source."""
    rate = F.lit(_MIX_DEFAULT_RATE)
    for s, r in sorted(_MIX_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    rated = docs.select(
        "doc_id",
        "source",
        rate.alias("rate"),
        (portable_hash64("doc_id", salt="mixture").cast("double") / F.lit(_HASH_SPACE)).alias("u"),
    )
    kept = F.col("u") < F.col("rate")
    return rated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.sum(F.when(kept, F.col("doc_id")).otherwise(F.lit(0))).alias("kept_ids_sum"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching prep: group docs into token-length buckets and
# measure the padding waste of batching each bucket to its own max — the
# alternative to sequence_packing for attention kernels that want
# near-uniform lengths per batch.

_LB_WIDTH = 16  # tokens per bucket


_LENGTH_BUCKETS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {ws_token_count_sql('text')} AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id, n_tokens, n_tokens // {_LB_WIDTH} AS bucket FROM t
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS padding_waste
FROM b GROUP BY bucket
"""


@query("length_buckets", _LENGTH_BUCKETS_ORACLE)
def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length bucketing (width {_LB_WIDTH}) with per-bucket padding
    waste if each bucket batches to its own max — the measurement that
    chooses between bucketing and packing for a training run. One
    map-side token count + one aggregate; exact integers throughout."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = docs.select(
        "doc_id", ws_token_count(F.col("text")).alias("n_tokens")
    ).withColumn("bucket", F.floor(F.col("n_tokens") / _LB_WIDTH))
    return t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")).alias("padding_waste"),
    )


# ---------------------------------------------------------------------------
# T5-style span-corruption planning: deterministically choose which token
# spans each document masks, entirely map-side. Spans are non-overlapping
# token triples; ~15% of tokens are masked by picking the k lowest-hash
# triples (a pure function of (doc_id, span index) — scheduler- and
# retry-independent, the MD5Filter discipline again).

_SPAN_LEN = 3
_SPAN_MASK_FRAC = 0.15


def _span_oracle() -> str:
    h = portable_hash64_sql("(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))", salt="span")
    return f"""
WITH toks AS (
  SELECT doc_id, CAST({ws_token_count_sql("text")} AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL
), base AS (
  SELECT doc_id, n, n // {_SPAN_LEN} AS m,
         LEAST((CAST(FLOOR({_SPAN_MASK_FRAC} * CAST(n AS DOUBLE)) AS BIGINT)
                + {_SPAN_LEN - 1}) // {_SPAN_LEN},
               n // {_SPAN_LEN}) AS k
  FROM toks
), spans AS (
  SELECT doc_id, n, m, k, unnest(generate_series(0, m - 1)) AS j
  FROM base WHERE k >= 1
), scored AS (
  SELECT doc_id, n, k, j, {h} AS hv,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY {h}, j) AS rn
  FROM spans
)
SELECT doc_id, n AS n_tokens, k AS n_spans,
       CAST(k * {_SPAN_LEN} AS BIGINT) AS n_masked,
       CAST(SUM(j) AS BIGINT) AS span_idx_sum,
       CAST(MIN(hv) AS BIGINT) AS span_h_min
FROM scored WHERE rn <= k
GROUP BY doc_id, n, k
"""


@query("span_corruption_plan", _span_oracle())
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption (T5 denoising) mask planning: each doc masks
    ~{frac}% of its tokens as non-overlapping {L}-token spans, the spans
    chosen as the k lowest md5-hash candidates of (doc_id, span index).
    The whole plan is ONE map-side expression — candidate indices,
    hashes, sort, and top-k all happen inside array functions on the row,
    so the operator is shuffle-free at any corpus size (the oracle uses a
    per-doc window instead; it only has to be correct, not scalable).
    Output pins span count, masked-token count, and exact checksums of
    the chosen span set (index sum + min hash)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n = ws_token_count(F.col("text"))
    target = F.floor(F.lit(_SPAN_MASK_FRAC) * n.cast("double")).cast("bigint")
    base = docs.select(
        "doc_id", n.cast("bigint").alias("n")
    ).withColumn("m", F.floor(F.col("n") / _SPAN_LEN).cast("bigint"))
    base = base.withColumn(
        "k",
        F.least(
            F.floor(
                (F.floor(F.lit(_SPAN_MASK_FRAC) * F.col("n").cast("double")).cast("bigint")
                 + F.lit(_SPAN_LEN - 1))
                / _SPAN_LEN
            ).cast("bigint"),
            F.col("m"),
        ),
    ).filter(F.col("k") >= 1)
    idxs = F.sequence(F.lit(0).cast("bigint"), F.col("m") - 1)
    scored = F.transform(
        idxs,
        lambda j: F.struct(
            portable_hash64(
                F.concat(F.col("doc_id").cast("string"), F.lit(":"), j.cast("string")),
                salt="span",
            ).alias("hv"),
            j.alias("j"),
        ),
    )
    chosen = F.slice(F.array_sort(scored), 1, F.col("k").cast("int"))
    return base.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.col("k").alias("n_spans"),
        (F.col("k") * _SPAN_LEN).cast("bigint").alias("n_masked"),
        F.aggregate(
            chosen, F.lit(0).cast("bigint"), lambda acc, x: acc + x["j"]
        ).alias("span_idx_sum"),
        F.element_at(chosen, 1)["hv"].alias("span_h_min"),
    )


# ---------------------------------------------------------------------------
# novelty_ngrams — per-document novelty: the fraction of a doc's distinct
# word-8-grams that appear FIRST in that doc (corpus order = doc_id).
# This is the doc-level scoring view of n-gram dedup: a crawl curation
# run keeps high-novelty docs and drops boilerplate-heavy ones. Scale
# shape: the shuffle key is the 60-bit portable hash of the gram (8
# bytes, never the gram text), first-owner is ONE keyed window min, the
# per-doc rollup is one more bounded aggregation; cost is linear in
# total distinct gram occurrences, the same contract as `decontaminate`
# / `dedup_paragraph`. The ratio is one IEEE division of exact integers.

_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT DISTINCT doc_id,
         {portable_hash64_sql(f"unnest({_ngram_sql('w', _DECON_N)})")} AS gh
  FROM toks WHERE len(w) >= {_DECON_N}
),
owned AS (
  SELECT doc_id, gh, MIN(doc_id) OVER (PARTITION BY gh) AS first_doc
  FROM grams
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       (CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE)) AS novelty
FROM owned GROUP BY doc_id
"""


@query("novelty_ngrams", _NOVELTY_ORACLE)
def novelty_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's distinct 8-grams first seen in that doc."""
    from hadoop_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w"),
    ).filter(F.size("w") >= _DECON_N)
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _DECON_N),
                    lambda i: F.concat_ws(" ", F.slice("w", i + 1, _DECON_N)),
                )
            ).alias("g"),
        )
        .select("doc_id", portable_hash64(F.col("g")).alias("gh"))
        .distinct()
    )
    owned = grams.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("gh"))
    )
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
    return owned.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        novel.cast("bigint").alias("n_novel"),
        (novel.cast("double") / F.count(F.lit(1)).cast("double")).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# cv_folds — k-fold cross-validation assignment: fold membership is a pure
# function of (doc_id, salt) via the portable hash (the train_test_split
# discipline generalized to k folds), so folds are identical across
# runs/retries/cluster sizes and any fold's complement is a reproducible
# training set. Map-side assignment + one bounded (fold × lang) aggregate
# proves balance; no data movement beyond the report.

_CV_K = 5

_CV_ORACLE = f"""
SELECT {portable_hash64_sql('doc_id', salt='#cv')} % {_CV_K} AS fold,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""


@query("cv_folds", _CV_ORACLE)
def cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {_CV_K}-fold assignment + per-(fold, lang) balance."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        (portable_hash64(F.col("doc_id"), salt="#cv") % _CV_K).alias("fold"),
        "lang",
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# gdpr_delete — right-to-erasure propagation: given a deletion list of
# user ids, produce the scrub report for the event log (what survives,
# what is purged, per event type) with the deletion set applied as a
# BROADCAST anti-join — the fact table streams map-side against the
# (always comparatively tiny) deletion list, never shuffles on user_id.
# The deletion list itself is hash-derived here (2% of users) so the
# oracle replays it; in production it is `spark.read` of the requests
# table + the same two anti/semi aggregates writing the purged copy.

_GDPR_ORACLE = f"""
WITH del AS (
  SELECT DISTINCT user_id FROM events
  WHERE user_id IS NOT NULL
    AND {portable_hash64_sql('user_id', salt='#gdpr')} % 100 < 2
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN d.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purged
FROM events e LEFT JOIN del d ON e.user_id = d.user_id
GROUP BY e.event_type
"""


@query("gdpr_delete", _GDPR_ORACLE)
def gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    deletions = (
        ev.filter(
            F.col("user_id").isNotNull()
            & (portable_hash64(F.col("user_id"), salt="#gdpr") % 100 < 2)
        )
        .select("user_id")
        .distinct()
    )
    # the deletion list scales with the user population (2% of distinct
    # users) — size-guard so a planet-scale user table degrades to a
    # shuffled join instead of a forced driver-side broadcast build.
    marked = ev.join(
        bcast_if_small(deletions.withColumn("_del", F.lit(1))), "user_id", "left"
    )
    return marked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("_del").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("_del").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_purged"),
    )


# ---------------------------------------------------------------------------
# lag_features — ML feature engineering over event history: for every
# event, the previous 3 values and integer time deltas for the same
# (user, event_type) — the standard autoregressive feature block a
# training pipeline materializes before model fitting. ONE keyed window
# serves all six features (Catalyst collapses the lag taps into a single
# Window operator over a single shuffle); values micro-quantized so the
# feature vector is bit-exact across engines.

_LAGF_ORACLE = """
SELECT event_id, user_id, event_type,
       CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro,
       lag_v1, lag_v2, lag_v3, dt1_us, dt2_us
FROM (
  SELECT event_id, user_id, event_type, value,
         lag(CAST(ROUND(value * 1000000) AS BIGINT), 1) OVER w AS lag_v1,
         lag(CAST(ROUND(value * 1000000) AS BIGINT), 2) OVER w AS lag_v2,
         lag(CAST(ROUND(value * 1000000) AS BIGINT), 3) OVER w AS lag_v3,
         CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS BIGINT) AS dt1_us,
         CAST(epoch_us(ts) - epoch_us(lag(ts, 2) OVER w) AS BIGINT) AS dt2_us
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
"""


@query("lag_features", _LAGF_ORACLE)
def lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    vm = F.round(F.col("value") * 1_000_000).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        vm.alias("v_micro"),
        F.lag(vm, 1).over(w).alias("lag_v1"),
        F.lag(vm, 2).over(w).alias("lag_v2"),
        F.lag(vm, 3).over(w).alias("lag_v3"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts", 1).over(w))).alias("dt1_us"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts", 2).over(w))).alias("dt2_us"),
    )


# ---------------------------------------------------------------------------
# curriculum_tiers — curriculum-learning prep: documents ranked by an
# integer quality score (stopword/punctuation composite, exact ROUND of
# IEEE doubles over integer counts) and cut into equi-depth terciles via
# the histogram quantile machinery — per-tier corpus mass is the
# "easy → hard" schedule a curriculum trainer consumes. Score domain is
# bounded (≤ 10001 buckets), so every post-scoring stage is domain-sized.

_CURR_QS = {"t1": 1 / 3, "t2": 2 / 3}


def _curr_score_sql() -> str:
    qf = __import__(
        "hadoop_spark.functions.text", fromlist=["quality_features_sql"]
    ).quality_features_sql("text")
    return (
        f"CAST(ROUND(({qf['stopword_ratio']} * 0.5"
        f" + (1.0 - {qf['punct_ratio']}) * 0.5) * 10000) AS BIGINT)"
    )


def _curr_oracle() -> str:
    from hadoop_spark.operators.stats import group_quantiles_sql

    return f"""
WITH scored AS (
  SELECT doc_id, n_chars, 0 AS g, {_curr_score_sql()} AS score
  FROM documents WHERE text IS NOT NULL
),
{group_quantiles_sql("scored", "g", "score", _CURR_QS, "q")}
SELECT CAST(1 + (CASE WHEN s.score > q.t1 THEN 1 ELSE 0 END)
              + (CASE WHEN s.score > q.t2 THEN 1 ELSE 0 END) AS BIGINT)
         AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(s.score) AS BIGINT) AS min_score,
       CAST(MAX(s.score) AS BIGINT) AS max_score
FROM scored s CROSS JOIN q
GROUP BY 1
"""


@query("curriculum_tiers", _curr_oracle())
def curriculum_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.text import quality_features
    from hadoop_spark.operators.stats import group_quantiles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    qf = quality_features(F.col("text"))
    score = F.round(
        (qf["stopword_ratio"] * 0.5 + (F.lit(1.0) - qf["punct_ratio"]) * 0.5)
        * 10000
    ).cast("bigint")
    scored = shared(
        docs.select("doc_id", "n_chars", F.lit(0).alias("g"), score.alias("score"))
    )
    cuts = group_quantiles(scored, "g", "score", _CURR_QS)
    tier = (
        F.lit(1)
        + F.when(F.col("score") > F.col("t1"), 1).otherwise(0)
        + F.when(F.col("score") > F.col("t2"), 1).otherwise(0)
    )
    return (
        scored.join(F.broadcast(cuts), "g")
        .groupBy(tier.cast("bigint").alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


# ---------------------------------------------------------------------------
# token_budget_allocator — exact proportional allocation: split a fixed
# token budget across sources in proportion to their available tokens,
# with LARGEST-REMAINDER rounding so the allocations are integers that
# sum EXACTLY to the budget (the sampling-plan arithmetic a mixture
# builder needs before drawing). Pure integer math + one bounded
# (|sources|) window — deterministic in both engines.

_ALLOC_BUDGET = 1_000_000


def _alloc_oracle() -> str:
    from hadoop_spark.functions.text import ws_token_count_sql

    return f"""
WITH avail AS (
  SELECT source, CAST(SUM({ws_token_count_sql("text")}) AS BIGINT) AS w
  FROM documents WHERE text IS NOT NULL GROUP BY source
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM avail),
base AS (
  SELECT a.source, a.w,
         (a.w * {_ALLOC_BUDGET}) // t.wt AS floor_alloc,
         (a.w * {_ALLOC_BUDGET}) % t.wt AS rem
  FROM avail a CROSS JOIN tot t
),
leftover AS (
  SELECT {_ALLOC_BUDGET} - CAST(SUM(floor_alloc) AS BIGINT) AS r FROM base
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rn FROM base
)
SELECT r1.source, r1.w AS tokens_avail,
       CAST(r1.floor_alloc + CASE WHEN r1.rn <= l.r THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM ranked r1 CROSS JOIN leftover l
"""


@query("token_budget_allocator", _alloc_oracle())
def token_budget_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from hadoop_spark.functions.text import ws_token_count

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    avail = docs.groupBy("source").agg(
        F.sum(ws_token_count(F.col("text"))).cast("bigint").alias("w")
    )
    tot = avail.agg(F.sum("w").cast("bigint").alias("wt"))
    base = avail.crossJoin(F.broadcast(tot)).select(
        "source",
        "w",
        F.expr(f"(w * {_ALLOC_BUDGET}) div wt").alias("floor_alloc"),
        F.expr(f"(w * {_ALLOC_BUDGET}) % wt").alias("rem"),
    )
    leftover = base.agg(
        (F.lit(_ALLOC_BUDGET) - F.sum("floor_alloc")).cast("bigint").alias("r")
    )
    ranked = base.withColumn(
        "rn", F.row_number().over(W.orderBy(F.desc("rem"), F.asc("source")))
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        F.col("w").alias("tokens_avail"),
        (
            F.col("floor_alloc")
            + F.when(F.col("rn") <= F.col("r"), 1).otherwise(0)
        ).cast("bigint").alias("alloc"),
    )


# ----------------------------------------------------------------------
# feature_hashing — the hashing trick: project an unbounded token
# vocabulary onto a FIXED 64-bucket feature space (bucket = portable
# 60-bit md5 of the token, mod 64) so downstream models train on a
# constant-width sparse vector with no vocabulary dictionary to build,
# ship, or keep consistent — the property that matters at 100 TB, where
# a vocab dictionary is itself a big-data artifact. One explode + one
# (doc, bucket) partial-aggregated shuffle; the sparse vector serializes
# as a canonical "bucket:count" string (bucket-ordered), so two engines
# agree byte-for-byte.
# ----------------------------------------------------------------------

_FH_BUCKETS = 64

_FH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
bc AS (
  SELECT doc_id,
         CAST({portable_hash64_sql("w", salt="#fh")} % {_FH_BUCKETS} AS BIGINT)
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE w <> '' GROUP BY 1, 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS nnz,
       string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(c AS VARCHAR),
                  ' ' ORDER BY bucket) AS features
FROM bc GROUP BY doc_id
"""


@query("feature_hashing", _FH_ORACLE)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    bc = toks.groupBy(
        "doc_id",
        (portable_hash64(F.col("w"), salt="#fh") % _FH_BUCKETS)
        .cast("bigint")
        .alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("c"))
    pair = F.struct(F.col("bucket"), F.col("c"))
    return bc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("nnz"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(pair)),
                lambda s: F.concat_ws(
                    ":",
                    s.getField("bucket").cast("string"),
                    s.getField("c").cast("string"),
                ),
            ),
            " ",
        ).alias("features"),
    )


# ----------------------------------------------------------------------
# label_balance_weights — class-balance QA plus inverse-frequency sample
# weights w(l) = N / (K · n_l), the standard reweighting a trainer
# applies to a skewed label distribution. Two tiny aggregations (per-
# label counts, 1-row totals) and a broadcast join; the weight is an
# exact integer ratio quantized identically on both engines.
# ----------------------------------------------------------------------

_LBW_ORACLE = """
WITH ct AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings GROUP BY label
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS k
  FROM ct
)
SELECT ct.label, ct.n,
       CAST(tot.total AS DOUBLE) / (CAST(tot.k AS DOUBLE) * CAST(ct.n AS DOUBLE))
         AS weight
FROM ct, tot
"""


@query("label_balance_weights", _LBW_ORACLE)
def label_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ct = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    tot = ct.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    # r10 audit: raw IEEE balance weight of exact int64 counts.
    w = F.col("total").cast("double") / (
        F.col("k").cast("double") * F.col("n").cast("double")
    )
    return ct.join(F.broadcast(tot)).select("label", "n", w.alias("weight"))


# ----------------------------------------------------------------------
# weighted_systematic_sample — weight-proportional sampling WITHOUT
# transcendentals (the exponential-keys trick needs ln(), which differs
# by ulps across engines): systematic sampling over the exact integer
# prefix sum of weights. A row is selected iff the fixed stride S has a
# tick inside its cumulative-weight interval — selection probability
# ∝ weight, deterministic, integer-only. The prefix sum itself is the
# scalable two-level parallel scan (`operators/sort.global_running_sum`:
# range-repartition + per-partition cumsum + broadcast offsets), NOT a
# single-partition SUM-OVER window — the primitive that makes weighted
# sampling, systematic splits, and quota fills work at 100 TB.
# ----------------------------------------------------------------------

_WSS_STRIDE = 1_000_000_000  # one tick per $10M of cumulative order value

_WSS_ORACLE = f"""
WITH w AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) AS cents
  FROM orders
),
c AS (
  SELECT o_orderkey, cents,
         CAST(SUM(cents) OVER (ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM w
)
SELECT o_orderkey, cents, CAST(cum // {_WSS_STRIDE} AS BIGINT) AS tick
FROM c
WHERE (cum - cents) // {_WSS_STRIDE} <> cum // {_WSS_STRIDE}
"""


@query("weighted_systematic_sample", _WSS_ORACLE)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.operators.sort import global_running_sum

    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        "o_orderkey",
        (F.col("o_totalprice") * 100)
        .cast("decimal(38,0)")
        .cast("bigint")
        .alias("cents"),
    )
    c = global_running_sum(w, "cents", "o_orderkey", out="cum")
    prev = F.col("cum") - F.col("cents")
    return (
        c.filter(
            F.floor(prev / _WSS_STRIDE) != F.floor(F.col("cum") / _WSS_STRIDE)
        )
        .select(
            "o_orderkey",
            "cents",
            F.floor(F.col("cum") / _WSS_STRIDE).cast("bigint").alias("tick"),
        )
    )


# ----------------------------------------------------------------------
# temporal_split_audit — the TIME-based train/test split (forecasting
# and recommendation models must split on time, not hash — a hash split
# leaks the future) plus the leakage report that goes with it: how many
# customers appear on BOTH sides of the cutoff (entity overlap is
# expected and fine for per-event labels, fatal for per-customer ones —
# the audit row is what lets a reviewer decide). Cutoff = first day of
# the last 20% of the observed day span, computed from a 1-row span
# aggregate broadcast back. Two grouped aggregations; exact integers.
# ----------------------------------------------------------------------

_TSPLIT_ORACLE = """
WITH d AS (
  SELECT o_custkey,
         CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
              AS BIGINT) AS day
  FROM orders
), span AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), tagged AS (
  SELECT o_custkey,
         CASE WHEN day < lo + CAST(FLOOR((hi - lo + 1) * 0.8) AS BIGINT)
              THEN 'train' ELSE 'test' END AS split
  FROM d CROSS JOIN span
), per_cust AS (
  SELECT o_custkey,
         MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
         MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
         SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_test
  FROM tagged GROUP BY o_custkey
)
SELECT CAST(SUM(n_train) AS BIGINT) AS train_rows,
       CAST(SUM(n_test) AS BIGINT) AS test_rows,
       CAST(SUM(in_train) AS BIGINT) AS train_customers,
       CAST(SUM(in_test) AS BIGINT) AS test_customers,
       CAST(SUM(in_train * in_test) AS BIGINT) AS leaked_customers,
       CAST(SUM(in_train * in_test) AS DOUBLE)
         / CAST(SUM(in_test) AS DOUBLE) AS test_leak_frac
FROM per_cust
"""


@query("temporal_split_audit", _TSPLIT_ORACLE)
def temporal_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 time-cutoff split + cross-side entity-leakage report."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_custkey",
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .alias("day"),
    )
    span = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cut = F.col("lo") + F.floor((F.col("hi") - F.col("lo") + 1) * 0.8).cast(
        "bigint"
    )
    tagged = d.join(F.broadcast(span)).select(
        "o_custkey",
        F.when(F.col("day") < cut, "train").otherwise("test").alias("split"),
    )
    per_cust = tagged.groupBy("o_custkey").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias("in_test"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
    )
    return per_cust.agg(
        F.sum("n_train").cast("bigint").alias("train_rows"),
        F.sum("n_test").cast("bigint").alias("test_rows"),
        F.sum("in_train").cast("bigint").alias("train_customers"),
        F.sum("in_test").cast("bigint").alias("test_customers"),
        F.sum(F.col("in_train") * F.col("in_test"))
        .cast("bigint")
        .alias("leaked_customers"),
        (
            F.sum(F.col("in_train") * F.col("in_test")).cast("double")
            / F.sum("in_test").cast("double")
        ).alias("test_leak_frac"),
    )
