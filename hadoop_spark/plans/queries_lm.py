"""LLM-pretraining corpus operators, batch 2 (extension): segment-level
exact dedup, corpus-trained bigram-LM document scoring, and broadcast
linear-model quality classification.

These are the Spark-first forms of the data-pipeline stages the reference
era ran as MapReduce chains over text dumps (`EXAMPLES/WordCount.java:34`
lineage: tokenize → count → join-back), re-expressed as single declarative
plans so Catalyst keeps every tokenize/count/join stage JVM-side and
map-partial-aggregated.

Registered AFTER the round-3 correctness window (see `catalog.load_all`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_spark.functions.numeric import dsum, dsum_sql
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import fanout_small, load_table

# ----------------------------------------------------------------------
# dedup_paragraph — segment-level exact dedup (keep-first), the
# paragraph/line dedup stage of a pretraining pipeline. Docs are chunked
# into non-overlapping 10-token segments; a segment seen earlier in
# (doc_id, pos) order anywhere in the corpus is dropped; the result is the
# per-doc retention profile a curation run reports.
#
# Scale shape: the dedup key is md5(segment) — 32 bytes through the
# shuffle regardless of segment text length; one hash-partitioned window
# (row_number per segment) + one per-doc aggregation. Nothing is
# quadratic; keep-first semantics are deterministic under any
# partitioning because the window orders by the globally-unique
# (doc_id, pos).
# ----------------------------------------------------------------------

_SEG = 10  # tokens per dedup segment

_PARA_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
), segs AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         md5(array_to_string(
           w[(CAST(t.i AS BIGINT)*{_SEG}+1):(CAST(t.i AS BIGINT)*{_SEG}+{_SEG})],
           ' ')) AS seg
  FROM toks, UNNEST(range(CAST(ceil(len(w)/{_SEG}.0) AS BIGINT))) AS t(i)
  WHERE len(w) > 0
), ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM segs
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS retained_frac
FROM ranked GROUP BY doc_id
"""


@query("dedup_paragraph", _PARA_ORACLE)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide segment (paragraph) exact dedup with keep-first wins."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = fanout_small(docs).select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w"),
    ).filter(F.size("w") > 0)
    nseg = F.ceil(F.size("w") / F.lit(float(_SEG))).cast("long")
    segs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), nseg - 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.concat_ws(
                            " ", F.slice("w", (i * _SEG + 1).cast("int"), _SEG)
                        )
                    ).alias("seg"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.seg").alias("seg"))
    rn = F.row_number().over(
        Window.partitionBy("seg").orderBy("doc_id", "pos")
    )
    ranked = segs.withColumn("rn", rn)
    kept = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long")
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        kept.alias("n_kept"),
        (kept.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "retained_frac"
        ),
    )


# ----------------------------------------------------------------------
# bigram_lm_score — score every document under a bigram LM trained on the
# corpus itself (the KenLM-perplexity-filter analog: CCNet/Gopher-style
# pipelines score documents with an n-gram LM and drop the tail). The
# model IS a DataFrame (bigram + unigram count tables); inference is two
# shuffle joins keyed on the gram — at 100 TB the count tables shard like
# any table, nothing is collected.
#
# Determinism: scoring uses the mean Laplace-smoothed conditional
# probability p(w2|w1) = (c12 + 1) / (c1 + V) rather than mean log-prob —
# IEEE division of exact integers is correctly rounded in both engines,
# while ln() is only 1-ulp-accurate and engine-dependent. Mean-p is
# rank-equivalent enough for a drop-the-tail filter; a log-prob variant
# would need a shared correctly-rounded log table.
# ----------------------------------------------------------------------

_LM_KEEP = 0.004  # keep-threshold on mean conditional probability

_LM_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id,
         w[CAST(t.i AS BIGINT) + 1] AS w1,
         w[CAST(t.i AS BIGINT) + 1] || ' ' || w[CAST(t.i AS BIGINT) + 2] AS bg
  FROM toks, UNNEST(range(len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
), bgc AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM grams GROUP BY bg
), ugc AS (
  SELECT u.w1 AS w, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
    SELECT unnest(w) AS w1 FROM toks
  ) u GROUP BY u.w1
), vocab AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM ugc
), scored AS (
  SELECT g.doc_id,
         CAST(CAST(
           CAST(b.c12 + 1 AS DOUBLE) / CAST(u.c1 + vocab.v AS DOUBLE)
         AS DECIMAL(18,12)) AS DOUBLE) AS p
  FROM grams g
  JOIN bgc b ON g.bg = b.bg
  JOIN ugc u ON g.w1 = u.w
  CROSS JOIN vocab
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ({dsum_sql("p", 12)} / CAST(COUNT(*) AS DOUBLE)) AS mean_p,
       (CAST({dsum_sql("p", 12)} / CAST(COUNT(*) AS DOUBLE)
             AS DECIMAL(18,12)) >= {_LM_KEEP}) AS keep
FROM scored GROUP BY doc_id
"""


@query("bigram_lm_score", _LM_ORACLE)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM mean-probability score + keep flag per document."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from hadoop_spark.sources.tables import shared

    toks = shared(
        fanout_small(docs).select(
            "doc_id",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w"),
        )
    )
    grams = toks.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.struct(
                    F.element_at("w", i).alias("w1"),
                    F.concat_ws(
                        " ", F.element_at("w", i), F.element_at("w", i + 1)
                    ).alias("bg"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.bg")
    bgc = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    ugc = (
        toks.select(F.explode("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = ugc.agg(F.count(F.lit(1)).alias("v"))
    p = (
        ((F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double"))
        .cast("decimal(18,12)")
        .cast("double")
    )
    scored = (
        grams.join(bgc, "bg")
        .join(ugc, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", p.alias("p"))
    )
    mean_p = dsum(F.col("p"), 12) / F.count(F.lit(1)).cast("double")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        mean_p.alias("mean_p"),
        (mean_p.cast("decimal(18,12)") >= F.lit(_LM_KEEP)).alias("keep"),
    )


# ----------------------------------------------------------------------
# quality_classifier — broadcast linear-model inference over engineered
# text features (the fastText-quality-classifier stage of a pretraining
# pipeline, with the model weights as side data — the DistributedCache
# pattern, `MR-CORE/filecache/DistributedCache.java` lineage). The model
# rides a 1-row broadcast; scoring is a pure JVM expression per document,
# no shuffle at all until nothing (this is a map-only job).
#
# Determinism: the margin is evaluated with an identical left-associated
# expression tree in both engines over identically-computed double
# features; the decision threshold compares the margin quantized to
# DECIMAL(18,8) so the boolean cannot flip on sub-quantum noise.
# ----------------------------------------------------------------------

# (bias, w_stopword_ratio, w_mean_token_len, w_uniq_ratio, w_tokens_per_100)
_QC_W = ("-1.5", "4.0", "0.25", "1.0", "0.5")

_QC_FEATS_SQL = r"""
  feats AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                w -> w <> '')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(list_filter(
                 string_split_regex(lower(text), '\s+'),
                 w -> w <> ''))) AS BIGINT) AS n_uniq,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                 w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
                AS BIGINT) AS n_stop,
           CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
    FROM documents WHERE text IS NOT NULL
  )
"""

_QC_MARGIN_SQL = (
    f"CAST({_QC_W[0]} AS DOUBLE)"
    f" + CAST({_QC_W[1]} AS DOUBLE)"
    " * (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
    f" + CAST({_QC_W[2]} AS DOUBLE)"
    " * (CAST(n_nonspace AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
    f" + CAST({_QC_W[3]} AS DOUBLE)"
    " * (CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
    f" + CAST({_QC_W[4]} AS DOUBLE)"
    " * (CAST(n_tokens AS DOUBLE) / CAST(100 AS DOUBLE))"
)

_QC_ORACLE = f"""
WITH {_QC_FEATS_SQL}
SELECT doc_id, n_tokens,
       CAST(CAST(({_QC_MARGIN_SQL}) AS DECIMAL(18,8)) AS DOUBLE) AS margin,
       (CAST(({_QC_MARGIN_SQL}) AS DECIMAL(18,8)) > 0) AS keep
FROM feats WHERE n_tokens > 0
"""


@query("quality_classifier", _QC_ORACLE)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier with weights joined in as broadcast side
    data (model-as-DataFrame — swap the literal row for a parquet of
    trained weights and nothing else changes)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    stop = F.array([F.lit(s) for s in ("the", "a", "of", "and", "to", "in", "is")])
    feats = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_uniq"),
        F.size(F.filter(w, lambda t: F.array_contains(stop, t)))
        .cast("long")
        .alias("n_stop"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("long")
        .alias("n_nonspace"),
    ).filter(F.col("n_tokens") > 0)
    weights = spark.createDataFrame(
        [tuple(float(x) for x in _QC_W)],
        "b double, w_stop double, w_len double, w_uniq double, w_tok double",
    )
    j = feats.crossJoin(F.broadcast(weights))
    margin = (
        F.col("b")
        + F.col("w_stop") * (F.col("n_stop").cast("double") / F.col("n_tokens").cast("double"))
        + F.col("w_len") * (F.col("n_nonspace").cast("double") / F.col("n_tokens").cast("double"))
        + F.col("w_uniq") * (F.col("n_uniq").cast("double") / F.col("n_tokens").cast("double"))
        + F.col("w_tok") * (F.col("n_tokens").cast("double") / F.lit(100).cast("double"))
    )
    return j.select(
        "doc_id",
        "n_tokens",
        margin.cast("decimal(18,8)").cast("double").alias("margin"),
        (margin.cast("decimal(18,8)") > 0).alias("keep"),
    )
