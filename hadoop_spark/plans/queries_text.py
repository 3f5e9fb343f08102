"""Text-analysis queries over the `documents` table (M9 extension):
language ID, quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.functions import text as tx
from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import fanout_small, load_table, shared

_LANG_ID_ORACLE = f"""
SELECT doc_id, lang AS labeled_lang, {tx.lang_id_sql("text")} AS pred_lang
FROM documents WHERE text IS NOT NULL
"""


@query("lang_id", _LANG_ID_ORACLE)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-profile language ID next to the labeled lang column."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tx.lang_id(F.col("text")).alias("pred_lang"),
    )


_QUALITY_SQL_FEATURES = tx.quality_features_sql("text")
_QUALITY_ORACLE = f"""
SELECT doc_id,
       {_QUALITY_SQL_FEATURES["n_chars"]} AS n_chars,
       {_QUALITY_SQL_FEATURES["n_tokens"]} AS n_tokens,
       {_QUALITY_SQL_FEATURES["mean_token_len"]} AS mean_token_len,
       {_QUALITY_SQL_FEATURES["punct_ratio"]} AS punct_ratio,
       {_QUALITY_SQL_FEATURES["stopword_ratio"]} AS stopword_ratio
FROM documents WHERE text IS NOT NULL
"""


@query("quality_score", _QUALITY_ORACLE)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (exact counts + double ratios)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    feats = tx.quality_features(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])


_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       {tx.ws_token_count_sql("text")} AS ws_tokens,
       {tx.bpe_token_count_sql("text")} AS bpe_tokens
FROM documents WHERE text IS NOT NULL
"""


@query("token_count", _TOKEN_COUNT_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.select(
        "doc_id",
        tx.ws_token_count(F.col("text")).alias("ws_tokens"),
        tx.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


_FINGERPRINT_ORACLE = f"""
SELECT doc_id, {tx.fingerprint_sql("text")} AS fp
FROM documents WHERE text IS NOT NULL
"""


@query("doc_fingerprint", _FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-stable 60-bit document fingerprint."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.select("doc_id", tx.fingerprint(F.col("text")).alias("fp"))


_SOURCE_PROFILE_ORACLE = f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM({tx.ws_token_count_sql("text")}) AS BIGINT) AS total_tokens,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents WHERE text IS NOT NULL
GROUP BY source
"""


@query("source_profile", _SOURCE_PROFILE_ORACLE)
def source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling per source — the groupBy that sizes a data mix."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.ws_token_count(F.col("text"))).alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
"""


@query("json_props_agg", _JSON_ORACLE)
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column processing: parse the JSON `props` payload
    with a typed schema (`from_json`, JVM-side) and aggregate the extracted
    field. The reference's only analogue is user Java in a Mapper; Spark
    gives the full json function family (§2.8 'bonus surface')."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = ev.select(
        "event_type", F.from_json(F.col("props"), "k BIGINT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p.k")).alias("sum_k"),
        F.min(F.col("p.k")).alias("min_k"),
        F.max(F.col("p.k")).alias("max_k"),
    )


_VOCAB_N = 1000

_VOCAB_ORACLE = rf"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT word, COUNT(*) AS c FROM words WHERE word <> '' GROUP BY word
),
vocab AS (
  SELECT word, c FROM (
    SELECT word, c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rn FROM freq
  ) WHERE rn <= {_VOCAB_N}
)
SELECT CAST((SELECT COUNT(*) FROM vocab) AS BIGINT) AS vocab_size,
       CAST((SELECT SUM(c) FROM freq) AS BIGINT) AS total_tokens,
       CAST((SELECT SUM(c) FROM vocab) AS BIGINT) AS covered_tokens
"""


@query("vocab_coverage", _VOCAB_ORACLE)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary sizing: how much of the token stream the top-N
    words cover (the first question before training/choosing a tokenizer).
    One wordcount shuffle; the top-N cut is `orderBy().limit(N)` — Spark
    plans TakeOrderedAndProject, a per-partition partial top-N merged at
    the driver, NOT a single-partition global sort — with ties broken on
    the word so the cut is deterministic. At 100 TB the frequency table is
    ~vocabulary-sized (millions of rows), never corpus-sized."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    freq = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from hadoop_spark.sources.tables import shared

    freq = shared(freq)
    vocab = freq.orderBy(F.desc("c"), F.asc("word")).limit(_VOCAB_N)
    totals = freq.agg(F.sum("c").alias("total_tokens"))
    vstats = vocab.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("covered_tokens"),
    )
    return vstats.crossJoin(totals).select("vocab_size", "total_tokens", "covered_tokens")


# ---------------------------------------------------------------------------
# PII scrubbing — redact emails/URLs before text enters a training corpus.
# The synthetic fixture has no natural PII, so the query INJECTS a
# deterministic email+URL per doc (pure function of doc_id) and then
# scrubs; the oracle replays injection + redaction, so a broken pattern,
# wrong replacement order, or partial (non-global) replace cannot
# hash-match. Map-side expressions only — no shuffle until the final
# result, no UDFs.

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^ ]+"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@example.com or http://site' || CAST(doc_id % 100 AS VARCHAR) ||
         '.example/path' ||
         CASE WHEN doc_id % 5 = 0
              THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@test.org' ELSE '' END
         AS t
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_URL_RE}')) AS BIGINT) AS n_urls,
       md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_URL_RE}', '<URL>', 'g')) AS scrubbed_md5
FROM aug
"""


@query("pii_scrub", _PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/URL redaction with per-doc counts and an md5 of the scrubbed
    text (the bit-exact contract: both engines must produce the identical
    redacted string). Emails are scrubbed before URLs so the two patterns
    cannot interact."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or http://site"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(".example/path"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" cc admin"), F.col("doc_id").cast("string"), F.lit("@test.org")),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_RE), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_URL_RE), F.lit(0))).cast("bigint").alias("n_urls"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
    )


_COOC_MIN = 10
# Per-doc vocabulary cap: the pair fan-out before aggregation is
# Σ_doc (min(v_d, CAP) choose 2) ≤ docs · CAP²/2 — a hard bound no
# pathological document can break (an uncapped 10⁵-distinct-word doc
# would emit 5·10⁹ pairs from one task). Words are kept by in-doc
# frequency with a deterministic word-order tie-break, mirrored
# exactly in the oracle so the cut itself is correctness-checked.
_COOC_CAP = 200

_COOC_ORACLE = rf"""
WITH tokens AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS word
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT doc_id, word, COUNT(*) AS c FROM tokens GROUP BY doc_id, word
),
posts AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, word,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, word) AS rn
    FROM freq
  ) WHERE rn <= {_COOC_CAP}
)
SELECT a.word AS word_a, b.word AS word_b,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM posts a JOIN posts b ON a.doc_id = b.doc_id AND a.word < b.word
GROUP BY a.word, b.word
HAVING COUNT(*) >= {_COOC_MIN}
"""


@query("word_cooccurrence", _COOC_ORACLE)
def word_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level word co-occurrence counts (the PMI / word-embedding
    preprocessing workload): per-doc postings self-joined on the doc with
    a support cutoff (≥{_COOC_MIN} docs). Scale guards: each doc keeps only
    its top-{_COOC_CAP} words by in-doc frequency (deterministic word
    tie-break, identical cut in the oracle), bounding the pre-aggregation
    fan-out at docs·CAP²/2 pairs regardless of document pathology; the
    per-doc top-N window partitions on doc_id so it is parallel across
    documents."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    freq = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("word"))
    posts = shared(
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _COOC_CAP)
        .select("doc_id", "word")
    )
    a = posts.alias("a")
    b = posts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= _COOC_MIN)
    )


# ---------------------------------------------------------------------------
# Repetition / quality signals (Gopher §A.1.1, C4-style heuristics): the
# filters every pretraining corpus pass applies before tokenization.
# Everything is exact-integer counting with one final IEEE divide per
# ratio, so the oracle is bit-exact.

_REPETITION_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS words
  FROM documents WHERE text IS NOT NULL
),
words AS (
  SELECT doc_id, unnest(words) AS word FROM toks
),
wstats AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct
  FROM words GROUP BY doc_id
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i + 1])) AS bg
  FROM toks WHERE len(words) >= 2
),
bgcounts AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg
),
bgstats AS (
  SELECT doc_id,
         CAST(MAX(c) AS BIGINT) AS top_bigram_n,
         CAST(SUM(c) AS BIGINT) AS n_bigrams
  FROM bgcounts GROUP BY doc_id
)
SELECT w.doc_id,
       w.n_words,
       w.n_distinct,
       1.0 - CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE)
         AS dup_word_ratio,
       COALESCE(b.top_bigram_n, 0) AS top_bigram_n,
       CASE WHEN b.n_bigrams > 0
            THEN CAST(b.top_bigram_n AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS top_bigram_ratio
FROM wstats w LEFT JOIN bgstats b ON w.doc_id = b.doc_id
WHERE w.n_words > 0
"""


@query("repetition_signals", _REPETITION_ORACLE)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition filters (the Gopher/C4 quality-signal
    family): duplicate-word ratio (1 - distinct/total) and most-frequent-
    bigram mass — the two signals that catch boilerplate and spam pages
    before they enter a training mix. All counting is exact integers; the
    only floats are one divide per ratio. Scale shape: token/bigram
    explode is map-side; the two aggregations shuffle on doc_id and
    (doc_id, bigram) — partition-parallel across documents, no global
    state; the bigram list per doc is length-bounded by the doc itself
    (adjacent pairs, not all pairs — linear, unlike co-occurrence)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("words"),
    )
    toks = shared(toks)
    words = toks.select("doc_id", F.explode("words").alias("word"))
    wstats = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("word").alias("n_distinct"),
    )
    n = F.size("words")
    bigrams = toks.filter(n >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat(
                    F.element_at("words", i), F.lit(" "), F.element_at("words", i + 1)
                ),
            )
        ).alias("bg"),
    )
    bgstats = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )
    out = wstats.join(bgstats, "doc_id", "left").filter(F.col("n_words") > 0)
    return out.select(
        "doc_id",
        "n_words",
        "n_distinct",
        (
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words").cast("double")
        ).alias("dup_word_ratio"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).alias("top_bigram_n"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("top_bigram_n").cast("double") / F.col("n_bigrams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
    )


_SOURCE_CAP = 50

_SOURCE_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {{h}} , doc_id
         ) AS rn
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS kept_ids_sum
FROM ranked WHERE rn <= {_SOURCE_CAP}
GROUP BY source
"""


def _source_cap_oracle() -> str:
    from hadoop_spark.functions.hashing import portable_hash64_sql

    return _SOURCE_CAP_ORACLE.format(h=portable_hash64_sql("doc_id", salt="cap"))


@query("source_cap_sample", _source_cap_oracle())
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling — the domain/source cap every training
    mix applies so one crawl domain cannot dominate. Each source keeps at
    most {_SOURCE_CAP} docs, chosen by a DETERMINISTIC md5 order (a pure
    function of doc_id — scheduler- and retry-independent, the
    SequenceFileInputFilter.MD5Filter discipline), tie-broken on doc_id.
    Scale: one window partitioned by source; per-source data is processed
    in parallel and nothing global materializes. The oracle re-derives the
    exact kept set (count + id-sum per source)."""
    from pyspark.sql import Window

    from hadoop_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = Window.partitionBy("source").orderBy(
        portable_hash64("doc_id", salt="cap"), F.asc("doc_id")
    )
    kept = docs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _SOURCE_CAP
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("kept_ids_sum"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms — the search / keyword-extraction workload, made
# engine-exact: idf is quantized to a BIGINT via integer floor division
# (SCALE·(N+1)) // (df+1), so scoring and ranking involve no transcendental
# functions (ln differs in the last bit across engines) and the oracle is
# bit-exact. Monotonicity in df is identical to log-idf, which is all
# ranking needs.

_TFIDF_SCALE = 1_000_000
_TFIDF_TOP = 5

_TFIDF_ORACLE_TMPL = r"""
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> ''))
           AS word
  FROM documents WHERE text IS NOT NULL
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM words GROUP BY doc_id, word
),
df AS (
  SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM words GROUP BY word
),
scored AS (
  SELECT t.doc_id, t.word, t.tf,
         t.tf * (CAST({num} AS BIGINT) // (d.df + 1)) AS score
  FROM tf t JOIN df d ON t.word = d.word
)
SELECT doc_id, word, tf, score, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, word
  ) AS rnk FROM scored
) WHERE rnk <= {top}
"""


def _tfidf_oracle() -> str:
    # N is data-dependent; the oracle recomputes it inline as a subquery
    return _TFIDF_ORACLE_TMPL.format(
        num=f"{_TFIDF_SCALE} * (1 + (SELECT COUNT(*) FROM documents WHERE text IS NOT NULL))",
        top=_TFIDF_TOP,
    )


@query("tfidf_topterms", _tfidf_oracle())
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-{_TFIDF_TOP} terms by quantized TF-IDF. Scale
    shape: tf is one (doc,word) aggregate; df is one vocabulary-sized
    aggregate; the tf⋈df join is keyed on the word (vocabulary
    cardinality, not corpus cardinality); the top-k window partitions on
    doc_id. N (total docs) is one scalar aggregate folded into the idf
    literal — the same bounded driver scalar the IVF probe list uses.
    Integer idf (floor((N+1)·SCALE/(df+1))) keeps ranking monotone in df
    with zero cross-engine float risk."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_docs = docs.count()  # bounded scalar: one number
    words = shared(
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        ).filter(F.col("word") != "")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    num = _TFIDF_SCALE * (1 + n_docs)
    scored = tf.join(df, "word").select(
        "doc_id",
        "word",
        "tf",
        (F.col("tf") * F.expr(f"CAST({num} AS BIGINT) div (df + 1)")).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TFIDF_TOP)
        .select("doc_id", "word", "tf", "score", "rnk")
    )


_LIFT_TOPK = 20

_LIFT_ORACLE = rf"""
WITH tokens AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS word
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT doc_id, word, COUNT(*) AS c FROM tokens GROUP BY doc_id, word
),
posts AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, word,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, word) AS rn
    FROM freq
  ) WHERE rn <= {_COOC_CAP}
),
df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS d FROM posts GROUP BY word),
ndocs AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM posts
),
pairs AS (
  SELECT a.word AS word_a, b.word AS word_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM posts a JOIN posts b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
  HAVING COUNT(*) >= {_COOC_MIN}
),
lifted AS (
  SELECT p.word_a, p.word_b, p.n_ab,
         (CAST(p.n_ab AS DOUBLE) * CAST(nd.n AS DOUBLE))
           / (CAST(da.d AS DOUBLE) * CAST(db.d AS DOUBLE)) AS lift
  FROM pairs p
  JOIN df da ON p.word_a = da.word
  JOIN df db ON p.word_b = db.word
  CROSS JOIN ndocs nd
)
SELECT word_a, word_b, n_ab, lift, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY lift DESC, word_a, word_b
  ) AS rk FROM lifted
) WHERE rk <= {_LIFT_TOPK}
"""


@query("word_lift", _LIFT_ORACLE)
def word_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by LIFT — P(a,b) / (P(a)P(b)) over document
    co-occurrence, the log-free PMI (same ranking as PMI since log is
    monotone, but exact across engines: integer counts, one IEEE ratio).
    Reuses the capped co-occurrence shape (`word_cooccurrence`); the final
    top-{_LIFT_TOPK} rank runs over the support-cutoff pair table, which
    the ≥{_COOC_MIN}-doc cutoff keeps bounded — the global window never
    sees raw pairs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from pyspark.sql import Window

    toks = shared(
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("word"),
        )
    )
    freq = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    wtop = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("word"))
    posts = shared(
        freq.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= _COOC_CAP)
        .select("doc_id", "word")
    )
    dfreq = posts.groupBy("word").agg(F.count(F.lit(1)).alias("d"))
    ndocs = posts.agg(F.countDistinct("doc_id").alias("n"))
    a = posts.select(F.col("doc_id").alias("doc_id"), F.col("word").alias("word_a"))
    b = posts.select(F.col("doc_id").alias("doc_id"), F.col("word").alias("word_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _COOC_MIN)
    )
    da = dfreq.select(F.col("word").alias("word_a"), F.col("d").alias("da"))
    db = dfreq.select(F.col("word").alias("word_b"), F.col("d").alias("db"))
    # r10 audit: raw IEEE lift quotient of exact int64 counts — bit-equal,
    # so the top-k ordering matches without quantization.
    lift = (F.col("n_ab").cast("double") * F.col("n").cast("double")) / (
        F.col("da").cast("double") * F.col("db").cast("double")
    )
    # da/db have one row per DISTINCT VOCABULARY WORD — vocabulary grows
    # with corpus size (Heaps' law; tens of GB of strings at 100 TB web
    # text), so the hint must degrade to a shuffle join above the cap.
    lifted = (
        pairs.join(bcast_if_small(da), "word_a")
        .join(bcast_if_small(db), "word_b")
        .crossJoin(F.broadcast(ndocs))
        .select("word_a", "word_b", "n_ab", lift.alias("lift"))
    )
    wr = Window.orderBy(F.desc("lift"), "word_a", "word_b")
    return (
        lifted.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rk") <= _LIFT_TOPK)
        .select("word_a", "word_b", "n_ab", "lift", "rk")
    )


# ---------------------------------------------------------------------------
# Character-n-gram language profiles — the TRAINING counterpart of lang_id:
# the per-language trigram frequency tables a profile-based identifier
# (Cavnar-Trenkle) is built from. Wordcount-shaped shuffle on the
# (lang, trigram) key; per-doc fan-out is capped by a prefix cut.

_CNG_N = 3
_CNG_PREFIX = 2000  # chars per doc that contribute to the profile
_CNG_TOP = 10

_CNG_ORACLE = f"""
WITH cut AS (
  SELECT lang, lower(substr(text, 1, {_CNG_PREFIX})) AS t
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
), grams AS (
  SELECT lang,
         unnest(list_transform(
           generate_series(1, length(t) - {_CNG_N - 1}, 1),
           p -> substr(t, p, {_CNG_N}))) AS g
  FROM cut WHERE length(t) >= {_CNG_N}
), counted AS (
  SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n
  FROM grams GROUP BY lang, g
)
SELECT lang, g, n, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT lang, g, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rnk
  FROM counted
) WHERE rnk <= {_CNG_TOP}
"""


@query("char_ngram_profile", _CNG_ORACLE)
def char_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} character trigrams per language — the frequency profile a
    Cavnar-Trenkle language identifier trains on (`lang_id` is the
    scoring half). One map pass emits <= {P} grams per doc (prefix cut:
    profile quality saturates long before full-document counting), the
    only corpus shuffle groups by the uniform (lang, trigram) key, and
    the top-k window runs over the bounded per-language gram table
    (alphabet^3 rows at most), never over the corpus. Ties break on the
    gram string, so ranking is total and engine-independent."""
    # r10 opt (guide §2.5): the per-doc trigram explode is the expensive
    # map phase before the only corpus shuffle — spread the under-split
    # scan first (no-op at real scale). Measured sf0.1: 2.5 s -> 1.3 s.
    docs = fanout_small(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & F.col("lang").isNotNull()
        )
    )
    cut = docs.select(
        "lang", F.lower(F.substring("text", 1, _CNG_PREFIX)).alias("t")
    ).filter(F.length("t") >= _CNG_N)
    grams = cut.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - (_CNG_N - 1)),
                lambda p: F.col("t").substr(p, F.lit(_CNG_N)),
            )
        ).alias("g"),
    )
    counted = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("g"))
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _CNG_TOP)
        .select("lang", "g", "n", "rnk")
    )


# ---------------------------------------------------------------------------
# Pairwise document similarity via the inverted index — the classic IR/
# MapReduce workload (Elsayed, Lin & Oard, "Pairwise Document Similarity
# in Large Collections with MapReduce": postings self-join per term,
# high-df terms dropped so posting lists stay bounded). Weights are fully
# integer: idf is a log2 BUCKET computed as the binary digit count of df
# (LENGTH(BIN(df)) — exact on both engines, no transcendentals, and small
# enough that pairwise products can never overflow BIGINT).

_DSIM_TOP_TERMS = 8  # per-doc postings emitted (by weight)
_DSIM_DF_MAX = 200  # posting-list bound: terms in more docs are dropped
_DSIM_IDF_BITS = 24  # idf bucket = max(1, BITS - digit_count(df))
_DSIM_TOP_PAIRS = 50

_DSIM_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS w
  FROM documents WHERE text IS NOT NULL
), tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, w
), df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
), weighted AS (
  SELECT t.doc_id, t.w,
         t.tf * GREATEST(1, {_DSIM_IDF_BITS} - length(bin(d.df))) AS wt
  FROM tf t JOIN df d ON t.w = d.w
  WHERE d.df <= {_DSIM_DF_MAX}
), postings AS (
  SELECT doc_id, w, wt FROM (
    SELECT doc_id, w, wt,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wt DESC, w) AS rn
    FROM weighted
  ) WHERE rn <= {_DSIM_TOP_TERMS}
), pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(SUM(a.wt * b.wt) AS BIGINT) AS sim_q,
         CAST(COUNT(*) AS BIGINT) AS shared_terms
  FROM postings a JOIN postings b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, sim_q, shared_terms
FROM pairs ORDER BY sim_q DESC, d1, d2 LIMIT {_DSIM_TOP_PAIRS}
"""


@query("doc_sim_sparse", _DSIM_ORACLE)
def doc_sim_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{P} most similar document pairs by sparse tf-idf dot product,
    computed through the inverted index: per-doc top-{T} weighted terms
    become postings, the self-join runs PER TERM (never doc x doc), and
    terms appearing in more than {D} docs are dropped first — the
    high-df cutoff is what bounds every posting list, so per-term pair
    fan-out is <= D^2 regardless of corpus size (add banding inside hot
    terms to tighten further at 100 TB). idf is an integer log2 bucket
    (binary digit count of df), so weights, products, and sums are exact
    BIGINTs on both engines and can never overflow. Ranking ties break
    on (d1, d2). Reference parity: the two-job postings -> pair-sum
    pipeline of the pairwise-similarity MapReduce literature and
    `examples/` inverted-index + join chaining."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.greatest(F.lit(1), F.lit(_DSIM_IDF_BITS) - F.length(F.bin("df")))
    weighted = (
        tf.join(df.filter(F.col("df") <= _DSIM_DF_MAX), "w")
        .select("doc_id", "w", (F.col("tf") * idf).alias("wt"))
    )
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id").orderBy(F.desc("wt"), F.asc("w"))
    postings = shared(
        weighted.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= _DSIM_TOP_TERMS)
        .select("doc_id", "w", "wt")
    )
    pairs = (
        postings.alias("a")
        .join(postings.alias("b"), "w")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(
            F.sum(F.col("a.wt") * F.col("b.wt")).cast("bigint").alias("sim_q"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    return pairs.orderBy(F.desc("sim_q"), "d1", "d2").limit(_DSIM_TOP_PAIRS)


# ----------------------------------------------------------------------
# bm25_scores — ad-hoc retrieval over the corpus: BM25 ranking of every
# document against a fixed multi-term query. The scale shape is the
# retrieval textbook one: the corpus-wide work is (a) one tiny
# tf aggregation over ONLY the query terms (the isin filter runs in the
# scan — at 100 TB the shuffle carries a few rows per matching doc, not
# the vocabulary), (b) two bounded side tables (per-term df; the 1-row
# corpus length stats), both broadcast. Determinism: idf is the integer
# log2 bucket (same convention as doc_sim_sparse), tf/length inputs are
# exact integers, the per-term contribution is a fixed IEEE expression
# floor-quantized to an exact integer (scale 8) BEFORE the per-doc sum —
# order-independent AND engine-exact (r10 audit: the previous DECIMAL
# cast carried the cross-engine shortest-repr tie risk; floor does not).
# ----------------------------------------------------------------------

_BM25_TERMS = ["filter", "scan", "vector"]
_BM25_K1 = "1.2"
_BM25_B = "0.75"
_BM25_IDF_BITS = 24
_BM25_TOPN = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks),
corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_len
  FROM lens
),
tf AS (
  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(w) AS t FROM toks)
  WHERE t IN ({terms})
  GROUP BY doc_id, t
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
contrib AS (
  SELECT tf.doc_id,
         FLOOR(
           GREATEST(1, {_BM25_IDF_BITS} - length(bin(df.df)))
           * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
           / (CAST(tf.tf AS DOUBLE) + {_BM25_K1}
              * (1.0 - {_BM25_B} + {_BM25_B}
                 * (CAST(l.dl AS DOUBLE)
                    / (CAST(c.total_len AS DOUBLE) / CAST(c.n_docs AS DOUBLE)))))
           * 100000000 + 0.5) AS s
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN lens l ON tf.doc_id = l.doc_id
  CROSS JOIN corpus c
)
SELECT doc_id,
       CAST(CAST(SUM(CAST(s AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
         / 100000000 AS score,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {_BM25_TOPN}
"""


@query("bm25_scores", _bm25_oracle())
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{N} docs for a fixed 3-term query, engine-exact."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w"),
    )
    lens = toks.select("doc_id", F.size("w").cast("bigint").alias("dl"))
    corpus = lens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    # dl rides through the tf aggregation (per-doc constant -> max), so
    # scoring never joins the data-sized length table back in
    tf = (
        toks.select(
            "doc_id",
            F.size("w").cast("bigint").alias("dl0"),
            F.explode("w").alias("term"),
        )
        .filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.max("dl0").alias("dl"),
        )
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    k1 = float(_BM25_K1)
    b = float(_BM25_B)
    idf = F.greatest(
        F.lit(1), F.lit(_BM25_IDF_BITS) - F.length(F.bin("df"))
    ).cast("bigint")
    avg_len = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avg_len)
    # r10 audit: the per-term contribution is a GENERIC quotient, so it is
    # floor-quantized (exactly-defined IEEE ops, engine-identical) instead
    # of DECIMAL-cast before the exact per-doc sum — the fsum idiom inlined
    # so the contribution stays a single JVM expression.
    contrib = F.floor(
        idf.cast("double")
        * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (F.col("tf").cast("double") + F.lit(k1) * norm)
        * F.lit(1e8)
        + F.lit(0.5)
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", contrib.alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("s").cast("decimal(38,0)"))
                .cast("string")
                .cast("double")
                / F.lit(1e8)
            ).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(_BM25_TOPN)
    )


# ----------------------------------------------------------------------
# langid_confusion — classifier evaluation at corpus scale: the
# (labeled lang × predicted lang) confusion matrix for the n-gram
# language identifier, with per-cell counts and the row-relative rate.
# Pure map-side prediction (the same JVM expression `lang_id` serves)
# into one bounded (langs²) aggregation — evaluating a classifier over
# 100 TB costs exactly one pass. The rate is one IEEE division of exact
# counts (row total via a window over the bounded matrix).
# ----------------------------------------------------------------------

_CONFUSION_ORACLE = f"""
WITH pred AS (
  SELECT lang AS labeled_lang, {tx.lang_id_sql("text")} AS pred_lang
  FROM documents WHERE text IS NOT NULL
),
cells AS (
  SELECT labeled_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
)
SELECT labeled_lang, pred_lang, n,
       (CAST(n AS DOUBLE)
        / CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS DOUBLE)) AS rate
FROM cells
"""


@query("langid_confusion", _CONFUSION_ORACLE)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cells = docs.select(
        F.col("lang").alias("labeled_lang"),
        tx.lang_id(F.col("text")).alias("pred_lang"),
    ).groupBy("labeled_lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    row_total = F.sum("n").over(W.partitionBy("labeled_lang"))
    return cells.select(
        "labeled_lang",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / row_total.cast("double")).alias("rate"),
    )


# ----------------------------------------------------------------------
# length_percentiles — p10/p50/p90 token length per source, via the
# exact value-histogram nearest-rank machinery (`operators/stats.
# group_quantiles`): ONE histogram shuffle bounded by distinct lengths
# serves all three cut points — the length-distribution report that
# drives packing budgets and truncation limits per corpus source.
# ----------------------------------------------------------------------

from hadoop_spark.operators.stats import (  # noqa: E402
    group_quantiles as _gq,
    group_quantiles_sql as _gq_sql,
)

_LEN_QS = {"p10": 0.10, "p50": 0.50, "p90": 0.90}

_LEN_PCT_ORACLE = f"""
WITH src AS (
  SELECT source, {tx.ws_token_count_sql("text")} AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
{_gq_sql("src", "source", "n_tokens", _LEN_QS, "q")}
SELECT source, p10, p50, p90 FROM q
"""


@query("length_percentiles", _LEN_PCT_ORACLE)
def length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    src = docs.select(
        "source", tx.ws_token_count(F.col("text")).alias("n_tokens")
    )
    return _gq(src, "source", "n_tokens", _LEN_QS)


# ----------------------------------------------------------------------
# zipf_profile — does the corpus follow Zipf's law? Word frequencies
# bucketed by the binary digit count of their RANK (the log-free log2
# convention): for a Zipfian corpus, total mass per log-rank bucket is
# roughly flat. Ranks come from the scalable global_rank-style ordering
# of the (vocabulary-sized) word-count table; everything after the one
# wordcount shuffle runs on vocabulary-sized data. The
# tokenizer-capacity planning read: how much probability mass the next
# doubling of vocabulary buys.
# ----------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH wc AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS w
  FROM documents WHERE text IS NOT NULL
),
counts AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM wc GROUP BY w),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk FROM counts
)
SELECT CAST(length(bin(rnk)) AS BIGINT) AS rank_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(c) AS BIGINT) AS mass,
       CAST(MAX(c) AS BIGINT) AS max_freq,
       CAST(MIN(c) AS BIGINT) AS min_freq
FROM ranked GROUP BY 1
"""


@query("zipf_profile", _ZIPF_ORACLE)
def zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counts = (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # vocabulary-sized ordering (same bounded argument as tfidf's window)
    ranked = counts.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("c"), F.asc("w")))
    )
    return ranked.groupBy(
        F.length(F.bin("rnk")).cast("bigint").alias("rank_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("c").cast("bigint").alias("mass"),
        F.max("c").alias("max_freq"),
        F.min("c").alias("min_freq"),
    )


# ----------------------------------------------------------------------
# trigram_search — index-accelerated substring search (the pg_trgm /
# code-search pattern, word-granular): build an inverted word-trigram
# posting list over the corpus, probe it with a BATCH of search phrases
# (a doc is a candidate only if it holds EVERY trigram of the phrase),
# and verify candidates with an exact substring match. The index prunes
# the verify step from |corpus| to |candidates|: at 100 TB the postings
# are pre-materialized partitioned BY TRIGRAM, so a probe touches only
# the partitions of the phrase's trigrams (same partition-pruned shape
# as the IVF probe in `queries_similarity.py`) — here the postings build
# is inlined since the fixture corpus is read in one pass either way.
# Only trigrams matching the probe set survive the map side (the filter
# sits before the shuffle), so the candidate join is probe-sized.
# ----------------------------------------------------------------------

_SEARCH_PHRASES = [
    "slow fast table value",
    "merge batch part",
    "key agg row scan",
    "window table table key",
    "scan query big table",
]


def _trigram_search_oracle() -> str:
    vals = ",\n    ".join(f"('{p}')" for p in _SEARCH_PHRASES)
    return f"""
SELECT p.phrase, d.doc_id, d.source
FROM documents d
JOIN (VALUES
    {vals}
) p(phrase) ON contains(d.text, p.phrase)
"""


@query("trigram_search", _trigram_search_oracle())
def trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 opt (guide §2.5): the word-trigram posting explode (transform +
    # array_distinct over every doc) runs before any exchange — spread the
    # under-split scan (no-op at real scale). Measured sf0.1: 4.9 s -> 1.1 s.
    docs = fanout_small(load_table(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    trigrams = F.when(
        F.size(w) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(w, i),
                    F.element_at(w, i + 1),
                    F.element_at(w, i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Probe table: (phrase, trigram, n_trigrams) — a bounded literal, the
    # DistributedCache side of the join.
    probe_rows = []
    for p in _SEARCH_PHRASES:
        toks = p.split(" ")
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        for g in grams:
            probe_rows.append((p, g, len(set(grams))))
    probe = spark.createDataFrame(
        probe_rows, "phrase string, trigram string, n_grams int"
    )
    probe_grams = {g for _, g, _ in probe_rows}
    postings = docs.select(
        "doc_id", "source", "text", F.explode(trigrams).alias("trigram")
    ).filter(F.col("trigram").isin(sorted(probe_grams)))
    candidates = (
        postings.join(F.broadcast(probe), "trigram")
        .groupBy("phrase", "doc_id", "source", "text", "n_grams")
        .agg(F.countDistinct("trigram").alias("hit_grams"))
        .filter(F.col("hit_grams") == F.col("n_grams"))
    )
    # Exact verify: the trigram index is lossless-negative (no false
    # dismissals) but can admit false positives across distinct phrases
    # sharing all trigrams — contains() is the authority.
    return candidates.filter(
        F.instr(F.col("text"), F.col("phrase")) > 0
    ).select("phrase", "doc_id", "source")


# ----------------------------------------------------------------------
# token_position_profile — does vocabulary frequency correlate with
# WHERE words appear inside documents? For each document-frequency
# bucket (the log-free LENGTH(BIN(df)) idiom), the mean relative
# position of its token occurrences — rare-token mass drifting to
# document tails is the signature of appended boilerplate/citations and
# biases truncation-based training. One posexplode pass (n_tokens rows),
# a broadcast df-bucket join, and exact arithmetic: relative position is
# the integer pair (pos, len) cleared to per-row permille before the
# decimal-quantized mean.
# ----------------------------------------------------------------------

_TOKPOS_ORACLE = """
WITH toks AS (
  SELECT d.doc_id, d.ws[CAST(t.i AS INT)] AS w,
         CAST(t.i AS BIGINT) AS pos, d.len
  FROM (
    SELECT doc_id, string_split(text, ' ') AS ws,
           len(string_split(text, ' ')) AS len
    FROM documents
  ) d, LATERAL (SELECT unnest(range(1, d.len + 1)) AS i) t
  WHERE d.ws[CAST(t.i AS INT)] <> ''
),
df AS (
  SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY w
),
j AS (
  SELECT CAST(length(bin(df.df)) AS BIGINT) AS df_bucket,
         CAST((toks.pos - 1) * 1000 // GREATEST(toks.len - 1, 1) AS BIGINT)
           AS permille
  FROM toks JOIN df ON toks.w = df.w
)
SELECT df_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(SUM(permille) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_permille_pos
FROM j GROUP BY df_bucket
"""


@query("token_position_profile", _TOKPOS_ORACLE)
def token_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 opt (guide §2.5): the full-corpus posexplode feeds the persisted
    # toks frame — spread the under-split scan so tokenization runs on all
    # cores (no-op at real scale). Measured sf0.1: 2.9 s -> 1.4 s.
    docs = fanout_small(load_table(spark, sf_dir, "documents"))
    ws = F.split("text", " ")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(ws).alias("pos0", "w"),
            F.size(ws).alias("len"),
        )
        .filter(F.col("w") != "")
        .select("doc_id", "w", (F.col("pos0") + 1).alias("pos"), "len")
    )
    toks = shared(toks)
    df = toks.groupBy("w").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    permille = F.floor(
        (F.col("pos") - 1) * 1000 / F.greatest(F.col("len") - 1, F.lit(1))
    ).cast("bigint")
    # df is per-distinct-word (vocabulary-scaling, same Heaps'-law growth
    # as word_lift's da/db) — size-guarded, not forced.
    j = toks.join(bcast_if_small(df), "w").select(
        F.length(F.bin("df")).cast("bigint").alias("df_bucket"),
        permille.alias("permille"),
    )
    # r10 audit: raw IEEE mean of an exact int64 permille sum.
    mean_pos = F.sum("permille").cast("double") / F.count(F.lit(1)).cast(
        "double"
    )
    return j.groupBy("df_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        mean_pos.alias("mean_permille_pos"),
    )


# ----------------------------------------------------------------------
# kwic_windows — KeyWord-In-Context concordance (the corpus-linguistics
# display behind every "show usage in context" feature): for a fixed
# probe-term list, the ±3-token windows around the first two occurrences
# per document. Entirely row-local array expressions — per-term position
# scan, per-doc occurrence cap INSIDE the array (so a term-spamming doc
# cannot fan out), context slices, one explode of the bounded hit list.
# No shuffle before the final ordering; at 100 TB this is a scan-shaped
# pass like `span_corruption_plan`.
# ----------------------------------------------------------------------

_KWIC_TERMS = ["merge", "vector", "stream"]
_KWIC_CAP = 2  # occurrences kept per (doc, term)

_KWIC_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
), hits AS (
  SELECT doc_id, w, t.term,
         unnest(list_transform(
           list_filter(range(1, len(w) + 1), i -> w[CAST(i AS INTEGER)] = t.term)
             [1:{_KWIC_CAP}],
           i -> CAST(i AS BIGINT))) AS pos
  FROM toks
  CROSS JOIN (SELECT unnest({_KWIC_TERMS!r}) AS term) t
)
SELECT doc_id, term, pos,
       -- COALESCE: DuckDB's array_to_string over an EMPTY slice yields
       -- NULL where Spark's array_join yields '' (doc-edge windows)
       COALESCE(array_to_string(w[GREATEST(1, CAST(pos AS INTEGER) - 3):
                         CAST(pos AS INTEGER) - 1], ' '), '') AS left_ctx,
       COALESCE(array_to_string(w[CAST(pos AS INTEGER) + 1:
                         CAST(pos AS INTEGER) + 3], ' '), '') AS right_ctx
FROM hits
"""


@query("kwic_windows", _KWIC_ORACLE)
def kwic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±3-token concordance windows for a fixed probe-term list."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = fanout_small(docs).select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w"),
    )
    per_term = [
        F.transform(
            F.slice(
                F.filter(
                    F.sequence(F.lit(1), F.size("w")),
                    lambda i: F.element_at(F.col("w"), i) == term,
                ),
                1,
                _KWIC_CAP,
            ),
            lambda i: F.struct(
                F.lit(term).alias("term"), i.cast("bigint").alias("pos")
            ),
        )
        for term in _KWIC_TERMS
    ]
    hits = toks.select(
        "doc_id", "w", F.explode(F.concat(*per_term)).alias("h")
    ).select("doc_id", "w", F.col("h.term").alias("term"), F.col("h.pos").alias("pos"))
    p = F.col("pos").cast("int")
    left_start = F.greatest(F.lit(1), p - 3)
    left_len = p - left_start
    return hits.select(
        "doc_id",
        "term",
        "pos",
        F.array_join(F.slice("w", left_start, left_len), " ").alias("left_ctx"),
        F.array_join(F.slice("w", p + 1, F.lit(3)), " ").alias("right_ctx"),
    )


# ----------------------------------------------------------------------
# json_nested_shred — deep semi-structured processing: each order is
# serialized into a NESTED JSON document (customer object + line-item
# array built with to_json over collect_list of structs), then shredded
# back — typed schema parse, array explode, inner-field aggregation.
# `json_props_agg` covers the flat case; this is the
# document-database-export shape (array-of-objects inside an object)
# that exercises from_json with nested array schemas + inline explode.
# The JSON text itself never crosses an Exchange un-aggregated: build
# and shred happen in the same stage; the oracle replays the shred with
# DuckDB's JSON path functions over an identically-constructed document.
# ----------------------------------------------------------------------

_SHRED_ORACLE = """
WITH doc AS (
  SELECT o.o_orderkey,
         to_json(struct_pack(
           cust := struct_pack(key := o.o_custkey, pri := o.o_orderpriority),
           lines := list(struct_pack(ln := l.l_linenumber,
                                     qty := CAST(l.l_quantity AS BIGINT))
                         ORDER BY l.l_linenumber)
         )) AS j
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_custkey, o.o_orderpriority
), shredded AS (
  SELECT json_extract_string(j, '$.cust.pri') AS pri,
         CAST(json_extract(u.line, '$.qty') AS BIGINT) AS qty
  FROM doc, UNNEST(CAST(json_extract(j, '$.lines') AS JSON[])) AS u(line)
)
SELECT pri AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS total_qty
FROM shredded GROUP BY pri
"""


@query("json_nested_shred", _SHRED_ORACLE)
def json_nested_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON build → typed parse → array explode → aggregate."""
    from pyspark.sql import Window as W  # noqa: F401

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    doc = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey", "o_orderpriority")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").cast("bigint").alias("qty"),
                    )
                )
            ).alias("lines")
        )
        .select(
            F.to_json(
                F.struct(
                    F.struct(
                        F.col("o_custkey").alias("key"),
                        F.col("o_orderpriority").alias("pri"),
                    ).alias("cust"),
                    F.col("lines").alias("lines"),
                )
            ).alias("j")
        )
    )
    schema = "cust STRUCT<key: BIGINT, pri: STRING>, lines ARRAY<STRUCT<ln: BIGINT, qty: BIGINT>>"
    parsed = doc.select(F.from_json("j", schema).alias("p"))
    shredded = parsed.select(
        F.col("p.cust.pri").alias("pri"),
        F.explode("p.lines").alias("line"),
    ).select("pri", F.col("line.qty").alias("qty"))
    return shredded.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("qty").cast("bigint").alias("total_qty"),
    )


# ----------------------------------------------------------------------
# langid_prf1 — per-class precision/recall/F1 derived from the language
# confusion matrix (`langid_confusion` reports the matrix; a model card
# reports PRF1). tp / predicted-positives / actual-positives are exact
# integers from one grouped count; each metric is one IEEE ratio, F1
# computed from the exact integer identity 2·tp / (pred_pos + act_pos)
# — never from the two already-divided floats.
# ----------------------------------------------------------------------

_PRF1_ORACLE = f"""
WITH pred AS (
  SELECT lang AS labeled_lang, {tx.lang_id_sql("text")} AS pred_lang
  FROM documents WHERE text IS NOT NULL
), cells AS (
  SELECT labeled_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
), act AS (
  SELECT labeled_lang AS cls, CAST(SUM(n) AS BIGINT) AS act_pos
  FROM cells GROUP BY 1
), prd AS (
  SELECT pred_lang AS cls, CAST(SUM(n) AS BIGINT) AS pred_pos
  FROM cells GROUP BY 1
), tp AS (
  SELECT labeled_lang AS cls, n AS tp FROM cells
  WHERE labeled_lang = pred_lang
)
SELECT a.cls,
       COALESCE(t.tp, 0) AS tp,
       COALESCE(p.pred_pos, 0) AS pred_pos,
       a.act_pos,
       CASE WHEN COALESCE(p.pred_pos, 0) > 0
            THEN CAST(COALESCE(t.tp, 0) AS DOUBLE)
                 / CAST(p.pred_pos AS DOUBLE) ELSE 0.0 END AS precision_,
       CAST(COALESCE(t.tp, 0) AS DOUBLE) / CAST(a.act_pos AS DOUBLE)
         AS recall_,
       CASE WHEN COALESCE(p.pred_pos, 0) + a.act_pos > 0
            THEN 2.0 * CAST(COALESCE(t.tp, 0) AS DOUBLE)
                 / CAST(COALESCE(p.pred_pos, 0) + a.act_pos AS DOUBLE)
            ELSE 0.0 END AS f1
FROM act a
LEFT JOIN prd p ON a.cls = p.cls
LEFT JOIN tp t ON a.cls = t.cls
"""


@query("langid_prf1", _PRF1_ORACLE)
def langid_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the n-gram language identifier."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cells = shared(
        docs.select(
            F.col("lang").alias("labeled_lang"),
            tx.lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    act = cells.groupBy(F.col("labeled_lang").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("act_pos")
    )
    prd = cells.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("pred_pos")
    )
    tp = cells.filter(F.col("labeled_lang") == F.col("pred_lang")).select(
        F.col("labeled_lang").alias("cls"), F.col("n").alias("tp")
    )
    j = (
        act.join(F.broadcast(prd), "cls", "left")
        .join(F.broadcast(tp), "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce(F.col("pred_pos"), F.lit(0))
            .cast("bigint")
            .alias("pred_pos"),
            "act_pos",
        )
    )
    prec = F.when(
        F.col("pred_pos") > 0,
        F.col("tp").cast("double") / F.col("pred_pos").cast("double"),
    ).otherwise(0.0)
    rec = F.col("tp").cast("double") / F.col("act_pos").cast("double")
    f1 = F.when(
        F.col("pred_pos") + F.col("act_pos") > 0,
        2.0
        * F.col("tp").cast("double")
        / (F.col("pred_pos") + F.col("act_pos")).cast("double"),
    ).otherwise(0.0)
    return j.select(
        "cls",
        "tp",
        "pred_pos",
        "act_pos",
        prec.alias("precision_"),
        rec.alias("recall_"),
        f1.alias("f1"),
    )


# ----------------------------------------------------------------------
# attribute_split_profile — dimension-attribute shredding: the part
# name "cold widget" is two positional attributes (modifier, noun);
# shred once map-side (try_element_at so a malformed single-token name
# degrades to NULL instead of failing the task) and profile the
# (noun × p_type) demand matrix with revenue — the conformance audit a
# warehouse runs before trusting a parsed attribute in a hierarchy. One
# broadcast dim join + one grouped aggregation.
# ----------------------------------------------------------------------

_ATTR_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_type,
         string_split(p_name, ' ')[1] AS modifier,
         string_split(p_name, ' ')[2] AS noun
  FROM part
)
SELECT p.noun, p.p_type,
       CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * 100 AS DECIMAL(38,0))) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN p ON l.l_partkey = p.p_partkey
GROUP BY p.noun, p.p_type
"""


@query("attribute_split_profile", _ATTR_ORACLE)
def attribute_split_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(noun × type) demand/revenue profile from the shredded part name."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sp = F.split(F.col("p_name"), " ")
    p = part.select(
        "p_partkey",
        "p_type",
        F.try_element_at(sp, F.lit(1)).alias("modifier"),
        F.try_element_at(sp, F.lit(2)).alias("noun"),
    )
    return (
        li.join(bcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("noun", "p_type")
        .agg(
            F.count_distinct("p_partkey").cast("bigint").alias("n_parts"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )
