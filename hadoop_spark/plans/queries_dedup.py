"""Deduplication queries (SURVEY §7 M9): exact, MinHash+LSH, SimHash,
n-gram-Jaccard — each oracle-checked against the identical pipeline in
DuckDB (possible because every hash is the portable md5-derived 60-bit int
and every similarity is exact integer arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64, portable_hash64_sql
from hadoop_spark.functions.text import fingerprint, fingerprint_sql
from hadoop_spark.operators.dedup import (
    connected_components,
    BANDS,
    ROWS_PER_BAND,
    jaccard,
    jaccard_sql,
    lsh_band_pairs,
    minhash_signature,
    minhash_signature_sql,
    shingle_hashes,
    shingle_hashes_sql,
    simhash32,
    simhash32_sql,
    simhash_pairs,
    token_hashes,
    tokens,
    tokens_sql,
    trigram_shingles,
    trigram_shingles_sql,
)
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

# Shared CTE prefix: tokens → non-empty distinct trigram shingle sets.
_SHINGLE_CTE = f"""
toks AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
sh AS (
  SELECT doc_id, {trigram_shingles_sql('toks')} AS sh
  FROM toks WHERE len(toks) >= 3
),
sh2 AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0)
"""

_EXACT_ORACLE = f"""
SELECT {fingerprint_sql('text')} AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) - 1 AS n_dups
FROM documents
GROUP BY 1
"""


@query("dedup_exact", _EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint, keep
    the smallest doc_id per group. One shuffle on a 60-bit hash key —
    uniform, skew-free at any scale; survivors never collect to driver."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            (F.count(F.lit(1)) - 1).alias("n_dups"),
        )
    )


_BAND_CONCAT = " || ',' || ".join(
    f"CAST(sig[band*{ROWS_PER_BAND}+{r + 1}] AS VARCHAR)" for r in range(ROWS_PER_BAND)
)

_MINHASH_ORACLE = f"""
WITH {_SHINGLE_CTE},
sigs AS (
  SELECT doc_id, {minhash_signature_sql('hv')} AS sig
  FROM (SELECT doc_id, {shingle_hashes_sql('sh')} AS hv FROM sh2)
),
bands AS (
  SELECT doc_id, band,
         CAST('0x' || substr(md5(
           {_BAND_CONCAT}
         ), 1, 15) AS BIGINT) AS bh
  FROM sigs, (SELECT unnest(range(0, {BANDS})) AS band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, {jaccard_sql('sa.sh', 'sb.sh')} AS jaccard
FROM cand
JOIN sh2 sa ON cand.id_a = sa.doc_id
JOIN sh2 sb ON cand.id_b = sb.doc_id
WHERE {jaccard_sql('sa.sh', 'sb.sh')} >= 0.8
"""


@query("dedup_minhash", _MINHASH_ORACLE)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs, exactly verified: shingle → 12-hash
    signature (map-side) → 4-band LSH bucket self-join (shuffle keyed on a
    hash — uniform) → exact Jaccard ≥ 0.8 on the surviving candidates.
    At 100 TB the band join touches O(n·4) rows, never O(n²)."""
    docs = fanout_small(load_table(spark, sf_dir, "documents"))
    # One shared materialization carries BOTH the shingle sets (for exact
    # Jaccard verification) and their base hashes (so the md5 pass runs
    # once, not once per minhash permutation — see operators/dedup.py).
    sh = shared(
        docs.select("doc_id", trigram_shingles(tokens(F.col("text"))).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("hv", shingle_hashes(F.col("sh")))
    )
    sigs = sh.select("doc_id", minhash_signature(F.col("hv")).alias("sig"))
    cand = lsh_band_pairs(sigs, "doc_id", "sig")
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
    )


_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
),
sims AS (
  SELECT doc_id, {simhash32_sql('toks')} AS simhash
  FROM toks WHERE len(toks) > 0
),
bands AS (
  SELECT doc_id, simhash, band, (simhash >> (8 * band)) & 255 AS byte
  FROM sims, (SELECT unnest(range(0, 4)) AS band)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@query("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit majority-vote fingerprint (map-side),
    byte-band blocking self-join (hamming ≤ 3 ⇒ ≥1 equal byte by
    pigeonhole), exact hamming via bit_count(xor)."""
    docs = fanout_small(load_table(spark, sf_dir, "documents"))
    sims = shared(
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", token_hashes(F.col("toks")).alias("th"))
        .select("doc_id", simhash32(F.col("th")).alias("simhash"))
    )
    return simhash_pairs(sims, "doc_id", "simhash", max_hamming=3)


_NGRAM_ORACLE = f"""
WITH {_SHINGLE_CTE},
posts AS (SELECT doc_id, unnest(sh) AS s FROM sh2),
pair_inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(sh) AS sz FROM sh2)
SELECT id_a, id_b,
       CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
FROM pair_inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8
"""


@query("dedup_ngram_jaccard", _NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard dedup via inverted index (posting lists): explode
    shingles, self-join on shingle, count per pair = intersection size, then
    jaccard from set sizes. The scalable classic: join input is the posting
    list, proportional to total shingle occurrences — not O(n²). Trigram
    shingles keep posting lists short (near-unique); for skewed/common
    shingles the production guard is a posting-length cap (df-style stopword
    drop), omitted here to keep the oracle exact."""
    docs = fanout_small(load_table(spark, sf_dir, "documents"))
    sh = shared(
        docs.select("doc_id", trigram_shingles(tokens(F.col("text"))).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    posts = sh.select("doc_id", F.explode("sh").alias("s"))
    pair_inter = (
        posts.alias("a")
        .join(
            posts.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.select("doc_id", F.size("sh").alias("sz"))
    return (
        pair_inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
    )


_EMB_CTE = f"""
e AS (
  SELECT vec_id, {quantize_sql('embedding')} AS q FROM embeddings
),
en AS (
  SELECT vec_id, q, {int_dot_sql('q', 'q')} AS n2 FROM e
)
"""

_EMB_DEDUP_ORACLE = f"""
WITH {_EMB_CTE}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {cos_q_sql(int_dot_sql('a.q', 'b.q'), 'a.n2', 'b.n2')} AS cos_q
FROM en a JOIN en b ON a.vec_id < b.vec_id
WHERE {cos_q_sql(int_dot_sql('a.q', 'b.q'), 'a.n2', 'b.n2')} >= 400000
"""


@query("dedup_embedding", _EMB_DEDUP_ORACLE)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (quantized-integer arithmetic — see
    operators/similarity.py). Brute-force O(n²) pair join is the exact
    baseline; the 100 TB path blocks candidates first (IVF cells /
    sign-LSH buckets, see ann_ivf_topk) and verifies with this same exact
    cosine. Threshold 0.4 matches this synthetic table's near-dup band."""
    from hadoop_spark.operators.similarity import block_near_dup_pairs

    emb = shared(with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings"))))
    return block_near_dup_pairs(emb, threshold_micro=400000, num_blocks=8)


_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_SHINGLE_CTE},
sigs AS (
  SELECT doc_id, {minhash_signature_sql('hv')} AS sig
  FROM (SELECT doc_id, {shingle_hashes_sql('sh')} AS hv FROM sh2)
),
bands AS (
  SELECT doc_id, band,
         CAST('0x' || substr(md5(
           {_BAND_CONCAT}
         ), 1, 15) AS BIGINT) AS bh
  FROM sigs, (SELECT unnest(range(0, {BANDS})) AS band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT id_a, id_b
  FROM cand
  JOIN sh2 sa ON cand.id_a = sa.doc_id
  JOIN sh2 sb ON cand.id_b = sb.doc_id
  WHERE {jaccard_sql('sa.sh', 'sb.sh')} >= 0.8
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(n, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
)
SELECT n AS doc_id, MIN(m) AS canonical FROM reach GROUP BY n
"""


@query("dedup_components", _COMPONENTS_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: minhash-LSH verified pairs → connected components
    → (doc_id, canonical) mapping (smallest reachable id wins). This is the
    step after pair detection in a real dedup pipeline: transitive closure
    so A~B, B~C collapse to ONE canonical doc even when A~C was never a
    candidate pair. Oracle: recursive-CTE reachability in DuckDB."""
    pairs = dedup_minhash(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("canonical"))


_KEEP_BEST_ORACLE = _COMPONENTS_ORACLE.replace(
    "SELECT n AS doc_id, MIN(m) AS canonical FROM reach GROUP BY n",
    """, comp AS (SELECT n AS doc_id, MIN(m) AS canonical FROM reach GROUP BY n)
SELECT canonical AS cluster_id, doc_id AS keep_id, n_chars AS keep_chars,
       cluster_size
FROM (
  SELECT c.canonical, d.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.canonical
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.canonical) AS cluster_size
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
) ranked_docs
WHERE rn = 1""",
)


@query("dedup_keep_best", _KEEP_BEST_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each duplicate cluster
    (connected components over verified near-dup pairs), KEEP the longest
    document (ties → smallest doc_id) instead of the arbitrary min-id —
    what a real training-data pipeline does so dedup never discards the
    richest copy. One window over the tiny (doc_id, cluster) mapping
    joined to per-doc metadata; the heavy lifting stayed in the LSH
    pair-generation."""
    from hadoop_spark.operators.dedup import connected_components

    pairs = dedup_minhash(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("canonical")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = comp.join(docs, "doc_id")
    w = Window.partitionBy("canonical").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("canonical")))
        .filter(F.col("rn") == 1)
        .select(
            F.col("canonical").alias("cluster_id"),
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
            "cluster_size",
        )
    )


# ----------------------------------------------------------------------
# lsh_candidate_quality — the dedup analog of ann_recall: measure the LSH
# band-join's candidate quality against EXACT all-pairs ground truth
# (jaccard >= 0.8) on a bounded evaluation sample. Recall tells you
# whether the band/row split misses true duplicates; precision tells you
# how much exact-verification work the banding wastes. The all-pairs
# ground truth is O(sample^2) BY DESIGN — it runs on the capped sample
# (doc_id < 1000), never the corpus; production uses these measured
# numbers to size BANDS x ROWS_PER_BAND, then runs only the banded path.
# ----------------------------------------------------------------------

_EVAL_CAP = 1000  # evaluation sample: doc_id < 1000

_LSH_QUALITY_ORACLE = f"""
WITH {_SHINGLE_CTE},
sh3 AS (SELECT doc_id, sh FROM sh2 WHERE doc_id < {_EVAL_CAP}),
truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
  WHERE {jaccard_sql('a.sh', 'b.sh')} >= 0.8
),
sigs AS (
  SELECT doc_id, {minhash_signature_sql('hv')} AS sig
  FROM (SELECT doc_id, {shingle_hashes_sql('sh')} AS hv FROM sh3)
),
bands AS (
  SELECT doc_id, band,
         CAST('0x' || substr(md5(
           {_BAND_CONCAT}
         ), 1, 15) AS BIGINT) AS bh
  FROM sigs, (SELECT unnest(range(0, {BANDS})) AS band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
hits AS (
  SELECT c.id_a, c.id_b FROM cand c JOIN truth t
    ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_hits,
       CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
            ELSE CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE) END AS recall,
       CASE WHEN (SELECT COUNT(*) FROM cand) = 0 THEN NULL
            ELSE CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) END AS precision
"""


@query("lsh_candidate_quality", _LSH_QUALITY_ORACLE)
def lsh_candidate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding recall/precision vs exact ground truth on the sample."""
    docs = fanout_small(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < _EVAL_CAP
    )
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 3
    )
    sh = shared(
        toks.select(
            "doc_id", trigram_shingles(F.col("toks")).alias("sh")
        ).filter(F.size("sh") > 0)
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    truth = shared(
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.8)
        .select("id_a", "id_b")
    )
    sigs = sh.select(
        "doc_id", minhash_signature(shingle_hashes(F.col("sh"))).alias("sig")
    )
    cand = shared(lsh_band_pairs(sigs))
    hits = cand.join(truth, ["id_a", "id_b"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    j = nt.crossJoin(nc).crossJoin(nh)
    # r10 audit: raw IEEE recall/precision of exact int64 counts.
    recall = F.when(
        F.col("n_truth") > 0,
        F.col("n_hits").cast("double") / F.col("n_truth").cast("double"),
    )
    precision = F.when(
        F.col("n_candidates") > 0,
        F.col("n_hits").cast("double") / F.col("n_candidates").cast("double"),
    )
    return j.select(
        "n_truth",
        "n_candidates",
        "n_hits",
        recall.alias("recall"),
        precision.alias("precision"),
    )


# ----------------------------------------------------------------------
# source_overlap — cross-source duplication matrix: for every pair of
# sources, how many document pairs share OPENING BOILERPLATE (the same
# first-8-token prefix — the weak key that actually collides across
# mirrors and template farms) (who is
# mirroring whom — the first question a corpus curation run asks after
# `dedup_exact` reports a high dup rate). Docs collapse to per-
# (fingerprint, source) counts first, so the pair expansion runs on
# fingerprint groups (distinct sources per group ≤ |sources|, a model
# constant) — cross-source pair counts are exact products of BIGINTs,
# and nothing data-sized is ever joined against itself.
# ----------------------------------------------------------------------

_OVL_PFX = 8  # opening-boilerplate key: first 8 normalized tokens

_SRC_OVERLAP_ORACLE = f"""
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
fps AS (
  SELECT {portable_hash64_sql(f"array_to_string(w[1:{_OVL_PFX}], ' ')")} AS fp,
         source, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE len(w) >= {_OVL_PFX}
  GROUP BY 1, 2
)
SELECT a.source AS src1, b.source AS src2,
       CAST(COUNT(*) AS BIGINT) AS n_shared_fps,
       CAST(SUM(a.c * b.c) AS BIGINT) AS n_dup_pairs
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
"""


@query("source_overlap", _SRC_OVERLAP_ORACLE)
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "source",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w"),
    ).filter(F.size("w") >= _OVL_PFX)
    fps = toks.select(
        portable_hash64(
            F.concat_ws(" ", F.slice("w", 1, _OVL_PFX))
        ).alias("fp"),
        "source",
    ).groupBy("fp", "source").agg(F.count(F.lit(1)).alias("c"))
    a = fps.select("fp", F.col("source").alias("src1"), F.col("c").alias("c1"))
    b = fps.select("fp", F.col("source").alias("src2"), F.col("c").alias("c2"))
    return (
        a.join(b, "fp")
        .filter(F.col("src1") < F.col("src2"))
        .groupBy("src1", "src2")
        .agg(
            F.count(F.lit(1)).alias("n_shared_fps"),
            F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("n_dup_pairs"),
        )
    )


# ----------------------------------------------------------------------
# dedup_containment — ASYMMETRIC near-dup: containment(A→B) =
# |A∩B| / |A| over trigram shingle sets. Symmetric Jaccard misses the
# quote/inclusion case (a short doc embedded verbatim inside a long
# one barely moves the union); containment is the measure excerpt
# detection actually needs. Same inverted-index spine as
# `dedup_ngram_jaccard` — posting-list self-join — but each ordered
# pair divides by ITS OWN set size, so one intersection count serves
# both directions; and unlike the deliberately-uncapped jaccard query,
# the production df cap (stopword-shingle drop) is INSIDE the verified
# contract here, bounding every posting list and hence the pair fan-out
# at any corpus scale. Containment is measured over sub-cap shingles;
# threshold 0.5: at least half the smaller doc's rare shingles appear
# in the other.
# ----------------------------------------------------------------------

_CONTAIN_DF_CAP = 50  # stopword-shingle drop: the production posting-list
# cap that bounds the self-join fan-out (pairs only counted over shingles
# rarer than the cap) — mirrored EXACTLY in the oracle, so unlike the
# uncapped `dedup_ngram_jaccard` this is the scale-guarded variant with the
# guard inside the verified contract.

_CONTAIN_ORACLE = f"""
WITH {_SHINGLE_CTE},
posts0 AS (SELECT doc_id, unnest(sh) AS s FROM sh2),
df AS (SELECT s, COUNT(*) AS df FROM posts0 GROUP BY s),
posts AS (
  SELECT p.doc_id, p.s FROM posts0 p JOIN df ON p.s = df.s
  WHERE df.df <= {_CONTAIN_DF_CAP}
),
pair_inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(sh) AS sz FROM sh2),
scored AS (
  SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b
  FROM pair_inter
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
)
SELECT id_a, id_b,
       CAST(inter AS BIGINT) AS inter,
       (CAST(inter AS DOUBLE) / CAST(sz_a AS DOUBLE)) AS contain_a,
       (CAST(inter AS DOUBLE) / CAST(sz_b AS DOUBLE)) AS contain_b
FROM scored
WHERE CAST(inter AS DOUBLE) / CAST(LEAST(sz_a, sz_b) AS DOUBLE) >= 0.5
"""


@query("dedup_containment", _CONTAIN_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout_small(load_table(spark, sf_dir, "documents"))
    sh = shared(
        docs.select("doc_id", trigram_shingles(tokens(F.col("text"))).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    posts0 = shared(sh.select("doc_id", F.explode("sh").alias("s")))
    df = posts0.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    posts = posts0.join(
        df.filter(F.col("df") <= _CONTAIN_DF_CAP).select("s"), "s"
    )
    pair_inter = (
        posts.alias("a")
        .join(
            posts.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.select("doc_id", F.size("sh").alias("sz"))
    scored = (
        pair_inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
    )
    return scored.filter(
        F.col("inter").cast("double")
        / F.least(F.col("sz_a"), F.col("sz_b")).cast("double")
        >= 0.5
    ).select(
        "id_a",
        "id_b",
        F.col("inter").cast("bigint").alias("inter"),
        (F.col("inter").cast("double") / F.col("sz_a").cast("double")).alias(
            "contain_a"
        ),
        (F.col("inter").cast("double") / F.col("sz_b").cast("double")).alias(
            "contain_b"
        ),
    )


# ----------------------------------------------------------------------
# duplication_profile — corpus-health dashboard row per source: document
# count, distinct normalized fingerprints, and the duplicate share
# 1 − unique/total. The first number a data-curation pass reports before
# any dedup runs; at 100 TB it is one partial-aggregated distinct per
# source over the 60-bit normalized fingerprint (`functions/text.py`) —
# no text ever shuffles, only hashes.
# ----------------------------------------------------------------------

_DUP_PROFILE_ORACLE = f"""
WITH fp AS (
  SELECT source, {fingerprint_sql("text")} AS f
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT f) AS BIGINT) AS n_unique,
       CAST(1 AS DOUBLE)
         - CAST(COUNT(DISTINCT f) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS dup_share
FROM fp GROUP BY source
"""


@query("duplication_profile", _DUP_PROFILE_ORACLE)
def duplication_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("source", fingerprint(F.col("text")).alias("f"))
    agg = fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("f").cast("bigint").alias("n_unique"),
    )
    # r10 audit: raw IEEE dup share of exact int64 counts.
    share = F.lit(1).cast("double") - F.col("n_unique").cast(
        "double"
    ) / F.col("n_docs").cast("double")
    return agg.select("source", "n_docs", "n_unique", share.alias("dup_share"))


# ----------------------------------------------------------------------
# semantic_keep_best — the SEMANTIC twin of `dedup_keep_best`: duplicate
# clusters come from embedding-cosine near-dup pairs (blocked-GEMM exact
# pairs, `operators/similarity.block_near_dup_pairs`) instead of MinHash
# text shingles, then the same transitive closure + quality-ranked
# canonical selection (longest document wins, ties to smallest id). This
# is the dedup a multilingual / paraphrase-heavy corpus needs — text
# fingerprints miss meaning-level duplicates that embeddings catch. The
# scale shape is unchanged: blocked candidate generation, label
# propagation over pair-sized edges, one window over the tiny mapping.
# ----------------------------------------------------------------------

_SEM_KEEP_ORACLE = f"""
WITH RECURSIVE {_EMB_CTE},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM en a JOIN en b ON a.vec_id < b.vec_id
  WHERE {cos_q_sql(int_dot_sql('a.q', 'b.q'), 'a.n2', 'b.n2')} >= 400000
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(n, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
comp AS (SELECT n AS doc_id, MIN(m) AS canonical FROM reach GROUP BY n)
SELECT canonical AS cluster_id, doc_id AS keep_id, n_chars AS keep_chars,
       cluster_size
FROM (
  SELECT c.canonical, d.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.canonical
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.canonical) AS cluster_size
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
) ranked_docs
WHERE rn = 1
"""


@query("semantic_keep_best", _SEM_KEEP_ORACLE)
def semantic_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from hadoop_spark.operators.similarity import block_near_dup_pairs

    emb = shared(
        with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings")))
    )
    pairs = block_near_dup_pairs(emb, threshold_micro=400000, num_blocks=8)
    comp = connected_components(pairs, "id_a", "id_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    members = comp.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("canonical")
    ).join(docs, "doc_id")
    w = W.partitionBy("canonical").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        members.select(
            "canonical",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy("canonical")).alias("cluster_size"),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("canonical").alias("cluster_id"),
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
            "cluster_size",
        )
    )


# ----------------------------------------------------------------------
# dedup_prefix — prefix-fingerprint duplicate families: documents whose
# first 20 tokens agree are one family (the news-wire / mirror-site
# pattern where bodies match but trailing boilerplate differs, which
# whole-text fingerprints miss). Map-side: slice, normalize, 60-bit
# hash; one partial-aggregated shuffle on the prefix hash; families of
# size ≥ 2 report their size and representative (smallest doc_id). No
# text shuffles — only hashes, the same property the exact/paragraph
# dedup stages hold at 100 TB.
# ----------------------------------------------------------------------

_PREFIX_TOKENS = 20

_PREFIX_DEDUP_ORACLE = f"""
WITH pre AS (
  SELECT doc_id,
         {fingerprint_sql(
             f"array_to_string(string_split(text, ' ')[1:{_PREFIX_TOKENS}], ' ')"
         )} AS pf
  FROM documents
)
SELECT pf AS prefix_hash,
       CAST(COUNT(*) AS BIGINT) AS family_size,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM pre
GROUP BY pf
HAVING COUNT(*) >= 2
"""


@query("dedup_prefix", _PREFIX_DEDUP_ORACLE)
def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.array_join(
        F.slice(F.split("text", " "), 1, _PREFIX_TOKENS), " "
    )
    pre = docs.select("doc_id", fingerprint(prefix).alias("pf"))
    return (
        pre.groupBy(F.col("pf").alias("prefix_hash"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("family_size"),
            F.min("doc_id").cast("bigint").alias("keep_id"),
        )
        .filter(F.col("family_size") >= 2)
    )


# ----------------------------------------------------------------------
# shingle_sensitivity — parameter sweep for the dedup pipeline: corpus
# shingle-duplication share at k = 2..5, the number that tells you which
# shingle size separates boilerplate from content BEFORE you commit a
# MinHash configuration (small k saturates — near-100% duplication —
# while large k under-blocks). One corpus scan fans out all four
# parameterizations (the `predicate_sweep` pattern applied to dedup):
# explode k, emit 60-bit shingle hashes map-side, and aggregate
# (instances, distinct) per k. Only hashes shuffle, never text.
# ----------------------------------------------------------------------

_SHINGLE_KS = [2, 3, 4, 5]


def _shingle_sens_oracle() -> str:
    ks = ", ".join(str(k) for k in _SHINGLE_KS)
    h = portable_hash64_sql("g", salt="#ss")
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT k.k,
         unnest([array_to_string(d.w[i:i+k.k-1], ' ')
                 for i in range(1, len(d.w) - k.k + 2)]) AS g
  FROM d, (SELECT unnest([{ks}]) AS k) k
  WHERE len(d.w) >= k.k
),
hashed AS (SELECT k, {h} AS hv FROM sh)
SELECT CAST(k AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(DISTINCT hv) AS BIGINT) AS n_distinct,
       CAST(1 AS DOUBLE)
         - CAST(COUNT(DISTINCT hv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS dup_share
FROM hashed GROUP BY k
"""


@query("shingle_sensitivity", _shingle_sens_oracle())
def shingle_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 opt (guide §2.5): the 4-way k-explode + per-shingle md5 is the
    # heavy map phase before the only shuffle — spread the under-split scan
    # (no-op at real scale). Measured sf0.1: 2.9 s -> 1.9 s.
    docs = fanout_small(load_table(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    d = docs.select("doc_id", w.alias("w")).select(
        "doc_id",
        "w",
        F.explode(
            F.array(*[F.lit(k) for k in _SHINGLE_KS])
        ).alias("k"),
    ).filter(F.size("w") >= F.col("k"))
    grams = d.select(
        "k",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - F.col("k") + 1),
                lambda i: F.array_join(F.slice(F.col("w"), i, F.col("k")), " "),
            )
        ).alias("g"),
    )
    hashed = grams.select("k", portable_hash64(F.col("g"), salt="#ss").alias("hv"))
    agg = hashed.groupBy(F.col("k").cast("bigint").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.countDistinct("hv").cast("bigint").alias("n_distinct"),
    )
    # r10 audit: raw IEEE dup share of exact int64 counts.
    share = F.lit(1).cast("double") - F.col("n_distinct").cast(
        "double"
    ) / F.col("n_shingles").cast("double")
    return agg.select("k", "n_shingles", "n_distinct", share.alias("dup_share"))


# ----------------------------------------------------------------------
# survivorship_golden_record — the MDM "golden record" stage that follows
# clustering in an entity-resolution pipeline: within each duplicate
# family, merge FIELD-LEVEL values by survivorship rules instead of
# keeping one whole row (`dedup_keep_best` keeps a row; this synthesizes
# one). Families are the 8-token prefix fingerprints of `dedup_prefix`;
# rules: representative id = MIN(doc_id), length = MAX(n_chars),
# source/lang = MODE with deterministic ties (higher count wins, then
# lexicographic min — the reference's secondary-sort tie discipline).
# Scale shape: two grouped aggregations plus a per-family window over the
# (family × value) counts — all partial-aggregated; the mode candidates
# per family are bounded by the value domain, never by the corpus.
# ----------------------------------------------------------------------

_SURV_ORACLE = r"""
WITH fam AS (
  SELECT doc_id, source, lang, n_chars,
         md5(array_to_string(
           list_filter(string_split_regex(lower(text), '\s+'),
                       w -> w <> '')[1:8], ' ')) AS fp
  FROM documents WHERE text IS NOT NULL
), src_counts AS (
  SELECT fp, source AS v, COUNT(*) AS c FROM fam GROUP BY fp, source
), src_mode AS (
  SELECT fp, v AS best_source FROM (
    SELECT fp, v, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY c DESC, v) AS rn
    FROM src_counts) WHERE rn = 1
), lang_counts AS (
  SELECT fp, lang AS v, COUNT(*) AS c FROM fam GROUP BY fp, lang
), lang_mode AS (
  SELECT fp, v AS best_lang FROM (
    SELECT fp, v, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY c DESC, v) AS rn
    FROM lang_counts) WHERE rn = 1
), base AS (
  SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
         CAST(MAX(n_chars) AS BIGINT) AS best_n_chars,
         CAST(COUNT(*) AS BIGINT) AS n_members
  FROM fam GROUP BY fp
)
SELECT b.fp, b.rep_doc_id, b.best_n_chars, b.n_members,
       s.best_source, l.best_lang
FROM base b JOIN src_mode s ON b.fp = s.fp JOIN lang_mode l ON b.fp = l.fp
WHERE b.n_members > 1
"""


@query("survivorship_golden_record", _SURV_ORACLE)
def survivorship_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level survivorship merge over prefix-fingerprint families."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    fam = shared(
        fanout_small(docs).select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            F.md5(F.concat_ws(" ", F.slice(toks, 1, 8))).alias("fp"),
        )
    )

    def mode_of(col: str, out: str) -> DataFrame:
        counts = fam.groupBy("fp", F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("fp").orderBy(F.col("c").desc(), "v")
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("fp", F.col("v").alias(out))
        )

    base = fam.groupBy("fp").agg(
        F.min("doc_id").cast("bigint").alias("rep_doc_id"),
        F.max("n_chars").cast("bigint").alias("best_n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )
    return (
        base.filter(F.col("n_members") > 1)
        .join(mode_of("source", "best_source"), "fp")
        .join(mode_of("lang", "best_lang"), "fp")
        .select(
            "fp", "rep_doc_id", "best_n_chars", "n_members",
            "best_source", "best_lang",
        )
    )


# ----------------------------------------------------------------------
# dbscan_core_flags — the density-classification stage of DBSCAN over
# the embedding corpus: a vector is CORE when it has >= minPts neighbors
# at cosine >= eps, BORDER when non-core but adjacent to a core vector,
# NOISE otherwise. Built on the same blocked-GEMM pair stream as
# `dedup_embedding` (`operators/similarity.block_near_dup_pairs` —
# exact integer-quantized cosine, (NB+1 choose 2) block pairs, no O(n²)
# row set in the plan); the classification itself is two grouped
# aggregations and one equi-join of the pair stream against the core
# flags. Reported per ground-truth label so the density structure is
# auditable. eps=0.30/minPts=4 chosen to populate all three classes on
# the fixture.
# ----------------------------------------------------------------------

_DBSCAN_T = 300_000  # cosine eps in micro-units
_DBSCAN_MINPTS = 4

_DBSCAN_ORACLE = f"""
WITH {_EMB_CTE},
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM en a JOIN en b ON a.vec_id <> b.vec_id
  WHERE {cos_q_sql(int_dot_sql('a.q', 'b.q'), 'a.n2', 'b.n2')} >= {_DBSCAN_T}
), deg AS (
  SELECT va AS vec_id, COUNT(*) AS nnb FROM pairs GROUP BY va
), core AS (
  SELECT vec_id FROM deg WHERE nnb >= {_DBSCAN_MINPTS}
), border AS (
  SELECT DISTINCT p.va AS vec_id
  FROM pairs p JOIN core c ON p.vb = c.vec_id
  WHERE p.va NOT IN (SELECT vec_id FROM core)
), cls AS (
  SELECT e.vec_id, emb.label,
         CASE WHEN e.vec_id IN (SELECT vec_id FROM core) THEN 'core'
              WHEN e.vec_id IN (SELECT vec_id FROM border) THEN 'border'
              ELSE 'noise' END AS dbscan_class
  FROM en e JOIN embeddings emb ON e.vec_id = emb.vec_id
)
SELECT label, dbscan_class, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM cls GROUP BY label, dbscan_class
"""


@query("dbscan_core_flags", _DBSCAN_ORACLE)
def dbscan_core_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core/border/noise classification per label (blocked GEMM)."""
    from hadoop_spark.operators.similarity import block_near_dup_pairs

    # BOTH persists are scale-load-bearing — measured at ×30 data in one
    # controlled session: both=156 s, pairs-only=421 s, none=361 s (the
    # GEMM cogroup feeds deg on id_a and the border probe on id_b — two
    # DIFFERENT exchanges AQE's stage cache cannot dedupe, so without the
    # persists the dominant GEMM re-runs). At sf0.1 dropping them LOOKS
    # ~0.8 s faster (cache barrier > tiny GEMM) — that bench-scale signal
    # is the trap; do not flip this on sub-GEMM-scale timings.
    emb = shared(
        with_quantized(fanout_small(load_table(spark, sf_dir, "embeddings")))
    )
    # `half` is ALSO persisted (r10): the symmetrizing union below consumes
    # it twice, so materializing `pairs` otherwise runs the GEMM cogroup
    # twice inside that one job (same knn_graph finding — the stage cache
    # dedupes exchanges, not the Python cogroup). GEMM executions 2 → 1;
    # balanced A/B (cur/half/both × ABBA): warm mins 5.94/5.26/4.70 s,
    # results identical.
    half = shared(
        block_near_dup_pairs(
            emb, threshold_micro=_DBSCAN_T, num_blocks=8
        ).select("id_a", "id_b")
    )
    pairs = shared(
        half.unionByName(
            half.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
    )
    deg = pairs.groupBy(F.col("id_a").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("nnb")
    )
    core = deg.filter(F.col("nnb") >= _DBSCAN_MINPTS).select("vec_id")
    border = (
        pairs.join(core.withColumnRenamed("vec_id", "id_b"), "id_b")
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .join(core, "vec_id", "left_anti")
    )
    cls = (
        emb.select("vec_id", "label")
        .join(core.withColumn("is_core", F.lit(1)), "vec_id", "left")
        .join(border.withColumn("is_border", F.lit(1)), "vec_id", "left")
        .select(
            "label",
            F.when(F.col("is_core") == 1, "core")
            .when(F.col("is_border") == 1, "border")
            .otherwise("noise")
            .alias("dbscan_class"),
        )
    )
    return cls.groupBy("label", "dbscan_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
