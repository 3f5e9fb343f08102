"""Record-linkage + corpus-structure queries: blocked fuzzy entity
resolution, exact repeated-substring mining, and Markov event
transitions.

These extend the LLM-data-pipeline surface: repeated-substring mining is
the bounded form of exact substring dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better" — fixed-length shingles at a
stride instead of a distributed suffix array), blocked Levenshtein
matching is the canonical entity-resolution join the reference would run
as a reduce-side self-join (`datajoin/DataJoinReducerBase.java:35`
cross-product regime), and the transition matrix is the sessionized
sequence statistic behind behavioral corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table

# --- exact repeated substrings (shingle form of substring dedup) -------

_SHINGLE_LEN = 40
_SHINGLE_STRIDE = 10

_REPEATED_ORACLE = f"""
WITH shingles AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, GREATEST(length(text) - {_SHINGLE_LEN - 1}, 1), {_SHINGLE_STRIDE}),
           p -> substr(text, p, {_SHINGLE_LEN}))) AS sub
  FROM documents WHERE text IS NOT NULL
)
SELECT md5(sub) AS h, MIN(sub) AS sub,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM shingles
GROUP BY md5(sub)
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_occ DESC, h
LIMIT 100
"""


@query("repeated_substrings", _REPEATED_ORACLE)
def repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated {L}-char substrings at stride {S}: the
    shingle-hash approximation of suffix-array substring dedup. One map
    pass emits ~len/stride shingles per document; the only shuffle groups
    by the 128-bit shingle hash (uniform key, no skew); memorization-prone
    boilerplate surfaces as high n_occ. At 100 TB the shingle stream is
    bounded-fanout map output — exactly the shape of `wordcount` — and
    never materializes document pairs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    positions = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - F.lit(_SHINGLE_LEN - 1), F.lit(1)),
        F.lit(_SHINGLE_STRIDE),
    )
    shingles = docs.select(
        "doc_id",
        F.explode(
            F.transform(positions, lambda p: F.col("text").substr(p, F.lit(_SHINGLE_LEN)))
        ).alias("sub"),
    )
    return (
        shingles.groupBy(F.md5("sub").alias("h"))
        .agg(
            F.min("sub").alias("sub"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_occ"), "h")
        .limit(100)
    )


# --- blocked fuzzy entity resolution -----------------------------------

_FUZZY_ORACLE = """
WITH clean AS (
  SELECT p_partkey AS pk, p_name AS nm,
         substr(p_name, 1, 1) || substr(split_part(p_name, ' ', 2), 1, 1) AS blk
  FROM part
), dirty AS (
  SELECT p_partkey AS dk, replace(p_name, 'e', '') AS dn,
         substr(replace(p_name, 'e', ''), 1, 1)
           || substr(split_part(replace(p_name, 'e', ''), ' ', 2), 1, 1) AS blk
  FROM part WHERE p_partkey % 3 = 0
), cand AS (
  SELECT d.dk, d.dn, c.pk, c.nm,
         CAST(levenshtein(d.dn, c.nm) AS INTEGER) AS dist
  FROM dirty d JOIN clean c ON d.blk = c.blk
  WHERE levenshtein(d.dn, c.nm) <= 6
)
SELECT dk, dn, pk AS matched_pk, nm AS matched_name, dist
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY dk ORDER BY dist, pk) AS rn
  FROM cand
) WHERE rn = 1
"""


_FUZZY_K = 6  # levenshtein acceptance threshold
_FUZZY_BAND = _FUZZY_K + 1  # length-band width: lev<=k implies |dlen|<=k,
# so a match always lives in the probe's band or an adjacent one


@query("fuzzy_match_names", _FUZZY_ORACLE)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein entity resolution: a deterministically
    corrupted copy of part names (all 'e's dropped) is linked back to the
    clean catalog. Blocking key = first letter of each of the first two
    words PLUS a name-length band of width k+1: since lev(a,b) <= k
    implies |len(a)-len(b)| <= k, a dirty record only needs to probe its
    own band and the two adjacent ones — the candidate set is PROVABLY
    identical to letter-only blocking (the oracle still enumerates the
    unbanded candidates), but each block's pairwise volume drops by the
    number of occupied bands. Best match per dirty record via a per-key
    top-1 window ordered (dist, pk). ER candidate volume is inherently
    sum(|dirty_b| * |clean_b|); holding block sizes flat as the catalog
    grows is exactly this move — refine the key (letters x length band)
    until blocks are bounded, without losing a single true pair.

    The clean side is additionally CANONICALIZED before matching: exact
    duplicate names collapse to one row carrying their min partkey.
    Because duplicates of a name share its distance, the global
    (dist, pk) argmin is unchanged — but candidate volume becomes
    |dirty| x |distinct names per block| instead of |dirty| x |rows per
    block|, which is what keeps the scan linear when a catalog is full
    of repeated names (the x10 scale probe replicates every name
    verbatim: without canonicalization true near-matches inflate
    quadratically — x113 measured; with it the probe is linear)."""
    part = load_table(spark, sf_dir, "part")

    def blocked(name_col):
        return F.concat(
            name_col.substr(1, 1), F.split(name_col, " ").getItem(1).substr(1, 1)
        )

    clean = (
        part.groupBy(F.col("p_name").alias("nm"))
        .agg(F.min("p_partkey").alias("pk"))
        .select(
            "pk",
            "nm",
            blocked(F.col("nm")).alias("blk"),
            F.floor(F.length("nm") / _FUZZY_BAND).alias("band"),
        )
    )
    dn = F.replace(F.col("p_name"), F.lit("e"), F.lit(""))
    dirty = (
        part.filter(F.col("p_partkey") % 3 == 0)
        .select(
            F.col("p_partkey").alias("dk"),
            dn.alias("dn"),
            blocked(dn).alias("blk"),
            F.floor(F.length(dn) / _FUZZY_BAND).alias("b0"),
        )
        .select(
            "dk",
            "dn",
            "blk",
            F.explode(
                F.array(F.col("b0") - 1, F.col("b0"), F.col("b0") + 1)
            ).alias("band"),
        )
    )
    cand = (
        dirty.join(clean, ["blk", "band"])
        .withColumn("dist", F.levenshtein("dn", "nm"))
        .filter(F.col("dist") <= _FUZZY_K)
    )
    w = Window.partitionBy("dk").orderBy("dist", "pk")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dk", "dn", F.col("pk").alias("matched_pk"), F.col("nm").alias("matched_name"), "dist"
        )
    )


# --- Markov event transitions ------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM pairs
"""


@query("event_transitions", _TRANSITIONS_ORACLE)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov counts +
    row-normalized probabilities). One window pass keyed by user (the
    sessionization partitioning that already exists at 100 TB), one
    aggregation over the tiny (type x type) key space; the probability is
    a single IEEE division of two exact BIGINTs — bit-identical on any
    partitioning."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp).cast("double")).alias("p"),
    )
