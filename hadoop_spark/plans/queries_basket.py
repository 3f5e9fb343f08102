"""Market-basket and behavioral analytics: a-priori association rules,
marketing attribution, Benford forensic digit analysis, the co-purchase
graph degree profile, bounded-round label-propagation communities, and
temperature-weighted source mixing.

Frequent-itemset mining is the canonical MapReduce workload after
wordcount (the reference ships the two-job pattern as chained
`Mapper`/`Reducer` stages — `examples/AggregateWordCount.java:38` is the
same count-prune-recount skeleton); attribution and Benford are the
reporting queries a warehouse user runs daily; temperature mixing is the
standard LM corpus-balancing step. All are pure DataFrame plans: pair
expansion is a-priori pruned and generated map-side from basket arrays
(the 100 TB survival trick), attribution is one window pass, Benford one
group-by, mixing one broadcast of a dimension-sized rate table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_spark.operators.graph import loop_width
from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table, shared

# --- a-priori association rules ----------------------------------------

_MINSUP_ITEM = 20  # an item must appear in >= this many baskets
_MINSUP_PAIR = 2  # a pair must co-occur in >= this many baskets
_MAX_BASKET = 16  # mega-basket cap: bounds the per-basket pair fan-out

_ASSOC_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), sized AS (
  SELECT ok, pk FROM (
    SELECT ok, pk, COUNT(*) OVER (PARTITION BY ok) AS bsz FROM items
  ) WHERE bsz <= {_MAX_BASKET}
), item_n AS (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM sized GROUP BY pk
), freq AS (
  SELECT pk, n FROM item_n WHERE n >= {_MINSUP_ITEM}
), fitems AS (
  SELECT s.ok, s.pk FROM sized s JOIN freq f ON s.pk = f.pk
), pair_n AS (
  SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS pair_n
  FROM fitems a JOIN fitems b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
  HAVING COUNT(*) >= {_MINSUP_PAIR}
), total AS (
  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS nb FROM sized
)
SELECT p1, p2, pair_n, f1.n AS n1, f2.n AS n2,
       CAST(pair_n AS DOUBLE) / CAST(f1.n AS DOUBLE) AS confidence,
       (CAST(pair_n AS DOUBLE) * CAST(t.nb AS DOUBLE))
         / (CAST(f1.n AS DOUBLE) * CAST(f2.n AS DOUBLE)) AS lift
FROM pair_n JOIN freq f1 ON p1 = f1.pk JOIN freq f2 ON p2 = f2.pk
CROSS JOIN total t
"""


@query("assoc_rules", _ASSOC_ORACLE)
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent-pair association rules over order baskets:
    support, confidence P(p2|p1), and lift. Two scale disciplines: the
    a-priori prune drops infrequent items BEFORE any pair is formed (and
    mega-baskets >{cap} items are excluded), and pairs are generated
    MAP-SIDE from per-basket sorted arrays (the MapReduce "pairs"
    pattern) rather than a fact-fact self-join — per-basket fan-out is
    bounded by cap^2 and pair tuples flow straight into the count's
    partial aggregation. The frequent-item set and per-item counts are
    dimension-sized and broadcast; the big shuffles are the basket-key
    distinct, the basket regroup, and the pair-key count — all uniform
    hash keys. Confidence and lift are single IEEE divisions of exact
    BIGINT counts, bit-identical on any partitioning. Reference parity:
    the two-job count → prune → recount chain of
    `examples/AggregateWordCount.java:38` /
    `lib/aggregate/ValueAggregatorJob.java:67`."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    sized = shared(
        items.withColumn("bsz", F.count(F.lit(1)).over(Window.partitionBy("ok")))
        .filter(F.col("bsz") <= _MAX_BASKET)
        .drop("bsz")
    )
    item_n = sized.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    # freq feeds three branches (the prune + both rule-closing sides):
    # persist so the item-count aggregation runs once
    freq = shared(item_n.filter(F.col("n") >= _MINSUP_ITEM))
    # freq = items with absolute support ≥ _MINSUP_ITEM — at a FIXED minsup
    # this approaches the whole part dimension as the corpus grows (TPC-H
    # part is SF-scaled), so the semi-join hint must degrade above the cap
    fitems = sized.join(bcast_if_small(freq.select("pk")), "pk").select("ok", "pk")
    # Pairs are generated MAP-SIDE from per-basket sorted arrays — the
    # MapReduce "pairs" pattern — not via a fact-fact self-join: the
    # basket regroup rides the ok-partitioning the window already paid
    # for, and pair tuples flow straight into the count's partial agg.
    baskets = fitems.groupBy("ok").agg(F.array_sort(F.collect_list("pk")).alias("pks"))
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("pks"),
                        lambda x, i: F.transform(
                            F.slice(F.col("pks"), i + 2, F.size(F.col("pks"))),
                            lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= _MINSUP_PAIR)
    )
    total = sized.agg(F.countDistinct("ok").cast("double").alias("nb"))
    f1 = freq.select(F.col("pk").alias("p1"), F.col("n").alias("n1"))
    f2 = freq.select(F.col("pk").alias("p2"), F.col("n").alias("n2"))
    return (
        pairs.join(bcast_if_small(f1), "p1")
        .join(bcast_if_small(f2), "p2")
        .crossJoin(F.broadcast(total))  # 1-row aggregate, bounded
        .select(
            "p1",
            "p2",
            "pair_n",
            "n1",
            "n2",
            (F.col("pair_n").cast("double") / F.col("n1").cast("double")).alias("confidence"),
            (
                (F.col("pair_n").cast("double") * F.col("nb"))
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("lift"),
        )
    )


# --- first/last-touch attribution --------------------------------------

_ATTR_ORACLE = """
WITH touched AS (
  SELECT event_type,
         FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
  FROM events
)
SELECT COALESCE(ft, 'direct') AS first_touch,
       COALESCE(lt, 'direct') AS last_touch,
       CAST(COUNT(*) AS BIGINT) AS purchases
FROM touched WHERE event_type = 'purchase'
GROUP BY 1, 2
"""


@query("attribution_touch", _ATTR_ORACLE)
def attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch marketing attribution: every purchase is
    credited to the user's earliest and most recent preceding non-purchase
    event type ('direct' if none). One window pass partitioned by user —
    the partitioning every sessionization query already pays — then a
    group-by over the tiny (type x type) key space. Deterministic: window
    order ties-break on event_id; ignore-nulls first/last over an
    end-exclusive frame is order-exact on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touched = events.select(
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("ft"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("ft", F.lit("direct")).alias("first_touch"),
            F.coalesce("lt", F.lit("direct")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).alias("purchases"))
    )


# --- Benford leading-digit forensics -----------------------------------

# log10(1 + 1/d) as repr-exact literals: identical doubles on both engines
# (never computed via log10() at runtime — libm last-ulp divergence).
_BENFORD_P = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

# CAST each literal: a bare decimal literal parses as DECIMAL in DuckDB
# (str() keeps trailing zeros and would diverge from Spark's DOUBLE).
_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders WHERE o_totalprice >= 1
), counted AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
  FROM digits GROUP BY digit
)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS p_obs,
       {_BENFORD_CASE_SQL} AS p_benford,
       CAST(total AS DOUBLE)
         * (CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - {_BENFORD_CASE_SQL})
         * (CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - {_BENFORD_CASE_SQL})
         / ({_BENFORD_CASE_SQL}) AS chi2_term
FROM counted ORDER BY digit
"""


@query("benford_digits", _BENFORD_ORACLE)
def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic scan of order totals: observed leading-digit
    frequency vs the log10(1+1/d) expectation, with per-digit chi-squared
    contribution. The leading digit is taken from the INTEGER part's
    string (integer-to-string is exact on both engines; double-to-string
    is not), the expected probabilities are repr-exact literals, and every
    float is a single IEEE expression over exact counts — so the result is
    bit-identical regardless of partitioning. One map + one 9-key
    group-by: free at any scale."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counted = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    counted = counted.withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    expr = None
    for d, p in _BENFORD_P.items():
        branch = (F.col("digit") == d, F.lit(float(p)))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    p_exp = expr
    p_obs = F.col("n").cast("double") / F.col("total").cast("double")
    return counted.select(
        "digit",
        "n",
        p_obs.alias("p_obs"),
        p_exp.alias("p_benford"),
        (
            F.col("total").cast("double") * (p_obs - p_exp) * (p_obs - p_exp) / p_exp
        ).alias("chi2_term"),
    ).orderBy("digit")


# --- co-purchase graph degree profile ----------------------------------

_DEGREE_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), sized AS (
  SELECT ok, pk FROM (
    SELECT ok, pk, COUNT(*) OVER (PARTITION BY ok) AS bsz FROM items
  ) WHERE bsz <= {_MAX_BASKET}
), edges AS (
  SELECT DISTINCT a.pk AS p1, b.pk AS p2
  FROM sized a JOIN sized b ON a.ok = b.ok AND a.pk < b.pk
), ends AS (
  SELECT p1 AS pk FROM edges UNION ALL SELECT p2 FROM edges
), degree AS (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS deg FROM ends GROUP BY pk
)
SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM degree GROUP BY deg ORDER BY deg
"""


@query("degree_distribution", _DEGREE_ORACLE)
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the part co-purchase graph (distinct
    same-basket pairs, mega-baskets capped). The shape every graph
    pipeline runs first — it decides whether PageRank/triangles need skew
    handling. Edges come map-side out of per-basket sorted arrays (never
    a self-join), bounded per basket by the cap; edge dedup and degree
    count are uniform-key shuffles; the final histogram key space is
    tiny."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    baskets = (
        items.groupBy("ok")
        .agg(F.array_sort(F.collect_list("pk")).alias("pks"))
        .filter(F.size("pks") <= _MAX_BASKET)
    )
    edges = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("pks"),
                        lambda x, i: F.transform(
                            F.slice(F.col("pks"), i + 2, F.size(F.col("pks"))),
                            lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
        .distinct()
    )
    ends = edges.select(F.col("p1").alias("pk")).unionAll(
        edges.select(F.col("p2").alias("pk"))
    )
    degree = ends.groupBy("pk").agg(F.count(F.lit(1)).alias("deg"))
    return (
        degree.groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("deg")
    )


# --- temperature-weighted source mixing --------------------------------

_TEMP_KEEP = 20_000  # global target size of the mixed corpus (rows)
_TEMP_SQRT_SCALE = 1_000_000  # sqrt(n) quantized to BIGINT micro-units
_TEMP_HASH_SPACE = float(2**60)  # portable_hash64 is 60-bit


def _temperature_oracle() -> str:
    from hadoop_spark.functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("doc_id", salt="tempmix")
    return f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
  FROM documents WHERE text IS NOT NULL GROUP BY source
), weighted AS (
  SELECT source, n_total,
         CAST(ROUND(SQRT(CAST(n_total AS DOUBLE)) * {_TEMP_SQRT_SCALE}) AS BIGINT)
           AS sqrt_q
  FROM counts
), rated AS (
  SELECT source, n_total, sqrt_q,
         CAST(FLOOR(CAST(sqrt_q AS DOUBLE)
                    / CAST((SELECT CAST(SUM(sqrt_q) AS BIGINT) FROM weighted) AS DOUBLE)
                    * {_TEMP_KEEP}) AS BIGINT) AS n_target
  FROM weighted
), keep AS (
  SELECT d.source,
         CASE WHEN CAST({h} AS DOUBLE) / {_TEMP_HASH_SPACE!r}
                   < LEAST(CAST(1 AS DOUBLE),
                           CAST(r.n_target AS DOUBLE) / CAST(r.n_total AS DOUBLE))
              THEN d.doc_id END AS kept_id
  FROM documents d JOIN rated r ON d.source = r.source
  WHERE d.text IS NOT NULL
)
SELECT r.source, r.n_total, r.sqrt_q, r.n_target,
       CAST(COUNT(k.kept_id) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(k.kept_id), 0) AS BIGINT) AS kept_ids_sum
FROM rated r JOIN keep k ON r.source = k.source
GROUP BY r.source, r.n_total, r.sqrt_q, r.n_target
"""


@query("temperature_mix", _temperature_oracle())
def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted data mixing (T=2, i.e. sqrt weighting) — the
    standard multilingual/multi-source LM recipe: source s gets weight
    sqrt(n_s)/sum(sqrt(n_t)), upsampling small sources relative to their
    natural share, and keeps a deterministic hash-thresholded subset at
    rate target_s/n_s. Engine-exactness: sqrt is IEEE-correctly-rounded
    (identical on both engines), immediately quantized to BIGINT
    micro-units so the cross-source normalizer is an EXACT integer sum
    (float summation order never matters); targets are floors of a single
    double expression over exact ints. Scale shape: the per-source rate
    table is dimension-sized and broadcast, so the keep decision is
    map-side over the corpus — no window, no per-source single-reducer
    hotspot; the only corpus shuffles are the two source-keyed counts."""
    from hadoop_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    weighted = counts.withColumn(
        "sqrt_q",
        F.round(F.sqrt(F.col("n_total").cast("double")) * _TEMP_SQRT_SCALE).cast(
            "bigint"
        ),
    )
    total = weighted.agg(F.sum("sqrt_q").cast("bigint").alias("tq"))
    rated = (
        weighted.crossJoin(F.broadcast(total))  # 1-row aggregate, bounded
        .withColumn(
            "n_target",
            F.floor(
                F.col("sqrt_q").cast("double")
                / F.col("tq").cast("double")
                * _TEMP_KEEP
            ).cast("bigint"),
        )
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.col("n_target").cast("double") / F.col("n_total").cast("double"),
            ),
        )
        .select("source", "n_total", "sqrt_q", "n_target", "rate")
    )
    u = portable_hash64("doc_id", salt="tempmix").cast("double") / F.lit(
        _TEMP_HASH_SPACE
    )
    kept_id = F.when(u < F.col("rate"), F.col("doc_id"))
    return (
        docs.join(F.broadcast(rated), "source")
        .select("source", "n_total", "sqrt_q", "n_target", kept_id.alias("kept_id"))
        .groupBy("source", "n_total", "sqrt_q", "n_target")
        .agg(
            F.count("kept_id").alias("n_kept"),
            F.coalesce(F.sum("kept_id"), F.lit(0)).cast("bigint").alias("kept_ids_sum"),
        )
    )


# --- bounded-round label propagation (communities) ---------------------

_LP_ROUNDS = 3


def _lp_round_cte(t: int) -> str:
    return f"""
lab{t} AS (
  SELECT v.pk, LEAST(v.lab, COALESCE(MIN(w.lab), v.lab)) AS lab
  FROM lab{t - 1} v
  LEFT JOIN dedges e ON e.src = v.pk
  LEFT JOIN lab{t - 1} w ON w.pk = e.dst
  GROUP BY v.pk, v.lab
)"""


_LP_ORACLE = (
    f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), sized AS (
  SELECT ok, pk FROM (
    SELECT ok, pk, COUNT(*) OVER (PARTITION BY ok) AS bsz FROM items
  ) WHERE bsz <= {_MAX_BASKET}
), edges AS (
  SELECT DISTINCT a.pk AS p1, b.pk AS p2
  FROM sized a JOIN sized b ON a.ok = b.ok AND a.pk < b.pk
), dedges AS (
  SELECT p1 AS src, p2 AS dst FROM edges
  UNION ALL SELECT p2, p1 FROM edges
), lab0 AS (
  SELECT DISTINCT pk, pk AS lab FROM sized
),"""
    + ",".join(_lp_round_cte(t) for t in range(1, _LP_ROUNDS + 1))
    + f"""
SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(pk) AS BIGINT) AS member_ids_sum
FROM lab{_LP_ROUNDS} GROUP BY lab
"""
)


@query("label_propagation", _LP_ORACLE)
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-label propagation over the co-purchase graph,
    bounded to {R} rounds — the bounded-step form of connected-components
    / community detection (the unbounded variant is `dedup_components`;
    bounding the rounds makes every intermediate SQL-expressible, so the
    oracle replays the exact fixpoint prefix). Per round: one
    neighbor-min aggregation keyed by dst + one least() merge — O(edges)
    shuffle, the same per-iteration bound as `pagerank`; edges are built
    map-side from capped basket arrays and persisted once. Labels after
    round t equal min node-id within t hops, so the output is
    deterministic regardless of partitioning."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    baskets = (
        items.groupBy("ok")
        .agg(F.array_sort(F.collect_list("pk")).alias("pks"))
        .filter(F.size("pks") <= _MAX_BASKET)
    )
    edges = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("pks"),
                        lambda x, i: F.transform(
                            F.slice(F.col("pks"), i + 2, F.size(F.col("pks"))),
                            lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
        .distinct()
    )
    dedges = shared(
        edges.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionAll(
            edges.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
        )
    )
    # r10: edge cache materialized at session width, rounds executed
    # EAGERLY under the scale-adaptive loop width (operators/graph
    # .loop_width — same regime as pagerank/bfs_hops; the lazy checkpoints
    # deferred every round to the caller's action at session width). A/B
    # (balanced): med 7.11 -> 4.05 s, min 6.59 -> 3.99, labels identical
    # (min-label is partitioning-independent).
    n_edge_rows = dedges.count()
    with loop_width(spark, n_edge_rows):
        # node set = every item in a surviving basket (isolated nodes keep
        # their own label throughout) — mirrors the oracle's lab0 exactly
        labels = (
            baskets.select(F.explode("pks").alias("pk"))
            .distinct()
            .withColumn("lab", F.col("pk"))
        )
        for _ in range(_LP_ROUNDS):
            neigh_min = (
                dedges.join(labels.withColumnRenamed("pk", "dst"), "dst")
                .groupBy(F.col("src").alias("pk"))
                .agg(F.min("lab").alias("nlab"))
            )
            labels = (
                labels.join(neigh_min, "pk", "left")
                .select(
                    "pk",
                    F.least(
                        F.col("lab"), F.coalesce("nlab", F.col("lab"))
                    ).alias("lab"),
                )
            )
            labels = labels.localCheckpoint(eager=True)  # cut 3-round lineage
    return labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("pk").cast("bigint").alias("member_ids_sum"),
    )
