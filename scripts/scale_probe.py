"""Scale probe: replicate the sf0.1 tables xN (deterministic key-shifted
copies, not row duplication — join/group cardinalities scale like real
data) into .tmp/scale_sfX, then time the headline operators and check the
timing ratio against the data ratio. Linear-ish scaling here is the local
evidence for the 100 TB claim; a super-linear cliff is a bug to fix now.

Usage: python scripts/scale_probe.py [factor] [--bounded-family[=CAP]] [queries...]

--bounded-family (r9 verdict task #5): the plain key-shifted replica gives
every document/embedding FACTOR-1 identical twins, so dedup/similarity
probes measure O(k^2) family OUTPUT growth, not plan scaling
(dedup_minhash x81 at x100 was the pair count, not a regression). In
bounded mode only the first CAP replicas (default 4) stay near-duplicates
of the original; every later replica gets its text token-prefixed with a
replica marker (disjoint shingles -> no MinHash/SimHash collisions) and
its embedding cyclically rotated (norm-preserving, cosine-destroying), so
duplicate families stay size<=CAP at ANY factor and the probe ratio is a
clean plan-scaling number. Real corpora have bounded families; this
replica mode models them.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.session import get_session
from hadoop_spark.sources.tables import TABLE_NAMES, load_table

BASE = "/root/testdata/sf0.1"
_args = sys.argv[1:]
BOUNDED_CAP = 0  # 0 = plain replica mode
for _a in list(_args):
    if _a.startswith("--bounded-family"):
        BOUNDED_CAP = int(_a.split("=", 1)[1]) if "=" in _a else 4
        _args.remove(_a)
FACTOR = int(_args[0]) if _args else 10
OUT = f"/root/repo/.tmp/scale_x{FACTOR}" + (
    f"_bf{BOUNDED_CAP}" if BOUNDED_CAP else ""
)
PROBE_QUERIES = _args[1:] or [
    "tpch_q1",
    "tpch_q5",
    "tpch_q18",
    "wordcount",
    "total_order_sort",
    "dedup_minhash",
    "dedup_embedding",
    "ann_cosine_topk",
    "teragen_sort",
]

# key columns to shift per replica so cardinalities scale (joins stay
# consistent because all tables shift the same key space).
KEY_SHIFTS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


def build(spark) -> None:
    for name in TABLE_NAMES:
        src = load_table(spark, BASE, name)
        dst = f"{OUT}/{name}.parquet"
        if os.path.exists(dst):
            continue
        if name not in KEY_SHIFTS:  # small dims stay as-is
            src.write.mode("overwrite").parquet(dst)
            continue
        rep = spark.range(FACTOR).select(F.col("id").alias("__rep"))
        df = src.crossJoin(F.broadcast(rep))
        for col, stride in KEY_SHIFTS[name].items():
            df = df.withColumn(col, F.col(col) + F.col("__rep") * stride)
        # perturb document text per replica so dedup work scales too
        if name == "documents":
            near_dup = F.concat(
                F.col("text"), F.lit(" r"), F.col("__rep").cast("string")
            )
            if BOUNDED_CAP:
                # replicas >= CAP: prefix every token with a replica
                # marker — shingle sets become disjoint across replicas,
                # capping duplicate families at CAP members.
                marker = F.concat(
                    F.lit("m"), F.col("__rep").cast("string"), F.lit("_")
                )
                unique = F.concat(
                    marker,
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"\s+"),
                        F.concat(F.lit(" "), marker),
                    ),
                )
                df = df.withColumn(
                    "text",
                    F.when(F.col("__rep") == 0, F.col("text"))
                    .when(F.col("__rep") < BOUNDED_CAP, near_dup)
                    .otherwise(unique),
                )
            else:
                df = df.withColumn(
                    "text",
                    F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                        near_dup
                    ),
                )
        if name == "embeddings" and BOUNDED_CAP:
            # replicas >= CAP: cyclic rotation by (rep mod 63)+1 positions
            # — norm-preserving (n2/buckets unchanged) but cosine-
            # destroying, so embedding near-dup families stay <= CAP.
            k = (F.col("__rep") % 63 + 1).cast("int")
            rotated = F.concat(
                F.slice(F.col("embedding"), k + 1, F.lit(64) - k),
                F.slice(F.col("embedding"), 1, k),
            )
            df = df.withColumn(
                "embedding",
                F.when(F.col("__rep") < BOUNDED_CAP, F.col("embedding"))
                .otherwise(rotated),
            )
        df.drop("__rep").write.mode("overwrite").parquet(dst)
        print(f"# built {name} x{FACTOR}", file=sys.stderr)


def main() -> None:
    load_all()
    spark = get_session(app_name="scale_probe")
    build(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    print(f"probe factor={FACTOR} out={OUT}")
    for name in PROBE_QUERIES:
        times = {}
        for tag, sf_dir in (("base", BASE), (f"x{FACTOR}", OUT)):
            best = float("inf")
            for _ in range(2):
                # drain persisted intermediates so no timed run reuses a
                # cache built by a previous run/query — shared() persists
                # by logical-plan equality, and a reuse hit (or an
                # eviction miss) silently skews the ratio in either
                # direction (measured: a ×0.04 "ratio" from one stale hit)
                spark.catalog.clearCache()
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[tag] = best
        ratio = times[f"x{FACTOR}"] / max(times["base"], 1e-9)
        flag = "" if ratio <= FACTOR * 1.5 else "  <-- SUPER-LINEAR"
        print(
            f"{name:22s} base={times['base']:6.2f}s x{FACTOR}={times[f'x{FACTOR}']:7.2f}s "
            f"ratio={ratio:5.1f} (data x{FACTOR}){flag}"
        )


if __name__ == "__main__":
    main()
