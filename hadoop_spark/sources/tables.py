"""Canonical test-table loaders.

The reference's "table" is a directory of files on a DFS read through an
InputFormat (`FileInputFormat.getSplits`,
`hadoop-mapreduce-client-core/.../lib/input/FileInputFormat.java:438`); here a
table is a parquet path and the DataSource framework computes the splits.
Column pruning + predicate pushdown reach the scan automatically — the
capability the reference had to hand-build per-format
(`SequenceFileInputFilter.java:49`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def _prep(spark: SparkSession) -> None:
    """Session invariants every query relies on, applied defensively so the
    catalog behaves identically under a caller-provided session (the driver
    builds its own): UTC timestamp semantics (matches the oracle's naive
    timestamps) and ns-timestamp parquet tolerance."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prep(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize `events.ts` to session-TZ TIMESTAMP whatever the fixture's
    physical type. The current fixtures store parquet `timestamp[us]` with
    `isAdjustedToUTC=false`, which Spark 4 reads as TIMESTAMP_NTZ — a type
    `F.unix_micros` and window functions reject. With the session timezone
    pinned to UTC (see `_prep`) the NTZ→TIMESTAMP cast is value-preserving
    and matches the oracle's naive-UTC timestamps bit-for-bit. A legacy
    TIMESTAMP(NANOS) fixture (read as int64 via the nanosAsLong conf) is
    truncated ns→µs exactly as DuckDB/Arrow narrow it."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def fanout_small(df: DataFrame) -> DataFrame:
    """Spread a small-file scan across the cluster for CPU-heavy map work.

    A table far smaller than `spark.sql.files.maxPartitionBytes` arrives as
    ONE input split, which serializes expensive per-row compute (hashing,
    shingling, vector math) onto a single core — the NLineInputFormat
    problem (`lib/input/NLineInputFormat.java:63`: parallelism control, not
    semantics). Repartition up to default parallelism only when the scan is
    under-split; at real scale inputs already carry enough splits and this
    is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    # r11: the split COUNT can lie for parquet — a byte-range split only
    # yields rows when a row-group midpoint falls inside it, so a file
    # with a few giant row groups scans on a few cores no matter how many
    # splits the planner packs (measured on the x100 probe replica:
    # 32 splits over one 140 MB file with 2 row groups put 14.4 M of 15 M
    # rows in ONE task and made poisson_bootstrap_ci x439 super-linear).
    # Total row-group count is the true upper bound on scan parallelism;
    # it lives in the file footers — driver-side metadata, one read per
    # file, capped so a many-file table (whose parallelism is fine anyway)
    # never pays a listing storm. Non-parquet/remote inputs skip the check.
    try:
        files = df.inputFiles()
        if 0 < len(files) <= 64 and all(f.endswith(".parquet") for f in files):
            import pyarrow.parquet as pq

            total_rgs = 0
            for f in files:
                path = f[7:] if f.startswith("file://") else f
                total_rgs += pq.ParquetFile(path).metadata.num_row_groups
                if total_rgs >= target:
                    break
            if total_rgs < target:
                return df.repartition(target)
    except Exception:  # noqa: BLE001 — a heuristic must never fail the query
        pass
    return df


def shared(df: DataFrame) -> DataFrame:
    """Persist an intermediate that multiple plan branches consume.

    A DataFrame referenced from several branches of one query (e.g. both
    sides of a self-join, candidate generation + verification) is otherwise
    RECOMPUTED per branch — Spark shares shuffle exchanges, not arbitrary
    subplans. For expensive map-side work (signatures, shingles, quantized
    vectors) persist once and read many: MEMORY_AND_DISK so it spills
    instead of OOMing at scale. The 100 TB version of the same decision is
    materializing the signature table to storage before the self-join.

    When NOT to use it (measured, r7): AQE's stage cache already reuses
    identical shuffle map stages at runtime, so a frame whose lineage ends
    in an exchange and is consumed by only TWO branches often runs FASTER
    unpersisted — the cache materialization barrier costs more than the
    reduce-side recompute it saves (kcore_peel 3.5→1.9 s, rfm_segmentation
    1.5 vs 2.6 s). Persist wins decisively for 3+ consumers, driver-loop
    iteration state, and self-joins over expensive map-side work
    (triangle_count 28→5.9 s, pagerank 17→9.6 s, kmeans_iterate −2.5 s,
    bfs_hops −2.4 s, label_propagation −2.2 s without it).

    CAVEAT (x30-validated): bench-scale timings only settle the question
    for exchange-deduped JVM subtrees. A frame built by expensive work
    the stage cache can NOT dedupe — a Python cogroup / blocked GEMM
    feeding differently-keyed consumers — needs its persist even when
    sf0.1 says otherwise: dbscan_core_flags measured 0.8 s FASTER
    unpersisted at sf0.1 but 2.3-2.7× SLOWER at x30 data. Measure before
    flipping either way, and A/B at x30 when the subtree crosses the
    Python boundary."""
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL entry points."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
