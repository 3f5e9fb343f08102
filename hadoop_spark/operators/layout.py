"""Multi-dimensional data layout — Z-order (Morton) clustering for scan
pruning.

No reference analogue (the reference's only layout tools are
TotalOrderPartitioner's single-key ranges, `lib/partition/
TotalOrderPartitioner.java:54`, and MapFile's sorted-by-key files): sorting
by ONE key leaves every other predicate column scattered across all files.
Interleaving the bits of two (or more) bucketed keys gives a single sort
key whose ranges are simultaneously local in BOTH dimensions — so min/max
footer statistics (parquet row-group / file stats) prune scans filtered on
EITHER column. This is the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, built here from plain column expressions + repartitionByRange.

Scale: the z-value is a map-side expression; the clustered write is one
range shuffle (sampled boundaries, balanced output files) — the identical
cost to any total-order write, paid once at layout time, repaid on every
subsequent selective scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension → 32-bit z-value for 2-D


def zvalue2(x_bucket: Column, y_bucket: Column, bits: int = ZBITS) -> Column:
    """Interleave the low `bits` of two non-negative bucket ids into a
    Morton code (x in even bit positions, y in odd). Pure integer
    shift/mask arithmetic — whole-stage codegen, and mirrored exactly in
    DuckDB by :func:`zvalue2_sql`."""
    x = x_bucket.cast("bigint") % (1 << bits)
    y = y_bucket.cast("bigint") % (1 << bits)
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(x, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(y, i) % 2, 2 * i + 1)
        )
    return out


def zvalue2_sql(x_expr: str, y_expr: str, bits: int = ZBITS) -> str:
    x = f"(CAST({x_expr} AS BIGINT) % {1 << bits})"
    y = f"(CAST({y_expr} AS BIGINT) % {1 << bits})"
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_bucket: Column,
    y_bucket: Column,
    num_files: int = 32,
    bits: int = ZBITS,
) -> None:
    """Cluster `df` by the z-order of two bucket expressions and write
    `num_files` parquet files, each covering a compact z-range (range
    shuffle with sampled boundaries → balanced files; sortWithinPartitions
    → tight per-row-group min/max stats on BOTH source columns)."""
    z = zvalue2(x_bucket, y_bucket, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats_overlap(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] for `column` overlaps [lo,hi], total files) —
    read from parquet footers, the same statistics a stats-aware reader
    (or Spark's parquet row-group filter) prunes with. Test/diagnostic
    helper; runs on the driver over footer metadata only."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit, len(files)
