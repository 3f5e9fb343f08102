"""Drive the driver contract end-to-end the way the per-round verify does:
vanilla SparkSession (no engine conf), import __spark_entry__, run entry() +
every queries() entry at the given sf against oracle_sql() in DuckDB, compare
rows order-insensitively. Exit non-zero on any mismatch.

Usage: python scripts/drive_contract.py [sf_dir] [query_name_substring ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

argv = [a for a in sys.argv[1:] if a != "--strict"]
STRICT = "--strict" in sys.argv[1:]
sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .appName("drive_contract")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) >= 0

con = duckdb.connect()
for name in (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
):
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return "<NULL>" if v is None else str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def canon_pandas(pdf):
    """Dtype-SENSITIVE canonicalization through pandas — emulates the
    driver's stricter hash path, where e.g. a DuckDB HUGEINT aggregate
    lands as float64/object while Spark's BIGINT lands as int64 (the
    source_profile r3 red row). Values carry a type tag so 148 != 148.0."""
    import numpy as np
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
            return "<NULL>"
        if isinstance(v, (np.floating, float)):
            f = float(v)
            return "NaN" if math.isnan(f) else f"f:{f!r}"
        if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
            return f"i:{int(v)}"
        if isinstance(v, (np.bool_, bool)):
            return f"b:{bool(v)}"
        return f"{type(v).__name__}:{v}"

    return sorted(
        tuple(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )


queries = e.queries()
oracles = e.oracle_sql()
name_filters = argv[1:]
if name_filters:
    queries = {
        n: fn for n, fn in queries.items() if any(f in n for f in name_filters)
    }
failed = []
for qi, name in enumerate(sorted(queries)):
    # Periodically drain persisted intermediates (shared() frames and the
    # two-level scans' pinned range exchanges in operators/sort.py) —
    # they are load-bearing only while their own query's result is still
    # lazy, and across a 384-query session they otherwise accumulate
    # MEMORY_AND_DISK entries until session end. Every 25 queries (not
    # every query): Spark keys persist() by logical-plan equality, so
    # adjacent related queries legitimately REUSE each other's cached
    # intermediates — a per-query clear costs ~20% wall-clock for no
    # extra safety, while a bounded drain caps accumulation all the same.
    if qi % 25 == 0:
        spark.catalog.clearCache()
    t0 = time.time()
    try:
        sdf = queries[name](spark, sf_dir)
        got_cols = sdf.columns
        got = canon_pandas(sdf.toPandas()) if STRICT else canon(sdf.collect(), got_cols)
    except Exception as ex:
        failed.append(name)
        print(f"FAIL {name}: spark error: {ex}")
        continue
    if name not in oracles:
        print(f"ok   {name}: rows-only check, {len(got)} rows ({time.time()-t0:.1f}s)")
        continue
    try:
        res = con.sql(oracles[name])
        want_cols = res.columns
        want = canon_pandas(res.df()) if STRICT else canon(res.fetchall(), want_cols)
    except Exception as ex:
        failed.append(name)
        print(f"FAIL {name}: oracle error: {ex}")
        continue
    if sorted(got_cols) != sorted(want_cols):
        failed.append(name)
        print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
    elif len(got) != len(want):
        failed.append(name)
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
    elif got != want:
        bad = next(i for i, (g, w) in enumerate(zip(got, want)) if g != w)
        failed.append(name)
        print(f"FAIL {name}: first diff row {bad}:\n  spark={got[bad]}\n  oracle={want[bad]}")
    else:
        print(f"ok   {name}: {len(got)} rows hash-match ({time.time()-t0:.1f}s)")

print(f"\n{len(queries) - len(failed)}/{len(queries)} queries ok at {sf_dir}")
sys.exit(1 if failed else 0)
