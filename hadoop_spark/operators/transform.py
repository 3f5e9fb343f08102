"""Row-transform operators — the reference's library Mapper surface.

In MapReduce every projection/filter/flatMap is a user `Mapper`
(`MR-CORE/mapreduce/Mapper.java:100`); the handful Hadoop ships as a library
are re-expressed here as DataFrame transforms built purely from JVM-side
`pyspark.sql.functions` (whole-stage-codegen'd — no Python in the row path,
which is what keeps these viable at 100 TB).

Parity map:
- TokenCounterMapper  (`lib/map/TokenCounterMapper.java:35`)  → tokenize()
- RegexMapper         (`lib/map/RegexMapper.java:36`)          → regex_matches()
- InverseMapper       (`lib/map/InverseMapper.java:30`)        → inverse()
- FieldSelection      (`lib/fieldsel/FieldSelectionHelper.java:60`) → field_select()
- KeyValueTextInputFormat (`lib/input/KeyValueTextInputFormat.java:47`) → kv_split()
- PercentFilter/MD5Filter (`lib/input/SequenceFileInputFilter.java:154,203`)
                                                               → percent_filter()
- ChainMapper         (`lib/chain/ChainMapper.java:84`)        → df.transform chaining (no code needed)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64


def tokenize(df: DataFrame, col: str, out: str = "word", pattern: str = r"\s+") -> DataFrame:
    """line → one row per token (the WordCount mapper). Empty tokens dropped,
    matching StringTokenizer semantics in the reference."""
    return (
        df.select(F.explode(F.split(F.col(col), pattern)).alias(out))
        .filter((F.col(out) != "") & F.col(out).isNotNull())
    )


def regex_matches(df: DataFrame, col: str, pattern: str, group: int = 0, out: str = "match") -> DataFrame:
    """Emit every regex match in every row — the grep mapper."""
    return (
        df.select(F.explode(F.regexp_extract_all(F.col(col), F.lit(pattern), F.lit(group))).alias(out))
        .filter(F.col(out) != "")
    )


def inverse(df: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """(k, v) → (v, k)."""
    return df.select(F.col(value).alias(key), F.col(key).alias(value))


def field_select(
    df: DataFrame,
    col: str,
    indices: list[int],
    sep: str = "\t",
    out_prefix: str = "f",
) -> DataFrame:
    """cut(1)-style positional projection of a delimited line.

    Out-of-range indices yield NULL (the reference emits empty fields for
    ragged rows). `sep` is treated as a literal separator.
    """
    import re as _re

    parts = F.split(F.col(col), _re.escape(sep))
    cols = [F.element_at(parts, i + 1).alias(f"{out_prefix}{i}") for i in indices]
    return df.select(*cols)


def kv_split(df: DataFrame, col: str, sep: str = "\t") -> DataFrame:
    """Split each line at the FIRST separator → (key, value); no separator →
    whole line is the key, value NULL (KeyValueLineRecordReader semantics)."""
    import re as _re

    parts = F.split(F.col(col), _re.escape(sep), 2)
    return df.select(
        F.element_at(parts, 1).alias("key"),
        F.element_at(parts, 2).alias("value"),
    )


def percent_filter(df: DataFrame, key: Column | str, frequency: int) -> DataFrame:
    """Keep rows whose md5-derived key-hash ≡ 0 (mod frequency): a
    deterministic, data-driven ~1/frequency sample. Unlike df.sample() the
    result is a pure function of the data — reproducible across engines,
    partitionings, and cluster sizes."""
    return df.filter(portable_hash64(key) % frequency == 0)
