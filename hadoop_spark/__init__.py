"""hadoop_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Hadoop MapReduce (the reference),
re-expressed Spark-first.

The reference is a fixed map → shuffle → reduce skeleton; every capability it
exposes (scan formats, projections/filters, joins, aggregation framework,
total-order/secondary sort, partitioners, streaming-script UDFs, multi-output
writes) maps onto declarative DataFrame plans here so Catalyst/Tungsten/AQE
pick the physical strategy. See SURVEY.md for the full operator inventory and
file:line citations into the reference tree.

Layout:
  session    — SparkSession factory tuned for the target scale
  sources    — InputFormat parity: text/kv-text/fixed-width/parquet/jdbc/union
  operators  — mappers/reducers/joins/sorts/partitioners/pipe parity
  functions  — scalar layer: portable hashing, text analysis, multimodal stubs
  plans      — the named query catalog + DuckDB oracle SQL (driver contract)
  streaming  — Structured Streaming extension over the `events` table
"""

from hadoop_spark.session import get_session

__all__ = ["get_session"]
