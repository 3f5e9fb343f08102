from hadoop_spark.functions.hashing import portable_hash64, portable_hash64_sql

__all__ = ["portable_hash64", "portable_hash64_sql"]
