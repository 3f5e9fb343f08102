from hadoop_spark.plans.catalog import ORACLES, QUERIES, load_all

__all__ = ["ORACLES", "QUERIES", "load_all"]
