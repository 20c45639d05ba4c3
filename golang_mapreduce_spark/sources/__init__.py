from golang_mapreduce_spark.sources.fixtures import TABLES, load_all, load_table

__all__ = ["TABLES", "load_all", "load_table"]
