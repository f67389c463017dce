from worker_etl_spark.sources.tables import read_table

__all__ = ["read_table"]
