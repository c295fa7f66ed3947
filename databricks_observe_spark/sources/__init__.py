from databricks_observe_spark.sources.tables import TABLE_NAMES, load_tables

__all__ = ["TABLE_NAMES", "load_tables"]
