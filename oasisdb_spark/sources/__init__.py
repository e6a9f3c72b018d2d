from oasisdb_spark.sources.tables import load_table, load_all

__all__ = ["load_table", "load_all"]
