from .types import duckdb_to_spark_type, spark_to_duckdb_type, struct_from_columns

__all__ = ["duckdb_to_spark_type", "spark_to_duckdb_type", "struct_from_columns"]
