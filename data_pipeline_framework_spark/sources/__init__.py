from .readers import read_csv, read_json, read_parquet, read_table

__all__ = ["read_csv", "read_json", "read_parquet", "read_table"]
