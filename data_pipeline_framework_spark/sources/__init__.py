from .pruning import file_column_stats, prune_files, read_parquet_pruned
from .readers import read_csv, read_json, read_parquet, read_table

__all__ = [
    "file_column_stats",
    "prune_files",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_parquet_pruned",
    "read_table",
]
