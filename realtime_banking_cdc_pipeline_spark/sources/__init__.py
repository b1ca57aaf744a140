from .parquet_io import load_tables, read_table, write_partitioned

__all__ = ["read_table", "load_tables", "write_partitioned"]
