"""Control plane — watermark + run-log tables (small, parquet-backed)."""
