"""Sources: deterministic fixture generators and Parquet read helpers."""
