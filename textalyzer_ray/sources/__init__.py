"""Sources: parquet table readers + deterministic synthetic web pages."""
