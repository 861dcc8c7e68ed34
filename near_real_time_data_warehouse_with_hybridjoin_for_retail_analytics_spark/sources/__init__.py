"""External source/sink connectors (beyond the testdata parquet)."""
