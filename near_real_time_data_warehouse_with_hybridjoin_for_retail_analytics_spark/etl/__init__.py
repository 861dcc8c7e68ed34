"""Batch ETL: warehouse schemas, dimension builds, date dimension."""
