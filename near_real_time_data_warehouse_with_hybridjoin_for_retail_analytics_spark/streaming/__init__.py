"""Structured Streaming: the HYBRIDJOIN-parity enrichment pipeline."""
