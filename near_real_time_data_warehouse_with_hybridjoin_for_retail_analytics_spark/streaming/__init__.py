"""Structured Streaming: the HYBRIDJOIN-parity enrichment pipeline and
watermarked windowed rollups.

Importing this package registers the batch-equivalent streaming queries
(etl_events_hourly).
"""

from . import sessions, windows  # noqa: F401
