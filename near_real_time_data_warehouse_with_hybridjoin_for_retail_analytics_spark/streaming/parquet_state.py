"""Shared probe for parquet-backed mutable state dirs.

Every streaming gate keeps some authoritative state in a parquet dir
it appends/rewrites (the fact sink, compacted bins, tombstones, sketch
partials). Reading that state on (re)start must distinguish three
cases, and the distinction is load-bearing for exactly-once claims:

1. NOTHING COMMITTED — the dir is missing, or holds only job debris
   (``_temporary``/``_SUCCESS`` from a crash before commit). Safe to
   treat as empty: those rows never became visible.
2. COMMITTED STATE — read it.
3. DAMAGE / TRANSIENT FAILURE — committed state exists but cannot be
   read (corrupt footer, permissions, FS hiccup). Must PROPAGATE so
   the caller retries: falling back to "empty" silently restarts id
   sequences (duplicate keys), re-appends compacted bins (double
   count), or rebuilds sketch state from partials (undercount).

Spark's reader separates these for us — case 1 raises AnalysisException
with error class PATH_NOT_FOUND (missing) or UNABLE_TO_INFER_SCHEMA
(no committed footers to infer from), while case 3 surfaces as a
SparkException/Py4J error (corrupt footer) or an OS-level error
(permissions), neither of which is one of those two classes. Probing
through the reader also handles hive-partitioned layouts and non-local
URIs, which an ``os.listdir`` probe misreads (a ``partitionBy`` sink
has no top-level ``.parquet`` names at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_EMPTY_CLASSES = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def read_state_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet state dir; ``None`` iff nothing is committed
    there (missing path or debris-only dir). Any other failure
    propagates — see the module docstring for why that matters."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        # getCondition is the Spark-4 name; getErrorClass its
        # deprecated alias — prefer the former, fall back for older
        # runtimes.
        get = getattr(exc, "getCondition", None) or getattr(
            exc, "getErrorClass", None
        )
        if get is not None and get() in _EMPTY_CLASSES:
            return None
        raise
