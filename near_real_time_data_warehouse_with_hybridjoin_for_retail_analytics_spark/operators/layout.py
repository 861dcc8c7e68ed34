"""Multi-dimensional data layout: z-order (Morton) keys for file
pruning.

At 100 TB the cheapest query is the one that never reads the file:
single-key pruning falls out of partitioning/bucketing (see
``catalog.ingest_bucketed``), but a table queried by BOTH user and time
needs a layout where every file is narrow in BOTH dimensions at once.
Z-ordering (Morton, 1966 — the technique behind Delta Lake/Iceberg's
``OPTIMIZE ZORDER BY``) interleaves the bits of the two keys so that
sorting by the single z-value clusters rows that are close in each
dimension, giving every file a bounded min/max envelope per column —
exactly what format-level zone maps prune on.

This entry computes the z-value with pure integer bit arithmetic
(identical in Spark and DuckDB), assigns each event to one of Z_FILES
file buckets by z-range, and emits each bucket's per-dimension min/max
envelope plus its row count — the zone-map table a lakehouse writer
would produce. The demonstrable property (asserted in tests): every
bucket's user-envelope AND hour-envelope are narrow relative to the
global ranges, so a predicate on either dimension prunes most buckets.

100 TB shape: the z-key is a map-side expression (zero shuffle); the
bucket assignment in production is ``repartitionByRange(z)`` before the
parquet write (one range shuffle, the same cost as any sorted write),
and the envelope table here is a groupBy over Z_FILES bounded groups.
Nothing scales with event count except the one pass that computes keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query

Z_BITS = 16  # bits interleaved per dimension → 32-bit z-space
Z_FILES = 64  # target file buckets; bucket = z >> (2·Z_BITS − 6)
_MASK = (1 << Z_BITS) - 1
_BUCKET_SHIFT = 2 * Z_BITS - 6
_US_PER_HOUR = 3_600_000_000  # epoch-micros → hour index


def _z_terms_sql() -> str:
    """DuckDB expression interleaving u (even bits) and t (odd bits)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(((u >> {i}) & 1) << {2 * i})")
        terms.append(f"(((t >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _z_col() -> F.Column:
    """Spark column interleaving u (even bits) and t (odd bits)."""
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = z + F.shiftleft(F.shiftright(F.col("u"), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(F.col("t"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


@query(
    "layout_zorder_events",
    f"""
    WITH keyed AS (
      SELECT user_id,
             epoch_us(ts) // {_US_PER_HOUR} AS hour_idx,
             user_id & {_MASK} AS u,
             (epoch_us(ts) // {_US_PER_HOUR}) & {_MASK} AS t
      FROM events
    ),
    z AS (
      SELECT user_id, hour_idx,
             ({_z_terms_sql()}) >> {_BUCKET_SHIFT} AS file_bucket
      FROM keyed
    )
    SELECT CAST(file_bucket AS BIGINT) AS file_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user,
           CAST(MIN(hour_idx) AS BIGINT) AS min_hour,
           CAST(MAX(hour_idx) AS BIGINT) AS max_hour
    FROM z GROUP BY 1
    """,
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map envelope table of a z-ordered events layout: per file
    bucket (z-range), the row count and the min/max of BOTH clustering
    dimensions (user, hour). Module doc has the pruning argument and
    the 100 TB write shape."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = F.expr(f"unix_micros(ts) DIV {_US_PER_HOUR}")
    keyed = ev.select(
        "user_id",
        hour_idx.alias("hour_idx"),
        F.col("user_id").bitwiseAND(F.lit(_MASK)).alias("u"),
        hour_idx.bitwiseAND(F.lit(_MASK)).alias("t"),
    )
    z = keyed.select(
        "user_id",
        "hour_idx",
        F.shiftright(_z_col(), _BUCKET_SHIFT).alias("file_bucket"),
    )
    return z.groupBy("file_bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("hour_idx").alias("min_hour"),
        F.max("hour_idx").alias("max_hour"),
    )
