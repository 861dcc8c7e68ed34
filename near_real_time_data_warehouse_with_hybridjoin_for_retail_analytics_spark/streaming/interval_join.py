"""Stream-stream interval join: click → purchase attribution pairs.

The reference joins a stream against *static* masters (its hybrid-join,
hybridjoin.py:320-420); joining two live streams is the capability it
lacks and Structured Streaming provides natively. This module attributes
each purchase to every same-user click in the preceding attribution
window — the pair-grained precursor of ``events_asof_attribution``
(which keeps only the latest click, batch-only).

One transformation, two execution modes (the repo's stream/batch-
equivalence design):

  * batch: ``attribution_pairs(events)`` — registered as the oracle-
    checked query ``etl_click_attribution``. Uses the interval-bucketing
    pattern (quantize to window-width buckets, 2-bucket equi-join probe,
    exact filter after) so Catalyst keeps a hash join — a raw BETWEEN
    join is a nested loop.
  * streaming: ``run_attribution_stream`` — two watermarked streams over
    the same event files, joined with an event-time range predicate.
    The watermarks + the range condition bound the join state: clicks
    older than (watermark − window) are evicted, so state is
    O(window × click rate) per key, not the whole history. Inner-join
    matches emit as soon as both sides arrive (no withholding).

Scale notes: the stream-stream join shuffles both sides on user_id once;
skewed users are AQE skew groups. The batch twin shuffles on
(user_id, bucket) — same volume, plus the 2× probe duplication of the
purchase side (the smaller side, by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..catalog import load_table
from ..plans.registry import query
from .windows import EVENTS_SCHEMA

ATTRIBUTION_WINDOW_US = 60 * 60 * 1_000_000  # 1 hour
WATERMARK_DELAY = "1 hour"


def attribution_pairs(events: DataFrame) -> DataFrame:
    """(purchase, click) pairs: same user, click strictly before the
    purchase, at most the attribution window earlier. Bucketed interval
    join — see module docstring."""
    ev = events.select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    bucket = (F.col("us") / F.lit(ATTRIBUTION_WINDOW_US)).cast("long")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("us").alias("purchase_us"),
        F.explode(F.array(bucket - 1, bucket)).alias("bucket"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        bucket.alias("bucket"),
        F.col("us").alias("click_us"),
    )
    return (
        purchases.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("click_us") < F.col("purchase_us"))
            & (F.col("purchase_us") - F.col("click_us") <= ATTRIBUTION_WINDOW_US)
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.col("purchase_us") - F.col("click_us")).alias("micros_between"),
        )
    )


@query(
    "etl_click_attribution",
    """
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS micros_between
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND c.event_type = 'click'
     AND c.ts < p.ts
     AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
    """,
)
def etl_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the attribution pair join (same semantics the
    stream-stream join produces incrementally)."""
    return attribution_pairs(load_table(spark, sf_dir, "events"))


def run_attribution_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str,
    watermark_delay: str = WATERMARK_DELAY,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Replay event files as two micro-batched streams (clicks,
    purchases) and join them on user_id within the attribution window.

    The range predicate must reference the raw event-time columns (not
    pre-derived micros) so Structured Streaming can derive the state
    eviction bound from the watermarks."""

    def side(event_type: str, alias: str) -> DataFrame:
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir)
            .filter(F.col("event_type") == event_type)
            .withWatermark("ts", watermark_delay)
            .alias(alias)
        )

    joined = side("purchase", "p").join(
        side("click", "c"),
        F.expr(
            "c.user_id = p.user_id AND c.ts < p.ts "
            "AND c.ts >= p.ts - interval 1 hour"
        ),
    )
    pairs = joined.select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.user_id").alias("user_id"),
        (F.unix_micros("p.ts") - F.unix_micros("c.ts")).alias("micros_between"),
    )
    return (
        pairs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
