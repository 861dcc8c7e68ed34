"""Watermarked windowed aggregation over the events stream.

The reference has no streaming windows — all its time bucketing happens
in batch queries via the Date dim (SURVEY §2.9). This module is the
beyond-reference streaming capability a near-real-time warehouse needs:
tumbling-window rollups with late-data handling.

One transformation, two execution modes (the stream/batch-equivalence
design used throughout this repo):

  * batch: ``windowed_events(df)`` over the events table — registered
    as the oracle-checked query ``etl_events_hourly``;
  * streaming: ``run_windowed_stream`` replays event files as
    micro-batches with ``withWatermark`` + append mode, so a window
    emits exactly once, when the watermark passes its end — the
    at-scale pattern where state for closed windows is evicted instead
    of accumulating forever.

Scale notes: state size is bounded by (open windows × group keys);
watermark delay is the knob trading late-data tolerance for state. The
aggregation itself is the same partial-agg → exchange-on-(window, key)
plan as any batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..catalog import load_table
from ..functions.money import SQL_DSUM, dsum
from ..plans.registry import query

WINDOW = "1 hour"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_events(events: DataFrame, window: str = WINDOW) -> DataFrame:
    """Tumbling-window rollup: (window_start, window_end, event_type) →
    event count + exact-decimal value sum. Identical semantics for a
    batch DataFrame and a watermarked stream."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "etl_events_hourly",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM.format(c="value")} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def etl_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the streaming window rollup (same code path)."""
    return windowed_events(load_table(spark, sf_dir, "events"))


def run_windowed_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str,
    watermark_delay: str = "1 hour",
    window: str = WINDOW,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Replay event parquet files as micro-batches; append-mode windowed
    aggregation into an in-memory table named ``query_name``.

    Append mode + watermark means each (window, event_type) row is
    emitted exactly once — after the watermark (max event time −
    delay) passes the window end — and its state is dropped. Windows
    still open when the replay ends are withheld, exactly as they would
    be on a live stream.
    """
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = windowed_events(raw.withWatermark("ts", watermark_delay), window)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
