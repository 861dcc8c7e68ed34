"""Gap-based user sessionization — batch and stateful-streaming forms.

A session is a maximal run of one user's events with inter-event gaps
≤ SESSION_GAP. Two implementations with matching semantics:

  batch      window functions: LAG gap-flag → running-sum session
             sequence → groupBy. Oracle-checked (``etl_user_sessions``)
             — the same SQL runs on DuckDB.
  streaming  ``applyInPandasWithState`` (GroupState per user): open
             sessions live in the state store, close when a gap or an
             event-time timeout passes, and are emitted exactly once.
             This is the custom stateful operator pattern the reference
             has no analog for — bounded state (one open session per
             active user), watermark-driven eviction.

Scale notes: the batch form shuffles once on user_id and windows within
partitions. The streaming form's state is O(active users); the
event-time timeout closes idle sessions so state can't grow without
bound. Session bounds are emitted as epoch-microsecond BIGINTs — both
engines truncate parquet TIMESTAMP(NANOS) to micros the same way, so
the oracle hash is stable.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..catalog import load_table
from ..plans.registry import query
from .windows import EVENTS_SCHEMA

SESSION_GAP = dt.timedelta(hours=2)
GAP_US = int(SESSION_GAP.total_seconds() * 1_000_000)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


@query(
    "etl_user_sessions",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL '2 hours'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM ordered
    )
    SELECT user_id,
           CAST(session_seq AS INT) AS session_seq,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM tagged
    GROUP BY user_id, session_seq
    """,
)
def etl_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: one shuffle on user_id, two window passes
    inside each partition, then the session aggregate."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lag_ts = F.lag("ts").over(w)
    is_new = F.when(
        lag_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(lag_ts) > GAP_US),
        1,
    ).otherwise(0)
    tagged = ev.withColumn("is_new", is_new).withColumn(
        "session_seq", F.sum("is_new").over(run)
    )
    return tagged.groupBy("user_id", F.col("session_seq").cast("int").alias("session_seq")).agg(
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


def _close_and_emit(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: merge the batch's events for one user into the
    open session; emit every session closed by a gap. On event-time
    timeout, emit the open session (the watermark passed last_ts+gap —
    no in-order event can extend it any more)."""
    (user_id,) = key
    closed: list[tuple[int, int, int, int, float]] = []

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, total = state.get
            closed.append((user_id, start_us, last_us, n, total))
            state.remove()
    else:
        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values("ts")
        # pin ns resolution explicitly, then truncate ns → µs — the same
        # truncation the batch side's unix_micros performs
        ts_us = events["ts"].astype("datetime64[ns]").astype("int64") // 1000
        vals = events["value"].to_numpy()

        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = -1
            n, total = 0, 0.0

        for t, v in zip(ts_us.to_numpy(), vals):
            t = int(t)
            if start_us < 0:
                start_us, last_us, n, total = t, t, 1, float(v)
            elif t - last_us > GAP_US:
                closed.append((user_id, start_us, last_us, n, total))
                start_us, last_us, n, total = t, t, 1, float(v)
            else:
                last_us, n, total = t, n + 1, total + float(v)

        state.update((start_us, last_us, n, total))
        # close the open session via timeout once the watermark passes
        # last_ts + gap (no on-time event can extend it afterwards)
        state.setTimeoutTimestamp(last_us // 1000 + GAP_US // 1000)

    if closed:
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
                "total_value",
            ],
        )


def run_session_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str,
    watermark_delay: str = "1 hour",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Replay event files; emit closed sessions into an in-memory table."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    sessions = (
        raw.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _close_and_emit,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
