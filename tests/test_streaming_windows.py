"""Watermarked windowed aggregation: stream/batch equivalence.

Replays the sf0.001 events table as micro-batches (3 files → 3 batches)
through the append-mode windowed rollup and asserts:

  * every emitted (window, event_type) row equals the batch computation
    over the same input — exact counts and decimal-summed values;
  * emission respects the watermark: exactly the windows whose end is
    ≤ (max event time − delay) are emitted; still-open windows are
    withheld, as they would be on a live stream.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    windows as sw,
)

DELAY = "1 hour"


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="winstream_")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # 3 files in event-id order → 3 micro-batches; roughly time-ordered
    # so the watermark advances as a live stream's would.
    events.orderBy("event_id").coalesce(1).write.mode("overwrite").parquet(f"{d}/all")
    rows = spark.read.parquet(f"{d}/all").orderBy("event_id").collect()
    third = len(rows) // 3
    in_dir = Path(d) / "in"
    in_dir.mkdir()
    for i, chunk in enumerate([rows[:third], rows[third : 2 * third], rows[2 * third :]]):
        staging = f"{d}/stage{i}"
        spark.createDataFrame(chunk, sw.EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        # the file source lists plain files, not .parquet output dirs —
        # move the single part file into the watched directory
        part = next(Path(staging).glob("part-*.parquet"))
        part.rename(in_dir / f"file{i}.parquet")
    yield str(in_dir)
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_stream_matches_batch(spark, sf_dir, replay_dir):
    q = sw.run_windowed_stream(spark, replay_dir, query_name="win_stream")
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("win_stream").collect()
    }

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.total_value)
        for r in sw.windowed_events(events).collect()
    }
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    watermark = max_ts - datetime.timedelta(hours=1)
    closed = {k: v for k, v in batch.items() if k[1] <= watermark}

    # emitted rows are exactly the closed windows, with identical values
    assert streamed == closed
    # and the replay genuinely withheld the open tail
    assert len(streamed) < len(batch)
    assert len(streamed) > 0
