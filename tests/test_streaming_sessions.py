"""Stateful streaming sessionization vs batch ground truth.

Replays sf0.001 events in event-time order as 3 micro-batches through
the applyInPandasWithState sessionizer and asserts every emitted
session is byte-identical (up to float tolerance on the value sum) to a
batch-computed session, with no duplicates, and that all sessions whose
close is provably past the final watermark were emitted.
"""

from __future__ import annotations

import math
import shutil
import tempfile
from pathlib import Path

import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    sessions as ss,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    windows as sw,
)

DELAY_US = 3_600_000_000  # 1 hour watermark delay


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sessstream_")
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts")
        .collect()
    )
    third = len(rows) // 3
    in_dir = Path(d) / "in"
    in_dir.mkdir()
    for i, chunk in enumerate([rows[:third], rows[third : 2 * third], rows[2 * third :]]):
        staging = f"{d}/stage{i}"
        spark.createDataFrame(chunk, sw.EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = next(Path(staging).glob("part-*.parquet"))
        part.rename(in_dir / f"file{i}.parquet")
    yield str(in_dir)
    shutil.rmtree(d, ignore_errors=True)


def test_streamed_sessions_match_batch(spark, sf_dir, replay_dir):
    q = ss.run_session_stream(spark, replay_dir, query_name="sess_stream")
    q.awaitTermination(180)
    streamed = [
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events, r.total_value)
        for r in spark.table("sess_stream").collect()
    ]
    batch = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events): r.total_value
        for r in ss.etl_user_sessions(spark, sf_dir).collect()
    }

    # no duplicate emissions
    keys = [s[:4] for s in streamed]
    assert len(keys) == len(set(keys))
    assert len(streamed) > 0

    # every emitted session is a batch session (exact bounds/counts,
    # float-tolerant value sum: the stream accumulates doubles in event
    # order, the batch sums exact decimals)
    for user_id, start_us, end_us, n, total in streamed:
        assert (user_id, start_us, end_us, n) in batch
        assert math.isclose(total, batch[(user_id, start_us, end_us, n)], rel_tol=1e-9)

    # completeness: sessions provably closed before the final watermark
    # (end + gap ≤ watermark) must all have been emitted
    max_ts_us = max(b[2] for b in batch)
    watermark_us = max_ts_us - DELAY_US
    provably_closed = {
        k for k in batch if k[2] + ss.GAP_US <= watermark_us
    }
    emitted = {s[:4] for s in streamed}
    missing = provably_closed - emitted
    assert not missing, f"{len(missing)} closed sessions never emitted"
