"""Stream-stream interval join: the replayed two-stream join produces
exactly the batch attribution pairs (inner joins emit eagerly; the
watermark only bounds state, so a full replay yields the full result)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    interval_join as ij,
)


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="ijstream_")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    rows = events.orderBy("event_id").collect()
    third = len(rows) // 3
    in_dir = Path(d) / "in"
    in_dir.mkdir()
    for i, chunk in enumerate(
        [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    ):
        staging = f"{d}/stage{i}"
        spark.createDataFrame(chunk, ij.EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = next(Path(staging).glob("part-*.parquet"))
        part.rename(in_dir / f"file{i}.parquet")
    yield str(in_dir)
    shutil.rmtree(d, ignore_errors=True)


def test_stream_join_matches_batch(spark, replay_dir):
    q = ij.run_attribution_stream(spark, replay_dir, query_name="attr_stream")
    q.awaitTermination(180)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM attr_stream").collect()
    )
    batch = ij.attribution_pairs(spark.read.parquet(replay_dir))
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    assert len(want) > 0  # fixture actually exercises the join
