"""Watermarked streaming dedup: stream/batch equivalence under replay.

Replays the sf0.001 events table as micro-batches with *injected
duplicate deliveries* (same natural key, fresh event_id — the
at-least-once producer-retry shape) and asserts:

  * the streamed survivor key set equals the batch-dedup key set over
    the same duplicated input — every key exactly once, duplicates
    collapsed;
  * the batch form counts the injected arrivals (n_arrivals > 1 for
    exactly the keys that were duplicated).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    dedup_stream as sd,
)


@pytest.fixture(scope="module")
def replay_with_dups(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="dedupstream_")
    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("event_id")
    )
    rows = events.collect()
    third = len(rows) // 3
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    # duplicate deliveries: re-send chunk 0's first 50 events inside
    # chunk 1 (cross-batch dup) and chunk 1's first 50 inside the same
    # chunk (intra-batch dup), with fresh event_ids like a retry would.
    max_id = max(r.event_id for r in rows)

    def resend(src_rows, bump):
        return [
            type(r)(
                event_id=max_id + bump + i,
                ts=r.ts,
                user_id=r.user_id,
                event_type=r.event_type,
                value=r.value,
                props=r.props,
            )
            for i, r in enumerate(src_rows)
        ]

    chunks[1] = chunks[1] + resend(chunks[0][:50], 1000)
    chunks[1] = chunks[1] + resend(chunks[1][:50], 2000)
    in_dir = Path(d) / "in"
    in_dir.mkdir()
    for i, chunk in enumerate(chunks):
        staging = f"{d}/stage{i}"
        spark.createDataFrame(chunk, sd.EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = next(Path(staging).glob("part-*.parquet"))
        part.rename(in_dir / f"file{i}.parquet")
    yield str(in_dir)
    shutil.rmtree(d, ignore_errors=True)


def test_streamed_dedup_matches_batch_keys(spark, sf_dir, replay_with_dups):
    q = sd.run_dedup_stream(spark, replay_with_dups, query_name="dedup_stream")
    q.awaitTermination(120)
    streamed = [
        (r.user_id, r.ts_us, r.event_type)
        for r in spark.table("dedup_stream")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_type")
        .collect()
    ]
    # exactly once per key
    assert len(streamed) == len(set(streamed))

    batch = sd.dedup_events(spark.read.parquet(replay_with_dups))
    batch_keys = {(r.user_id, r.ts_us, r.event_type) for r in batch.collect()}
    assert set(streamed) == batch_keys


def test_batch_dedup_counts_replays(spark, sf_dir, replay_with_dups):
    batch = sd.dedup_events(spark.read.parquet(replay_with_dups))
    dup_keys = batch.filter(F.col("n_arrivals") > 1)
    # 100 injected resends (some may share a key if the source data
    # already collides, but at least the distinct resent keys must show)
    assert dup_keys.count() >= 90
    total = spark.read.parquet(replay_with_dups).count()
    kept = batch.count()
    assert total - kept >= 100  # every resend collapsed


def test_incremental_dedup_stream_matches_batch_exact_tier(spark, sf_dir, tmp_path):
    """The streaming ingest gate (stream-static fp join) must classify
    exactly like the batch operator's exact tier on the same feed."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    split = dedup._incr_split(spark, sf_dir)
    fp = docs.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))
    indexed_fps = (
        fp.filter(F.col("doc_id") < split)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("match_id"))
    )

    # the incoming feed lands as multiple files -> multiple micro-batches
    feed_dir = str(tmp_path / "feed")
    docs.filter(F.col("doc_id") >= split).select("doc_id", "text").repartition(
        3
    ).write.parquet(feed_dir)

    q = sd.run_incremental_dedup_stream(
        spark, feed_dir, indexed_fps, query_name="incr_gate"
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in spark.sql("select * from incr_gate").collect()
    }

    batch = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in dedup.dedup_incremental(spark, sf_dir).collect()
    }
    assert set(streamed) == set(batch)
    for d, (verdict, match) in streamed.items():
        if verdict == "exact":
            assert batch[d] == ("exact", match)  # identical exact tier
        else:
            # stream gate has no near tier: batch refines some novels to near
            assert batch[d][0] in ("near", "novel")
