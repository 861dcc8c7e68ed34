"""Direct unit gates for the shared bounded-state mechanism
(`streaming.state_compaction`), independent of any one gate: the
watermark skip, the compaction fold, and the crash window between the
base overwrite and the partials clear."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    state_compaction,
)


def _merge(cells):
    return cells.groupBy("k").agg(F.sum("v").cast("long").alias("v"))


def _partial(spark, v):
    return spark.createDataFrame([("a", v)], "k string, v long")


def _state(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_fold_compact_and_watermark_skip(spark, tmp_path):
    sd = str(tmp_path / "state")
    seen = None
    for b in range(state_compaction.COMPACT_EVERY + 2):
        seen = state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
        assert _state(seen) == [("a", b + 1)]
    # base exists with the fold's watermark; partials hold only the tail
    base = spark.read.parquet(f"{sd}/base")
    wmark = base.agg(F.max("wmark")).collect()[0][0]
    assert wmark == state_compaction.COMPACT_EVERY - 1
    live = spark.read.parquet(f"{sd}/partials").select("batch_id").distinct()
    assert live.count() == 2
    # replay of a compacted batch: its APPEND is skipped (state frozen
    # — no double count) but the current merged state still comes back
    # so the caller can re-publish a report the crash may have eaten
    replay = state_compaction.accumulate(
        spark, sd, 0, _partial(spark, 1), ["k"], _merge
    )
    assert _state(replay) == _state(seen)
    nxt = state_compaction.accumulate(
        spark, sd, 99, _partial(spark, 1), ["k"], _merge
    )
    assert _state(nxt) == [("a", state_compaction.COMPACT_EVERY + 3)]


def test_crash_between_base_write_and_partials_clear(spark, tmp_path):
    """Simulate the documented crash window: the base holds batches
    0..7 folded, but their partials were never cleared. The > wmark
    filter must exclude the leftovers — the next accumulate sees
    exactly base + its own batch, not a double count."""
    sd = str(tmp_path / "state")
    for b in range(state_compaction.COMPACT_EVERY - 1):
        state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
    # manually stage the crash: write the would-be base WITHOUT
    # clearing the partials dir
    merged = _merge(
        spark.read.parquet(f"{sd}/partials").select("k", "v")
    )
    merged.withColumn(
        "wmark",
        F.lit(state_compaction.COMPACT_EVERY - 2).cast("long"),
    ).write.mode("overwrite").parquet(f"{sd}/base")
    leftovers = spark.read.parquet(f"{sd}/partials").count()
    assert leftovers > 0  # the crash left them behind
    got = state_compaction.accumulate(
        spark,
        sd,
        state_compaction.COMPACT_EVERY - 1,
        _partial(spark, 1),
        ["k"],
        _merge,
    )
    assert _state(got) == [("a", state_compaction.COMPACT_EVERY)]


def test_retry_above_watermark_dedups(spark, tmp_path):
    """A retried non-compacted batch re-appends identical rows; the
    (batch_id, keys) dedup absorbs them even for a + merge."""
    sd = str(tmp_path / "state")
    state_compaction.accumulate(spark, sd, 0, _partial(spark, 5), ["k"], _merge)
    again = state_compaction.accumulate(
        spark, sd, 0, _partial(spark, 5), ["k"], _merge
    )
    assert _state(again) == [("a", 5)]
