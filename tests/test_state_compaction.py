"""Direct unit gates for the shared bounded-state mechanism
(`streaming.state_compaction`), independent of any one gate: the
watermark skip, the compaction fold, the crash window between the
base commit and the partials clear, and the atomic generation-marker
commit that closes the old in-place-overwrite crash window (a crash
mid-base-write must leave the PREVIOUS folded history readable, and a
committed marker with a missing dir must be a hard error, never a
silent rebuild-from-partials)."""

from __future__ import annotations

import json

import pytest
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
    # base generation 0 committed with the fold's watermark; partials
    # hold only the tail
    assert state_compaction._base_generation(sd) == 0
    base = spark.read.parquet(f"{sd}/base_g0")
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


def test_second_compaction_advances_generation(spark, tmp_path):
    """Two full compaction cycles: the marker advances g0 → g1 and the
    superseded generation dir is garbage-collected."""
    sd = str(tmp_path / "state")
    n = 2 * state_compaction.COMPACT_EVERY
    got = None
    for b in range(n):
        got = state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
    assert _state(got) == [("a", n)]
    assert state_compaction._base_generation(sd) == 1
    assert not (tmp_path / "state" / "base_g0").exists()
    wmark = (
        spark.read.parquet(f"{sd}/base_g1").agg(F.max("wmark")).collect()[0][0]
    )
    assert wmark == n - 1


def test_crash_between_base_commit_and_partials_clear(spark, tmp_path):
    """Simulate the documented crash window: the base holds batches
    0..COMPACT_EVERY-2 folded (dir written AND marker committed), but
    their partials were never cleared. The > wmark filter must exclude
    the leftovers — the next accumulate sees exactly base + its own
    batch, not a double count."""
    sd = str(tmp_path / "state")
    for b in range(state_compaction.COMPACT_EVERY - 1):
        state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
    # manually stage the crash: write the would-be base and commit the
    # marker WITHOUT clearing the partials dir
    merged = _merge(spark.read.parquet(f"{sd}/partials").select("k", "v"))
    merged.withColumn(
        "wmark",
        F.lit(state_compaction.COMPACT_EVERY - 2).cast("long"),
    ).write.mode("overwrite").parquet(f"{sd}/base_g0")
    state_compaction._commit_base_generation(sd, 0)
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


def test_crash_during_base_write_keeps_old_generation(spark, tmp_path):
    """THE window the in-place overwrite lost history to: a crash while
    writing the NEXT base generation. The marker still names the old
    generation, so the next accumulate reads the intact old base — no
    folded history lost, no silent rebuild from partials."""
    sd = str(tmp_path / "state")
    n = state_compaction.COMPACT_EVERY + 2  # g0 committed + 2 live partials
    for b in range(n):
        state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
    assert state_compaction._base_generation(sd) == 0
    # stage the crash: a half-written next generation (junk dir, no
    # parquet footer) with the marker NOT advanced
    g1 = tmp_path / "state" / "base_g1"
    g1.mkdir()
    (g1 / "part-00000.parquet").write_bytes(b"\x00garbage")
    got = state_compaction.accumulate(
        spark, sd, n, _partial(spark, 1), ["k"], _merge
    )
    assert _state(got) == [("a", n + 1)]  # full history intact


def test_committed_marker_with_missing_dir_is_hard_error(spark, tmp_path):
    """A marker naming a generation whose dir is gone means the
    compacted history was damaged out-of-band; rebuilding from
    ≤ COMPACT_EVERY partials would be a permanent undercount for
    non-idempotent merges, so accumulate must refuse loudly."""
    sd = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    with open(f"{sd}/base_meta.json", "w") as fh:
        json.dump({"generation": 3}, fh)
    with pytest.raises(RuntimeError, match="base_g3 is missing"):
        state_compaction.accumulate(
            spark, sd, 0, _partial(spark, 1), ["k"], _merge
        )


def test_retry_above_watermark_dedups(spark, tmp_path):
    """A retried non-compacted batch re-appends identical rows; the
    (batch_id, keys) dedup absorbs them even for a + merge."""
    sd = str(tmp_path / "state")
    state_compaction.accumulate(spark, sd, 0, _partial(spark, 5), ["k"], _merge)
    again = state_compaction.accumulate(
        spark, sd, 0, _partial(spark, 5), ["k"], _merge
    )
    assert _state(again) == [("a", 5)]


def test_legacy_base_dir_without_marker_is_hard_error(spark, tmp_path):
    """A pre-generation-layout base dir with no marker holds folded
    history; treating it as 'no base yet' would silently discard it —
    accumulate must refuse loudly instead."""
    sd = str(tmp_path / "state")
    legacy = tmp_path / "state" / "base"
    legacy.mkdir(parents=True)
    _merge(_partial(spark, 7)).withColumn(
        "wmark", F.lit(3).cast("long")
    ).write.mode("overwrite").parquet(str(legacy))
    with pytest.raises(RuntimeError, match="pre-generation-layout"):
        state_compaction.accumulate(
            spark, sd, 9, _partial(spark, 1), ["k"], _merge
        )


def test_compaction_sweeps_orphaned_lower_generations(spark, tmp_path):
    """A crash after a past compaction's partials clear but before its
    rmtree leaks base_g{old}; the NEXT compaction must reclaim every
    generation below the committed one, not only the one it itself
    supersedes (advice, round 13)."""
    import os

    sd = str(tmp_path / "state")
    # drive enough batches for the first compaction (commits base_g0)
    for b in range(state_compaction.COMPACT_EVERY):
        state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
    assert state_compaction._base_generation(sd) == 0
    os.makedirs(f"{sd}/base_g-oops", exist_ok=True)  # non-matching: kept
    # drive to the next compaction (commits base_g1, sweeps base_g0)
    for b in range(
        state_compaction.COMPACT_EVERY, 2 * state_compaction.COMPACT_EVERY
    ):
        state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
    assert state_compaction._base_generation(sd) == 1
    # re-plant base_g0, simulating a generation a PAST crash leaked
    # between its partials clear and its own rmtree: it is NOT the
    # immediate predecessor of the next commit, so the old
    # only-sweep-what-I-supersede rule never revisited it.
    os.makedirs(f"{sd}/base_g0", exist_ok=True)
    open(f"{sd}/base_g0/leftover", "w").close()
    for b in range(
        2 * state_compaction.COMPACT_EVERY,
        3 * state_compaction.COMPACT_EVERY,
    ):
        state_compaction.accumulate(
            spark, sd, b, _partial(spark, 1), ["k"], _merge
        )
    assert state_compaction._base_generation(sd) == 2
    gens = sorted(
        n for n in os.listdir(sd)
        if n.startswith("base_g") and n[6:].isdigit()
    )
    assert gens == ["base_g2"], f"orphaned generations must be swept: {gens}"
    assert os.path.isdir(f"{sd}/base_g-oops")  # only ^base_g\d+$ swept
