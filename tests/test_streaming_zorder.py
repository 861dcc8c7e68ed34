"""Streaming z-order maintenance gate (`streaming.zorder_stream`):
batch/stream layout equivalence, exactly-once under full replay,
dirty-bucket-only rewrites (clean buckets carried by metadata link),
and bounded staging after vacuum."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    layout,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    zorder_stream,
)

SF = "/root/testdata/sf0.001"
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _feed(spark, tmp_path, n_files=5) -> str:
    """The events table split into n ingest files (z-buckets don't
    care about arrival order)."""
    feed = str(tmp_path / "feed")
    ev = load_table(spark, SF, "events")
    ev.withColumn("part", F.pmod(F.col("event_id"), F.lit(n_files))).repartition(
        n_files, "part"
    ).drop("part").write.mode("overwrite").parquet(feed)
    return feed


def _run(spark, feed, out, ckpt, threshold=60):
    q = zorder_stream.run_zorder_stream(
        spark, feed, out,
        max_files_per_trigger=1,
        checkpoint=ckpt,
        rewrite_staged_rows=threshold,
    )
    q.awaitTermination(120)


def _base_rows(spark, out):
    gen, _ = zorder_stream._gen_state(out)
    base = zorder_stream._base_dir(out, gen)
    df = spark.read.parquet(base)
    return sorted(tuple(r) for r in df.select(*COLS, "file_bucket").collect())


def test_stream_zorder_matches_batch_executor(spark, tmp_path):
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "zs")
    _run(spark, feed, out, str(tmp_path / "ck0"))
    zorder_stream.finalize_zorder(spark, out)

    dest = str(tmp_path / "batch")
    layout.zorder_apply_events(spark, SF, dest)
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(dest).select(*COLS, "file_bucket").collect()
    )
    got = _base_rows(spark, out)
    assert got == want

    # one file per bucket, exactly like the batch executor
    gen, _ = zorder_stream._gen_state(out)
    base = zorder_stream._base_dir(out, gen)
    for name in os.listdir(base):
        if name.startswith("file_bucket="):
            files = [
                f for f in os.listdir(os.path.join(base, name))
                if not f.startswith(("_", "."))
            ]
            assert len(files) == 1, name


def test_full_replay_is_exactly_once(spark, tmp_path):
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "zs")
    _run(spark, feed, out, str(tmp_path / "ck0"))
    zorder_stream.finalize_zorder(spark, out)
    first = _base_rows(spark, out)

    # checkpoint lost: the whole feed replays into the same sink
    _run(spark, feed, out, str(tmp_path / "ck1"))
    zorder_stream.finalize_zorder(spark, out)
    again = _base_rows(spark, out)
    assert again == first

    # and the reader view (base + unfolded staging) has no duplicates
    view = zorder_stream.clustered_table(spark, out)
    assert view.count() == view.select("event_id").distinct().count()


def test_fold_rewrites_only_dirty_buckets(spark, tmp_path):
    """The liquid-clustering property: a fold whose staged rows touch
    a few buckets carries every CLEAN bucket's file into the new
    generation by hardlink (same inode), never a rewrite."""
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "zs")
    _run(spark, feed, out, str(tmp_path / "ck0"))
    zorder_stream.finalize_zorder(spark, out)
    gen0, _ = zorder_stream._gen_state(out)
    base0 = zorder_stream._base_dir(out, gen0)
    inodes0 = {}
    for name in os.listdir(base0):
        if name.startswith("file_bucket="):
            d = os.path.join(base0, name)
            f = [x for x in os.listdir(d) if not x.startswith(("_", "."))][0]
            inodes0[name] = os.stat(os.path.join(d, f)).st_ino

    # more ingest arrives in the SAME feed (same pipeline, same
    # checkpoint — batch ids continue monotonically), touching ONE
    # user/hour region → few dirty buckets
    import datetime as dt

    late = spark.createDataFrame(
        [
            (10_000 + i, dt.datetime(2024, 1, 1, 0, 0, i), 3, "view", 1.0, "{}")
            for i in range(30)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    late.coalesce(1).write.mode("append").parquet(feed)
    _run(spark, feed, out, str(tmp_path / "ck0"), threshold=10)
    zorder_stream.finalize_zorder(spark, out)

    gen1, _ = zorder_stream._gen_state(out)
    assert gen1 > gen0
    base1 = zorder_stream._base_dir(out, gen1)
    dirty = {
        f"file_bucket={int(r[0])}"
        for r in zorder_stream._bucketed(late)
        .select("file_bucket").distinct().collect()
    }
    carried = rewritten = 0
    for name, ino in inodes0.items():
        d = os.path.join(base1, name)
        files = [x for x in os.listdir(d) if not x.startswith(("_", "."))]
        assert len(files) == 1, name
        ino1 = os.stat(os.path.join(d, files[0])).st_ino
        if name in dirty:
            assert ino1 != ino, f"dirty bucket {name} must be rewritten"
            rewritten += 1
        else:
            assert ino1 == ino, f"clean bucket {name} must be linked"
            carried += 1
    assert rewritten >= 1
    # row accounting: new base == old rows + late rows
    n0 = spark.read.parquet(base0).count() if os.path.isdir(base0) else None
    assert spark.read.parquet(base1).count() == (n0 or 0) + 30


def test_sweep_reclaims_folded_staging_and_old_generations(spark, tmp_path):
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "zs")
    _run(spark, feed, out, str(tmp_path / "ck0"), threshold=40)
    zorder_stream.finalize_zorder(spark, out)
    before = _base_rows(spark, out)
    zorder_stream.sweep_staging(spark, out)
    gen, folded = zorder_stream._gen_state(out)
    staging = os.path.join(out, "staging")
    surv = spark.read.parquet(staging).count() if os.path.isdir(staging) else 0
    assert surv == 0  # everything folded → vacuum empties staging
    root = os.path.join(out, "clustered")
    gens = [n for n in os.listdir(root) if n.startswith("base_g")]
    assert gens == [f"base_g{gen}"]
    assert _base_rows(spark, out) == before
    # marker survives and the reader view still serves the full table
    assert json.load(open(zorder_stream._marker_path(out)))["gen"] == gen
    n_src = load_table(spark, SF, "events").count()
    assert zorder_stream.clustered_table(spark, out).count() == n_src


def test_interrupted_sweep_swap_recovers_unfolded_rows(spark, tmp_path):
    """Crash between the sweep's two renames (staging gone, survivors
    sitting in staging.next): every staging consumer recovers the swap
    first, so unfolded rows are never invisible to readers or lost to
    the next fold."""
    import datetime as dt

    out = str(tmp_path / "zs")
    os.makedirs(out)
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), i % 5, "view", 1.0, "{}", b)
        for b in range(3)
        for i in range(b * 10, b * 10 + 10)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string, batch_id long",
    )
    staged = zorder_stream._bucketed(df)  # batch_id passes through
    staging = os.path.join(out, "staging")
    # base generation = batches 0..1 folded
    base = zorder_stream._base_dir(out, 0)
    (
        staged.filter("batch_id <= 1").drop("batch_id")
        .repartition("file_bucket").write.mode("overwrite")
        .partitionBy("file_bucket").parquet(base)
    )
    with open(zorder_stream._marker_path(out), "w") as fh:
        json.dump({"gen": 0, "folded_through": 1}, fh)
    staged.write.mode("overwrite").parquet(staging)
    # simulate the interrupted swap: survivors fully in .next, staging
    # renamed away (the exact crash window between the two renames)
    surv = spark.read.parquet(staging).filter("batch_id > 1")
    surv.write.mode("overwrite").parquet(staging + ".next")
    os.rename(staging, staging + ".old")

    view = zorder_stream.clustered_table(spark, out)
    assert view.count() == 30  # 20 folded + 10 unfolded, none lost
    assert os.path.isdir(staging) and not os.path.isdir(staging + ".old")
    zorder_stream.finalize_zorder(spark, out)
    gen, folded = zorder_stream._gen_state(out)
    assert (gen, folded) == (1, 2)
    assert spark.read.parquet(zorder_stream._base_dir(out, gen)).count() == 30
