"""Streaming small-file compactor: the ingest twin of
``operators.layout.layout_compaction_apply``, extending the
batch+streaming maintenance symmetry (dedup, drift, sketches, ANN
append/delete) to DATA LAYOUT — the gate that keeps a continuously
ingesting table's file count bounded instead of letting hourly
micro-files pile up until a nightly OPTIMIZE.

Contract and shape:

- The feed delivers ingest files in EVENT-TIME ORDER (the natural
  shape of hourly ingest — each trigger lands the next hour range).
  The deterministic bin rule (group = floor(exclusive running total /
  COMPACT_TARGET_ROWS) over hour-ordered inventory) then has a key
  monotonicity property: once any row of bin k+1 has arrived, bin k's
  membership can never change, so bin k is FINAL and safe to rewrite.
  Late data would violate this (a back-filled hour shifts every later
  boundary); a production deployment scopes the gate to closed
  partitions exactly as Delta/Iceberg compaction does — the SCALE.md
  round-12 note records the boundary.
- Per micro-batch: arriving rows append to ``out_dir``/staging
  (batch-id tagged; replayed batches re-append identical rows and the
  (batch_id, event_id) dedup restores exactly-once, same mechanism as
  the CMS gate), the bin plan recomputes over the deduped staging
  inventory (metadata-scale — one window over O(hours seen) rows),
  and every COMPLETE bin (group_id < the currently-filling max) not
  yet in ``out_dir``/compacted is rewritten as exactly one file via
  the same broadcast-map + clustering-repartition + partitionBy write
  the batch executor uses. Already-written bins are detected from the
  compacted dir itself, so a crash-retried batch skips them.
- ``finalize_compaction`` flushes the trailing still-filling bin when
  the feed is declared closed; after it, compacted == the batch
  ``compact_events`` output row-for-row and file-for-file
  (tests/test_streaming_compaction.py pins equivalence, restart
  idempotence, and the one-file-per-bin invariant).

State is bounded by retention, not lifetime: staging holds only rows
whose bin has not yet closed plus the finalized rows awaiting the
periodic staging sweep (``sweep_staging`` drops rows of bins already
compacted — kept separate from the hot path so the per-batch cost is
append + metadata, mirroring how real compactors defer deletes to
vacuum)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.layout import COMPACT_TARGET_ROWS, _US_PER_HOUR
from .windows import EVENTS_SCHEMA


def _staged(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Exactly-once view of the staged rows (replay dedup)."""
    return spark.read.parquet(staging_dir).dropDuplicates(
        ["batch_id", "event_id"]
    )


def _swept_offset(spark: SparkSession, out_dir: str) -> int:
    """Cumulative row count removed from staging by sweeps. Because
    sweeps remove exact BIN PREFIXES of the global hour-ordered cum,
    group = (offset + local_cum_before) DIV target reproduces the
    original bin numbering for every remaining row (the first
    remaining row's global running total is exactly the offset)."""
    try:
        return int(
            spark.read.parquet(f"{out_dir}/swept")
            .agg(F.max("rows"))
            .collect()[0][0]
        )
    except Exception:
        return 0


def _bin_plan(staged: DataFrame, offset: int = 0) -> DataFrame:
    """(hour, group_id) over the staged inventory — the batch
    planner's deterministic rule, metadata-scale. ``offset`` restores
    global numbering after staging sweeps (see _swept_offset)."""
    from pyspark.sql import Window

    inv = (
        staged.select(
            F.expr(f"unix_micros(ts) DIV {_US_PER_HOUR}").alias("hour")
        )
        .groupBy("hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    cum_before = F.coalesce(
        F.sum("n_rows").over(
            Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return inv.select("hour", (cum_before + F.lit(int(offset))).alias("cb")).select(
        "hour", F.expr(f"cb DIV {COMPACT_TARGET_ROWS}").alias("group_id")
    )


def _written_groups(spark: SparkSession, compacted_dir: str) -> set[int]:
    try:
        return {
            int(r["group_id"])
            for r in spark.read.parquet(compacted_dir)
            .select("group_id")
            .distinct()
            .collect()
        }  # bounded: one row per compacted bin (metadata-scale)
    except Exception:
        return set()


def _write_bins(
    staged: DataFrame, plan: DataFrame, group_ids: list[int], compacted_dir: str
) -> None:
    if not group_ids:
        return
    groups = F.broadcast(
        plan.filter(F.col("group_id").isin([int(g) for g in group_ids]))
    )
    (
        staged.drop("batch_id")
        .withColumn("hour", F.expr(f"unix_micros(ts) DIV {_US_PER_HOUR}"))
        .join(groups, "hour")
        .drop("hour")
        .repartition("group_id")
        .write.mode("append")
        .partitionBy("group_id")
        .parquet(compacted_dir)
    )


def run_compaction_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Continuous bin compaction over an event-time-ordered events
    parquet feed. See the module docstring for the contract."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    staging_dir = f"{out_dir}/staging"
    compacted_dir = f"{out_dir}/compacted"

    def _tick(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        ).write.mode("append").parquet(staging_dir)
        staged = _staged(spark, staging_dir)
        plan = _bin_plan(staged, _swept_offset(spark, out_dir))
        gids = sorted(
            r["group_id"] for r in plan.select("group_id").distinct().collect()
        )  # bounded: one row per bin currently in staging
        if len(gids) <= 1:
            return  # nothing complete yet — the only bin is still filling
        done = _written_groups(spark, compacted_dir)
        ready = [g for g in gids[:-1] if g not in done]
        _write_bins(staged, plan, ready, compacted_dir)

    writer = raw.writeStream.foreachBatch(_tick).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def finalize_compaction(spark: SparkSession, out_dir: str) -> None:
    """Declare the feed closed and flush every remaining bin
    (including the trailing still-filling one). Idempotent: bins
    already on disk are skipped."""
    staging_dir = f"{out_dir}/staging"
    compacted_dir = f"{out_dir}/compacted"
    staged = _staged(spark, staging_dir)
    plan = _bin_plan(staged, _swept_offset(spark, out_dir))
    gids = sorted(
        r["group_id"] for r in plan.select("group_id").distinct().collect()
    )
    done = _written_groups(spark, compacted_dir)
    _write_bins(staged, plan, [g for g in gids if g not in done], compacted_dir)


def sweep_staging(spark: SparkSession, out_dir: str) -> None:
    """Vacuum: rewrite staging down to rows whose bin is NOT yet
    compacted (bounded retention — the deferred-delete half real
    compactors run out-of-band), recording the cumulative swept row
    count so bin numbering stays global (see _swept_offset)."""
    staging_dir = f"{out_dir}/staging"
    offset = _swept_offset(spark, out_dir)
    staged = _staged(spark, staging_dir).localCheckpoint(eager=True)
    plan = _bin_plan(staged, offset)
    done = _written_groups(spark, f"{out_dir}/compacted")
    keep_hours = F.broadcast(
        plan.filter(~F.col("group_id").isin([int(g) for g in done])).select(
            "hour"
        )
    )
    remaining = (
        staged.withColumn(
            "hour", F.expr(f"unix_micros(ts) DIV {_US_PER_HOUR}")
        )
        .join(keep_hours, "hour")
        .drop("hour")
    ).localCheckpoint(eager=True)
    n_swept = staged.count() - remaining.count()
    remaining.write.mode("overwrite").parquet(staging_dir)
    spark.createDataFrame(
        [(int(offset) + int(n_swept),)], "rows long"
    ).write.mode("overwrite").parquet(f"{out_dir}/swept")
