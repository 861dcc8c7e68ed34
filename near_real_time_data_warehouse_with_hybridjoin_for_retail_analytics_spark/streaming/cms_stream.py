"""Streaming Count-Min ingest gate: the ingest twin of
``operators.sketches.sketch_count_min``, completing the streaming
sketch triad (KMV distinct gate, HLL register gate, CMS frequency
gate).

Per (source, row, bucket) the state is a running SUM of token arrivals
— bounded at |sources|·CMS_DEPTH·CMS_WIDTH rows no matter how much
text has flowed past, and mergeable by construction: cells(A) +
cells(B) = cells(A ∪ B) exactly (Count-Min's linearity, the property
that lets production CMS pipelines merge per-shard sketches with one
vector add). Because the bucket arithmetic is the same salted-md5
family the batch operator uses (``cms_bucket_col`` ==
``_cms_bucket_sql``), the merged cell table after batch n is
BIT-IDENTICAL to ``cms_cell_table`` run over the union of batches 1..n
— pinned by the pytest equivalence gate (tests/test_streaming_cms.py).

Gate shape mirrors the other ingest gates (dedup, drift, KMV, HLL):
parquet feed → ``foreachBatch`` → per-batch partial cell tables
appended to the state directory tagged with the batch id → SUM-merged
report overwritten after every batch. State is kept BOUNDED by
periodic compaction: every CMS_COMPACT_EVERY batches the accumulated
partials fold into one merged base table stamped with a high-watermark
batch id, so neither on-disk state nor per-batch merge cost grows with
gate lifetime (see ``run_cms_stream`` for the replay-safety argument
across the compaction boundary). One contrast with the HLL gate
matters for correctness and is therefore load-bearing here: MAX is
idempotent under replay, + is NOT — a crash-retried micro-batch that
re-appended its partial would double-count every token it carried. The
(batch_id, source, i, bucket) dedup before the merge is what restores
exactly-once semantics over an at-least-once foreachBatch, the same
mechanism the hybrid-join sink uses for its idempotent-replay
guarantee. A deployment watches per-source cell mass for the ingest
alarms Count-Min exists for: a token flood from one source (junk or
attack traffic) shifts that source's total count within one
micro-batch, long before any exact per-token count could be afforded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import cms_cell_table

DOCS_CMS_SCHEMA = "doc_id long, text string, source string"


def batch_cms_partial(df: DataFrame) -> DataFrame:
    """One micro-batch's (source, i, bucket, cnt) partial — exactly the
    batch operator's cell construction over the batch rows."""
    return cms_cell_table(df)


def cms_report(state: DataFrame) -> DataFrame:
    """SUM-merge accumulated cell partials into the current
    (source, i, bucket, cnt) table — operand-identical to the batch
    operator over the union of all batches seen so far (CMS
    linearity)."""
    return (
        state.groupBy("source", "i", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .orderBy("source", "i", "bucket")
    )


# Fold accumulated per-batch partials into the compacted base once
# this many batches pile up. Without compaction the state directory —
# and the per-batch merge input — grew by one partial per micro-batch
# FOREVER: the "bounded at |sources|·DEPTH·WIDTH rows" claim held per
# partial, not for the accumulated state. With it, state is at most
# base (one merged cell table) + CMS_COMPACT_EVERY partials at any
# time, so a gate that has run for a year costs the same per batch as
# one that started this morning.
CMS_COMPACT_EVERY = 8
_WMARK_SENTINEL = -1  # base "watermark" column value when no base yet


def _read_base(spark: SparkSession, base_dir: str) -> tuple[DataFrame | None, int]:
    """(compacted cells, high-watermark batch id), or (None, -1)."""
    try:
        base = spark.read.parquet(base_dir)
    except Exception:
        return None, _WMARK_SENTINEL
    wmark = base.agg(F.max("wmark")).collect()[0][0]
    return base.select("source", "i", "bucket", "cnt"), int(wmark)


def run_cms_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Continuous per-source token-frequency sketching over a
    (doc_id, text, source) parquet feed, with BOUNDED on-disk state.

    Per micro-batch: the ≤ |sources|·DEPTH·WIDTH-row partial is
    appended to ``state_dir``/partials (batch-id tagged), replayed
    partials are deduped on (batch_id, source, i, bucket) — the step
    that makes the non-idempotent + merge exactly-once — and the
    SUM-merge of (compacted base + live partials) overwrites
    ``out_dir``. Every CMS_COMPACT_EVERY batches the live partials are
    folded into the base (one merged cell table stamped with the max
    folded batch id as ``wmark``) and the partials directory is
    cleared, so state never exceeds base + CMS_COMPACT_EVERY partials.

    Replay across the compaction boundary stays exactly-once: a
    crash-retried batch whose id is ≤ the base watermark is already
    inside the compacted cells (its batch-id tag is gone, so the dedup
    could no longer catch it) and is skipped outright; a retried batch
    above the watermark re-appends identical rows and the dedup
    collapses them as before. A crash between the base overwrite and
    the partials clear only leaves ≤-watermark partials behind, which
    the > wmark filter excludes until the next compaction's overwrite
    removes them."""

    raw = (
        spark.readStream.schema(DOCS_CMS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    partials_dir = f"{state_dir}/partials"
    base_dir = f"{state_dir}/base"

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        base, wmark = _read_base(spark, base_dir)
        if int(batch_id) <= wmark:
            return  # replay of an already-compacted batch
        partial = batch_cms_partial(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        partial.write.mode("append").parquet(partials_dir)
        live = (
            spark.read.parquet(partials_dir)
            .filter(F.col("batch_id") > wmark)
            .dropDuplicates(["batch_id", "source", "i", "bucket"])
        )
        cells = live.select("source", "i", "bucket", "cnt")
        if base is not None:
            cells = cells.unionByName(base)
        merged = cms_report(cells)
        merged.write.mode("overwrite").parquet(out_dir)
        n_live = live.select("batch_id").distinct().count()
        if n_live >= CMS_COMPACT_EVERY:
            new_wmark = live.agg(F.max("batch_id")).collect()[0][0]
            spark.read.parquet(out_dir).withColumn(
                "wmark", F.lit(int(new_wmark)).cast("long")
            ).write.mode("overwrite").parquet(base_dir)
            spark.createDataFrame([], live.schema).write.mode(
                "overwrite"
            ).parquet(partials_dir)

    writer = raw.writeStream.foreachBatch(_update).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
