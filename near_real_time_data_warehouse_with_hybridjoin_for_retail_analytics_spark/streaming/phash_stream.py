"""Streaming perceptual-hash ingest gate: the image twin of the text
near-dup gate (`dedup_stream.run_incremental_dedup_stream`) and the
vector gate (`run_embedding_dedup_stream`), driving the SAME
``classify_phash_increment`` the batch ``dedup_phash_incremental``
entry uses — one copy of the semantics, two execution modes.

Per micro-batch: incoming documents run the REAL image path (BMP
encode → header-parsing decode → resize → dHash, Arrow-batched, zero
shuffle), the 4×16-bit band keys join the STATIC indexed band table
(cross-boundary only — linear in the increment), candidates verify by
exact 64-bit Hamming, and one verdict row per incoming doc (exact /
near / novel, with the deterministic best match) is appended to the
output directory tagged with the batch id. Replays dedupe on
(batch_id, doc_id) when read back — verdicts are a pure function of
(document, index), so a retried batch appends identical rows and the
dedup makes the read-back exactly-once.

At 100 TB the indexed side is yesterday's persisted phash table (the
same artifact `dedup_phash` mines pairs from); the gate touches it
only through the band-key equi-join, so state and per-batch cost are
bounded by the increment, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.multimodal import (
    PHASH_SCHEMA,
    attach_binary_payload,
    classify_phash_increment,
    phash_dhash_bands,
)

DOCS_PHASH_SCHEMA = "doc_id long, text string, source string"


def batch_phash_bands(df: DataFrame) -> DataFrame:
    """One micro-batch's (doc_id, b0..b3) — exactly the batch
    operator's dHash construction over the batch rows."""
    return attach_binary_payload(df).mapInPandas(
        phash_dhash_bands, PHASH_SCHEMA
    )


def run_phash_stream(
    spark: SparkSession,
    input_dir: str,
    indexed_bands: DataFrame,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Continuous image near-dup gating of a (doc_id, text, source)
    parquet feed against a static indexed phash table. Appends one
    (doc_id, verdict, match_id, hamming, batch_id) row per incoming
    doc to ``out_dir``."""

    raw = (
        spark.readStream.schema(DOCS_PHASH_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = classify_phash_increment(
            batch_phash_bands(batch_df), indexed_bands
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        verdicts.write.mode("append").parquet(out_dir)

    writer = raw.writeStream.foreachBatch(_gate).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_gate_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Exactly-once read-back: replayed batches appended identical
    rows, so the (batch_id, doc_id) dedup restores one verdict per
    arrival."""
    return spark.read.parquet(out_dir).dropDuplicates(["batch_id", "doc_id"])
