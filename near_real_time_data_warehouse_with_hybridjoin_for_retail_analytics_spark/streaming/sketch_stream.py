"""Streaming KMV cardinality gate: the ingest twin of
``operators.sketches.sketch_distinct_tokens``.

KMV sketches are the textbook STREAMING summary — the k smallest
hashes of a set are a bounded, order-insensitive, mergeable state:
sketch(A ∪ B) = top-k(sketch(A) ∪ sketch(B)), exactly. That identity
is what makes a per-language distinct-token monitor possible over an
unbounded document feed without ever holding the token inventory: the
state is ≤ |langs|·k (token, hash) rows regardless of how much text
has flowed past, and the estimate after batch n is BIT-IDENTICAL to
the batch operator run over the union of batches 1..n (same
deterministic md5-based hash family, same (h, token) rank tiebreak,
same estimator expression — pinned by the pytest equivalence gate).

Gate shape mirrors the other ingest gates (dedup, drift): parquet
feed → ``foreachBatch`` → per-batch partial sketches appended to the
state directory tagged with the batch id → merged report overwritten
after every batch. Crash-retry replays dedupe exactly on
(batch_id, lang, token); a restart over the same checkpoint leaves
the report unchanged (both tested). A production deployment watches
``n_est`` per language for the two ingest alarms this gate exists
for: vocabulary explosion (crawler started ingesting junk) and
vocabulary collapse (a source went dark or degenerate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from . import state_compaction
from ..operators.dedup import TOKEN_SPLIT, portable_hash60
from ..operators.sketches import KMV_K, _H_SPACE

DOCS_SKETCH_SCHEMA = "doc_id long, text string, lang string"


def batch_token_sketch(df: DataFrame) -> DataFrame:
    """(lang, token, h): one micro-batch's per-language KMV sketch —
    the k smallest 60-bit token hashes, (h, token)-rank tiebreak,
    exactly the batch operator's sketch construction."""
    toks = df.select(
        "lang", F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token")
    ).dropDuplicates(["lang", "token"])
    hashed = toks.select("lang", "token", portable_hash60("token").alias("h"))
    w = Window.partitionBy("lang").orderBy("h", "token")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .select("lang", "token", "h")
    )


def sketch_merge(state: DataFrame) -> DataFrame:
    """KMV merge law as a state→state fold: k smallest per language of
    the deduplicated union, (h, token) tiebreak — associative and
    idempotent, the properties the shared compaction relies on."""
    w = Window.partitionBy("lang").orderBy("h", "token")
    return (
        state.dropDuplicates(["lang", "token"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .select("lang", "token", "h")
    )


def sketch_report(state: DataFrame) -> DataFrame:
    """(lang, n_sketch, n_est) from accumulated sketch partials.
    Merging is top-k of the deduplicated union (the KMV merge law);
    the estimator expression is operand-identical to the batch
    operator's, so when the report and the batch entry see the same
    corpus the doubles agree to the bit. ``n_sketch`` < k means the
    sketch is exhaustive and ``n_est`` is exact."""
    w = Window.partitionBy("lang").orderBy("h", "token")
    merged = (
        state.dropDuplicates(["lang", "token"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
    )
    est = F.when(
        F.count(F.lit(1)) < KMV_K, F.count(F.lit(1)).cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        * F.lit(_H_SPACE)
        / F.max(F.when(F.col("rk") == KMV_K, F.col("h")))
    )
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            est.alias("n_est"),
        )
        .orderBy("lang")
    )


def run_token_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Continuous per-language distinct-token monitoring over a
    (doc_id, text, lang) parquet feed. Each micro-batch's ≤ |langs|·k
    partial sketch folds into the shared bounded state
    (``state_compaction.accumulate`` — the KMV k-min-union merge is
    idempotent, so the compaction watermark skip is merely redundant
    here; compaction still bounds state regardless of gate lifetime)
    and the cardinality report derived from the merged sketch
    overwrites ``out_dir``.

    Single-writer contract ENFORCED since round 17 (round-16 verdict
    item 3): replay dedup makes the partial appends idempotent, but a
    second FOLDER with a fresh checkpoint would still corrupt the
    compaction watermark — so the shared state dir is fenced exactly
    like the z-order/compaction/fact sinks (``fencing``): a second
    pipeline attaching to a live state raises ``WriterFencedError`` at
    start, a superseded writer fails its next batch, and the token is
    exposed as ``query.writer_token`` for graceful release."""
    from .fencing import acquire_writer

    token = acquire_writer(spark, state_dir)
    raw = (
        spark.readStream.schema(DOCS_SKETCH_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        token.verify_and_renew()  # fail the batch, never zombie-fold
        merged = state_compaction.accumulate(
            spark,
            state_dir,
            batch_id,
            batch_token_sketch(batch_df),
            dedup_cols=["lang", "token"],
            merge_state=sketch_merge,
        )
        sketch_report(merged).write.mode("overwrite").parquet(out_dir)

    writer = raw.writeStream.foreachBatch(_update).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    token.bind_query(str(q.runId))
    q.writer_token = token
    return q
