"""Streaming deduplication over the events stream.

The reference ingests an at-least-once CSV feed and relies on its
PostgreSQL sink's ``ON CONFLICT DO NOTHING`` to absorb replays
(``/root/reference/hybridjoin.py:440-460``). The Spark-native form of
that guarantee is dedup *inside the stream*: keep the first arrival per
natural key and let the watermark bound how long the key state lives.

One transformation, two execution modes (the stream/batch-equivalence
design used throughout this repo):

  * batch: ``dedup_events(df)`` — registered as the oracle-checked
    query ``etl_stream_dedup`` (min-event_id survivor + arrival count
    per key, so the batch form is deterministic and hash-checkable);
  * streaming: ``run_dedup_stream`` replays event files as
    micro-batches through ``dropDuplicatesWithinWatermark`` — the
    at-scale pattern: state for a key is dropped once the watermark
    passes it, so memory is bounded by (keys arriving within one
    watermark window), not by stream length.

Scale notes: the dedup state store shuffles on the natural key, the
same exchange a batch groupBy would use; skewed keys are absorbed by
AQE in batch mode and by state-store partitioning in streaming mode.
The watermark delay is the replay-tolerance knob — arrivals farther
apart than the delay are treated as new.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..catalog import load_table
from ..plans.registry import query
from .windows import EVENTS_SCHEMA

# Natural identity of an event in the at-least-once feed: the producer
# retries carry a fresh event_id but the same logical occurrence.
DEDUP_KEYS = ["user_id", "ts", "event_type"]


def dedup_events(events: DataFrame) -> DataFrame:
    """First-arrival dedup, batch form: min event_id survives per key,
    with the arrival count kept as the replay-rate observability signal.
    (``dropDuplicates`` keeps an *arbitrary* row — min-id is the
    deterministic equivalent a batch backfill must use to agree with
    itself across runs.)"""
    return (
        events.groupBy(*DEDUP_KEYS)
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count(F.lit(1)).alias("n_arrivals"),
        )
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "first_event_id",
            "n_arrivals",
        )
    )


@query(
    "etl_stream_dedup",
    """
    SELECT user_id, epoch_us(ts) AS ts_us, event_type,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id,
           CAST(COUNT(*) AS BIGINT) AS n_arrivals
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def etl_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the streaming dedup (same transformation)."""
    return dedup_events(load_table(spark, sf_dir, "events"))


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str,
    watermark_delay: str = "1 hour",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Replay event parquet files as micro-batches through watermarked
    streaming dedup into an in-memory table named ``query_name``.

    ``dropDuplicatesWithinWatermark`` keeps the first arrival per
    ``DEDUP_KEYS`` and evicts a key's state once the watermark (max
    event time − delay) passes its timestamp — the bounded-memory
    exactly-once surface over an at-least-once source."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    deduped = raw.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        DEDUP_KEYS
    )
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


DOCS_STREAM_SCHEMA = "doc_id long, text string"


def classify_exact(
    fp: DataFrame, indexed_fps: DataFrame, bloom=None
) -> tuple[DataFrame, DataFrame]:
    """Classify fingerprinted docs (doc_id, fp) against the index
    (fp → match_id): 'exact' with the indexed match, else 'novel'.

    With a ``FingerprintBloom`` over the indexed fingerprints, definite
    novels are classified WITHOUT touching the join — only Bloom
    maybes (true duplicates + ≤fpp false positives) reach it, which is
    what keeps a novel-heavy 100 TB ingest from shuffling every row
    against the index. The Bloom can only produce false POSITIVES, so
    the join result on survivors is identical to the unfiltered join;
    classifications are bit-identical with and without the filter.

    Returns ``(classified, join_input)`` — the second frame is exactly
    the rows that reach the join, exposed so tests (and ops counters)
    can assert the pre-gate's selectivity instead of trusting it."""
    if bloom is None:
        survivors = fp
        definite = None
    else:
        flagged = fp.withColumn("__maybe", bloom.might_contain_udf()("fp"))
        survivors = flagged.filter(F.col("__maybe")).drop("__maybe")
        match_type = dict(indexed_fps.dtypes)["match_id"]
        definite = flagged.filter(~F.col("__maybe")).select(
            "doc_id",
            F.lit("novel").alias("verdict"),
            F.lit(None).cast(match_type).alias("match_id"),
        )
    joined = survivors.join(indexed_fps, "fp", "left").select(
        "doc_id",
        F.when(F.col("match_id").isNotNull(), "exact")
        .otherwise("novel")
        .alias("verdict"),
        "match_id",
    )
    classified = joined if definite is None else joined.unionByName(definite)
    return classified, survivors


def run_incremental_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    indexed_fps: DataFrame,
    query_name: str,
    max_files_per_trigger: int = 1,
    bloom=None,
) -> StreamingQuery:
    """Streaming twin of the exact tier of
    ``operators.dedup.dedup_incremental``: documents arrive as
    micro-batched parquet files and are classified against the indexed
    corpus's fingerprint table (``indexed_fps``: fp → match_id, i.e.
    yesterday's persisted `dedup_exact` output restricted to the
    index) by a stream–static broadcast left join — 'exact' with the
    indexed match, else 'novel'.

    This is the ingest-time dedup gate a training-data pipeline runs
    on the live feed: stateless (no watermark, no state store — the
    static side IS the state, refreshed per micro-batch like the
    HYBRIDJOIN dimensions), so memory is bounded by the batch size.
    The fingerprint table carries no broadcast hint — it is O(index)
    rows, so AQE broadcasts it while small and shuffle-joins when it
    is not. Pass ``bloom`` (a ``functions.bloom.FingerprintBloom``
    built over the indexed fingerprints) to pre-drop definite novels
    before the join — the 100 TB refinement: only true duplicates plus
    ≤fpp false positives reach the stream-static join, and the filter
    is ~10 bits per indexed key. Classifications are identical with
    and without it (the Bloom has no false negatives). The near-dup
    tier intentionally stays in the batch layer (`dedup_incremental`):
    LSH banding + verification is a multi-join analytic pass, and the
    standard lambda shape is exact-gate in the stream, near-dup sweep
    in the daily batch."""
    raw = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    fp = raw.select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("fp")
    )
    classified, _ = classify_exact(fp, indexed_fps, bloom=bloom)
    return (
        classified.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_near_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    index,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Streaming twin of the FULL ``dedup_incremental`` — exact AND
    near tiers — completing the lambda the round-5 gate left half-open
    (it classified exact/novel only; near-dups waited for the daily
    batch).

    Each micro-batch runs ``operators.dedup.classify_incremental``
    against a prebuilt ``NearDupIndex`` (``build_near_index`` over the
    indexed corpus — at 100 TB, yesterday's persisted fingerprint/
    band/shingle tables) via ``foreachBatch``: the near tier is a
    multi-join + per-key rank analytic, which is exactly what
    foreachBatch exists for — full batch Catalyst planning (AQE join
    sizing included) per micro-batch, while the stream stays stateless
    (no watermark, no state store; the static index IS the state).
    Results append to ``out_dir`` as parquet — the audit-log sink an
    ingest gate feeds. One copy of the semantics: the pytest gate
    asserts stream output equals the batch operator row-for-row,
    near tier included."""
    from ..operators import dedup as _dedup

    raw = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _classify(batch_df: DataFrame, _batch_id: int) -> None:
        _dedup.classify_incremental(batch_df, index).write.mode(
            "append"
        ).parquet(out_dir)

    writer = raw.writeStream.foreachBatch(_classify).trigger(
        availableNow=True
    )
    if checkpoint is not None:
        # Exactly-once across restarts: the checkpoint records which
        # source files each committed batch consumed, so a rerun (or a
        # crash-recovery) replays nothing already appended to out_dir —
        # the production setting; tests pin the no-duplicates contract.
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


EMB_STREAM_SCHEMA = "vec_id long, embedding array<float>"


def run_embedding_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    index,
    out_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Streaming twin of ``dedup_embedding_incremental`` — the vector
    ingest gate. Each micro-batch of (vec_id, embedding) rows is
    quantized to the deterministic integer grid and classified against
    a prebuilt ``operators.dedup.EmbNearIndex`` (at 100 TB,
    yesterday's persisted grid-key/bucket tables) via ``foreachBatch``:
    grid-identity exact tier, then the cross-boundary sign-LSH bucket
    join with exact-cosine verification — the same
    ``classify_embedding_incremental`` the batch operator runs, so
    stream and batch share ONE copy of the semantics (pinned by the
    pytest equivalence gate). The stream itself is stateless — the
    static index IS the state — and results append to ``out_dir`` as
    the audit-log parquet an ingest gate feeds."""
    from ..operators import dedup as _dedup
    from ..operators.similarity import quantize_embedding_col

    raw = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _classify(batch_df: DataFrame, _batch_id: int) -> None:
        _dedup.classify_embedding_incremental(
            quantize_embedding_col(batch_df), index
        ).write.mode("append").parquet(out_dir)

    writer = raw.writeStream.foreachBatch(_classify).trigger(
        availableNow=True
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
