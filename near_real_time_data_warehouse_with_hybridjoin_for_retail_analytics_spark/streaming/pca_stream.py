"""Streaming PCA-projection gate: the ingest twin of
``operators.similarity.embedding_pca_topk`` (and the feature source
for ``ann_topk_pca``'s bucketer).

A production vector pipeline projects every arriving embedding onto
the FROZEN trained components at ingest time, so downstream consumers
— the PCA-bucketed ANN index, dedup prefilters, drift monitors on the
reduced coordinates — read precomputed projections instead of
re-projecting the corpus per query. This module runs exactly that, in
the repo's standard gate shape (`run_embedding_drift_stream`,
`run_incremental_dedup_stream`): components are trained once on the
reference corpus (the same exact-integer deflation ladder, with the
same loud int64 overflow guard) and frozen as literals; the stream is
then a STATELESS per-row transform — quantize to the shared 1e-6
grid, one exact-int64 Arrow matmul per micro-batch — which is the
easiest possible 100 TB story: no state store, no cross-batch
shuffle, linear in the feed, and Spark's parquet file sink gives
exactly-once output natively (the sink's commit log drops replayed
batches' files on read, so no dedup-on-read bookkeeping is needed at
all — unlike the drift gate, which must accumulate sums, this gate's
output rows are a deterministic function of each input row alone).

Stream/batch equivalence (pinned by `tests/test_streaming_pca.py`):
components frozen on corpus X, the feed replaying X in any file
split/order, availableNow — the sink contents equal the registered
`embedding_pca_topk` entry on X row-for-row, and the bucket
signatures derived from the sink equal `ann_topk_pca`'s bucketer
bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import similarity

# Vector feed schema: same as the embedding dedup gate.
PCA_STREAM_SCHEMA = "vec_id long, embedding array<float>"


def frozen_components(
    spark: SparkSession, sf_dir: str
) -> tuple[np.ndarray, np.ndarray, int]:
    """(V as d×K int64, ⟨s,v_c⟩ per component, n) trained on the
    reference corpus — the literals a deployed gate freezes. Raises
    the same loud OverflowError as the batch entry at the int64
    projection boundary."""
    return similarity._guarded_topk_literals(spark, sf_dir)


def run_pca_project_stream(
    spark: SparkSession,
    input_dir: str,
    vmat: np.ndarray,
    sv_arr: np.ndarray,
    n: int,
    out_dir: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Continuous projection of a (vec_id, embedding) parquet feed
    onto the frozen components. Output: append-only parquet of
    (vec_id, component, proj_num) rows via the exactly-once file sink
    — after consuming the feed, ``spark.read.parquet(out_dir)`` holds
    exactly what ``embedding_pca_topk`` would emit for those
    vectors."""
    raw = (
        spark.readStream.schema(PCA_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    proj = similarity.project_topk(
        similarity.quantize_embedding_col(raw), vmat, sv_arr, int(n)
    )
    return (
        proj.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def bucket_sigs(projections: DataFrame) -> DataFrame:
    """(vec_id, sig): the ``ann_topk_pca`` bucket signature derived
    from stored projections — sig = Σ (proj_num ≥ 0) · 2^(component−1),
    a pure JVM-side aggregation, so the streamed feature store feeds
    the ANN index without touching the raw vectors again."""
    bit = F.when(
        F.col("proj_num") >= 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), component - 1)"),
    ).otherwise(F.lit(0).cast("long"))
    return projections.groupBy("vec_id").agg(
        F.sum(bit).cast("long").alias("sig")
    )
