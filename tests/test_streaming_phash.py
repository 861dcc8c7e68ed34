"""Stream/batch equivalence for the perceptual-hash ingest gate
(`streaming.phash_stream`): feeding the incoming slice (doc_id above
the watermark) as micro-batches against the indexed slice's band table
must reproduce the batch `dedup_phash_incremental` verdicts exactly,
invariant to the file split, and idempotent under restart (verdicts
are a pure function of (doc, index); the (batch_id, doc_id) dedup
makes the read-back exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    multimodal,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    phash_stream,
)

SF = "/root/testdata/sf0.001"


def _parts(spark):
    w = multimodal._phash_split(spark, SF)
    bands = multimodal.phash_bands_df(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    incoming_docs = docs.filter(F.col("doc_id") >= w).select(
        "doc_id", "text", "source"
    )
    return bands.filter(F.col("doc_id") < w), incoming_docs


def _run(spark, tmp_path, indexed, input_dir):
    q = phash_stream.run_phash_stream(
        spark,
        input_dir,
        indexed,
        out_dir=str(tmp_path / "verdicts"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return sorted(
        (r["doc_id"], r["verdict"], r["match_id"], r["hamming"])
        for r in phash_stream.read_gate_verdicts(
            spark, str(tmp_path / "verdicts")
        ).collect()
    )


def test_stream_verdicts_match_batch(spark, tmp_path):
    indexed, incoming = _parts(spark)
    feed = str(tmp_path / "feed")
    incoming.repartition(4).write.mode("overwrite").parquet(feed)
    got = _run(spark, tmp_path, indexed, feed)
    batch = sorted(
        (r["doc_id"], r["verdict"], r["match_id"], r["hamming"])
        for r in multimodal.dedup_phash_incremental(spark, SF).collect()
    )
    assert got == batch
    assert {v for _, v, _, _ in got} >= {"novel"}  # gate sees real data


def test_split_invariance(spark, tmp_path):
    indexed, incoming = _parts(spark)
    one, many = str(tmp_path / "one"), str(tmp_path / "many")
    incoming.repartition(1).write.mode("overwrite").parquet(one)
    incoming.repartition(7).write.mode("overwrite").parquet(many)
    assert _run(spark, tmp_path / "a", indexed, one) == _run(
        spark, tmp_path / "b", indexed, many
    )


def test_restart_is_idempotent(spark, tmp_path):
    indexed, incoming = _parts(spark)
    feed = str(tmp_path / "feed")
    incoming.repartition(4).write.mode("overwrite").parquet(feed)
    first = _run(spark, tmp_path, indexed, feed)
    again = _run(spark, tmp_path, indexed, feed)
    assert again == first
