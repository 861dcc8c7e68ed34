"""Stream/batch equivalence for the IVF-append gate
(`streaming.ann_append_stream`): feeding the incoming slice as
micro-batches through the frozen indexed-slice quantizer must
reproduce the batch `ann_index_append` assignments exactly, invariant
to the file split, and idempotent under restart (assignments are pure
functions of (vector, centroids); the (batch_id, vec_id) dedup makes
the read-back exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    ann_append_stream,
)

SF = "/root/testdata/sf0.001"


def _parts(spark):
    w = similarity._ann_split(spark, SF)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qe_idx = similarity.quantized_embeddings(spark, SF).filter(
        F.col("vec_id") < w
    )
    ncl, _ = similarity.derived_ivf_params(qe_idx.count())
    cents = similarity._train_coarse_quantizer(qe_idx, ncl)
    return cents, emb.filter(F.col("vec_id") >= w)


def _run(spark, tmp_path, cents, input_dir):
    q = ann_append_stream.run_ann_append_stream(
        spark,
        input_dir,
        cents,
        out_dir=str(tmp_path / "assign"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return sorted(
        (r["vec_id"], r["cluster"])
        for r in ann_append_stream.read_assignments(
            spark, str(tmp_path / "assign")
        ).collect()
    )


def test_stream_assignments_match_batch(spark, tmp_path):
    cents, incoming = _parts(spark)
    feed = str(tmp_path / "feed")
    incoming.repartition(4).write.mode("overwrite").parquet(feed)
    got = _run(spark, tmp_path, cents, feed)
    batch = sorted(
        (r["vec_id"], r["cluster"])
        for r in similarity.ann_index_append(spark, SF).collect()
    )
    assert got == batch


def test_split_invariance(spark, tmp_path):
    cents, incoming = _parts(spark)
    one, many = str(tmp_path / "one"), str(tmp_path / "many")
    incoming.repartition(1).write.mode("overwrite").parquet(one)
    incoming.repartition(7).write.mode("overwrite").parquet(many)
    assert _run(spark, tmp_path / "a", cents, one) == _run(
        spark, tmp_path / "b", cents, many
    )


def test_restart_is_idempotent(spark, tmp_path):
    cents, incoming = _parts(spark)
    feed = str(tmp_path / "feed")
    incoming.repartition(4).write.mode("overwrite").parquet(feed)
    first = _run(spark, tmp_path, cents, feed)
    again = _run(spark, tmp_path, cents, feed)
    assert again == first
