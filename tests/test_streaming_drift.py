"""Stream/batch equivalence and replay idempotence for the embedding
drift ingest gate (`streaming.drift_stream`): after consuming the full
post-watermark feed, the streaming report must be row-identical to the
batch `embedding_drift` operator, and a restart with the same
checkpoint must not change it."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    drift_stream,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _feed_post_split(spark, sf_dir, split, input_dir, n_files=3):
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") >= split)
        .select("vec_id", "embedding", "label")
    )
    emb.repartition(n_files).write.mode("overwrite").parquet(input_dir)


def test_stream_matches_batch_operator(spark, sf_dir, tmp_path):
    ref, split = drift_stream.drift_reference(spark, sf_dir)
    input_dir = str(tmp_path / "feed")
    _feed_post_split(spark, sf_dir, split, input_dir)

    q = drift_stream.run_embedding_drift_stream(
        spark,
        input_dir,
        ref,
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "report"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = _rows(spark.read.parquet(str(tmp_path / "report")))
    want = _rows(similarity.embedding_drift(spark, sf_dir))
    assert got == want


def test_restart_is_idempotent(spark, sf_dir, tmp_path):
    ref, split = drift_stream.drift_reference(spark, sf_dir)
    input_dir = str(tmp_path / "feed")
    _feed_post_split(spark, sf_dir, split, input_dir)
    kwargs = dict(
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "report"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q = drift_stream.run_embedding_drift_stream(spark, input_dir, ref, **kwargs)
    q.awaitTermination(120)
    first = _rows(spark.read.parquet(str(tmp_path / "report")))

    # Restart over the same checkpoint: nothing new to consume, the
    # report must not move.
    q2 = drift_stream.run_embedding_drift_stream(spark, input_dir, ref, **kwargs)
    q2.awaitTermination(120)
    assert _rows(spark.read.parquet(str(tmp_path / "report"))) == first


def test_duplicate_partial_append_is_absorbed(spark, sf_dir, tmp_path):
    """Simulate a crash-retry: the same batch's partial rows appended
    twice accumulate once thanks to the (batch_id, label, dim)
    dedup."""
    ref, split = drift_stream.drift_reference(spark, sf_dir)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") >= split)
        .select("vec_id", "embedding", "label")
    )
    state_dir = str(tmp_path / "state")
    partial = drift_stream._label_dim_sums(
        emb, "sum_new", "cnt_new"
    ).withColumn("batch_id", F.lit(0).cast("long"))
    partial.write.mode("append").parquet(state_dir)
    partial.write.mode("append").parquet(state_dir)  # the replay

    acc = (
        spark.read.parquet(state_dir)
        .dropDuplicates(["batch_id", "label", "dim"])
        .groupBy("label", "dim")
        .agg(
            F.sum("sum_new").cast("long").alias("sum_new"),
            F.sum("cnt_new").cast("long").alias("cnt_new"),
        )
    )
    got = _rows(drift_stream.drift_report(ref, acc))
    want = _rows(similarity.embedding_drift(spark, sf_dir))
    assert got == want


def test_state_compaction_bounds_partials(spark, sf_dir, tmp_path):
    """Past the shared COMPACT_EVERY boundary (the + merge where the
    watermark skip is load-bearing, like CMS): report still matches
    the batch operator, live partials bounded, restart idempotent."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        state_compaction,
    )

    ref, split = drift_stream.drift_reference(spark, sf_dir)
    input_dir = str(tmp_path / "feed")
    _feed_post_split(
        spark, sf_dir, split, input_dir,
        n_files=state_compaction.COMPACT_EVERY + 3,
    )
    kwargs = dict(
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "report"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q = drift_stream.run_embedding_drift_stream(spark, input_dir, ref, **kwargs)
    q.awaitTermination(180)
    got = _rows(spark.read.parquet(str(tmp_path / "report")))
    assert got == _rows(similarity.embedding_drift(spark, sf_dir))
    live_tags = (
        spark.read.parquet(str(tmp_path / "state" / "partials"))
        .select("batch_id").distinct().count()
    )
    assert live_tags < state_compaction.COMPACT_EVERY
    _base, wmark, _gen = state_compaction._read_base(
        spark, str(tmp_path / "state")
    )
    assert wmark >= 0
    q2 = drift_stream.run_embedding_drift_stream(spark, input_dir, ref, **kwargs)
    q2.awaitTermination(120)
    assert _rows(spark.read.parquet(str(tmp_path / "report"))) == got
