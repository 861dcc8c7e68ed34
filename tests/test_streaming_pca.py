"""Stream/batch equivalence, split-invariance and restart idempotence
for the streaming PCA-projection gate (`streaming.pca_stream`): after
consuming a feed replaying corpus X (components frozen on X), the file
sink must hold exactly the batch `embedding_pca_topk` rows for X, the
derived bucket signatures must match `ann_topk_pca`'s bucketer, and a
restart over the same checkpoint must not change the output."""

from __future__ import annotations

import numpy as np

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    pca_stream,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _feed(spark, sf_dir, input_dir, n_files):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    emb.repartition(n_files).write.mode("overwrite").parquet(input_dir)


def _run(spark, sf_dir, tmp_path, n_files=3):
    vmat, sv_arr, n = pca_stream.frozen_components(spark, sf_dir)
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir, n_files)
    kwargs = dict(
        out_dir=str(tmp_path / "proj"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q = pca_stream.run_pca_project_stream(
        spark, input_dir, vmat, sv_arr, n, **kwargs
    )
    q.awaitTermination(120)
    return kwargs


def test_stream_matches_batch_operator(spark, sf_dir, tmp_path):
    kwargs = _run(spark, sf_dir, tmp_path)
    got = _rows(spark.read.parquet(kwargs["out_dir"]))
    want = _rows(similarity.embedding_pca_topk(spark, sf_dir))
    assert got == want


def test_split_invariance(spark, sf_dir, tmp_path):
    """The same corpus fed as 1 file or 5 files projects to identical
    rows — the transform is stateless per-row, so micro-batch
    boundaries cannot matter."""
    one = _run(spark, sf_dir, tmp_path / "a", n_files=1)
    five = _run(spark, sf_dir, tmp_path / "b", n_files=5)
    assert _rows(spark.read.parquet(one["out_dir"])) == _rows(
        spark.read.parquet(five["out_dir"])
    )


def test_restart_is_idempotent(spark, sf_dir, tmp_path):
    kwargs = _run(spark, sf_dir, tmp_path)
    first = _rows(spark.read.parquet(kwargs["out_dir"]))
    vmat, sv_arr, n = pca_stream.frozen_components(spark, sf_dir)
    q2 = pca_stream.run_pca_project_stream(
        spark, str(tmp_path / "feed"), vmat, sv_arr, n, **kwargs
    )
    q2.awaitTermination(120)
    assert _rows(spark.read.parquet(kwargs["out_dir"])) == first


def test_bucket_sigs_match_ann_bucketer(spark, sf_dir, tmp_path):
    """The feature-store payoff: signatures derived from the streamed
    projections equal the ANN entry's kernel-computed buckets
    bit-for-bit, so the index consumes the sink without re-projecting."""
    kwargs = _run(spark, sf_dir, tmp_path)
    got = {
        int(r["vec_id"]): int(r["sig"])
        for r in pca_stream.bucket_sigs(
            spark.read.parquet(kwargs["out_dir"])
        ).collect()
    }
    vmat, sv_arr, n = pca_stream.frozen_components(spark, sf_dir)
    qe = similarity.quantized_embeddings(spark, sf_dir).collect()
    mat = np.array([r["q"] for r in qe], dtype=np.int64)
    proj = n * (mat @ vmat) - sv_arr
    k = vmat.shape[1]
    sig = ((proj >= 0).astype(np.int64) << np.arange(k)).sum(axis=1)
    want = {
        int(r["vec_id"]): int(s) for r, s in zip(qe, sig)
    }
    assert got == want
