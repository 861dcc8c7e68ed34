"""save_ann_index / load_ann_index: train-tonight-serve-tomorrow.

The persisted index (coarse centroids + PQ codebook, two parquet
tables of integers) must serve IDENTICAL query results to a fresh
in-session train — integer tables round-trip parquet exactly, and the
consumers read the index through the session caches the loader seeds.
"""

from __future__ import annotations

import near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators as ops
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_loaded_index_serves_identical_results(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ann_index")
    fresh = _rows(similarity.ann_topk_ivfpq(spark, sf_dir))
    similarity.save_ann_index(spark, sf_dir, path)

    # wipe every session cache — a new session, as far as training goes
    ops.reset_session_caches()
    similarity.load_ann_index(spark, sf_dir, path)
    app = spark.sparkContext.applicationId
    assert any(k[0] == app for k in similarity._CENT_CACHE)
    assert (app, sf_dir) in similarity._PQ_CB_CACHE

    served = _rows(similarity.ann_topk_ivfpq(spark, sf_dir))
    assert served == fresh

    # the flat IVF index consumes the same loaded quantizer
    ops.reset_session_caches()
    similarity.load_ann_index(spark, sf_dir, path)
    assert _rows(similarity.ann_topk_ivf(spark, sf_dir)) == _rows(
        similarity.ann_topk_ivf(spark, sf_dir)
    )
