"""Round-17 fencing extension (round-16 verdict item 3): every gate
that rewrites SHARED persisted state — the sketch-family folds (KMV /
CMS / HLL / drift ride ``state_compaction``'s watermark) and the ANN
index-maintenance gates — now enforces the single-writer contract via
``fencing.acquire_writer``, like the z-order / compaction / fact sinks
since round 16.

Per gate, deterministically (no liveness race): a live foreign owner
on the state dir fences the gate off at start with the NAMED error;
after the owner releases, the same attach proceeds at the next epoch
and the gate produces its output. The two-live-queries and
zombie-write halves of the contract are machinery-level properties
pinned once in tests/test_streaming_zorder.py /
tests/test_round17_fencing.py — the token implementation is shared.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    ann_append_stream,
    ann_delete_stream,
    cms_stream,
    drift_stream,
    fencing,
    hll_stream,
    sketch_stream,
)

SF = "/root/testdata/sf0.001"


def _docs_feed(spark, tmp_path, col: str) -> str:
    feed = str(tmp_path / "feed")
    load_table(spark, SF, "documents").select(
        "doc_id", "text", F.col("source").alias(col) if col == "source" else F.col(col)
    ).limit(40).repartition(2).write.mode("overwrite").parquet(feed)
    return feed


def _fence_then_release(spark, state_dir, attach):
    """The shared assertion: a live foreign owner on ``state_dir``
    fences ``attach()`` off with the named error; after release, the
    same attach succeeds at the next epoch and runs to completion."""
    foreign = fencing.acquire_writer(spark, str(state_dir))
    with pytest.raises(fencing.WriterFencedError, match="owned by writer"):
        attach()
    foreign.release()
    q = attach()
    q.awaitTermination(120)
    assert q.writer_token.epoch == foreign.epoch + 1
    q.writer_token.release()
    return q


def test_sketch_gate_is_fenced(spark, tmp_path):
    feed = _docs_feed(spark, tmp_path, "lang")
    state = tmp_path / "state"

    def attach():
        return sketch_stream.run_token_sketch_stream(
            spark, feed,
            state_dir=str(state),
            out_dir=str(tmp_path / "report"),
            checkpoint=str(tmp_path / "ck"),
        )

    _fence_then_release(spark, state, attach)
    assert spark.read.parquet(str(tmp_path / "report")).count() > 0


def test_cms_gate_is_fenced(spark, tmp_path):
    feed = _docs_feed(spark, tmp_path, "source")
    state = tmp_path / "state"

    def attach():
        return cms_stream.run_cms_stream(
            spark, feed,
            state_dir=str(state),
            out_dir=str(tmp_path / "report"),
            checkpoint=str(tmp_path / "ck"),
        )

    _fence_then_release(spark, state, attach)
    assert spark.read.parquet(str(tmp_path / "report")).count() > 0


def test_hll_gate_is_fenced(spark, tmp_path):
    feed = _docs_feed(spark, tmp_path, "source")
    state = tmp_path / "state"

    def attach():
        return hll_stream.run_hll_register_stream(
            spark, feed,
            state_dir=str(state),
            out_dir=str(tmp_path / "report"),
            checkpoint=str(tmp_path / "ck"),
        )

    _fence_then_release(spark, state, attach)
    assert spark.read.parquet(str(tmp_path / "report")).count() > 0


def test_drift_gate_is_fenced(spark, tmp_path):
    ref, split = drift_stream.drift_reference(spark, SF)
    feed = str(tmp_path / "feed")
    (
        load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") >= split)
        .select("vec_id", "embedding", "label")
        .limit(40)
        .repartition(2)
        .write.mode("overwrite")
        .parquet(feed)
    )
    state = tmp_path / "state"

    def attach():
        return drift_stream.run_embedding_drift_stream(
            spark, feed, ref,
            state_dir=str(state),
            out_dir=str(tmp_path / "report"),
            checkpoint=str(tmp_path / "ck"),
        )

    _fence_then_release(spark, state, attach)
    assert spark.read.parquet(str(tmp_path / "report")).count() > 0


def test_ann_append_gate_is_fenced(spark, tmp_path):
    feed = str(tmp_path / "feed")
    (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding", "label")
        .limit(20)
        .repartition(2)
        .write.mode("overwrite")
        .parquet(feed)
    )
    dim = len(
        load_table(spark, SF, "embeddings").select("embedding").first()[0]
    )
    cents = [(0, [0] * dim, 1)]  # one trivial frozen centroid
    out = tmp_path / "assign"

    def attach():
        return ann_append_stream.run_ann_append_stream(
            spark, feed, cents,
            out_dir=str(out),
            checkpoint=str(tmp_path / "ck"),
        )

    _fence_then_release(spark, out, attach)
    got = ann_append_stream.read_assignments(spark, str(out))
    assert got.count() == 20


def test_ann_delete_gate_is_fenced(spark, tmp_path):
    index_dir = str(tmp_path / "index")
    spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.pmod("id", F.lit(2)).cast("int").alias("cluster"),
    ).write.mode("overwrite").parquet(index_dir)
    feed = str(tmp_path / "feed")
    spark.range(4).select(F.col("id").alias("vec_id")).repartition(
        2
    ).write.mode("overwrite").parquet(feed)
    out = tmp_path / "sink"

    def attach():
        return ann_delete_stream.run_ann_delete_stream(
            spark, feed, index_dir,
            out_dir=str(out),
            checkpoint=str(tmp_path / "ck"),
        )

    _fence_then_release(spark, out, attach)
    tombs = ann_delete_stream.read_tombstones(spark, str(out / "tombstones"))
    assert tombs.count() == 4
