"""Stream/batch equivalence for the IVF-tombstone gate
(`streaming.ann_delete_stream`): feeding the expired ids as
micro-batches against the persisted id→list table must reproduce the
batch `ann_delete_assignments` rows exactly and leave the batch
`ann_index_delete` compaction worklist bit-identical; restarts and
duplicate delete events are idempotent (delete is idempotent by
definition — the vec_id dedup pins that); unknown ids are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    ann_delete_stream,
)

SF = "/root/testdata/sf0.001"


def _index_dir(spark, tmp_path) -> str:
    """Persist the id→list table (every vector's home under the
    session-cached frozen quantizer) — the inverted-list parquet a
    deployment keeps next to the centroids."""
    ncl, _ = similarity.derived_ivf_params(similarity.corpus_count(spark, SF))
    qe = similarity.quantized_embeddings(spark, SF)
    cents = similarity.coarse_quantizer(spark, SF, qe, ncl)
    home = F.element_at(similarity._probe_udf(cents, 1)(F.col("q")), 1)
    d = str(tmp_path / "index")
    qe.select("vec_id", home.alias("cluster")).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _feed(spark, tmp_path, name="feed", n_files=4, extra_ids=()):
    ids = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") % similarity.TOMBSTONE_MOD == 0)
        .select("vec_id")
    )
    if extra_ids:
        ids = ids.unionByName(
            spark.createDataFrame(
                [(int(i),) for i in extra_ids], "vec_id long"
            )
        )
    d = str(tmp_path / name)
    ids.repartition(n_files).write.mode("overwrite").parquet(d)
    return d


def _run(spark, tmp_path, feed, index_dir, tag="a"):
    out = str(tmp_path / f"out_{tag}")
    q = ann_delete_stream.run_ann_delete_stream(
        spark,
        feed,
        index_dir,
        out_dir=out,
        checkpoint=str(tmp_path / f"ckpt_{tag}"),
    )
    q.awaitTermination(120)
    tomb = sorted(
        (r["vec_id"], r["cluster"])
        for r in ann_delete_stream.read_tombstones(
            spark, f"{out}/tombstones"
        ).collect()
    )
    work = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/worklist").collect()
    )
    return tomb, work


def test_stream_matches_batch_assignments_and_worklist(spark, tmp_path):
    index_dir = _index_dir(spark, tmp_path)
    feed = _feed(spark, tmp_path)
    tomb, work = _run(spark, tmp_path, feed, index_dir)
    batch_tomb = sorted(
        (r["vec_id"], r["cluster"])
        for r in similarity.ann_delete_assignments(spark, SF).collect()
    )
    batch_work = sorted(
        tuple(r) for r in similarity.ann_index_delete(spark, SF).collect()
    )
    assert tomb == batch_tomb
    assert work == batch_work


def test_restart_and_duplicate_deletes_are_idempotent(spark, tmp_path):
    """Rerun over the same checkpoint AND a feed carrying duplicate +
    unknown ids: tombstones and worklist must not change (idempotent
    delete, unknown-id no-op)."""
    index_dir = _index_dir(spark, tmp_path)
    feed = _feed(spark, tmp_path)
    first = _run(spark, tmp_path, feed, index_dir)
    assert _run(spark, tmp_path, feed, index_dir) == first  # restart
    max_id = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .agg(F.max("vec_id"))
        .collect()[0][0]
    )
    dup_feed = _feed(
        spark,
        tmp_path,
        name="dups",
        n_files=7,
        extra_ids=[0, similarity.TOMBSTONE_MOD, max_id + 1000, max_id + 2000],
    )
    assert _run(spark, tmp_path, dup_feed, index_dir, tag="b") == first


def test_uncommitted_tombstone_dir_does_not_wedge(spark, tmp_path):
    """A crash during the very first append can leave the tombstone
    dir with only Spark's _temporary scratch (no committed part
    files). The existing-tombstones probe must treat that as 'no
    tombstones yet' — a read-before-append that errored there would
    wedge the retry loop forever, since the read precedes the append
    that would populate the dir. The stream must complete and produce
    the same rows as a clean run."""
    import os

    index_dir = _index_dir(spark, tmp_path)
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "out_wedge")
    tomb_dir = os.path.join(out, "tombstones")
    os.makedirs(os.path.join(tomb_dir, "_temporary"))  # the crash debris
    q = ann_delete_stream.run_ann_delete_stream(
        spark,
        feed,
        index_dir,
        out_dir=out,
        checkpoint=str(tmp_path / "ckpt_wedge"),
    )
    q.awaitTermination(120)
    got = sorted(
        (r["vec_id"], r["cluster"])
        for r in ann_delete_stream.read_tombstones(spark, tomb_dir).collect()
    )
    want = sorted(
        (r["vec_id"], r["cluster"])
        for r in similarity.ann_delete_assignments(spark, SF).collect()
    )
    assert got == want
