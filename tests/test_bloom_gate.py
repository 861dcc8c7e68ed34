"""Bloom pre-gate for the streaming ingest dedup path (round-5 verdict
item 6): definite novels must skip the stream-static join entirely,
with classifications identical to the unfiltered join."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.functions.bloom import (
    build_bloom,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    dedup_stream as sd,
)


def _fp(df):
    return df.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    indexed = spark.createDataFrame(
        [(i, f"indexed document number {i}") for i in range(500)],
        "doc_id long, text string",
    )
    bloom = build_bloom(_fp(indexed), fpp=0.01)
    member_fps = [r.fp for r in _fp(indexed).collect()]
    assert all(bloom.might_contain(v) for v in member_fps), "false negative"
    novel_fps = [
        r.fp
        for r in _fp(
            spark.createDataFrame(
                [(i, f"novel text {i}") for i in range(2000)],
                "doc_id long, text string",
            )
        ).collect()
    ]
    fp_hits = sum(bloom.might_contain(v) for v in novel_fps)
    assert fp_hits / len(novel_fps) <= 0.03, f"fpp too high: {fp_hits}/2000"
    assert not bloom.might_contain(None)


def test_novel_heavy_batch_skips_join_with_identical_classifications(spark):
    """Counter evidence: the join input frame holds only Bloom maybes,
    so a 95 %-novel batch sends ~5 % of rows to the join."""
    indexed_docs = spark.createDataFrame(
        [(i, f"indexed document number {i}") for i in range(400)],
        "doc_id long, text string",
    )
    indexed_fps = (
        _fp(indexed_docs)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("match_id"))
    )
    # incoming: 50 replays of indexed docs + 950 novels
    incoming = spark.createDataFrame(
        [(1000 + i, f"indexed document number {i}") for i in range(50)]
        + [(2000 + i, f"never seen before {i}") for i in range(950)],
        "doc_id long, text string",
    )
    fp = _fp(incoming)
    bloom = build_bloom(indexed_fps, fpp=0.01)

    gated, join_input = sd.classify_exact(fp, indexed_fps, bloom=bloom)
    plain, plain_input = sd.classify_exact(fp, indexed_fps, bloom=None)

    n_join = join_input.count()
    assert n_join < 50 + 0.05 * 950, f"pre-gate leaked {n_join} rows to the join"
    assert plain_input.count() == 1000  # unfiltered join sees everything

    got = {r.doc_id: (r.verdict, r.match_id) for r in gated.collect()}
    want = {r.doc_id: (r.verdict, r.match_id) for r in plain.collect()}
    assert got == want
    assert sum(v == "exact" for v, _ in got.values()) == 50


def test_streaming_gate_with_bloom_matches_plain(spark, tmp_path):
    indexed_docs = spark.createDataFrame(
        [(i, f"indexed document number {i}") for i in range(100)],
        "doc_id long, text string",
    )
    indexed_fps = (
        _fp(indexed_docs).groupBy("fp").agg(F.min("doc_id").alias("match_id"))
    )
    incoming = spark.createDataFrame(
        [(500 + i, f"indexed document number {i}") for i in range(20)]
        + [(600 + i, f"fresh doc {i}") for i in range(180)],
        "doc_id long, text string",
    )
    feed = str(tmp_path / "feed")
    incoming.repartition(3).write.parquet(feed)
    bloom = build_bloom(indexed_fps, fpp=0.01)

    q = sd.run_incremental_dedup_stream(
        spark, feed, indexed_fps, query_name="bloom_gate", bloom=bloom
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.verdict, r.match_id)
        for r in spark.sql("select * from bloom_gate").collect()
    }
    want = {
        r.doc_id: (r.verdict, r.match_id)
        for r in sd.classify_exact(_fp(incoming), indexed_fps)[0].collect()
    }
    assert got == want
    assert sum(v == "exact" for v, _ in got.values()) == 20


def test_empty_index_classifies_all_novel(spark):
    indexed_fps = spark.createDataFrame(
        [], "fp string, match_id long"
    )
    bloom = build_bloom(indexed_fps, fpp=0.01)
    incoming = _fp(
        spark.createDataFrame(
            [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
        )
    )
    classified, join_input = sd.classify_exact(incoming, indexed_fps, bloom=bloom)
    assert join_input.count() == 0
    rows = classified.collect()
    assert len(rows) == 10
    assert all(r.verdict == "novel" and r.match_id is None for r in rows)
