"""Index-build / classify split of incremental dedup, plus the
streaming near-dup gate (round 6).

``build_near_index`` materializes the per-corpus index frames
(canonical fingerprints, collapsed minhash bands, shingles, sizes) —
"yesterday's persisted tables" in the daily-ingest story — and
``classify_incremental`` classifies any increment against them. The
batch operator `dedup_incremental` and the streaming
`run_near_dedup_stream` gate are two drivers of the SAME classify
function, so stream results must equal the batch operator exactly —
including the near tier, which the round-5 stream gate lacked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    dedup,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    dedup_stream as sd,
)


def _rows(df):
    return {
        r.doc_id: (r.verdict, r.match_id, r.jaccard) for r in df.collect()
    }


def test_classify_against_index_equals_incremental_operator(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split = dedup._incr_split(spark, sf_dir)
    index = dedup.build_near_index(docs.filter(F.col("doc_id") < split))
    got = _rows(
        dedup.classify_incremental(
            docs.filter(F.col("doc_id") >= split), index
        )
    )
    want = _rows(dedup.dedup_incremental(spark, sf_dir))
    assert got == want
    assert any(v[0] == "near" for v in want.values()), "near tier unexercised"
    # (sf0.001 has no cross-boundary byte-identical pair, so the exact
    # tier is exercised by the synthetic-corpus test below instead)


def test_exact_tier_via_synthetic_boundary_dup(spark):
    old = spark.createDataFrame(
        [(i, f"indexed body of document number {i} with words") for i in range(40)]
        + [(40, "a duplicated document body that repeats verbatim later on")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "a duplicated document body that repeats verbatim later on"),
         (101, "an entirely novel incoming document body")],
        "doc_id long, text string",
    )
    index = dedup.build_near_index(old)
    got = _rows(dedup.classify_incremental(new, index))
    assert got[100] == ("exact", 40, None)
    assert got[101][0] == "novel"


def test_streaming_near_gate_matches_batch_both_tiers(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    split = dedup._incr_split(spark, sf_dir)
    index = dedup.build_near_index(docs.filter(F.col("doc_id") < split))

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    docs.filter(F.col("doc_id") >= split).select("doc_id", "text").repartition(
        3
    ).write.parquet(feed)

    q = sd.run_near_dedup_stream(spark, feed, index, out)
    q.awaitTermination(180)

    got = _rows(spark.read.parquet(out))
    want = _rows(dedup.dedup_incremental(spark, sf_dir))
    assert got == want  # exact AND near tiers identical to batch


def test_index_bands_are_collapsed(spark, sf_dir):
    """The index must never carry duplicate band rows for identical
    indexed texts — that is the skew-bomb guard."""
    docs = load_table(spark, sf_dir, "documents")
    split = dedup._incr_split(spark, sf_dir)
    old = docs.filter(F.col("doc_id") < split)
    index = dedup.build_near_index(old)
    n_band_docs = index.bands.select("old_id").distinct().count()
    n_reps = dedup._identity_groups(old)[0].count()
    assert n_band_docs <= n_reps


def test_persisted_index_round_trip(spark, sf_dir, tmp_path):
    """build → save → load → classify must equal classify against the
    in-memory index (the daily-ingest persistence contract)."""
    docs = load_table(spark, sf_dir, "documents")
    split = dedup._incr_split(spark, sf_dir)
    index = dedup.build_near_index(docs.filter(F.col("doc_id") < split))
    path = str(tmp_path / "near_index")
    dedup.save_near_index(index, path)
    reopened = dedup.load_near_index(spark, path)
    new = docs.filter(F.col("doc_id") >= split)
    got = _rows(dedup.classify_incremental(new, reopened))
    want = _rows(dedup.classify_incremental(new, index))
    assert got == want


def test_near_gate_checkpoint_is_exactly_once(spark, sf_dir, tmp_path):
    """Restarting the gate with the same checkpoint must append
    nothing: committed batches are remembered, so crash-recovery and
    replays cannot duplicate the audit log."""
    docs = load_table(spark, sf_dir, "documents")
    split = dedup._incr_split(spark, sf_dir)
    index = dedup.build_near_index(docs.filter(F.col("doc_id") < split))
    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.filter(F.col("doc_id") >= split).select("doc_id", "text").repartition(
        2
    ).write.parquet(feed)

    q = sd.run_near_dedup_stream(spark, feed, index, out, checkpoint=ckpt)
    q.awaitTermination(180)
    first = spark.read.parquet(out).count()
    assert first > 0

    q2 = sd.run_near_dedup_stream(spark, feed, index, out, checkpoint=ckpt)
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == first  # nothing re-appended


def test_embedding_incremental_verdicts(spark, sf_dir):
    """Boundary + tier semantics of the vector incremental classifier:
    only incoming ids appear, matches always point at the indexed side,
    the exact tier wins over near, and grid-identical incoming vectors
    are always classified exact."""
    import math

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.similarity import (
        quantized_embeddings,
    )

    out = {r.vec_id: r for r in dedup.dedup_embedding_incremental(spark, sf_dir).collect()}
    mx = load_table(spark, sf_dir, "embeddings").agg(F.max("vec_id")).first()[0]
    split = math.floor(float(mx) * dedup.INCR_SPLIT_FRAC)
    assert out and all(v >= split for v in out)
    for r in out.values():
        assert r.verdict in ("exact", "near", "novel")
        if r.verdict == "novel":
            assert r.match_id is None and r.sim is None
        else:
            assert r.match_id is not None and r.match_id < split
        if r.verdict == "exact":
            assert r.sim is None
        if r.verdict == "near":
            assert r.sim is not None and r.sim >= dedup.NEAR_DUP_COSINE

    # every incoming vector grid-identical to an indexed one is exact
    qe = quantized_embeddings(spark, sf_dir).collect()
    grids = {}
    for r in qe:
        grids.setdefault(tuple(r.q), []).append(r.vec_id)
    for ids in grids.values():
        idx = [v for v in ids if v < split]
        inc = [v for v in ids if v >= split]
        if idx and inc:
            for v in inc:
                assert out[v].verdict == "exact"
                assert out[v].match_id == min(idx)


def test_embedding_stream_gate_matches_batch(spark, sf_dir, tmp_path):
    """run_embedding_dedup_stream drives classify_embedding_incremental
    per micro-batch against the prebuilt index — output must equal the
    batch operator row-for-row (one copy of the semantics)."""
    import math

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.similarity import (
        corpus_count,
        derived_lsh_bits,
        quantized_embeddings,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        dedup_stream as sd,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mx = emb.agg(F.max("vec_id")).first()[0]
    split = math.floor(float(mx) * dedup.INCR_SPLIT_FRAC)
    bits = derived_lsh_bits(corpus_count(spark, sf_dir))
    qe = quantized_embeddings(spark, sf_dir)
    index = dedup.build_emb_index(
        qe.filter(F.col("vec_id") < split), bits=bits
    )

    feed = str(tmp_path / "emb_feed")
    out = str(tmp_path / "emb_out")
    # three arrival files → three micro-batches at maxFilesPerTrigger=1
    emb.filter(F.col("vec_id") >= split).repartition(3).write.parquet(feed)
    q = sd.run_embedding_dedup_stream(spark, feed, index, out)
    q.awaitTermination()

    got = sorted(
        (r.vec_id, r.verdict, r.match_id, r.sim)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.vec_id, r.verdict, r.match_id, r.sim)
        for r in dedup.classify_embedding_incremental(
            qe.filter(F.col("vec_id") >= split), index
        ).collect()
    )
    assert got == want and len(got) > 0
