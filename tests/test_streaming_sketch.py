"""Stream/batch equivalence for the KMV token-cardinality gate
(`streaming.sketch_stream`): after consuming the whole corpus the
streamed estimate must bit-match the batch `sketch_distinct_tokens`
entry, merging must obey the KMV union law across any file split, and
restarts must be idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    sketches,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    sketch_stream,
)


def _feed(spark, sf_dir, input_dir, n_files=4):
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    ).repartition(n_files).write.mode("overwrite").parquet(input_dir)


def _run(spark, tmp_path, input_dir):
    q = sketch_stream.run_token_sketch_stream(
        spark,
        input_dir,
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "report"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "report")).collect()
    )


def test_stream_estimate_matches_batch(spark, sf_dir, tmp_path):
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir)
    got = _run(spark, tmp_path, input_dir)

    batch = {
        r["lang"]: r
        for r in sketches.sketch_distinct_tokens(spark, sf_dir).collect()
    }
    assert len(got) == len(batch)
    for lang, n_sketch, n_est in got:
        b = batch[lang]
        # Bit-identical estimate (same hash family, ranks, operands).
        assert n_est == b["n_est"], lang
        assert n_sketch == min(b["n_exact"], sketches.KMV_K)


def test_merge_is_split_invariant(spark, sf_dir, tmp_path):
    """KMV union law: 1-file and 7-file feeds produce the same merged
    report."""
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    _feed(spark, sf_dir, one, n_files=1)
    _feed(spark, sf_dir, many, n_files=7)
    r1 = _run(spark, tmp_path / "a", one)
    r7 = _run(spark, tmp_path / "b", many)
    assert r1 == r7


def test_restart_is_idempotent(spark, sf_dir, tmp_path):
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir)
    first = _run(spark, tmp_path, input_dir)
    again = _run(spark, tmp_path, input_dir)  # same checkpoint, no new files
    assert again == first


def test_state_compaction_bounds_partials(spark, sf_dir, tmp_path):
    """Past the shared COMPACT_EVERY boundary the KMV report still
    bit-matches the batch entry (k-min union is associative across the
    base fold), live partials stay bounded, and restart is
    idempotent."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        state_compaction,
    )

    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir, n_files=state_compaction.COMPACT_EVERY + 3)
    got = _run(spark, tmp_path, input_dir)
    batch = {
        r["lang"]: r
        for r in sketches.sketch_distinct_tokens(spark, sf_dir).collect()
    }
    assert len(got) == len(batch)
    for lang, n_sketch, n_est in got:
        assert n_est == batch[lang]["n_est"], lang
        assert n_sketch == min(batch[lang]["n_exact"], sketches.KMV_K)
    from pyspark.sql import functions as F

    live_tags = (
        spark.read.parquet(str(tmp_path / "state" / "partials"))
        .select("batch_id").distinct().count()
    )
    assert live_tags < state_compaction.COMPACT_EVERY
    _base, wmark, _gen = state_compaction._read_base(
        spark, str(tmp_path / "state")
    )
    assert wmark >= 0
    assert _run(spark, tmp_path, input_dir) == got
