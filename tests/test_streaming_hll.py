"""Stream/batch equivalence for the HLL register gate
(`streaming.hll_stream`): after consuming the whole corpus the merged
register table must bit-match the batch `sketch_hll_registers` entry,
MAX-merging must be invariant to the file split, and restarts (and
replayed partials) must be idempotent — MAX is idempotent by nature."""

from __future__ import annotations

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    sketches,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    hll_stream,
    state_compaction,
)


def _feed(spark, sf_dir, input_dir, n_files=4):
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).repartition(n_files).write.mode("overwrite").parquet(input_dir)


def _run(spark, tmp_path, input_dir):
    q = hll_stream.run_hll_register_stream(
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


def test_stream_registers_match_batch(spark, sf_dir, tmp_path):
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir)
    got = _run(spark, tmp_path, input_dir)
    batch = sorted(
        (r.source, r.register, r.max_rho)
        for r in sketches.sketch_hll_registers(spark, sf_dir).collect()
    )
    assert got == batch  # bit-identical register table


def test_merge_is_split_invariant(spark, sf_dir, tmp_path):
    """MAX-merge law: 1-file and 7-file feeds give the same table."""
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    _feed(spark, sf_dir, one, n_files=1)
    _feed(spark, sf_dir, many, n_files=7)
    assert _run(spark, tmp_path / "a", one) == _run(spark, tmp_path / "b", many)


def test_restart_is_idempotent(spark, sf_dir, tmp_path):
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir)
    first = _run(spark, tmp_path, input_dir)
    again = _run(spark, tmp_path, input_dir)  # same checkpoint, no new files
    assert again == first


def test_state_compaction_bounds_partials(spark, sf_dir, tmp_path):
    """Drive more batches than the shared COMPACT_EVERY: the register
    table still bit-matches the batch entry across the compaction
    boundary, live partial tags stay bounded, the base exists with a
    watermark, and a restart stays idempotent."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        state_compaction,
    )

    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir, n_files=state_compaction.COMPACT_EVERY + 3)
    got = _run(spark, tmp_path, input_dir)
    batch = sorted(
        (r.source, r.register, r.max_rho)
        for r in sketches.sketch_hll_registers(spark, sf_dir).collect()
    )
    assert got == batch
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
    assert _run(spark, tmp_path, input_dir) == batch
