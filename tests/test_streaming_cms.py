"""Stream/batch equivalence for the Count-Min ingest gate
(`streaming.cms_stream`): after consuming the whole corpus the merged
cell table must bit-match `cms_cell_table` over the full documents
table (CMS linearity), +-merging must be invariant to the file split,
restarts must be idempotent (exactly-once via the batch-id dedup — the
load-bearing step, since + unlike MAX is not replay-idempotent), and
the per-source cells must sum to the corpus-wide cell table the batch
`sketch_count_min` entry reads its estimates from."""

from __future__ import annotations

from collections import defaultdict

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.sketches import (
    cms_cell_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    cms_stream,
    state_compaction,
)


def _feed(spark, sf_dir, input_dir, n_files=4):
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).repartition(n_files).write.mode("overwrite").parquet(input_dir)


def _run(spark, tmp_path, input_dir):
    q = cms_stream.run_cms_stream(
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


def test_stream_cells_match_batch(spark, sf_dir, tmp_path):
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir)
    got = _run(spark, tmp_path, input_dir)
    batch = sorted(
        (r.source, r.i, r.bucket, r.cnt)
        for r in cms_cell_table(
            load_table(spark, sf_dir, "documents")
        ).collect()
    )
    assert got == batch  # bit-identical cell table (linearity)


def test_merge_is_split_invariant(spark, sf_dir, tmp_path):
    """+-merge law: 1-file and 7-file feeds give the same table."""
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    _feed(spark, sf_dir, one, n_files=1)
    _feed(spark, sf_dir, many, n_files=7)
    assert _run(spark, tmp_path / "a", one) == _run(spark, tmp_path / "b", many)


def test_restart_is_idempotent(spark, sf_dir, tmp_path):
    """A rerun over the same checkpoint with no new files must not
    double-count — for a + merge this fails without the batch-id
    dedup, so this test pins the exactly-once mechanism itself."""
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir)
    first = _run(spark, tmp_path, input_dir)
    again = _run(spark, tmp_path, input_dir)
    assert again == first


def test_state_compaction_bounds_partials(spark, sf_dir, tmp_path):
    """Drive more batches than CMS_COMPACT_EVERY: the report must still
    bit-match the batch cell table (compaction is a pure fold), the
    live partials directory must hold fewer than CMS_COMPACT_EVERY
    batch tags (state bounded), the compacted base must exist with a
    high watermark, and a restart across the compaction boundary must
    stay exactly-once (the ≤-watermark skip path)."""
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir, n_files=cms_stream.CMS_COMPACT_EVERY + 3)
    got = _run(spark, tmp_path, input_dir)
    batch = sorted(
        (r.source, r.i, r.bucket, r.cnt)
        for r in cms_cell_table(
            load_table(spark, sf_dir, "documents")
        ).collect()
    )
    assert got == batch
    from pyspark.sql import functions as F

    live_tags = (
        spark.read.parquet(str(tmp_path / "state" / "partials"))
        .select("batch_id")
        .distinct()
        .count()
    )
    assert live_tags < cms_stream.CMS_COMPACT_EVERY
    _base, wmark, _gen = state_compaction._read_base(
        spark, str(tmp_path / "state")
    )
    assert wmark >= 0
    assert _run(spark, tmp_path, input_dir) == batch  # restart idempotent


def test_source_cells_sum_to_corpus_cells(spark, sf_dir, tmp_path):
    """Summing the gate's per-source cells over sources reproduces the
    corpus-wide DEPTH×WIDTH table the batch sketch_count_min entry
    probes — the gate state can answer the batch entry's point
    queries."""
    input_dir = str(tmp_path / "feed")
    _feed(spark, sf_dir, input_dir)
    merged = _run(spark, tmp_path, input_dir)
    by_cell: dict[tuple, int] = defaultdict(int)
    for source, i, bucket, cnt in merged:
        by_cell[(i, bucket)] += cnt
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.sketches import (
        CMS_DEPTH,
        TOKEN_SPLIT,
        cms_bucket_col,
    )

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token")
    )
    rows = spark.range(CMS_DEPTH).select(F.col("id").cast("long").alias("i"))
    corpus = {
        (r.i, r.bucket): r.cnt
        for r in toks.crossJoin(F.broadcast(rows))
        .groupBy(
            "i", cms_bucket_col(F.col("token"), F.col("i")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    assert dict(by_cell) == corpus
