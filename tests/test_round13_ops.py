"""Round-13 gates: per-session scoping of the two write-side registry
entries (concurrent drivers on the same scale factor must not race a
shared /tmp destination — round-12 advice), plus this round's other
behavior pins."""

from __future__ import annotations

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    layout,
    similarity,
)

SF = "/root/testdata/sf0.001"


def test_compact_dests_are_scoped_per_session(spark):
    """Both filesystem-side entries write under a path containing the
    Spark application id: two concurrent drivers (distinct apps) can
    never overwrite each other's rewrite output, while repeated calls
    within one session stay idempotent (stable path, overwrite mode)."""
    app_id = spark.sparkContext.applicationId
    ann = similarity._ann_compact_dest(spark, SF)
    lay = layout._compact_dest(spark, SF)
    assert app_id in ann and ann.endswith("/sf0.001/lists")
    assert app_id in lay and lay.endswith("/sf0.001/events")
    assert ann.startswith(similarity._ANN_COMPACT_ROOT)
    assert lay.startswith(layout._COMPACT_ROOT)
    # stable within the session — the idempotence contract's anchor
    assert similarity._ann_compact_dest(spark, SF) == ann
    assert layout._compact_dest(spark, SF) == lay


def test_cached_doc_tokens_matches_uncached(spark):
    """The session-cached corpus token table is value-identical to the
    uncached projection and actually persists (second call returns the
    same DataFrame object from the shared cache)."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        curation,
    )

    a = curation.cached_doc_tokens(spark, SF)
    b = curation._doc_tokens(spark, SF)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert curation.cached_doc_tokens(spark, SF) is a
    assert a.storageLevel.useMemory


def test_gc_stale_app_dirs(tmp_path):
    """Per-app scratch dirs older than the age bound are swept; the
    live app's dir, young dirs, and plain files survive."""
    import os
    import time

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.artifacts import (
        gc_stale_app_dirs,
    )

    root = tmp_path / "root"
    for name in ("app-live", "app-old", "app-young"):
        (root / name).mkdir(parents=True)
    (root / "loosefile").write_text("x")
    old = time.time() - 7 * 3600
    os.utime(root / "app-old", (old, old))
    os.utime(root / "app-live", (old, old))  # old but it is OURS
    gc_stale_app_dirs(str(root), "app-live")
    assert sorted(os.listdir(root)) == ["app-live", "app-young", "loosefile"]
    # liveness beacon (round-14 advice): the call renews the live
    # session's own lease, so a long-lived session whose steady-state
    # rewrites only touch NESTED dirs cannot be swept by a concurrent
    # driver's later GC.
    assert time.time() - os.path.getmtime(root / "app-live") < 60


def test_existing_max_id_debris_vs_damage(spark, tmp_path):
    """The sales-id sequence bootstrap: missing dir or job debris
    starts at 0 (nothing committed), but a read failure over COMMITTED
    rows must propagate — falling back to 0 would restart the sequence
    and mint duplicate sales_ids on resume."""
    import pytest
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        hybrid_join,
    )

    d = tmp_path / "fact"
    assert hybrid_join._existing_max_id(spark, str(d)) == 0  # missing
    (d / "_temporary").mkdir(parents=True)
    assert hybrid_join._existing_max_id(spark, str(d)) == 0  # debris
    spark.range(5).select(
        (F.col("id") + 100).alias("sales_id")
    ).coalesce(1).write.mode("append").parquet(str(d))
    assert hybrid_join._existing_max_id(spark, str(d)) == 104  # committed
    for f in d.iterdir():
        if f.name.endswith(".parquet"):
            f.write_bytes(b"\x00broken")
    with pytest.raises(Exception):
        hybrid_join._existing_max_id(spark, str(d))  # damage propagates


def test_existing_max_id_reads_partitioned_sink(spark, tmp_path):
    """Round-13 review catch: run_stream(partition_by_year=True)
    writes a hive-partitioned sink whose TOP level has no .parquet
    names at all — the sequence bootstrap must still read the real
    max (a filename probe returned 0 there, restarting the sequence
    over committed rows)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        hybrid_join,
    )

    d = tmp_path / "fact_part"
    spark.range(4).select(
        (F.col("id") + 500).alias("sales_id"),
        (F.lit(2024) + (F.col("id") % 2)).alias("sale_year"),
    ).write.partitionBy("sale_year").mode("append").parquet(str(d))
    assert hybrid_join._existing_max_id(spark, str(d)) == 503
