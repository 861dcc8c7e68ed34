"""Bucketed fact layout: co-located joins with zero exchanges.

`catalog.ingest_bucketed` writes a fact table bucketed+sorted by its
join key. These tests pin the scale claim with plan evidence: a
lineitem self-join on the bucket key (the q16 affinity shape) and an
orders⋈lineitem join between two co-bucketed tables must contain NO
shuffle Exchange in the executed plan, while producing exactly the
same rows as the plain parquet path.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark import (
    catalog,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force the join strategy decision onto bucketing, not size."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(plan: str) -> int:
    # count shuffle exchanges only (broadcast exchanges are not shuffles)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan))


def test_bucketed_self_join_runs_with_zero_exchanges(spark, no_broadcast):
    t = catalog.ingest_bucketed(spark, SF, "lineitem", buckets=8)
    li = spark.table(t).select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    joined = a.join(b, "l_orderkey").filter(
        F.col("a.l_partkey") < F.col("b.l_partkey")
    )
    plan = _executed(joined)
    assert _n_shuffles(plan) == 0, plan
    assert "SortMergeJoin" in plan

    # same rows as the plain parquet path
    raw = catalog.load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    want = (
        raw.alias("a")
        .join(raw.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .count()
    )
    assert joined.count() == want


def test_cobucketed_orders_lineitem_join_skips_shuffle(spark, no_broadcast):
    to = catalog.ingest_bucketed(spark, SF, "orders", buckets=8)
    tl = catalog.ingest_bucketed(spark, SF, "lineitem", buckets=8)
    o = spark.table(to).select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    li = spark.table(tl).select("l_orderkey", "l_quantity")
    joined = o.join(li, "l_orderkey")
    plan = _executed(joined)
    assert _n_shuffles(plan) == 0, plan

    raw_o = catalog.load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    raw_l = catalog.load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    assert joined.count() == raw_o.join(raw_l, "l_orderkey").count()


def test_bucketed_groupby_on_key_skips_shuffle(spark, no_broadcast):
    """Aggregation on the bucket key reuses the bucketing too."""
    t = catalog.ingest_bucketed(spark, SF, "lineitem", buckets=8)
    agg = spark.table(t).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = _executed(agg)
    assert _n_shuffles(plan) == 0, plan


def _clear_table_cache():
    catalog._DF_CACHE.clear()


def test_registry_queries_route_through_bucketed_layout(
    spark, no_broadcast, monkeypatch
):
    """SPARK_GRAFT_BUCKETED=1 serves lineitem/orders to every registry
    query from the bucketed catalog layout: q16 (the reference's
    affinity self-join, queries.sql:236-243) must run its join without
    a shuffle — its only exchange is the pair-count groupBy — and
    produce exactly the rows of the plain parquet path."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
        testdata_queries as tq,
    )

    q16 = tq.QUERIES["q16_affinity_pairs"]
    q02 = tq.QUERIES["q02_segment_demographics"]

    _clear_table_cache()
    plain16 = [tuple(r) for r in q16(spark, SF).collect()]
    plain02 = sorted(tuple(r) for r in q02(spark, SF).collect())

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED", "1")
    monkeypatch.setenv("SPARK_GRAFT_BUCKETS", "8")
    _clear_table_cache()
    try:
        df16 = q16(spark, SF)
        rows16 = [tuple(r) for r in df16.collect()]
        # under AQE the string repeats the Initial Plan — count shuffles
        # in the Final Plan section only
        plan16 = (
            df16._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("Initial Plan")[0]
        )
        # scans come from the bucketed store, the self-join is
        # exchange-free; the one shuffle left is the pair groupBy
        assert "sparkgraft_bucketed" in plan16, plan16
        assert _n_shuffles(plan16) == 1, plan16
        assert rows16 == plain16

        rows02 = sorted(tuple(r) for r in q02(spark, SF).collect())
        assert rows02 == plain02
    finally:
        _clear_table_cache()  # drop bucketed entries for later tests
