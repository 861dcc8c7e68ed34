"""Plan evidence for the AQE claims SCALE.md makes.

The engine's skew story is "salting is unnecessary — AQE splits skewed
partitions at runtime". That claim needs evidence, not prose: this test
builds a join whose left side has one dominant hot key, lowers the skew
thresholds to make the sf-appropriate data qualify, and asserts the
executed SortMergeJoin actually ran in skew-split mode (isSkew=true on
the join, OptimizeSkewedJoin having split the hot partition into
multiple reader slices), with results identical to the broadcast plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # keep AQE from coalescing everything into one partition first
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


def test_aqe_splits_the_hot_key_partition(spark, skew_confs):
    # left: 400k rows, ~90% on key 0 (the hot boilerplate key shape);
    # right: 50k distinct keys, a few hundred bytes per row.
    left = spark.range(0, 400_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("v"),
    )
    right = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    # collect() (not count()) so the inspected QueryExecution is the
    # executed adaptive one — count() plans its own aggregate query.
    joined = left.join(right, "k").select(F.length("v").alias("x"))
    n = len(joined.collect())
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin(skew=true)" in plan, plan[:4000]
    assert "AQEShuffleRead" in plan and "skewed" in plan, plan[:4000]

    # same row count as the forced-broadcast plan (correctness of the split)
    want = left.join(F.broadcast(right), "k").count()
    assert n == want
