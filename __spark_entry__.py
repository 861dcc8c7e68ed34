"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators  # noqa: F401  (registers operator queries)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
    registry,
    testdata_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1: top brands by month × weekend) on sf0.001."""
    return testdata_queries.QUERIES["q01_top_brands_month_weekend"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    beyond-reference dedup/similarity/text/multimodal operators."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each (SQL-expressible) query."""
    return dict(registry.ORACLES)
