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


# The driver verifies the FIRST 50 entries of queries() each round; the
# registry holds more than 50, so ordering decides what gets a fresh
# CORRECTNESS row. Policy (documented in COVERAGE.md): the reference's
# 20-query OLAP surface + the ETL queries lead every round, then entries
# that are new/changed this round or at the verification margin; the
# remainder rotates so nothing goes more than 2 rounds unverified.
_VERIFY_FIRST = [
    *[n for n in registry.QUERIES if n.startswith("q")],  # q01..q20 in order
    "etl_enrich_events",
    "etl_events_by_type",
    # new or reworked this round
    "ann_topk_ivf",
    "ann_topk_lsh",
    "dedup_embedding_candidates",
    "dedup_multimodal_components",
    # streaming ETL surface
    "etl_events_hourly",
    "etl_user_sessions",
    "etl_stream_dedup",
    "etl_click_attribution",
    # round-3 additions that sat at the 50-entry margin
    "events_funnel",
    "events_retention",
    "curation_temperature_mix",
    "embedding_norm_stats",
    "embedding_random_projection",
    "embedding_scalar_quantize",
    "events_anomaly_zscore",
    # dedup family (multimodal_components depends on these)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_crosscheck",
    "dedup_components",
    "dedup_component_stats",
    # timeseries + embedding aggregations
    "ann_topk_bruteforce",
    "embedding_centroids_by_label",
    "ann_centroid_assign",
    "multimodal_features",
    "multimodal_decode_stats",
]


def _ordered(names: dict) -> list[str]:
    first = [n for n in _VERIFY_FIRST if n in names]
    rest = [n for n in names if n not in set(first)]
    return first + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    beyond-reference dedup/similarity/text/multimodal operators."""
    return {n: registry.QUERIES[n] for n in _ordered(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each (SQL-expressible) query."""
    return {n: registry.ORACLES[n] for n in _ordered(registry.ORACLES)}
