"""Deterministic Date dimension builder.

The reference assigns date_id = MAX(date_id)+1 at flush time
(hybridjoin.py:149-205) — arrival-order-dependent. Per SURVEY §7.1 we
replace that with a pre-materialized calendar whose id is a pure
function of the date (yyyymmdd), so ids are stable across runs,
partitions, and stream orderings, and the date join is a plain
broadcast equi-join instead of a stateful upsert.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import day_i, day_name, is_weekend, month_i, quarter_i, year_i


def date_id_expr(date_col) -> F.Column:
    """date_id = yyyymmdd as int — deterministic surrogate key."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def build_date_dim(
    spark: SparkSession, start: dt.date, end: dt.date
) -> DataFrame:
    """Full calendar [start, end] with the reference's attribute set
    (hybridjoin.py:170-177): day/month/year, English day name, quarter,
    weekend flag."""
    cal = spark.sql(
        f"SELECT explode(sequence(DATE'{start.isoformat()}', DATE'{end.isoformat()}', "
        "INTERVAL 1 DAY)) AS transaction_date"
    )
    d = F.col("transaction_date")
    return cal.select(
        date_id_expr(d).alias("date_id"),
        d,
        day_i(d).alias("day_num"),
        month_i(d).alias("month_num"),
        year_i(d).alias("year"),
        day_name(d).alias("day_of_week"),
        quarter_i(d).alias("quarter_num"),
        is_weekend(d).alias("is_weekend"),
    )
