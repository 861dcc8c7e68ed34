"""Property tests (SURVEY §5.4): hypothesis-generated inputs, one Spark
round-trip per test (examples are generated as a batch, not one job per
example, to keep Spark's per-job overhead out of the hypothesis loop).

Laws covered:
  * multi-format date parse is format-agnostic and total;
  * sales_amount rounding is HALF_UP (matches Postgres NUMERIC ROUND);
  * ROLLUP(a, b) row count = |group(a,b)| + |group(a)| + 1;
  * LAG-based growth is NULL on the first period and on zero base.
"""

from __future__ import annotations

import datetime as dt
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.functions.dates import (
    parse_date_multi,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

dates = st.dates(min_value=dt.date(1971, 1, 1), max_value=dt.date(2099, 12, 31))


@SETTINGS
@given(st.lists(dates, min_size=1, max_size=50))
def test_multi_format_parse_roundtrip(spark, ds):
    """Each of the 4 reference formats parses back to the same date."""
    rows = []
    for i, d in enumerate(ds):
        rows.append((i * 4 + 0, d.strftime("%Y-%m-%d"), d))
        rows.append((i * 4 + 1, d.strftime("%d-%m-%Y"), d))
        rows.append((i * 4 + 2, d.strftime("%m/%d/%Y"), d))
        rows.append((i * 4 + 3, d.strftime("%Y/%m/%d"), d))
    df = spark.createDataFrame(rows, "id long, raw string, expect date")
    bad = df.filter(parse_date_multi("raw") != F.col("expect")).count()
    assert bad == 0


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.decimals(
                min_value="0.01", max_value="9999.99", places=2, allow_nan=False
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_sales_amount_rounds_half_up(spark, qty_price):
    """round(qty*price, 2) == Decimal HALF_UP quantization (P6 parity:
    Postgres ROUND on NUMERIC is half-up; so is Spark on decimals)."""
    rows = [
        (i, q, p, (Decimal(q) * p).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        for i, (q, p) in enumerate(qty_price)
    ]
    df = spark.createDataFrame(
        rows, "id long, qty int, price decimal(12,2), expect decimal(12,2)"
    )
    got = df.withColumn(
        "amount",
        F.round(F.col("qty") * F.col("price"), 2).cast("decimal(12,2)"),
    )
    assert got.filter(F.col("amount") != F.col("expect")).count() == 0


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a1", "a2", "a3"]),
            st.sampled_from(["b1", "b2"]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rollup_rowcount_law(spark, rows):
    """|ROLLUP(a,b)| == |(a,b) groups| + |a groups| + 1 (grand total)."""
    df = spark.createDataFrame(rows, "a string, b string, v long")
    rollup_n = df.rollup("a", "b").agg(F.sum("v")).count()
    ab = df.select("a", "b").distinct().count()
    a = df.select("a").distinct().count()
    assert rollup_n == ab + a + 1


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=0, max_value=50),  # revenues incl. zeros
        min_size=1,
        max_size=12,
    )
)
def test_growth_null_on_first_and_zero_base(spark, revs):
    """The W4 growth expression is NULL exactly when LAG is NULL (first
    period) or the base is zero (NULLIF guard)."""
    df = spark.createDataFrame(
        [(m, float(r)) for m, r in enumerate(revs)], "month int, rev double"
    )
    w = Window.orderBy("month")
    growth = F.round(
        (F.col("rev") - F.lag("rev").over(w))
        / F.nullif(F.lag("rev").over(w), F.lit(0))
        * 100,
        2,
    )
    out = df.withColumn("g", growth).orderBy("month").collect()
    for i, r in enumerate(out):
        if i == 0 or revs[i - 1] == 0:
            assert r.g is None
        else:
            assert r.g is not None
