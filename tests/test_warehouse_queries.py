"""End-to-end warehouse parity: master CSVs → ETL → star schema →
all 20 reference queries + the parameterized dashboard layer.

Exercises the full reference lifecycle (SURVEY §3.1-§3.4) on synthetic
reference-native fixtures (FIXTURES.md §A): dimension builds from the
denormalized product master, batch enrichment through the same code the
stream uses, and the complete query catalog.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from decimal import Decimal
from pathlib import Path

import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.etl.date_dim import (
    build_date_dim,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.etl.dimensions import (
    build_customer_dim,
    split_product_master,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
    serving,
    warehouse_queries as wq,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    hybrid_join as hj,
)

CUSTOMER_CSV = """index,Customer_ID,Gender,Age,Occupation,City_Category,Stay_In_Current_City_Years,Marital_Status
0,1000001,M,26-35,7,A,2,0
1,1000002,F,18-25,3,B,1,1
2,1000003,F,55+,12,C,4,0
3,1000004,M,36-45,0,A,0,1
"""

PRODUCT_CSV = """index,Product_ID,Product_Category,price$,storeID,supplierID,storeName,supplierName
0,P001,Toys,10.50,3,2,Store Three,Supplier Two
1,P002,Appliances,79.95,4,5,Store Four,Supplier Five
2,P003,Toys,5.25,3,5,Store Three,Supplier Five
"""

TRANSACTIONS_CSV = """orderID,Customer_ID,Product_ID,quantity,date
100,1000001,P001,2,2017-01-14
100,1000001,P002,1,2017-01-14
101,1000002,P001,3,2017-02-20
102,1000003,P003,4,2017-07-01
103,1000004,P002,1,2017-07-02
104,1000001,P003,2,2018-03-10
105,1000002,P002,2,2018-03-11
105,1000002,P001,1,2018-03-11
106,1000003,P001,5,2018-12-25
107,1000003,P001,50,2018-12-26
"""


@pytest.fixture(scope="module")
def warehouse(spark):
    d = Path(tempfile.mkdtemp(prefix="whtest_"))
    (d / "customer.csv").write_text(CUSTOMER_CSV)
    (d / "product.csv").write_text(PRODUCT_CSV)
    (d / "tx.csv").write_text(TRANSACTIONS_CSV)

    customer = build_customer_dim(spark, str(d / "customer.csv"))
    product, store, supplier = split_product_master(spark, str(d / "product.csv"))
    date_dim = build_date_dim(spark, dt.date(2017, 1, 1), dt.date(2018, 12, 31))

    raw = spark.read.option("header", True).csv(str(d / "tx.csv"))
    fact, _n, _cleanup = hj.assign_sales_ids(
        hj.enrich(hj.normalize_stream(raw), customer, product), offset=0
    )

    tables = {
        "customer": customer,
        "product": product,
        "store": store,
        "supplier": supplier,
        "date_dim": date_dim,
        "sales": fact,
    }
    wq.register_warehouse(spark, tables)
    yield tables
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", sorted(wq.WAREHOUSE_QUERIES))
def test_warehouse_query_runs(spark, warehouse, name):
    df = wq.run_query(spark, name)
    rows = df.collect()
    assert df.columns, name
    # every query has data on this fixture except none — all shapes produce rows
    assert len(rows) > 0, f"{name} returned no rows"


def test_q2_hand_checked(spark, warehouse):
    """Hand-computed demographics for the fixture."""
    rows = {
        (r.gender, r.age_group, r.city_category): (r.total_revenue, r.units_sold)
        for r in wq.run_query(spark, "q2_demographics_spend").collect()
    }
    # customer 1000001 (M,26-35,A): 2*10.50 + 1*79.95 + 2*5.25 = 111.45, units 5
    assert rows[("M", "26-35", "A")] == (Decimal("111.45"), 5)
    # customer 1000004 (M,36-45,A): 1*79.95
    assert rows[("M", "36-45", "A")] == (Decimal("79.95"), 1)


def test_q16_affinity_hand_checked(spark, warehouse):
    """Orders 100 and 105 both contain {P001,P002} → pair_count 2."""
    top = wq.run_query(spark, "q16_affinity_pairs").collect()
    assert (top[0].product_a, top[0].product_b, top[0].times_bought_together) == (
        "P001",
        "P002",
        2,
    )


def test_q17_rollup_levels(spark, warehouse):
    """ROLLUP row-count law: k-key rollup = sum over k+1 grouping levels,
    including the grand-total row (SURVEY §5.4)."""
    rows = wq.run_query(spark, "q17_rollup_store_supplier_category").collect()
    grand = [r for r in rows if r.store_name is None]
    assert len(grand) == 1  # single grand-total row
    # grand total equals the sum of fully-grouped leaves
    leaves = [
        r.yearly_revenue
        for r in rows
        if r.store_name is not None
        and r.supplier_name is not None
        and r.product_category is not None
        and r.year is not None
    ]
    assert grand[0].yearly_revenue == sum(leaves)


def test_q19_spike_flag_only_spikes(spark, warehouse):
    for r in wq.run_query(spark, "q19_daily_spikes").collect():
        assert r.status == "SPIKE"
        assert r.daily_total > 2 * r.avg_daily_sales


@pytest.mark.parametrize("name", sorted(serving.DASHBOARD_QUERIES))
def test_dashboard_query_runs(spark, warehouse, name):
    df = serving.run_dashboard_query(spark, name, year=2017)
    assert len(df.collect()) > 0, name


def test_product_master_without_store_supplier_columns(spark):
    """S4 schema-introspection parity (hybridjoin.py:88-99): a product
    master lacking storeID/supplierID/name columns still loads, ids
    defaulting to the default store/supplier."""
    d = Path(tempfile.mkdtemp(prefix="s4test_"))
    try:
        (d / "product.csv").write_text(
            "index,Product_ID,Product_Category,price$\n"
            "0,P001,Toys,10.50\n"
            "1,P002,Appliances,79.95\n"
        )
        product, store, supplier = split_product_master(spark, str(d / "product.csv"))
        prows = {r.product_id: r for r in product.collect()}
        assert prows["P001"].store_id == 1 and prows["P001"].supplier_id == 1
        assert [tuple(r) for r in store.collect()] == [(1, "Unknown Store")]
        assert [tuple(r) for r in supplier.collect()] == [(1, "Unknown Supplier")]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dashboard_year_filter(spark, warehouse):
    df = serving.run_dashboard_query(spark, "quarterly_trends", year=2018)
    quarters = {r.quarter_num for r in df.collect()}
    assert quarters <= {1, 4}  # 2018 fixture sales only in Q1 and Q4


# The reference's plotting layer consumes these exact lowercase columns
# (Postgres folds unquoted identifiers; dashboard.py:82-91,...,257-264).
DASHBOARD_CONTRACT = {
    "top_products": [
        "product_id", "product_category", "monthnum", "is_weekend",
        "revenue", "rn",
    ],
    "demographics": ["gender", "age_group", "city_category", "total_revenue"],
    "category_occupation": ["product_category", "occupation", "total_revenue"],
    "quarterly_trends": ["quarter_num", "gender", "age_group", "total_revenue"],
    "top_cities": ["city_category", "product_category", "total_revenue", "rn"],
    "monthly_growth": ["product_category", "monthnum", "growth_percent"],
}


@pytest.mark.parametrize("name", sorted(serving.DASHBOARD_QUERIES))
def test_dashboard_chart_contract(spark, warehouse, name):
    """Each view's frame carries exactly the columns the reference's
    plotly call binds, numeric measures included — a migrating dashboard
    can point its six px.* calls at these frames unchanged."""
    df = serving.run_dashboard_query(spark, name, year=2017)
    assert df.columns == DASHBOARD_CONTRACT[name]
    spec = serving.CHART_SPECS[name]
    bound = [
        v
        for k, v in spec.items()
        if k in ("x", "y", "color", "facet_col", "line_dash", "values")
    ] + list(spec.get("path", []))
    assert set(bound) <= set(df.columns), name
    # the measure column is numeric (plotly y/values axis)
    measure = spec.get("y") or spec.get("values")
    dtype = dict(df.dtypes)[measure]
    assert any(t in dtype for t in ("int", "double", "decimal", "float")), dtype


def test_dashboard_render_is_guarded():
    """plotly is absent in this container: the renderer must raise the
    declared NotImplementedError, not an ImportError surprise."""
    try:
        import plotly  # noqa: F401

        pytest.skip("plotly installed; render path active")
    except ImportError:
        pass
    import pandas as pd

    with pytest.raises(NotImplementedError):
        serving.render_dashboard_chart(pd.DataFrame(), "top_products")
