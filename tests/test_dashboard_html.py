"""The static dashboard shell (`plans/dashboard_html.py`): one
self-contained HTML artifact carrying every (view, year, mode) panel
pre-rendered through the serving layer + SVG engine, with the year
selector / mode toggle wired by inline JS. Asserts the panel
inventory (year-filtered views per year, year-independent views once,
each in light AND dark), the selector options, self-containment (no
external resources), and that every embedded SVG is well-formed."""

from __future__ import annotations

import datetime as dt
import re
import shutil
import tempfile
import xml.etree.ElementTree as ET
from pathlib import Path

import pytest

from test_warehouse_queries import CUSTOMER_CSV, PRODUCT_CSV, TRANSACTIONS_CSV

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.etl.date_dim import (
    build_date_dim,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.etl.dimensions import (
    build_customer_dim,
    split_product_master,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
    dashboard_html,
    serving,
    warehouse_queries as wq,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    hybrid_join as hj,
)

YEARS = [2017, 2018]


@pytest.fixture(scope="module")
def page(spark):
    d = Path(tempfile.mkdtemp(prefix="dashtest_"))
    (d / "customer.csv").write_text(CUSTOMER_CSV)
    (d / "product.csv").write_text(PRODUCT_CSV)
    (d / "tx.csv").write_text(TRANSACTIONS_CSV)
    customer = build_customer_dim(spark, str(d / "customer.csv"))
    product, store, supplier = split_product_master(
        spark, str(d / "product.csv")
    )
    date_dim = build_date_dim(spark, dt.date(2017, 1, 1), dt.date(2018, 12, 31))
    raw = spark.read.option("header", True).csv(str(d / "tx.csv"))
    fact, _n, _cleanup = hj.assign_sales_ids(
        hj.enrich(hj.normalize_stream(raw), customer, product), offset=0
    )
    wq.register_warehouse(
        spark,
        {
            "customer": customer,
            "product": product,
            "store": store,
            "supplier": supplier,
            "date_dim": date_dim,
            "sales": fact,
        },
    )
    html = dashboard_html.render_dashboard_html(spark, YEARS)
    shutil.rmtree(d, ignore_errors=True)
    return html


def _panels(html: str) -> list[dict]:
    return [
        {"view": m.group(1), "year": m.group(2), "mode": m.group(3)}
        for m in re.finditer(
            r'<div class="panel" data-view="([^"]+)" data-year="([^"]+)" '
            r'data-mode="([^"]+)">',
            html,
        )
    ]


def test_panel_inventory(page):
    panels = _panels(page)
    views = set(serving.DASHBOARD_QUERIES)
    got = {(p["view"], p["year"], p["mode"]) for p in panels}
    expected = set()
    for v in views:
        years = [str(y) for y in YEARS] if v in serving.YEAR_FILTERED else ["all"]
        for y in years:
            for m in ("light", "dark"):
                expected.add((v, y, m))
    assert got == expected
    assert len(panels) == len(expected)  # no duplicate panels


def test_selector_and_toggle_wiring(page):
    for y in YEARS:
        assert f'<option value="{y}">{y}</option>' in page
    assert 'id="year"' in page and 'id="mode"' in page
    assert "dataset.year" in page and "dataset.mode" in page


def test_self_contained(page):
    # no external fetches of any kind: a static host serves one file
    # (xmlns namespace URIs are identifiers, not fetches)
    assert "<script src" not in page and "<link" not in page
    assert not re.search(r'(src|href)\s*=\s*"https?://', page)


def test_every_svg_well_formed(page):
    svgs = re.findall(r"<svg.*?</svg>", page, flags=re.S)
    assert len(svgs) == len(_panels(page))
    for s in svgs:
        ET.fromstring(s)  # raises on malformed XML
