"""Live server-backed dashboard (`plans/dashboard_server.py`): the
Streamlit-equivalent interaction loop — every request re-runs the
view's SQL against the registered warehouse — answering AD-HOC years
the pre-rendered static artifact cannot (the round-11 verdict's
residual #1). Drives a real http.server over a real ETL'd warehouse
via urllib: shell, metadata endpoints, live SVG panels for committed
AND out-of-set years, dark mode, and error paths."""

from __future__ import annotations

import json
import threading
import urllib.request
import xml.etree.ElementTree as ET

import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
    dashboard_server,
    serving,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def live(spark):
    from tools.render_dashboard import prepare_warehouse

    years = prepare_warehouse(spark, SF)
    srv = dashboard_server.make_dashboard_server(spark, years, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", years
    srv.shutdown()


def _get(url: str):
    import urllib.error

    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return (
                r.status,
                r.read().decode("utf-8"),
                r.headers.get("Content-Type"),
            )
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode("utf-8"), e.headers.get("Content-Type")


def test_shell_and_metadata(live):
    base, years = live
    code, body, ctype = _get(f"{base}/")
    assert code == 200 and ctype.startswith("text/html")
    assert 'id="year"' in body and "/panel" in body
    code, body, _ = _get(f"{base}/views")
    assert code == 200
    assert {v["name"] for v in json.loads(body)} == set(
        serving.DASHBOARD_QUERIES
    )
    code, body, _ = _get(f"{base}/years")
    assert json.loads(body) == years


def test_every_view_renders_live_svg(live):
    base, years = live
    for name in serving.DASHBOARD_QUERIES:
        code, body, ctype = _get(
            f"{base}/panel?name={name}&year={years[0]}&dark=0"
        )
        assert code == 200 and ctype.startswith("image/svg+xml"), name
        root = ET.fromstring(body)  # well-formed XML
        assert root.tag.endswith("svg"), name


def test_adhoc_year_outside_prerendered_set(live):
    """The residual this server closes: a year the static artifact
    never rendered gets a LIVE answer — the explicit empty-state panel
    for a year with no facts (Streamlit's empty-DataFrame behavior),
    not an error and not a stale panel."""
    base, years = live
    ghost = max(years) + 7
    code, body, ctype = _get(
        f"{base}/panel?name=top_products&year={ghost}&dark=0"
    )
    assert code == 200 and ctype.startswith("image/svg+xml")
    assert "no data for this selection" in body
    # year-independent views still answer with a real chart
    code, body, _ = _get(
        f"{base}/panel?name=demographics&year={ghost}&dark=0"
    )
    assert code == 200
    assert "no data for this selection" not in body


def test_dark_mode_and_errors(live):
    base, years = live
    _, light, _ = _get(f"{base}/panel?name=top_products&year={years[0]}&dark=0")
    _, dark, _ = _get(f"{base}/panel?name=top_products&year={years[0]}&dark=1")
    assert light != dark
    code, _, _ = _get(f"{base}/panel?name=nope&year={years[0]}")
    assert code == 404
    code, _, _ = _get(f"{base}/panel?name=top_products&year=banana")
    assert code == 400


def test_render_failure_returns_500_not_dropped_connection(live):
    """A render/Spark error must surface as HTTP 500 (review finding,
    round 12): a huge year value passes int() but breaks downstream —
    the client needs a status line, not a closed socket."""
    base, _years = live
    code, body, _ = _get(
        f"{base}/panel?name=top_products&year={10**30}&dark=0"
    )
    assert code == 500
    assert "render failed" in body
