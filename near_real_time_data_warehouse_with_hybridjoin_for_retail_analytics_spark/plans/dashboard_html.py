"""Self-contained dashboard shell (SURVEY §3.3 — the last residual).

The reference serves its six views through a Streamlit page with a
sidebar year selector and plotly charts
(`/root/reference/dashboard.py:27-43`). Streamlit/plotly are not
installable here, and a 100 TB deployment would not sit a Python
process between the warehouse and every viewer anyway — the standard
shape is "the pipeline renders the dashboard artifact; a static host
serves it". This module is that shape, dependency-free end to end:

- every (year, view) frame comes from the SAME parameterized serving
  layer the reference's sidebar drives (``run_dashboard_query``);
- every chart renders through the in-repo SVG engine
  (``render_dashboard_chart_svg``) in BOTH light and dark;
- the output is ONE static HTML file with the year selector and a
  light/dark toggle wired by ~20 lines of inline vanilla JS showing /
  hiding pre-rendered panels — no server, no dependency, opens in any
  browser.

Interactivity parity with the reference: the year <select> mirrors the
sidebar (`dashboard.py:33-38`), and — faithfully — only the three
year-filtered views change with it; the other three are rendered once
per mode and shown for every year, exactly as the reference re-renders
identical frames (serving.YEAR_FILTERED documents the split).
"""

from __future__ import annotations

import html as _html

from pyspark.sql import SparkSession

from .serving import (
    DASHBOARD_QUERIES,
    YEAR_FILTERED,
    render_dashboard_chart_svg,
    run_dashboard_query,
)

_CSS = """
body { margin: 0; font-family: system-ui, sans-serif;
       background: var(--bg); color: var(--fg);
       --bg: #ffffff; --fg: #1a1a1a; }
body.dark { --bg: #121212; --fg: #e8e8e8; }
header { display: flex; gap: 16px; align-items: center;
         padding: 12px 20px; border-bottom: 1px solid #8884; }
h1 { font-size: 18px; margin: 0; flex: 1; }
.grid { display: grid; grid-template-columns: repeat(auto-fit,
        minmax(480px, 1fr)); gap: 16px; padding: 16px; }
.panel { border: 1px solid #8883; border-radius: 8px; padding: 8px;
         overflow: auto; }
.panel svg { max-width: 100%; height: auto; }
select, button { font: inherit; padding: 4px 8px; }
"""

_JS = """
function refresh() {
  var year = document.getElementById('year').value;
  var dark = document.body.classList.contains('dark');
  document.querySelectorAll('.panel').forEach(function (p) {
    var yearOk = p.dataset.year === 'all' || p.dataset.year === year;
    var modeOk = p.dataset.mode === (dark ? 'dark' : 'light');
    p.style.display = (yearOk && modeOk) ? '' : 'none';
  });
}
document.getElementById('year').addEventListener('change', refresh);
document.getElementById('mode').addEventListener('click', function () {
  document.body.classList.toggle('dark');
  refresh();
});
refresh();
"""


def render_dashboard_html(
    spark: SparkSession, years: list[int], title: str = "Retail Analytics"
) -> str:
    """Render the full dashboard to one self-contained HTML string.
    Requires the warehouse views registered
    (``warehouse_queries.register_warehouse``). Year-filtered views are
    rendered once per (year, mode); year-independent views once per
    mode and tagged ``data-year="all"``."""
    if not years:
        # a feed whose every date failed to parse yields no years; an
        # IndexError at years[0] below would be unactionable
        raise ValueError("no years in fact table: cannot render dashboard")
    panels: list[str] = []
    for name in DASHBOARD_QUERIES:
        year_keys = years if name in YEAR_FILTERED else [None]
        for year in year_keys:
            pdf = run_dashboard_query(
                spark, name, year=year if year is not None else years[0]
            ).toPandas()
            for dark in (False, True):
                # a view can be legitimately empty for a year (e.g. a
                # growth series whose every LAG base is null) — render
                # an explicit empty-state panel instead of a chart
                if pdf.empty:
                    svg = (
                        '<svg xmlns="http://www.w3.org/2000/svg" '
                        'width="480" height="80" role="img">'
                        '<text x="16" y="45" font-size="13" '
                        'fill="#888">no data for this selection</text></svg>'
                    )
                else:
                    svg = render_dashboard_chart_svg(pdf, name, dark=dark)
                panels.append(
                    '<div class="panel" data-view="{v}" data-year="{y}" '
                    'data-mode="{m}">{svg}</div>'.format(
                        v=_html.escape(name),
                        y="all" if year is None else year,
                        m="dark" if dark else "light",
                        svg=svg,
                    )
                )
    options = "".join(
        f'<option value="{y}">{y}</option>' for y in years
    )
    return (
        "<!DOCTYPE html>\n<html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title>"
        f"<style>{_CSS}</style></head><body>"
        f"<header><h1>{_html.escape(title)}</h1>"
        f'<label>Year <select id="year">{options}</select></label>'
        '<button id="mode">light / dark</button></header>'
        f'<div class="grid">{"".join(panels)}</div>'
        f"<script>{_JS}</script></body></html>"
    )


def write_dashboard_html(
    spark: SparkSession, years: list[int], path: str
) -> str:
    """Render and write the dashboard artifact; returns the path."""
    doc = render_dashboard_html(spark, years)
    with open(path, "w") as fh:
        fh.write(doc)
    return path
