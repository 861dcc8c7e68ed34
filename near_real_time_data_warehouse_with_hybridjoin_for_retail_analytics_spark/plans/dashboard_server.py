"""Live server-backed dashboard (stdlib ``http.server``, zero deps).

The reference's Streamlit page re-queries PostgreSQL on every
interaction (``/root/reference/dashboard.py:46-47`` — `st.selectbox`
→ `pd.read_sql` per rerun). The static HTML artifact
(``dashboard_html.py``) pre-renders every (view, year, mode) panel,
which covers the committed year set but not AD-HOC parameters; this
module closes that residual: each request runs the view's
parameterized SQL against the registered warehouse LIVE and renders
the SVG on the fly, so ANY year value — including ones outside the
pre-rendered set — gets an answer (a real chart when the fact table
has rows for it, the explicit empty-state panel when it does not,
exactly Streamlit's behavior with an empty DataFrame).

Endpoints:

- ``GET /``                 interactive shell: selectors re-fetch
                            ``/panel`` per change (the Streamlit
                            interaction loop, in ~20 lines of JS)
- ``GET /views``            JSON: view names + whether year-filtered
- ``GET /years``            JSON: years present in the fact table
- ``GET /panel?name=&year=&dark=``  live-rendered SVG for one view

Spark driver access is serialized with a lock — the SparkSession is
thread-safe but per-request serialization keeps latency predictable
and matches the single-user Streamlit topology this mirrors. At scale
the serving layer would front a thrift/connect gateway; the query
texts and the chart contract are identical either way.
"""

from __future__ import annotations

import html as _html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from .serving import (
    DASHBOARD_QUERIES,
    YEAR_FILTERED,
    render_dashboard_chart_svg,
    run_dashboard_query,
)

EMPTY_STATE_SVG = (
    '<svg xmlns="http://www.w3.org/2000/svg" '
    'width="480" height="80" role="img">'
    '<text x="16" y="45" font-size="13" '
    'fill="#888">no data for this selection</text></svg>'
)

_SHELL = """<!DOCTYPE html>
<html><head><meta charset='utf-8'><title>{title}</title>
<style>body{{font-family:sans-serif;margin:1.5rem}}
.grid{{display:grid;grid-template-columns:repeat(auto-fill,minmax(500px,1fr));gap:1rem}}
.panel{{border:1px solid #ddd;border-radius:8px;padding:.5rem}}</style>
</head><body><header><h1>{title}</h1>
<label>Year <select id="year">{options}</select></label>
<label><input type="checkbox" id="dark"> dark</label></header>
<div class="grid" id="grid"></div>
<script>
const VIEWS = {views_json};
async function refresh() {{
  const y = document.getElementById('year').value;
  const d = document.getElementById('dark').checked ? 1 : 0;
  const grid = document.getElementById('grid');
  grid.innerHTML = '';
  for (const v of VIEWS) {{
    const div = document.createElement('div');
    div.className = 'panel';
    div.innerHTML = await (await fetch(
      `/panel?name=${{v.name}}&year=${{y}}&dark=${{d}}`)).text();
    grid.appendChild(div);
  }}
}}
document.getElementById('year').addEventListener('change', refresh);
document.getElementById('dark').addEventListener('change', refresh);
refresh();
</script></body></html>"""


def render_panel_svg(
    spark: SparkSession, name: str, year: int, dark: bool
) -> str:
    """One view, live: parameterized SQL → pandas → SVG (or the
    explicit empty-state panel — ad-hoc years are first-class)."""
    pdf = run_dashboard_query(spark, name, year=year).toPandas()
    if pdf.empty:
        return EMPTY_STATE_SVG
    return render_dashboard_chart_svg(pdf, name, dark=dark)


def make_dashboard_server(
    spark: SparkSession,
    years: list[int],
    host: str = "127.0.0.1",
    port: int = 0,
    title: str = "Retail Analytics (live)",
) -> ThreadingHTTPServer:
    """Build (not start) the server; ``port=0`` picks a free port.
    Call ``.serve_forever()`` (``tools/serve_dashboard.py`` does) or
    drive it from a thread in tests."""
    if not years:
        raise ValueError("no years in fact table: cannot serve dashboard")
    lock = threading.Lock()
    views_json = json.dumps(
        [
            {"name": n, "year_filtered": n in YEAR_FILTERED}
            for n in DASHBOARD_QUERIES
        ]
    )
    options = "".join(f'<option value="{y}">{y}</option>' for y in years)
    shell = _SHELL.format(
        title=_html.escape(title), options=options, views_json=views_json
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet test output
            pass

        def _send(self, code: int, body: str, ctype: str) -> None:
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", f"{ctype}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path == "/":
                return self._send(200, shell, "text/html")
            if url.path == "/views":
                return self._send(200, views_json, "application/json")
            if url.path == "/years":
                return self._send(200, json.dumps(years), "application/json")
            if url.path == "/panel":
                q = parse_qs(url.query)
                name = q.get("name", [""])[0]
                if name not in DASHBOARD_QUERIES:
                    return self._send(404, "unknown view", "text/plain")
                try:
                    year = int(q.get("year", [str(years[0])])[0])
                except ValueError:
                    return self._send(400, "bad year", "text/plain")
                dark = q.get("dark", ["0"])[0] not in ("0", "", "false")
                try:
                    with lock:
                        svg = render_panel_svg(spark, name, year, dark)
                except Exception as exc:  # noqa: BLE001 — HTTP boundary
                    # a dropped connection (no status line) is worse
                    # than a 500: the shell's fetch() would reject and
                    # abort the refresh loop with no visible error
                    return self._send(500, f"render failed: {exc}", "text/plain")
                return self._send(200, svg, "image/svg+xml")
            return self._send(404, "not found", "text/plain")

    return ThreadingHTTPServer((host, port), Handler)
