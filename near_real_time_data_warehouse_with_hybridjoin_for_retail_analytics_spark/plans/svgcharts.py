"""Dependency-free SVG renderer for the dashboard chart contract.

The reference dashboard hands each view's frame to plotly express
(`/root/reference/dashboard.py:82-91,109-117,138-145,168-183,215-222,
257-264`); this module renders the same four chart kinds — bar
(stacked, optionally faceted), line (color + dash series, markers),
sunburst and treemap — as standalone SVG strings with zero third-party
dependencies, so the serving layer produces real charts in this
container instead of env-gating on plotly (``serving.render_dashboard_
chart`` keeps the plotly path for parity when it IS installed).

Method notes (the craft rules this renderer encodes):
- Categorical series colors come from a validated 8-slot palette
  (adjacent-pair CVD ΔE ≥ 8, normal-vision ΔE ≥ 15, checked in both
  modes), assigned in FIXED slot order over the sorted category
  domain — never cycled; past 8 series fold into a neutral "Other".
  Callers may pin the domain (``domain=``) so filtering a frame never
  repaints surviving series.
- Three light-mode slots sit below 3:1 contrast on the surface, so the
  relief rule applies: every chart ships selective direct labels AND a
  machine-readable table of the full frame in its ``<desc>`` element.
- Marks are thin: 2px lines, ≥8px markers with a 2px surface ring,
  2px surface gaps between stacked segments and adjacent bars, 4px
  rounded data-ends on the outermost bar segment only.
- Text wears text tokens (primary/secondary ink), never series color;
  identity comes from the adjacent colored mark. A legend is present
  for ≥2 series and omitted for one. Grid and axes are recessive.
- Every mark carries an SVG-native tooltip (``<title>``).
- Dark mode is selected, not flipped: the same hues re-stepped for the
  dark surface, validated as a set.
"""

from __future__ import annotations

import io
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

# Validated categorical palette (reference instance; slot order fixed).
PALETTE_LIGHT = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
PALETTE_DARK = [
    "#3987e5", "#d95926", "#199e70", "#c98500",
    "#d55181", "#008300", "#9085e9", "#e66767",
]
OTHER = {"light": "#9b9a96", "dark": "#6f6e6a"}
SURFACE = {"light": "#fcfcfb", "dark": "#1a1a19"}
TEXT_PRIMARY = {"light": "#0b0b0b", "dark": "#ffffff"}
TEXT_SECONDARY = {"light": "#52514e", "dark": "#c3c2b7"}
GRID = {"light": "#e7e6e2", "dark": "#33332f"}

W, H = 720, 420
MARGIN = dict(l=56, r=16, t=44, b=40)
DASHES = ["", "6 4", "2 3", "9 3 2 3", "1 3"]  # per line_dash level


def _mode(dark: bool) -> str:
    return "dark" if dark else "light"


def _fmt(v) -> str:
    """Compact numeric label."""
    try:
        f = float(v)
    except (TypeError, ValueError):
        return str(v)
    if f == int(f) and abs(f) < 1e15:
        f = int(f)
        for cut, suf in ((1_000_000_000, "B"), (1_000_000, "M"), (1_000, "k")):
            if abs(f) >= cut:
                q = f / cut
                return f"{q:.1f}".rstrip("0").rstrip(".") + suf
        return str(f)
    return f"{f:,.2f}"


def _nice_ticks(lo: float, hi: float, n: int = 4) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / n
    mag = 10 ** np.floor(np.log10(raw))
    step = min(s for s in (1, 2, 2.5, 5, 10) if s * mag >= raw) * mag
    start = np.ceil(lo / step) * step
    return [float(start + i * step) for i in range(int((hi - start) / step) + 1)]


def color_domain(values, domain=None) -> list:
    """Fixed sorted assignment domain; an explicit ``domain`` pins
    colors across filtered re-renders (color follows the entity)."""
    if domain is not None:
        return list(domain)
    return sorted(set(values), key=lambda v: (str(type(v)), v))


def _series_colors(domain: list, mode: str) -> dict:
    pal = PALETTE_LIGHT if mode == "light" else PALETTE_DARK
    colors = {}
    for i, cat in enumerate(domain):
        colors[cat] = pal[i] if i < len(pal) else OTHER[mode]
    return colors


def _desc_table(df: pd.DataFrame) -> str:
    """Full-frame CSV embedded as the chart's table view (relief rule
    for the sub-3:1 palette slots; also the screen-reader surface)."""
    buf = io.StringIO()
    df.to_csv(buf, index=False)
    return f"<desc>{escape(buf.getvalue())}</desc>"


def _legend(items: list[tuple[str, str]], x: int, y: int, mode: str) -> str:
    """Swatch + text-token label rows; caller only passes ≥2 series."""
    out = []
    for i, (label, color) in enumerate(items):
        ly = y + 16 * i
        out.append(
            f'<rect x="{x}" y="{ly - 8}" width="10" height="10" rx="2" '
            f'fill="{color}"/>'
            f'<text x="{x + 15}" y="{ly + 1}" font-size="11" '
            f'fill="{TEXT_SECONDARY[mode]}">{escape(str(label))}</text>'
        )
    return "".join(out)


def _svg(body: str, title: str, df: pd.DataFrame, mode: str,
         width: int = W, height: int = H) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="system-ui, sans-serif">'
        + _desc_table(df)
        + f'<rect width="{width}" height="{height}" fill="{SURFACE[mode]}"/>'
        + f'<text x="{MARGIN["l"]}" y="24" font-size="15" font-weight="600" '
          f'fill="{TEXT_PRIMARY[mode]}">{escape(title)}</text>'
        + body
        + "</svg>"
    )


def _y_axis(ticks, ymap, x0, x1, mode) -> str:
    out = []
    for t in ticks:
        y = ymap(t)
        out.append(
            f'<line x1="{x0}" y1="{y:.1f}" x2="{x1}" y2="{y:.1f}" '
            f'stroke="{GRID[mode]}" stroke-width="1"/>'
            f'<text x="{x0 - 6}" y="{y + 3:.1f}" font-size="10" '
            f'text-anchor="end" fill="{TEXT_SECONDARY[mode]}">{_fmt(t)}</text>'
        )
    return "".join(out)


# --- bar (stacked; plotly px.bar default barmode="relative") --------------
def bar_chart(df: pd.DataFrame, x: str, y: str, color: str | None = None,
              facet_col: str | None = None, title: str = "",
              dark: bool = False, domain=None) -> str:
    mode = _mode(dark)
    facets = (
        [(None, df)] if facet_col is None
        else [(k, g) for k, g in df.groupby(facet_col, sort=True)]
    )
    cats = color_domain(df[color], domain) if color else [None]
    colors = _series_colors(cats, mode)
    legend_needed = color is not None and len(cats) > 1

    # shared y scale across facets (signed stacking extents)
    y_hi, y_lo = 0.0, 0.0
    for _, g in facets:
        agg = g.groupby(x)[y].agg(
            pos=lambda s: s[s > 0].sum(), neg=lambda s: s[s < 0].sum()
        )
        if len(agg):
            y_hi = max(y_hi, float(agg["pos"].max()))
            y_lo = min(y_lo, float(agg["neg"].min()))
    ticks = _nice_ticks(min(y_lo, 0.0), max(y_hi, 0.0))
    y_lo, y_hi = min(ticks + [y_lo, 0.0]), max(ticks + [y_hi])

    legend_w = 120 if legend_needed else 0
    plot_w = W - MARGIN["l"] - MARGIN["r"] - legend_w
    plot_h = H - MARGIN["t"] - MARGIN["b"]
    fw = plot_w / len(facets)

    def ymap(v: float) -> float:
        return MARGIN["t"] + plot_h * (1 - (v - y_lo) / (y_hi - y_lo))

    body = [_y_axis(ticks, ymap, MARGIN["l"], MARGIN["l"] + plot_w, mode)]
    for fi, (fkey, g) in enumerate(facets):
        fx0 = MARGIN["l"] + fi * fw
        xs = sorted(g[x].unique(), key=lambda v: (str(type(v)), v))
        band = fw / max(len(xs), 1)
        bw = max(min(band * 0.6, 48.0), 3.0)
        if fkey is not None:
            body.append(
                f'<text x="{fx0 + fw / 2:.1f}" y="{MARGIN["t"] - 6}" '
                f'font-size="10" text-anchor="middle" '
                f'fill="{TEXT_SECONDARY[mode]}">'
                f'{escape(f"{facet_col}={fkey}")}</text>'
            )
        for xi, xv in enumerate(xs):
            bx = fx0 + band * xi + (band - bw) / 2
            rows = g[g[x] == xv]
            run_pos = run_neg = 0.0
            pieces = (
                [(c, float(rows.loc[rows[color] == c, y].sum()))
                 for c in cats if (rows[color] == c).any()]
                if color else [(None, float(rows[y].sum()))]
            )
            outermost = len(pieces) - 1
            for pi, (c, val) in enumerate(pieces):
                if val >= 0:
                    y1, y0v = run_pos, run_pos + val
                    run_pos += val
                else:
                    y0v, y1 = run_neg, run_neg + val
                    run_neg += val
                ry0, ry1 = ymap(max(y0v, y1)), ymap(min(y0v, y1))
                hpx = max(ry1 - ry0 - 2, 1.0)  # 2px surface gap per segment
                rx = 4 if pi == outermost else 0  # round the data end only
                label = escape(
                    f"{'' if c is None else str(c) + ' · '}{xv}: {_fmt(val)}"
                )
                body.append(
                    f'<rect x="{bx:.1f}" y="{ry0:.1f}" width="{bw:.1f}" '
                    f'height="{hpx:.1f}" rx="{rx}" '
                    f'fill="{colors[c]}"><title>{label}</title></rect>'
                )
            total = run_pos + run_neg
            body.append(  # direct label: the stack total (relief rule)
                f'<text x="{bx + bw / 2:.1f}" y="{ymap(run_pos) - 4:.1f}" '
                f'font-size="9" text-anchor="middle" '
                f'fill="{TEXT_SECONDARY[mode]}">{_fmt(total)}</text>'
            )
            body.append(
                f'<text x="{bx + bw / 2:.1f}" y="{H - MARGIN["b"] + 14}" '
                f'font-size="10" text-anchor="middle" '
                f'fill="{TEXT_SECONDARY[mode]}">{escape(str(xv))}</text>'
            )
    base_y = ymap(0.0)
    body.append(
        f'<line x1="{MARGIN["l"]}" y1="{base_y:.1f}" '
        f'x2="{MARGIN["l"] + plot_w}" y2="{base_y:.1f}" '
        f'stroke="{TEXT_SECONDARY[mode]}" stroke-width="1"/>'
    )
    if legend_needed:
        body.append(_legend(
            [(str(c), colors[c]) for c in cats if c in set(df[color])],
            W - legend_w - MARGIN["r"] + 8, MARGIN["t"] + 8, mode,
        ))
    return _svg("".join(body), title, df, mode)


# --- line (multi-series, dash levels, markers) ----------------------------
def line_chart(df: pd.DataFrame, x: str, y: str, color: str | None = None,
               line_dash: str | None = None, markers: bool = False,
               title: str = "", dark: bool = False, domain=None,
               color_discrete_map: dict | None = None) -> str:
    mode = _mode(dark)
    # Null y values (e.g. the first month of a LAG-based growth series)
    # have no point to draw — plotly renders them as gaps; dropping the
    # rows is the equivalent for straight-line segments.
    df = df[df[y].notna()]
    if df.empty:  # every base was null: an explicit empty state
        return (
            '<svg xmlns="http://www.w3.org/2000/svg" width="480" '
            'height="80" role="img"><title>{t}</title>'
            '<text x="16" y="45" font-size="13" fill="#888">'
            "no data points</text></svg>"
        ).format(t=escape(title or y))
    cats = color_domain(df[color], domain) if color else [None]
    colors = _series_colors(cats, mode)
    if color_discrete_map:  # explicit per-entity pins win (parity)
        pal = {"blue": PALETTE_LIGHT[0] if mode == "light" else PALETTE_DARK[0],
               "pink": PALETTE_LIGHT[4] if mode == "light" else PALETTE_DARK[4]}
        for k, v in color_discrete_map.items():
            colors[k] = pal.get(v, v)
    dash_levels = (
        sorted(df[line_dash].unique(), key=str) if line_dash else [None]
    )
    series = []
    for c in cats:
        for di, d in enumerate(dash_levels):
            g = df
            if color:
                g = g[g[color] == c]
            if line_dash:
                g = g[g[line_dash] == d]
            if not len(g):
                continue
            name = " · ".join(str(v) for v in (c, d) if v is not None) or y
            series.append((name, colors[c], DASHES[di % len(DASHES)],
                           g.sort_values(x)))
    shown = series
    hidden = 0
    if len(series) > 8:  # fold: keep the 8 largest by mean |y|
        series.sort(key=lambda s: -float(np.abs(s[3][y]).mean()))
        shown, hidden = series[:8], len(series) - 8

    xs_all = sorted(df[x].unique(), key=lambda v: (str(type(v)), v))
    xpos = {v: i for i, v in enumerate(xs_all)}
    yv = df[y].astype(float)
    ticks = _nice_ticks(float(min(yv.min(), 0)), float(yv.max()))
    y_lo, y_hi = min(ticks + [float(yv.min())]), max(ticks + [float(yv.max())])
    legend_w = 140 if len(shown) > 1 else 0
    plot_w = W - MARGIN["l"] - MARGIN["r"] - legend_w
    plot_h = H - MARGIN["t"] - MARGIN["b"]

    def xmap(v) -> float:
        n = max(len(xs_all) - 1, 1)
        return MARGIN["l"] + plot_w * (xpos[v] / n)

    def ymap(v: float) -> float:
        return MARGIN["t"] + plot_h * (1 - (v - y_lo) / (y_hi - y_lo))

    body = [_y_axis(ticks, ymap, MARGIN["l"], MARGIN["l"] + plot_w, mode)]
    for v in xs_all:
        body.append(
            f'<text x="{xmap(v):.1f}" y="{H - MARGIN["b"] + 14}" '
            f'font-size="10" text-anchor="middle" '
            f'fill="{TEXT_SECONDARY[mode]}">{escape(str(v))}</text>'
        )
    for name, col, dash, g in shown:
        pts = [(xmap(r[x]), ymap(float(r[y]))) for _, r in g.iterrows()]
        d_attr = f' stroke-dasharray="{dash}"' if dash else ""
        path = "M" + " L".join(f"{px:.1f} {py:.1f}" for px, py in pts)
        body.append(
            f'<path d="{path}" fill="none" stroke="{col}" '
            f'stroke-width="2"{d_attr}><title>{escape(name)}</title></path>'
        )
        if markers:
            for (px, py), (_, r) in zip(pts, g.iterrows()):
                body.append(
                    f'<circle cx="{px:.1f}" cy="{py:.1f}" r="4" fill="{col}" '
                    f'stroke="{SURFACE[mode]}" stroke-width="2">'
                    f"<title>{escape(f'{name} · {r[x]}: {_fmt(r[y])}')}"
                    f"</title></circle>"
                )
        if len(shown) <= 4:  # selective direct label at the line end
            ex, ey = pts[-1]
            body.append(
                f'<text x="{ex + 6:.1f}" y="{ey + 3:.1f}" font-size="10" '
                f'fill="{TEXT_PRIMARY[mode]}">{escape(name)}</text>'
            )
    if len(shown) > 1:
        items = [(n, c) for n, c, _, _ in shown]
        if hidden:
            items.append((f"+{hidden} more — see data table", OTHER[mode]))
        body.append(_legend(items, W - legend_w - MARGIN["r"] + 8,
                            MARGIN["t"] + 8, mode))
    return _svg("".join(body), title, df, mode)


# --- hierarchies (sunburst, treemap) --------------------------------------
def _tree(df: pd.DataFrame, path: list[str], values: str):
    """Nested dict: {child: (total, subtree)} per level, sorted keys."""
    if not path:
        return float(df[values].sum()), {}
    total = 0.0
    node: dict = {}
    for key, g in df.groupby(path[0], sort=True):
        sub_total, sub = _tree(g, path[1:], values)
        node[key] = (sub_total, sub)
        total += sub_total
    return total, node


def _shade(hexcol: str, depth: int, mode: str) -> str:
    """Descendants keep the ancestor hue, stepped toward the surface —
    one hue per top-level branch, light→dark reads as hierarchy."""
    t = min(0.28 * depth, 0.62)
    sr, sg, sb = (int(SURFACE[mode][i:i + 2], 16) for i in (1, 3, 5))
    r, g, b = (int(hexcol[i:i + 2], 16) for i in (1, 3, 5))
    mix = (round(r + (sr - r) * t), round(g + (sg - g) * t),
           round(b + (sb - b) * t))
    return "#%02x%02x%02x" % mix


def sunburst_chart(df: pd.DataFrame, path: list[str], values: str,
                   title: str = "", dark: bool = False,
                   domain=None) -> str:
    mode = _mode(dark)
    total, root = _tree(df, path, values)
    cats = color_domain(root.keys(), domain)
    colors = _series_colors(cats, mode)
    cx, cy = W / 2, (H + MARGIN["t"]) / 2
    r_max = min(W, H - MARGIN["t"]) / 2 - 18
    depth_n = len(path)
    ring = r_max / (depth_n + 0.5)

    def arc(r0, r1, a0, a1, fill, label):
        if a1 - a0 >= 2 * np.pi - 1e-6:  # full ring → two joined halves
            a1 = a0 + 2 * np.pi - 1e-4
        x0o, y0o = cx + r1 * np.cos(a0), cy + r1 * np.sin(a0)
        x1o, y1o = cx + r1 * np.cos(a1), cy + r1 * np.sin(a1)
        x1i, y1i = cx + r0 * np.cos(a1), cy + r0 * np.sin(a1)
        x0i, y0i = cx + r0 * np.cos(a0), cy + r0 * np.sin(a0)
        large = 1 if (a1 - a0) > np.pi else 0
        return (
            f'<path d="M{x0o:.1f} {y0o:.1f} '
            f'A{r1:.1f} {r1:.1f} 0 {large} 1 {x1o:.1f} {y1o:.1f} '
            f'L{x1i:.1f} {y1i:.1f} '
            f'A{r0:.1f} {r0:.1f} 0 {large} 0 {x0i:.1f} {y0i:.1f} Z" '
            f'fill="{fill}" stroke="{SURFACE[mode]}" stroke-width="2">'
            f"<title>{escape(label)}</title></path>"
        )

    body = []

    def walk(node, depth, a0, span, branch_color, prefix):
        a = a0
        for key, (val, sub) in node.items():
            frac = val / total if total else 0.0
            a1 = a + span * (val / sum(v for v, _ in node.values())
                             if node else 0.0)
            col = (colors[key] if depth == 0
                   else _shade(branch_color, depth, mode))
            label = f"{prefix}{key}: {_fmt(val)} ({frac:.0%})"
            body.append(arc(ring * (depth + 0.5), ring * (depth + 1.5),
                            a, a1, col, label))
            if a1 - a > 0.26:  # label arcs wide enough to read
                am = (a + a1) / 2
                lr = ring * (depth + 1.0)
                body.append(
                    f'<text x="{cx + lr * np.cos(am):.1f}" '
                    f'y="{cy + lr * np.sin(am):.1f}" font-size="9" '
                    f'text-anchor="middle" fill="{TEXT_PRIMARY[mode]}">'
                    f"{escape(str(key))}</text>"
                )
            if sub:
                walk(sub, depth + 1, a,
                     a1 - a, colors[key] if depth == 0 else branch_color,
                     f"{prefix}{key} · ")
            a = a1

    walk(root, 0, -np.pi / 2, 2 * np.pi, "", "")
    if len(cats) > 1:
        body.append(_legend(
            [(str(c), colors[c]) for c in cats], 8, MARGIN["t"] + 8, mode
        ))
    return _svg("".join(body), title, df, mode)


def treemap_chart(df: pd.DataFrame, path: list[str], values: str,
                  title: str = "", dark: bool = False,
                  domain=None) -> str:
    mode = _mode(dark)
    total, root = _tree(df, path, values)
    cats = color_domain(root.keys(), domain)
    colors = _series_colors(cats, mode)
    body = []

    def slice_dice(node, x0, y0, x1, y1, depth, branch_color, prefix):
        subtotal = sum(v for v, _ in node.values())
        pos = 0.0
        for key, (val, sub) in node.items():
            frac = val / subtotal if subtotal else 0.0
            if depth % 2 == 0:  # alternate split direction per level
                nx0 = x0 + (x1 - x0) * pos
                nx1 = x0 + (x1 - x0) * (pos + frac)
                ny0, ny1 = y0, y1
            else:
                ny0 = y0 + (y1 - y0) * pos
                ny1 = y0 + (y1 - y0) * (pos + frac)
                nx0, nx1 = x0, x1
            pos += frac
            col = (colors[key] if depth == 0
                   else _shade(branch_color, depth, mode))
            label = f"{prefix}{key}: {_fmt(val)} ({val / total:.0%})"
            if sub:
                slice_dice(sub, nx0, ny0, nx1, ny1, depth + 1,
                           colors[key] if depth == 0 else branch_color,
                           f"{prefix}{key} · ")
            else:
                body.append(
                    f'<rect x="{nx0:.1f}" y="{ny0:.1f}" '
                    f'width="{max(nx1 - nx0, 0.5):.1f}" '
                    f'height="{max(ny1 - ny0, 0.5):.1f}" fill="{col}" '
                    f'stroke="{SURFACE[mode]}" stroke-width="2">'
                    f"<title>{escape(label)}</title></rect>"
                )
            if (nx1 - nx0) > 60 and (ny1 - ny0) > 14:
                body.append(
                    f'<text x="{nx0 + 4:.1f}" y="{ny0 + 12:.1f}" '
                    f'font-size="10" fill="{TEXT_PRIMARY[mode]}">'
                    f"{escape(str(key))}</text>"
                )

    slice_dice(root, MARGIN["l"] / 2, MARGIN["t"],
               W - MARGIN["r"], H - MARGIN["b"] / 2, 0, "", "")
    if len(cats) > 1:
        body.append(_legend(
            [(str(c), colors[c]) for c in cats], 8, MARGIN["t"] + 8, mode
        ))
    return _svg("".join(body), title, df, mode)


KIND_RENDERERS = {
    "bar": bar_chart,
    "line": line_chart,
    "sunburst": sunburst_chart,
    "treemap": treemap_chart,
}


def render_spec(df: pd.DataFrame, spec: dict, title: str = "",
                dark: bool = False, domain=None) -> str:
    """Render a plotly-express-shaped spec dict (the ``CHART_SPECS``
    contract) to a standalone SVG string."""
    spec = dict(spec)
    fn = KIND_RENDERERS[spec.pop("kind")]
    return fn(df, title=title, dark=dark, domain=domain, **spec)
