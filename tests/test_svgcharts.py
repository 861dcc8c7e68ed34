"""The dependency-free SVG renderer behind the dashboard's live-render
path: every reference view renders, in both modes, with validated
colors, bounded geometry, and the embedded table view."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
    serving,
    svgcharts,
)


def _frames() -> dict[str, pd.DataFrame]:
    rng = np.random.RandomState(7)
    cats = ["Electronics", "Grocery", "Apparel", "Home"]
    return {
        "top_products": pd.DataFrame(
            [
                dict(
                    product_category=c,
                    revenue=float(rng.randint(50, 400)),
                    is_weekend=w,
                    monthnum=m,
                )
                for c in cats
                for m in (1, 2, 3)
                for w in ("Weekday", "Weekend")
            ]
        ),
        "demographics": pd.DataFrame(
            [
                dict(
                    city_category=cc,
                    gender=g,
                    age_group=a,
                    total_revenue=float(rng.randint(100, 900)),
                )
                for cc in ("A", "B", "C")
                for g in ("M", "F")
                for a in ("18-25", "26-35", "36-50")
            ]
        ),
        "category_occupation": pd.DataFrame(
            [
                dict(
                    product_category=c,
                    occupation=o,
                    total_revenue=float(rng.randint(50, 600)),
                )
                for c in cats
                for o in ("Eng", "Teacher", "Artist")
            ]
        ),
        "quarterly_trends": pd.DataFrame(
            [
                dict(
                    quarter_num=q,
                    total_revenue=float(rng.randint(200, 900)),
                    gender=g,
                    age_group=a,
                )
                for q in (1, 2, 3, 4)
                for g in ("M", "F")
                for a in ("18-25", "26-35")
            ]
        ),
        "top_cities": pd.DataFrame(
            [
                dict(
                    city_category=cc,
                    total_revenue=float(rng.randint(100, 700)),
                    product_category=c,
                )
                for cc in ("A", "B", "C")
                for c in cats
            ]
        ),
        "monthly_growth": pd.DataFrame(
            [
                dict(
                    monthnum=m,
                    growth_percent=float(rng.randn() * 10),
                    product_category=c,
                )
                for m in range(1, 7)
                for c in cats
            ]
        ),
    }


def _check_geometry(svg: str) -> list[str]:
    root = ET.fromstring(svg)
    w_max, h_max = 721, 422
    issues = []
    for el in root.iter():
        tag = el.tag.split("}")[-1]
        if tag == "rect":
            x, y = float(el.get("x", 0)), float(el.get("y", 0))
            w, h = float(el.get("width")), float(el.get("height"))
            if w < 0 or h < 0 or x + w > w_max or y + h > h_max:
                issues.append(f"rect {x},{y} {w}x{h}")
        elif tag == "circle":
            if not (0 <= float(el.get("cx")) <= w_max):
                issues.append("circle off-canvas")
        elif tag == "path":
            nums = [float(v) for v in re.findall(r"-?\d+\.?\d*", el.get("d"))]
            if any(abs(n) > 2000 for n in nums):
                issues.append("path blowout")
    return issues


@pytest.mark.parametrize("name", list(_frames()))
@pytest.mark.parametrize("dark", [False, True])
def test_every_view_renders_well_formed(name, dark):
    df = _frames()[name]
    svg = serving.render_dashboard_chart_svg(df, name, dark=dark)
    ET.fromstring(svg)  # well-formed XML
    assert not _check_geometry(svg)
    assert svg == serving.render_dashboard_chart_svg(df, name, dark=dark)


def test_desc_holds_full_table_view():
    df = _frames()["top_cities"]
    svg = serving.render_dashboard_chart_svg(df, "top_cities")
    desc = ET.fromstring(svg).find("{http://www.w3.org/2000/svg}desc").text
    assert desc.count("\n") >= len(df)  # header + every row
    assert "total_revenue" in desc


def test_legend_present_for_multiseries_absent_for_one():
    df = _frames()["top_cities"]
    multi = serving.render_dashboard_chart_svg(df, "top_cities")
    assert "Electronics" in multi and "Grocery" in multi
    one = svgcharts.bar_chart(
        df[df["product_category"] == "Grocery"],
        x="city_category", y="total_revenue", color="product_category",
    )
    # single series: title names it; no legend swatch rows
    assert multi.count("<rect") > one.count("<rect")


def test_domain_pin_keeps_survivor_colors():
    df = _frames()["monthly_growth"]
    dom = svgcharts.color_domain(df["product_category"])
    full = svgcharts.line_chart(
        df, x="monthnum", y="growth_percent", color="product_category",
        domain=dom,
    )
    filtered = svgcharts.line_chart(
        df[df["product_category"] != "Apparel"],
        x="monthnum", y="growth_percent", color="product_category",
        domain=dom,
    )

    def stroke_of(svg, name):
        m = re.search(
            r'stroke="(#[0-9a-f]{6})"[^>]*><title>' + name, svg
        )
        return m.group(1)

    for survivor in ("Electronics", "Grocery", "Home"):
        assert stroke_of(full, survivor) == stroke_of(filtered, survivor)


def test_quarterly_trends_honors_reference_color_map():
    """The reference pins M=blue / F=pink (dashboard.py color_discrete_map);
    the renderer maps those to the validated blue/magenta slots."""
    svg = serving.render_dashboard_chart_svg(
        _frames()["quarterly_trends"], "quarterly_trends"
    )
    assert svgcharts.PALETTE_LIGHT[0] in svg  # blue slot (M)
    assert svgcharts.PALETTE_LIGHT[4] in svg  # magenta slot (F)


def test_sunburst_angles_and_arc_count():
    df = _frames()["demographics"]
    svg = serving.render_dashboard_chart_svg(df, "demographics")
    n_nodes = (
        df["city_category"].nunique()
        + df.groupby(["city_category", "gender"]).ngroups
        + df.groupby(["city_category", "gender", "age_group"]).ngroups
    )
    assert svg.count("<path") == n_nodes


def test_treemap_leaf_count_and_tooltips():
    df = _frames()["category_occupation"]
    svg = serving.render_dashboard_chart_svg(df, "category_occupation")
    leaves = df.groupby(["product_category", "occupation"]).ngroups
    assert svg.count("<title>") >= leaves
    assert "(" in svg and "%" in svg  # share-of-total in tooltips


def test_line_fold_past_eight_series():
    df = pd.DataFrame(
        [
            dict(m=m, v=float((s + 1) * m), cat=f"c{s:02d}")
            for m in (1, 2, 3)
            for s in range(11)
        ]
    )
    svg = svgcharts.line_chart(df, x="m", y="v", color="cat")
    assert "+3 more" in svg  # folded, disclosed in the legend
    assert svg.count('fill="none" stroke=') == 8
