"""Parameterized serving layer — dashboard.py parity (SURVEY §3.3).

The reference dashboard re-runs six warehouse queries (three of them
with the sidebar year interpolated into f-string SQL) and hands pandas
frames to plotly (`/root/reference/dashboard.py:51-265`). The
capability is the parameterized query layer plus the chart-ready frame
contract, not Streamlit:

- ``run_dashboard_query(spark, name, year=)`` returns a DataFrame whose
  column names/order match what the reference's plotly calls consume.
  Postgres folds unquoted identifiers to lowercase (the reference plots
  reference ``monthnum``, not ``monthNum`` — dashboard.py:87,258), so
  every alias here is explicit lowercase.
- Year parameterization is bound via Spark named parameters (no SQL
  injection surface) and — faithfully to the reference — applies only
  to the three views whose SQL uses it (top_products, quarterly_trends,
  monthly_growth; dashboard.py:66,160,240). The other three views scan
  all years regardless of the sidebar selection, exactly as the
  reference does (dashboard.py:98-107,126-134,190-208).
- ``CHART_SPECS`` records each view's plotly call signature
  (dashboard.py:82-91,109-117,138-145,168-202,215-222,257-264);
  ``render_dashboard_chart`` executes it when plotly is importable and
  raises NotImplementedError otherwise (the container has no plotly —
  the *contract* is tested, the render is a thin guarded shim).

Requires the warehouse views registered
(warehouse_queries.register_warehouse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Each entry: SQL with an optional :year named-parameter marker.
DASHBOARD_QUERIES: dict[str, str] = {
    # dashboard.py:54-91 — per-(month,weekend) top-5 products for a year
    "top_products": """
        WITH base AS (
            SELECT p.product_id, p.product_category,
                   d.month_num AS monthnum, d.is_weekend,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN date_dim d ON s.date_id = d.date_id
            WHERE d.year = :year
            GROUP BY p.product_id, p.product_category, d.month_num,
                     d.is_weekend
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY monthnum, is_weekend
                                         ORDER BY revenue DESC) AS rn
            FROM base
        )
        SELECT product_id, product_category, monthnum, is_weekend,
               revenue, rn
        FROM ranked WHERE rn <= 5
        ORDER BY monthnum, is_weekend, revenue DESC
    """,
    # dashboard.py:94-117 — demographics sunburst (reference: no year filter)
    "demographics": """
        SELECT c.gender, c.age_group, c.city_category,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY c.gender, c.age_group, c.city_category
        ORDER BY c.city_category, c.gender, c.age_group
    """,
    # dashboard.py:122-145 — category × occupation treemap (no year filter)
    "category_occupation": """
        SELECT p.product_category, c.occupation,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY p.product_category, c.occupation
    """,
    # dashboard.py:149-202 — quarterly trends for a year
    "quarterly_trends": """
        SELECT d.quarter_num, c.gender, c.age_group,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN date_dim d ON s.date_id = d.date_id
        JOIN customer c ON s.customer_id = c.customer_id
        WHERE d.year = :year
        GROUP BY d.quarter_num, c.gender, c.age_group
        ORDER BY d.quarter_num
    """,
    # dashboard.py:186-222 — top-5 city categories per product category
    # (no year filter)
    "top_cities": """
        WITH city_rev AS (
            SELECT c.city_category, p.product_category,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN customer c ON s.customer_id = c.customer_id
            JOIN product p ON s.product_id = p.product_id
            GROUP BY c.city_category, p.product_category
        )
        SELECT city_category, product_category, total_revenue, rn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY product_category
                                         ORDER BY total_revenue DESC) AS rn
            FROM city_rev
        ) t WHERE rn <= 5
    """,
    # dashboard.py:226-264 — monthly growth % for a year
    "monthly_growth": """
        WITH monthly AS (
            SELECT p.product_category, d.month_num AS monthnum,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN date_dim d ON s.date_id = d.date_id
            JOIN product p ON s.product_id = p.product_id
            WHERE d.year = :year
            GROUP BY p.product_category, d.month_num
        )
        SELECT product_category, monthnum,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2)
                 AS growth_percent
        FROM monthly
        WINDOW w AS (PARTITION BY product_category ORDER BY monthnum)
    """,
}

# Views whose reference SQL interpolates the sidebar year.
YEAR_FILTERED = {"top_products", "quarterly_trends", "monthly_growth"}

# The reference's plotly call per view (function + bound columns) —
# the chart-ready frame contract a migrating dashboard depends on.
CHART_SPECS: dict[str, dict] = {
    "top_products": {  # dashboard.py:82-91
        "kind": "bar",
        "x": "product_category",
        "y": "revenue",
        "color": "is_weekend",
        "facet_col": "monthnum",
    },
    "demographics": {  # dashboard.py:109-117
        "kind": "sunburst",
        "path": ["city_category", "gender", "age_group"],
        "values": "total_revenue",
    },
    "category_occupation": {  # dashboard.py:138-145
        "kind": "treemap",
        "path": ["product_category", "occupation"],
        "values": "total_revenue",
    },
    "quarterly_trends": {  # dashboard.py:168-183
        "kind": "line",
        "x": "quarter_num",
        "y": "total_revenue",
        "color": "gender",
        "line_dash": "age_group",
        "markers": True,
        "color_discrete_map": {"M": "blue", "F": "pink"},
    },
    "top_cities": {  # dashboard.py:215-222
        "kind": "bar",
        "x": "city_category",
        "y": "total_revenue",
        "color": "product_category",
    },
    "monthly_growth": {  # dashboard.py:257-264
        "kind": "line",
        "x": "monthnum",
        "y": "growth_percent",
        "color": "product_category",
        "markers": True,
    },
}


def run_dashboard_query(spark: SparkSession, name: str, year: int) -> DataFrame:
    """Serve one dashboard view's chart-ready frame. ``year`` binds only
    in the views whose reference SQL uses it (see YEAR_FILTERED)."""
    sql = DASHBOARD_QUERIES[name]
    if name in YEAR_FILTERED:
        return spark.sql(sql, args={"year": year})
    return spark.sql(sql)


def render_dashboard_chart_svg(df, name: str, dark: bool = False) -> str:
    """Render one dashboard view to a standalone SVG string with the
    in-repo dependency-free renderer (``plans/svgcharts.py``) — the
    live-render path for this container, covering all four chart kinds
    the reference wires through plotly (bar+facets, line+dash/markers,
    sunburst, treemap). ``df``: a pandas frame (``.toPandas()`` on the
    Spark result, the same boundary as the plotly path)."""
    from . import svgcharts

    spec = dict(CHART_SPECS[name])
    spec.pop("title", None)
    return svgcharts.render_spec(
        df, spec, title=name.replace("_", " ").title(), dark=dark
    )


def render_dashboard_chart(df, name: str):
    """Render one view with plotly express, exactly as the reference
    wires it (guarded: plotly is not installed in this container).
    ``df``: a pandas frame (call ``.toPandas()`` on the Spark result,
    mirroring the reference's pd.read_sql boundary)."""
    try:
        import plotly.express as px
    except ImportError as exc:  # pragma: no cover - plotly absent here
        raise NotImplementedError(
            "chart rendering requires plotly, not installed in this environment"
        ) from exc
    spec = dict(CHART_SPECS[name])
    fn = getattr(px, spec.pop("kind"))
    return fn(df, **spec)
