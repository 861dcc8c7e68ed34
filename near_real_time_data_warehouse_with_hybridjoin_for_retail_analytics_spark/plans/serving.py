"""Parameterized serving layer — dashboard.py parity (SURVEY §3.3).

The reference dashboard re-runs six of the warehouse queries with a
year filter interpolated into f-string SQL (dashboard.py:54-251) and
hands pandas frames to plotly. The capability is the parameterized
query layer, not Streamlit: ``run_dashboard_query(spark, name, year=)``
returns the same result shapes, parameterized by function argument
instead of string interpolation (no SQL injection surface), with
``.toPandas()`` left to the caller.

Requires the warehouse views registered (warehouse_queries.register_warehouse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Each entry: SQL with a {year} placeholder bound via parameterized
# spark.sql (named parameter markers, not f-strings).
DASHBOARD_QUERIES: dict[str, str] = {
    # dashboard.py:54-78 — per-(month,weekend) top-5 products for a year
    "top_products": """
        WITH rev AS (
            SELECT d.month_num AS monthnum, d.is_weekend, p.product_id,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN date_dim d ON s.date_id = d.date_id
            WHERE d.year = :year
            GROUP BY d.month_num, d.is_weekend, p.product_id
        )
        SELECT monthnum, is_weekend, product_id, total_revenue, rn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY monthnum, is_weekend
                                         ORDER BY total_revenue DESC) AS rn
            FROM rev
        ) ranked WHERE rn <= 5
        ORDER BY monthnum, is_weekend, rn
    """,
    # dashboard.py:98-107 — demographics spend for a year
    "demographics": """
        SELECT c.gender, c.age_group, c.city_category,
               SUM(s.sales_amount) AS total_spent
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        WHERE d.year = :year
        GROUP BY c.gender, c.age_group, c.city_category
        ORDER BY total_spent DESC
    """,
    # dashboard.py:126-134 — category × occupation for a year
    "category_occupation": """
        SELECT p.product_category, c.occupation,
               SUM(s.sales_amount) AS total_sales
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        WHERE d.year = :year
        GROUP BY p.product_category, c.occupation
        ORDER BY p.product_category, total_sales DESC
    """,
    # dashboard.py:153-164 — quarterly trends for a year
    "quarterly_trends": """
        SELECT d.quarter_num, c.gender, c.age_group,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        WHERE d.year = :year
        GROUP BY d.quarter_num, c.gender, c.age_group
        ORDER BY d.quarter_num, total_revenue DESC
    """,
    # dashboard.py:190-208 — top-5 city categories per product category
    "top_cities": """
        WITH cc AS (
            SELECT p.product_category, c.city_category,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN customer c ON s.customer_id = c.customer_id
            JOIN date_dim d ON s.date_id = d.date_id
            WHERE d.year = :year
            GROUP BY p.product_category, c.city_category
        )
        SELECT product_category, city_category, total_revenue, rn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY product_category
                                         ORDER BY total_revenue DESC) AS rn
            FROM cc
        ) ranked WHERE rn <= 5
        ORDER BY product_category, rn
    """,
    # dashboard.py:228-251 — monthly growth % for a year
    "monthly_growth": """
        WITH monthly AS (
            SELECT p.product_category, d.month_num AS monthnum,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN date_dim d ON s.date_id = d.date_id
            WHERE d.year = :year
            GROUP BY p.product_category, d.month_num
        )
        SELECT product_category, monthnum, revenue,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2) AS growth_pct
        FROM monthly
        WINDOW w AS (PARTITION BY product_category ORDER BY monthnum)
        ORDER BY product_category, monthnum
    """,
}


def run_dashboard_query(spark: SparkSession, name: str, year: int) -> DataFrame:
    """Serve one dashboard query for a given year."""
    return spark.sql(DASHBOARD_QUERIES[name], args={"year": year})
