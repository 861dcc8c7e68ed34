"""The 20 reference queries in warehouse-native form (SURVEY §2.12).

These are faithful Spark SQL translations of /root/reference/queries.sql
over the star schema the ETL builds (views: customer, product, store,
supplier, date_dim, sales). queries.sql runs on PostgreSQL; every
translation keeps the reference's SELECT list (names AND order), WHERE
structure, GROUP BY, window shape, and final ORDER BY. The complete
list of dialect deltas (everything tests/test_warehouse_fidelity.py
tolerates when it diffs this module against queries.sql):

  D1. Identifier case: Postgres folds unquoted identifiers to lowercase
      (``monthNum`` → ``monthnum``); our DDL is snake_case, so camelCase
      reference columns map ``monthNum → month_num AS monthnum``,
      ``storeName → store_name``, ``supplierName → supplier_name``, and
      the reference's ``date`` table is our ``date_dim`` view.
  D2. MAX(year)/MAX(transaction_date) scalars are EXISTS-guarded to
      dates that actually occur in sales: the reference's Date table
      only ever contains loaded transaction dates (hybridjoin.py date
      inserts), while our ``build_date_dim`` spans a calendar range, so
      the bare MAX would see empty future dates.
  D3. NULL ordering: Postgres ASC default is NULLS LAST, Spark's is
      NULLS FIRST — Q17's rollup ORDER BY pins NULLS LAST explicitly to
      reproduce the Postgres ordering of subtotal rows.
  D4. Repeated LAG windows are factored into a named WINDOW clause
      (identical frames; Postgres supports the same clause — the
      reference just inlines it three times).
  D5. ``INTERVAL '6 months'`` is spelled ``INTERVAL 6 MONTH`` (Q6).
  D6. ORDER BY keys are unqualified output aliases (post-aggregation
      qualified refs such as ``st.storeName`` resolve via Postgres
      scoping rules Spark does not share).
  D7. The year literal 2017 (queries.sql:9,143,162) is parameterized:
      ``WAREHOUSE_QUERIES`` renders it at ``REFERENCE_YEAR`` (= 2017,
      the reference's literal); ``warehouse_queries_for_year`` rebinds
      it, mirroring the dashboard's year sidebar (dashboard.py:66).

Q1's global LIMIT-5 bug is reproduced as written (Q11 is the corrected
per-group top-k), per SURVEY §7.3.

The graded, oracle-checked variants of these shapes live in
``testdata_queries``; this module is the reference-parity surface a
user of the original system would migrate onto, and is exercised
end-to-end by tests/test_warehouse_queries.py over an ETL-built
warehouse plus clause-by-clause by tests/test_warehouse_fidelity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WAREHOUSE_VIEWS = ("customer", "product", "store", "supplier", "date_dim", "sales")

# The year the reference hard-codes (queries.sql:9,143,162) — D7.
REFERENCE_YEAR = 2017

# D2 — the EXISTS-guarded equivalents of the reference's bare scalars.
_MAX_YEAR_CTE = """(SELECT MAX(year) AS yr FROM date_dim dd
                             WHERE EXISTS (SELECT 1 FROM sales s2 WHERE s2.date_id = dd.date_id))"""
_MAX_YEAR_SUBQ = """(SELECT MAX(d2.year) FROM date_dim d2
                        WHERE EXISTS (SELECT 1 FROM sales s2 WHERE s2.date_id = d2.date_id))"""

_TEMPLATES: dict[str, str] = {
    # Q1 (queries.sql:6-12) — top revenue products weekday/weekend,
    # monthly, for the pinned year; global LIMIT 5 reproduced faithfully.
    "q1_top_products_weekend_monthly": """
        SELECT p.product_id, p.product_category, d.month_num AS monthnum,
               d.is_weekend,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
        WHERE d.year = {year}
        GROUP BY p.product_id, p.product_category, d.month_num, d.is_weekend
        ORDER BY monthnum, is_weekend, total_revenue DESC
        LIMIT 5
    """,
    # Q2 (queries.sql:17-20)
    "q2_demographics_spend": """
        SELECT c.gender, c.age_group, c.city_category,
               SUM(s.sales_amount) AS total_revenue,
               SUM(s.quantity) AS units_sold
        FROM sales s JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY c.gender, c.age_group, c.city_category
        ORDER BY c.city_category, c.gender, c.age_group
    """,
    # Q3 (queries.sql:24-28)
    "q3_category_by_occupation": """
        SELECT p.product_category, c.occupation,
               SUM(s.sales_amount) AS total_revenue,
               SUM(s.quantity) AS units_sold
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY p.product_category, c.occupation
        ORDER BY p.product_category, total_revenue DESC
    """,
    # Q4 (queries.sql:32-40) — scalar CTE MAX(year)
    "q4_quarterly_latest_year": f"""
        WITH latest_year AS {_MAX_YEAR_CTE}
        SELECT d.quarter_num, c.gender, c.age_group,
               SUM(s.sales_amount) AS total_revenue,
               SUM(s.quantity) AS units_sold
        FROM sales s
        JOIN date_dim d ON s.date_id = d.date_id
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN latest_year ON d.year = latest_year.yr
        GROUP BY d.quarter_num, c.gender, c.age_group
        ORDER BY d.quarter_num, c.gender, c.age_group
    """,
    # Q5 (queries.sql:45-57) — top 5 occupations per category;
    # final SELECT omits rn (ordering still references it — D6 scope).
    "q5_top_occupations_per_category": """
        WITH occ_sales AS (
            SELECT p.product_category, c.occupation,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN customer c ON s.customer_id = c.customer_id
            GROUP BY p.product_category, c.occupation
        )
        SELECT product_category, occupation, total_revenue FROM (
            SELECT product_category, occupation, total_revenue,
                   ROW_NUMBER() OVER (PARTITION BY product_category
                                      ORDER BY total_revenue DESC) AS rn
            FROM occ_sales
        ) t
        WHERE rn <= 5
        ORDER BY product_category, rn
    """,
    # Q6 (queries.sql:61-70) — trailing 6 months interval join
    "q6_city_marital_6mo": """
        WITH max_date AS (
            SELECT MAX(transaction_date) AS latest_date FROM date_dim dd
            WHERE EXISTS (SELECT 1 FROM sales s2 WHERE s2.date_id = dd.date_id)
        )
        SELECT c.city_category, c.marital_status, d.year,
               d.month_num AS monthnum,
               SUM(s.sales_amount) AS total_revenue,
               SUM(s.quantity) AS units_sold
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        JOIN max_date md ON d.transaction_date
             BETWEEN md.latest_date - INTERVAL 6 MONTH AND md.latest_date
        GROUP BY c.city_category, c.marital_status, d.year, d.month_num
        ORDER BY d.year, monthnum, c.city_category, c.marital_status
    """,
    # Q7 (queries.sql:75-78)
    "q7_avg_by_stay_gender": """
        SELECT c.stay_in_current_city_years, c.gender,
               AVG(s.sales_amount) AS avg_purchase_amount
        FROM sales s JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY c.stay_in_current_city_years, c.gender
        ORDER BY c.stay_in_current_city_years, c.gender
    """,
    # Q8 (queries.sql:83-97) — top 5 city categories per product category
    "q8_top_cities_per_category": """
        WITH city_rev AS (
            SELECT c.city_category, p.product_category,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN customer c ON s.customer_id = c.customer_id
            JOIN product p ON s.product_id = p.product_id
            GROUP BY c.city_category, p.product_category
        )
        SELECT * FROM (
            SELECT city_category, product_category, total_revenue,
                   ROW_NUMBER() OVER (PARTITION BY product_category
                                      ORDER BY total_revenue DESC) AS rn
            FROM city_rev
        ) t WHERE rn <= 5
        ORDER BY product_category, rn
    """,
    # Q9 (queries.sql:102-121) — monthly growth % by category, latest year
    "q9_monthly_growth": f"""
        WITH curr_year AS {_MAX_YEAR_CTE}, monthly AS (
            SELECT p.product_category, d.month_num AS monthnum,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN date_dim d ON s.date_id = d.date_id
            JOIN product p ON s.product_id = p.product_id
            JOIN curr_year cy ON d.year = cy.yr
            GROUP BY p.product_category, d.month_num
        )
        SELECT product_category, monthnum, revenue,
               LAG(revenue) OVER w AS prev_revenue,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2) AS growth_percent
        FROM monthly
        WINDOW w AS (PARTITION BY product_category ORDER BY monthnum)
        ORDER BY product_category, monthnum
    """,
    # Q10 (queries.sql:125-132)
    "q10_weekend_by_age": f"""
        WITH cy AS {_MAX_YEAR_CTE}
        SELECT c.age_group, d.is_weekend,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        JOIN cy ON d.year = cy.yr
        GROUP BY c.age_group, d.is_weekend
        ORDER BY c.age_group, d.is_weekend
    """,
    # Q11 (queries.sql:137-154) — Q1 corrected: per-(month,weekend)
    # top 5 for the pinned year
    "q11_top5_products_per_month_weekend": """
        WITH base AS (
            SELECT p.product_id, p.product_category,
                   d.month_num AS monthnum, d.is_weekend,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN date_dim d ON s.date_id = d.date_id
            WHERE d.year = {year}
            GROUP BY p.product_id, p.product_category, d.month_num,
                     d.is_weekend
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY monthnum, is_weekend
                                         ORDER BY revenue DESC) AS rn
            FROM base
        )
        SELECT * FROM ranked WHERE rn <= 5
        ORDER BY monthnum, is_weekend, revenue DESC
    """,
    # Q12 (queries.sql:159-171) — store revenue growth, quarterly, for
    # the pinned year; raw store_id from the fact, as the reference
    "q12_store_growth_quarterly": """
        WITH quarterly AS (
            SELECT s.store_id, d.quarter_num,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN date_dim d ON s.date_id = d.date_id
            WHERE d.year = {year}
            GROUP BY s.store_id, d.quarter_num
        )
        SELECT store_id, quarter_num, revenue,
               LAG(revenue) OVER w AS prev_revenue,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2) AS growth_rate_percent
        FROM quarterly
        WINDOW w AS (PARTITION BY store_id ORDER BY quarter_num)
        ORDER BY store_id, quarter_num
    """,
    # Q13 (queries.sql:176-181)
    "q13_supplier_contribution": """
        SELECT st.store_name, sp.supplier_name,
               p.product_category AS product_name,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN store st ON s.store_id = st.store_id
        JOIN supplier sp ON s.supplier_id = sp.supplier_id
        JOIN product p ON s.product_id = p.product_id
        GROUP BY st.store_name, sp.supplier_name, p.product_category
        ORDER BY st.store_name, sp.supplier_name, total_revenue DESC
    """,
    # Q14 (queries.sql:186-197) — per-product seasonal drill-down
    "q14_seasonal_sales": """
        SELECT p.product_id, p.product_category,
               CASE WHEN d.month_num IN (3, 4, 5)   THEN 'Spring'
                    WHEN d.month_num IN (6, 7, 8)   THEN 'Summer'
                    WHEN d.month_num IN (9, 10, 11) THEN 'Fall'
                    ELSE 'Winter' END AS season,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
        GROUP BY p.product_id, p.product_category, season
        ORDER BY p.product_id, season
    """,
    # Q15 (queries.sql:203-230) — 2-key partition, 2-key order LAG;
    # raw store_id/supplier_id from the fact, as the reference
    "q15_store_supplier_volatility": """
        WITH monthly AS (
            SELECT s.store_id, s.supplier_id, d.year,
                   d.month_num AS monthnum,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN date_dim d ON s.date_id = d.date_id
            GROUP BY s.store_id, s.supplier_id, d.year, d.month_num
        )
        SELECT store_id, supplier_id, year, monthnum, revenue,
               LAG(revenue) OVER w AS prev_revenue,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2) AS volatility_percent
        FROM monthly
        WINDOW w AS (PARTITION BY store_id, supplier_id
                     ORDER BY year, monthnum)
        ORDER BY store_id, supplier_id, year, monthnum
    """,
    # Q16 (queries.sql:236-243) — theta self-join affinity pairs
    "q16_affinity_pairs": """
        WITH pairs AS (
            SELECT s1.order_id, s1.product_id AS product_a,
                   s2.product_id AS product_b
            FROM sales s1
            JOIN sales s2 ON s1.order_id = s2.order_id
                         AND s1.product_id < s2.product_id
        )
        SELECT product_a, product_b, COUNT(*) AS times_bought_together
        FROM pairs
        GROUP BY product_a, product_b
        ORDER BY times_bought_together DESC
        LIMIT 5
    """,
    # Q17 (queries.sql:250-257) — ROLLUP, latest year, D3 null order
    "q17_rollup_store_supplier_category": f"""
        SELECT st.store_name, d.year, sp.supplier_name, p.product_category,
               SUM(s.sales_amount) AS yearly_revenue
        FROM sales s
        JOIN store st ON s.store_id = st.store_id
        JOIN supplier sp ON s.supplier_id = sp.supplier_id
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
        WHERE d.year = {_MAX_YEAR_SUBQ}
        GROUP BY ROLLUP (st.store_name, sp.supplier_name,
                         p.product_category, d.year)
        ORDER BY store_name ASC NULLS LAST, supplier_name ASC NULLS LAST,
                 product_category ASC NULLS LAST
    """,
    # Q18 (queries.sql:263-275) — H1/H2 conditional aggregation,
    # latest year
    "q18_h1_h2_per_product": f"""
        SELECT p.product_id, p.product_category,
               SUM(CASE WHEN d.month_num BETWEEN 1 AND 6
                        THEN s.sales_amount END) AS h1_revenue,
               SUM(CASE WHEN d.month_num BETWEEN 7 AND 12
                        THEN s.sales_amount END) AS h2_revenue,
               SUM(s.sales_amount) AS total_revenue,
               SUM(CASE WHEN d.month_num BETWEEN 1 AND 6
                        THEN s.quantity END) AS h1_quantity,
               SUM(CASE WHEN d.month_num BETWEEN 7 AND 12
                        THEN s.quantity END) AS h2_quantity,
               SUM(s.quantity) AS total_quantity
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
        WHERE d.year = {_MAX_YEAR_SUBQ}
        GROUP BY p.product_id, p.product_category
        ORDER BY total_revenue DESC
    """,
    # Q19 (queries.sql:281-300) — two-level agg spike detection
    "q19_daily_spikes": """
        WITH daily_sales AS (
            SELECT s.product_id, d.transaction_date,
                   SUM(s.sales_amount) AS daily_total
            FROM sales s JOIN date_dim d ON s.date_id = d.date_id
            GROUP BY s.product_id, d.transaction_date
        ),
        product_avg AS (
            SELECT product_id, AVG(daily_total) AS avg_daily_sales
            FROM daily_sales GROUP BY product_id
        )
        SELECT ds.product_id, ds.transaction_date, ds.daily_total,
               pa.avg_daily_sales,
               CASE WHEN ds.daily_total > 2 * pa.avg_daily_sales
                    THEN 'SPIKE' ELSE 'NORMAL' END AS status
        FROM daily_sales ds
        JOIN product_avg pa ON ds.product_id = pa.product_id
        WHERE ds.daily_total > 2 * pa.avg_daily_sales
        ORDER BY ds.product_id, ds.transaction_date
    """,
    # Q20 (queries.sql:306-313) — bare scan of the ordered view; the
    # ORDER BY lives in the view, as the reference writes it
    "q20_store_quarterly_sales_view": """
        SELECT * FROM store_quarterly_sales
    """,
}

# queries.sql:306-312 — the view itself carries the ORDER BY.
_Q20_VIEW_SQL = """
    CREATE OR REPLACE TEMP VIEW store_quarterly_sales AS
    SELECT st.store_id, st.store_name, d.year, d.quarter_num,
           SUM(s.sales_amount) AS total_quarterly_sales
    FROM sales s
    JOIN store st ON s.store_id = st.store_id
    JOIN date_dim d ON s.date_id = d.date_id
    GROUP BY st.store_id, st.store_name, d.year, d.quarter_num
    ORDER BY st.store_name, d.year, d.quarter_num
"""


def warehouse_queries_for_year(year: int = REFERENCE_YEAR) -> dict[str, str]:
    """Render the catalog with the given year bound into Q1/Q11/Q12.

    The reference pins 2017 (queries.sql:9,143,162); its dashboard
    rebinds the same literal from a sidebar (dashboard.py:66). ``year``
    is forced to int — no injection surface.
    """
    y = int(year)
    return {name: sql.replace("{year}", str(y)) for name, sql in _TEMPLATES.items()}


WAREHOUSE_QUERIES: dict[str, str] = warehouse_queries_for_year()


def register_warehouse(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Register ETL-built dims + fact as the views the queries expect."""
    for name in WAREHOUSE_VIEWS:
        tables[name].createOrReplaceTempView(name)


def run_query(
    spark: SparkSession, name: str, year: int = REFERENCE_YEAR
) -> DataFrame:
    """Execute one warehouse query by name (views must be registered)."""
    if name == "q20_store_quarterly_sales_view":
        spark.sql(_Q20_VIEW_SQL)
    return spark.sql(warehouse_queries_for_year(year)[name])
