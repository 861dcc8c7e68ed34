"""The 20 reference queries in warehouse-native form (SURVEY §2.12).

These are faithful Spark SQL translations of /root/reference/queries.sql
over the star schema the ETL builds (views: customer, product, store,
supplier, date_dim, sales). queries.sql runs on PostgreSQL; deltas
handled here (SURVEY §4):

  * Postgres folds unquoted identifiers to lowercase — every computed
    column carries an explicit lowercase alias;
  * NULL ordering is pinned where ORDER BY touches nullable aggregates
    (Q17 rollup subtotals);
  * ``round`` / ``nullif`` / ``rollup`` semantics match Postgres for
    these value domains.

Q1's global LIMIT-5 bug is reproduced as written (Q11 is the corrected
per-group top-k), per SURVEY §7.3.

The graded, oracle-checked variants of these shapes live in
``testdata_queries``; this module is the reference-parity surface a
user of the original system would migrate onto, and is exercised
end-to-end by tests/test_warehouse_queries.py over an ETL-built
warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WAREHOUSE_VIEWS = ("customer", "product", "store", "supplier", "date_dim", "sales")

WAREHOUSE_QUERIES: dict[str, str] = {
    # Q1 (queries.sql:6-12) — top revenue products weekday/weekend, monthly;
    # global LIMIT 5 reproduced faithfully.
    "q1_top_products_weekend_monthly": """
        SELECT d.month_num AS monthnum, d.is_weekend, p.product_id,
               p.product_category,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
        GROUP BY d.month_num, d.is_weekend, p.product_id, p.product_category
        ORDER BY monthnum, is_weekend, total_revenue DESC
        LIMIT 5
    """,
    # Q2 (queries.sql:17-20)
    "q2_demographics_spend": """
        SELECT c.gender, c.age_group, c.city_category,
               SUM(s.sales_amount) AS total_spent,
               SUM(s.quantity) AS total_units
        FROM sales s JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY c.gender, c.age_group, c.city_category
        ORDER BY total_spent DESC
    """,
    # Q3 (queries.sql:24-28)
    "q3_category_by_occupation": """
        SELECT p.product_category, c.occupation,
               SUM(s.sales_amount) AS total_sales,
               SUM(s.quantity) AS total_units
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY p.product_category, c.occupation
        ORDER BY p.product_category, total_sales DESC
    """,
    # Q4 (queries.sql:32-40) — scalar CTE MAX(year)
    "q4_quarterly_latest_year": """
        WITH latest_year AS (SELECT MAX(year) AS yr FROM date_dim dd
                             WHERE EXISTS (SELECT 1 FROM sales s WHERE s.date_id = dd.date_id))
        SELECT d.quarter_num, c.gender, c.age_group,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        JOIN latest_year ly ON d.year = ly.yr
        GROUP BY d.quarter_num, c.gender, c.age_group
        ORDER BY d.quarter_num, total_revenue DESC
    """,
    # Q5 (queries.sql:45-57) — top 5 occupations per category
    "q5_top_occupations_per_category": """
        WITH occ AS (
            SELECT p.product_category, c.occupation,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN customer c ON s.customer_id = c.customer_id
            GROUP BY p.product_category, c.occupation
        )
        SELECT product_category, occupation, total_revenue, rn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY product_category
                                         ORDER BY total_revenue DESC) AS rn
            FROM occ
        ) ranked WHERE rn <= 5
        ORDER BY product_category, rn
    """,
    # Q6 (queries.sql:61-70) — trailing 6 months interval join
    "q6_city_marital_6mo": """
        WITH max_date AS (
            SELECT MAX(d.transaction_date) AS latest_date
            FROM sales s JOIN date_dim d ON s.date_id = d.date_id
        )
        SELECT c.city_category, c.marital_status,
               SUM(s.sales_amount) AS total_revenue,
               SUM(s.quantity) AS total_units
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        JOIN max_date md ON d.transaction_date
             BETWEEN md.latest_date - INTERVAL 6 MONTH AND md.latest_date
        GROUP BY c.city_category, c.marital_status
        ORDER BY c.city_category, c.marital_status
    """,
    # Q7 (queries.sql:75-78)
    "q7_avg_by_stay_gender": """
        SELECT c.stay_in_current_city_years, c.gender,
               AVG(s.sales_amount) AS avg_purchase
        FROM sales s JOIN customer c ON s.customer_id = c.customer_id
        GROUP BY c.stay_in_current_city_years, c.gender
        ORDER BY c.stay_in_current_city_years, c.gender
    """,
    # Q8 (queries.sql:83-97) — top 5 city categories per product category
    "q8_top_cities_per_category": """
        WITH cc AS (
            SELECT p.product_category, c.city_category,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN customer c ON s.customer_id = c.customer_id
            GROUP BY p.product_category, c.city_category
        )
        SELECT product_category, city_category, total_revenue, rn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY product_category
                                         ORDER BY total_revenue DESC) AS rn
            FROM cc
        ) ranked WHERE rn <= 5
        ORDER BY product_category, rn
    """,
    # Q9 (queries.sql:102-121) — monthly growth % by category
    "q9_monthly_growth": """
        WITH monthly AS (
            SELECT p.product_category, d.month_num AS monthnum,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN date_dim d ON s.date_id = d.date_id
            JOIN (SELECT MAX(year) AS cy FROM date_dim dd
                  WHERE EXISTS (SELECT 1 FROM sales s2 WHERE s2.date_id = dd.date_id)) y
              ON d.year = y.cy
            GROUP BY p.product_category, d.month_num
        )
        SELECT product_category, monthnum, revenue,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2) AS growth_pct
        FROM monthly
        WINDOW w AS (PARTITION BY product_category ORDER BY monthnum)
        ORDER BY product_category, monthnum
    """,
    # Q10 (queries.sql:125-132)
    "q10_weekend_by_age": """
        WITH latest_year AS (SELECT MAX(year) AS yr FROM date_dim dd
                             WHERE EXISTS (SELECT 1 FROM sales s WHERE s.date_id = dd.date_id))
        SELECT c.age_group, d.is_weekend,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN customer c ON s.customer_id = c.customer_id
        JOIN date_dim d ON s.date_id = d.date_id
        JOIN latest_year ly ON d.year = ly.yr
        GROUP BY c.age_group, d.is_weekend
        ORDER BY c.age_group, d.is_weekend
    """,
    # Q11 (queries.sql:137-154) — Q1 corrected: per-(month,weekend) top 5
    "q11_top5_products_per_month_weekend": """
        WITH rev AS (
            SELECT d.month_num AS monthnum, d.is_weekend, p.product_id,
                   p.product_category,
                   SUM(s.sales_amount) AS total_revenue
            FROM sales s
            JOIN product p ON s.product_id = p.product_id
            JOIN date_dim d ON s.date_id = d.date_id
            GROUP BY d.month_num, d.is_weekend, p.product_id, p.product_category
        )
        SELECT monthnum, is_weekend, product_id, product_category,
               total_revenue, rn
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY monthnum, is_weekend
                                         ORDER BY total_revenue DESC) AS rn
            FROM rev
        ) ranked WHERE rn <= 5
        ORDER BY monthnum, is_weekend, rn
    """,
    # Q12 (queries.sql:159-171) — store growth, quarterly, epoch year
    "q12_store_growth_quarterly": """
        WITH qr AS (
            SELECT st.store_name, d.quarter_num,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN store st ON s.store_id = st.store_id
            JOIN date_dim d ON s.date_id = d.date_id
            JOIN (SELECT MIN(year) AS yr FROM date_dim dd
                  WHERE EXISTS (SELECT 1 FROM sales s2 WHERE s2.date_id = dd.date_id)) y
              ON d.year = y.yr
            GROUP BY st.store_name, d.quarter_num
        )
        SELECT store_name, quarter_num, revenue,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2) AS growth_pct
        FROM qr
        WINDOW w AS (PARTITION BY store_name ORDER BY quarter_num)
        ORDER BY store_name, quarter_num
    """,
    # Q13 (queries.sql:176-181)
    "q13_supplier_contribution": """
        SELECT st.store_name, sup.supplier_name, p.product_category,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN store st ON s.store_id = st.store_id
        JOIN supplier sup ON s.supplier_id = sup.supplier_id
        JOIN product p ON s.product_id = p.product_id
        GROUP BY st.store_name, sup.supplier_name, p.product_category
        ORDER BY st.store_name, total_revenue DESC
    """,
    # Q14 (queries.sql:186-197) — derived season group-by
    "q14_seasonal_sales": """
        SELECT CASE WHEN d.month_num IN (12, 1, 2) THEN 'Winter'
                    WHEN d.month_num IN (3, 4, 5)  THEN 'Spring'
                    WHEN d.month_num IN (6, 7, 8)  THEN 'Summer'
                    ELSE 'Fall' END AS season,
               p.product_category,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
        GROUP BY 1, 2
        ORDER BY season, total_revenue DESC
    """,
    # Q15 (queries.sql:203-230) — 2-key partition, 2-key order LAG
    "q15_store_supplier_volatility": """
        WITH m AS (
            SELECT st.store_name, sup.supplier_name,
                   d.year AS sale_year, d.month_num AS monthnum,
                   SUM(s.sales_amount) AS revenue
            FROM sales s
            JOIN store st ON s.store_id = st.store_id
            JOIN supplier sup ON s.supplier_id = sup.supplier_id
            JOIN date_dim d ON s.date_id = d.date_id
            GROUP BY st.store_name, sup.supplier_name, d.year, d.month_num
        )
        SELECT store_name, supplier_name, sale_year, monthnum, revenue,
               ROUND((revenue - LAG(revenue) OVER w)
                     / NULLIF(LAG(revenue) OVER w, 0) * 100, 2) AS growth_pct
        FROM m
        WINDOW w AS (PARTITION BY store_name, supplier_name
                     ORDER BY sale_year, monthnum)
        ORDER BY store_name, supplier_name, sale_year, monthnum
    """,
    # Q16 (queries.sql:236-243) — theta self-join affinity pairs
    "q16_affinity_pairs": """
        SELECT s1.product_id AS product_a, s2.product_id AS product_b,
               COUNT(*) AS pair_count
        FROM sales s1
        JOIN sales s2 ON s1.order_id = s2.order_id
                     AND s1.product_id < s2.product_id
        GROUP BY s1.product_id, s2.product_id
        ORDER BY pair_count DESC
        LIMIT 5
    """,
    # Q17 (queries.sql:250-257) — ROLLUP, latest year, pinned null order
    "q17_rollup_store_supplier_category": """
        SELECT st.store_name, sup.supplier_name, p.product_category,
               d.year AS sale_year,
               SUM(s.sales_amount) AS total_revenue
        FROM sales s
        JOIN store st ON s.store_id = st.store_id
        JOIN supplier sup ON s.supplier_id = sup.supplier_id
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
        WHERE d.year = (SELECT MAX(d2.year) FROM date_dim d2
                        WHERE EXISTS (SELECT 1 FROM sales s2 WHERE s2.date_id = d2.date_id))
        GROUP BY ROLLUP (st.store_name, sup.supplier_name,
                         p.product_category, d.year)
        ORDER BY store_name ASC NULLS LAST, supplier_name ASC NULLS LAST,
                 product_category ASC NULLS LAST, sale_year ASC NULLS LAST
    """,
    # Q18 (queries.sql:263-275) — H1/H2 conditional aggregation
    "q18_h1_h2_per_product": """
        SELECT p.product_id, p.product_category,
               SUM(CASE WHEN d.month_num BETWEEN 1 AND 6
                        THEN s.sales_amount END) AS h1_revenue,
               SUM(CASE WHEN d.month_num BETWEEN 7 AND 12
                        THEN s.sales_amount END) AS h2_revenue,
               SUM(CASE WHEN d.month_num BETWEEN 1 AND 6
                        THEN s.quantity END) AS h1_units,
               SUM(CASE WHEN d.month_num BETWEEN 7 AND 12
                        THEN s.quantity END) AS h2_units,
               SUM(s.sales_amount) AS total_revenue,
               SUM(s.quantity) AS total_units
        FROM sales s
        JOIN product p ON s.product_id = p.product_id
        JOIN date_dim d ON s.date_id = d.date_id
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
            SELECT product_id, AVG(daily_total) AS avg_daily
            FROM daily_sales GROUP BY product_id
        )
        SELECT ds.product_id, ds.transaction_date, ds.daily_total,
               pa.avg_daily,
               CASE WHEN ds.daily_total > 2 * pa.avg_daily
                    THEN 'SPIKE' ELSE 'NORMAL' END AS status
        FROM daily_sales ds
        JOIN product_avg pa ON ds.product_id = pa.product_id
        WHERE ds.daily_total > 2 * pa.avg_daily
        ORDER BY ds.product_id, ds.transaction_date
    """,
    # Q20 (queries.sql:306-313) — view + scan; view created by run_query
    "q20_store_quarterly_sales_view": """
        SELECT store_name, sale_year, quarter_num, total_revenue
        FROM store_quarterly_sales
        ORDER BY store_name, sale_year, quarter_num
    """,
}

_Q20_VIEW_SQL = """
    CREATE OR REPLACE TEMP VIEW store_quarterly_sales AS
    SELECT st.store_name, d.year AS sale_year, d.quarter_num,
           SUM(s.sales_amount) AS total_revenue
    FROM sales s
    JOIN store st ON s.store_id = st.store_id
    JOIN date_dim d ON s.date_id = d.date_id
    GROUP BY st.store_name, d.year, d.quarter_num
"""


def register_warehouse(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Register ETL-built dims + fact as the views the queries expect."""
    for name in WAREHOUSE_VIEWS:
        tables[name].createOrReplaceTempView(name)


def run_query(spark: SparkSession, name: str) -> DataFrame:
    """Execute one warehouse query by name (views must be registered)."""
    if name == "q20_store_quarterly_sales_view":
        spark.sql(_Q20_VIEW_SQL)
    return spark.sql(WAREHOUSE_QUERIES[name])
