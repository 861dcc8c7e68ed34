"""Warehouse star-schema StructTypes and domain constants.

Faithful to the reference DDL (/root/reference/star_schema.sql:16-67)
with the SURVEY §1.2 type mapping: ids widened to LongType for 100 TB
scale, money as DecimalType(12,2), enums as validated strings.
Spark enforces none of the reference's PK/FK/CHECK constraints, so the
ETL validates at ingest (validate_* helpers below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Defaults injected for unmatched product lookups (hybridjoin.py:17-18,69-78)
DEFAULT_SUPPLIER_ID = 1
DEFAULT_STORE_ID = 1
DEFAULT_SUPPLIER_NAME = "Unknown Supplier"
DEFAULT_STORE_NAME = "Unknown Store"
DEFAULT_PRICE = 0.0

# Enum domains (star_schema.sql:4-14)
GENDERS = ("M", "F")
MARITAL = ("0", "1")
AGE_GROUPS = ("0-17", "18-25", "26-35", "36-45", "46-50", "51-55", "55+")
CITY_CATEGORIES = ("A", "B", "C")

CUSTOMER_SCHEMA = StructType(
    [
        StructField("customer_id", LongType(), False),
        StructField("gender", StringType(), True),
        StructField("age_group", StringType(), True),
        StructField("occupation", IntegerType(), True),
        StructField("city_category", StringType(), True),
        StructField("marital_status", StringType(), True),
        StructField("stay_in_current_city_years", IntegerType(), True),
    ]
)

PRODUCT_SCHEMA = StructType(
    [
        StructField("product_id", StringType(), False),
        StructField("product_category", StringType(), True),
        StructField("price", DecimalType(12, 2), True),
        StructField("store_id", LongType(), True),
        StructField("supplier_id", LongType(), True),
    ]
)

STORE_SCHEMA = StructType(
    [
        StructField("store_id", LongType(), False),
        StructField("store_name", StringType(), True),
    ]
)

SUPPLIER_SCHEMA = StructType(
    [
        StructField("supplier_id", LongType(), False),
        StructField("supplier_name", StringType(), True),
    ]
)

DATE_SCHEMA = StructType(
    [
        StructField("date_id", IntegerType(), False),
        StructField("transaction_date", DateType(), False),
        StructField("day_num", IntegerType(), True),
        StructField("month_num", IntegerType(), True),
        StructField("year", IntegerType(), True),
        StructField("day_of_week", StringType(), True),
        StructField("quarter_num", IntegerType(), True),
        StructField("is_weekend", BooleanType(), True),
    ]
)

SALES_SCHEMA = StructType(
    [
        StructField("sales_id", LongType(), False),
        StructField("order_id", LongType(), True),
        StructField("customer_id", LongType(), True),
        StructField("product_id", StringType(), True),
        StructField("date_id", IntegerType(), True),
        StructField("store_id", LongType(), True),
        StructField("supplier_id", LongType(), True),
        StructField("sales_amount", DecimalType(12, 2), True),
        StructField("quantity", IntegerType(), True),
    ]
)

# Raw stream tuples arrive as all-string CSV columns; the canonical
# spellings plus the alternates the reference probes for
# (hybridjoin.py:281,382-385) are normalized in streaming.hybrid_join.
TRANSACTION_ALIASES: dict[str, tuple[str, ...]] = {
    "order_id": ("orderID", "order_id", "orderid"),
    "customer_id": ("Customer_ID", "customer_id", "customerid"),
    "product_id": ("Product_ID", "product_id", "productid"),
    "quantity": ("quantity", "Quantity"),
    "date": ("date", "transaction_date", "Date"),
}


def _in_domain(c: Column, domain: tuple[str, ...]) -> Column:
    return c.isin(*domain) | c.isNull()


def validate_customer(df: DataFrame) -> DataFrame:
    """Ingest-time CHECK-equivalents (star_schema.sql:17-25)."""
    return df.filter(
        F.col("customer_id").isNotNull()
        & _in_domain(F.col("gender"), GENDERS)
        & _in_domain(F.col("age_group"), AGE_GROUPS)
        & _in_domain(F.col("city_category"), CITY_CATEGORIES)
        & _in_domain(F.col("marital_status"), MARITAL)
        & (F.coalesce(F.col("stay_in_current_city_years"), F.lit(0)) >= 0)
    )


def validate_product(df: DataFrame) -> DataFrame:
    """price > 0 CHECK (star_schema.sql:31)."""
    return df.filter(F.col("product_id").isNotNull() & (F.col("price") > 0))


def validate_sales(df: DataFrame) -> DataFrame:
    """quantity >= 0 AND sales_amount >= 0 (star_schema.sql:65-66)."""
    return df.filter((F.col("quantity") >= 0) & (F.col("sales_amount") >= 0))
