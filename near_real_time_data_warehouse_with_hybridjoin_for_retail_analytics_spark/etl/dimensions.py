"""Batch dimension ETL — the Spark replacement for master_data.ipynb.

Reference flow (cells 73c3ae1c → e17cc4d7/2e44aab9): pandas read_csv →
drop_duplicates projections (supplier/store/product) → executemany
INSERTs. Here: spark.read.csv with explicit casts → trim/validate →
dropDuplicates → parquet dims, with the default supplier/store rows
injected idempotently (hybridjoin.py:69-78, SURVEY §2.1 S7/S8).

The denormalized product master CSV (product_master_data.csv columns:
Product_ID, Product_Category, price$, storeID, supplierID, storeName,
supplierName) is split into the three dimensions exactly as the
notebook does (cells bfa480a3/b6fc2ec4/168be966).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import (
    DEFAULT_STORE_ID,
    DEFAULT_STORE_NAME,
    DEFAULT_SUPPLIER_ID,
    DEFAULT_SUPPLIER_NAME,
    validate_customer,
    validate_product,
)


def _read_csv(spark: SparkSession, path: str) -> DataFrame:
    """Header CSV read; every column arrives as string (no inferSchema —
    the warehouse owns its types) and gets whitespace-trimmed (P1)."""
    df = spark.read.option("header", True).csv(path)
    return df.select([F.trim(F.col(c)).alias(c.strip()) for c in df.columns])


def build_customer_dim(spark: SparkSession, csv_path: str) -> DataFrame:
    raw = _read_csv(spark, csv_path)
    dim = raw.select(
        F.col("Customer_ID").cast("long").alias("customer_id"),
        F.col("Gender").alias("gender"),
        F.col("Age").alias("age_group"),
        F.col("Occupation").cast("int").alias("occupation"),
        F.col("City_Category").alias("city_category"),
        F.col("Marital_Status").alias("marital_status"),
        F.col("Stay_In_Current_City_Years").cast("int").alias(
            "stay_in_current_city_years"
        ),
    )
    return validate_customer(dim).dropDuplicates(["customer_id"])


def split_product_master(
    spark: SparkSession, csv_path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """product_master CSV → (product_dim, store_dim, supplier_dim)."""
    raw = _read_csv(spark, csv_path)
    product = validate_product(
        raw.select(
            F.col("Product_ID").alias("product_id"),
            F.col("Product_Category").alias("product_category"),
            F.col("price$").cast("decimal(12,2)").alias("price"),
            F.col("storeID").cast("long").alias("store_id"),
            F.col("supplierID").cast("long").alias("supplier_id"),
        )
    ).dropDuplicates(["product_id"])

    store = (
        raw.select(
            F.col("storeID").cast("long").alias("store_id"),
            F.col("storeName").alias("store_name"),
        )
        .dropDuplicates(["store_id"])
        .unionByName(
            spark.createDataFrame(
                [(DEFAULT_STORE_ID, DEFAULT_STORE_NAME)], "store_id long, store_name string"
            )
        )
        .dropDuplicates(["store_id"])
    )
    supplier = (
        raw.select(
            F.col("supplierID").cast("long").alias("supplier_id"),
            F.col("supplierName").alias("supplier_name"),
        )
        .dropDuplicates(["supplier_id"])
        .unionByName(
            spark.createDataFrame(
                [(DEFAULT_SUPPLIER_ID, DEFAULT_SUPPLIER_NAME)],
                "supplier_id long, supplier_name string",
            )
        )
        .dropDuplicates(["supplier_id"])
    )
    return product, store, supplier


def write_dim(df: DataFrame, path: str) -> None:
    """Dims are small: one file each, overwritten idempotently."""
    df.coalesce(1).write.mode("overwrite").parquet(path)
