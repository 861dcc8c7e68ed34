"""JDBC dimension source + fact sink — the reference's deployment mode.

The reference's warehouse is a live PostgreSQL: dimension caches load
via full-table JDBC scans (`/root/reference/hybridjoin.py:87-135`) and
the Sales fact is written with batched INSERTs of BATCH_SIZE=1000 rows
(`hybridjoin.py:14,449-464`). The Spark-native equivalents are the
built-in ``jdbc`` relation provider:

- source side: predicate pushdown and column pruning reach the remote
  database; ``partitionColumn/lowerBound/upperBound/numPartitions``
  shard a big dimension scan across executors (the reference's 500-row
  partition loader, hybridjoin.py:236-264, minus the hand scheduling);
- sink side: ``batchsize`` batches the INSERTs exactly like
  ``execute_values``' page_size, with one transaction per partition.

Everything is plain configuration on the standard reader/writer — these
helpers exist so the ETL entry points (`etl.dimensions`,
`streaming.hybrid_join.run_stream`) accept a JDBC location wherever
they accept a parquet path. Tested against the embedded Derby database
that ships on Spark's classpath; pointing at PostgreSQL is a url/driver
change, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Reference insert batching: BATCH_SIZE = 1000 (hybridjoin.py:14).
DEFAULT_BATCH_SIZE = 1000

# Dimension tables the reference warms its caches from.
WAREHOUSE_DIMS = ("customer", "product", "store", "supplier", "date_dim")


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """Scan one table (or a ``(subquery) alias``) over JDBC.

    Extra ``options`` pass through to the reader — notably the
    partitioned-read quartet (``partitionColumn``, ``lowerBound``,
    ``upperBound``, ``numPartitions``) for sharding large dimensions.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = DEFAULT_BATCH_SIZE,
    **options: str,
) -> None:
    """Write ``df`` into a JDBC table with batched INSERTs (S6/S7
    parity: the reference's execute_values pages, hybridjoin.py:449-464
    and the notebook dimension loads)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def load_warehouse_jdbc(
    spark: SparkSession,
    url: str,
    driver: str | None = None,
    tables: tuple[str, ...] = WAREHOUSE_DIMS,
    **options: str,
) -> dict[str, DataFrame]:
    """Load the warehouse dimensions from a live database — the JDBC
    twin of the parquet dimension loads (S3: hybridjoin.py:87-135).
    Returns {table_name: DataFrame}; join sites broadcast as usual."""
    return {
        t: read_jdbc_table(spark, url, t, driver=driver, **options)
        for t in tables
    }
