"""Table loading for the driver's testdata star schema.

Testdata layout (TESTDATA.md): one parquet per table under
``/root/testdata/sf{N}/``. Tables: region nation customer supplier part
orders lineitem events documents embeddings.

We always read parquet directly (columnar scan, predicate pushdown,
column pruning all free) — never collect dimensions to the driver. The
reference's in-memory dimension caches (hybridjoin.py:56-60,87-135) map
to broadcast joins at the join sites, not to driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame.

    ``events.parquet`` stores its ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects; we read nanos as long
    (legacy conf, runtime-settable) and rebuild the timestamp with exact
    integer division — identical to DuckDB's nanos→micros truncation.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table; keys are bare table names."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each testdata table as a temp view (for spark.sql plans)."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
