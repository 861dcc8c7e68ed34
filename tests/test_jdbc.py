"""JDBC source/sink tests against the embedded Derby database that
ships on Spark's classpath — real reads/writes over a live JDBC
connection, mirroring the reference's PostgreSQL deployment
(dim scans hybridjoin.py:87-135, batched INSERT sink :449-464)."""

from __future__ import annotations

import shutil
import tempfile
from decimal import Decimal
from pathlib import Path

import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.sources.jdbc import (
    read_jdbc_table,
    write_jdbc_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    hybrid_join as hj,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

CSV_A = """orderID,Customer_ID,Product_ID,quantity,date
100,1000001,P001,2,2017-03-04
101,1000002,P002,1,2017-03-05
102,1000001,P002,3,2017-03-06
"""
CSV_B = """orderID,Customer_ID,Product_ID,quantity,date
200,1000002,P001,4,2017-04-01
201,1000001,P001,1,2017-04-02
"""

CUSTOMERS = [(1000001, "M"), (1000002, "F")]
PRODUCTS = [
    ("P001", "Toys", Decimal("10.50"), 3, 2),
    ("P002", "Appliances", Decimal("79.95"), 4, 5),
]


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="jdbctest_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def derby_url(workdir):
    return f"jdbc:derby:{workdir}/db;create=true"


def test_jdbc_round_trip_dimension(spark, derby_url):
    """Dimension write → read over a live connection preserves rows and
    types (S3/S7 parity)."""
    dim = spark.createDataFrame(
        PRODUCTS,
        "product_id string, product_category string, price decimal(12,2), "
        "store_id long, supplier_id long",
    )
    write_jdbc_table(
        dim, derby_url, "product", mode="overwrite", driver=DERBY_DRIVER
    )
    back = read_jdbc_table(spark, derby_url, "product", driver=DERBY_DRIVER)
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(PRODUCTS)


def test_stream_jdbc_sink_and_sequence_bootstrap(spark, derby_url, workdir):
    """The streaming ETL appends the fact into a live JDBC table; a
    second run over new files resumes the sales_id sequence from
    MAX(sales_id) in the target table (hybridjoin.py:80-85 parity)."""
    cust = spark.createDataFrame(CUSTOMERS, "customer_id long, gender string")
    prod = spark.createDataFrame(
        PRODUCTS,
        "product_id string, product_category string, price decimal(12,2), "
        "store_id long, supplier_id long",
    )
    schema = (
        "orderID string, Customer_ID string, Product_ID string, "
        "quantity string, date string"
    )
    sink_opts = {"url": derby_url, "table": "sales", "driver": DERBY_DRIVER}

    in_dir = workdir / "in"
    in_dir.mkdir()
    (in_dir / "a.csv").write_text(CSV_A)
    hj.run_stream(
        spark,
        str(in_dir),
        schema,
        cust,
        prod,
        output_dir=str(workdir / "unused"),
        checkpoint_dir=str(workdir / "ckpt1"),
        sink_format="jdbc",
        sink_options=sink_opts,
    ).awaitTermination()

    back = read_jdbc_table(spark, derby_url, "sales", driver=DERBY_DRIVER)
    rows = {r.order_id: r for r in back.collect()}
    assert len(rows) == 3
    assert sorted(r.sales_id for r in rows.values()) == [1, 2, 3]
    # enrichment applied before the sink: price lookup → sales_amount
    assert rows[100].sales_amount == Decimal("21.00")
    assert rows[101].sales_amount == Decimal("79.95")

    # second run, new input, fresh checkpoint → ids continue at MAX+1
    in2 = workdir / "in2"
    in2.mkdir()
    (in2 / "b.csv").write_text(CSV_B)
    hj.run_stream(
        spark,
        str(in2),
        schema,
        cust,
        prod,
        output_dir=str(workdir / "unused"),
        checkpoint_dir=str(workdir / "ckpt2"),
        sink_format="jdbc",
        sink_options=sink_opts,
    ).awaitTermination()

    back2 = read_jdbc_table(spark, derby_url, "sales", driver=DERBY_DRIVER)
    assert sorted(r.sales_id for r in back2.collect()) == [1, 2, 3, 4, 5]


def test_jdbc_replay_markers_prevent_duplicates(spark, derby_url, workdir):
    """Redelivery protection (S6 parity): wiping the checkpoint but
    keeping the batch markers replays the same input as batch 0 again —
    the marker makes it a no-op, so the live table gains no duplicate
    rows and no duplicate ids."""
    cust = spark.createDataFrame(CUSTOMERS, "customer_id long, gender string")
    prod = spark.createDataFrame(
        PRODUCTS,
        "product_id string, product_category string, price decimal(12,2), "
        "store_id long, supplier_id long",
    )
    schema = (
        "orderID string, Customer_ID string, Product_ID string, "
        "quantity string, date string"
    )
    sink_opts = {"url": derby_url, "table": "sales_replay", "driver": DERBY_DRIVER}
    in_dir = workdir / "in_replay"
    in_dir.mkdir()
    (in_dir / "a.csv").write_text(CSV_A)
    ckpt = workdir / "ckpt_replay"

    for attempt in range(2):
        if attempt == 1:
            # crash-and-restart-without-checkpoint: offsets are gone,
            # the committed-batch markers (written next to them) remain
            for child in ckpt.iterdir():
                if not child.name.startswith("_batch_"):
                    shutil.rmtree(child, ignore_errors=True)
        hj.run_stream(
            spark,
            str(in_dir),
            schema,
            cust,
            prod,
            output_dir=str(workdir / "unused2"),
            checkpoint_dir=str(ckpt),
            sink_format="jdbc",
            sink_options=sink_opts,
        ).awaitTermination()
        back = read_jdbc_table(
            spark, derby_url, "sales_replay", driver=DERBY_DRIVER
        ).collect()
        assert sorted(r.sales_id for r in back) == [1, 2, 3], f"attempt {attempt}"


def test_jdbc_partitioned_read_option_passthrough(spark, derby_url):
    """The partitioned-read quartet reaches the JDBC relation: the scan
    plans numPartitions partitions over the stride. Seeds its own table
    so the test runs in isolation (no dependence on the stream-sink
    tests having populated 'sales')."""
    seed = spark.createDataFrame(
        [(i, f"row{i}") for i in range(1, 6)], "sales_id long, payload string"
    )
    write_jdbc_table(
        seed, derby_url, "sales_part_read", mode="overwrite", driver=DERBY_DRIVER
    )
    back = read_jdbc_table(
        spark,
        derby_url,
        "sales_part_read",
        driver=DERBY_DRIVER,
        partitionColumn="sales_id",
        lowerBound="1",
        upperBound="6",
        numPartitions="3",
    )
    assert back.rdd.getNumPartitions() == 3
    assert back.count() == 5


def test_missing_table_classifier_both_engines():
    """The sequence-bootstrap classifier must treat ONLY
    undefined-table failures as 'first run' (→ offset 0). Postgres and
    Derby message forms classify as missing; a missing DATABASE or
    ROLE, host-resolution failures, and unrelated errors must
    propagate even though they too say 'does not exist' (advice,
    round 13)."""
    miss = hj._is_missing_table_error
    t = "sales"
    # Postgres: undefined_table, message and SQLState forms
    assert miss(Exception('ERROR: relation "sales" does not exist'), t)
    assert miss(
        Exception("org.postgresql.util.PSQLException: ERROR: relation "
                  '"sales" does not exist\n  SQLState: 42P01'), t)
    # Derby forms
    assert miss(Exception("Table/View 'SALES' does not exist."), t)
    assert miss(
        Exception("java.sql.SQLSyntaxErrorException: Table/View 'SALES' "
                  "does not exist. SQLState 42X05"), t)
    # locale-independent: SQLState alone suffices (German Postgres)
    assert miss(
        Exception("FEHLER: Relation \u00bbsales\u00ab existiert nicht\n"
                  "  SQLState: 42P01"), t)
    # schema-qualified sink
    assert miss(
        Exception('ERROR: relation "warehouse.sales" does not exist'),
        "warehouse.sales")
    assert miss(
        Exception('ERROR: relation "sales" does not exist'),
        "warehouse.sales")
    # NOT missing-table: database / role / host / other table
    assert not miss(
        Exception('FATAL: database "warehouse" does not exist'), t)
    assert not miss(
        Exception('FATAL: role "etl" does not exist'), t)
    assert not miss(
        Exception("java.net.UnknownHostException: dbhost not found"), t)
    assert not miss(
        Exception('ERROR: relation "other_table" does not exist'), t)
    assert not miss(Exception("connection refused"), t)
    # anchored SQLState (advice, round 14): a bare state code inside
    # quoted SQL text or an identifier must NOT classify as first-run
    assert not miss(
        Exception("ERROR: syntax error in "
                  "SELECT * FROM log WHERE code = '42P01' ORDER BY 1"), t)
    assert not miss(
        Exception('ERROR: column "sqlstate_42X05_flag" does not exist'), t)
    # but labeled forms in common layouts still classify
    assert miss(Exception("... [SQLState: 42P01] ..."), t)
    assert miss(Exception("ERRORCODE=-204, SQLSTATE=42P01, ..."), t)
    assert miss(Exception("SQLState '42X05': table missing"), t)
    # round-15 advice: drivers that embed the BARE state (no label)
    # while localizing the phrase away classify iff the table is also
    # named in some engine quoting...
    assert miss(
        Exception('ERROR [42P01]: Relation »sales« kaputt'), t)
    assert miss(Exception('(42P01) relation "sales"'), t)
    # ...and the phrase fallback knows the big locales' forms
    assert miss(
        Exception("FEHLER: Relation »sales« existiert nicht"), t)
    assert miss(
        Exception("ERREUR: la relation « sales » n'existe pas"), t)
    assert miss(
        Exception("ERROR: no existe la relación «sales»"), t)
    # bare state WITHOUT the table named must still propagate
    assert not miss(Exception("ERROR [42P01]: something broke"), t)
    assert not miss(
        Exception("FEHLER: Relation »other« existiert nicht"), t)
