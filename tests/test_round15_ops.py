"""Round-15 gates: the registered ``layout_zorder_apply`` entry's
NULL/sentinel semantics on corpora the driver testdata never shows
(round-14 ADVICE layout.py:520 — NULL ts must not land in a Hive
default partition or diverge from the DuckDB oracle), plus the
pre-epoch integer-division agreement the oracle docstring claims."""

from __future__ import annotations

import datetime as dt

import duckdb

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    layout,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
    registry,
)


def _hostile_events(spark, tmp_path):
    """Events with every hazard the ADVICE named: NULL ts, NULL
    user_id, negative user_id, and pre-epoch ts (negative hour index,
    where a truncate/floor divergence would bite)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(4):
        for i in range(50):
            uid = -(eid % 97) if i % 9 == 0 else eid % 997
            rows.append(
                (eid, base + dt.timedelta(hours=hour, seconds=i),
                 uid, "view", float(i), "{}")
            )
            eid += 1
    # pre-epoch: hour index negative, and NOT on an exact hour
    # boundary so truncation vs floor would actually diverge
    rows.append((eid, dt.datetime(1969, 12, 31, 22, 30), 5, "view", 0.0, "{}"))
    rows.append((eid + 1, dt.datetime(1969, 6, 1, 1, 2, 3), 6, "view", 0.0, "{}"))
    # NULL hazards
    rows.append((eid + 2, None, 7, "view", 0.0, "{}"))          # NULL ts
    rows.append((eid + 3, base, None, "view", 0.0, "{}"))       # NULL user
    rows.append((eid + 4, None, None, "view", 0.0, "{}"))       # both NULL
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "hostile")
    df.coalesce(2).write.mode("overwrite").parquet(f"{src}/events.parquet")
    return src


def test_zorder_apply_oracle_models_hostile_corpus(spark, tmp_path):
    """Entry and oracle agree bit-for-bit on the hostile corpus — the
    sentinel keys keep NULL-dimension rows in a real bucket on both
    sides, and Spark DIV == DuckDB // for pre-epoch hours."""
    src = _hostile_events(spark, tmp_path)
    got = sorted(
        tuple(int(v) for v in r)
        for r in layout.zorder_apply_inventory(spark, src).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{src}/events.parquet/*.parquet')"
    )
    want = sorted(
        tuple(int(v) for v in r)
        for r in con.execute(registry.ORACLES["layout_zorder_apply"]).fetchall()
    )
    assert got == want


def test_zorder_apply_hostile_rows_all_measured(spark, tmp_path):
    """Row preservation on the hostile corpus: the measured inventory
    accounts for every input row (no NULL-keyed row dropped into a
    default partition or skipped by the read-back)."""
    src = _hostile_events(spark, tmp_path)
    inv = layout.zorder_apply_inventory(spark, src).collect()
    n_in = spark.read.parquet(f"{src}/events.parquet").count()
    assert sum(r["n_events"] for r in inv) == n_in
    # NULL-keyed rows measured at the sentinel: some bucket's envelope
    # must include -1 on each dimension
    assert min(r["min_user"] for r in inv) < 0
    assert min(r["min_hour"] for r in inv) < 0


def test_zorder_apply_registered_with_oracle():
    """The round-15 registration landed: entry + oracle both present,
    and the oracle is the sentinel form (models NULLs)."""
    assert "layout_zorder_apply" in registry.QUERIES
    sql = registry.ORACLES["layout_zorder_apply"]
    assert "coalesce(user_id, -1)" in sql
    assert "coalesce(epoch_us(ts)" in sql
