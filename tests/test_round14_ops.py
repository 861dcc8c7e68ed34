"""Round-14 staged kernels: z-order APPLY (registration deferred to
round 15 — the r14 rotation window is at exact capacity). Gates mirror
the compaction plan/apply pair: row identity, one file per bucket, the
measured inventory equal to the planner's envelope table, and
idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    layout,
)

SF = "/root/testdata/sf0.01"


def test_zorder_apply_preserves_row_set(spark, tmp_path):
    dest = str(tmp_path / "z")
    layout.zorder_apply_events(spark, SF, dest)
    before = load_table(spark, SF, "events")
    after = spark.read.parquet(dest).select(*before.columns)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0


def test_zorder_apply_inventory_matches_planner(spark):
    """The measured file inventory equals the planner's envelope table
    with exactly one physical file per bucket — OPTIMIZE ZORDER ran,
    not just planned."""
    plan = {
        r["file_bucket"]: (
            r["n_events"], r["min_user"], r["max_user"],
            r["min_hour"], r["max_hour"],
        )
        for r in layout.layout_zorder_events(spark, SF).collect()
    }
    got = {
        r["file_bucket"]: (
            r["n_files"], r["n_events"], r["min_user"], r["max_user"],
            r["min_hour"], r["max_hour"],
        )
        for r in layout.zorder_apply_inventory(spark, SF).collect()
    }
    assert set(got) == set(plan)
    for b, (n, mnu, mxu, mnh, mxh) in plan.items():
        assert got[b] == (1, n, mnu, mxu, mnh, mxh), b


def test_zorder_apply_is_idempotent(spark):
    first = sorted(
        map(tuple, layout.zorder_apply_inventory(spark, SF).collect())
    )
    again = sorted(
        map(tuple, layout.zorder_apply_inventory(spark, SF).collect())
    )
    assert again == first


def test_zorder_apply_staged_oracle_matches_planner_contract(spark):
    """The staged oracle text replays the planner plus the
    one-file-per-bucket contract — run it through DuckDB against the
    same corpus and compare to the measured inventory, exactly what
    the round-15 driver row will do."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(layout._zorder_apply_sql()).fetchall()
    )
    got = sorted(
        tuple(int(v) for v in r)
        for r in layout.zorder_apply_inventory(spark, SF).collect()
    )
    assert got == want


def test_compaction_apply_oracle_models_hostile_corpus(spark, tmp_path):
    """Round-14 review findings, pinned: the apply oracle must replay
    the EXECUTOR on corpora the driver testdata never shows — a hot
    hour (split fires), NULL ts (sentinel hour), NULL and negative
    event_ids (coalesce + pmod sign semantics). Run the entry and its
    DuckDB oracle side by side on such a corpus and require equality."""
    import datetime as dt

    import duckdb

    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    for hour in range(5):
        n = 4500 if hour == 2 else 60  # hour 2 hot: past 2x target
        for i in range(n):
            # sprinkle negative ids through the hot hour so pmod vs
            # signed-% diverges if either side models it wrong
            e = -eid if (hour == 2 and i % 7 == 0) else eid
            rows.append(
                (e, base + dt.timedelta(hours=hour, seconds=i % 3600),
                 eid % 97, "view", float(i), "{}")
            )
            eid += 1
    rows.append((eid, None, 1, "view", 0.0, "{}"))      # NULL ts
    rows.append((None, None, 2, "view", 0.0, "{}"))     # NULL ts + id
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "hostile")
    df.coalesce(2).write.mode("overwrite").parquet(f"{src}/events.parquet")

    got = sorted(
        tuple(int(v) for v in r)
        for r in layout.layout_compaction_apply(spark, src).collect()
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
        registry,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{src}/events.parquet/*.parquet')"
    )
    want = sorted(
        tuple(int(v) for v in r)
        for r in con.execute(
            registry.ORACLES["layout_compaction_apply"]
        ).fetchall()
    )
    assert got == want
