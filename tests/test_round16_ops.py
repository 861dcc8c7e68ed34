"""Round-16 staged operator gates.

`layout_cluster_quality` (staged for the round-17 rotation window):
the MEASURE leg of the layout family — exact per-dimension zone-map
span sums over a 64-bucket budget for the naive hour layout vs the
morton and hilbert executors. Gates: the staged DuckDB oracle replays
the Spark table bit-for-bit at sf0.01, and the metric demonstrably
justifies OPTIMIZE (the naive layout cannot prune on user; the
space-filling layouts confine both dimensions).
"""

from __future__ import annotations

import duckdb
import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    layout,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def quality(spark):
    rows = layout.layout_cluster_quality(spark, SF).collect()
    return {r["layout"]: r.asDict() for r in rows}


def test_cluster_quality_matches_staged_oracle(spark, quality):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    cols = layout._QUALITY_COLS
    want = {}
    res = con.execute(layout._cluster_quality_sql())
    names = [d[0] for d in res.description]
    assert sorted(names) == sorted(cols)
    for row in res.fetchall():
        d = dict(zip(names, row))
        want[d["layout"]] = {k: d[k] for k in cols}
    got = {
        lay: {k: r[k] for k in cols} for lay, r in quality.items()
    }
    assert got == want


def test_naive_hour_layout_cannot_prune_on_user(spark, quality):
    """Under the ingest-order baseline every bucket's user envelope
    covers ~the whole domain — a user predicate reads everything."""
    ev = load_table(spark, SF, "events")
    lo, hi = ev.selectExpr(
        "min(coalesce(user_id, -1))", "max(coalesce(user_id, -1))"
    ).first()
    domain = int(hi) - int(lo)
    assert quality["hour"]["user_span_max"] >= 0.9 * domain
    # while its hour envelopes are narrow (the one thing it CAN prune)
    hmin, hmax = ev.selectExpr(
        f"min({layout._HOUR_OR_SENTINEL})", f"max({layout._HOUR_OR_SENTINEL})"
    ).first()
    hspan = int(hmax) - int(hmin) + 1
    assert quality["hour"]["hour_span_max"] <= hspan // layout.Z_FILES + 1


def test_scaled_zorder_confines_both_dimensions(spark, quality):
    """The production (min-max-scaled) z-order leg: with both
    dimensions normalized onto the full grid, each of the 64 buckets
    confines each dimension to ~1/8 of its live domain (the top 3
    scaled bits are fixed per bucket)."""
    ev = load_table(spark, SF, "events")
    lo_u, hi_u = ev.selectExpr(
        "min(coalesce(user_id, -1))", "max(coalesce(user_id, -1))"
    ).first()
    lo_h, hi_h = ev.selectExpr(
        f"min({layout._HOUR_OR_SENTINEL})", f"max({layout._HOUR_OR_SENTINEL})"
    ).first()
    r = quality["morton_scaled"]
    # block = 1/8 of the scaled grid → ≤ domain/8 (+1 rounding slack)
    assert r["user_span_max"] <= (int(hi_u) - int(lo_u)) // 8 + 1
    assert r["hour_span_max"] <= (int(hi_h) - int(lo_h)) // 8 + 1
    assert r["n_buckets"] > layout.Z_FILES // 2  # grid genuinely used


def test_raw_interleave_degeneracy_is_measured(quality):
    """The pitfall the metric exists to expose: raw bit-interleave on
    this corpus (offset epoch-hours, small user domain) collapses —
    far fewer populated buckets than the scaled form, so pruning is
    nil. The committed apply entries stay correct (their oracles state
    envelopes of whatever buckets exist); this report is what tells an
    operator to normalize dimensions before clustering."""
    for lay in ("morton", "hilbert"):
        assert quality[lay]["n_buckets"] <= quality["morton_scaled"]["n_buckets"], lay


def test_scaled_clustering_beats_naive_on_the_blind_dimension(quality):
    """The OPTIMIZE justification in one inequality: total user-span
    (∝ expected buckets read per user point-lookup) under scaled
    z-order is a small fraction of the naive hour layout's, while its
    hour-span total stays within ~an order of the hour-optimal
    baseline's (it trades a little time locality for user locality)."""
    naive = quality["hour"]
    scaled = quality["morton_scaled"]
    assert scaled["user_span_sum"] * 4 < naive["user_span_sum"]
    assert naive["user_span_max"] >= 8 * scaled["user_span_max"]


def test_bucket_budget_respected(quality):
    for lay, r in quality.items():
        assert 1 <= r["n_buckets"] <= layout.Z_FILES, lay


# --- scaled z-order planner + executor (staged for round 17) ---------------


def _duck(sf=SF):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_zorder_scaled_planner_matches_staged_oracle(spark):
    got = _rows(
        layout.layout_zorder_scaled_events(spark, SF).select(
            "file_bucket", "n_events", "min_user", "max_user",
            "min_hour", "max_hour",
        )
    )
    want = sorted(
        _duck().execute(
            "SELECT file_bucket, n_events, min_user, max_user, "
            "min_hour, max_hour FROM (" + layout._zorder_scaled_sql() + ")"
        ).fetchall()
    )
    assert got == want
    assert len(got) > layout.Z_FILES // 2  # the grid is genuinely used


def test_zorder_scaled_apply_one_file_per_bucket(spark):
    inv = layout.zorder_scaled_apply_inventory(spark, SF)
    rows = _rows(inv.select(
        "file_bucket", "n_files", "n_events", "min_user", "max_user",
        "min_hour", "max_hour",
    ))
    want = sorted(
        _duck().execute(
            "SELECT file_bucket, n_files, n_events, min_user, max_user, "
            "min_hour, max_hour FROM ("
            + layout._zorder_scaled_apply_sql() + ")"
        ).fetchall()
    )
    assert rows == want  # incl. the measured n_files = 1 contract


def test_zorder_scaled_hostile_corpus_side_by_side(spark, tmp_path):
    """NULL user/ts, pre-epoch timestamps, single-row domains: the
    scaled key's sentinel + greatest(span,1) arithmetic must agree
    between engines on the corpus the sentinels exist for."""
    import datetime as dt

    rows = [
        (1, None, None, "a", 1.0, "{}"),                       # all NULL dims
        (2, dt.datetime(1969, 12, 31, 23, 0, 0), 5, "b", 1.0, "{}"),  # pre-epoch
        (3, dt.datetime(2024, 1, 1, 0, 0, 0), None, "c", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 1, 0, 0), 7, "d", 1.0, "{}"),
        (5, dt.datetime(2030, 6, 1, 12, 0, 0), 123456, "e", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "hostile")
    df.write.mode("overwrite").parquet(p)
    got = _rows(
        layout._envelopes(layout.zorder_scaled_bucketed(
            spark.read.parquet(p)
        )).selectExpr(
            "file_bucket", "mu", "xu", "mh", "xh"
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(
        con.execute(
            "SELECT file_bucket, min_user, max_user, min_hour, max_hour "
            "FROM (" + layout._zorder_scaled_env_sql() + ")"
        ).fetchall()
    )
    assert got == want


def test_zorder_scaled_single_row_domain(spark, tmp_path):
    """Degenerate domain (one distinct value per dimension): span
    clamps to 1 in both engines, everything in one well-defined
    bucket, no division error."""
    import datetime as dt

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), 42, "x", 1.0, "{}") for i in range(5)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "flat")
    df.write.mode("overwrite").parquet(p)
    env = layout._envelopes(
        layout.zorder_scaled_bucketed(spark.read.parquet(p))
    ).collect()
    assert len(env) == 1
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = con.execute(
        "SELECT COUNT(*) FROM (" + layout._zorder_scaled_env_sql() + ")"
    ).fetchone()[0]
    assert want == 1


# --- soft-dedup sampling weights (staged for round 17) ----------------------


def test_soft_dedup_weights_match_staged_oracle(spark):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        clusters,
    )

    got = _rows(clusters.curation_soft_dedup_weights(spark, SF))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = sorted(
        con.execute(
            "SELECT doc_id, component_id, cluster_size, weight_ppm "
            "FROM (" + clusters._SQL_SOFT_DEDUP + ")"
        ).fetchall()
    )
    assert got == want


def test_soft_dedup_mass_invariants(spark):
    """Singletons weigh exactly 1e6; each cluster's total weight loses
    at most size−1 ppm to truncation; and the corpus-total weight
    equals the hard-dedup kept-document count (one mass per cluster)
    up to that truncation loss."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        clusters,
    )

    rows = clusters.curation_soft_dedup_weights(spark, SF).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["component_id"], []).append(r)
    for cid, members in by_cluster.items():
        size = members[0]["cluster_size"]
        assert size == len(members), cid
        total = sum(m["weight_ppm"] for m in members)
        if size == 1:
            assert total == 1_000_000
        else:
            assert 1_000_000 - size + 1 <= total <= 1_000_000, cid
    n_clusters = len(by_cluster)
    corpus_mass = sum(r["weight_ppm"] for r in rows) / 1_000_000
    assert n_clusters - 1 < corpus_mass <= n_clusters
    # and duplicates genuinely exist in this corpus, so the entry is
    # not vacuously a constant column
    assert any(r["cluster_size"] > 1 for r in rows)


# --- ANN recall report (staged for round 17) --------------------------------


def test_ann_recall_report_matches_staged_oracle(spark):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        similarity,
    )

    got = _rows(similarity.ann_recall_report(spark, SF))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = sorted(con.execute(similarity._ann_recall_sql()).fetchall())
    assert got == want
    by_fam = {r[0]: r for r in got}
    assert set(by_fam) == {"lsh", "ivf", "pca", "ivfpq"}
    for fam, (name, n_truth, n_hit, ppm) in by_fam.items():
        assert n_truth > 0 and 0 <= n_hit <= n_truth, fam
        assert ppm == 1_000_000 * n_hit // n_truth, fam
        # the floors the pytest recall gates have asserted since r4/r10
        floor = {"lsh": 500_000, "ivf": 500_000,
                 "pca": 400_000, "ivfpq": 400_000}[fam]
        assert ppm >= floor, (fam, ppm)
