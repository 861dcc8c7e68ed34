"""Hand-checked semantics for the time-series joins (boundaries and
left-join behavior), plus determinism of the quantile report."""

from __future__ import annotations

from datetime import datetime

import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    textops,
    timeseries,
)


@pytest.fixture(scope="module")
def tiny_events_dir(spark, tmp_path_factory):
    """A hand-built events table exercising every boundary case."""
    base = datetime(2024, 1, 1)

    def at(sec):
        return datetime(2024, 1, 1, 0, sec // 60, sec % 60)

    rows = [
        # user 1: click → purchase (attributed), earlier purchase (not)
        (1, at(10), 1, "purchase", 0.0, None),   # before any click → NULL
        (2, at(20), 1, "click", 0.0, None),
        (3, at(30), 1, "purchase", 0.0, None),   # → click 2, 10s later
        (4, at(40), 1, "click", 0.0, None),
        (5, at(50), 1, "purchase", 0.0, None),   # → click 4 (latest prior)
        # user 2: error-context boundaries around a 5-minute window
        (10, at(600), 2, "error", 0.0, None),
        (11, at(300), 2, "view", 0.0, None),     # exactly 5 min prior → in
        (12, at(299), 2, "view", 0.0, None),     # > 5 min prior → out
        (13, at(600), 2, "view", 0.0, None),     # same instant → out
        (14, at(599), 2, "view", 0.0, None),     # in
        (15, at(599), 3, "view", 0.0, None),     # other user → out
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tmp_path_factory.mktemp("tinyev")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_asof_attribution_semantics(spark, tiny_events_dir):
    got = {
        r["purchase_id"]: r["click_id"]
        for r in timeseries.events_asof_attribution(spark, tiny_events_dir).collect()
    }
    assert got == {1: None, 3: 2, 5: 4}


def test_error_context_window_boundaries(spark, tiny_events_dir):
    got = {
        r["error_id"]: r["n_context_events"]
        for r in timeseries.events_error_context(spark, tiny_events_dir).collect()
    }
    # qualifying: event 11 (exactly 5 min) and 14 (1s prior)
    assert got == {10: 2}


def test_length_quantiles_rank_selected(spark, sf_dir):
    """Quantile values are actual data elements and p50 ≤ p90 ≤ p99."""
    for r in textops.text_length_quantiles(spark, sf_dir).collect():
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n_docs"] > 0
