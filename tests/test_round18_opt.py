"""Round-18 optimization pins.

The optimization round restructures plans without changing what any
entry computes. Each restructure gets a row-level equivalence pin here
against the original per-leg formulation (the oracle gate additionally
re-proves every touched entry end-to-end at three scale factors).
"""

from __future__ import annotations

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    layout,
)

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_multi_layout_envelopes_match_per_leg(spark):
    """The single-scan multi-layout envelope aggregation is row-level
    identical to running each layout's own bucketing + envelope pass —
    the equivalence the cluster-quality and prune-probe rewrites rest
    on (bucket ids, counts and min/max per dimension all bit-equal)."""
    ev = load_table(spark, SF, "events")
    combined = layout._multi_layout_envelopes(spark, SF)
    legs = {
        "hour": layout.hour_bucketed(ev),
        "morton": layout.zorder_bucketed(ev),
        "hilbert": layout.hilbert_bucketed(ev),
        "morton_scaled": layout.zorder_scaled_bucketed(ev),
    }
    for name, bucketed in legs.items():
        got = _rows(
            combined.filter(combined["layout"] == name).drop("layout")
        )
        want = _rows(layout._envelopes_counted(bucketed))
        assert got == want, f"envelope mismatch for layout {name}"


def test_cluster_quality_matches_per_leg_form(spark):
    """The grouped-by-layout quality report equals the original
    union-of-four-legs report row for row."""
    ev = load_table(spark, SF, "events")
    got = _rows(layout.layout_cluster_quality(spark, SF))
    parts = [
        layout._quality(layout._envelopes(layout.hour_bucketed(ev)), "hour"),
        layout._quality(
            layout._envelopes(layout.zorder_bucketed(ev)), "morton"
        ),
        layout._quality(
            layout._envelopes(layout.hilbert_bucketed(ev)), "hilbert"
        ),
        layout._quality(
            layout._envelopes(layout.zorder_scaled_bucketed(ev)),
            "morton_scaled",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    want = _rows(out.select(*layout._QUALITY_COLS))
    assert got == want
