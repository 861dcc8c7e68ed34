"""Invariant tests for the round-3 operator additions: ordered event
funnels, cohort retention, temperature-scaled mixture weights,
embedding norm statistics, and the active-subgraph connected-components
fast path.

The oracle gate value-checks each against DuckDB at sf0.01; these pin
the semantic laws at smoke scale so a refactor that keeps the SQL twin
in sync but breaks the semantics still fails.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    clusters,
    curation,
    funnels,
    similarity,
)


# ---------------------------------------------------------------------------
# events_funnel
# ---------------------------------------------------------------------------
def test_funnel_stage_counts_monotone_and_times_ordered(spark, sf_dir):
    rows = funnels.events_funnel(spark, sf_dir).collect()
    n_view = sum(r.view_us is not None for r in rows)
    n_click = sum(r.click_us is not None for r in rows)
    n_buy = sum(r.purchase_us is not None for r in rows)
    assert n_view >= n_click >= n_buy
    assert n_view > 0  # smoke data reaches stage 1
    for r in rows:
        # a stage is reached only if the previous one was, strictly later
        if r.click_us is not None:
            assert r.view_us is not None and r.click_us > r.view_us
        if r.purchase_us is not None:
            assert r.click_us is not None and r.purchase_us > r.click_us


def test_funnel_covers_every_user_once(spark, sf_dir):
    out = funnels.events_funnel(spark, sf_dir)
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert out.count() == n_users
    assert out.select("user_id").distinct().count() == n_users


def test_funnel_hand_recomputed_for_one_user(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    out = {r.user_id: r for r in funnels.events_funnel(spark, sf_dir).collect()}
    # recompute the ordered funnel in plain python for every user
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rows in by_user.items():
        views = [r.us for r in rows if r.event_type == "view"]
        t1 = min(views) if views else None
        t2 = None
        if t1 is not None:
            clicks = [r.us for r in rows if r.event_type == "click" and r.us > t1]
            t2 = min(clicks) if clicks else None
        t3 = None
        if t2 is not None:
            buys = [r.us for r in rows if r.event_type == "purchase" and r.us > t2]
            t3 = min(buys) if buys else None
        got = out[uid]
        assert (got.view_us, got.click_us, got.purchase_us) == (t1, t2, t3), uid


# ---------------------------------------------------------------------------
# events_retention
# ---------------------------------------------------------------------------
def test_retention_day_zero_equals_cohort_size(spark, sf_dir):
    ret = {
        (r.cohort_day, r.day_offset): r.n_active_users
        for r in funnels.events_retention(spark, sf_dir).collect()
    }
    assert all(off >= 0 for (_, off) in ret)
    # day-0 cell is the cohort size (every member is active on its first day)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    cohorts = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for c in cohorts:
        assert ret[(c.cohort_day, 0)] == c.n, c.cohort_day
    # no retention cell can exceed its cohort size
    sizes = {c.cohort_day: c.n for c in cohorts}
    for (day, _), n in ret.items():
        assert n <= sizes[day]


# ---------------------------------------------------------------------------
# curation_temperature_mix
# ---------------------------------------------------------------------------
def test_temperature_mix_flattens_toward_uniform(spark, sf_dir):
    rows = curation.curation_temperature_mix(spark, sf_dir).collect()
    assert math.isclose(sum(r.mix_weight for r in rows), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(r.natural_share for r in rows), 1.0, rel_tol=1e-9)
    mean_share = 1.0 / len(rows)
    for r in rows:
        # sqrt temperature pulls every weight toward the mean:
        # below-average sources gain, above-average sources shrink
        if r.natural_share < mean_share * 0.95:
            assert r.mix_weight > r.natural_share, r.source
        if r.natural_share > mean_share * 1.05:
            assert r.mix_weight < r.natural_share, r.source
        assert r.budget_tokens <= curation.MIX_TOKEN_BUDGET
        assert r.budget_tokens == math.floor(
            r.mix_weight * curation.MIX_TOKEN_BUDGET
        )
    assert (
        sum(r.budget_tokens for r in rows) <= curation.MIX_TOKEN_BUDGET
    )  # floors never over-allocate


# ---------------------------------------------------------------------------
# embedding_norm_stats
# ---------------------------------------------------------------------------
def test_norm_stats_bounds_and_hand_recompute(spark, sf_dir):
    stats = {r.label: r for r in similarity.embedding_norm_stats(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[str, list[int]] = {}
    for r in emb:
        q2 = sum(
            math.floor(v * similarity.CENTROID_Q) ** 2 for v in r.embedding
        )
        by_label.setdefault(r.label, []).append(q2)
    assert set(stats) == set(by_label)
    for label, q2s in by_label.items():
        s = stats[label]
        assert s.n_vectors == len(q2s)
        assert s.min_norm2_q == min(q2s)
        assert s.max_norm2_q == max(q2s)
        assert s.mean_norm2 == sum(q2s) / (len(q2s) * float(similarity.CENTROID_Q) ** 2)
        assert s.min_norm2_q <= s.max_norm2_q


# ---------------------------------------------------------------------------
# connected components: active-subgraph fast path
# ---------------------------------------------------------------------------
def test_components_isolated_nodes_are_singletons(spark):
    nodes = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], ["src", "dst"]
    )  # nodes 3,4,7,8,9 isolated
    out = {
        r.doc_id: r.component_id
        for r in clusters.connected_components(nodes, edges).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}


def test_components_chain_converges_via_pointer_jumping(spark):
    n = 33  # one long chain: worst case for plain propagation
    nodes = spark.range(0, n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["src", "dst"]
    )
    # local_limit=0 forces the distributed loop — this test exists to
    # pin the pointer-jumping round bound, not the small-graph fallback.
    out = clusters.connected_components(
        nodes, edges, max_rounds=12, local_limit=0
    ).collect()
    assert all(r.component_id == 0 for r in out)
    assert len(out) == n


def test_components_local_matches_distributed(spark):
    """The driver-side union-find fallback and the distributed loop are
    the same function: identical labels on a graph with chains, a
    triangle, stray endpoints outside nodes, and isolated nodes."""
    nodes = spark.range(0, 12).selectExpr("id AS doc_id")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 5), (5, 3), (7, 6), (9, 20)],
        ["src", "dst"],
    )  # 20 is a stray endpoint outside nodes; 8, 10, 11 isolated
    local = {
        r.doc_id: r.component_id
        for r in clusters.connected_components(nodes, edges).collect()
    }
    dist = {
        r.doc_id: r.component_id
        for r in clusters.connected_components(
            nodes, edges, local_limit=0
        ).collect()
    }
    assert local == dist
    assert local[2] == 0 and local[5] == 3 and local[6] == 6
    assert local[8] == 8 and local[9] == 9
