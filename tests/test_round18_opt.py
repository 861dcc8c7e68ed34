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


def test_probe_filtered_family_plans_match_full_entries(spark):
    """The recall report's probe-filtered family mirrors return exactly
    the rows the FULL registered family plans return for the query ids
    (vec_id, rank, neighbor_id — rank included, so candidate sets and
    tie-breaks are pinned, not just membership)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (  # noqa: E501
        similarity as sim,
    )

    import numpy as np

    qrows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(sim.RECALL_QUERIES)
        .collect()
    )
    ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    emat = np.array([list(r["embedding"]) for r in qrows], dtype=np.float64)
    qmat = np.floor(emat * sim.CENTROID_Q).astype(np.int64)
    qids = spark.createDataFrame(
        [(int(i),) for i in ids], schema="vec_id long"
    )
    # the driver-side grid quantization must equal the executor UDF's
    grid = sorted(
        tuple(r)
        for r in sim.quantized_embeddings(spark, SF)
        .join(F.broadcast(qids), "vec_id", "left_semi")
        .collect()
    )
    assert grid == sorted(
        (int(i), [int(x) for x in row]) for i, row in zip(ids, qmat)
    ), "driver-side quantization diverges from quantize_embedding_col"

    fulls = {
        "lsh": sim.ann_topk_lsh,
        "ivf": sim.ann_topk_ivf,
        "pca": sim.ann_topk_pca,
        "ivfpq": sim.ann_topk_ivfpq,
    }
    for name, filtered_fn in sim._FAMILY_TOPK_FOR_QUERIES.items():
        want = _rows(
            fulls[name](spark, SF).join(
                F.broadcast(qids), "vec_id", "left_semi"
            )
        )
        got = _rows(filtered_fn(spark, SF, ids, qmat))
        assert got == want, f"probe-filtered {name} diverges from full plan"
        assert len(got) > 0, f"probe-filtered {name} returned no rows"
