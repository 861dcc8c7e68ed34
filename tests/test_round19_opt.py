"""Round-19 optimization pins.

Same contract as tests/test_round18_opt.py: every plan restructure this
round gets a row-level equivalence pin against the original
formulation (the oracle gate additionally re-proves each touched entry
end-to-end at three scale factors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity as S,
)

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_recall_report_single_job_matches_per_leg(spark):
    """The single-job recall report (one truth relation, four chained
    broadcast hit joins, stack()) emits exactly the rows of the r18
    per-leg form (checkpointed truth, one join + aggregate per family,
    unionByName) — the equivalence the barrier removal rests on."""
    got = _rows(S.ann_recall_report(spark, SF))

    # reference: the r18 per-leg construction, built from the same
    # helpers the entry uses
    qrows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(S.RECALL_QUERIES)
        .collect()
    )
    ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    emat = np.array([list(r["embedding"]) for r in qrows], dtype=np.float64)
    qmat = np.floor(emat * S.CENTROID_Q).astype(np.int64)
    queries_local = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, emat)],
        schema="vec_id long, embedding array<double>",
    )
    truth = S._sampled_bruteforce_truth(
        spark, SF, query_rows=queries_local
    ).localCheckpoint(eager=True)
    parts = []
    for name, fn in S._FAMILY_TOPK_FOR_QUERIES.items():
        approx = (
            fn(spark, SF, ids, qmat)
            .select("vec_id", "neighbor_id")
            .withColumn("_hit", F.lit(1))
        )
        joined = truth.join(
            F.broadcast(approx), ["vec_id", "neighbor_id"], "left"
        )
        parts.append(
            joined.agg(
                F.count(F.lit(1)).cast("long").alias("n_truth"),
                F.count("_hit").cast("long").alias("n_hit"),
            )
            .withColumn("family", F.lit(name))
            .selectExpr(
                "family",
                "n_truth",
                "n_hit",
                "CAST(1000000 * n_hit DIV n_truth AS BIGINT) AS recall_ppm",
            )
        )
    ref = parts[0]
    for p in parts[1:]:
        ref = ref.unionByName(p)
    assert got == _rows(ref)
    # the hit-flag joins must not multiply truth rows: every family's
    # n_truth equals the truth-table count
    n_truth = truth.count()
    assert all(r[1] == n_truth for r in got)
