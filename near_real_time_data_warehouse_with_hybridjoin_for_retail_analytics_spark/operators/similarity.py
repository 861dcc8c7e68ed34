"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Two implementations of top-k cosine neighbors:

  bruteforce   exact: cross join + fold-based cosine + per-query window.
               O(n²·d) — the correctness baseline and fine up to ~10⁵
               vectors per partition-pair.
  lsh          random-hyperplane LSH: vectors bucket by the sign
               pattern of h projections; candidates come only from the
               same bucket (multi-table to recover recall). The 100 TB
               path: buckets shard the quadratic work, and each table
               is one shuffle on a short bucket key.

Scores are double arithmetic over float inputs — cross-engine bitwise
equality is not guaranteed, so oracle-checked output is (query, rank,
neighbor) ids only; ranks use neighbor-id tiebreaks.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.vectors import cosine, dot
from ..plans.registry import query

TOP_K = 3
# Random-hyperplane LSH: L tables × h hyperplanes (2^h buckets/table).
# Tuned for noisy low-cosine neighbors (testdata tops out ≈0.46): short
# 4-bit signatures keep per-table collision probability usable, more
# tables recover recall. Real corpora with tighter clusters would use
# longer signatures and fewer tables.
LSH_TABLES = 8
LSH_HYPERPLANES = 4
EMB_DIM = 64

_rng = random.Random(1234)
# Deterministic hyperplanes, generated once at import (driver-side
# constants; they travel to executors as literals in the plan).
_PLANES: list[list[list[float]]] = [
    [[_rng.gauss(0.0, 1.0) for _ in range(EMB_DIM)] for _ in range(LSH_HYPERPLANES)]
    for _ in range(LSH_TABLES)
]


@query(
    "ann_topk_bruteforce",
    f"""
    SELECT vec_id, rank, neighbor_id FROM (
      SELECT a.vec_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                        b.vec_id) AS INT) AS rank,
             b.vec_id AS neighbor_id
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ) WHERE rank <= {TOP_K}
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for every vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("ea"), F.col("eb")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", "neighbor_id")
    )


def _bucket(embedding_col, table_idx: int):
    """Sign-pattern bucket id of a vector in one LSH table."""
    bucket = F.lit(0)
    for j in range(LSH_HYPERPLANES):
        plane = F.array(*[F.lit(v) for v in _PLANES[table_idx][j]])
        bit = F.when(dot(embedding_col, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


@query("ann_topk_lsh")  # rows-only: approximate recall by construction
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: union candidates from L tables'
    sign-pattern buckets, rank within candidates. Returns (vec_id, rank,
    neighbor_id, sim)."""
    emb = load_table(spark, sf_dir, "embeddings")

    tables = []
    for t in range(LSH_TABLES):
        tables.append(
            emb.select(
                "vec_id",
                "embedding",
                F.lit(t).alias("tbl"),
                _bucket(F.col("embedding"), t).alias("bucket"),
            )
        )
    buckets = tables[0]
    for t in tables[1:]:
        buckets = buckets.unionByName(t)

    a = buckets.select("tbl", "bucket", F.col("vec_id"), F.col("embedding").alias("ea"))
    b = buckets.select(
        "tbl", "bucket", F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb")
    )
    cands = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", "ea", "eb")
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("sim", cosine(F.col("ea"), F.col("eb")))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", "neighbor_id", "sim")
    )
