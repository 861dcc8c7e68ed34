"""Measure the identity-collapse win on duplicate-heavy corpora.

Builds synthetic corpora with a growing exact-duplicate class (the
web-scale shape: one boilerplate page duplicated d times among n
distinct documents) and times `dedup_minhash_lsh`'s candidate
generation + verification in two formulations:

  * r5 (uncollapsed): every duplicate lands in the same LSH bucket —
    the bucket pair generator emits d(d-1)/2 pairs in ONE task and the
    shingle verification joins run behind each pair;
  * r6 (collapsed): `_identity_groups` collapses the class to one
    representative before signing; identical-doc pairs come back from
    the group expansion with Jaccard 1.0, no verification.

Output rows are identical (asserted). Results go to stdout; the
committed summary lives in SCALE.md.

Usage: python tools/skew_study.py [dup_sizes...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (  # noqa: E402
    dedup,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.session import (  # noqa: E402
    get_spark,
)

N_DISTINCT = 2000
DUP_TEXT = "the quick brown fox jumps over the lazy dog again and again today"


def _docs(spark, n_dup: int):
    rows = [(i, f"distinct document number {i} talks about topic {i % 97} "
                f"and subject {i % 53} in some detail") for i in range(N_DISTINCT)]
    rows += [(N_DISTINCT + i, DUP_TEXT) for i in range(n_dup)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uncollapsed(docs, sh):
    """The round-5 formulation, reconstructed for comparison."""
    cands = dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("sb"))
    jac = F.col("common_shingles").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("common_shingles")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= dedup.NEAR_DUP_JACCARD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _collapsed(docs, sh):
    reps, members = dedup._identity_groups(docs)
    cands = dedup.lsh_candidate_pairs(dedup.minhash_signatures(reps))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("sb"))
    jac = F.col("common_shingles").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("common_shingles")
    )
    rep_pairs = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= dedup.NEAR_DUP_JACCARD)
        .select("doc_a", "doc_b", "jaccard")
    )
    cross = dedup._expand_rep_pairs(rep_pairs, members, "jaccard")
    dup_members = members.join(
        sizes.select(F.col("doc_id").alias("rep")), "rep", "left_semi"
    )
    within = dedup._within_group_pairs(dup_members, F.lit(1.0).alias("jaccard"))
    return cross.unionByName(within)


def main() -> None:
    dup_sizes = [int(x) for x in sys.argv[1:]] or [100, 500, 2000, 5000]
    spark = get_spark("skew-study")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'dup_class':>9} {'r5_sec':>8} {'r6_sec':>8} {'speedup':>8} {'pairs':>10}")
    for d in dup_sizes:
        docs = _docs(spark, d).persist()
        docs.count()
        sh = dedup.shingles(docs).persist()
        sh.count()
        t0 = time.time()
        n5 = _uncollapsed(docs, sh).count()
        t5 = time.time() - t0
        t0 = time.time()
        n6 = _collapsed(docs, sh).count()
        t6 = time.time() - t0
        assert n5 == n6, f"output mismatch: {n5} vs {n6}"
        print(f"{d:>9} {t5:>8.2f} {t6:>8.2f} {t5 / t6:>7.1f}x {n6:>10}")
        docs.unpersist()
        sh.unpersist()


if __name__ == "__main__":
    main()
