"""Skewed-bucket property tests for the identity-collapse in the LSH
dedup family (round-5 verdict item 3).

A corpus dominated by one exact-duplicate class used to detonate inside
a single LSH bucket task: identical texts share every band key, so one
``collect_list`` row held the whole class and emitted b(b-1)/2 pairs in
one task, with a shingle-verification join behind each pair. After the
collapse, LSH only sees distinct texts — these tests pin that down by
(a) asserting the candidate generator emits O(distinct) pairs on a
duplicate-heavy corpus while the final output still carries every
identical pair at its exact score, and (b) oracle-checking the
collapsed operators on the synthetic corpus via DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    dedup,
)

N_DUP = 300  # one exact-duplicate class big enough to be a bucket bomb
DUP_TEXT = "the quick brown fox jumps over the lazy dog again and again"
NEAR_A = "spark executes declarative plans over columnar batches fast"
NEAR_B = "spark executes declarative plans over columnar batches quickly"
SHORT = "too short"  # < 3 tokens → no shingles → must never pair


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("skewcorpus")
    rows = [(i, DUP_TEXT) for i in range(N_DUP)]
    rows += [
        (N_DUP, NEAR_A),
        (N_DUP + 1, NEAR_B),
        (N_DUP + 2, SHORT),
        (N_DUP + 3, SHORT),
        (N_DUP + 4, None),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/documents.parquet")
    return str(root)


def test_candidates_scale_with_distinct_not_corpus(spark, skew_dir):
    """The pair generator must never materialize the duplicate class's
    quadratic pair set — candidates are rep-level only."""
    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    reps, members = dedup._identity_groups(docs)
    assert reps.count() == 4  # DUP_TEXT, NEAR_A, NEAR_B, SHORT
    cands = dedup.lsh_candidate_pairs(dedup.minhash_signatures(reps))
    n_cand = cands.count()
    # ≤ distinct²/2 = 6, and in particular nowhere near N_DUP² ≈ 45k
    assert n_cand <= 6


def test_minhash_output_complete_on_duplicate_heavy_corpus(spark, skew_dir):
    out = dedup.dedup_minhash_lsh(spark, skew_dir)
    ident = out.filter(
        (F.col("doc_a") < N_DUP) & (F.col("doc_b") < N_DUP)
    )
    n_pairs = N_DUP * (N_DUP - 1) // 2
    assert ident.count() == n_pairs
    assert ident.filter(F.col("jaccard") != 1.0).count() == 0
    # the short identical pair has no shingles → must NOT appear
    short_ids = {N_DUP + 2, N_DUP + 3}
    leaked = out.filter(
        F.col("doc_a").isin(short_ids) | F.col("doc_b").isin(short_ids)
    )
    assert leaked.count() == 0
    # distinct output pairs (no duplicates from the expansion)
    assert out.count() == out.select("doc_a", "doc_b").distinct().count()


def test_simhash_within_group_hamming_zero(spark, skew_dir):
    out = dedup.dedup_simhash(spark, skew_dir)
    ident = out.filter(
        (F.col("doc_a") < N_DUP) & (F.col("doc_b") < N_DUP)
    )
    assert ident.count() == N_DUP * (N_DUP - 1) // 2
    assert ident.filter(F.col("hamming") != 0).count() == 0
    # identical short texts DO simhash (every non-null text signs)
    short_pair = out.filter(
        (F.col("doc_a") == N_DUP + 2) & (F.col("doc_b") == N_DUP + 3)
    ).collect()
    assert len(short_pair) == 1 and short_pair[0].hamming == 0


def _duck_oracle(name: str, skew_dir: str):
    import __spark_entry__ as e

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{skew_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(e.oracle_sql()[name]).fetchall()


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_simhash"])
def test_oracle_match_on_skew_corpus(spark, skew_dir, name):
    """The collapse must not change output: DuckDB replays the
    UNCOLLAPSED oracle pipeline on the same corpus and must agree
    row-for-row."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
        registry,
    )

    got = {
        tuple(r)
        for r in registry.QUERIES[name](spark, skew_dir)
        .select("doc_a", "doc_b")
        .collect()
    }
    want = {(r[0], r[1]) for r in _duck_oracle(name, skew_dir)}
    assert got == want
