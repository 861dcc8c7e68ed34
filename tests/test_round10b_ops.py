"""Round-10 additions, second wave: systematic PPS sampling, hourly
gap-fill with integer LOCF, BM25 ranking, and shingle containment.
Semantic invariants only — engine-vs-oracle value equality is the
driver gate's job (tools/check_correctness.py replays it locally)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    dedup,
    sampling,
    textops,
    timeseries,
)


# ---------------------------------------------------------------------------
# sample_weighted_pps
# ---------------------------------------------------------------------------


def test_pps_sample_size_and_determinism(spark, sf_dir):
    rows = sorted(
        (r.doc_id, r.n_chars)
        for r in sampling.sample_weighted_pps(spark, sf_dir).collect()
    )
    again = sorted(
        (r.doc_id, r.n_chars)
        for r in sampling.sample_weighted_pps(spark, sf_dir).collect()
    )
    assert rows == again  # hash-keyed, no RNG: reruns are identical
    # systematic PPS picks between K and K + (#docs with w >= stride)
    # rows; with the testdata's weight spread it lands on ~K exactly
    assert 1 <= len(rows) <= 2 * sampling.PPS_K


def test_pps_heavy_doc_always_picked(spark, sf_dir):
    """Any doc whose weight covers >= one full stride total/K crosses a
    multiple of the stride no matter where it lands — certain pick."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    heavy = {
        r.doc_id
        for r in docs.filter(
            F.col("n_chars") * sampling.PPS_K >= total
        ).collect()
    }
    picked = {
        r.doc_id for r in sampling.sample_weighted_pps(spark, sf_dir).collect()
    }
    assert heavy <= picked


def test_pps_two_level_prefix_sum_matches_global(spark, sf_dir):
    """The bucketed cum (offset + within-bucket) must equal the single
    global running sum the oracle states — recompute the global cumsum
    in pandas over the same (md5, doc_id) order and compare pick sets."""
    import hashlib

    pdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .toPandas()
    )
    pdf["h"] = pdf.doc_id.map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    pdf = pdf.sort_values(["h", "doc_id"]).reset_index(drop=True)
    pdf["cum"] = pdf.n_chars.cumsum()
    total = int(pdf.n_chars.sum())
    k = sampling.PPS_K
    expect = {
        int(r.doc_id)
        for r in pdf.itertuples()
        if (r.cum * k) // total > ((r.cum - r.n_chars) * k) // total
    }
    got = {
        r.doc_id for r in sampling.sample_weighted_pps(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# events_gapfill
# ---------------------------------------------------------------------------


def test_gapfill_axis_is_dense(spark, sf_dir):
    out = timeseries.events_gapfill(spark, sf_dir)
    span = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("rows"),
        (
            (
                F.unix_timestamp(F.max("window_start"))
                - F.unix_timestamp(F.min("window_start"))
            )
            / 3600
            + 1
        ).cast("long").alias("hours"),
    )
    for r in span.collect():
        assert r.rows == r.hours  # one row per hour, no holes, no dups


def test_gapfill_locf_semantics(spark, sf_dir):
    rows = (
        timeseries.events_gapfill(spark, sf_dir)
        .orderBy("event_type", "window_start")
        .collect()
    )
    last_seen: dict[str, int] = {}
    for r in rows:
        if r.n_events > 0:
            assert r.hours_since_obs == 0
            assert r.carried == r.n_events
            last_seen[r.event_type] = r.n_events
        else:
            # gap rows carry the last observed count forward
            assert r.carried == last_seen[r.event_type]
            assert r.hours_since_obs >= 1
    # the first row per type is an observation by construction (span
    # min comes from the hourly aggregate), so last_seen never misses


# ---------------------------------------------------------------------------
# text_bm25
# ---------------------------------------------------------------------------


def test_bm25_topk_sorted_and_bounded(spark, sf_dir):
    rows = textops.text_bm25(spark, sf_dir).collect()
    assert 0 < len(rows) <= textops.BM25_TOPK
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms <= len(textops.BM25_TERMS) for r in rows)


def test_bm25_rare_term_dominates(spark, sf_dir):
    """'dup' is ~16x rarer than the other query terms, so its idf
    dominates: every doc containing it must outrank every doc that
    matches common terms only (scores differ by whole idf units)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup_docs = {
        r.doc_id
        for r in docs.filter(
            F.col("text").rlike(r"(^|\s)dup(\s|$)")
        ).collect()
    }
    if not dup_docs:  # sf0.001 slice may hold none
        return
    ranked = [
        r.doc_id
        for r in textops.text_bm25(spark, sf_dir)
        .orderBy(F.desc("score_micro"), "doc_id")
        .collect()
    ]
    in_ranked = [d for d in ranked if d in dup_docs]
    # all dup-docs in the top-k appear before any non-dup doc
    k = len(in_ranked)
    assert set(ranked[:k]) <= dup_docs | set(ranked[:k])
    if k and len(ranked) > k:
        assert ranked[:k] == in_ranked


# ---------------------------------------------------------------------------
# dedup_containment
# ---------------------------------------------------------------------------


def test_containment_bounds_jaccard(spark, sf_dir):
    """min(|A|,|B|) <= |A u B|, so containment >= jaccard always; both
    live in (0, 1]."""
    for r in dedup.dedup_containment(spark, sf_dir).collect():
        assert 0 < r.jaccard <= r.containment <= 1.0


def test_containment_catches_exact_dups(spark, sf_dir):
    """Identity pairs (same text) must surface with containment exactly
    1.0 — the degenerate superset."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.md5("text").alias("fp")
    )
    pairs = {
        (min(r.a, r.b), max(r.a, r.b))
        for r in fp.alias("x")
        .join(fp.alias("y"), "fp")
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup.dedup_containment(spark, sf_dir).collect()
    }
    for p in pairs:
        assert got.get(p) == 1.0
