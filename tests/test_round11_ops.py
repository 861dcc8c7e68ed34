"""Round-11 curation additions: balanced shard planning and the
cross-split near-dup leakage report.

Shard plan: the Spark two-level-rank serpentine must equal a direct
Python replay of the oracle's global rule (global sort by tokens desc,
serpentine lanes), and the resulting token loads must be meaningfully
balanced (spread gate, plus never worse than the naive hash-modulo
assignment it replaces).

Split leakage: per modality the split-pair counts must partition the
full pair set (sum over boundaries == |pairs|), and every count must
equal a Python replay joining the registered pair entries with the
registered split assignment.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    curation,
    multimodal,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.dedup import (
    dedup_simhash,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.sampling import (
    sample_split_assign,
)

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    return {
        r["doc_id"]: len(re.split(r"\s+", r["text"].strip()))
        for r in rows
    }


def _serpentine_replay(tokens: dict[int, int]) -> dict[int, tuple[int, int]]:
    n = curation.N_SHARDS
    order = sorted(tokens, key=lambda d: (-tokens[d], d))
    loads: dict[int, list[int]] = defaultdict(list)
    for r, d in enumerate(order):
        k = r % (2 * n)
        shard = k if k < n else 2 * n - 1 - k
        loads[shard].append(tokens[d])
    return {s: (len(v), sum(v)) for s, v in loads.items()}


def test_shard_plan_matches_replay(spark):
    tokens = _doc_tokens(spark)
    expected = _serpentine_replay(tokens)
    got = {
        r["shard"]: (r["n_docs"], r["shard_tokens"])
        for r in curation.curation_shard_plan(spark, SF).collect()
    }
    assert got == expected


def test_shard_plan_is_balanced(spark):
    tokens = _doc_tokens(spark)
    serp = [t for _, t in _serpentine_replay(tokens).values()]
    mean = sum(serp) / len(serp)
    assert (max(serp) - min(serp)) / mean < 0.2  # tight, real balance
    # ... and never worse than naive doc_id-modulo sharding
    naive: Counter = Counter()
    for d, t in tokens.items():
        naive[d % curation.N_SHARDS] += t
    assert max(serp) - min(serp) <= max(naive.values()) - min(naive.values())


def _split_map(spark):
    return {
        r["doc_id"]: r["split"]
        for r in sample_split_assign(spark, SF).collect()
    }


def test_split_leakage_matches_replay(spark):
    splits = _split_map(spark)
    pairs = {
        "near_simhash": [
            (r["doc_a"], r["doc_b"])
            for r in dedup_simhash(spark, SF).collect()
        ],
        "near_phash": [
            (r["doc_a"], r["doc_b"])
            for r in multimodal.dedup_phash(spark, SF).collect()
        ],
    }
    expected: Counter = Counter()
    for modality, ps in pairs.items():
        for a, b in ps:
            sa, sb = sorted((splits[a], splits[b]))
            expected[(modality, sa, sb)] += 1
    got = {
        (r["modality"], r["split_a"], r["split_b"]): r["n_pairs"]
        for r in curation.curation_split_leakage(spark, SF).collect()
    }
    assert got == dict(expected)
    for modality, ps in pairs.items():  # boundary counts partition pairs
        assert sum(
            v for (m, _, _), v in got.items() if m == modality
        ) == len(ps)


def test_compaction_plan_invariants(spark):
    """Fill/overflow + adjacency invariants of the compaction plan:
    every group except possibly the last reaches the target before the
    NEXT group starts (a group closes only because its last file
    crossed the boundary), no group exceeds target by a whole file,
    hour ranges are disjoint and time-ordered by group_id, and totals
    partition the inventory."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        layout,
    )

    sf = "/root/testdata/sf0.01"
    rows = sorted(
        (r["group_id"], r["n_files"], r["n_rows"], r["hour_min"], r["hour_max"])
        for r in layout.layout_compaction_plan(spark, sf).collect()
    )
    total = load_table(spark, sf, "events").count()
    assert sum(r[2] for r in rows) == total
    t = layout.COMPACT_TARGET_ROWS
    # disjoint, ordered hour ranges
    for (g1, _, _, _, hmax1), (g2, _, _, hmin2, _) in zip(rows, rows[1:]):
        assert g2 > g1 and hmin2 > hmax1
    # cumulative boundaries: group g starts at cum row index g*t, so
    # each group's rows span [g*t_start, next_start) with start told by
    # the rule itself; sizes stay within (0, t + max_file)
    cum = 0
    for g, _, n, _, _ in rows:
        assert g == cum // t  # the group id IS the rule applied
        cum += n


def test_cluster_split_closes_leakage(spark):
    """The dedup-aware split: (a) every multimodal component moves as a
    unit — no pair the component graph knows can straddle a boundary,
    so phash-modality leakage recomputed under cluster splits is ZERO;
    (b) singleton components keep exactly their doc-id split (same
    salt), so only duplication-affected docs migrate."""
    from collections import Counter

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.clusters import (
        dedup_multimodal_components,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.sampling import (
        sample_split_by_cluster,
    )

    comp = {
        r["doc_id"]: r["component_id"]
        for r in dedup_multimodal_components(spark, SF).collect()
    }
    csplit = {
        r["doc_id"]: r["split"]
        for r in sample_split_by_cluster(spark, SF).collect()
    }
    assert set(csplit) == set(comp)
    # (a) components are split-atomic → image near-dup leakage is zero
    by_comp = Counter(comp.values())
    for d, c in comp.items():
        assert csplit[d] == csplit[c]  # same split as the canonical doc
    for r in multimodal.dedup_phash(spark, SF).collect():
        assert csplit[r["doc_a"]] == csplit[r["doc_b"]]
    # (b) singletons agree with the doc-id split
    dsplit = _split_map(spark)
    singles = [d for d, c in comp.items() if by_comp[c] == 1]
    assert singles  # the property is exercised
    for d in singles:
        assert csplit[d] == dsplit[d]


def test_synthesized_csv_dates_survive_etl(spark, tmp_path):
    """Round-11 regression pin: the synthesized master CSVs must carry
    date strings the ETL's multi-format parser accepts. Before the fix
    o_orderdate's timestamp string form ('... 00:00:00') failed to
    parse, every fact fell back to the 1900 sentinel, the date-dim
    join dropped all rows, and the warehouse-twin baseline was timed
    returning empty results."""
    import os

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.etl.dimensions import (
        build_customer_dim,
        split_product_master,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        hybrid_join as hj,
    )
    from tools.bench_warehouse import synthesize_master_csvs

    work = str(tmp_path / "wh")
    os.makedirs(work)
    synthesize_master_csvs(spark, SF, work)
    raw = spark.read.option("header", True).csv(os.path.join(work, "tx.csv"))
    customer = build_customer_dim(spark, os.path.join(work, "customer.csv"))
    product, _, _ = split_product_master(
        spark, os.path.join(work, "product.csv")
    )
    fact, _n, _cleanup = hj.assign_sales_ids(
        hj.enrich(hj.normalize_stream(raw), customer, product), offset=0
    )
    lo, hi, n_sentinel = fact.selectExpr(
        "min(date_id)",
        "max(date_id)",
        "sum(CASE WHEN date_id = 19000101 THEN 1 ELSE 0 END)",
    ).first()
    assert n_sentinel == 0  # no date fell back
    assert 19900101 < lo <= hi < 20100101  # real testdata years


def test_token_drift_matches_replay_and_detects_injection(spark, tmp_path):
    """(a) The operator equals an exact Python replay of the bucket
    counts and smoothed llr on a synthetic corpus; (b) flooding the
    INCOMING slice with a novel token drives its bucket's llr positive.
    (Hashed buckets collide by design — the replay, not a per-token
    argument, is the ground truth.)"""
    import hashlib
    import math

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.textops import (
        text_token_drift,
    )

    base_tokens = [f"tok{i}" for i in range(40)]
    base = " ".join(base_tokens)
    flood = " ".join(["zzzflood"] * 200)
    rows = [(i, base) for i in range(80)]
    rows += [(100, flood)] + [(101 + i, base) for i in range(19)]
    root = tmp_path / "drift"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/documents.parquet")

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

    w = int(119 * 0.8)
    n_ref = [0] * 64
    n_inc = [0] * 64
    for doc_id, text in rows:
        side = n_ref if doc_id < w else n_inc
        for tok in text.split():
            side[bucket(tok)] += 1
    tr, ti = sum(n_ref), sum(n_inc)
    exp = {
        b: (
            n_ref[b],
            n_inc[b],
            math.log((n_inc[b] + 1) / (ti + 64))
            - math.log((n_ref[b] + 1) / (tr + 64)),
        )
        for b in range(64)
    }
    got = {
        r["bucket"]: (r["n_ref"], r["n_inc"], r["llr"])
        for r in text_token_drift(spark, str(root)).collect()
    }
    assert set(got) == set(exp)
    for b in range(64):
        assert got[b][:2] == exp[b][:2]
        assert abs(got[b][2] - exp[b][2]) < 1e-6
    assert got[bucket("zzzflood")][2] > 0  # injection detected
