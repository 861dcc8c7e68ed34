"""Round-12 operator gates: compaction EXECUTION (row identity, one
file per planned bin, zone-map pruning preserved), the ANN tombstone
stream's batch twin, the PNG-path perceptual hash, and the corpus
encoding assumption the byte-replay oracles rest on."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    layout,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Compaction execution
# ---------------------------------------------------------------------------
def _compacted(spark, tmp_path):
    dest = str(tmp_path / "compacted")
    layout.compact_events(spark, SF, dest)
    return spark.read.parquet(dest)


def test_compaction_preserves_row_set(spark, tmp_path):
    """OPTIMIZE must be a pure physical rewrite: the compacted dataset
    holds exactly the original rows (both exceptAll directions empty),
    modulo the group_id clustering column it adds."""
    before = load_table(spark, SF, "events")
    after = _compacted(spark, tmp_path).select(*before.columns)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0


def test_compaction_one_file_per_planned_bin(spark, tmp_path):
    """File count = the plan's bin count, one file per group — the
    small-file problem is actually gone, not re-sharded."""
    plan = {
        r["group_id"]: (r["n_rows"], r["hour_min"], r["hour_max"])
        for r in layout.layout_compaction_plan(spark, SF).collect()
    }
    got = {
        r["group_id"]: (r["n_rows"], r["hour_min"], r["hour_max"], r["nf"])
        for r in _compacted(spark, tmp_path)
        .select(
            F.col("group_id").cast("long").alias("group_id"),
            F.input_file_name().alias("file"),
            F.expr(f"unix_micros(ts) DIV {layout._US_PER_HOUR}").alias("hour"),
        )
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("hour").alias("hour_min"),
            F.max("hour").alias("hour_max"),
            F.countDistinct("file").alias("nf"),
        )
        .collect()
    }
    assert set(got) == set(plan)
    for gid, (n_rows, hmin, hmax) in plan.items():
        assert got[gid] == (n_rows, hmin, hmax, 1), gid


def test_compacted_zone_maps_prune(spark, tmp_path):
    """Time-adjacency pruning survives the rewrite: the per-file hour
    envelopes are pairwise DISJOINT and ordered by group id, so a
    point-hour predicate matches exactly one file's zone map — the
    property (narrow per-file envelopes) layout_zorder_events proves
    for the z-ordered layout holds for the compacted one too. (sf0.01:
    sf0.001 has fewer event rows than one target bin.)"""
    rows = sorted(
        (r["group_id"], r["hour_min"], r["hour_max"])
        for r in layout.layout_compaction_apply(
            spark, "/root/testdata/sf0.01"
        ).collect()
    )
    assert len(rows) > 1, "sf0.01 must plan multiple bins"
    for (_, _, prev_max), (_, cur_min, _) in zip(rows, rows[1:]):
        assert cur_min > prev_max, "hour envelopes must be disjoint+ordered"


def test_compaction_apply_is_idempotent(spark):
    """The registry entry overwrites its deterministic dest: a second
    run reports the identical inventory (bench runs it 3×)."""
    first = sorted(map(tuple, layout.layout_compaction_apply(spark, SF).collect()))
    again = sorted(map(tuple, layout.layout_compaction_apply(spark, SF).collect()))
    assert again == first


# ---------------------------------------------------------------------------
# Corpus encoding assumption behind the byte-replay oracles
# ---------------------------------------------------------------------------
def test_documents_text_is_ascii_everywhere():
    """The phash / decode-stats oracles replay payload BYTES with
    character-semantics SQL (length(text), ascii(substr(..)));
    Spark-side kernels hash UTF-8 bytes. The two agree iff the corpus
    is pure ASCII — pin that, at every committed scale factor, so the
    cross-engine hash gates cannot silently depend on encoding."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            f"""
            SELECT COUNT(*) FROM read_parquet(
              '/root/testdata/{sf}/documents.parquet')
            WHERE text IS NOT NULL
              AND (octet_length(encode(text)) != length(text)
                   OR regexp_matches(text, '[^\\x00-\\x7F]'))
            """
        ).fetchone()[0]
        assert n == 0, f"non-ASCII documents.text at {sf}"


# ---------------------------------------------------------------------------
# Data-card completion: leakage + shard balance folded into the report
# ---------------------------------------------------------------------------
def test_data_card_sections_match_source_entries(spark):
    """The folded-in card rows must agree with the standalone entries
    they summarize: leakage_* n_affected = curation_split_leakage's
    cross-boundary pair sums per modality, and shard_balance =
    max−min of curation_shard_plan's token loads."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        curation,
    )

    card = {
        r["modality"]: (r["n_affected"], r["affected_rate"])
        for r in curation.curation_dedup_report(spark, SF).collect()
    }
    assert set(card) >= {
        "exact", "near_simhash", "near_phash", "span",
        "leakage_simhash", "leakage_phash", "shard_balance",
    }
    leak = curation.curation_split_leakage(spark, SF).collect()
    for mod, key in (("near_simhash", "leakage_simhash"),
                     ("near_phash", "leakage_phash")):
        crossed = sum(
            r["n_pairs"] for r in leak
            if r["modality"] == mod and r["split_a"] != r["split_b"]
        )
        total = sum(r["n_pairs"] for r in leak if r["modality"] == mod)
        assert card[key][0] == crossed
        if total:
            assert abs(card[key][1] - crossed / total) < 1e-12
    loads = [
        r["shard_tokens"]
        for r in curation.curation_shard_plan(spark, SF).collect()
    ]
    span = max(loads) - min(loads)
    assert card["shard_balance"][0] == span
    assert abs(
        card["shard_balance"][1] - span / (sum(loads) / len(loads))
    ) < 1e-12


# ---------------------------------------------------------------------------
# ANN list compaction execution
# ---------------------------------------------------------------------------
def test_ann_compact_rewrites_exactly_the_live_ids(spark):
    """Each rewritten list holds exactly the live ids the pre-delete
    assignment gave it: no tombstone survives, no live id is lost, and
    un-flagged lists are untouched (absent from the rewrite)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        similarity,
    )

    worklist = {
        r["cluster"]
        for r in similarity.ann_index_delete(spark, SF).collect()
        if r["needs_compaction"]
    }
    got = {
        r["cluster"]: r["n_rows"]
        for r in similarity.ann_index_compact(spark, SF).collect()
    }
    assert set(got) == worklist
    # independent truth: probe assignments, filter live, per flagged list
    ncl, _ = similarity.derived_ivf_params(similarity.corpus_count(spark, SF))
    qe = similarity.quantized_embeddings(spark, SF)
    cents = similarity.coarse_quantizer(spark, SF, qe, ncl)
    home = F.element_at(similarity._probe_udf(cents, 1)(F.col("q")), 1)
    truth = {}
    rewritten = spark.read.parquet(similarity._ann_compact_dest(spark, SF))
    by_list = {
        r["cluster"]: set(r["ids"])
        for r in rewritten.groupBy("cluster")
        .agg(F.collect_set("vec_id").alias("ids"))
        .collect()
    }
    for r in qe.select("vec_id", home.alias("cluster")).collect():
        if r["cluster"] in worklist and r["vec_id"] % similarity.TOMBSTONE_MOD:
            truth.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert {int(c): ids for c, ids in by_list.items()} == truth
    assert got == {c: len(ids) for c, ids in truth.items()}


def test_ann_compact_is_idempotent(spark):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        similarity,
    )

    first = sorted(
        map(tuple, similarity.ann_index_compact(spark, SF).collect())
    )
    again = sorted(
        map(tuple, similarity.ann_index_compact(spark, SF).collect())
    )
    assert again == first


def _hot_hour_events(spark, tmp_path, hot_rows: int = 5000):
    """6 hourly ingest files, hour 3 hot (``hot_rows`` ≫ target):
    group 0 = hours 0..3 (120 + hot_rows rows — past the split bound),
    group ceil = hours 4..5 (80 rows, one file). Contiguous event_ids
    so the pmod split populates every residue class."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    for hour in range(6):
        n = hot_rows if hour == 3 else 40
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=hour, seconds=i % 3600),
                 eid % 97, "view", float(i), "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "events_src")
    df.write.mode("overwrite").parquet(f"{src}/events.parquet")
    return src, len(rows)


def test_compaction_hot_hour_splits_to_target_files(spark, tmp_path):
    """Skew boundary, CLOSED (round 14): a bin pushed past
    COMPACT_SPLIT_ROWS by a hot ingest hour no longer becomes one
    oversized file — it splits into ceil(n/TARGET) files of ≤ TARGET
    rows each via the map-side pmod(event_id, n_splits) rule (no
    within-hour window, no single-task sort). Pinned invariants: row
    identity, hot bin file count and per-file size bound, cold bins
    still exactly one file, per-GROUP hour envelopes disjoint and
    ordered."""
    src, n_total = _hot_hour_events(spark, tmp_path)
    dest = str(tmp_path / "compacted")
    layout.compact_events(spark, src, dest)
    back = spark.read.parquet(dest)
    assert back.count() == n_total
    per_file = (
        back.select(
            F.col("group_id").cast("long").alias("g"),
            F.input_file_name().alias("f"),
            F.expr(f"unix_micros(ts) DIV {layout._US_PER_HOUR}").alias("h"),
        )
        .groupBy("g", "f")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("h").alias("hmin"), F.max("h").alias("hmax"))
        .collect()
    )
    by_group: dict[int, list] = {}
    for r in per_file:
        by_group.setdefault(r["g"], []).append(r)
    hot = max(by_group, key=lambda g: sum(r["n"] for r in by_group[g]))
    n_hot = sum(r["n"] for r in by_group[hot])
    assert n_hot == 5120
    want_files = -(-n_hot // layout.COMPACT_TARGET_ROWS)  # ceil = 6
    assert len(by_group[hot]) == want_files
    for r in by_group[hot]:
        assert r["n"] <= layout.COMPACT_TARGET_ROWS  # ≈target, never 2×
    for g, files in by_group.items():
        if g != hot:
            assert len(files) == 1  # cold bins unchanged
    spans = sorted(
        (min(r["hmin"] for r in files), max(r["hmax"] for r in files))
        for files in by_group.values()
    )
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert c > b  # group envelopes disjoint, ordered


def test_compaction_apply_reports_split_file_count(spark, tmp_path):
    """The apply entry's n_files measures the split physically
    (input_file_name distinct == ceil(n/TARGET) for the hot bin) — the
    same quantity its DuckDB oracle replays as the populated-residue
    count."""
    src, _ = _hot_hour_events(spark, tmp_path)
    rows = {
        r["group_id"]: (r["n_files"], r["n_rows"])
        for r in layout.layout_compaction_apply(spark, src).collect()
    }
    hot_gid = max(rows, key=lambda g: rows[g][1])
    n_files, n_rows = rows[hot_gid]
    assert n_rows == 5120 and n_files == 6
    assert all(nf == 1 for g, (nf, _) in rows.items() if g != hot_gid)


def test_compaction_preserves_null_ts_rows(spark, tmp_path):
    """Row preservation includes NULL-ts rows: they key on the
    sentinel hour instead of being dropped by the hour equi-join
    (review finding, round 12)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 1, "view", 1.0, "{}"),
        (2, None, 2, "view", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 1), 3, "view", 3.0, "{}"),
        (4, None, 4, "click", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "null_src")
    df.write.mode("overwrite").parquet(f"{src}/events.parquet")
    dest = str(tmp_path / "null_compacted")
    layout.compact_events(spark, src, dest)
    back = spark.read.parquet(dest)
    assert back.count() == 4
    assert sorted(
        r["event_id"] for r in back.filter(F.col("ts").isNull()).collect()
    ) == [2, 4]


def test_ann_compact_empty_worklist_returns_empty(spark, monkeypatch):
    """When no list crosses the dead-fraction threshold (the expected
    100 TB regime: mean dead fraction 10% < 15%) the entry must return
    the empty inventory, not crash on an unreadable zero-row
    partitionBy dest (review finding, round 12)."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        similarity,
    )

    monkeypatch.setattr(similarity, "COMPACT_FRAC", 1.1)  # nothing flags
    out = similarity.ann_index_compact(spark, SF)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "cluster", "n_files", "n_rows",
    ]


# ---------------------------------------------------------------------------
# Known sf0.1-only ORACLE divergences (round-12 discovery; both oracle
# fixes LANDED in round 13 — pagerank's fwd CTE wrapped in SELECT
# DISTINCT, dsir zero normalized with + 0.0 on both sides — and both
# entries re-verified clean at sf0.1. These pins keep the root causes
# on record and guard against regression.)
# ---------------------------------------------------------------------------
def test_duckdb_recursive_union_quirk_repro():
    """ROOT CAUSE pin for the dedup_pagerank sf0.1 oracle divergence:
    DuckDB 1.0.0 gives plain UNION the semantics of UNION ALL for
    NON-recursive CTEs inside a WITH RECURSIVE block, so the oracle's
    `fwd` edge CTE keeps duplicate rows wherever an exact-dup pair is
    also a Jaccard pair (text long enough to shingle — present at
    sf0.1, absent at the driver-gated sf0.01/sf0.001), inflating
    outdeg and contributions. The Spark implementation is correct
    (see the replay test below). Fixed in r13: fwd is wrapped in an
    explicit SELECT DISTINCT, robust under either engine semantics."""
    import duckdb
    import pytest

    n = duckdb.sql(
        "WITH RECURSIVE a AS (SELECT 1 s), "
        "f AS (SELECT s FROM a UNION SELECT s FROM a) "
        "SELECT COUNT(*) FROM f"
    ).fetchone()[0]
    if n == 1:
        pytest.skip(
            "duckdb fixed the RECURSIVE-UNION quirk — re-check the "
            "pagerank oracle at sf0.1 and retire this pin"
        )
    assert n == 2  # the quirk, exactly as documented


def test_pagerank_spark_matches_python_replay_at_sf01():
    """The IMPLEMENTATION side of the divergence pin: at sf0.1 (where
    the DuckDB oracle diverges via the quirk above) the Spark ranks
    equal an independent pure-python replay of the integer recurrence
    over the real mined edge set — grid init, symmetrize, 4 rounds of
    teleport + 85·Σ(rank DIV outdeeg) DIV 100."""
    import collections

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        clusters,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.session import (
        get_spark,
    )

    spark = get_spark("tests")
    sf = "/root/testdata/sf0.1"
    fwd = [
        (r["src"], r["dst"])
        for r in clusters.near_dup_edges(spark, sf).collect()
    ]
    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    sym = fwd + [(b, a) for a, b in fwd]
    outdeg = collections.Counter(s for s, _ in sym)
    rank = {d: clusters.PR_GRID for d in docs}
    for _ in range(clusters.PR_ITERS):
        s: collections.Counter = collections.Counter()
        for a, b in sym:
            s[b] += rank[a] // outdeg[a]
        rank = {
            d: clusters._PR_TELEPORT + (85 * s.get(d, 0)) // 100
            for d in docs
        }
    got = {
        r["doc_id"]: r["pr_rank"]
        for r in clusters.dedup_pagerank(spark, sf).collect()
    }
    assert got == rank


def test_dsir_sf01_divergence_is_negative_zero_only(spark):
    """The curation_dsir_weights sf0.1 hash mismatch WAS purely the
    -0.0/0.0 repr split (one doc whose mean llr is an exact zero that
    DuckDB signed negative): field-by-field the values were EQUAL
    under IEEE comparison. The r13 fix normalizes zero on both sides
    (x + 0.0); this pin now asserts the divergence is RETIRED — IEEE
    equality still holds row-by-row AND no float field repr-diverges
    anymore."""
    import duckdb

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        curation,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
        registry,
    )

    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    srows = {
        r["doc_id"]: tuple(r)
        for r in curation.curation_dsir_weights(spark, sf).collect()
    }
    orows = {
        r[0]: tuple(r)
        for r in con.execute(
            registry.ORACLES["curation_dsir_weights"]
        ).fetchall()
    }
    assert set(srows) == set(orows)
    for k, sv in srows.items():
        ov = orows[k]
        assert sv == ov, k  # IEEE equality: -0.0 == 0.0
        for a, b in zip(sv, ov):
            if isinstance(a, float):
                # the r13 + 0.0 normalization retires the repr split
                assert repr(a) == repr(b), k


def test_recursive_union_oracle_audit_is_exhaustive():
    """Guard for the DuckDB RECURSIVE-UNION quirk audit: exactly these
    seven oracles use plain UNION inside WITH RECURSIVE. Six are
    connectivity-based (duplicate edges cannot change reachability,
    and per-doc label aggregation collapses any row dups — all pass
    the sf0.1 full gate); only dedup_pagerank is edge-
    multiplicity-sensitive (fixed in r13 via SELECT DISTINCT — it
    still appears in this hit set because the DISTINCT wraps a plain
    UNION that remains inside the RECURSIVE block). A NEW recursive
    oracle lands here first: add it only after classifying its
    multiplicity sensitivity in SCALE.md.
    r17: curation_soft_dedup_weights joined (registered) — its window
    COUNT runs over the components CTE's GROUP BY node output (one row
    per doc by construction), so row multiplicity inside the walk
    cannot reach cluster_size: multiplicity-INSENSITIVE (classified in
    SCALE.md round-17; sf0.1 sweep 136/136 includes it).
    r18: sample_soft_dedup joined (registered) — it composes the
    soft-dedup-weights CTE verbatim and adds only a per-doc md5
    filter over that one-row-per-doc output, so it inherits the same
    multiplicity-INSENSITIVE classification (SCALE.md round-18; the
    pure-Python predicate replay in tests/test_round17_ops.py is an
    engine-independent check of exactly the value multiplicity could
    have corrupted)."""
    import re

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
        registry,
    )

    hits = {
        name
        for name, sql in registry.ORACLES.items()
        if re.search(r"WITH\s+RECURSIVE", sql, re.I)
        and re.search(r"UNION(?!\s+ALL)", sql, re.I)
    }
    assert hits == {
        "corpus_select",
        "curation_soft_dedup_weights",
        "dedup_component_stats",
        "dedup_components",
        "dedup_multimodal_components",
        "dedup_pagerank",
        "sample_soft_dedup",
        "sample_split_by_cluster",
    }
