"""Round-17 staged operator gates (register in round 18):

`layout_prune_probes` — the pruning SIMULATION leg of the layout
family: buckets and rows a zone-map-pruned point lookup reads under
each candidate layout, over a fixed deterministic probe workload.
Gates: the staged DuckDB oracle replays the Spark report bit-for-bit
at sf0.01, and the metric exposes what spans alone hide — the
degenerate raw interleave hits ONE bucket per probe yet still scans
the whole corpus, while the scaled layout cuts rows scanned by ~8×.

`sample_soft_dedup` — the consumption side of the soft-dedup weights:
a deterministic Bernoulli downsample with keep probability
rate/cluster_size. Gates: oracle parity, an independent pure-Python
replay of the exact int64 predicate, and the cluster-mass property.
"""

from __future__ import annotations

import hashlib

import duckdb

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    clusters,
    layout,
    sampling,
)

SF = "/root/testdata/sf0.01"


def _duck(views: dict[str, str]):
    con = duckdb.connect()
    for name, path in views.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def test_prune_probes_matches_staged_oracle(spark):
    got = {
        (r["layout"], r["probe_kind"]): (
            r["n_probes"], r["buckets_hit"], r["rows_scanned"],
        )
        for r in layout.layout_prune_probes(spark, SF).collect()
    }
    con = _duck({"events": f"{SF}/events.parquet"})
    want = {
        (row[0], row[1]): (row[2], row[3], row[4])
        for row in con.execute(layout._prune_probes_sql()).fetchall()
    }
    assert got == want
    assert set(got) == {
        (lay, kind)
        for lay in ("hour", "morton", "hilbert", "morton_scaled")
        for kind in ("user_point", "hour_range")
    }


def test_prune_probes_exposes_what_spans_hide(spark):
    """The honesty property (point lookups): the degenerate raw
    interleave hits one bucket per probe (looks perfectly pruned by
    bucket count) but that bucket holds the whole corpus —
    rows_scanned stays at 100%. The hour baseline scans ~everything
    too. Only the scaled layout cuts the rows a point lookup reads."""
    rows = {
        r["layout"]: r.asDict()
        for r in layout.layout_prune_probes(spark, SF)
        .filter("probe_kind = 'user_point'")
        .collect()
    }
    n = load_table(spark, SF, "events").count()
    k = rows["hour"]["n_probes"]
    assert k == layout.PROBE_COUNT
    # hour baseline: every bucket spans ~the whole user domain, so each
    # probe hits ~every bucket and scans ~the whole corpus
    assert rows["hour"]["rows_scanned"] >= 0.9 * k * n
    # degenerate raw interleave: ONE bucket per probe...
    assert rows["morton"]["buckets_hit"] == k
    # ...but that bucket IS the corpus (the honesty denominator)
    assert rows["morton"]["rows_scanned"] == k * n
    # the production scaled layout scans a small fraction of both
    assert rows["morton_scaled"]["rows_scanned"] <= rows["hour"]["rows_scanned"] // 4
    assert rows["morton_scaled"]["rows_scanned"] <= rows["morton"]["rows_scanned"] // 4
    assert rows["morton_scaled"]["buckets_hit"] < rows["hour"]["buckets_hit"]


def test_prune_probes_hour_range_crossover(spark):
    """The OTHER half of the trade-off (round-17 verdict item 3), on
    the reference's own trailing-time-slice shape: on aligned
    hour-range scans the hour specialist prunes (near-)perfectly —
    each window reads ~1/16 of the corpus — while the degenerate raw
    interleave still scans ~everything; the scaled z-order stays
    within a small factor of the specialist on ranges WHILE (the
    previous test) beating it by ≥4× on point lookups. That pair of
    facts is the reason the scaled layout is the production default."""
    rows = {
        r["layout"]: r.asDict()
        for r in layout.layout_prune_probes(spark, SF)
        .filter("probe_kind = 'hour_range'")
        .collect()
    }
    n = load_table(spark, SF, "events").count()
    k = rows["hour"]["n_probes"]
    assert k == layout.HOUR_RANGE_COUNT
    # the 16 aligned windows tile the domain: summed over the workload,
    # the hour specialist reads each row ~once (bucket boundaries add
    # at most one extra bucket per window edge)
    assert rows["hour"]["rows_scanned"] <= 2 * n
    # the raw interleave's buckets span ~the whole hour domain, so a
    # range scan degenerates to ~a full corpus read per window
    assert rows["morton"]["rows_scanned"] >= 0.9 * k * n
    # the scaled layout ties the specialist within a small factor (its
    # buckets confine hours to ~domain/8, so a window touches at most
    # a couple of hour slices)
    assert rows["morton_scaled"]["rows_scanned"] <= 4 * rows["hour"]["rows_scanned"]
    assert rows["morton_scaled"]["rows_scanned"] <= rows["morton"]["rows_scanned"] // 4


def test_soft_dedup_sample_matches_staged_oracle(spark):
    got = sorted(
        tuple(r) for r in sampling.sample_soft_dedup(spark, SF).collect()
    )
    con = _duck(
        {
            "documents": f"{SF}/documents.parquet",
        }
    )
    want = sorted(
        tuple(row)
        for row in con.execute(sampling._soft_dedup_sample_sql()).fetchall()
    )
    assert got == want
    assert got, "the sample must be non-empty at the 50% target rate"


def test_soft_dedup_sample_predicate_replays_in_pure_python(spark):
    """Independent implementation check: the exact int64 cross-multiply
    replayed with hashlib over the weights table selects exactly the
    same docs — no float, no engine arithmetic quirk."""
    weights = {
        int(r["doc_id"]): int(r["weight_ppm"])
        for r in clusters.curation_soft_dedup_weights(spark, SF).collect()
    }
    expect = {
        d
        for d, w in weights.items()
        if int(hashlib.md5(str(d).encode()).hexdigest()[:5], 16)
        * 1_000_000_000_000
        < sampling.SOFT_SAMPLE_RATE_PPM * w * sampling._H20
    }
    got = {
        int(r["doc_id"])
        for r in sampling.sample_soft_dedup(spark, SF).collect()
    }
    assert got == expect


def test_soft_dedup_sample_preserves_cluster_mass(spark):
    """The property the sampler exists for: a cluster's keep
    probability per DOC is rate/size, so expected kept doc-mass per
    cluster is ~rate — composition matches hard-dedup-then-sample
    while keeping every doc samplable. Deterministic corpus, so the
    singleton keep fraction is a fixed number; assert it sits inside a
    generous band around the 50% target."""
    kept = sampling.sample_soft_dedup(spark, SF)
    singles_kept = kept.filter("cluster_size = 1").count()
    n_singles = (
        clusters.curation_soft_dedup_weights(spark, SF)
        .filter("cluster_size = 1")
        .count()
    )
    rate = sampling.SOFT_SAMPLE_RATE_PPM / 1e6
    assert n_singles > 100
    assert abs(singles_kept / n_singles - rate) < 0.10
    # multi-doc clusters: kept docs exist but are down-weighted — the
    # per-doc keep rate across them is well under the singleton rate
    multi = kept.filter("cluster_size > 1").count()
    n_multi_docs = (
        clusters.curation_soft_dedup_weights(spark, SF)
        .filter("cluster_size > 1")
        .count()
    )
    if n_multi_docs:
        assert multi / n_multi_docs < rate


# --- GIF codec leg (staged for round 18) -----------------------------------


def test_gif_decode_stats_matches_staged_oracle(spark):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    got = sorted(
        tuple(r)
        for r in mm.multimodal_decode_stats_gif(spark, SF).collect()
    )
    con = _duck({"documents": f"{SF}/documents.parquet"})
    want = sorted(
        tuple(row)
        for row in con.execute(mm._decode_stats_gif_oracle()).fetchall()
    )
    assert got == want and got


def test_gif_lzw_round_trips_across_every_width_boundary():
    """The codec content of the GIF leg: variable-width LZW with the
    giflib bump convention must round-trip inputs that cross the
    9→10→11→12 boundaries and force mid-stream clear-code resets."""
    import numpy as np

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    rng = np.random.RandomState(7)
    for raw in [
        b"",
        b"a",
        bytes(range(256)) * 2,
        rng.bytes(5_000),       # past the 512 and 1024 boundaries
        rng.bytes(60_000),      # past 4096: clear-code reset path
        b"ab" * 40_000,         # degenerate repetition, long chains
        rng.bytes(200_000),     # several full table cycles
    ]:
        assert mm._lzw_decode_gif(mm._lzw_encode_gif(raw)) == raw


def test_gif_container_round_trip_and_canonical_framing():
    """encode_gif emits a real GIF87a: magic, logical screen
    descriptor, 256-gray identity palette, sub-block framing, trailer;
    decode_gif recovers every payload byte at the documented (i//W,
    i%W) position with r=g=b. The simplest stream is also checked
    against an INDEPENDENT hand-packed LZW byte string (clear, three
    literals, EOI at 9 bits, LSB-first) so the framing convention is
    pinned to the spec, not just to our own decoder."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    raw = b"the quick brown fox jumps over the lazy dog"
    g = mm.encode_gif(raw)
    assert g[:6] == b"GIF87a" and g[-1:] == b"\x3b"
    w, h, img = mm.decode_gif(g)
    assert (w, h) == (mm.GIF_WIDTH, -(-len(raw) // mm.GIF_WIDTH))
    assert bytes(img[:, :, 0].reshape(-1)[: len(raw)]) == raw
    assert (img[:, :, 0] == img[:, :, 1]).all()
    assert (img[:, :, 0] == img[:, :, 2]).all()
    # independent framing vector: codes [256, 40, 255, 40, 257] @9b,
    # packed LSB-first by a test-local packer
    codes = [256, 40, 255, 40, 257]
    acc = nbits = 0
    packed = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    assert mm._lzw_encode_gif(bytes([40, 255, 40])) == bytes(packed)
    assert mm._lzw_decode_gif(bytes(packed)) == bytes([40, 255, 40])


def test_gif_decoder_rejects_and_skips_what_it_should():
    """Interlaced images raise loudly; extension blocks (the GIF89a
    graphics-control prelude real files carry) are skipped; truncation
    below the descriptor's pixel count is a named error."""
    import pytest

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    g = bytearray(mm.encode_gif(b"payload bytes here"))
    # image descriptor starts after 6 (hdr) + 7 (LSD) + 768 (GCT)
    desc = 6 + 7 + 768
    assert g[desc] == 0x2C
    g_inter = bytearray(g)
    g_inter[desc + 9] |= 0x40  # interlace flag
    with pytest.raises(NotImplementedError, match="interlaced"):
        mm.decode_gif(bytes(g_inter))
    # splice a GIF89a graphics-control extension before the image
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    g_ext = bytes(g[:desc]) + ext + bytes(g[desc:])
    w, h, img = mm.decode_gif(g_ext)
    assert bytes(img[0, :13, 0].reshape(-1)) == b"payload bytes"
    with pytest.raises(ValueError, match="not a GIF"):
        mm.decode_gif(b"BM not a gif")
