"""Round-6 additions: the clean-room baseline JPEG codec and its
oracle-checked decode-stats entry.

The exactly-invertible constant-tile setting is what the DuckDB oracle
checks (see jpeg.py's losslessness note); these tests additionally pin
the GENERAL codec path — non-constant blocks, real quantization
tables, Huffman corner cases — against an independent numpy
reconstruction of the same quantized coefficients.
"""

from __future__ import annotations

import numpy as np
import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    jpeg,
    multimodal,
)


def _reference_roundtrip(x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Independent from-the-spec reconstruction: float DCT → quantize →
    dequantize → IDCT, per block, no shared code with the codec's
    batched path."""
    B = jpeg._BASIS
    out = np.zeros_like(x)
    h, w = x.shape
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = x[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            c = np.rint((B @ blk @ B.T) / q)
            r = B.T @ (c * q) @ B
            out[by : by + 8, bx : bx + 8] = np.clip(
                np.rint(r + 128.0), 0, 255
            ).astype(np.uint8)
    return out


def test_constant_tiles_roundtrip_bit_exact():
    raw = bytes(range(256)) * 2 + b"hello world"
    img = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_blocks(raw))
    bw = jpeg.JPEG_BLOCKS_W
    bh = -(-len(raw) // bw)
    vals = np.zeros(bh * bw, np.uint8)
    vals[: len(raw)] = np.frombuffer(raw, np.uint8)
    want = np.repeat(np.repeat(vals.reshape(bh, bw), 8, 0), 8, 1)
    assert np.array_equal(img, want)


def test_general_image_matches_independent_reconstruction():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    got = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(x))
    assert np.array_equal(got, _reference_roundtrip(x, np.ones((8, 8))))


def test_lossy_quant_table_roundtrip_and_compression():
    q = np.full((8, 8), 16, np.int64)
    q[0, 0] = 8
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    got = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(noisy, q))
    assert np.array_equal(got, _reference_roundtrip(noisy, q.astype(float)))
    # a smooth image must actually compress below raw size
    smooth = np.tile(np.linspace(60, 200, 32).astype(np.uint8), (24, 1))
    enc = jpeg.encode_jpeg_gray(smooth, q)
    assert len(enc) < smooth.size
    dec = jpeg.decode_jpeg_gray(enc)
    assert int(np.abs(dec.astype(int) - smooth.astype(int)).max()) <= 4


def test_zrl_and_high_frequency_blocks():
    """A block with one lone high-frequency coefficient forces ZRL
    (16-zero-run) codes through both sides."""
    x = np.zeros((8, 8), dtype=np.uint8)
    x[7, 7] = 255
    got = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(x))
    assert np.array_equal(got, _reference_roundtrip(x, np.ones((8, 8))))


def test_decoder_rejects_malformed_streams():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(b"\x00\x01not a jpeg")
    good = jpeg.encode_jpeg_blocks(b"abcdef")
    with pytest.raises(ValueError):
        # flip SOF0 → SOF2: now parsed by the real progressive decoder,
        # which rejects the baseline full-band scan header (an AC band
        # must not include coefficient 0, T.81 G.1.1.1.1)
        jpeg.decode_jpeg_gray(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(good[:2] + b"\xff\xd9")  # no scan


def test_decode_image_dispatches_jpeg_to_rgb():
    raw = b"spark"
    w, h, img = multimodal.decode_image(jpeg.encode_jpeg_blocks(raw))
    assert (w, h) == (8 * jpeg.JPEG_BLOCKS_W, 8 * -(-len(raw) // jpeg.JPEG_BLOCKS_W))
    assert img.shape == (h, w, 3)
    # grayscale replicated across channels
    assert np.array_equal(img[:, :, 0], img[:, :, 1])
    assert np.array_equal(img[:, :, 0], img[:, :, 2])
    assert img[0, 0, 0] == raw[0]


def test_jpeg_entry_matches_oracle_at_smoke_scale(spark, sf_dir):
    """Belt-and-braces beyond the parameterized all-entries gate: run
    the new entry's Spark and DuckDB sides explicitly and compare."""
    import duckdb

    import __spark_entry__ as e

    # the jpeg leg rides in the merged multimodal_decode_stats_formats
    # entry since round 16 (rotation headroom merge)
    got = {
        r.doc_id: (r.width, r.height, r.mean_r, r.thumb_sum)
        for r in e.queries()["multimodal_decode_stats_formats"](
            spark, sf_dir
        ).filter("fmt = 'jpeg'").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        r[1]: (r[2], r[3], r[4], r[7])
        for r in con.execute(
            "SELECT * FROM ("
            + e.oracle_sql()["multimodal_decode_stats_formats"]
            + ") WHERE fmt = 'jpeg'"
        ).fetchall()
    }
    assert got == want


# --- hypothesis property tests (no Spark in the loop) ---------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=400),
)
def test_constant_tile_roundtrip_property(data):
    """Any payload round-trips bit-exactly through the full real JPEG
    pipeline in the constant-tile setting."""
    img = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_blocks(data))
    bw = jpeg.JPEG_BLOCKS_W
    n = max(1, len(data))
    bh = -(-n // bw)
    vals = np.zeros(bh * bw, np.uint8)
    vals[: len(data)] = np.frombuffer(data, np.uint8)
    want = np.repeat(np.repeat(vals.reshape(bh, bw), 8, 0), 8, 1)
    assert np.array_equal(img, want)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    qval=st.integers(1, 64),
)
def test_general_roundtrip_matches_reference_property(seed, bh, bw, qval):
    """Random images × random uniform quant tables: decode(encode(x))
    must equal the independent spec reconstruction exactly — this
    drives nonzero ACs, ZRL runs, DC-difference chains and byte
    stuffing through both codec sides."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (8 * bh, 8 * bw), dtype=np.uint8)
    q = np.full((8, 8), qval, np.int64)
    got = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(x, q))
    assert np.array_equal(got, _reference_roundtrip(x, q.astype(float)))


def test_duplicate_spans_flags_shared_boilerplate(spark, tmp_path):
    """Two docs sharing a long verbatim span must show nonzero
    dup_share; a fully distinct doc must show zero."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        textops,
    )

    boiler = "subscribe to our newsletter for updates and offers today"
    rows = [
        (1, f"first article body text here. {boiler}"),
        (2, f"{boiler} second article, totally different body."),
        (3, "an entirely unrelated document with no repeated span at all"),
    ]
    d = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{d}/documents.parquet")
    out = {
        r.doc_id: r
        for r in textops.text_duplicate_spans(spark, d).collect()
    }
    assert out[1].n_shared > 0 and out[2].n_shared > 0
    assert out[3].n_shared == 0 and out[3].dup_share == 0.0
    for r in out.values():
        assert 0.0 <= r.dup_share <= 1.0
        assert r.n_shared <= r.n_fingerprints


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    restart=st.integers(1, 12),
)
def test_restart_interval_roundtrip_property(seed, restart):
    """DRI/RSTn streams: byte realignment and per-segment DC resets
    must reproduce the no-restart reconstruction exactly for any
    interval, including ones that don't divide the block count."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    plain = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(x))
    with_rst = jpeg.decode_jpeg_gray(
        jpeg.encode_jpeg_gray(x, restart_interval=restart)
    )
    assert np.array_equal(with_rst, plain)


def _color_reference(x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Independent color reconstruction: BT.601 forward transform,
    per-channel spec roundtrip, inverse transform."""
    ycc = jpeg.rgb_to_ycbcr(x)
    planes = [
        _reference_roundtrip(ycc[:, :, c], q) for c in range(3)
    ]
    return jpeg._ycbcr_to_rgb(planes)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), restart=st.integers(0, 6))
def test_color_jpeg_roundtrip_property(seed, restart):
    """4:4:4 color files: interleaved MCUs, per-component DC
    predictors, YCbCr↔RGB — exact vs the independent reference for any
    restart interval (0 = none)."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    got = jpeg.decode_jpeg(
        jpeg.encode_jpeg_color(x, restart_interval=restart)
    )
    assert np.array_equal(got, _color_reference(x, np.ones((8, 8))))


def test_color_jpeg_visually_faithful_and_dispatched():
    """Unit-quant color roundtrip stays within the color-transform
    rounding error (±4), and decode_image passes RGB through."""
    rng = np.random.default_rng(9)
    x = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    enc = jpeg.encode_jpeg_color(x)
    w, h, img = multimodal.decode_image(enc)
    assert (w, h, img.shape) == (16, 16, (16, 16, 3))
    assert int(np.abs(img.astype(int) - x.astype(int)).max()) <= 4
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(enc)  # gray wrapper must reject color


# --- WAV audio codec ------------------------------------------------------
def test_wav_roundtrip_and_container_conformance():
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.multimodal import (
        WAV_RATE,
        decode_wav,
        encode_wav,
    )

    raw = bytes(range(256)) + b"audio"
    wav = encode_wav(raw)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    rate, s = decode_wav(wav)
    assert rate == WAV_RATE and len(s) == len(raw)
    want = (np.frombuffer(raw, np.uint8).astype(np.int16) - 128) * 256
    assert np.array_equal(s, want)
    # decoder skips unknown chunks (spec requirement)
    import struct as _st

    junk = b"LIST" + _st.pack("<I", 4) + b"INFO"
    patched = wav[:12] + junk + wav[12:]
    patched = patched[:4] + _st.pack("<I", len(patched) - 8) + patched[8:]
    rate2, s2 = decode_wav(patched)
    assert rate2 == rate and np.array_equal(s2, s)
    with pytest.raises(ValueError):
        decode_wav(b"nonsense")


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_wav_roundtrip_property(data):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    _, s = decode_wav(encode_wav(data))
    n = max(1, len(data))
    want = np.zeros(n, dtype=np.int16)
    if data:
        want[: len(data)] = (
            np.frombuffer(data, np.uint8).astype(np.int16) - 128
        ) * 256
    assert np.array_equal(s, want)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), restart=st.integers(0, 4))
def test_jpeg_420_roundtrip_property(seed, restart):
    """4:2:0 — the subsampling most real-world baseline files use:
    2x2-interleaved Y MCUs, box-averaged quarter-res chroma, nearest
    upsampling on decode — exact vs an independent reconstruction of
    the same pipeline, for any restart interval."""
    rng = np.random.default_rng(seed)
    h, w = 32, 48
    x = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(
        jpeg.encode_jpeg_color_420(x, restart_interval=restart)
    )

    ycc = jpeg.rgb_to_ycbcr(x)

    def down2(pl):
        v = pl.reshape(h // 2, 2, w // 2, 2).astype(np.int64)
        return ((v.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)

    yr = _reference_roundtrip(ycc[:, :, 0], np.ones((8, 8)))
    cbr = np.repeat(
        np.repeat(_reference_roundtrip(down2(ycc[:, :, 1]), np.ones((8, 8))), 2, 0),
        2, 1,
    )
    crr = np.repeat(
        np.repeat(_reference_roundtrip(down2(ycc[:, :, 2]), np.ones((8, 8))), 2, 0),
        2, 1,
    )
    assert np.array_equal(dec, jpeg._ycbcr_to_rgb([yr, cbr, crr]))


# --- AVI video codec ------------------------------------------------------
def test_avi_roundtrip_and_frame_layout():
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.multimodal import (
        FRAME_H,
        FRAME_W,
        decode_avi,
        encode_avi,
    )

    raw = bytes(range(256)) * 2  # 512 bytes → 3 frames (192 each)
    avi = encode_avi(raw)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    fr = decode_avi(avi)
    assert fr.shape == (3, FRAME_H, FRAME_W, 3)
    n = fr.size
    want = np.zeros(n, np.uint8)
    want[: len(raw)] = np.frombuffer(raw, np.uint8)
    assert np.array_equal(fr.reshape(-1), want)  # RGB row-major restored
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=600))
def test_avi_roundtrip_property(data):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.multimodal import (
        _FRAME_BYTES_RGB,
        decode_avi,
        encode_avi,
    )

    fr = decode_avi(encode_avi(data))
    nf = max(1, -(-len(data) // _FRAME_BYTES_RGB))
    assert fr.shape[0] == nf
    want = np.zeros(nf * _FRAME_BYTES_RGB, np.uint8)
    want[: len(data)] = np.frombuffer(data, np.uint8)
    assert np.array_equal(fr.reshape(-1), want)


def test_kmv_sketch_accuracy_and_exact_fallback(spark, sf_dir):
    """KMV estimate within ~4/sqrt(k) of exact per language; groups
    under k report the exact count."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.sketches import (
        KMV_K,
        sketch_distinct_tokens,
    )

    rows = sketch_distinct_tokens(spark, sf_dir).collect()
    assert rows
    tol = 4.0 / (KMV_K**0.5)
    for r in rows:
        if r.n_exact < KMV_K:
            assert r.n_est == float(r.n_exact)
        else:
            assert abs(r.n_est - r.n_exact) / r.n_exact <= tol, r


def test_bloom_gate_oracle_k_matches_portable_params():
    """The oracle inlines k=7 (DuckDB range() needs a constant); it
    must match portable_bloom_params' hash count."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.functions.bloom import (
        portable_bloom_params,
    )

    m, k = portable_bloom_params(1000)
    assert k == 7
    assert m == 1 << (1000).bit_length() + 3


def test_bloom_gate_false_positive_rate_bounded(spark, sf_dir):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.sketches import (
        dedup_bloom_gate,
    )

    rows = dedup_bloom_gate(spark, sf_dir).collect()
    assert rows
    novel = [r for r in rows if r.verdict == "novel"]
    fps = sum(r.false_positive for r in rows)
    # m = 2^(bitlen(n)+3) gives 8-16 bits/key at worst (n just past a
    # power of two) → expected fpp ≲ 1 %; the bound leaves Poisson tail
    # room at this sf's tiny novel count (101 docs, λ≈0.7 → observed 3)
    assert fps <= max(4, int(0.05 * len(novel)))
    for r in rows:
        if r.verdict == "exact":
            assert r.bloom_maybe and not r.false_positive  # no false negatives


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, cluster-scoped embedding pruning)
# ---------------------------------------------------------------------------


def test_semantic_dedup_precision_and_recall(spark, sf_dir):
    """Every drop must be a true near-dup pair (precision 1 — hits are
    verified with the exact grid cosine inside the kernel), and the
    probed-list scope must recover most of the all-pairs truth drops
    (measured 0.83 at sf0.001 on isotropic noise, the adversarial case
    for quantizer routing; the home-list-only paper rule measures
    0.35 on the same corpus — the probing scope is what makes the
    recall acceptable)."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        dedup,
        similarity,
    )

    truth_pairs = {
        (r.vec_a, r.vec_b)
        for r in dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    dropped_truth = {max(a, b) for a, b in truth_pairs}
    rows = similarity.dedup_semantic_clusters(spark, sf_dir).collect()
    dropped = {r.vec_id for r in rows if not r.kept}
    assert dropped, "fixture has planted embedding near-dups"
    assert dropped <= dropped_truth  # precision 1
    assert len(dropped & dropped_truth) >= 0.7 * len(dropped_truth)


def test_semantic_dedup_row_invariants(spark, sf_dir):
    """One row per vector; dup_of is always a smaller id with an
    above-threshold exact cosine; kept ⇔ no dup_of; survivors include
    the global minimum id (nothing can dominate it)."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        similarity,
    )

    rows = similarity.dedup_semantic_clusters(spark, sf_dir).collect()
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids)) == 500
    for r in rows:
        assert r.kept == (r.dup_of is None)
        if r.dup_of is not None:
            assert r.dup_of < r.vec_id
            assert r.dup_sim >= similarity.SEM_DUP_COSINE
    assert next(r for r in rows if r.vec_id == min(ids)).kept


def test_source_overlap_estimator_accuracy(spark, sf_dir):
    """KMV Jaccard vs exact: when the pair's union fits inside the
    sketch (n_union ≤ k) the estimate must EQUAL the exact value (a
    full sketch is the full set); otherwise the estimator error is
    bounded well inside the ~1/√k KMV band. All 190 source pairs must
    be present."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        sketches,
    )

    rows = sketches.sketch_source_overlap(spark, sf_dir).collect()
    assert len(rows) == 190  # C(20, 2) source pairs
    for r in rows:
        assert 0.0 <= r.jaccard_est <= 1.0
        if r.n_union <= sketches.KMV_K:
            assert r.est_k == r.n_union and r.est_matches == r.n_inter
            assert r.jaccard_est == r.jaccard_exact
        else:
            assert abs(r.jaccard_est - r.jaccard_exact) <= 0.25


def test_heavy_hitters_exact_vs_direct(spark, sf_dir):
    """The two-phase plan (chunk-local candidates + exact recount) must
    return EXACTLY the single-shuffle groupBy+HAVING answer — the
    candidate phase bounds the shuffle, never the result (the
    weighted-average pigeonhole in the module comment guarantees the
    superset for any chunking)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        sketches,
    )

    got = {
        (r.token, r.n_occurrences)
        for r in sketches.sketch_heavy_hitters(spark, sf_dir).collect()
    }
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    total = toks.count()
    want = {
        (r.token, r.c)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * sketches.HH_SHARE_DEN >= total)
        .collect()
    }
    assert got == want and got
    assert all(c * sketches.HH_SHARE_DEN >= total for _, c in got)


def test_heavy_hitters_candidate_join_broadcasts_hint_free(spark, sf_dir):
    """The candidate recount join carries no manual broadcast hint
    (the candidate set grows with chunk count, so a hint would be a
    human-operated scale switch that could OOM a pathological corpus)
    — pin that the planner still picks a broadcast join on its own at
    gate scale, from the candidate side's runtime/estimated stats.
    Same executed-plan-evidence pattern as test_aqe_skew.py."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        sketches,
    )

    df = sketches.sketch_heavy_hitters(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Under AQE the string prints the Final Plan first and, when it
    # differs, an "Initial Plan" section after it — assert only on the
    # final section so an AQE-converted SortMergeJoin in the initial
    # plan can't fail the test spuriously.
    final = plan.split("Initial Plan")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_epochs_schedule_invariants(spark, sf_dir):
    """Budget conservation and cap semantics: epochs is exactly
    budget/tokens, capped_tokens is min(budget, 4·tokens), capped ⇔
    the cap actually bound, and the surplus equals the total budget
    clipped off across sources (same scalar on every row)."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        curation,
    )

    rows = curation.curation_epochs_schedule(spark, sf_dir).collect()
    assert len(rows) == 20
    surplus = {r.surplus_tokens for r in rows}
    assert len(surplus) == 1
    clipped = 0
    for r in rows:
        assert r.epochs == r.budget_tokens / r.n_tokens
        assert r.capped_tokens == min(
            r.budget_tokens, curation.MAX_EPOCHS * r.n_tokens
        )
        assert r.capped == (r.budget_tokens > curation.MAX_EPOCHS * r.n_tokens)
        clipped += r.budget_tokens - r.capped_tokens
    assert surplus == {clipped}
