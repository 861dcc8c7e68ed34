"""Round-11 perceptual-hash image near-dup (``dedup_phash``).

Gates, in order of strength:
1. EXACTNESS of the banded plan: at sf0.001 the bucketed-candidate +
   verify output equals the brute-force all-pairs Hamming truth over
   the same dHash values — recall 1.0, realized (the pigeonhole
   argument made concrete on real data).
2. The pigeonhole property itself, over random 64-bit hashes: any pair
   within PHASH_MAX_HAMMING (< PHASH_NBANDS) shares at least one band.
3. Real-decoder parity: the dHash computed through the actual
   encode_bmp → decode_image → resize pipeline equals an independent
   byte-math replay (the mapping the DuckDB oracle uses).
4. Integration: the dedup report's near_phash row counts exactly the
   distinct endpoints of dedup_phash.
"""

from __future__ import annotations

import itertools
import random

import numpy as np

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    multimodal,
)

SF = "/root/testdata/sf0.001"


def _bands_by_doc(spark, sf: str) -> dict[int, tuple[int, ...]]:
    rows = multimodal.phash_bands_df(spark, sf).collect()
    return {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in rows}


def _hamming(a: tuple[int, ...], b: tuple[int, ...]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_banded_equals_allpairs_truth(spark):
    """The banded candidate join loses NOTHING vs all-pairs: the
    pigeonhole guarantee realized on real data."""
    hashes = _bands_by_doc(spark, SF)
    truth = {
        (a, b, _hamming(hashes[a], hashes[b]))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if _hamming(hashes[a], hashes[b]) <= multimodal.PHASH_MAX_HAMMING
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal.dedup_phash(spark, SF).collect()
    }
    assert got == truth
    assert len(truth) > 0  # the gate actually bites on this corpus


def test_pigeonhole_band_share():
    """Any 64-bit pair within PHASH_MAX_HAMMING < PHASH_NBANDS flipped
    bits collides in at least one of the 4 disjoint 16-bit bands."""
    rng = random.Random(11)
    nb, bb = multimodal.PHASH_NBANDS, multimodal.PHASH_BAND_BITS
    for _ in range(500):
        base = [rng.getrandbits(bb) for _ in range(nb)]
        flips = rng.sample(
            range(nb * bb), rng.randint(0, multimodal.PHASH_MAX_HAMMING)
        )
        other = list(base)
        for f in flips:
            other[f // bb] ^= 1 << (f % bb)
        assert any(x == y for x, y in zip(base, other))


def _replay_bands(text: str) -> tuple[int, ...]:
    """Independent byte-math dHash replay: the mapping the oracle SQL
    uses (byte i -> pixel (i//3 // W, i//3 % W) channel i%3)."""
    raw = text.encode("utf-8")
    w = multimodal.BMP_WIDTH
    g = multimodal.PHASH_GRID
    h = max(1, -(-len(raw) // (3 * w)))
    data = raw + b"\x00" * (3 * w * h - len(raw))
    img = np.frombuffer(data, np.uint8).reshape(h, w, 3)
    rows = (np.arange(g) * h) // g
    cols = (np.arange(g + 1) * w) // (g + 1)
    gray = img[rows][:, cols].astype(np.int64).sum(axis=2)
    bits = (gray[:, :-1] > gray[:, 1:]).astype(np.int64).ravel()
    weights = 1 << np.arange(multimodal.PHASH_BAND_BITS, dtype=np.int64)
    return tuple(
        int(
            (
                bits[
                    j * multimodal.PHASH_BAND_BITS : (j + 1)
                    * multimodal.PHASH_BAND_BITS
                ]
                * weights
            ).sum()
        )
        for j in range(multimodal.PHASH_NBANDS)
    )


def test_real_decode_matches_byte_replay(spark):
    """The dHash through the REAL codec round trip (encode_bmp →
    header-parsing decode → nearest resize) equals the byte replay —
    i.e. the decoder is exercised and correct, not bypassed."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(64)
        .collect()
    )
    via_spark = _bands_by_doc(spark, SF)
    for r in docs:
        assert via_spark[r["doc_id"]] == _replay_bands(r["text"])


def test_report_near_phash_counts_endpoints(spark):
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        curation,
    )

    pairs = multimodal.dedup_phash(spark, SF).collect()
    endpoints = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    report = {
        r["modality"]: r["n_affected"]
        for r in curation.curation_dedup_report(spark, SF).collect()
    }
    assert report["near_phash"] == len(endpoints)


def test_skewed_duplicate_class_collapses(spark, tmp_path):
    """A corpus dominated by one identical-image class must (a) send
    only DISTINCT hashes through the banded bucket join — the
    `dedup_minhash_lsh` identity-collapse defense, mirrored — while
    (b) the output still carries every within-class pair at Hamming 0
    and the cross pairs at their exact distance, agreeing with the
    all-pairs DuckDB oracle on the synthetic corpus."""
    import duckdb

    n_dup = 200
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(n_dup)]
    rows += [(n_dup, "completely different text one"), (n_dup + 1, None)]
    root = tmp_path / "skew"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/documents.parquet")

    import os

    os.environ["SPARK_GRAFT_NO_ARTIFACTS"] = "1"
    try:
        got = sorted(
            tuple(r) for r in multimodal.dedup_phash(spark, str(root)).collect()
        )
    finally:
        os.environ.pop("SPARK_GRAFT_NO_ARTIFACTS", None)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{root}/documents.parquet/*.parquet')"
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans.registry import (
        ORACLES,
    )

    exp = sorted(tuple(r) for r in con.execute(ORACLES["dedup_phash"]).fetchall())
    assert got == exp
    assert len(got) >= n_dup * (n_dup - 1) // 2  # the whole class paired


def test_decode_parity_on_random_strings(spark, tmp_path):
    """Decoder parity beyond the testdata distribution: 200 seeded
    random printable strings (lengths 0–400, so heights 1–9 and every
    zero-padding shape) must hash identically through the REAL
    encode/decode kernel and the byte replay."""
    import random

    rng = random.Random(1101)
    alphabet = [chr(c) for c in range(32, 127)]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 400)))
        for _ in range(200)
    ]
    root = tmp_path / "rand"
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/documents.parquet")
    got = _bands_by_doc(spark, str(root))
    for i, t in enumerate(texts):
        assert got[i] == _replay_bands(t), f"mismatch at doc {i}"


# ---------------------------------------------------------------------------
# Round 12: PNG-path phash (dedup_phash_png)
# ---------------------------------------------------------------------------
def _replay_bands_w(text: str, w: int) -> tuple[int, ...]:
    """Width-parameterized byte-math replay (the oracle's mapping for
    either codec: byte i -> pixel (i//3 // w, i//3 % w) channel i%3)."""
    raw = text.encode("utf-8")
    g = multimodal.PHASH_GRID
    h = max(1, -(-len(raw) // (3 * w)))
    data = raw + b"\x00" * (3 * w * h - len(raw))
    img = np.frombuffer(data, np.uint8).reshape(h, w, 3)
    rows = (np.arange(g) * h) // g
    cols = (np.arange(g + 1) * w) // (g + 1)
    gray = img[rows][:, cols].astype(np.int64).sum(axis=2)
    bits = (gray[:, :-1] > gray[:, 1:]).astype(np.int64).ravel()
    weights = 1 << np.arange(multimodal.PHASH_BAND_BITS, dtype=np.int64)
    bb = multimodal.PHASH_BAND_BITS
    return tuple(
        int((bits[j * bb : (j + 1) * bb] * weights).sum())
        for j in range(multimodal.PHASH_NBANDS)
    )


def _png_bands_by_doc(spark, sf: str) -> dict[int, tuple[int, ...]]:
    rows = multimodal.phash_png_bands_df(spark, sf).collect()
    return {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in rows}


def test_png_decode_parity_on_random_strings(spark, tmp_path):
    """The dHash through the REAL compressed round trip (encode_png →
    CRC-verified inflate + five-filter reconstruction → resize) equals
    the byte replay at PNG_WIDTH, over 200 seeded random strings
    spanning heights 1–12 and every padding shape — a wrong byte
    anywhere in the defilter logic breaks a hash here."""
    import random

    rng = random.Random(1201)
    alphabet = [chr(c) for c in range(32, 127)]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 400)))
        for _ in range(200)
    ]
    root = tmp_path / "rand_png"
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/documents.parquet")
    got = _png_bands_by_doc(spark, str(root))
    for i, t in enumerate(texts):
        assert got[i] == _replay_bands_w(t, multimodal.PNG_WIDTH), i


def test_png_banded_equals_allpairs_truth(spark):
    """Recall 1.0 realized for the PNG-path miner: the banded
    candidate+verify output equals brute-force all-pairs Hamming truth
    over the PNG-path hashes at sf0.001."""
    bands = _png_bands_by_doc(spark, SF)
    truth = sorted(
        (a, b, _hamming(bands[a], bands[b]))
        for a, b in itertools.combinations(sorted(bands), 2)
        if _hamming(bands[a], bands[b]) <= multimodal.PHASH_MAX_HAMMING
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal.dedup_phash_png(spark, SF).collect()
    )
    assert got == truth


def test_png_and_bmp_hash_spaces_differ(spark):
    """PNG_WIDTH (12) ≠ BMP_WIDTH (16): the thumbnails sample different
    pixels, so the two entries are genuinely distinct capabilities —
    at least one document must hash differently."""
    bmp = _bands_by_doc(spark, SF)
    png = _png_bands_by_doc(spark, SF)
    assert any(bmp[d] != png[d] for d in bmp)


# ---------------------------------------------------------------------------
# Round 12 (staged): JPEG-path phash kernel
# ---------------------------------------------------------------------------
def _replay_bands_jpeg(text: str) -> tuple[int, ...]:
    """Byte replay of the JPEG-path dHash: payload byte i becomes a
    constant 8×8 grayscale tile at (i // BW, i % BW) (zero-padded),
    decode returns the 3-channel replication, so thumbnail gray at
    (r, c) = 3 × byte[(row8)·BW + col8] with the same floor
    arithmetic as resize_nearest on the 8·BW × 8·BH image."""
    BW = multimodal.PHASH_JPEG_BLOCKS_W

    raw = text.encode("utf-8")
    g = multimodal.PHASH_GRID
    bh = max(1, -(-len(raw) // BW))
    data = raw + b"\x00" * (BW * bh - len(raw))
    tiles = np.frombuffer(data, np.uint8).reshape(bh, BW).astype(np.int64)
    H, W = 8 * bh, 8 * BW
    rows = (np.arange(g) * H) // g
    cols = (np.arange(g + 1) * W) // (g + 1)
    gray = 3 * tiles[rows // 8][:, cols // 8]
    bits = (gray[:, :-1] > gray[:, 1:]).astype(np.int64).ravel()
    weights = 1 << np.arange(multimodal.PHASH_BAND_BITS, dtype=np.int64)
    bb = multimodal.PHASH_BAND_BITS
    return tuple(
        int((bits[j * bb : (j + 1) * bb] * weights).sum())
        for j in range(multimodal.PHASH_NBANDS)
    )


def test_jpeg_decode_parity_on_random_strings(spark, tmp_path):
    """The dHash through the REAL lossy-codec round trip (baseline
    JPEG: marker walk, file-read Huffman tables, byte unstuffing,
    dequantize, float IDCT — exactly invertible on constant tiles)
    equals the independent byte replay, over 120 seeded random
    strings. This is the staged kernel for a round-13 dedup_phash_jpeg
    entry (the r12 rotation window is at capacity)."""
    import random

    rng = random.Random(1202)
    alphabet = [chr(c) for c in range(32, 127)]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200)))
        for _ in range(120)
    ]
    root = tmp_path / "rand_jpeg"
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/documents.parquet")
    rows = multimodal.phash_jpeg_bands_df(spark, str(root)).collect()
    got = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in rows}
    for i, t in enumerate(texts):
        assert got[i] == _replay_bands_jpeg(t), f"mismatch at doc {i}"


def _jpeg_bands_by_doc(spark, sf: str) -> dict[int, tuple[int, ...]]:
    rows = multimodal.phash_jpeg_bands_df(spark, sf).collect()
    return {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in rows}


def test_jpeg_banded_equals_allpairs_truth(spark):
    """Recall 1.0 realized for the JPEG-path miner (registered r14):
    the banded candidate+verify output equals brute-force all-pairs
    Hamming truth over the JPEG-path hashes at sf0.001."""
    bands = _jpeg_bands_by_doc(spark, SF)
    truth = sorted(
        (a, b, _hamming(bands[a], bands[b]))
        for a, b in itertools.combinations(sorted(bands), 2)
        if _hamming(bands[a], bands[b]) <= multimodal.PHASH_MAX_HAMMING
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal.dedup_phash_jpeg(spark, SF).collect()
    )
    assert got == truth


def test_jpeg_hash_space_differs_from_bmp_and_png(spark):
    """JPEG blocks give an effective 32-px-wide image sampled on 8-px
    tiles — a third genuine hash space, not a re-badge of either
    sibling."""
    bmp = _bands_by_doc(spark, SF)
    png = _png_bands_by_doc(spark, SF)
    jpg = _jpeg_bands_by_doc(spark, SF)
    assert any(jpg[d] != bmp[d] for d in jpg)
    assert any(jpg[d] != png[d] for d in jpg)
