"""Round-4 additions: real BMP codec, decode-stats pipeline, and the
deterministic ANN/candidate machinery."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    multimodal,
    similarity,
)


def test_bmp_round_trip():
    """encode → decode recovers the payload bytes as RGB pixels
    (row-major, zero-padded), with correct dimensions."""
    raw = bytes(range(256)) * 3  # 768 bytes → 16 px wide, 16 rows
    bmp = multimodal.encode_bmp(raw)
    w, h, img = multimodal.decode_bmp(bmp)
    assert (w, h) == (16, 16)
    expect = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    assert (img == expect).all()


def test_bmp_round_trip_with_padding():
    """Payload not divisible by 3·W zero-pads the final row; odd widths
    exercise the 4-byte row padding the format requires."""
    raw = b"abcdefg"
    bmp = multimodal.encode_bmp(raw, width=2)  # row = 6 bytes + 2 pad
    w, h, img = multimodal.decode_bmp(bmp)
    assert (w, h) == (2, 2)
    flat = img.reshape(-1)
    assert bytes(flat[:7]) == raw and (flat[7:] == 0).all()


def test_decode_bmp_parses_foreign_topdown_file():
    """The decoder reads real header fields (offset, negative height =
    top-down rows), not just its own writer's layout: a hand-built BMP
    with an enlarged header gap and top-down row order decodes
    correctly."""
    width, height = 2, 2
    # pixel rows top-down, BGR: red pixel then blue, green then white
    rows = bytes(
        [0, 0, 255, 255, 0, 0, 0, 0]  # row0: red, blue + 2 pad bytes
        + [0, 255, 0, 255, 255, 255, 0, 0]  # row1: green, white + pad
    )
    offset = 54 + 10  # 10 junk bytes between headers and pixels
    header = struct.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, -height, 1, 24, 0, len(rows), 0, 0, 0, 0
    )
    payload = header + info + b"\xee" * 10 + rows
    w, h, img = multimodal.decode_bmp(payload)
    assert (w, h) == (width, height)
    assert img[0, 0].tolist() == [255, 0, 0]  # red
    assert img[0, 1].tolist() == [0, 0, 255]  # blue
    assert img[1, 0].tolist() == [0, 255, 0]  # green
    assert img[1, 1].tolist() == [255, 255, 255]


@settings(max_examples=40, deadline=None)
@given(
    raw=st.binary(min_size=0, max_size=400),
    width=st.integers(min_value=1, max_value=21),
)
def test_bmp_round_trip_property(raw, width):
    """For ANY payload and width, decode(encode(raw)) recovers the
    zero-padded payload, and the file's row stride honors the 4-byte
    alignment the format requires."""
    bmp = multimodal.encode_bmp(raw, width=width)
    w, h, img = multimodal.decode_bmp(bmp)
    assert w == width and h == max(1, -(-len(raw) // (3 * width)))
    flat = bytes(img.reshape(-1))
    assert flat[: len(raw)] == raw
    assert all(b == 0 for b in flat[len(raw):])
    expected_size = 54 + ((3 * width + 3) // 4 * 4) * h
    assert len(bmp) == expected_size


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(10**6), max_value=10**6),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_int_sims_matches_direct_cosine(qs):
    """The kernel's grid cosine equals the scalar expression the SQL
    oracle evaluates: dot / (sqrt(max(n2a,1)) * sqrt(max(n2b,1)))."""
    pdf = pd.DataFrame({"q": [np.array(q, dtype=np.int64) for q in qs]})
    sims = similarity.int_sims(pdf, pdf)
    for i, a in enumerate(qs):
        for j, b in enumerate(qs):
            dot = sum(x * y for x, y in zip(a, b))
            n2a = max(sum(x * x for x in a), 1)
            n2b = max(sum(x * x for x in b), 1)
            expect = float(dot) / (np.sqrt(float(n2a)) * np.sqrt(float(n2b)))
            assert sims[i, j] == expect


def test_resize_nearest_indexing():
    img = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(8, 4, 3)
    small = multimodal.resize_nearest(img, 2, 2)
    # src row = (out·8)//2 → {0, 4}; src col = (out·4)//2 → {0, 2}
    assert (small == img[[0, 4]][:, [0, 2]]).all()


def test_resize_image_reencodes_real_bmp():
    raw = bytes(range(96))  # 16×2 image
    resized = multimodal.resize_image(multimodal.encode_bmp(raw), 4, 4)
    w, h, img = multimodal.decode_bmp(resized)
    assert (w, h) == (4, 4)
    src_w, src_h, src = multimodal.decode_bmp(multimodal.encode_bmp(raw))
    assert (img == multimodal.resize_nearest(src, 4, 4)).all()


def test_decode_stats_matches_hand_computation(spark, sf_dir):
    """One spot-check row: the pipeline's means/checksum equal a direct
    numpy computation on the document's bytes."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )

    doc = load_table(spark, sf_dir, "documents").orderBy("doc_id").first()
    row = (
        multimodal.multimodal_decode_stats(spark, sf_dir)
        .filter(f"doc_id = {doc.doc_id}")
        .first()
    )
    raw = doc.text.encode()
    h = max(1, -(-len(raw) // 48))
    data = np.frombuffer(raw + b"\x00" * (48 * h - len(raw)), np.uint8)
    img = data.reshape(h, 16, 3)
    assert (row.width, row.height) == (16, h)
    assert row.mean_r == img[:, :, 0].astype(np.int64).sum() / float(16 * h)
    small = multimodal.resize_nearest(img, 4, 4)
    assert row.thumb_sum == int(small.astype(np.int64).sum())


def test_random_projection_matches_numpy(spark, sf_dir):
    """Projected components equal an independent numpy matmul of the
    quantized vectors with the module's RP plane list."""
    qe = similarity.quantized_embeddings(spark, sf_dir)
    sample = {r.vec_id: np.array(r.q, dtype=np.int64) for r in qe.limit(10).collect()}
    proj = {
        r.vec_id: [r[f"p{k}"] for k in range(similarity.RP_DIM)]
        for r in similarity.embedding_random_projection(spark, sf_dir)
        .filter(F_in("vec_id", sample))
        .collect()
    }
    pm = np.array(similarity._RP_PLANES, dtype=np.int64)
    for vid, q in sample.items():
        assert proj[vid] == list(pm @ q)


def F_in(col, keys):
    from pyspark.sql import functions as F

    return F.col(col).isin(*[int(k) for k in keys])


def test_scalar_quantize_bounds(spark, sf_dir):
    """Codes stay in {0..SQ_LEVELS}; reconstruction error is bounded by
    one quantization step of that dimension's range."""
    rows = similarity.embedding_scalar_quantize(spark, sf_dir).collect()
    assert len(rows) == 500 * 64
    by_dim: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.code <= similarity.SQ_LEVELS
        by_dim.setdefault(r.dim, []).append(r.abs_err)
    # max error per dim ≤ step = range/SQ_LEVELS; spot-check via the
    # documents' value range (|v| < 1 → step < 2/255)
    for dim, errs in by_dim.items():
        assert max(errs) <= 2.0 / similarity.SQ_LEVELS


def test_lsh_buckets_match_plane_signs(spark, sf_dir):
    """Bucket ids equal the sign pattern of exact integer plane dots —
    recomputed independently in numpy from the module's plane list."""
    qe = similarity.quantized_embeddings(spark, sf_dir).limit(20)
    tagged = similarity.lsh_tagged(qe, similarity.LSH_TABLES, similarity.LSH_HYPERPLANES)
    rows = tagged.collect()
    planes = np.array(
        similarity._PLANES[: similarity.LSH_TABLES * similarity.LSH_HYPERPLANES],
        dtype=np.int64,
    )
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.tbl] = (r.bucket, r.q)
    for vec_id, tbls in by_vec.items():
        assert len(tbls) == similarity.LSH_TABLES
        for t, (bucket, q) in tbls.items():
            dots = planes[
                t * similarity.LSH_HYPERPLANES : (t + 1) * similarity.LSH_HYPERPLANES
            ] @ np.array(q, dtype=np.int64)
            expect = sum(1 << h for h, d in enumerate(dots) if d > 0)
            assert bucket == expect
