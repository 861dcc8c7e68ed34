"""Round-5 additions: stdlib PNG codec, derived LSH/IVF knobs,
shuffle-free minhash/simhash signatures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    multimodal,
    similarity,
)


# ---------------------------------------------------------------------------
# PNG codec (stdlib zlib + per-row filters)
# ---------------------------------------------------------------------------
def test_png_round_trip_all_filters():
    """A payload tall enough to cycle every filter type (None/Sub/Up/
    Average/Paeth — the encoder assigns filter y%5 to row y) must
    reconstruct exactly."""
    raw = bytes(range(256)) * 4  # 1024 bytes → 29 rows at width 12
    png = multimodal.encode_png(raw)
    w, h, img = multimodal.decode_png(png)
    assert (w, h) == (multimodal.PNG_WIDTH, 29)
    flat = bytes(img.reshape(-1))
    assert flat[: len(raw)] == raw
    assert all(b == 0 for b in flat[len(raw) :])


@settings(max_examples=40, deadline=None)
@given(
    raw=st.binary(min_size=0, max_size=400),
    width=st.integers(min_value=1, max_value=21),
)
def test_png_round_trip_property(raw, width):
    """For ANY payload and width, decode(encode(raw)) recovers the
    zero-padded payload through deflate + defilter."""
    png = multimodal.encode_png(raw, width=width)
    w, h, img = multimodal.decode_png(png)
    assert w == width and h == max(1, -(-len(raw) // (3 * width)))
    flat = bytes(img.reshape(-1))
    assert flat[: len(raw)] == raw
    assert all(b == 0 for b in flat[len(raw) :])


def test_png_rgba_alpha_dropped():
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, 4 * 12 * 6, dtype=np.uint8).tobytes()
    png = multimodal.encode_png(raw, channels=4)
    w, h, img = multimodal.decode_png(png)
    exp = np.frombuffer(raw, np.uint8).reshape(6, 12, 4)[:, :, :3]
    assert (w, h) == (12, 6)
    assert (img == exp).all()


def test_png_crc_corruption_detected():
    png = bytearray(multimodal.encode_png(b"some payload bytes here"))
    png[20] ^= 0xFF  # flip a bit inside IHDR
    try:
        multimodal.decode_png(bytes(png))
    except ValueError as e:
        assert "CRC" in str(e)
    else:  # pragma: no cover
        raise AssertionError("corrupted chunk not detected")


def test_decode_image_dispatches_by_magic():
    raw = b"pixels" * 20
    w_b, h_b, img_b = multimodal.decode_image(multimodal.encode_bmp(raw))
    w_p, h_p, img_p = multimodal.decode_image(multimodal.encode_png(raw))
    # same byte→pixel mapping, different widths per codec constant
    assert w_b == multimodal.BMP_WIDTH and w_p == multimodal.PNG_WIDTH
    assert bytes(img_b.reshape(-1))[: len(raw)] == raw
    assert bytes(img_p.reshape(-1))[: len(raw)] == raw


# ---------------------------------------------------------------------------
# Derived index knobs (scale with corpus count, engine-mirrored)
# ---------------------------------------------------------------------------
def test_derived_lsh_bits_monotone_and_bounded():
    prev = 0
    for n in (1, 100, 500, 2000, 32000, 10**6, 10**9):
        b = similarity.derived_lsh_bits(n)
        assert similarity.LSH_MIN_BITS <= b <= similarity.LSH_MAX_BITS
        assert b >= prev
        prev = b
    # the documented rule: smallest b with 2^b * target >= n
    assert similarity.derived_lsh_bits(500) == 4
    assert similarity.derived_lsh_bits(2000) == 6
    assert similarity.derived_lsh_bits(32000) == 10


def test_derived_ivf_params_gate_scale_and_growth():
    # gate scales (n=500) must reproduce the measured-good 16/8
    assert similarity.derived_ivf_params(500) == (16, 8)
    ncl, npr = similarity.derived_ivf_params(32000)
    assert (ncl, npr) == (128, 4)
    for n in (1, 500, 2000, 32000, 10**6):
        ncl, npr = similarity.derived_ivf_params(n)
        assert similarity.IVF_MIN_CLUSTERS <= ncl <= similarity.IVF_MAX_CLUSTERS
        assert ncl & (ncl - 1) == 0  # power of two
        assert similarity.IVF_MIN_NPROBE <= npr <= ncl or npr == ncl


def test_derived_knobs_match_duckdb_params_cte():
    """The Spark-side integer derivations and the oracles' params CTEs
    must compute identical values for any corpus count — this is what
    lets the driver hash-check the derived-knob entries at every sf."""
    import duckdb

    con = duckdb.connect()
    for n in (1, 129, 500, 2000, 32000, 10**6):
        con.execute(
            f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM range({n})"
        )
        (bits,) = con.execute(
            "SELECT * FROM (" + similarity.SQL_LSH_PARAMS + ")"
        ).fetchone()
        assert bits == similarity.derived_lsh_bits(n)
        ncl, npr = con.execute(
            "SELECT * FROM (" + similarity.SQL_IVF_PARAMS + ")"
        ).fetchone()
        assert (ncl, npr) == similarity.derived_ivf_params(n)


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------
def _pq_reference(vectors):
    """Independent numpy re-implementation of the PQ spec: seeded
    codebook (the K lowest-md5(vec_id) subvectors — the hash-ordered
    deterministic sample), one Lloyd step with floor-mean recenter,
    final integer-L2 encode."""
    import hashlib
    import math

    M, SD, K = similarity.PQ_M, similarity.PQ_SUBDIM, similarity.PQ_K
    ids = sorted(vectors)
    mat = np.array([vectors[i] for i in ids], dtype=np.int64).reshape(
        len(ids), M, SD
    )
    seed_ids = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:K]
    seed_rows = [ids.index(i) for i in seed_ids]
    cb = mat[seed_rows].transpose(1, 0, 2).copy()  # seeds: (M, K, SD)

    def dists(cb_):
        x2 = (mat * mat).sum(axis=2)
        dots = np.einsum("bmd,mkd->bmk", mat, cb_)
        c2 = (cb_ * cb_).sum(axis=2)
        return x2[:, :, None] - 2 * dots + c2[None, :, :]

    a0 = dists(cb).argmin(axis=2)  # (n, M)
    c1 = cb.copy()
    for m in range(M):
        for k in range(K):
            members = mat[a0[:, m] == k, m, :]
            if len(members):
                s = members.sum(axis=0)
                c1[m, k] = [math.floor(float(v) / len(members)) for v in s]
    d1 = dists(c1)
    a1 = d1.argmin(axis=2)
    err2 = np.take_along_axis(d1, a1[:, :, None], axis=2)[:, :, 0].sum(axis=1)
    packed = (a1.astype(np.int64) << (4 * np.arange(M, dtype=np.int64))).sum(axis=1)
    return {i: (int(p), int(e)) for i, p, e in zip(ids, packed, err2)}


def test_embedding_pq_matches_numpy_reference(spark, sf_dir):
    """Exact parity — codes AND integer reconstruction errors — with an
    independent from-the-spec implementation over the same grid."""
    qe = similarity.quantized_embeddings(spark, sf_dir)
    vectors = {r["vec_id"]: r["q"] for r in qe.collect()}
    expected = _pq_reference(vectors)
    got = {
        r["vec_id"]: (r["pq_code"], r["err2"])
        for r in similarity.embedding_pq(spark, sf_dir).collect()
    }
    assert got == expected


def test_embedding_pq_code_bounds_and_compression(spark, sf_dir):
    rows = similarity.embedding_pq(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["pq_code"] < (1 << (4 * similarity.PQ_M))
        assert r["err2"] >= 0
    # seeds reconstruct an exact codeword copy of themselves only if
    # their cluster didn't move; globally, SOME vector must quantize
    # with nonzero error on real data.
    assert any(r["err2"] > 0 for r in rows)


def test_ivfpq_refined_recall_gate(spark, sf_dir):
    """IVF-PQ with the built-in exact re-rank must recover most of the
    flat index's recall on the adversarial isotropic-noise corpus
    (measured 0.59 vs flat 0.82 at R=32; gate leaves noise margin).
    Candidates are ids-only, so recall is vs the exact bruteforce."""
    def topk(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        return out

    bf = topk(similarity.ann_topk_bruteforce(spark, sf_dir))
    ap = topk(similarity.ann_topk_ivfpq(spark, sf_dir))
    hits = sum(len(ap.get(v, set()) & s) for v, s in bf.items())
    tot = sum(len(s) for s in bf.values())
    assert tot > 0
    assert hits / tot >= 0.5


def test_ivfpq_output_contract(spark, sf_dir):
    """Exactly TOP_K ranked neighbors per query (enough candidates
    exist at gate scale), ranks contiguous from 1, no self-pairs."""
    rows = similarity.ann_topk_ivfpq(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["vec_id"]
        by_q.setdefault(r["vec_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= similarity.TOP_K


def test_bench_warehouse_csv_synthesis(spark, sf_dir, tmp_path):
    """The reference-native bench tool's master-CSV synthesis: three
    files in the reference's header shapes, transaction count equal to
    lineitem count, and keys that join (every tx product exists in the
    product master, every tx customer in the customer master)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.bench_warehouse import synthesize_master_csvs

    n = synthesize_master_csvs(spark, sf_dir, str(tmp_path))
    cust = spark.read.option("header", True).csv(str(tmp_path / "customer.csv"))
    prod = spark.read.option("header", True).csv(str(tmp_path / "product.csv"))
    tx = spark.read.option("header", True).csv(str(tmp_path / "tx.csv"))
    assert cust.columns[:3] == ["index", "Customer_ID", "Gender"]
    assert "price$" in prod.columns and "supplierName" in prod.columns
    assert tx.columns == ["orderID", "Customer_ID", "Product_ID", "quantity", "date"]
    assert tx.count() == n > 0
    assert tx.join(prod, "Product_ID", "left_anti").count() == 0
    assert tx.join(cust, "Customer_ID", "left_anti").count() == 0


def test_dedup_incremental_semantics(spark, sf_dir):
    """Boundary, verdict precedence, and match-side invariants — plus
    an independent exact-pass cross-check from raw fingerprints."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        dedup,
    )

    split = dedup._incr_split(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    incoming_ids = {
        r["doc_id"] for r in docs.filter(F.col("doc_id") >= split).collect()
    }
    rows = {r["doc_id"]: r for r in dedup.dedup_incremental(spark, sf_dir).collect()}
    assert set(rows) == incoming_ids  # one row per incoming doc

    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", F.md5(F.lower(F.trim("text"))).alias("fp")
        ).collect()
    }
    old_by_fp = {}
    for d, fp in fps.items():
        if d < split:
            old_by_fp.setdefault(fp, []).append(d)
    for d, r in rows.items():
        if r["verdict"] == "exact":
            assert r["match_id"] == min(old_by_fp[fps[d]])
            assert r["jaccard"] is None
        elif r["verdict"] == "near":
            assert r["match_id"] is not None and r["match_id"] < split
            assert r["jaccard"] >= dedup.NEAR_DUP_JACCARD
            assert fps[d] not in old_by_fp  # exact takes precedence
        else:
            assert r["match_id"] is None and r["jaccard"] is None
            assert fps[d] not in old_by_fp
    # the synthetic corpus plants near-dups across the boundary (exact
    # dups happen to fall within the indexed side at gate scales)
    verdicts = {r["verdict"] for r in rows.values()}
    assert "near" in verdicts and "novel" in verdicts
