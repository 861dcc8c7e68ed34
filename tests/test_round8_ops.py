"""Round-8 additions: exact distributed covariance over the embedding
corpus, and the driver union-find closure of the contracted multimodal
graph."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    clusters,
    similarity,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)


def test_covariance_matches_numpy_truth(spark, sf_dir):
    """The distributed second-moment statistics equal a single-machine
    numpy computation on the same 1e-6 grid — every output column is an
    exact integer, so the check is equality, not tolerance."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = np.floor(x * similarity.CENTROID_Q).astype(np.int64)
    n = len(q)
    gram = q.T @ q  # exact int64 at test scale

    out = {
        (r["dim_i"], r["dim_j"]): r
        for r in similarity.embedding_covariance(spark, sf_dir).collect()
    }
    d = similarity.EMB_DIM
    assert len(out) == d * (d + 1) // 2
    sums = q.sum(axis=0)
    for i in range(d):
        for j in range(i, d):
            r = out[(i + 1, j + 1)]
            assert int(r["sum_prod_q"]) == int(gram[i, j])
            assert int(r["sum_q_i"]) == int(sums[i])
            assert int(r["sum_q_j"]) == int(sums[j])
            assert r["n_vectors"] == n


def test_covariance_diagonal_is_variance(spark, sf_dir):
    """n·Σx² − (Σx)² ≥ 0 per dimension (the exact-integer variance
    numerator) — the statistics reconstruct a PSD diagonal."""
    out = similarity.embedding_covariance(spark, sf_dir)
    diag = out.filter(F.col("dim_i") == F.col("dim_j"))
    assert diag.count() == similarity.EMB_DIM
    bad = diag.filter(
        F.col("n_vectors") * F.col("sum_prod_q")
        - F.col("sum_q_i") * F.col("sum_q_j")
        < 0
    )
    assert bad.count() == 0


def test_drift_matches_numpy_truth(spark, sf_dir):
    """embedding_drift equals a single-machine recomputation: same
    watermark, same floor-mean grid centroids, exact integer shift."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "label", "embedding").collect()
    mx = max(r["vec_id"] for r in rows)
    split = math.floor(float(mx) * 0.8)
    by_label: dict = {}
    for r in rows:
        q = np.floor(
            np.array(r["embedding"], dtype=np.float64)
            * similarity.CENTROID_Q
        ).astype(np.int64)
        by_label.setdefault(r["label"], {"ref": [], "new": []})[
            "ref" if r["vec_id"] < split else "new"
        ].append(q)

    out = {
        r["label"]: r
        for r in similarity.embedding_drift(spark, sf_dir).collect()
    }
    assert set(out) == set(by_label)
    for label, halves in by_label.items():
        r = out[label]
        assert r["n_ref"] == len(halves["ref"])
        assert r["n_new"] == len(halves["new"])
        if halves["ref"] and halves["new"]:
            cref = np.floor(
                np.stack(halves["ref"]).sum(axis=0).astype(np.float64)
                / len(halves["ref"])
            ).astype(np.int64)
            cnew = np.floor(
                np.stack(halves["new"]).sum(axis=0).astype(np.float64)
                / len(halves["new"])
            ).astype(np.int64)
            d2 = int(((cnew - cref) ** 2).sum())
            assert int(r["drift2_q"]) == d2
            assert abs(
                r["drift"] - math.sqrt(d2) / similarity.CENTROID_Q
            ) < 1e-15
        else:
            assert r["drift2_q"] is None and r["drift"] is None


def test_unionfind_labels_min_roots():
    # chain 5-4-3 and pair 10-2, plus self-contained 7-7 loopless edge
    rows = [(5, 4), (4, 3), (10, 2), (2, 10)]
    labels = clusters._unionfind_labels(rows)
    assert labels == {5: 3, 4: 3, 3: 3, 10: 2, 2: 2}


def test_source_divergence_matches_numpy_truth(spark, sf_dir):
    """KL(P_source || P_corpus) equals a direct numpy recomputation
    (within the committed round-6 grid) and is nonnegative — Gibbs'
    inequality — with totals matching exact token counts."""
    import re as _re
    from collections import Counter

    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        textops,
    )

    docs = load_table(spark, sf_dir, "documents").collect()
    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for r in docs:
        toks = _re.split(r"\s+", r["text"].strip())
        per_src.setdefault(r["source"], Counter()).update(toks)
        corpus.update(toks)
    n_c = sum(corpus.values())

    out = {
        r["source"]: r
        for r in textops.text_source_divergence(spark, sf_dir).collect()
    }
    assert set(out) == set(per_src)
    for src, cnt in per_src.items():
        r = out[src]
        n_s = sum(cnt.values())
        assert r["n_tokens"] == n_s
        assert r["n_distinct"] == len(cnt)
        kl = sum(
            (c / n_s) * np.log((c / n_s) / (corpus[t] / n_c))
            for t, c in cnt.items()
        )
        assert r["kl_divergence"] >= 0
        assert abs(r["kl_divergence"] - kl) < 2e-6


def test_mjpeg_avi_roundtrip_exact():
    """Constant-tile frames under unit quantization decode back to the
    exact padded payload bytes, through the full container + per-frame
    JPEG decode."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    raw = bytes((7 * i + 3) % 256 for i in range(137))
    fb = mm._mjpeg_frame_bytes()
    nf = -(-len(raw) // fb)
    fr = mm.decode_avi_mjpeg(mm.encode_avi_mjpeg(raw))
    assert fr.shape == (nf, 8 * mm.MJPEG_BLOCK_ROWS, 32)
    pad = raw + b"\x00" * (nf * fb - len(raw))
    vals = np.frombuffer(pad, np.uint8).reshape(nf, mm.MJPEG_BLOCK_ROWS, 4)
    tiles = fr.reshape(nf, mm.MJPEG_BLOCK_ROWS, 8, 4, 8)
    assert np.array_equal(tiles[:, :, 0, :, 0], vals)
    assert np.all(tiles == tiles[:, :, :1, :, :1])  # constant 8x8 tiles


def test_mjpeg_avi_container_format():
    """The container is a real MJPEG AVI: RIFF/'AVI ' magic, 'MJPG'
    fccHandler and biCompression, '00dc' compressed-frame chunks each
    holding a standalone SOI..EOI JPEG, and an idx1 index."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    avi = mm.encode_avi_mjpeg(b"x" * 80)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert b"MJPG" in avi and b"idx1" in avi
    pos = avi.find(b"00dc")
    assert pos > 0
    (ln,) = np.frombuffer(avi[pos + 4 : pos + 8], np.uint32)
    frame = avi[pos + 8 : pos + 8 + int(ln)]
    assert frame[:2] == b"\xff\xd8" and frame[-2:] == b"\xff\xd9"


def test_mjpeg_and_dib_decoders_reject_each_other():
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        mm.decode_avi_mjpeg(mm.encode_avi(b"abc"))
    with _pytest.raises(NotImplementedError):
        mm.decode_avi(mm.encode_avi_mjpeg(b"abc"))


def test_multimodal_local_closure_matches_distributed(spark, sf_dir):
    """The direct driver union-find over the contracted edges must
    produce the same labels the generic ``connected_components`` path
    (the pre-round-8 formulation, with its own small-graph switch)
    produces — force it by dropping the module-level threshold."""
    out_local = {
        (r["doc_id"], r["component_id"], r["is_canonical"])
        for r in clusters.dedup_multimodal_components(spark, sf_dir).collect()
    }
    orig = clusters.LOCAL_EDGE_LIMIT
    clusters.LOCAL_EDGE_LIMIT = -1  # force the generic closure path
    try:
        out_dist = {
            (r["doc_id"], r["component_id"], r["is_canonical"])
            for r in clusters.dedup_multimodal_components(
                spark, sf_dir
            ).collect()
        }
    finally:
        clusters.LOCAL_EDGE_LIMIT = orig
    assert out_local == out_dist
