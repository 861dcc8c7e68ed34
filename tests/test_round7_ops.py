"""Round-7 operator tests: the μ-law (G.711) audio codec path."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.multimodal import (
    WAV_RATE,
    decode_wav,
    encode_wav_mulaw,
    mulaw_compress,
    mulaw_expand,
)


def test_mulaw_known_values():
    # G.711 anchors: 0 → 0xFF, expands back to exactly 0
    assert mulaw_compress(np.array([0], dtype=np.int16))[0] == 0xFF
    assert mulaw_expand(np.array([0xFF], dtype=np.uint8))[0] == 0
    # sign symmetry: compress(-x) flips only the sign bit of ~code
    x = np.array([1000, 8000, 30000], dtype=np.int16)
    pos = mulaw_compress(x)
    neg = mulaw_compress(-x)
    assert np.array_equal((~pos & 0xFF) ^ 0x80, ~neg & 0xFF)
    assert np.array_equal(mulaw_expand(neg), -mulaw_expand(pos))


def test_mulaw_full_domain_error_bounds():
    s = np.arange(-32768, 32768, dtype=np.int16)
    d = mulaw_expand(mulaw_compress(s))
    err = np.abs(d.astype(np.int64) - s.astype(np.int64))
    # log companding: absolute error grows with the segment; ≤ half a
    # quantization step everywhere below the clip region
    assert err.max() <= 1024
    small = np.abs(s.astype(np.int64)) <= 8158
    assert err[small].max() <= 256
    # expansion is monotone over the 128 positive codes
    codes = np.arange(128, 256, dtype=np.uint8)  # positive half
    vals = mulaw_expand(codes)
    assert np.all(np.diff(vals) < 0)  # 0xFF is 0; codes descend


def test_mulaw_container_roundtrip_and_format_guard():
    raw = bytes(range(256)) + b"voice"
    wav = encode_wav_mulaw(raw)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    # fact chunk present (spec requirement for non-PCM)
    assert b"fact" in wav
    rate, dec = decode_wav(wav)
    assert rate == WAV_RATE and len(dec) == len(raw)
    orig = ((np.frombuffer(raw, np.uint8).astype(np.int64) - 128) * 256)
    want = mulaw_expand(mulaw_compress(orig.astype(np.int16)))
    assert np.array_equal(dec, want)
    # a non-supported format tag (e.g. ADPCM=2) must raise, not garble
    bad = bytearray(wav)
    fmt_at = wav.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at, 2)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_mulaw_container_roundtrip_property(data):
    _, dec = decode_wav(encode_wav_mulaw(data))
    n = max(1, len(data))
    orig = np.zeros(n, dtype=np.int16)
    if data:
        orig[: len(data)] = (
            np.frombuffer(data, np.uint8).astype(np.int16) - 128
        ) * 256
    assert np.array_equal(dec, mulaw_expand(mulaw_compress(orig)))
    # quantization error bound holds through the container
    assert np.abs(dec.astype(np.int64) - orig.astype(np.int64)).max() <= 1024


def test_mulaw_entry_matches_pcm_entry_shape(spark, sf_dir):
    """The μ-law entry mirrors the PCM entry's row set (same docs, same
    n_samples) and its decoded stats stay within the companding error
    of the PCM stats."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        multimodal as mm,
    )

    pcm = {r.doc_id: r for r in mm.multimodal_audio_stats(spark, sf_dir).collect()}
    ml = {r.doc_id: r for r in mm.multimodal_audio_mulaw(spark, sf_dir).collect()}
    assert pcm.keys() == ml.keys()
    for doc_id, r in ml.items():
        assert r.n_samples == pcm[doc_id].n_samples
        assert r.max_quant_err <= 1024
        assert abs(r.mean_abs - pcm[doc_id].mean_abs) <= r.mean_quant_err + 1e-9


def test_minhash_signature_formulations_agree(spark, sf_dir):
    """The JVM MIN-aggregate signature path (from the shingle relation)
    must equal the Arrow text-kernel path bit-for-bit — same hash
    family, same no-shingles-no-signature contract."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    kernel = {
        r.doc_id: list(r.sig) for r in dedup.minhash_signatures(docs).collect()
    }
    sql = {
        r.doc_id: list(r.sig)
        for r in dedup.minhash_signatures_from_shingles(
            dedup.shingles(docs)
        ).collect()
    }
    assert kernel == sql
    assert len(kernel) > 0
