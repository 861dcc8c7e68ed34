"""Broadcast Bloom filter over document fingerprints — the pre-join
gate for the streaming ingest dedup path.

Shape at 100 TB: the indexed corpus's fingerprint table is O(corpus)
rows, far too big to broadcast, so the stream-static exact-dup join
must shuffle — unless definite novels (the overwhelming majority of a
healthy ingest) are dropped before the join ever sees them. A Bloom
filter over the indexed fingerprints is the standard refinement: ~10
bits per indexed key at 1 % false-positive rate (≈1.2 GB for 10⁹ keys —
a legitimate executor broadcast; beyond that, shard by fingerprint
prefix and probe the matching shard). Only the ≤1 % false positives
plus the true duplicates reach the join.

The build is distributed: every Arrow batch folds its fingerprints
into a local bitmap and emits one fixed-size binary row; the driver
ORs the partial bitmaps (it receives O(batches) bitmap rows, never the
keys — at true 10⁹-key scale, insert a partition-keyed OR-reduce
before the driver merge to cap the collect). The probe is an
Arrow-batched pandas UDF (one md5 per value, Kirsch–Mitzenmacher
double hashing — no per-hash rehash). Round 10 replaced the original
RDD ``mapPartitions`` + ``treeReduce`` build: same math, but the RDD
path spun up a separate non-Arrow python worker pool — a one-time
~2 s cost the bench variance study traced — where the Arrow kernel
reuses the already-warm workers.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LN2 = math.log(2.0)


def _h12(value: str) -> tuple[int, int]:
    """Two independent 60-bit hashes from one md5 (h2 forced odd so the
    double-hash sequence cycles through all positions)."""
    d = hashlib.md5(value.encode("utf-8")).hexdigest()
    return int(d[:15], 16), int(d[15:30], 16) | 1


def _positions(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) uint64 probe positions via Kirsch–Mitzenmacher double
    hashing, vectorized over the batch."""
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m)


@dataclass(frozen=True)
class FingerprintBloom:
    """Immutable bitmap + parameters; safe to capture in UDF closures
    (Spark ships it once per task via the closure broadcast)."""

    bits: np.ndarray  # uint8, length m // 8
    m: int  # number of bits (multiple of 8)
    k: int  # hash count

    def might_contain(self, value: str | None) -> bool:
        if value is None or self.m == 0:
            return False
        h1, h2 = _h12(value)
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            if not (self.bits[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True

    def might_contain_udf(self) -> Column:
        """Arrow-batched probe: fp column → boolean (False = definitely
        not indexed). Per batch: one md5 per value (the only per-row
        Python), then the k probe positions and bit tests for the whole
        batch as three vectorized uint64 ops (max position value is
        h1 + 6·h2 < 7·2^60, inside uint64)."""
        bits, m, k = self.bits, self.m, self.k

        @F.pandas_udf("boolean")
        def probe(values: pd.Series) -> pd.Series:
            if not m or values.empty:
                return pd.Series(np.zeros(len(values), dtype=bool))
            mask = values.notna().to_numpy()
            h = np.array(
                [_h12(v) if ok else (0, 1) for v, ok in zip(values, mask)],
                dtype=np.uint64,
            )
            pos = _positions(h[:, 0], h[:, 1], m, k)
            probed = bits[(pos >> np.uint64(3)).astype(np.int64)]
            hit = ((probed >> (pos & np.uint64(7)).astype(np.uint8)) & 1).all(
                axis=1
            )
            return pd.Series(hit & mask)

        return probe

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(self.bits).sum())


def portable_bloom_params(n: int) -> tuple[int, int]:
    """Integer-only (m, k) sizing: m = 2^(bitlength(n)+3) bits (16–32
    bits/key), k = 7. No float ln/ceil anywhere, so a SQL oracle
    derives the identical parameters from the same count — the float
    formula in ``build_bloom`` is NOT cross-engine reproducible (ln is
    not correctly rounded), this one is."""
    if n == 0:
        return 0, 1
    return 1 << (n.bit_length() + 3), 7


def build_bloom(
    keys: DataFrame,
    column: str = "fp",
    fpp: float = 0.01,
    n: int | None = None,
    m: int | None = None,
    k: int | None = None,
) -> FingerprintBloom:
    """Build a Bloom filter over ``keys[column]`` with target
    false-positive rate ``fpp``. ``n`` overrides the sizing count (pass
    it when the caller already knows the cardinality — saves a pass);
    explicit ``m``/``k`` (e.g. from ``portable_bloom_params``) bypass
    the float sizing formula entirely."""
    if n is None:
        n = keys.count()
    if n == 0:
        return FingerprintBloom(np.zeros(0, dtype=np.uint8), 0, 1)
    if m is None:
        m = math.ceil(-(n * math.log(fpp)) / (_LN2 * _LN2))
        m = ((m + 7) // 8) * 8
    if k is None:
        k = max(1, round(m / n * _LN2))

    # Arrow-batched partial bitmaps (round 10 — this replaced an RDD
    # mapPartitions + treeReduce: same math, but the RDD path spun up
    # its own non-Arrow python worker pool, a one-time ~2 s cost the
    # bench variance study traced; the Arrow kernel reuses the workers
    # every other operator already warmed). Each batch folds its keys
    # into a local m/8-byte bitmap and emits ONE binary row; the
    # driver ORs the ≤(partitions · batches) bitmaps — it receives
    # O(batches) fixed-size rows, never the keys. Bitmap OR is
    # commutative/associative, so the result is order-independent.
    import pandas as pd

    def fold(batches):
        for pdf in batches:
            local = np.zeros(m // 8, dtype=np.uint8)
            vals = [v for v in pdf[column] if v is not None]
            if vals:
                h = np.array([_h12(v) for v in vals], dtype=np.uint64)
                pos = _positions(h[:, 0], h[:, 1], m, k).ravel()
                np.bitwise_or.at(
                    local,
                    (pos >> np.uint64(3)).astype(np.int64),
                    np.left_shift(
                        np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                    ),
                )
            yield pd.DataFrame({"bits": [local.tobytes()]})

    parts = keys.select(column).mapInPandas(fold, schema="bits binary")
    bits = np.zeros(m // 8, dtype=np.uint8)
    for row in parts.collect():
        bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return FingerprintBloom(bits, m, k)
