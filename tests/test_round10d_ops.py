"""Round-10 additions, fourth wave: bigram LM scoring and the
Count-Min frequency sketch. Semantic invariants + pure-Python replays;
engine-vs-oracle equality is the driver gate's job."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    sketches,
    textops,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").collect()


# ---------------------------------------------------------------------------
# text_bigram_logprob
# ---------------------------------------------------------------------------


def test_bigram_logprob_matches_python_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    c1: Counter = Counter()
    c2: Counter = Counter()
    vocab = set()
    toks = {}
    for d in docs:
        ts = d.text.strip().split()
        toks[d.doc_id] = ts
        c1.update(ts)
        vocab.update(ts)
        c2.update(zip(ts, ts[1:]))
    nv = len(vocab)
    expect = {}
    for doc_id, ts in toks.items():
        if len(ts) < 2:
            continue
        lp = [
            math.log((c2[(a, b)] + 1) / (c1[a] + nv))
            for a, b in zip(ts, ts[1:])
        ]
        expect[doc_id] = (len(lp), round(sum(lp) / len(lp), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.mean_logprob2)
        for r in textops.text_bigram_logprob(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert abs(got[k][1] - expect[k][1]) < 1e-9, k


def test_bigram_score_penalizes_shuffled_order(spark, sf_dir):
    """Sequence-awareness: reversing every document's tokens (same
    unigram mix, destroyed bigram structure) must lower the corpus mean
    score — the signal the unigram entry cannot see."""
    docs = _docs(spark, sf_dir)
    c1: Counter = Counter()
    c2: Counter = Counter()
    vocab = set()
    for d in docs:
        ts = d.text.strip().split()
        c1.update(ts)
        vocab.update(ts)
        c2.update(zip(ts, ts[1:]))
    nv = len(vocab)

    def corpus_mean(transform):
        tot, n = 0.0, 0
        for d in docs:
            ts = transform(d.text.strip().split())
            for a, b in zip(ts, ts[1:]):
                tot += math.log((c2[(a, b)] + 1) / (c1[a] + nv))
                n += 1
        return tot / n

    assert corpus_mean(lambda ts: ts) > corpus_mean(
        lambda ts: list(reversed(ts))
    )


# ---------------------------------------------------------------------------
# sketch_count_min
# ---------------------------------------------------------------------------


def _cms_bucket(i: int, token: str) -> int:
    h = hashlib.md5(f"cms{i}:{token}".encode()).hexdigest()
    return int(h[:15], 16) % sketches.CMS_WIDTH


def test_count_min_matches_python_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    freq: Counter = Counter()
    for d in docs:
        freq.update(d.text.strip().split())
    cells: Counter = Counter()
    for t, c in freq.items():
        for i in range(sketches.CMS_DEPTH):
            cells[(i, _cms_bucket(i, t))] += c
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[
        : sketches.CMS_TOPK
    ]
    expect = {
        t: (c, min(cells[(i, _cms_bucket(i, t))] for i in range(sketches.CMS_DEPTH)))
        for t, c in top
    }
    got = {
        r.token: (r.n_exact, r.n_cms)
        for r in sketches.sketch_count_min(spark, sf_dir).collect()
    }
    assert got == expect


def test_count_min_never_underestimates(spark, sf_dir):
    rows = sketches.sketch_count_min(spark, sf_dir).collect()
    assert len(rows) == sketches.CMS_TOPK
    for r in rows:
        assert r.n_cms >= r.n_exact, r.token
