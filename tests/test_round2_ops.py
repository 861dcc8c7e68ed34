"""Invariant tests for the round-2 operator additions: split
assignment, PII scrubbing, unigram LM scoring, sliding-window chunking,
GROUPING SETS time rollup, and nearest-centroid classification.

The oracle gate value-checks each against DuckDB at sf0.01; these pin
the semantic laws at smoke scale (hand-recomputation on real rows,
partition laws, determinism) so a refactor that keeps the SQL twin in
sync but breaks the semantics still fails.
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    curation,
    sampling,
    similarity,
    textops,
    timeseries,
)


def test_split_assign_total_partition_and_determinism(spark, sf_dir):
    out = sampling.sample_split_assign(spark, sf_dir)
    rows = out.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs  # every doc assigned exactly once
    assert {r.split for r in rows} <= {"train", "val", "test"}
    again = {r.doc_id: r.split for r in sampling.sample_split_assign(spark, sf_dir).collect()}
    assert {r.doc_id: r.split for r in rows} == again  # rerun-stable


def test_split_assign_matches_salted_hash(spark, sf_dir):
    rows = sampling.sample_split_assign(spark, sf_dir).limit(50).collect()
    for r in rows:
        b = hashlib.md5(f"{sampling.SPLIT_SALT}{r.doc_id}".encode()).hexdigest()[:2]
        expect = (
            "train" if b <= sampling.TRAIN_MAX
            else "val" if b <= sampling.VAL_MAX
            else "test"
        )
        assert r.split == expect, (r.doc_id, b)


def test_pii_scrub_detects_injected_and_redacts(spark, sf_dir):
    out = {r.doc_id: r for r in textops.text_pii_scrub(spark, sf_dir).collect()}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(10)
        .collect()
    )
    assert docs
    for d in docs:
        r = out[d.doc_id]
        # the injected variant carries exactly one of each PII kind
        # (the word-soup corpus contributes none)
        assert r.n_emails == 1 and r.n_ips == 1 and r.n_phones == 1
        pii = (
            f"{d.text} contact user{d.doc_id}@example.com from "
            f"10.0.{d.doc_id % 256}.25 call 555-01{d.doc_id % 100:02d}"
        )
        red = re.sub(textops.PII_EMAIL, "<EMAIL>", pii)
        red = re.sub(textops.PII_IPV4, "<IP>", red)
        red = re.sub(textops.PII_PHONE, "<PHONE>", red)
        assert r.redacted_len == len(red)
        assert r.redacted_fp == hashlib.md5(red.encode()).hexdigest()
        # nothing PII-shaped survives redaction
        for pat in (textops.PII_EMAIL, textops.PII_IPV4, textops.PII_PHONE):
            assert not re.search(pat, red)


def test_unigram_logprob_bounds_and_token_count(spark, sf_dir):
    lp = {r.doc_id: r for r in textops.text_unigram_logprob(spark, sf_dir).collect()}
    tc = {r.doc_id: r for r in textops.text_token_count(spark, sf_dir).collect()}
    assert lp.keys() == tc.keys()
    for doc_id, r in lp.items():
        assert r.n_tokens == tc[doc_id].n_tokens
        # MLE log-prob of an observed token is <= 0, and = 0 only in a
        # degenerate single-token corpus
        assert r.mean_logprob < 0


def test_chunk_overlap_hand_recomputed(spark, sf_dir):
    out = curation.curation_chunk_overlap(spark, sf_dir)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(25)
        .collect()
    )
    C, S = curation.CHUNK_TOKENS, curation.CHUNK_STRIDE
    for d in docs:
        toks = re.split(r"\s+", d.text.strip())
        n = len(toks)
        chunks = sorted(by_doc[d.doc_id], key=lambda r: r.chunk_idx)
        starts = list(range(1, n + 1, S))
        assert len(chunks) == len(starts)
        for r, st in zip(chunks, starts):
            piece = toks[st - 1 : st - 1 + C]
            assert r.start_token == st
            assert r.n_chunk_tokens == len(piece)
            assert r.chunk_hash == hashlib.md5(" ".join(piece).encode()).hexdigest()
        # full coverage: last chunk reaches the last token
        assert starts[-1] - 1 + chunks[-1].n_chunk_tokens == n


def test_rollup_multi_level_consistency(spark, sf_dir):
    rows = timeseries.events_rollup_multi(spark, sf_dir).collect()
    total = [r for r in rows if r.day is None]
    assert len(total) == 1  # exactly one grand-total row
    n_events_total = total[0].n_events
    day_level = [r for r in rows if r.day is not None and r.event_type is None]
    day_type = [
        r for r in rows if r.event_type is not None and r.hr is None
    ]
    day_hr_type = [r for r in rows if r.hr is not None]
    assert sum(r.n_events for r in day_level) == n_events_total
    assert sum(r.n_events for r in day_type) == n_events_total
    assert sum(r.n_events for r in day_hr_type) == n_events_total
    assert n_events_total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for level in (day_level, day_type, day_hr_type):
        assert math.isclose(
            sum(r.sum_value for r in level), total[0].sum_value, rel_tol=1e-9
        )


def test_centroid_assign_partition_law_and_self_consistency(spark, sf_dir):
    rows = similarity.ann_centroid_assign(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vecs = emb.count()
    labels = {r.label for r in emb.select("label").distinct().collect()}
    assert sum(r.n_vectors for r in rows) == n_vecs  # every vector assigned once
    for r in rows:
        assert r.label in labels and r.pred_label in labels
        assert r.n_vectors > 0
    again = {(r.label, r.pred_label): r.n_vectors for r in rows}
    rerun = {
        (r.label, r.pred_label): r.n_vectors
        for r in similarity.ann_centroid_assign(spark, sf_dir).collect()
    }
    assert again == rerun  # deterministic under re-execution
