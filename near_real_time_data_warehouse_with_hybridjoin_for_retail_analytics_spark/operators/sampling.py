"""Deterministic sampling and corpus selection for training-data curation.

Training pipelines need samples that are (a) reproducible across runs
and engines — no RNG state, no partition-order dependence — and (b)
stratified, because corpora are head-heavy (one language or source
dominates). Both operators here key the sampling decision on
``md5(doc_id)``: a fixed, engine-portable hash, so the same document is
always in or out of the sample no matter which system or how many
partitions computed it. (Spark's ``rand(seed)`` is partition-order
dependent and engine-private — useless as a selection contract.)

Two strategies, the same trade as dedup's exact-vs-LSH split:

  sample_stratified_topk   EXACTLY k docs per stratum, chosen by hash
                           order. Needs a per-stratum sort (window) —
                           one shuffle on the stratum key; skewed
                           strata sort long. The precise option.
  sample_hash_rate         rate-per-stratum via hash threshold. A pure
                           map-side filter — zero shuffles, trivially
                           100 TB-safe; sample size is binomial around
                           rate·n rather than exact. The scale option.

``corpus_select`` composes the library into the decision a pipeline
actually ships: canonical docs only (dedup clusters, [[dedup_components]])
∧ cheap quality gates ∧ head-language downsampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query
from .clusters import _SQL_COMPONENTS, dedup_components
from .textops import _SQL_TOKENS, text_quality_scores

TOPK_PER_STRATUM = 25
# Hash-threshold rates per language: downsample the head language (en),
# keep the tail. Thresholds are on the first md5 hex byte: '1f' → 32/256
# = 12.5%, '7f' → 128/256 = 50%.
HEAD_LANG = "en"
HEAD_THRESHOLD = "1f"
TAIL_THRESHOLD = "7f"
# corpus_select quality gates (cheap filters before model-based scoring)
MIN_TOKENS = 20
MIN_TTR = 0.20


def _hash_bucket(col: str = "doc_id"):
    """First md5 hex byte of the id — a uniform, engine-portable 1/256
    bucket. Computed identically by DuckDB's md5() (both emit lowercase
    hex of the decimal string form of the id)."""
    return F.substring(F.md5(F.col(col).cast("string")), 1, 2)


@query(
    "sample_stratified_topk",
    f"""
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= {TOPK_PER_STRATUM}
    """,
)
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k docs per language, in hash order — a stable 'uniform
    k-per-stratum' sample that survives reruns and engine swaps.

    One shuffle (window partition on lang). Skew note: the per-stratum
    sort is the cost at scale — for a huge head stratum, pre-filter
    with a generous hash threshold (e.g. keep 4k/n fraction) before the
    window so the sort touches ~4k rows, not the whole stratum."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= TOPK_PER_STRATUM)
    )


@query(
    "sample_hash_rate",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
            <= CASE WHEN lang = '{HEAD_LANG}'
                    THEN '{HEAD_THRESHOLD}' ELSE '{TAIL_THRESHOLD}' END
    """,
)
def sample_hash_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-per-stratum sampling as a pure filter: keep a doc iff its
    hash bucket clears the stratum's threshold. No shuffle, no state —
    the predicate pushes into the scan, so at 100 TB this costs one
    pass over (doc_id, lang). Head language kept at 12.5%, tail at 50%
    (language rebalancing)."""
    docs = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == HEAD_LANG, F.lit(HEAD_THRESHOLD)).otherwise(
        F.lit(TAIL_THRESHOLD)
    )
    return docs.filter(_hash_bucket() <= thr).select("doc_id", "lang")


# Systematic probability-proportional-to-size (PPS) sampling: walk the
# corpus in deterministic hash order, accumulate integer weights
# (n_chars), and pick every document whose cumulative-weight interval
# crosses a multiple of total/K — the classic systematic PPS rule, kept
# EXACT by comparing floor(cum·K/total) before/after each doc instead
# of materializing the (rational) stride. K=40 expected picks; a doc
# with w ≥ total/K is picked with certainty (can never be skipped),
# others with probability K·w/total. Everything is int64: the only
# overflow surface is cum·K ≤ total·K, which clears int64 until the
# corpus holds ~2^63/K ≈ 2.3·10^17 chars (≈ 230 TB of text at K=40).
PPS_K = 40


@query(
    "sample_weighted_pps",
    f"""
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             SUM(n_chars) OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    ),
    tot AS (SELECT SUM(n_chars) AS total FROM documents)
    SELECT w.doc_id, w.lang, CAST(w.n_chars AS BIGINT) AS n_chars
    FROM w, tot
    WHERE (cum * {PPS_K}) // total > ((cum - n_chars) * {PPS_K}) // total
    """,
)
def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (PPS) sample of ~K documents, selection probability
    proportional to n_chars — the sample a data-card or eval set draws
    when long documents should be seen proportionally to the tokens
    they contribute, not one-doc-one-vote.

    The oracle states the rule as ONE global cumulative sum; a global
    ordered window is a single-partition sort at scale, so the Spark
    plan computes the identical prefix sum hierarchically: the md5
    hash's first byte partitions the hash order into 256 contiguous
    buckets, per-bucket subtotals (256 rows) turn into bucket offsets
    with one tiny window, and the per-doc cumulative sum is then a
    PARTITIONED window (offset + within-bucket running sum) — the
    two-level prefix-sum every distributed scan uses, no global sort
    anywhere. Output and rule are bit-identical to the oracle because
    ordering by h equals ordering by (first-byte(h), h)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    docs = docs.withColumn("b", F.substring("h", 1, 2))
    # 256-row bucket subtotals → exclusive running offsets (tiny window)
    offsets = (
        docs.groupBy("b")
        .agg(F.sum("n_chars").alias("bw"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("bw").over(
                    Window.orderBy("b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("bw")
    )
    total = docs.agg(F.sum("n_chars").alias("total"))
    within = F.sum("n_chars").over(
        Window.partitionBy("b")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (F.col("off") + within).alias("cum")
    picked = (
        docs.join(F.broadcast(offsets), "b")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "lang", "n_chars", cum, "total")
        .filter(
            F.expr(f"(cum * {PPS_K}) DIV total")
            > F.expr(f"((cum - n_chars) * {PPS_K}) DIV total")
        )
    )
    return picked.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))


# Train/val/test thresholds on the first md5 hex byte of a salted id:
# 'cb' → 204/256 ≈ 79.7% train, 'e5' → next 26/256 ≈ 10.2% val, rest
# ≈ 10.2% test. The salt decorrelates the split from the sampling
# hashes above — a doc's split assignment and its sample membership
# are independent coin flips.
SPLIT_SALT = "split:"
TRAIN_MAX = "cb"
VAL_MAX = "e5"


@query(
    "sample_split_assign",
    f"""
    SELECT doc_id, lang,
           CASE WHEN b <= '{TRAIN_MAX}' THEN 'train'
                WHEN b <= '{VAL_MAX}' THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang,
             substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    )
    """,
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (~80/10/10) keyed
    on a salted md5 of the doc id — the split a training pipeline must
    hold constant across reruns, engine swaps, and corpus re-shuffles
    (a doc never migrates between splits when other docs are added or
    removed). Pure map-side projection: zero shuffles, the 100 TB cost
    is one pass over (doc_id, lang)."""
    docs = load_table(spark, sf_dir, "documents")
    b = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 2
    )
    split = (
        F.when(b <= TRAIN_MAX, F.lit("train"))
        .when(b <= VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


@query(
    "corpus_select",
    f"""
    WITH comp AS ({_SQL_COMPONENTS}),
    toks AS ({_SQL_TOKENS}),
    t AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS ttr
      FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang, t.n_tokens
    FROM documents d
    JOIN comp ON d.doc_id = comp.doc_id AND comp.is_canonical
    JOIN t ON d.doc_id = t.doc_id
    WHERE t.n_tokens >= {MIN_TOKENS}
      AND t.ttr >= {MIN_TTR}
      AND substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)
            <= CASE WHEN d.lang = '{HEAD_LANG}'
                    THEN '{HEAD_THRESHOLD}' ELSE '{TAIL_THRESHOLD}' END
    """,
)
def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus selection: drop duplicate-cluster non-canonical
    docs, apply cheap quality gates (token count, type-token ratio),
    then rebalance languages by hash-rate sampling. The composition a
    curation pipeline runs nightly; every stage is one of this repo's
    operators, so the whole plan stays declarative (the only iterative
    part is the component loop, whose output is a tiny label frame)."""
    docs = load_table(spark, sf_dir, "documents")
    canon = dedup_components(spark, sf_dir).filter("is_canonical").select("doc_id")
    quality = text_quality_scores(spark, sf_dir).select(
        "doc_id", "n_tokens", "type_token_ratio"
    )
    thr = F.when(F.col("lang") == HEAD_LANG, F.lit(HEAD_THRESHOLD)).otherwise(
        F.lit(TAIL_THRESHOLD)
    )
    return (
        docs.join(canon, "doc_id")
        .join(quality, "doc_id")
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("type_token_ratio") >= MIN_TTR)
            & (_hash_bucket() <= thr)
        )
        .select("doc_id", "lang", "n_tokens")
    )


# ---------------------------------------------------------------------------
# Dedup-aware split assignment (the FIX for cross-split leakage)
# ---------------------------------------------------------------------------
# `curation_split_leakage` measures the standard failure of hashing
# doc ids into splits: near-duplicate documents land on opposite sides
# of the train/test boundary and benchmarks silently inflate. The fix
# every careful pipeline ships is to split on the DEDUP CLUSTER id:
# all members of a duplicate cluster — across every evidence modality,
# text, embedding AND perceptual-hash image edges — move together, so
# no within-cluster pair can ever straddle a boundary. Keying the hash
# with the SAME salt as `sample_split_assign` makes the two splits
# agree on every singleton component (component_id == doc_id there):
# only duplication-affected docs migrate, which keeps the split
# maximally stable when dedup evidence grows.


def _split_by_cluster_sql() -> str:
    from .clusters import _SQL_MULTIMODAL_COMPONENTS

    return f"""
    WITH comp AS (
      SELECT doc_id, component_id
      FROM ({_SQL_MULTIMODAL_COMPONENTS})
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN b <= '{TRAIN_MAX}' THEN 'train'
                WHEN b <= '{VAL_MAX}' THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT c.doc_id,
             substr(md5('{SPLIT_SALT}'
                        || CAST(c.component_id AS VARCHAR)), 1, 2) AS b
      FROM comp c
    ) s
    JOIN documents d USING (doc_id)
    """


@query("sample_split_by_cluster", _split_by_cluster_sql())
def sample_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment keyed on the multimodal dedup-cluster
    id (~80/10/10): every duplicate cluster moves as a unit, so
    near-dup leakage across boundaries is structurally zero for every
    pair the component graph knows (exact, trigram-Jaccard, embedding,
    perceptual-hash image edges). Singleton docs keep exactly their
    `sample_split_assign` split (same salt, component_id == doc_id).
    Cost at 100 TB: the component labels are the table the dedup pass
    already wrote; the split itself is one map-side hash."""
    from .clusters import dedup_multimodal_components

    comp = dedup_multimodal_components(spark, sf_dir).select(
        "doc_id", "component_id"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    b = F.substring(
        F.md5(
            F.concat(
                F.lit(SPLIT_SALT), F.col("component_id").cast("string")
            )
        ),
        1,
        2,
    )
    split = (
        F.when(b <= TRAIN_MAX, F.lit("train"))
        .when(b <= VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return comp.join(docs, "doc_id").select("doc_id", "lang", split.alias("split"))


# ---------------------------------------------------------------------------
# Soft-dedup-weighted sampling (staged for round 18)
# ---------------------------------------------------------------------------
# The consumption side of `curation_soft_dedup_weights`: a Bernoulli
# downsample where each document's keep probability is
# rate × weight (weight = 1/cluster_size), so every duplicate CLUSTER
# contributes ~rate document-mass to the sample regardless of how many
# copies it has — the SemDeDup/D4-style draw, where hard dedup's
# keep-one-drop-rest is just the rate→cluster_size·rate limit. The
# coin is the first 20 bits of md5(doc_id) (engine-portable, RNG-free,
# doc-stable): keep iff h20/2^20 < (rate_ppm/1e6)·(weight_ppm/1e6),
# cross-multiplied into one exact int64 comparison — max operand
# h20·1e12 < 2^20·1e12 ≈ 1.05e18 and rate·weight·2^20 ≤ 5.25e17, both
# inside int64, so the predicate (and the driver hash) never rides on
# a float. 100 TB shape: the weights' one component-id shuffle, then a
# pure map-side filter.

SOFT_SAMPLE_RATE_PPM = 500_000  # target: ~half a doc-mass per cluster
_H20 = 1 << 20


def _soft_dedup_sample_sql() -> str:
    from .clusters import _SQL_SOFT_DEDUP

    return f"""
    WITH sw AS ({_SQL_SOFT_DEDUP})
    SELECT doc_id, component_id, cluster_size, weight_ppm
    FROM sw
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 5) AS BIGINT)
            * 1000000000000
          < {SOFT_SAMPLE_RATE_PPM} * weight_ppm * {_H20}
    """


@query("sample_soft_dedup", _soft_dedup_sample_sql())
def sample_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-mass-preserving downsample: keep each doc with
    probability rate/cluster_size, deterministically (md5 coin). The
    demonstrable properties (pytest): the predicate is exactly the
    cross-multiplied oracle comparison (engine parity at sf0.01);
    singletons are kept at ~rate; a cluster's expected kept mass is
    ~rate docs independent of its size — so the sample's effective
    composition matches hard-dedup-then-uniform-sample WITHOUT ever
    dropping a document from the samplable pool. Staged round 17 with
    scale row 0.80 (components-closure-bound; the kernel itself adds
    only a map-side md5 filter); registered round 18."""
    from .clusters import curation_soft_dedup_weights

    w = curation_soft_dedup_weights(spark, sf_dir)
    h20 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5), 16, 10
    ).cast("long")
    return w.filter(
        h20 * F.lit(1_000_000_000_000).cast("long")
        < F.lit(SOFT_SAMPLE_RATE_PPM).cast("long")
        * F.col("weight_ppm")
        * F.lit(_H20).cast("long")
    ).select("doc_id", "component_id", "cluster_size", "weight_ppm")
