"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Five strategies, cheapest→richest, as a training-data pipeline runs them:

  exact           hash-groupBy on a canonical fingerprint
  ngram_jaccard   exact pairwise Jaccard on trigram shingles (the
                  ground-truth near-dup definition; quadratic in the
                  shingle-bucket sizes, fine when shingles are selective)
  minhash_lsh     MinHash signatures + banded LSH — the 100 TB path:
                  candidate generation is linear in documents, pairwise
                  work only inside colliding buckets, then exact-Jaccard
                  verification of candidates only
  simhash         64-bit SimHash + pigeonhole banding on 16-bit chunks,
                  Hamming-distance verification
  embedding       cosine near-dup pairs over the embedding column

The hash-based strategies are pure DataFrame ops (explode/agg/join) —
the hash family is xxhash64 salted rehashes, all JVM-side. The
embedding strategy uses Arrow-batched numpy kernels (``applyInPandas``
block nested-loop) — cosine over millions of pairs is matmul work.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query

TOKEN_SPLIT = r"\s+"
SHINGLE_N = 3

# MinHash parameters: 64 hashes = 16 bands × 4 rows → LSH s-curve
# threshold ≈ (1/16)^(1/4) ≈ 0.5, matching NEAR_DUP_JACCARD.
MINHASH_K = 64
LSH_BANDS = 16
LSH_ROWS = 4
NEAR_DUP_JACCARD = 0.5
# SimHash near-dup: Hamming ≤ 3 over 64 bits; 4×16-bit pigeonhole bands.
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3
# Embedding near-dup threshold (testdata cosines top out ≈ 0.46).
NEAR_DUP_COSINE = 0.35

# Hash family: h_i(x) = xxhash64(xxhash64(x), i) — salted rehash of the
# base shingle hash. Overflow-free under ANSI mode (an affine a*h+b
# family would throw on long overflow) and fully JVM-side.


# The shingle relation feeds several branches of each near-dup plan
# (self-join sides, per-doc sizes, signatures); without materialization
# Spark recomputes the split/explode/dedup pipeline once per branch.
# Cache one persisted copy per (session, sf_dir) — at 100 TB this is
# "materialize shingles once, reuse across dedup passes", the same call.
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SHINGLE_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _SHINGLE_CACHE[key] = shingles(docs).persist()
    return _SHINGLE_CACHE[key]


def shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) with distinct word n-gram shingles per doc."""
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), TOKEN_SPLIT).alias("w")
    )
    # n-gram assembly as an array comprehension — stays in codegen.
    # Guarded for short docs: sequence(1, 0) yields a DESCENDING [1, 0]
    # in Spark, whose 0 would crash slice(); docs below n tokens must
    # short-circuit to an empty gram array.
    grams = toks.select(
        "doc_id",
        F.expr(
            f"if(size(w) >= {n}, "
            f"transform(sequence(1, size(w) - {n - 1}), "
            f"i -> concat_ws(' ', slice(w, i, {n}))), "
            f"cast(array() as array<string>))"
        ).alias("grams"),
    )
    return grams.select(
        "doc_id", F.explode("grams").alias("shingle")
    ).dropDuplicates(["doc_id", "shingle"])


_SQL_SHINGLES = """
    SELECT DISTINCT doc_id,
           unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in range(1, len(w) - 1)]) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
          FROM documents)
"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical-form fingerprint → keep min doc_id.
    One shuffle on the fingerprint; at 100 TB this is the cheapest pass
    and runs first to shrink the near-dup input."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# Exact pairwise n-gram Jaccard (ground truth for the approximate methods)
# ---------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common_shingles
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, common_shingles,
           sa.n AS shingles_a, sb.n AS shingles_b,
           CAST(common_shingles AS DOUBLE)
             / (sa.n + sb.n - common_shingles) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(common_shingles AS DOUBLE)
            / (sa.n + sb.n - common_shingles) >= {NEAR_DUP_JACCARD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise trigram-shingle Jaccard ≥ τ. The shingle equi-join keys
    the quadratic work to shingle buckets (selective for real text);
    this is the exact method MinHash+LSH approximates."""
    sh = cached_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("shingles_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("shingles_b"))
    jac = F.col("common_shingles").cast("double") / (
        F.col("shingles_a") + F.col("shingles_b") - F.col("common_shingles")
    )
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= NEAR_DUP_JACCARD)
        .select(
            "doc_a", "doc_b", "common_shingles", "shingles_a", "shingles_b", "jaccard"
        )
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH (the scale path)
# ---------------------------------------------------------------------------
def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, sig array<long>): k min-hashes per doc in one groupBy —
    map-side partial min means the shuffle carries k longs per doc."""
    base = sh.select("doc_id", F.xxhash64("shingle").alias("h"))
    mins = base.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[f"m{i}" for i in range(MINHASH_K)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Banded LSH: docs colliding in any band become candidate pairs."""
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(F.slice("sig", i * LSH_ROWS + 1, LSH_ROWS)).alias("bh"),
                    )
                    for i in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


@query("dedup_minhash_lsh")  # rows-only: LSH recall is probabilistic
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection with exact-Jaccard verification of
    candidates only. At 100 TB: signatures are one linear pass, bucket
    joins shuffle only (band, hash) keys, and the quadratic verification
    touches candidate pairs instead of all pairs."""
    sh = cached_shingles(spark, sf_dir)
    cands = lsh_candidate_pairs(minhash_signatures(sh))

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("shingles_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("shingles_b"))
    jac = F.col("common_shingles").cast("double") / (
        F.col("shingles_a") + F.col("shingles_b") - F.col("common_shingles")
    )
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= NEAR_DUP_JACCARD)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): sign of per-bit vote sums over token
    hashes. 64 conditional sums in a single groupBy — one shuffle."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    bit_terms: list[Column] = [
        F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j))
        .otherwise(F.lit(0).cast("long"))
        for j in range(64)
    ]
    sig = functools.reduce(lambda x, y: x.bitwiseOR(y), bit_terms)
    return votes.select("doc_id", sig.alias("simhash"))


@query("dedup_simhash")  # rows-only: banding recall is structural, not SQL
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: Hamming ≤ 3 pairs found via 16-bit pigeonhole
    bands (any pair within Hamming 3 of 64 bits must agree on ≥1 of 4
    chunks), verified with bit_count(xor)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.band", "c.chunk")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "chunk"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "chunk"
    )
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------
_PAIR_SCHEMA = "vec_a long, vec_b long"


def _cosine_pairs_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """One (block_a, block_b) cell: matmul, threshold, emit id pairs."""
    import numpy as np
    import pandas as pd

    a = pdf[pdf["side"] == 0]
    b = pdf[pdf["side"] == 1]
    if a.empty or b.empty:
        return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")

    def norm_rows(frame):
        ids = frame["vec_id"].to_numpy()
        mat = np.stack(frame["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        np.maximum(n, 1e-300, out=n)
        return ids, mat / n

    ids_a, mat_a = norm_rows(a)
    ids_b, mat_b = norm_rows(b)
    sims = mat_a @ mat_b.T
    hit = (sims >= NEAR_DUP_COSINE) & (ids_a[:, None] < ids_b[None, :])
    ra, rb = np.nonzero(hit)
    return pd.DataFrame({"vec_a": ids_a[ra], "vec_b": ids_b[rb]})


@query(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {NEAR_DUP_COSINE}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (ids only — scores are float-
    order-sensitive across engines and stay out of the hash check).

    Block nested-loop: B² ``applyInPandas`` cells, each one numpy
    matmul — shuffle moves O(n·B) rows, compute shards O(n²·d) across
    cells (same scale pattern as ``similarity.ann_topk_bruteforce``)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    blocks = 8
    blk = F.pmod(F.col("vec_id"), F.lit(blocks)).cast("int")
    grid = spark.range(blocks).select(F.col("id").cast("int").alias("other"))
    a_side = (
        emb.withColumn("ga", blk)
        .crossJoin(grid.withColumnRenamed("other", "gb"))
        .withColumn("side", F.lit(0))
    )
    b_side = (
        emb.withColumn("gb", blk)
        .crossJoin(grid.withColumnRenamed("other", "ga"))
        .withColumn("side", F.lit(1))
    )
    return (
        a_side.unionByName(b_side)
        .groupBy("ga", "gb")
        .applyInPandas(_cosine_pairs_kernel, _PAIR_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Method agreement: text near-dups vs embedding near-dups
# ---------------------------------------------------------------------------
@query(
    "dedup_crosscheck",
    f"""
    WITH sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    textp AS (
      SELECT doc_a, doc_b
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {NEAR_DUP_JACCARD}
    ),
    embp AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= {NEAR_DUP_COSINE}
    )
    SELECT CASE WHEN t.doc_a IS NOT NULL AND e.vec_a IS NOT NULL THEN 'both'
                WHEN t.doc_a IS NOT NULL THEN 'text_only'
                ELSE 'embedding_only' END AS agreement,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM textp t
    FULL JOIN embp e ON t.doc_a = e.vec_a AND t.doc_b = e.vec_b
    GROUP BY 1
    """,
)
def dedup_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement report between the two near-dup modalities (trigram
    Jaccard on text vs cosine on embeddings, ids aligned 1:1 in the
    testdata): pairs flagged by both, by text only, by embeddings only.
    The QA readout a curation pipeline uses to tune thresholds — a big
    'embedding_only' bucket means the text threshold is too tight (or
    the embeddings conflate topics), and vice versa."""
    t = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    e = dedup_embedding_cosine(spark, sf_dir)
    joined = t.join(
        e,
        (t["doc_a"] == e["vec_a"]) & (t["doc_b"] == e["vec_b"]),
        "full",
    )
    agreement = (
        F.when(F.col("doc_a").isNotNull() & F.col("vec_a").isNotNull(), "both")
        .when(F.col("doc_a").isNotNull(), "text_only")
        .otherwise("embedding_only")
    )
    return joined.groupBy(agreement.alias("agreement")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
