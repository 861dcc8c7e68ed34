"""Engine-portable cardinality sketches.

Spark's own `approx_count_distinct` (HyperLogLog++) is the built-in
answer at 100 TB, but its sketch bytes are engine-private — the DuckDB
oracle cannot replay them, so a correctness-gated pipeline can't use it
as a verified primitive. The K-Minimum-Values sketch is the portable
alternative: over a uniform hash, the k-th smallest distinct hash value
among n distinct keys estimates n as (k−1)·H / h_k (H = hash-space
size), with relative error ~1/√k. Every piece is deterministic — the
md5-based 60-bit hash family shared with the dedup operators, integer
rank selection, one IEEE divide — so the oracle replays the sketch
bit-for-bit AND the estimate can be compared against the exact count
in the same query.

Scale shape: KMV is a bounded-state commutative aggregate — k longs per
group — so at 100 TB it runs as map-side partial k-min merges, exactly
like HLL. This reference implementation selects the k-th order
statistic with a rank window over distinct hashes (one shuffle on the
group key); the estimator arithmetic is the contract the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query
from .dedup import TOKEN_SPLIT, portable_hash60

KMV_K = 64  # ~12.5 % standard error; merges stay 64 longs per group
_H_SPACE = float(1 << 60)  # hash-space size (exact power of two)


@query(
    "sketch_distinct_tokens",
    f"""
    WITH toks AS (
      SELECT DISTINCT lang,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    hashed AS (
      SELECT lang, token,
             CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS h
      FROM toks
    ),
    ranked AS (
      SELECT lang, h,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, token) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n_exact
      FROM hashed
    )
    SELECT lang,
           CAST(MAX(n_exact) AS BIGINT) AS n_exact,
           CASE WHEN MAX(n_exact) < {KMV_K}
                THEN CAST(MAX(n_exact) AS DOUBLE)
                ELSE {KMV_K - 1} * {_H_SPACE!r}
                     / MAX(CASE WHEN rk = {KMV_K} THEN h END)
           END AS n_est
    FROM ranked
    GROUP BY lang
    """,
)
def sketch_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token cardinality: exact count next to the
    KMV estimate, both value-hash-checked (the sketch is deterministic,
    so the oracle replays hash, rank selection and estimator exactly).
    Accuracy vs k is gated in tests; at 100 TB the same estimator runs
    as a bounded-state partial aggregate (module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token")
    ).dropDuplicates(["lang", "token"])
    hashed = toks.select("lang", "token", portable_hash60("token").alias("h"))
    wr = Window.partitionBy("lang").orderBy("h", "token")
    wc = Window.partitionBy("lang")
    ranked = hashed.select(
        "lang",
        "h",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n_exact"),
    )
    est = F.when(
        F.max("n_exact") < KMV_K, F.max("n_exact").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        * F.lit(_H_SPACE)
        / F.max(F.when(F.col("rk") == KMV_K, F.col("h")))
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.max("n_exact").cast("long").alias("n_exact"),
            est.alias("n_est"),
        )
    )


def _bloom_gate_sql() -> str:
    # k = 7 is portable_bloom_params' constant hash count, inlined as a
    # literal because DuckDB's range() only accepts constants; a pytest
    # asserts the two stay in sync.
    from .dedup import INCR_SPLIT_FRAC

    return f"""
    WITH params AS (
      SELECT CAST(floor(CAST(MAX(doc_id) AS DOUBLE) * {INCR_SPLIT_FRAC})
                  AS BIGINT) AS split
      FROM documents
    ),
    oldfp AS (
      SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents
      WHERE doc_id < (SELECT split FROM params) AND text IS NOT NULL
    ),
    mk AS (
      SELECT CASE WHEN COUNT(*) = 0 THEN 0
                  ELSE 1 << (length(printf('%b', COUNT(*))) + 3) END AS m
      FROM oldfp
    ),
    setbits AS (
      SELECT DISTINCT
             (CAST('0x' || substr(md5(fp), 1, 15) AS BIGINT)
              + r.i * (CAST('0x' || substr(md5(fp), 16, 15) AS BIGINT) | 1))
             % NULLIF((SELECT m FROM mk), 0) AS p
      FROM oldfp CROSS JOIN range(0, 7) r(i)
    ),
    inc AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
      WHERE doc_id >= (SELECT split FROM params)
    ),
    probes AS (
      SELECT i.doc_id, i.fp,
             (CAST('0x' || substr(md5(i.fp), 1, 15) AS BIGINT)
              + r.i * (CAST('0x' || substr(md5(i.fp), 16, 15) AS BIGINT) | 1))
             % NULLIF((SELECT m FROM mk), 0) AS p
      FROM inc i CROSS JOIN range(0, 7) r(i)
    ),
    maybe AS (
      SELECT pr.doc_id,
             SUM(CASE WHEN s.p IS NOT NULL THEN 1 ELSE 0 END)
               = 7 AS bloom_maybe
      FROM probes pr LEFT JOIN setbits s ON s.p = pr.p
      GROUP BY 1
    )
    SELECT i.doc_id, m.bloom_maybe,
           CASE WHEN i.fp IN (SELECT fp FROM oldfp) THEN 'exact'
                ELSE 'novel' END AS verdict,
           m.bloom_maybe
             AND i.fp NOT IN (SELECT fp FROM oldfp) AS false_positive
    FROM inc i JOIN maybe m USING (doc_id)
    """


@query("dedup_bloom_gate", _bloom_gate_sql())
def dedup_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming ingest pre-gate, hash-verified: build the Bloom
    filter over the indexed corpus's canonical fingerprints with the
    INTEGER-ONLY portable sizing (``portable_bloom_params`` — the
    float ln-based formula is not cross-engine reproducible), probe
    every incoming doc, and report per doc the Bloom verdict next to
    ground truth (``false_positive`` = maybe ∧ novel). The oracle
    replays the filter exactly — double hashing off md5, position set,
    k-of-k membership — as a position-set join, so a single wrong bit
    position anywhere breaks the value hash. This is the entry that
    proves the 100 TB refinement (classify definite novels without
    touching the index join) is itself correct, not just plausible."""
    from ..functions.bloom import build_bloom, portable_bloom_params
    from .dedup import _incr_split

    docs = load_table(spark, sf_dir, "documents")
    split = _incr_split(spark, sf_dir)
    # persist: the deduped fingerprint relation feeds three consumers
    # (the sizing count, the bitmap fold, the ground-truth join) — one
    # distinct-shuffle instead of three. O(distinct fingerprints), the
    # same bound as the filter itself; spills to disk if it outgrows
    # executor memory.
    old_fps = (
        docs.filter((F.col("doc_id") < split) & F.col("text").isNotNull())
        .select(F.md5(F.lower(F.trim("text"))).alias("fp"))
        .distinct()
        .persist()
    )
    n = old_fps.count()  # bounded driver scalar (knob derivation)
    m, k = portable_bloom_params(n)
    bloom = build_bloom(old_fps, n=n, m=m, k=k)

    inc = docs.filter(F.col("doc_id") >= split).select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("fp")
    )
    flagged = inc.withColumn(
        "bloom_maybe", bloom.might_contain_udf()("fp")
    )
    marker = old_fps.withColumn("__indexed", F.lit(True))
    return flagged.join(marker, "fp", "left").select(
        "doc_id",
        "bloom_maybe",
        F.when(F.col("__indexed"), "exact").otherwise("novel").alias("verdict"),
        (F.col("bloom_maybe") & F.col("__indexed").isNull()).alias(
            "false_positive"
        ),
    )


# ---------------------------------------------------------------------------
# Corpus-overlap estimation: KMV Jaccard between source pairs
# ---------------------------------------------------------------------------
# The data-card question "how much does source X overlap source Y"
# (token-set Jaccard for every source pair) answered from BOUNDED
# per-source state: each source keeps only its k smallest token hashes
# (the same KMV sketch as sketch_distinct_tokens). The classic KMV
# Jaccard estimator needs nothing else — for any h among the k smallest
# of A ∪ B, h ∈ A implies h is among the k smallest of A (A ⊆ A∪B), so
# sketch membership decides "in both", and
#   Ĵ = |{k-min of A∪B} ∩ A ∩ B| / min(k, |A∪B|)
# is computable from the two sketches alone. At 100 TB the exact tier
# (an inverted-index self-join on the token — Σ C(sources_per_token, 2)
# pair rows) is what you drop: per-source sketches are k rows each,
# pair merges touch O(pairs · k) rows total, and the estimate needs no
# token-level shuffle at all. The exact columns are kept here so the
# estimator's error is visible and gated in the same verified output.


def _source_overlap_sql() -> str:
    h = "CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)"
    return f"""
    WITH toks AS (
      SELECT DISTINCT source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    hashed AS (SELECT source, token, {h} AS h FROM toks),
    sk AS (
      SELECT source, token, h FROM (
        SELECT source, token, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, token) AS rk
        FROM hashed)
      WHERE rk <= {KMV_K}
    ),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb
      FROM (SELECT DISTINCT source FROM hashed) a
      JOIN (SELECT DISTINCT source FROM hashed) b ON a.source < b.source
    ),
    skuni AS (
      SELECT sa, sb, token, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        SELECT p.sa, p.sb, s.token, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.sa
        UNION ALL
        SELECT p.sa, p.sb, s.token, s.h, 0, 1
        FROM pairs p JOIN sk s ON s.source = p.sb)
      GROUP BY 1, 2, 3, 4
    ),
    est AS (
      SELECT sa, sb,
             CAST(LEAST(COUNT(*), {KMV_K}) AS BIGINT) AS est_k,
             CAST(SUM(CASE WHEN rk <= {KMV_K} THEN in_a * in_b ELSE 0 END)
                  AS BIGINT) AS est_matches
      FROM (SELECT sa, sb, in_a, in_b,
                   ROW_NUMBER() OVER (PARTITION BY sa, sb
                                      ORDER BY h, token) AS rk
            FROM skuni)
      GROUP BY 1, 2
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM toks GROUP BY 1),
    co AS (
      SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_inter
      FROM toks a JOIN toks b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT p.sa, p.sb,
             CAST(za.n + zb.n - coalesce(c.n_inter, 0) AS BIGINT) AS n_union,
             CAST(coalesce(c.n_inter, 0) AS BIGINT) AS n_inter
      FROM pairs p
      JOIN sizes za ON za.source = p.sa
      JOIN sizes zb ON zb.source = p.sb
      LEFT JOIN co c ON c.sa = p.sa AND c.sb = p.sb
    )
    SELECT e.sa AS source_a, e.sb AS source_b,
           x.n_union, x.n_inter,
           CAST(x.n_inter AS DOUBLE) / x.n_union AS jaccard_exact,
           e.est_k, e.est_matches,
           CAST(e.est_matches AS DOUBLE) / e.est_k AS jaccard_est
    FROM est e JOIN exact x ON x.sa = e.sa AND x.sb = e.sb
    ORDER BY source_a, source_b
    """


@query("sketch_source_overlap", _source_overlap_sql())
def sketch_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard between every pair of sources, exact AND
    KMV-estimated in one verified output (module comment above for the
    estimator and the 100 TB story). Source pairs are enumerated by a
    broadcast theta self-join of the S-row per-source size relation —
    sources are data-card strata, metadata-sized by construction — so
    the pair table stays broadcast-sized with no driver collect at
    all. Deterministic end-to-end (md5 hash
    family, (h, token) rank tiebreaks, integer counts, one IEEE divide
    per ratio), so the DuckDB oracle replays sketches, merge ranks and
    both Jaccard columns bit-exactly; estimator accuracy is separately
    gated in tests.

    Physical shape (round-10 rework): ONE shuffle touches token-scale
    data — ``groupBy(token).agg(array_sort(collect_set(source)))`` with
    map-side partial merge, so the shuffle carries ~|vocab| rows, not
    the raw token stream. Everything downstream (per-source sizes, the
    pairwise co-occurrence counts, the KMV (source, token, h) relation)
    is derived from that token→sources relation, whose cardinality is
    |vocab| ≤ corpus tokens. The three derivations share the single
    exchange via Spark's ReusedExchange, so the documents scan and the
    token shuffle each run once per action with no persist/cache
    needed. Pair fanout in the exact tier is Σ C(sources_per_token, 2)
    ≤ |vocab|·C(S, 2) with S the (metadata-sized) source count —
    generated post-aggregation from the sorted source array, replacing
    the former token-equality self-join whose both sides re-shuffled
    the full (source, token) relation."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "source",
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token"),
    )
    # token → sorted source list: the one token-scale shuffle.
    grouped = raw.groupBy("token").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    # (source, token, h) regenerated post-agg — one row per distinct
    # (source, token), exactly the relation the oracle's `hashed` CTE
    # names; the 60-bit hash is computed after the explode so it runs
    # on |vocab|·avg(sources_per_token) rows, never the raw stream.
    hashed = grouped.select(
        F.explode("srcs").alias("source"),
        "token",
        portable_hash60("token").alias("h"),
    )

    wsrc = Window.partitionBy("source").orderBy("h", "token")
    sk = (
        hashed.withColumn("rk", F.row_number().over(wsrc))
        .filter(F.col("rk") <= KMV_K)
        .select("source", "token", "h")
    )

    # Pair enumeration: derived distributively from the per-source
    # sizes relation (S rows, S the metadata-sized source count) with a
    # broadcast theta self-join — no driver collect, no createDataFrame
    # round-trip. ``sizes`` enumerates exactly the sources holding ≥ 1
    # token row, which is the oracle's (SELECT DISTINCT source FROM
    # hashed): a source whose documents are all NULL text yields zero
    # token rows and is omitted on both sides (round-8 advice).
    # Carrying (na, nb) on the pair rows also absorbs the exact tier's
    # former two size-lookup joins.
    sizes = hashed.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    pairs = F.broadcast(
        sizes.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    ).join(
        sizes.select(F.col("source").alias("sb"), F.col("n").alias("nb")),
        F.col("sa") < F.col("sb"),
    )

    # Estimate tier: one row per (sketch token, sketch-source set) —
    # ``ssk`` is metadata-sized (≤ S·K rows) — joined once against the
    # broadcast pair table on "token is in either side's sketch", then
    # a single groupBy builds the merged sketch per pair as a sorted
    # array and folds the top-K membership product. This replaces the
    # former two-join + union + dedup-groupBy + window chain (five
    # exchanges) with one broadcast nested-loop join and one exchange;
    # per-group state is bounded by 2·K structs, so the shape holds at
    # any corpus size.
    ssk = sk.groupBy("token", "h").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    est = (
        F.broadcast(pairs.select("sa", "sb"))
        .join(
            ssk,
            F.expr("array_contains(ss, sa) OR array_contains(ss, sb)"),
        )
        .select(
            "sa",
            "sb",
            "h",
            "token",
            F.array_contains("ss", F.col("sa")).cast("long").alias("in_a"),
            F.array_contains("ss", F.col("sb")).cast("long").alias("in_b"),
        )
        .groupBy("sa", "sb")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("h", "token", "in_a", "in_b"))
            ).alias("arr")
        )
        .select(
            "sa",
            "sb",
            F.least(F.size("arr"), F.lit(KMV_K)).cast("long").alias("est_k"),
            F.expr(
                f"CAST(aggregate(slice(arr, 1, {KMV_K}), 0L,"
                " (acc, x) -> acc + x.in_a * x.in_b) AS BIGINT)"
            ).alias("est_matches"),
        )
    )
    # Exact tier via the inverted index: a token held by k sources
    # contributes C(k, 2) co-occurring (sa, sb) pairs, generated
    # directly from the sorted source array with JVM higher-order
    # functions — no token-equality self-join, no re-shuffle of the
    # (source, token) relation. |A∪B| = |A|+|B|−|A∩B| from per-source
    # sizes carried on the pair rows.
    co = (
        grouped.filter(F.size("srcs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (a, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)),"
                    " b -> struct(a AS sa, b AS sb))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.sa").alias("sa"), F.col("p.sb").alias("sb"))
        .agg(F.count(F.lit(1)).alias("n_inter0"))
    )
    exact = (
        pairs.join(co, ["sa", "sb"], "left")
        .select(
            "sa",
            "sb",
            (
                F.col("na") + F.col("nb") - F.coalesce("n_inter0", F.lit(0))
            ).cast("long").alias("n_union"),
            F.coalesce("n_inter0", F.lit(0)).cast("long").alias("n_inter"),
        )
    )
    return (
        est.join(exact, ["sa", "sb"])
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "n_union",
            "n_inter",
            (F.col("n_inter").cast("double") / F.col("n_union")).alias(
                "jaccard_exact"
            ),
            "est_k",
            "est_matches",
            (F.col("est_matches").cast("double") / F.col("est_k")).alias(
                "jaccard_est"
            ),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Heavy hitters: two-phase candidates + exact recount
# ---------------------------------------------------------------------------
# Frequent-token extraction without a full-vocabulary shuffle. Phase 1
# streams each Arrow chunk once and keeps the tokens whose LOCAL share
# clears the global support threshold (count_chunk · HH_SHARE_DEN ≥
# chunk_size). That candidate set provably contains every true heavy
# hitter for ANY chunking of the data: Σcᵢ = c ≥ N/DEN over Σ Nᵢ = N
# implies some chunk has cᵢ/Nᵢ ≥ c/N ≥ 1/DEN (weighted-average
# pigeonhole) — no balance assumption, no probabilistic bound. Phase 2
# recounts ONLY the candidates (broadcast semi-join, then a groupBy
# whose key space is ≤ DEN distinct tokens per chunk instead of the
# whole vocabulary) and trims to the exact support predicate, so the
# OUTPUT is exactly "SELECT token HAVING count·DEN ≥ total" — the
# sketch bounds what shuffles, never what is returned, which is why a
# plain SQL oracle verifies it hash-exactly. At 100 TB this is the
# difference between shuffling O(vocabulary) partial counts and
# shuffling O(heavy candidates): web-scale token vocabularies are
# billions of keys, heavy-hitter sets are thousands.
HH_SHARE_DEN = 500  # heavy hitter ⇔ occurrences · 500 ≥ total tokens (0.2 %)


def _heavy_hitters_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
    FROM toks GROUP BY token
    HAVING COUNT(*) * {HH_SHARE_DEN} >= (SELECT n FROM tot)
    ORDER BY n_occurrences DESC, token
    """


@query("sketch_heavy_hitters", _heavy_hitters_sql())
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (tokens with ≥ 1/HH_SHARE_DEN of all token
    occurrences) via the candidates + exact-recount two-phase plan
    described in the module comment: a vectorized per-chunk local-share
    pass proposes candidates (`value_counts` per Arrow batch — no
    per-row Python), a semi-join restricts the recount to them, and
    the exact support filter trims the superset. Output is identical
    to the single-shuffle groupBy+HAVING the oracle runs; the
    candidate machinery only bounds the shuffle width.

    The candidate join carries NO broadcast hint: the candidate set is
    ≤ HH_SHARE_DEN distinct tokens per Arrow chunk, so its size grows
    with chunk count, not corpus rows — small in practice but not
    provably bounded. The `distinct()` shuffle gives AQE exact runtime
    stats, so it broadcasts when the set fits (verified at gate scale
    in EXPLAIN_AUDIT.md) and degrades to a partitioned join instead of
    an executor OOM when it doesn't — the same planner-driven policy
    as the dedup candidate verification (dedup.py:570)."""
    import pandas as pd

    from .dedup import TOKEN_SPLIT

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token")
    )

    def local_heavy(batches):
        for pdf in batches:
            vc = pdf["token"].value_counts()
            yield pd.DataFrame(
                {"token": vc.index[vc * HH_SHARE_DEN >= len(pdf)]}
            )

    candidates = toks.mapInPandas(local_heavy, "token string").distinct()
    total = toks.count()  # bounded driver scalar (the support threshold)
    return (
        toks.join(candidates, "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * HH_SHARE_DEN >= total)
        .select(
            "token",
            "n_occurrences",
            (F.col("n_occurrences").cast("double") / total).alias("share"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
    )


# ---------------------------------------------------------------------------
# HyperLogLog register table (the OTHER canonical cardinality sketch)
# ---------------------------------------------------------------------------
# KMV (above) is this engine's verified estimator; HLL is what every
# production system actually merges (Spark's approx_count_distinct,
# Redis PFCOUNT, BigQuery HLL_COUNT). Spark's own sketch bytes are
# engine-private, so this entry materializes the REGISTER TABLE of a
# clean-room HLL — per (source, register): the max leading-zero rank —
# from the same md5 hash family both engines compute bit-identically.
# Register = the first 8 hash bits (HLL_P = 8, 256 registers); rho =
# 1 + leading-zero count of the NEXT 64 bits, derived from the hex
# string with pure integer/CASE arithmetic (no floats anywhere). The
# register table IS the sketch: downstream, registers merge with MAX
# (the one HLL invariant) and the harmonic estimate is one fold over
# 256 rows. Emitting registers instead of the estimate keeps the entry
# exact across engines — the float harmonic sum would be the only
# unverifiable step.
#
# 100 TB shape: map-side partial MAX per (source, register) — bounded
# state (sources × 256 rows), one shuffle of that tiny frame. The
# distinct-token pre-pass dedups hash inputs per source first, which at
# 100 TB is the vocabulary relation, not the corpus.
HLL_P = 8  # 2^8 = 256 registers

# rho contribution of the first nonzero hex digit: value 8-f → first
# one-bit at bit 1 of the nibble, 4-7 → 2, 2-3 → 3, 1 → 4.
_HLL_DIGIT_BITS = (
    "CASE WHEN d >= '8' THEN 1 "
    "WHEN d >= '4' THEN 2 "
    "WHEN d >= '2' THEN 3 "
    "ELSE 4 END"
)


@query(
    "sketch_hll_registers",
    f"""
    WITH toks AS (
      SELECT DISTINCT source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    hashed AS (
      SELECT source,
             CAST('0x' || substr(md5(token), 1, 2) AS BIGINT) AS register,
             substr(md5(token), 3, 16) AS tail
      FROM toks
    ),
    rho AS (
      SELECT source, register,
             length(regexp_extract(tail, '^0*')) AS z,
             substr(tail, length(regexp_extract(tail, '^0*')) + 1, 1) AS d
      FROM hashed
    )
    SELECT source, register,
           CAST(MAX(CASE WHEN d = '' THEN 65
                         ELSE 4 * z + {_HLL_DIGIT_BITS} END) AS BIGINT)
             AS max_rho
    FROM rho
    GROUP BY 1, 2
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean-room HyperLogLog register table per source over distinct
    tokens: (source, register, max_rho) with 2^HLL_P registers and rho
    computed by integer hex arithmetic — deterministic in both engines,
    mergeable downstream with MAX. See the module comment block for why
    the registers (not the float estimate) are the verified surface."""
    return hll_register_table(load_table(spark, sf_dir, "documents"))


def hll_register_table(docs: DataFrame) -> DataFrame:
    """(source, register, max_rho) over any (source, text) frame — the
    frame-level core shared by the batch entry above and the streaming
    ingest gate (``streaming.hll_stream``)."""
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token"),
    ).dropDuplicates(["source", "token"])
    h = F.md5("token")
    tail = F.substring(h, 3, 16)
    z = F.length(F.regexp_extract(tail, "^0*", 0))
    # substring() with a computed start needs the SQL form (the Python
    # helper only takes literal positions).
    d = F.expr(
        "substring(substring(md5(token), 3, 16),"
        " length(regexp_extract(substring(md5(token), 3, 16), '^0*', 0)) + 1,"
        " 1)"
    )
    rho = F.when(d == "", F.lit(65)).otherwise(
        4 * z
        + F.when(d >= "8", 1)
        .when(d >= "4", 2)
        .when(d >= "2", 3)
        .otherwise(4)
    )
    return (
        toks.select(
            "source",
            F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("register"),
            rho.cast("long").alias("rho"),
        )
        .groupBy("source", "register")
        .agg(F.max("rho").alias("max_rho"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (the canonical FREQUENCY sketch)
# ---------------------------------------------------------------------------
# KMV answers "how many distinct"; HLL's registers answer it mergeably;
# Count-Min (Cormode & Muthukrishnan 2005) answers "how often does THIS
# key occur" in bounded space: CMS_DEPTH independent hash rows of
# CMS_WIDTH counters, point estimate = min over rows of the addressed
# cell — never an underestimate, overestimate bounded by collisions
# (ε ≈ e/width of the total count, δ ≈ e^-depth). Everything here is
# exact integer arithmetic on the shared md5 hash family (row i salts
# the hash with 'cms{i}:'), so the DuckDB oracle replays the cell
# table AND the estimates bit-for-bit.
#
# The entry builds the 4×256-cell table over the corpus token stream
# and reads it back for the top-CMS_TOPK exact tokens, emitting exact
# and estimated counts side by side — the overestimate invariant
# (n_cms ≥ n_exact, equality unless the token's every row collides) is
# pytest-gated and visible in the output.
#
# 100 TB shape: the cell table is a bounded-state commutative aggregate
# (DEPTH·WIDTH int64 cells) — map-side partial counts, one tiny
# shuffle, cells merge by + across partitions/batches/clusters exactly
# like HLL registers merge by MAX. Point queries join a broadcast
# 1024-row frame. Nothing scales with the vocabulary.
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 20


def _cms_bucket_sql(i: str) -> str:
    """DuckDB bucket expression for salted row ``i`` (an SQL ref)."""
    return (
        f"CAST('0x' || substr(md5('cms' || CAST({i} AS VARCHAR) || ':' "
        f"|| token), 1, 15) AS BIGINT) % {CMS_WIDTH}"
    )


def cms_bucket_col(token_col, i_col):
    """The salted-row CMS bucket, same integers as ``_cms_bucket_sql``
    (and therefore the DuckDB oracle): row i hashes 'cms{i}:' || token
    through the shared md5 family, 60-bit prefix mod WIDTH."""
    salted = F.concat(
        F.lit("cms"), i_col.cast("string"), F.lit(":"), token_col
    )
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
        % CMS_WIDTH
    )


def cms_cell_table(docs: DataFrame) -> DataFrame:
    """Per-source CMS cell table (source, i, bucket, cnt) over the
    documents' token stream — the bounded-state partial the streaming
    ingest gate appends per micro-batch and SUM-merges (cells merge by
    + across batches/partitions/clusters). |sources|·DEPTH·WIDTH rows,
    independent of corpus size."""
    spark = docs.sparkSession
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token"),
    )
    rows = spark.range(CMS_DEPTH).select(F.col("id").cast("long").alias("i"))
    return (
        toks.crossJoin(F.broadcast(rows))
        .groupBy(
            "source",
            "i",
            cms_bucket_col(F.col("token"), F.col("i")).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


@query(
    "sketch_count_min",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    rows_ AS (SELECT unnest(range({CMS_DEPTH})) AS i),
    cells AS (
      SELECT i, {_cms_bucket_sql('i')} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks CROSS JOIN rows_
      GROUP BY 1, 2
    ),
    top_exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM toks GROUP BY 1
      ORDER BY n_exact DESC, token
      LIMIT {CMS_TOPK}
    ),
    probes AS (
      SELECT token, n_exact, i, {_cms_bucket_sql('i')} AS bucket
      FROM top_exact CROSS JOIN rows_
    )
    SELECT p.token, MAX(p.n_exact) AS n_exact,
           CAST(MIN(c.cnt) AS BIGINT) AS n_cms
    FROM probes p JOIN cells c ON c.i = p.i AND c.bucket = p.bucket
    GROUP BY p.token
    """,
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the corpus token stream: build
    the DEPTH×WIDTH cell table, then read back point estimates for the
    top-K exact tokens — (token, n_exact, n_cms) with the CMS
    overestimate invariant on display. Section comment has the bounds
    and the 100 TB merge shape."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token")
    )
    rows = spark.range(CMS_DEPTH).select(F.col("id").cast("long").alias("i"))
    bucket = cms_bucket_col(F.col("token"), F.col("i"))
    cells = (
        toks.crossJoin(F.broadcast(rows))
        .groupBy("i", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top_exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "token")
        .limit(CMS_TOPK)
    )
    probes = top_exact.crossJoin(F.broadcast(rows)).select(
        "token", "n_exact", "i", bucket.alias("bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("token")
        .agg(
            F.max("n_exact").alias("n_exact"),
            F.min("cnt").alias("n_cms"),
        )
    )
