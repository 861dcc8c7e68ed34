"""Text analysis over the ``documents`` table.

All hot-path logic is Catalyst built-ins (split/regexp/length/md5 —
JVM-side, codegen'd); no Python touches row data. Token-level metrics
explode to a (doc_id, token) relation and aggregate back — the shape
that scales: the explode is map-side, the agg shuffles only on doc_id.

Determinism notes mirror plans/testdata_queries: integer casts pinned,
double divisions computed with the same expression tree on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query

# Whitespace tokenizer shared by every text operator (both dialects).
TOKEN_SPLIT = r"\s+"
# Tiny function-word list for the language-ID heuristic. The testdata
# corpus is a synthetic single-vocabulary soup, so the heuristic is the
# demonstrable capability; on real corpora the marker lists grow per
# language.
EN_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, token) relation — the base of token-level analytics."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token"),
    )


_SQL_TOKENS = (
    "SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
    "FROM documents"
)


@query(
    "text_token_count",
    f"""
    WITH toks AS ({_SQL_TOKENS})
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens
    FROM toks GROUP BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts (the BPE-style subword estimate is
    ``text_bpe_token_count``); exact token counting for budget
    estimation in a training pipeline."""
    return _tokens(spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("token").alias("n_distinct_tokens"),
    )


@query(
    "text_quality_scores",
    f"""
    WITH toks AS ({_SQL_TOKENS}),
    t AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct,
             CAST(SUM(length(token)) AS BIGINT) AS token_chars
      FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(length(d.text) AS BIGINT) AS n_chars,
           t.n_tokens,
           CAST(t.n_distinct AS DOUBLE) / t.n_tokens AS type_token_ratio,
           CAST(t.token_chars AS DOUBLE) / t.n_tokens AS avg_token_len
    FROM documents d JOIN t USING (doc_id)
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: length, type-token ratio (repetition detector),
    mean token length — the standard cheap filters before expensive
    model-based scoring."""
    docs = load_table(spark, sf_dir, "documents")
    t = (
        _tokens(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct("token").alias("n_distinct"),
            F.sum(F.length("token")).alias("token_chars"),
        )
    )
    return docs.join(t, "doc_id").select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        "n_tokens",
        (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "type_token_ratio"
        ),
        (F.col("token_chars").cast("double") / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
    )


_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@query(
    "text_langid",
    f"""
    WITH toks AS ({_SQL_TOKENS})
    SELECT doc_id,
           CAST(SUM(CASE WHEN token IN ({_STOP_LIST_SQL}) THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS stopword_ratio,
           CASE WHEN CAST(SUM(CASE WHEN token IN ({_STOP_LIST_SQL}) THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*) > 0.03
                THEN 'en' ELSE 'und' END AS lang_pred
    FROM toks GROUP BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-ratio language ID (n-gram heuristic family).
    Declarative: explode → conditional agg; no per-row Python."""
    is_stop = F.col("token").isin(*EN_STOPWORDS)
    ratio = F.sum(F.when(is_stop, 1).otherwise(0)).cast("double") / F.count(F.lit(1))
    return (
        _tokens(spark, sf_dir)
        .groupBy("doc_id")
        .agg(ratio.alias("stopword_ratio"))
        .withColumn(
            "lang_pred",
            F.when(F.col("stopword_ratio") > 0.03, F.lit("en")).otherwise(F.lit("und")),
        )
    )


@query(
    "text_fingerprint",
    """
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form content fingerprint (the exact-dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fingerprint"))


# Winnowing (rolling-hash document fingerprinting, Schleimer et al.):
# hash every k-char gram, slide a w-position window, keep each window's
# minimum — the classic plagiarism/near-dup fingerprint that guarantees
# any shared substring of length >= k+w-1 shares a fingerprint. The
# "hash" is a 16-hex-char md5 prefix: identical on both engines, and
# winnowing only needs a total order, which lexicographic hex gives.
WINNOW_K = 8  # gram length (chars)
WINNOW_W = 4  # window length (positions)

_WINNOW_SPARK = f"""
    transform(
      sequence(1, greatest(length(t) - {WINNOW_K - 1}, 1)),
      i -> substring(md5(substring(t, i, {WINNOW_K})), 1, 16)
    )
"""

# DuckDB: range(a, b) is [a, b) and list slicing l[i:j] is 1-based
# inclusive — both expressions below enumerate the same gram starts
# 1..len-k+1 and the same w-element windows as the Spark side.
_WINNOW_SQL = f"""
    WITH canon AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
    grams AS (
      SELECT doc_id,
             [substr(md5(substr(t, i, {WINNOW_K})), 1, 16)
              for i in range(1, greatest(length(t) - {WINNOW_K - 1}, 1) + 1)] AS g
      FROM canon
    )
    SELECT DISTINCT doc_id,
           unnest([list_min(g[i:i + {WINNOW_W - 1}])
                   for i in range(1, greatest(len(g) - {WINNOW_W - 1}, 1) + 1)])
             AS fingerprint
    FROM grams
"""


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) winnowed rolling-hash fingerprints — all
    Catalyst higher-order functions over per-row arrays: linear per-doc
    work, no shuffle until the final DISTINCT on (doc_id, fingerprint)."""
    canon = docs.select("doc_id", F.lower(F.trim("text")).alias("t"))
    grams = canon.select("doc_id", F.expr(_WINNOW_SPARK).alias("g"))
    fps = grams.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(g) - {WINNOW_W - 1}, 1)),"
                f" i -> array_min(slice(g, i, {WINNOW_W})))"
            )
        ).alias("fingerprint"),
    )
    return fps.dropDuplicates(["doc_id", "fingerprint"])


@query("text_winnowing", _WINNOW_SQL)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprints of the documents table (see
    winnow_fingerprints for the algorithm and scale shape)."""
    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Distribution statistics: exact per-stratum quantiles
# ---------------------------------------------------------------------------
_QUANTILES = (0.5, 0.9, 0.99)


@query(
    "text_length_quantiles",
    """
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           MAX(CASE WHEN rk = CAST(ceil(0.50 * n) AS BIGINT) THEN n_chars END) AS p50,
           MAX(CASE WHEN rk = CAST(ceil(0.90 * n) AS BIGINT) THEN n_chars END) AS p90,
           MAX(CASE WHEN rk = CAST(ceil(0.99 * n) AS BIGINT) THEN n_chars END) AS p99
    FROM (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    GROUP BY lang, n
    """,
)
def text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p50/p90/p99) of document length per
    language — the length-distribution report a curation run emits.

    Discrete (rank-selected) rather than interpolated quantiles: the
    value at rank ceil(q·n) is an element of the data, so the result is
    integer-exact and engine-portable — interpolated percentiles differ
    across engines in floating-point summation order. One shuffle
    (window over lang); at scale, skewed strata sort long — swap in
    percentile_approx when a bounded-error answer is acceptable."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("rk") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias(f"p{int(q * 100)}")
        for q in _QUANTILES
    ]
    return (
        ranked.groupBy("lang", "n")
        .agg(*aggs)
        .select("lang", F.col("n").cast("long").alias("n_docs"), "p50", "p90", "p99")
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary: global top-k tokens by document frequency
# ---------------------------------------------------------------------------
VOCAB_TOPK = 50


@query(
    "text_vocab_topk",
    f"""
    WITH toks AS ({_SQL_TOKENS})
    SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM toks GROUP BY token
    ORDER BY doc_freq DESC, token
    LIMIT {VOCAB_TOPK}
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k vocabulary by document frequency (token appears in how many
    docs), deterministic tiebreak on the token itself. The global top-k
    is a TakeOrderedAndProject — partial top-k per partition, only k
    rows cross the final exchange, no full sort at any scale."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.groupBy("token")
        .agg(F.count_distinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "token")
        .limit(VOCAB_TOPK)
    )


# ---------------------------------------------------------------------------
# TF-IDF: top terms per document
# ---------------------------------------------------------------------------
TFIDF_TOPK = 5


@query(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS ({_SQL_TOKENS}),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, token
             ) AS rk
      FROM scored
    )
    WHERE rk <= {TFIDF_TOPK}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf — the classic
    relevance/topic signal, and the standard cheap doc-descriptor before
    embeddings. tf and df are exact integers (two shuffles: (doc, token)
    and token); the only float is the final score, rounded to 6 decimals
    so a ULP of libm ln() difference across engines cannot flip the
    hash or the rank order (ties break on the token)."""
    toks = _tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    # corpus size as a broadcast 1-row frame, not a driver .count() —
    # keeps the whole plan lazy/single-submission
    n = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "df", "tfidf")
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------
# Detection patterns restricted to the Java-regex (Spark) / RE2 (DuckDB)
# shared subset — character classes, bounded repeats, \b word boundaries;
# no lookaround (RE2 lacks it). The testdata corpus is synthetic word
# soup with no real PII, so the scrubber is exercised on a PII-bearing
# variant derived deterministically from each doc's id (email + IPv4 +
# phone appended); the operator itself — detect counts, global redaction,
# redacted fingerprint — is exactly what runs on a real corpus.
PII_EMAIL = r"[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"

_PII_TEXT_SQL = """
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         || '.25 call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
"""


@query(
    "text_pii_scrub",
    f"""
    WITH p AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PII_IPV4}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
                  '{PII_EMAIL}', '<EMAIL>', 'g'),
                  '{PII_IPV4}', '<IP>', 'g'),
                  '{PII_PHONE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                  '{PII_EMAIL}', '<EMAIL>', 'g'),
                  '{PII_IPV4}', '<IP>', 'g'),
                  '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_fp
    FROM p
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: per-doc detection counts (emails, IPv4s, phone
    numbers) and the md5 + length of the globally-redacted text — the
    pre-training privacy pass. Pure codegen (regexp_extract_all +
    regexp_replace, both JVM-side and global by default in Spark): one
    pass over the corpus, no shuffle, verified against DuckDB's RE2 on
    the shared pattern subset."""
    docs = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".25 call 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    p = docs.select("doc_id", pii_text.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return p.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(PII_IPV4), 0))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all("t", F.lit(PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Unigram language-model score (model-based quality signal)
# ---------------------------------------------------------------------------
@query(
    "text_unigram_logprob",
    f"""
    WITH toks AS ({_SQL_TOKENS}),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ),
    ctf AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS ctf
      FROM toks GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM toks)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           round(SUM(tf.tf * ln(ctf.ctf / n.n_total)) / SUM(tf.tf), 6)
             AS mean_logprob
    FROM tf JOIN ctf USING (token) CROSS JOIN n
    GROUP BY tf.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-token log-probability of each document under the
    corpus's own unigram MLE — the cheapest model-based quality score
    (a distribution-level outlier detector: docs of rare tokens score
    low, boilerplate of head tokens scores high). Two exact integer
    aggregations (term and corpus frequencies) joined on the token;
    the only floats are the final ln/divide, rounded to 6 decimals so
    cross-engine libm ULP differences cannot flip the hash. Same
    two-shuffle shape as tf·idf — at 100 TB the (token) relation is
    the vocabulary, orders of magnitude smaller than the corpus."""
    toks = _tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    ctf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("ctf"))
    n = toks.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        tf.join(ctf, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.log(F.col("ctf") / F.col("n_total")))
                / F.sum("tf"),
                6,
            ).alias("mean_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# BPE-style subword pre-tokenizer counts
# ---------------------------------------------------------------------------
# GPT-2-style pre-tokenizer alternation, restricted to the subset both
# Java regex (Spark) and RE2 (DuckDB) implement with identical leftmost-
# first semantics — no lookahead (RE2 lacks it). Contractions, then
# space-prefixed letter/digit/punctuation runs, then whitespace runs.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
_SQL_BPE_PATTERN = BPE_SPLIT_PATTERN.replace("'", "''")


@query(
    "text_bpe_token_count",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{_SQL_BPE_PATTERN}')) AS BIGINT)
               AS n_bpe_tokens,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_ws_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT doc_id, n_bpe_tokens, n_ws_tokens,
           CAST(n_chars AS DOUBLE) / n_bpe_tokens AS chars_per_bpe_token
    FROM t
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-token budget estimation with a BPE-style pre-tokenizer
    (the whitespace count under-estimates subword token spend; the
    chars-per-token ratio is the calibration constant pipelines track
    per source/language). Pure codegen — regexp_extract_all + size, no
    explode, no shuffle: one pass over the corpus, verified bit-exact
    against DuckDB's RE2 on the shared pattern subset."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.split(F.trim("text"), TOKEN_SPLIT)).cast("long").alias("n_ws_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return t.select(
        "doc_id",
        "n_bpe_tokens",
        "n_ws_tokens",
        (F.col("n_chars").cast("double") / F.col("n_bpe_tokens")).alias(
            "chars_per_bpe_token"
        ),
    )


# ---------------------------------------------------------------------------
# Substring-level duplication (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better", arXiv:2107.06499): whole-document
# dedup misses the boilerplate SPANS repeated across otherwise-distinct
# pages. Winnowed fingerprints give a span-granular signal: every
# fingerprint names a local k-gram window, so a fingerprint occurring in
# ≥2 documents marks a cross-document duplicated span.
# ---------------------------------------------------------------------------
@query(
    "text_duplicate_spans",
    f"""
    WITH fp AS ({_WINNOW_SQL}),
    df AS (SELECT fingerprint, COUNT(*) AS nd FROM fp GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_share
    FROM fp JOIN df USING (fingerprint)
    GROUP BY doc_id
    """,
)
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document substring-duplication report: of a doc's winnowed
    fingerprints, how many also occur in at least one OTHER document
    (``n_shared``), and what share of the doc that is (``dup_share`` —
    the filter key for span-level dedup: docs above a threshold get
    their boilerplate cut or are dropped).

    Scale shape: the fingerprint document frequency is the classic
    inverted index, computed as a count-over-window on the ONE
    fingerprint-keyed shuffle (round 10 — the former groupBy + join
    formulation re-ran the md5-heavy winnowing once per branch because
    the aggregate's map-side partials broke exchange reuse); a
    boilerplate fingerprint shared by millions of docs is just a high
    count, not a hot task. Everything before the shuffle is per-row
    higher-order functions (rolling md5 grams + window minima) inside
    codegen. One IEEE divide per doc at the end; the oracle replays
    the identical pipeline, so the driver hash-checks every value."""
    fps = winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    wfp = Window.partitionBy("fingerprint")
    shared = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        fps.withColumn("nd", F.count(F.lit(1)).over(wfp))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
            shared.cast("long").alias("n_shared"),
        )
        .withColumn(
            "dup_share",
            F.col("n_shared").cast("double") / F.col("n_fingerprints"),
        )
    )


# ---------------------------------------------------------------------------
# Source-mixture divergence: the data-card question "which source's
# token distribution is furthest from the corpus mixture" — the
# diagnostic a mixture-weighting pass reads before re-weighting.
# ---------------------------------------------------------------------------


@query(
    "text_source_divergence",
    """
    WITH st AS (
      SELECT source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    sc AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM st GROUP BY 1, 2
    ),
    ns AS (
      SELECT source, CAST(SUM(c) AS DOUBLE) AS n_src,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM sc GROUP BY 1
    ),
    cc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS ct FROM st GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_corpus FROM st)
    SELECT sc.source, ns.n_tokens, ns.n_distinct,
           round(SUM((sc.c / ns.n_src)
                 * ln((sc.c / ns.n_src) / (cc.ct / n.n_corpus))), 6)
             AS kl_divergence
    FROM sc JOIN ns USING (source) JOIN cc USING (token) CROSS JOIN n
    GROUP BY 1, 2, 3
    ORDER BY 1
    """,
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence between the source's unigram MLE and
    the corpus mixture — KL(P_source || P_corpus) = Σ_t p_st ·
    ln(p_st / p_t). Always finite (a source's support is a subset of
    the corpus's), zero iff the source matches the mixture; the
    re-weighting diagnostic beside ``sketch_source_overlap``'s set
    view and ``curation_mix_report``'s count view.

    Same two-shuffle vocabulary-relation shape as tf·idf /
    unigram-logprob: exact integer (source, token) and (token) counts
    joined on the token, per-source totals broadcast back, one float
    chain per vocabulary row with the sum rounded to 6 decimals so
    cross-engine libm/order ULP differences cannot flip the hash. At
    100 TB the shuffles carry the vocabulary, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    st = docs.select(
        "source", F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token")
    )
    sc = st.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    ns = sc.groupBy("source").agg(
        F.sum("c").cast("double").alias("n_src"),
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    cc = st.groupBy("token").agg(F.count(F.lit(1)).alias("ct"))
    n = st.agg(F.count(F.lit(1)).cast("double").alias("n_corpus"))
    p_s = F.col("c") / F.col("n_src")
    p_c = F.col("ct") / F.col("n_corpus")
    return (
        sc.join(F.broadcast(ns), "source")
        .join(cc, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("source", "n_tokens", "n_distinct")
        .agg(F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl_divergence"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# BPE merge training: tokenizer-vocabulary induction over the corpus
# ---------------------------------------------------------------------------
# The one tokenizer operation a training-data pipeline RUNS AT CORPUS
# SCALE is not encoding (that's per-row) but vocabulary induction:
# byte-pair-encoding merge training à la Sennrich (ACL 2016) — count
# adjacent symbol pairs weighted by word frequency, merge the most
# frequent pair, re-segment, repeat. The distributed shape mirrors
# what production tokenizer trainers do: ONE corpus-scale shuffle
# builds the word-frequency relation (groupBy(word) with map-side
# combine — the shuffle carries |word vocab| rows, not the token
# stream), and every training round after that runs on the
# vocab-sized segmentation relation: one pair-explode + groupBy
# (shuffle O(|vocab| · avg word length)), one 1-row argmax collect,
# one zero-shuffle higher-order-function re-segmentation. Rounds are
# Spark actions over a persisted segmentation (previous round
# unpersisted), so lineage never re-expands — the iterative-algorithm
# pattern of MLlib trainers.
#
# Determinism: pair counts are exact longs; the argmax tie-break is
# (count DESC, lhs ASC, rhs ASC); re-segmentation is left-to-right
# greedy non-overlapping (Sennrich's re.sub semantics), implemented as
# an array fold on Spark and, on the oracle side, as the positional
# even-offset-within-run rule — provably the same greedy (a merged
# symbol can never equal lhs, since merged = lhs||rhs with rhs
# non-empty, so a fold's fresh merge never re-matches within the
# round). The DuckDB oracle unrolls all BPE_MERGES rounds as
# MATERIALIZED CTE chains — the same replay-the-training contract as
# the PCA power-iteration oracle.

BPE_MERGES = 8
# Counted driver-fallback bound (the clusters.py union-find pattern):
# below this many distinct words the training rounds run driver-side
# on one bounded collect of the word-frequency relation — byte-
# identical semantics (pytest-pinned vs the distributed rounds), ~10
# Spark jobs cheaper. Above it, the distributed per-round path runs.
BPE_LOCAL_VOCAB_LIMIT = 1_000_000


def _bpe_pairs(seg: DataFrame) -> DataFrame:
    """(lhs, rhs, c): adjacent-pair frequencies over a segmentation
    relation (word, f, syms), every adjacent position counted
    (Sennrich's get_stats)."""
    pairs = F.expr(
        "transform(slice(syms, 2, size(syms) - 1),"
        " (x, i) -> struct(element_at(syms, i + 1) AS lhs, x AS rhs))"
    )
    return (
        seg.filter(F.size("syms") >= 2)
        .select("f", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("f").cast("long").alias("c"))
    )


def _bpe_apply(seg: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Greedy left-to-right merge of (lhs, rhs) in every word's symbol
    array — a zero-shuffle JVM fold."""
    merged = lhs + rhs

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return seg.select(
        "word",
        "f",
        F.aggregate(
            "syms", F.expr("cast(array() as array<string>)"), step
        ).alias("syms"),
    )


_BPE_CACHE: dict[tuple[str, str], list[tuple[int, str, str, str, int]]] = {}


def _bpe_train_local(
    wordfreqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side training rounds over a bounded word-frequency list —
    the same pair counting (every adjacent position), argmax tie-break
    (count DESC, lhs, rhs) and greedy left-to-right fold as the
    distributed path."""
    vocab: list[tuple[list[str], int]] = [
        (list(w), f) for w, f in wordfreqs
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = lhs + rhs
        merges.append((rank, lhs, rhs, merged, c))
        nxt: list[tuple[list[str], int]] = []
        for syms, f in vocab:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == lhs and x == rhs:
                    out[-1] = merged
                else:
                    out.append(x)
            nxt.append((out, f))
        vocab = nxt
    return merges


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Train ``n_merges`` BPE merges; returns
    [(rank, lhs, rhs, merged, pair_count), ...] (cached per session —
    the merge table is the metadata-sized training artifact)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BPE_CACHE:
        words = (
            _tokens(spark, sf_dir)
            .filter((F.col("token").isNotNull()) & (F.col("token") != ""))
            .groupBy(F.col("token").alias("word"))
            .agg(F.count(F.lit(1)).cast("long").alias("f"))
        )
        n_vocab = words.count()
        if n_vocab <= BPE_LOCAL_VOCAB_LIMIT:
            rows = words.collect()  # bounded: ≤ BPE_LOCAL_VOCAB_LIMIT
            _BPE_CACHE[key] = _bpe_train_local(
                [(r["word"], int(r["f"])) for r in rows], n_merges
            )
            return _BPE_CACHE[key]
        seg = words.select(
            "word",
            "f",
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1))"
            ).alias("syms"),
        ).persist()
        merges: list[tuple[int, str, str, str, int]] = []
        prev: DataFrame | None = None
        for rank in range(1, n_merges + 1):
            # One action per round: the argmax collect materializes the
            # persisted segmentation as a side effect, so no separate
            # count() job is needed; the previous round's cache is
            # released once its successor is materialized.
            best = (
                _bpe_pairs(seg)
                .orderBy(F.col("c").desc(), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
            if not best:
                break
            lhs, rhs, c = best[0]["lhs"], best[0]["rhs"], int(best[0]["c"])
            merges.append((rank, lhs, rhs, lhs + rhs, c))
            prev, seg = seg, _bpe_apply(seg, lhs, rhs).persist()
        seg.unpersist()
        if prev is not None:
            prev.unpersist()
        _BPE_CACHE[key] = merges
    return _BPE_CACHE[key]


def _bpe_round_sql(r: int) -> str:
    """One unrolled training round: pair counts + deterministic argmax
    over seg{r-1}, then the positional greedy re-segmentation (merge
    starts = even offsets within each run of consecutive matches —
    runs only arise when lhs = rhs)."""
    p = r - 1
    return f"""
    ex{r} AS MATERIALIZED (
      SELECT word, f, unnest(syms) AS s, generate_subscripts(syms, 1) AS i
      FROM seg{p}
    ),
    pc{r} AS MATERIALIZED (
      SELECT s AS lhs, nxt AS rhs, CAST(SUM(f) AS BIGINT) AS c
      FROM (SELECT word, f, s, i,
                   LEAD(s) OVER (PARTITION BY word ORDER BY i) AS nxt
            FROM ex{r})
      WHERE nxt IS NOT NULL
      GROUP BY 1, 2
    ),
    best{r} AS MATERIALIZED (
      SELECT lhs, rhs, c FROM pc{r} ORDER BY c DESC, lhs, rhs LIMIT 1
    ),
    mk{r} AS MATERIALIZED (
      SELECT word, f, i, s,
             LEAD(s) OVER w AS nxt,
             COALESCE(s = (SELECT lhs FROM best{r})
                      AND LEAD(s) OVER w = (SELECT rhs FROM best{r}),
                      FALSE) AS m
      FROM ex{r}
      WINDOW w AS (PARTITION BY word ORDER BY i)
    ),
    st{r} AS MATERIALIZED (
      SELECT word, f, i, s, nxt,
             m AND ((i - MIN(i) OVER (PARTITION BY word, rg)) % 2 = 0)
               AS strt
      FROM (SELECT *,
                   CASE WHEN m THEN i - ROW_NUMBER()
                        OVER (PARTITION BY word, m ORDER BY i) END AS rg
            FROM mk{r})
    ),
    seg{r} AS MATERIALIZED (
      SELECT word, f,
             list(CASE WHEN strt THEN s || nxt ELSE s END ORDER BY i)
               AS syms
      FROM (SELECT *, COALESCE(LAG(strt) OVER (
              PARTITION BY word ORDER BY i), FALSE) AS prev_strt
            FROM st{r})
      WHERE NOT prev_strt
      GROUP BY word, f
    )"""


def _bpe_train_sql(n_merges: int = BPE_MERGES) -> str:
    rounds = ",".join(_bpe_round_sql(r) for r in range(1, n_merges + 1))
    finals = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_rank, lhs, rhs, lhs || rhs AS merged,"
        f" c AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return f"""
    WITH w0 AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
            FROM documents WHERE text IS NOT NULL)
      WHERE word IS NOT NULL AND word <> ''
      GROUP BY 1
    ),
    seg0 AS MATERIALIZED (
      SELECT word, f,
             list_transform(range(0, length(word)),
                            i -> substr(word, CAST(i + 1 AS INT), 1))
               AS syms
      FROM w0
    ),{rounds}
    SELECT * FROM ({finals}) ORDER BY merge_rank
    """


@query("text_bpe_train", _bpe_train_sql())
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained BPE merge table — {BPE_MERGES} rows of
    (merge_rank, lhs, rhs, merged, pair_count) induced from the
    corpus's word-frequency relation (section comment for the
    distributed shape, the determinism contract, and the unrolled
    oracle replay). The merge table is the metadata-sized artifact a
    tokenizer ships; the corpus is touched once (word counts), every
    round after runs on the vocab-sized segmentation."""
    merges = bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, merged string, "
        "pair_count long"
    ).orderBy("merge_rank")


def bpe_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n_sub): each word's subword count under the trained merge
    table — the distinct-word relation segmented by applying the
    cached merges in rank order as chained zero-shuffle folds."""
    merges = bpe_train(spark, sf_dir)
    words = (
        _tokens(spark, sf_dir)
        .filter((F.col("token").isNotNull()) & (F.col("token") != ""))
        .select(F.col("token").alias("word"))
        .distinct()
    )
    seg = words.select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    for _, lhs, rhs, _, _ in merges:
        seg = _bpe_apply(seg.withColumn("f", F.lit(0)), lhs, rhs).drop("f")
    return seg.select("word", F.size("syms").cast("long").alias("n_sub"))


def _bpe_encode_sql() -> str:
    """Per-document stats under the trained vocab: the oracle reruns
    the full unrolled training chain, then prices every document's
    word stream against the final segmentation seg{BPE_MERGES}."""
    n = BPE_MERGES
    rounds = ",".join(_bpe_round_sql(r) for r in range(1, n + 1))
    return f"""
    WITH w0 AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
            FROM documents WHERE text IS NOT NULL)
      WHERE word IS NOT NULL AND word <> ''
      GROUP BY 1
    ),
    seg0 AS MATERIALIZED (
      SELECT word, f,
             list_transform(range(0, length(word)),
                            i -> substr(word, CAST(i + 1 AS INT), 1))
               AS syms
      FROM w0
    ),{rounds},
    dw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents WHERE text IS NOT NULL)
      WHERE word IS NOT NULL AND word <> ''
    )
    SELECT dw.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(length(dw.word)) AS BIGINT) AS n_chars,
           CAST(SUM(length(dw.word)) AS DOUBLE) / SUM(len(s.syms))
             AS chars_per_token
    FROM dw JOIN seg{n} s USING (word)
    GROUP BY 1
    ORDER BY 1
    """


@query("text_bpe_encode", _bpe_encode_sql())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting under the TRAINED BPE vocabulary —
    the number every data-budget computation actually needs (token
    counts under the tokenizer you will train with, not whitespace
    counts). Plan: the distinct-word relation is segmented once by
    applying the cached merge table in rank order (chained JVM folds,
    zero shuffle, vocab-sized), then the (doc_id, word) stream joins
    it on word and aggregates per doc — the join shuffles on word,
    the same key the word-count shuffle already used, and the
    aggregation carries four longs per doc. The oracle replays the
    entire training chain AND the encoding join, so the entry gates
    train + apply end-to-end."""
    toks = (
        _tokens(spark, sf_dir)
        .filter((F.col("token").isNotNull()) & (F.col("token") != ""))
        .select("doc_id", F.col("token").alias("word"))
    )
    seg = bpe_segmentation(spark, sf_dir)
    return (
        toks.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            (
                F.sum(F.length("word")).cast("double")
                / F.sum("n_sub")
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BM25 relevance ranking (integer-exact accumulation)
# ---------------------------------------------------------------------------
# Okapi BM25 with the standard k1=1.2, b=0.75 over a fixed query-term
# set. Per-term scores are ONE float expression over exact-integer
# inputs (tf, df, dl, N, total_tokens), rounded to 6 decimals and
# converted to integer micro-units BEFORE the per-doc sum — so the
# cross-engine hash never depends on double-summation order, the same
# discipline as [[events_anomaly_zscore]]'s exact moments. ln() ULP
# differences between libm and the JVM are absorbed by the round-6.
BM25_TERMS = ("dup", "hash", "join")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15
_BM25_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)


@query(
    "text_bm25",
    f"""
    WITH toks AS ({{_SQL_TOKENS}}),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token IN ({_BM25_IN}) GROUP BY 1, 2
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf GROUP BY 1
    ),
    term AS (
      SELECT tf.doc_id,
             CAST(round(1000000 * round(
               ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1))
               / (tf.tf + {BM25_K1} * ((1 - {BM25_B})
                  + {BM25_B} * CAST(dl.dl * c.n_docs AS DOUBLE)
                              / c.total_tokens)),
             6), 0) AS BIGINT) AS s_micro
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN corpus c
    )
    SELECT doc_id, score_micro, n_terms
    FROM (
      SELECT doc_id,
             CAST(SUM(s_micro) AS BIGINT) AS score_micro,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             ROW_NUMBER() OVER (
               ORDER BY SUM(s_micro) DESC, doc_id) AS rk
      FROM term GROUP BY doc_id
    )
    WHERE rk <= {BM25_TOPK}
    """.replace("{_SQL_TOKENS}", _SQL_TOKENS),
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents for a fixed query-term set under Okapi BM25 —
    the lexical retrieval baseline every corpus-search / eval-harness
    pipeline keeps next to its embedding index, and the hard-negative
    miner's first stage. Scores are accumulated as integer micro-units
    (see module comment) so the ranking and the hash are engine-exact;
    ties break on doc_id.

    Plan: tf restricted to the query terms BEFORE any shuffle (the IN
    filter pushes to the token explode, so the (doc, token) aggregate
    carries query terms only — at 100 TB the tf relation is |terms|·
    |matching docs|, not the corpus token count); df aggregates that
    same tiny relation; dl is the one corpus-wide aggregate and it
    reuses the (doc_id)-keyed shuffle shape shared across the text
    family; corpus totals broadcast as a 1-row frame."""
    toks = _tokens(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    tf = (
        toks.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        (1 - BM25_B)
        + BM25_B
        * (F.col("dl") * F.col("n_docs")).cast("double")
        / F.col("total_tokens")
    )
    s_micro = F.round(
        1000000 * F.round(idf * (F.col("tf") * (BM25_K1 + 1)) / denom, 6), 0
    ).cast("long")
    term = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", s_micro.alias("s_micro"))
    )
    scored = term.groupBy("doc_id").agg(
        F.sum("s_micro").alias("score_micro"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    # sort+limit compiles to TakeOrderedAndProject — per-partition
    # top-k then a k-row driver merge, never a single-partition window
    return (
        scored.orderBy(F.desc("score_micro"), "doc_id")
        .limit(BM25_TOPK)
        .select("doc_id", "score_micro", "n_terms")
    )


# ---------------------------------------------------------------------------
# Bigram language-model score (sequence-aware quality signal)
# ---------------------------------------------------------------------------
# The unigram score above is blind to word ORDER — shuffled boilerplate
# scores identically to prose. The bigram MLE with add-1 smoothing over
# the corpus vocabulary is the cheapest sequence-aware upgrade:
# p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V). Counts are exact integers
# from two shuffles (bigram relation, unigram relation); the only
# floats are the final ln/divide, rounded to 6 decimals per the
# engine's cross-libm convention. Docs with fewer than two tokens have
# no bigrams and drop out (deterministically, in both engines).
#
# 100 TB shape: the (w1, w2) relation is the bigram VOCABULARY — far
# below the corpus token stream — and the per-doc scoring join keys on
# it with map-side partial aggregation on doc_id. The lead() window
# shuffles on doc_id once; everything else reuses that partitioning.


@query(
    "text_bigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token,
             generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1)
               AS pos
      FROM documents
    ),
    bi AS (
      SELECT doc_id, token AS w1,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    bigrams AS (SELECT doc_id, w1, w2 FROM bi WHERE w2 IS NOT NULL),
    c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams GROUP BY 1, 2
    ),
    c1 AS (
      SELECT token AS w1, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
    ),
    v AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS nv FROM toks)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(SUM(ln(CAST(c2.c + 1 AS DOUBLE) / (c1.c + v.nv)))
                 / COUNT(*), 6) AS mean_logprob2
    FROM bigrams b
    JOIN c2 USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN v
    GROUP BY b.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-bigram log-probability of each document under the
    corpus's own add-1-smoothed bigram MLE — the sequence-aware
    companion to ``text_unigram_logprob`` (token-salad boilerplate
    scores low here even when its unigram mix looks normal). Section
    comment has the smoothing convention and the 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), TOKEN_SPLIT)).alias(
            "pos", "token"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.select(
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c1")).select(
        F.col("token").alias("w1"), "c1"
    )
    v = toks.agg(F.count_distinct("token").alias("nv"))
    return (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(
                    F.log(
                        (F.col("c2") + 1).cast("double")
                        / (F.col("c1") + F.col("nv"))
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mean_logprob2"),
        )
    )


# ---------------------------------------------------------------------------
# Token-distribution drift across the ingest boundary
# ---------------------------------------------------------------------------
# The text-side twin of `embedding_drift`: ingest monitoring that fires
# BEFORE a bad batch trains. The indexed slice (doc_id below the shared
# deterministic 0.8·max watermark — yesterday's corpus) is the
# reference distribution; the incoming slice is today's batch. Both
# project onto the same DSIR_BUCKETS hashed-unigram space the DSIR
# scorer uses (64 integer buckets — bounded state at any corpus size),
# and each bucket reports its add-1-smoothed log-likelihood ratio
# ln(p_inc/p_ref), the per-bucket drift signal: a token flood from a
# new source or a vocabulary collapse shifts specific buckets long
# before any exact vocabulary diff could be afforded. Everything is
# exact integer counts plus ln() rounded to 6dp (the engine-portable
# convention `curation_dsir_weights` established), so the oracle
# replays the boundary, the bucket hash and every ratio bit-for-bit.
TOKEN_DRIFT_SPLIT_FRAC = 0.8


@query(
    "text_token_drift",
    f"""
    WITH split AS (
      SELECT CAST(floor(MAX(doc_id) * {TOKEN_DRIFT_SPLIT_FRAC}) AS BIGINT)
               AS w
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    h AS (
      SELECT CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 64 AS b,
             doc_id < (SELECT w FROM split) AS is_ref
      FROM toks
    ),
    counts AS (
      SELECT b,
             CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
               AS n_inc
      FROM h GROUP BY 1
    ),
    tot AS (SELECT SUM(n_ref) AS tr, SUM(n_inc) AS ti FROM counts),
    full_b AS (
      SELECT r.range AS bucket,
             COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_inc, 0) AS n_inc
      FROM range(0, 64) r LEFT JOIN counts c ON c.b = r.range
    )
    SELECT CAST(bucket AS INT) AS bucket, n_ref, n_inc,
           round(ln(CAST(n_inc + 1 AS DOUBLE) / (tot.ti + 64))
                 - ln(CAST(n_ref + 1 AS DOUBLE) / (tot.tr + 64)), 6) AS llr
    FROM full_b CROSS JOIN tot
    """,
)
def text_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket hashed-unigram drift between the indexed slice
    (reference distribution) and the incoming slice: (bucket, n_ref,
    n_inc, llr) over the 64-bucket DSIR space, llr = smoothed
    ln(p_inc/p_ref). Bounded state (64 rows) regardless of corpus
    size; one token-stream pass + one tiny groupBy. The drift-injection
    detection property is pytest-gated."""
    from .dedup import TOKEN_SPLIT, portable_hash60

    docs = load_table(spark, sf_dir, "documents")
    w = int(docs.agg(F.max("doc_id")).collect()[0][0] * TOKEN_DRIFT_SPLIT_FRAC)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT)).alias("token"),
    )
    counts = (
        toks.select(
            (portable_hash60("token") % 64).alias("b"),
            (F.col("doc_id") < w).alias("is_ref"),
        )
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
            .cast("long")
            .alias("n_inc"),
        )
    )
    buckets = spark.range(64).select(F.col("id").cast("int").alias("bucket"))
    full_b = buckets.join(
        counts.withColumnRenamed("b", "bucket"), "bucket", "left"
    ).select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_inc", F.lit(0)).cast("long").alias("n_inc"),
    )
    tot = full_b.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_inc").alias("ti")
    )
    llr = F.round(
        F.log((F.col("n_inc") + 1).cast("double") / (F.col("ti") + 64))
        - F.log((F.col("n_ref") + 1).cast("double") / (F.col("tr") + 64)),
        6,
    )
    return full_b.crossJoin(F.broadcast(tot)).select(
        "bucket", "n_ref", "n_inc", llr.alias("llr")
    )
