"""Near-duplicate clustering: pair edges → connected components.

Pairwise near-dup detection (``operators/dedup.py``) emits edges; a real
training-data pipeline needs the *transitive closure* of those edges —
"A≈B and B≈C" must put A, B, C in one group even when A and C are not
directly similar — then keeps one canonical document per group. This
module closes that gap: connected components over the union of exact-
duplicate edges and exact-Jaccard near-dup edges, component id = min
doc_id in the component (so singletons are their own component and the
canonical doc is the smallest id, matching ``dedup_exact``'s
``min(doc_id)`` convention).

Algorithm: min-label propagation with pointer jumping. Each round,
every node takes the min of its own and its neighbors' labels
(propagate), then replaces its label with its label's label
(shortcut) — the shortcut halves chain lengths, so convergence is
O(log diameter) rounds instead of O(diameter). This is the same
round-compression idea as the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond"),
expressed over a (node → label) frame instead of edge rewrites.

Scale notes (100 TB):
- The label frame is one row per document and the edge frame one row
  per near-dup pair — both orders of magnitude smaller than the corpus
  text after the pair-generation stage. Each round is one shuffle-join
  on ``src`` plus one groupBy on ``dst``; hash partitioning on the join
  key is stable across rounds so AQE reuses exchanges where possible.
- ``localCheckpoint`` truncates the per-round lineage (the plan would
  otherwise double every iteration and overwhelm the driver long before
  the executors notice). On a real cluster with reliable storage,
  ``checkpoint()`` to the cluster FS instead — same call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query
from .dedup import (
    NEAR_DUP_COSINE,
    NEAR_DUP_JACCARD,
    _SQL_SHINGLES,
    _sql_emb_cand_ctes,
    dedup_ngram_jaccard,
)

MAX_ROUNDS = 50  # safety net; diameter-bound convergence is expected

# One component labeling per (session, sf_dir): the label frame feeds
# several consumers (component report, cluster stats, corpus selection)
# and is the product of a multi-round loop — recomputing it per consumer
# would repeat every round. Same pattern (and rationale) as
# dedup.cached_shingles; at 100 TB this is "materialize the dedup
# labels once, reuse across the curation run".
_COMPONENT_CACHE: dict[tuple[str, str], DataFrame] = {}

# Edge frames are consumed twice per curation run (text-only components
# and the multimodal union) — persist per (session, sf) like the labels.
_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """Min-label propagation over undirected ``edges`` (src, dst).

    ``nodes``: one column ``doc_id`` (isolated nodes allowed).
    Returns (doc_id, component_id) where component_id = min doc_id
    reachable from the node.
    """
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates()
        .persist()
    )
    # Only nodes incident to an edge can ever change labels — run the
    # iterative loop on that (much smaller) active subgraph and union the
    # isolated nodes back as their own singletons at the end. Near-dup
    # edges are sparse relative to the corpus, so at 100 TB this turns
    # "iterate over every document" into "iterate over the dup graph".
    # Restrict to ``nodes``: the output contract is "exactly the nodes
    # set" — a caller passing edges with stray endpoints outside nodes
    # must not silently widen the result.
    active = (
        sym.select(F.col("src").alias("doc_id"))
        .dropDuplicates()
        .join(nodes.select("doc_id"), "doc_id", "left_semi")
    )
    active = active.localCheckpoint(eager=True)  # survives sym.unpersist()
    labels = active.select("doc_id", F.col("doc_id").alias("component_id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_rounds):
        # propagate: take the min of my label and my neighbors' labels
        nbr_min = (
            sym.join(labels, sym["src"] == labels["doc_id"])
            .groupBy("dst")
            .agg(F.min("component_id").alias("nbr_min"))
        )
        prop = labels.join(
            nbr_min, labels["doc_id"] == nbr_min["dst"], "left"
        ).select(
            "doc_id",
            F.least(
                F.col("component_id"), F.coalesce("nbr_min", F.col("component_id"))
            ).alias("component_id"),
            F.col("component_id").alias("prev"),
        )
        # pointer-jump (shortcut): my label becomes my label's label.
        # Propagation alone needs O(component diameter) rounds — sparse
        # similarity graphs form long chains (measured 11 rounds on the
        # sf0.1 embedding graph); halving path lengths each round makes
        # it O(log d) (measured 5 rounds, 2.3× faster end-to-end).
        ptr = prop.select(
            F.col("doc_id").alias("pid"), F.col("component_id").alias("pcomp")
        )
        updated = prop.join(ptr, prop["component_id"] == ptr["pid"]).select(
            "doc_id",
            F.col("pcomp").alias("component_id"),
            (F.col("pcomp") < F.col("prev")).alias("changed"),
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("changed")).limit(1).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")

    sym.unpersist()
    isolated = nodes.select("doc_id").join(active, "doc_id", "left_anti")
    return labels.union(
        isolated.select("doc_id", F.col("doc_id").alias("component_id"))
    )


def near_dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of exact-duplicate edges (same canonical fingerprint — covers
    docs too short to produce a trigram shingle) and exact-Jaccard ≥ τ
    near-dup edges, as (src, dst) with src < dst. Persisted per
    (session, sf): both the text-only and the multimodal component
    queries consume this frame."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EDGE_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        fp = docs.select(
            "doc_id", F.md5(F.lower(F.trim("text"))).alias("fingerprint")
        )
        exact = (
            fp.withColumn(
                "src", F.min("doc_id").over(Window.partitionBy("fingerprint"))
            )
            .filter(F.col("src") < F.col("doc_id"))
            .select("src", F.col("doc_id").alias("dst"))
        )
        jacc = dedup_ngram_jaccard(spark, sf_dir).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        _EDGE_CACHE[key] = exact.union(jacc).dropDuplicates().persist()
    return _EDGE_CACHE[key]


_SQL_COMPONENTS = f"""
    WITH RECURSIVE
    sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    jacc AS (
      SELECT doc_a AS src, doc_b AS dst
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {NEAR_DUP_JACCARD}
    ),
    exact AS (
      SELECT min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS src,
             doc_id AS dst
      FROM documents
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT src, dst FROM jacc
        UNION SELECT src, dst FROM exact WHERE src < dst
      )
      UNION SELECT dst, src FROM (
        SELECT src, dst FROM jacc
        UNION SELECT src, dst FROM exact WHERE src < dst
      )
    ),
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id,
           CAST(min(lbl) AS BIGINT) AS component_id,
           min(lbl) = node AS is_canonical
    FROM walk GROUP BY node
"""


@query("dedup_components", _SQL_COMPONENTS)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over near-dup edges: every document labeled
    with its duplicate-cluster id (= min doc_id in the cluster) and a
    canonical flag. This is the keep/drop decision a dedup pipeline
    actually ships — pair lists are an intermediate.

    Oracle: DuckDB recursive CTE computing min reachable label
    (transitive closure) — exponentially more work than the Spark loop,
    but exact at test scale."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _COMPONENT_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _COMPONENT_CACHE[key] = connected_components(
            docs.select("doc_id"), near_dup_edges(spark, sf_dir)
        )
    return _COMPONENT_CACHE[key].withColumn(
        "is_canonical", F.col("component_id") == F.col("doc_id")
    )


@query(
    "dedup_component_stats",
    f"""
    WITH comp AS ({_SQL_COMPONENTS})
    SELECT component_id,
           COUNT(*) AS member_count
    FROM comp GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def dedup_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram input: non-singleton components and their
    sizes — the dedup-rate report (docs dropped = Σ(size-1))."""
    comp = dedup_components(spark, sf_dir)
    return (
        comp.groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("member_count"))
        .filter(F.col("member_count") > 1)
    )


# ---------------------------------------------------------------------------
# Multimodal clustering: text ∪ embedding evidence
# ---------------------------------------------------------------------------
_SQL_MULTIMODAL_COMPONENTS = f"""
    WITH RECURSIVE
    sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    jacc AS (
      SELECT doc_a AS src, doc_b AS dst
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {NEAR_DUP_JACCARD}
    ),
    exact AS (
      SELECT min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS src,
             doc_id AS dst
      FROM documents
    ),
    {_sql_emb_cand_ctes()},
    emb AS (
      SELECT vec_a AS src, vec_b AS dst FROM escore
      WHERE sim >= {NEAR_DUP_COSINE}
    ),
    fwd AS (
      SELECT src, dst FROM jacc
      UNION SELECT src, dst FROM exact WHERE src < dst
      UNION SELECT src, dst FROM emb
    ),
    edges AS MATERIALIZED (SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id,
           CAST(min(lbl) AS BIGINT) AS component_id,
           min(lbl) = node AS is_canonical
    FROM walk GROUP BY node
"""


@query("dedup_multimodal_components", _SQL_MULTIMODAL_COMPONENTS)
def dedup_multimodal_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the UNION of evidence modalities: exact
    fingerprints, trigram-Jaccard text pairs, and embedding-cosine
    pairs (doc_id ≡ vec_id in the testdata). Pairs any single method
    misses still merge when another modality links them — the strongest
    (and most aggressive) dedup the pipeline offers; same component
    loop, bigger edge set.

    The embedding edges come from the scale path
    (``dedup_embedding_candidates``: LSH candidates + exact verify, the
    only formulation that survives 100 TB) rather than the all-pairs
    truth mode; the oracle replays the same candidate pipeline, and
    candidate recall vs all-pairs stays gated in tests."""
    from .dedup import dedup_embedding_candidates

    docs = load_table(spark, sf_dir, "documents")
    emb_edges = dedup_embedding_candidates(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    # Contract the text graph first: the text-only labeling is already
    # materialized (_COMPONENT_CACHE via dedup_components), and replacing
    # its edges with star edges (text-canonical → member) preserves
    # connectivity exactly while collapsing every text chain to diameter
    # ≤ 2 — the union loop then only has to close over the *embedding*
    # chains instead of re-walking (and re-mining) the text edges.
    text_comp = dedup_components(spark, sf_dir)
    star = text_comp.filter(F.col("component_id") != F.col("doc_id")).select(
        F.col("component_id").alias("src"), F.col("doc_id").alias("dst")
    )
    edges = star.union(emb_edges).dropDuplicates()
    comp = connected_components(docs.select("doc_id"), edges)
    return comp.withColumn(
        "is_canonical", F.col("component_id") == F.col("doc_id")
    )
