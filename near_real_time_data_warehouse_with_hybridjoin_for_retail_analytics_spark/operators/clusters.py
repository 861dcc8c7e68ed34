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
from .multimodal import (
    PHASH_MAX_HAMMING,
    _SQL_PHASH_HAMMING,
    _sql_phash_bands,
)

MAX_ROUNDS = 50  # safety net; diameter-bound convergence is expected

# Below this many symmetrized edges the component closure runs as a
# driver-side union-find over ONE bounded collect instead of the
# iterative join loop — the same small-graph switch GraphFrames'
# connectedComponents ships (its "local" algorithm below a broadcast
# threshold). Rationale: each distributed round costs a fixed ~0.5 s in
# job scheduling regardless of data size, and a chain-shaped dup graph
# needs O(log diameter) rounds — a tiny graph pays seconds for work the
# driver finishes in milliseconds. 1M (src, dst) longs ≈ 16 MB, the
# same order as a broadcast side; past the limit the O(log d)
# propagate+jump loop is the only shape that survives 100 TB.
LOCAL_EDGE_LIMIT = 1_000_000

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


def _unionfind_labels(rows) -> dict:
    """Min-id union-find with path compression over (src, dst) rows —
    returns {node: min doc_id reachable} for every node incident to an
    edge. Pure driver-side arithmetic, caller bounds ``rows``."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    ids = {v for r in rows for v in (r[0], r[1])}
    return {i: find(i) for i in ids}


def _components_local(sym: DataFrame, active: DataFrame) -> DataFrame:
    """Union-find over ONE bounded collect of the symmetrized edge list
    (caller guarantees ≤ LOCAL_EDGE_LIMIT rows) — min-id roots with path
    compression, shipped back as a (doc_id, component_id) frame via
    Arrow. Exactly the label frame the distributed loop converges to:
    edges touching endpoints outside ``active`` are dropped first,
    because the loop never labels (hence never relays through) a node
    outside the caller's ``nodes`` set, and a plain union-find would."""
    import pandas as pd

    a_src = active.select(F.col("doc_id").alias("src"))
    a_dst = active.select(F.col("doc_id").alias("dst"))
    rows = (
        sym.join(a_src, "src", "left_semi")
        .join(a_dst, "dst", "left_semi")
        .select("src", "dst")
        .collect()
    )  # bounded by caller's count
    labels_map = _unionfind_labels(rows)
    pdf = pd.DataFrame(
        {"doc_id": list(labels_map), "component_id": list(labels_map.values())}
    )
    labels = active.sparkSession.createDataFrame(
        pdf, schema="doc_id long, component_id long"
    )
    # An active node whose every edge touched a stray endpoint has no
    # collected edge left — it stays its own singleton, exactly as the
    # loop path leaves it (labeled but never updated).
    unlabeled = active.join(labels, "doc_id", "left_anti")
    return labels.union(
        unlabeled.select("doc_id", F.col("doc_id").alias("component_id"))
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = MAX_ROUNDS,
    local_limit: int = LOCAL_EDGE_LIMIT,
) -> DataFrame:
    """Min-label propagation over undirected ``edges`` (src, dst).

    ``nodes``: one column ``doc_id`` (isolated nodes allowed).
    Returns (doc_id, component_id) where component_id = min doc_id
    reachable from the node. Graphs at or under ``local_limit``
    symmetrized edges close on the driver in one bounded collect
    (see LOCAL_EDGE_LIMIT); larger graphs run the O(log diameter)
    distributed loop.
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
    # Lazy checkpoint: materializes inside the first job that touches
    # it (the local path's filtered collect, or the loop's round 0 —
    # both run while sym is still persisted), after which consumers
    # survive sym.unpersist() without paying a dedicated eager job.
    active = active.localCheckpoint(eager=False)
    if sym.count() <= local_limit:  # one bounded scalar on the persisted edges
        labels = _components_local(sym, active)
        sym.unpersist()
        isolated = nodes.select("doc_id").join(active, "doc_id", "left_anti")
        return labels.union(
            isolated.select("doc_id", F.col("doc_id").alias("component_id"))
        )
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
        # Lazy-checkpoint the cached labels: the frame is one row per
        # document but its tail (isolated anti-join ∪ loop labels) is
        # re-derived per action otherwise — and the multimodal closure
        # alone consumes it three times (two contraction sides + final
        # expansion). Materializes inside the first consumer's job.
        _COMPONENT_CACHE[key] = connected_components(
            docs.select("doc_id"), near_dup_edges(spark, sf_dir)
        ).localCheckpoint(eager=False)
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
# PageRank centrality within duplicate clusters
# ---------------------------------------------------------------------------
# Min-id canonical selection (dedup_components) keeps an arbitrary
# member of each duplicate cluster. A curation pipeline often wants the
# most REPRESENTATIVE member instead — the document most similar to the
# rest of its cluster — which is exactly eigenvector centrality on the
# near-dup graph. This entry runs damped power iteration (PageRank,
# Brin & Page 1998) over the symmetrized near-dup edges, entirely on an
# integer grid so the DuckDB oracle replays every iteration
# bit-for-bit:
#
#   rank_0(i) = GRID                         (= 10^6)
#   rank_t(i) = (15·GRID)//100
#             + (85 · Σ_{j→i} rank_{t-1}(j)//outdeg(j)) // 100
#
# Truncating division replaces the usual float arithmetic; both engines
# truncate positive int64 identically (Spark `DIV`, DuckDB `//`).
# Deviations from textbook PageRank, on purpose: no dangling-mass
# redistribution (isolated docs just keep the teleport rank — they are
# singleton clusters, their rank never competes) and no global
# normalization (ranks are compared only WITHIN a component, so the
# constant factor is irrelevant). Fixed PR_ITERS iterations rather than
# convergence detection keeps the oracle an unrolled CTE chain.
#
# int64 bound: rank ≤ GRID·(deg_max+1) after any round, so the summed
# numerator 85·Σ contrib ≤ 85·deg_max·GRID·(deg_max+1) — safe for
# deg_max up to ~10^5 duplicate neighbors; a cluster denser than that
# is a pathological mirror-farm the dedup pass collapses by fingerprint
# long before PageRank sees it.
#
# 100 TB shape: each iteration is ONE shuffle join (edges ⋈ ranks on
# src) + ONE groupBy(dst) — the textbook distributed PageRank round.
# State is (node, rank) longs, orders of magnitude below the corpus;
# the edge frame is checkpointed once and re-read per round, and hash
# partitioning on the join key is stable across rounds so AQE reuses
# the exchange layout.
PR_ITERS = 4
PR_GRID = 1_000_000
_PR_TELEPORT = (15 * PR_GRID) // 100


def _sql_pagerank_iters(n: int) -> str:
    """r1..rN CTEs, each one damped integer power-iteration round."""
    ctes = []
    for t in range(1, n + 1):
        prev = f"r{t - 1}"
        ctes.append(
            f"""r{t} AS (
      SELECT n.node,
             CAST({_PR_TELEPORT} + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)
               AS rank
      FROM {prev} n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank // d.outdeg) AS s
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN {prev} r ON r.node = e.src
        GROUP BY 1
      ) s ON s.node = n.node
    )"""
        )
    return ",\n    ".join(ctes)


_SQL_PAGERANK = f"""
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
    fwd AS (
      -- DuckDB 1.0.0 treats plain UNION in non-recursive CTEs inside a
      -- WITH RECURSIVE block as UNION ALL (repro pinned in
      -- test_duckdb_recursive_union_quirk_repro); PageRank is
      -- edge-multiplicity-sensitive, so dedup explicitly. Correct under
      -- either engine semantics.
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM jacc
        UNION SELECT src, dst FROM exact WHERE src < dst
      )
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
    r0 AS (
      SELECT doc_id AS node, CAST({PR_GRID} AS BIGINT) AS rank FROM documents
    ),
    {_sql_pagerank_iters(PR_ITERS)},
    walk(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (
      SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS component_id
      FROM walk GROUP BY node
    )
    SELECT r.node AS doc_id,
           comp.component_id,
           r.rank AS pr_rank,
           ROW_NUMBER() OVER (
             PARTITION BY comp.component_id ORDER BY r.rank DESC, r.node
           ) = 1 AS is_central
    FROM r{PR_ITERS} r JOIN comp ON comp.doc_id = r.node
"""


@query("dedup_pagerank", _SQL_PAGERANK)
def dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-grid PageRank over the near-dup graph: every document
    gets a centrality rank, and the top-ranked member of each duplicate
    component (ties → min doc_id) is flagged ``is_central`` — the
    keep-the-most-representative-duplicate policy, as opposed to
    ``dedup_components``'s keep-the-min-id. Exact across engines by
    construction (see the module-constant comment block); the oracle
    unrolls the same {PR_ITERS} rounds as HUGEINT-free BIGINT CTEs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fwd = near_dup_edges(spark, sf_dir)
    sym = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg), consumed once per iteration — checkpoint so the
    # shingle-mining lineage is paid once, not PR_ITERS times.
    edges = sym.join(deg, "src").localCheckpoint(eager=True)
    rank = docs.select(
        F.col("doc_id").alias("node"),
        F.lit(PR_GRID).cast("long").alias("rank"),
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(rank, edges["src"] == rank["node"])
            .select("dst", F.expr("rank DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        rank = (
            docs.select(F.col("doc_id").alias("node"))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(_PR_TELEPORT)
                    + F.expr("(85 * coalesce(s, 0L)) DIV 100")
                )
                .cast("long")
                .alias("rank"),
            )
        )
    comp = dedup_components(spark, sf_dir).select("doc_id", "component_id")
    ranked = comp.join(rank, comp["doc_id"] == rank["node"]).select(
        "doc_id", "component_id", F.col("rank").alias("pr_rank")
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("pr_rank").desc(), F.col("doc_id")
    )
    return ranked.withColumn("is_central", F.row_number().over(w) == 1)


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
    {_sql_phash_bands()},
    ph AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM pbands a JOIN pbands b ON a.doc_id < b.doc_id
      WHERE {_SQL_PHASH_HAMMING} <= {PHASH_MAX_HAMMING}
    ),
    fwd AS (
      SELECT src, dst FROM jacc
      UNION SELECT src, dst FROM exact WHERE src < dst
      UNION SELECT src, dst FROM emb
      UNION SELECT src, dst FROM ph
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
    fingerprints, trigram-Jaccard text pairs, embedding-cosine pairs
    (doc_id ≡ vec_id in the testdata), and perceptual-hash (dHash)
    image pairs from the real-decoder path. Pairs any single method
    misses still merge when another modality links them — the strongest
    (and most aggressive) dedup the pipeline offers; same component
    loop, bigger edge set.

    The embedding edges come from the scale path
    (``dedup_embedding_candidates``: LSH candidates + exact verify, the
    only formulation that survives 100 TB) rather than the all-pairs
    truth mode — served from the materialized artifact store
    (``artifacts.materialized``, the batch twin of the persisted
    streaming near-dup index): at 100 TB the multimodal merge reads the
    pair tables the embedding-dedup pass already wrote rather than
    re-mining them; a cold store builds them once with the registered
    operator itself, so values are identical either way (the pair
    columns are long/double — parquet round-trips them bit-for-bit).
    The oracle replays the same candidate pipeline, and candidate
    recall vs all-pairs stays gated in tests.

    The component loop runs on the CONTRACTED graph: every embedding
    edge is re-keyed to its endpoints' text-component labels
    (``dedup_components``, already materialized per session) and
    self-loops dropped, so the iterative closure only ever touches one
    node per text component incident to a cross-component embedding
    edge — the text chains are closed before the loop starts, and the
    label frame the O(log d) rounds shuffle is O(embedding-linked
    components), not O(corpus). Contraction preserves both connectivity
    (standard quotient-graph argument) and the min-doc_id label: every
    text label IS the min doc_id of its group, so the min over a merged
    component's labels equals the min over its documents."""
    from .artifacts import materialized
    from .dedup import NEAR_DUP_COSINE, dedup_embedding_candidates
    from .multimodal import dedup_phash

    emb_edges = materialized(
        spark,
        sf_dir,
        "embedding_pairs",
        f"v1:cos{NEAR_DUP_COSINE}",
        lambda: dedup_embedding_candidates(spark, sf_dir),
    ).select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    # Image evidence (round 11): perceptual-hash near-dup pairs from the
    # real-decoder dHash path. Banded + pigeonhole-lossless, so these
    # edges are the exact within-threshold pair set, also read from the
    # artifact store the pair-mining pass already wrote.
    phash_edges = materialized(
        spark,
        sf_dir,
        "phash_pairs",
        f"v1:h{PHASH_MAX_HAMMING}",
        lambda: dedup_phash(spark, sf_dir),
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    emb_edges = emb_edges.unionByName(phash_edges)

    text_comp = dedup_components(spark, sf_dir).select(
        "doc_id", "component_id"
    )
    ca = text_comp.select(
        F.col("doc_id").alias("src"), F.col("component_id").alias("csrc")
    )
    cb = text_comp.select(
        F.col("doc_id").alias("dst"), F.col("component_id").alias("cdst")
    )
    contracted = (
        emb_edges.join(ca, "src")
        .join(cb, "dst")
        .filter(F.col("csrc") != F.col("cdst"))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .dropDuplicates()
        # Materialize once: the edge list feeds the closure's edge AND
        # node sides plus the final expansion — unpinned, each action
        # re-ran the contraction joins (measured 1.2 s per re-execution
        # at sf0.1 across 3+ downstream jobs).
        .localCheckpoint(eager=True)
    )
    # Close the contracted graph. It is one row per cross-component
    # embedding edge — after text-chain contraction, orders of magnitude
    # below the corpus — so under LOCAL_EDGE_LIMIT it closes as a driver
    # union-find over ONE bounded collect of the already-checkpointed
    # edge list (no symmetrize/persist/active scaffolding: every
    # endpoint is a contracted node by construction, so the generic
    # path's isolated-node and stray-endpoint handling is vacuous here;
    # measured 1.15 s → ~0.1 s at sf0.1). Past the limit, the O(log d)
    # distributed loop is the only shape that survives 100 TB.
    if contracted.count() <= LOCAL_EDGE_LIMIT:
        import pandas as pd

        labels_map = _unionfind_labels(contracted.collect())
        clabels = spark.createDataFrame(
            pd.DataFrame(
                {"cid": list(labels_map), "merged": list(labels_map.values())}
            ),
            schema="cid long, merged long",
        )
    else:
        cnodes = (
            contracted.select(F.col("src").alias("doc_id"))
            .union(contracted.select(F.col("dst").alias("doc_id")))
            .dropDuplicates()
        )
        clabels = connected_components(cnodes, contracted).select(
            F.col("doc_id").alias("cid"), F.col("component_id").alias("merged")
        )
    comp = text_comp.join(
        clabels, text_comp["component_id"] == clabels["cid"], "left"
    ).select(
        "doc_id",
        F.coalesce("merged", "component_id").alias("component_id"),
    )
    return comp.withColumn(
        "is_canonical", F.col("component_id") == F.col("doc_id")
    )


# ---------------------------------------------------------------------------
# Soft dedup: per-document sampling weights (staged for round 17)
# ---------------------------------------------------------------------------
# Hard dedup (keep the canonical, drop the rest) throws away signal
# when near-duplicates differ in useful ways; the production
# alternative ("soft dedup") keeps EVERY document but down-weights
# duplicate clusters so each cluster contributes ~one document-mass of
# sampling probability to the training mix. weight = 1/cluster_size,
# emitted in exact integer parts-per-million (1e6 DIV size — Spark DIV
# and DuckDB // truncate identically on positive ints, so the driver
# hash never rides on a float). 100 TB shape: the cluster size is one
# COUNT window over the component labels (a single shuffle on
# component_id, state one long per doc); no join against a
# doc-cardinality side.

_SQL_SOFT_DEDUP = f"""
    WITH comp AS ({_SQL_COMPONENTS})
    SELECT doc_id,
           CAST(component_id AS BIGINT) AS component_id,
           CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
             AS cluster_size,
           CAST(1000000 // COUNT(*) OVER (PARTITION BY component_id)
                AS BIGINT) AS weight_ppm
    FROM comp
"""


@query("curation_soft_dedup_weights", _SQL_SOFT_DEDUP)
def curation_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document with its duplicate-cluster size and the soft-dedup
    sampling weight in exact ppm. Invariants (pytest): singletons weigh
    exactly 1e6; a cluster's total weight is ≤ 1e6 and ≥ 1e6−size+1
    (pure truncation loss); Σ weights / 1e6 ≈ the hard-dedup kept-doc
    count (#components) — soft dedup preserves the same total
    document-mass while keeping every document samplable. Staged round
    16, registered round 17."""
    comp = dedup_components(spark, sf_dir).select("doc_id", "component_id")
    w = Window.partitionBy("component_id")
    size = F.count(F.lit(1)).over(w).cast("long")
    return comp.select(
        "doc_id",
        F.col("component_id").cast("long").alias("component_id"),
        size.alias("cluster_size"),
        F.expr("1000000").cast("long").alias("_grid"),
    ).select(
        "doc_id",
        "component_id",
        "cluster_size",
        F.expr("_grid DIV cluster_size").alias("weight_ppm"),
    )
