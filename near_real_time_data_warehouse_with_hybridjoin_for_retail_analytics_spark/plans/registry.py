"""Central registry for the graded query surface.

Every capability exposes itself as a named (spark, sf_dir) -> DataFrame
callable, optionally paired with a DuckDB oracle SQL string. The driver
contract (__spark_entry__.py) serves these dicts directly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# FULLGATE-only tier (round-15 verdict item 2: structural rotation
# headroom). Entries named here stay fully registered — benched by
# bench.py, oracle-verified every round by the in-repo full-registry
# gate (tools/check_correctness.py → the committed FULLGATE_r{N}.json)
# — but are EXCLUDED from the driver's 50-slot rotation window, so
# they stop consuming due-staleness slots. Demotion policy: an entry
# qualifies only when (a) its (source, oracle) hash has been stable
# for ≥3 rounds, (b) a DRIVER-rotated sibling exercises the same
# kernel (so the driver window still covers the code path), and (c)
# its own full surface keeps a pytest + FULLGATE row. Promote back by
# removing the name (it re-enters the rotation as never-verified →
# most stale → next window).
FULLGATE_ONLY: set[str] = {
    # pHash-over-PNG: the pHash kernel + banded miner are driver-
    # rotated via dedup_phash (BMP) and dedup_phash_jpeg; the PNG
    # codec itself is driver-rotated via multimodal_decode_stats
    # _formats' png leg. Source/oracle unchanged since r12.
    "dedup_phash_png",
    # byte-length/header projection over the same attach_binary_payload
    # + mapInPandas path that multimodal_features (driver-rotated)
    # exercises with a much stronger oracle. Unchanged since r12.
    "multimodal_metadata",
    # --- round-18 demotions (rotation headroom for the three new
    # registrations — the round-17 verdict's preferred trade over net
    # window growth). Each satisfies the policy above: hash stable
    # since r14, a driver-rotated sibling on the same kernel, own
    # pytest + FULLGATE row kept. ---
    # pHash-over-JPEG: same banded miner as dedup_phash (driver-
    # rotated, BMP path); the JPEG codec itself is driver-rotated via
    # multimodal_decode_stats_formats' jpeg leg. The exact precedent
    # that demoted dedup_phash_png in r15.
    "dedup_phash_jpeg",
    # BPE ENCODE applies the cached merge table text_bpe_train
    # (driver-rotated) produces — the trained-merges kernel and the
    # token shuffle are train's; encode adds chained zero-shuffle
    # folds pinned by its own pytest + FULLGATE row.
    "text_bpe_encode",
    # component STATS is a bounded groupBy over dedup_components'
    # closure output; the closure kernel is driver-rotated via
    # dedup_components, curation_soft_dedup_weights (r17) and the
    # r18-registered sample_soft_dedup.
    "dedup_component_stats",
    # the covariance/Gram-partials kernel is driver-rotated via
    # embedding_pca_topk (and ann_topk_pca), whose _covariance_summary
    # consumes embedding_covariance's output directly — a hash break in
    # the kernel breaks their driver rows.
    "embedding_covariance",
    # --- round-18 optimization-phase demotions (two window slots for
    # the two rotated entries whose callables this round's plan
    # restructurings edited — ann_recall_report and
    # layout_cluster_quality are hash-forced into the next window for
    # re-verification, and the budget must stay ≤ 50). Each satisfies
    # the policy: hash stable since r14, a driver-rotated sibling on
    # the same kernel, own pytest + FULLGATE row kept. ---
    # morton PLANNER: layout_zorder_apply (driver-rotated) executes the
    # SAME morton keying and measures the SAME envelope table from the
    # rewritten files — its oracle embeds the planner's envelope
    # contract plus the physical one-file-per-bucket clause. The exact
    # planner/apply precedent of the compaction pair.
    "layout_zorder_events",
    # --- round-19 optimization-phase demotion (one window slot for
    # ann_index_compact, whose callable this round's probe-pass pin
    # edited — it is hash-forced into the next window for
    # re-verification and the budget must stay ≤ 50). Policy holds:
    # hash stable since r15, a driver-rotated sibling on the same
    # kernel, own pytest + FULLGATE row kept. ---
    # per-tombstone assignment view: ann_index_delete (driver-rotated)
    # aggregates the SAME probe + modulo kernel per cluster, and the
    # streaming tombstone gate's stream/batch-equivalence pytest
    # replays this table row-for-row every round.
    "ann_delete_assignments",
    # compaction PLANNER: layout_compaction_apply (driver-rotated,
    # r18 row) executes the SAME bin-packing plan and its oracle embeds
    # the planner's bin contract plus the physical one-file-per-bin
    # clause — the exact planner/apply precedent that demoted
    # layout_zorder_events in r18. Source unchanged since its creation
    # commit. Second slot for this round's recall-report single-job
    # restructure.
    "layout_compaction_plan",
    # raw PCA projection table: embedding_pca_topk (driver-rotated) and
    # ann_topk_pca consume the same session-cached PCA basis and their
    # oracles embed the full projection chain — a basis or projection
    # break fails their rows first.
    "embedding_pca_project",
}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` means rows-only verification
    (genuinely non-SQL-expressible or float-order-nondeterministic ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
