"""Bounded-state accumulation for the foreachBatch ingest gates.

Round-11 advice found the CMS gate's state grew with gate LIFETIME:
one batch-tagged partial appended per micro-batch, and the whole
directory re-read and re-merged every batch, forever. The same pattern
lived in the HLL, KMV, and drift gates. This module is the shared fix:
partials fold into a watermarked compacted base every COMPACT_EVERY
batches, so on-disk state and per-batch merge cost are bounded at
(one merged state table + ≤ COMPACT_EVERY partials) no matter how long
the gate has run.

Replay safety across the compaction boundary, once for all gates: a
crash-retried batch at or below the base watermark is already folded
into the compacted state — its batch-id tag is gone, so the
(batch_id, …) dedup could no longer absorb it — so its PARTIAL APPEND
is skipped, but ``accumulate`` still returns the current merged state:
the caller must still (re)write its report, because the crash may have
hit between the base fold and the report write, leaving the published
report one batch behind the state (returning None there would freeze
the stale report forever on an availableNow feed whose last batch was
the folded one). Above the watermark, a retry re-appends identical
rows and the dedup collapses them exactly as before. The append skip
is what makes the scheme safe even for NON-replay-idempotent merges
(+ in CMS/drift); for idempotent merges (MAX in HLL, k-min union in
KMV) it is merely redundant. A crash between the base overwrite and
the partials clear only leaves ≤-watermark partials behind, which the
> wmark filter excludes until the next compaction's overwrite removes
them.

``merge_state`` must be associative with output schema == input schema
(minus the batch tag): groupBy-SUM (CMS cells, drift sums),
groupBy-MAX (HLL registers), and per-group k-min union (KMV) all
qualify — the same merge laws that make these sketches
shard-mergeable at 100 TB make them compactable here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACT_EVERY = 8  # fold partials into the base every N live batches
_WMARK_SENTINEL = -1


def _read_base(
    spark: SparkSession, base_dir: str
) -> tuple[DataFrame | None, int]:
    """(compacted state without the wmark column, watermark), or
    (None, -1) before the first compaction. Only the
    missing/empty-path AnalysisException means "no base yet" — a
    transient read failure (corrupt footer, FS hiccup) must PROPAGATE,
    or a non-idempotent gate would silently rebuild its report from
    post-compaction partials alone."""
    from pyspark.errors import AnalysisException

    try:
        base = spark.read.parquet(base_dir)
    except AnalysisException:
        return None, _WMARK_SENTINEL
    wmark = base.agg(F.max("wmark")).collect()[0][0]
    return base.drop("wmark"), int(wmark)


def accumulate(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    partial: DataFrame,
    dedup_cols: list[str],
    merge_state: Callable[[DataFrame], DataFrame],
    compact_every: int = COMPACT_EVERY,
) -> DataFrame:
    """Fold one micro-batch's ``partial`` into the bounded state under
    ``state_dir`` and return the CURRENT merged state (the caller
    derives/writes its report from it — ALWAYS, including for a replay
    of an already-compacted batch, whose partial append is skipped but
    whose report write may be the one the crash interrupted).
    ``dedup_cols``: the partial's row identity (batch_id is added
    automatically)."""
    partials_dir = f"{state_dir}/partials"
    base_dir = f"{state_dir}/base"
    base, wmark = _read_base(spark, base_dir)
    if int(batch_id) > wmark:
        partial.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        ).write.mode("append").parquet(partials_dir)
    from pyspark.errors import AnalysisException

    tagged_schema = partial.withColumn(
        "batch_id", F.lit(0).cast("long")
    ).schema
    try:
        raw = spark.read.parquet(partials_dir)
    except AnalysisException:
        # only reachable on a replayed already-compacted batch right
        # after a compaction cleared the partials to an empty dir
        raw = spark.createDataFrame([], tagged_schema)
    live = raw.filter(F.col("batch_id") > wmark).dropDuplicates(
        ["batch_id", *dedup_cols]
    )
    cells = live.drop("batch_id")
    if base is not None:
        cells = cells.unionByName(base)
    merged = merge_state(cells)
    n_live = live.select("batch_id").distinct().count()
    if n_live >= compact_every:
        new_wmark = live.agg(F.max("batch_id")).collect()[0][0]
        merged.localCheckpoint(eager=True).withColumn(
            "wmark", F.lit(int(new_wmark)).cast("long")
        ).write.mode("overwrite").parquet(base_dir)
        spark.createDataFrame([], live.schema).write.mode(
            "overwrite"
        ).parquet(partials_dir)
        merged = spark.read.parquet(base_dir).drop("wmark")
    return merged
