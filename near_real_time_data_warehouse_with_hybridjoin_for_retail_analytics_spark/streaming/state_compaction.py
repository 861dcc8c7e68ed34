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

The base itself commits atomically: each compaction writes the folded
state to a fresh generation dir (``base_g{n}``) and then commits the
generation number in one ``os.replace`` of ``base_meta.json`` — the
same marker pattern ``compaction_stream`` uses for its staging sweeps.
A crash mid-write leaves the marker pointing at the old, untouched
generation; the in-place ``mode("overwrite")`` it replaces had a
window where the old base was already deleted while the new one had
not committed, and ``_read_base`` would have read that wreckage as
"no base yet" (wmark=-1) — silently rebuilding state from only the
≤ COMPACT_EVERY live partials, a permanent undercount for the
non-idempotent merges (CMS counts, drift sums). A committed marker
whose generation dir is missing or unreadable is therefore a HARD
error, never "no base yet".
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACT_EVERY = 8  # fold partials into the base every N live batches
_WMARK_SENTINEL = -1


def _base_generation(state_dir: str) -> int | None:
    """Committed base generation, or None before the first compaction.
    Only a missing marker means "no base yet"; a present-but-corrupt
    marker propagates (truncated json can only come from a non-atomic
    writer — ours is os.replace'd — so it signals real damage). A
    marker-less LEGACY ``{state_dir}/base`` dir (pre-generation
    layout) is also a hard error: treating it as "no base yet" would
    silently discard its folded history — exactly the undercount this
    module exists to prevent."""
    try:
        with open(f"{state_dir}/base_meta.json") as fh:
            return int(json.load(fh)["generation"])
    except FileNotFoundError:
        if os.path.isdir(f"{state_dir}/base"):
            raise RuntimeError(
                f"{state_dir}/base is a pre-generation-layout compacted "
                "base with no base_meta.json marker; refusing to ignore "
                "folded history — migrate it (rename to base_g0 and "
                'write {"generation": 0}) or clear the state dir'
            ) from None
        return None


def _commit_base_generation(state_dir: str, generation: int) -> None:
    tmp = f"{state_dir}/base_meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump({"generation": generation}, fh)
    os.replace(tmp, f"{state_dir}/base_meta.json")  # atomic commit


def _read_base(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame | None, int, int | None]:
    """(compacted state without the wmark column, watermark,
    generation), or (None, -1, None) before the first compaction. A
    committed generation whose dir fails to read is a HARD error — a
    non-idempotent gate must never silently rebuild its report from
    post-compaction partials alone."""
    from pyspark.errors import AnalysisException

    gen = _base_generation(state_dir)
    if gen is None:
        return None, _WMARK_SENTINEL, None
    try:
        base = spark.read.parquet(f"{state_dir}/base_g{gen}")
    except AnalysisException as exc:
        raise RuntimeError(
            f"state_compaction base marker commits generation {gen} but "
            f"{state_dir}/base_g{gen} is missing/unreadable — compacted "
            "history would be lost; refusing to rebuild from partials"
        ) from exc
    wmark = base.agg(F.max("wmark")).collect()[0][0]
    return base.drop("wmark"), int(wmark), gen


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
    base, wmark, gen = _read_base(spark, state_dir)
    if int(batch_id) > wmark:
        partial.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        ).write.mode("append").parquet(partials_dir)
    from .parquet_state import read_state_or_none

    tagged_schema = partial.withColumn(
        "batch_id", F.lit(0).cast("long")
    ).schema
    # None (missing / debris-only / compaction-cleared-to-empty dir)
    # means genuinely no live partials; a read failure over COMMITTED
    # partials propagates — treating it as empty would silently drop
    # live batches above the watermark from the report.
    raw = read_state_or_none(spark, partials_dir)
    if raw is None:
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
        new_gen = 0 if gen is None else gen + 1
        new_base_dir = f"{state_dir}/base_g{new_gen}"
        # write to a FRESH generation dir, then commit the marker in
        # one os.replace — the old base stays intact until the new one
        # is fully on disk, so no crash window loses folded history.
        merged.localCheckpoint(eager=True).withColumn(
            "wmark", F.lit(int(new_wmark)).cast("long")
        ).write.mode("overwrite").parquet(new_base_dir)
        _commit_base_generation(state_dir, new_gen)
        spark.createDataFrame([], live.schema).write.mode(
            "overwrite"
        ).parquet(partials_dir)
        if gen is not None:
            import re
            import shutil

            # best-effort: every generation below the committed one is
            # garbage once the marker has moved on. Sweeping ALL lower
            # indices (not just the immediately superseded gen) also
            # reclaims dirs a previous crash leaked between the
            # partials clear and its own rmtree — otherwise those
            # orphans were never revisited (round-14 advice).
            for name in os.listdir(state_dir):
                m = re.fullmatch(r"base_g(\d+)", name)
                if m and int(m.group(1)) < new_gen:
                    shutil.rmtree(
                        os.path.join(state_dir, name), ignore_errors=True
                    )
        merged = spark.read.parquet(new_base_dir).drop("wmark")
    return merged
