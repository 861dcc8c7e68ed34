"""Materialized derived-relation store for downstream consumers.

A data-card report or audit over a 100 TB corpus does not re-run the
dedup pipelines it summarizes — it reads the pair/fingerprint tables
those pipelines already materialized (the same contract as the
persisted near-dup index in ``streaming/dedup_stream.py``). This module
is that contract for batch consumers: ``materialized`` returns the
parquet copy of a derived relation when one matching the corpus
fingerprint exists, and otherwise builds it once (staging dir + atomic
rename, safe under concurrent builders) and reads it back.

Reading back the parquet copy is value-exact: every artifact column is
int/long/double/string, all of which round-trip parquet bit-for-bit,
so consumers produce identical hashes whether they hit or miss.

``SPARK_GRAFT_NO_ARTIFACTS=1`` disables the store (consumers compute
inline — the mode the oracle equivalence tests exercise anyway, since
a cold store computes the same plan).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_ARTIFACT_ROOT = "/tmp/sparkgraft_dedup_artifacts"


def _corpus_fingerprint(sf_dir: str) -> str | None:
    try:
        st = os.stat(f"{sf_dir}/documents.parquet")
    except OSError:
        return None
    return f"{st.st_size}:{int(st.st_mtime)}"


def _marker_value(marker: str) -> str | None:
    try:
        with open(marker) as fh:
            return fh.read().strip()
    except OSError:
        return None


def gc_stale_app_dirs(root: str, keep: str, max_age_s: int = 6 * 3600) -> None:
    """Best-effort garbage collection of per-application scratch dirs
    under ``root``: every sibling of ``keep`` not modified within
    ``max_age_s`` is removed. Per-app scoping (the fix for concurrent
    drivers racing a shared overwrite) means each session writes a
    fresh dir that nothing else will ever reuse — without this sweep,
    /tmp accrues one full rewrite per session forever. The age guard
    keeps live sessions safe (a run writes its dir minutes before any
    other session could sweep it); removal is ignore_errors because a
    lost race here only leaks a dir until the next sweep.

    Liveness beacon (round-14 advice): steady-state rewrites only
    touch the NESTED {sf_tag}/events dirs — overwrite recreates the
    leaf, so the top-level app dir's mtime goes stale while the
    session is very much alive, and a >max_age_s session could be
    swept by a concurrent driver between its write and read-back. So
    every call first touches the session's own dir: callers invoke
    this immediately before using their dest, which renews the lease
    exactly when it matters."""
    import time

    own = os.path.join(root, keep)
    if os.path.isdir(own):
        try:
            os.utime(own)
        except OSError:
            pass
    try:
        names = os.listdir(root)
    except OSError:
        return
    now = time.time()
    for n in names:
        p = os.path.join(root, n)
        if n == keep or not os.path.isdir(p):
            continue
        try:
            age = now - os.path.getmtime(p)
        except OSError:
            continue
        if age > max_age_s:
            shutil.rmtree(p, ignore_errors=True)


def renew_lease(dest: str) -> None:
    """Renew the GC lease on the app-scoped dir that owns ``dest``
    (layout {root}/{app_id}/{sf_tag}/{leaf} — the app dir is two
    levels up). ``app_scoped_dest`` renews at CALL time only, so a
    single rewrite + read-back that outlives max_age_s could still be
    swept mid-operation by a concurrent driver (round-14 advice);
    write-side entries call this after the write completes, bounding
    the unrenewed span to one phase instead of the whole operation."""
    app_dir = os.path.dirname(os.path.dirname(dest))
    try:
        os.utime(app_dir)
    except OSError:
        pass


def app_scoped_dest(spark, sf_dir: str, root: str, leaf: str) -> str:
    """Per-application rewrite destination {root}/{app_id}/{sf_tag}/
    {leaf} — the shared contract of every write-side entry
    (layout_compaction_apply, ann_index_compact, the staged z-order
    apply): two concurrent drivers on the same scale factor must never
    race an overwrite and read back a mixed inventory, the path is
    stable within a session so repeated calls overwrite in place
    (idempotence), stale sibling app dirs are swept, and the call
    renews the live session's own GC lease (see gc_stale_app_dirs)."""
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1] or "sf"
    app_id = spark.sparkContext.applicationId
    gc_stale_app_dirs(root, app_id)
    return f"{root}/{app_id}/{sf_tag}/{leaf}"


def materialized(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    version: str,
    build,
) -> DataFrame:
    """Return the materialized relation ``name`` for the corpus at
    ``sf_dir``, building it with ``build()`` on a fingerprint miss.
    ``version`` names the pipeline revision — bump it when the
    producing operator's semantics change, or stale artifacts would
    serve old answers."""
    if os.environ.get("SPARK_GRAFT_NO_ARTIFACTS"):
        return build()
    corpus = _corpus_fingerprint(sf_dir)
    if corpus is None:
        return build()
    fingerprint = f"{corpus}:{version}"
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    dest = os.path.join(_ARTIFACT_ROOT, sf_tag, name)
    marker = os.path.join(dest, "_ARTIFACT_OK")
    if _marker_value(marker) == fingerprint:
        return spark.read.parquet(dest)

    df = build()
    staging = f"{dest}__staging_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, "_ARTIFACT_OK"), "w") as fh:
        fh.write(fingerprint)
    if _marker_value(marker) == fingerprint:
        # A same-fingerprint builder finished while we were building:
        # its dest is current and may already have readers mid-scan —
        # keep it and discard our staging copy (value-identical).
        shutil.rmtree(staging, ignore_errors=True)
        return spark.read.parquet(dest)
    if os.path.isdir(dest):
        # stale fingerprint (corpus or pipeline changed) — replace
        shutil.rmtree(dest, ignore_errors=True)
    try:
        os.rename(staging, dest)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        # Rename fails when a racer won OR when the stale dest could
        # not be removed (rmtree swallows errors). Serve dest only if
        # its marker proves it current for THIS fingerprint; otherwise
        # fall back to the in-memory plan — never a stale artifact.
        if _marker_value(marker) == fingerprint:
            return spark.read.parquet(dest)
        return df
    return spark.read.parquet(dest)
