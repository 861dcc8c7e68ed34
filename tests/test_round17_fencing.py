"""Round-17 fencing hardening (the round-16 ADVICE findings):

- a contender paused between winning the claim CAS and committing the
  canonical token cannot resurrect an orphan-reclaimed epoch (the
  pre-commit supersession re-read);
- graceful release: a cleanly finished owner's sink is re-acquirable
  immediately — even by a NEW process — instead of after ttl_s;
- a live owner running under a SIBLING SparkSession in the same
  process is not judged dead by a contender holding another session;
- a damaged snapshot sidecar degrades to folded_through=None instead
  of crashing snapshots()/the asof error path.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    fencing,
    zorder_stream,
)

SF = "/root/testdata/sf0.001"


def _feed(spark, tmp_path, n_files=5) -> str:
    feed = str(tmp_path / "feed")
    ev = load_table(spark, SF, "events")
    ev.withColumn(
        "part", F.pmod(F.col("event_id"), F.lit(n_files))
    ).repartition(n_files, "part").drop("part").write.mode(
        "overwrite"
    ).parquet(feed)
    return feed


def test_paused_contender_cannot_resurrect_a_reclaimed_epoch(
    spark, tmp_path, monkeypatch
):
    """The round-16 medium finding: contender A wins the claim CAS for
    epoch e+1, pauses past the lease, contender B orphan-reclaims and
    commits e+1 — A's resumed commit must raise, not overwrite B's
    canonical token (two live writers on one sink)."""
    out = str(tmp_path / "sink")
    fencing.acquire_writer(spark, out)
    # owner's lease lapses so contenders reach the CAS
    with open(fencing._heartbeat_path(out, 0), "w") as fh:
        fh.write(repr(time.time() - 1e6))

    real_touch = fencing._touch_heartbeat
    state = {"injected": False}

    def touch_then_inject(out_dir, epoch):
        real_touch(out_dir, epoch)
        if epoch == 1 and not state["injected"]:
            state["injected"] = True
            # contender B: orphan-reclaimed A's claim and committed
            # epoch 1 while A was paused between CAS and commit
            fencing._write_canonical(
                out_dir,
                {"owner": "reclaimer-b", "epoch": 1, "pid": os.getpid()},
            )

    monkeypatch.setattr(fencing, "_touch_heartbeat", touch_then_inject)
    with pytest.raises(
        fencing.WriterFencedError, match="superseded before commit"
    ):
        fencing.acquire_writer(spark, out, ttl_s=10.0)
    # B's token survived — A never overwrote it
    cur = fencing._read_token(out)
    assert cur["owner"] == "reclaimer-b" and cur["epoch"] == 1


def test_release_allows_immediate_new_process_restart(spark, tmp_path):
    """The graceful-termination finding: a cleanly finished owner left
    a live heartbeat, so a legitimate sequential restart from a NEW
    process was falsely fenced for up to ttl_s. After release(), the
    takeover is immediate; without it, the contender is fenced."""
    out = str(tmp_path / "sink")
    tok = fencing.acquire_writer(spark, out)
    # simulate the owner having been a different, now-exited process:
    # rewrite the canonical pid so the contender takes the
    # cross-process (heartbeat-lease) path, exactly the redeploy case
    cur = fencing._read_token(out)
    fencing._write_canonical(out, {**cur, "pid": 99_999_999})
    with pytest.raises(fencing.WriterFencedError, match="owned by writer"):
        fencing.acquire_writer(spark, out)  # un-released: fenced
    tok.release()
    tok2 = fencing.acquire_writer(spark, out)  # released: immediate
    assert tok2.epoch == tok.epoch + 1
    tok2.verify_and_renew()
    # a LATE release by the superseded writer is a no-op: heartbeats
    # are keyed per-epoch and the canonical owner is no longer ours
    tok.release()
    tok2.verify_and_renew()
    assert os.path.exists(fencing._heartbeat_path(out, tok2.epoch))


def test_release_is_wired_through_the_gate(spark, tmp_path):
    """End-to-end: the z-order gate exposes the token on the returned
    query; after a clean finish + release, the sink's heartbeat is
    expired while the canonical token survives for epoch continuity."""
    feed = _feed(spark, tmp_path, n_files=2)
    out = str(tmp_path / "zs")
    q = zorder_stream.run_zorder_stream(
        spark, feed, out,
        max_files_per_trigger=1,
        checkpoint=str(tmp_path / "ck0"),
        rewrite_staged_rows=10_000,
    )
    q.awaitTermination(120)
    tok = q.writer_token
    q.writer_token.release()
    assert not os.path.exists(fencing._heartbeat_path(out, tok.epoch))
    assert fencing._read_token(out)["epoch"] == tok.epoch
    # re-attach resumes at the next epoch without any TTL wait
    q2 = zorder_stream.run_zorder_stream(
        spark, feed, out,
        max_files_per_trigger=1,
        checkpoint=str(tmp_path / "ck0"),
        rewrite_staged_rows=10_000,
    )
    q2.awaitTermination(120)
    assert q2.writer_token.epoch == tok.epoch + 1
    q2.writer_token.release()


def test_live_owner_under_sibling_session_is_not_judged_dead(
    spark, tmp_path
):
    """The same-pid liveness finding: spark.streams is per-session, so
    a contender holding a SIBLING session must not judge a live owner
    dead just because the run id is absent from its own active set —
    the run id resolves against the session that bound it."""
    feed = _feed(spark, tmp_path, n_files=8)  # 8 triggers: stays live
    out = str(tmp_path / "zs")
    owner_session = spark.newSession()
    q = zorder_stream.run_zorder_stream(
        owner_session, feed, out,
        max_files_per_trigger=1,
        checkpoint=str(tmp_path / "ck0"),
        rewrite_staged_rows=10_000,
    )
    try:
        assert q.isActive
        # the owner's run id is NOT active in the contender's session
        assert str(q.runId) not in {
            str(x.runId) for x in spark.streams.active
        }
        with pytest.raises(
            fencing.WriterFencedError, match="owned by writer"
        ):
            fencing.acquire_writer(spark, out)
    finally:
        q.awaitTermination(120)
    # once terminated, the binding session's answer is authoritative
    # in the other direction too: immediate takeover, no TTL wait
    tok = fencing.acquire_writer(spark, out)
    assert tok.epoch == q.writer_token.epoch + 1


def test_damaged_snapshot_sidecar_degrades_not_crashes(spark, tmp_path):
    """Round-16 advice: snapshots() caught only FileNotFoundError, so a
    truncated _snapshot.json raised a raw JSONDecodeError — crashing
    clustered_table_asof's not-servable error path, which lists the
    servable generations through snapshots()."""
    feed = _feed(spark, tmp_path, n_files=2)
    out = str(tmp_path / "zs")
    q = zorder_stream.run_zorder_stream(
        spark, feed, out,
        max_files_per_trigger=1,
        checkpoint=str(tmp_path / "ck0"),
        rewrite_staged_rows=30,
    )
    q.awaitTermination(120)
    zorder_stream.finalize_zorder(spark, out)
    gen, folded = zorder_stream._gen_state(out)
    assert gen >= 0
    # damage the current generation's sidecar (truncated write)
    side = os.path.join(
        zorder_stream._base_dir(out, gen), "_snapshot.json"
    )
    with open(side, "w") as fh:
        fh.write('{"gen": 1, "folded_th')
    snaps = zorder_stream.snapshots(out)
    assert snaps, "damaged sidecar must not empty the history"
    cur = [s for s in snaps if s["current"]][0]
    # current generation: the committed marker attests folded_through
    assert cur["gen"] == gen and cur["folded_through"] == folded
    # and the asof not-servable error path (which calls snapshots())
    # still raises its NAMED error, not a JSONDecodeError
    with pytest.raises(RuntimeError, match="not servable"):
        zorder_stream.clustered_table_asof(spark, out, gen + 7)
    q.writer_token.release()
