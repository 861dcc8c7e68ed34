"""Round-18 fencing hardening (the round-17 ADVICE finding):

A losing contender must leave NO lease side effects. The old acquire
order touched ``_writer_heartbeat.{new_epoch}`` BEFORE the supersession
re-read, so a contender whose claim had been orphan-reclaimed renewed
the RECLAIMER's lease on its way to raising WriterFencedError — if that
reclaimer had since died, the spurious renewal delayed the next
legitimate takeover by up to ttl_s. Now the re-read happens first and
the losing path removes its claim file and writes nothing.
"""

from __future__ import annotations

import os
import time

import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
    fencing,
)


def test_losing_contender_leaves_no_lease_side_effects(
    spark, tmp_path, monkeypatch
):
    """Contender A wins the claim CAS for epoch 1, pauses, and the
    reclaimer B commits epoch 1 meanwhile. A's resumed acquire must
    raise WITHOUT renewing B's epoch-1 heartbeat (B may be dead — the
    renewal would delay B's successor by up to ttl_s) and must remove
    its own claim-file debris."""
    out = str(tmp_path / "sink")
    fencing.acquire_writer(spark, out)
    # epoch 0's lease lapses so contenders reach the CAS
    with open(fencing._heartbeat_path(out, 0), "w") as fh:
        fh.write(repr(time.time() - 1e6))
    # B's epoch-1 heartbeat with a SENTINEL value: if A's losing path
    # ever touches it, the content changes and the assert below fails
    sentinel = repr(time.time() - 12345.0)
    with open(fencing._heartbeat_path(out, 1), "w") as fh:
        fh.write(sentinel)

    real_read = fencing._read_token
    state = {"calls": 0}

    def read_and_inject(out_dir):
        # call 1: acquire's initial read (epoch 0). Call 2: the first
        # supersession re-read — inject B's canonical commit at exactly
        # that moment, simulating B having orphan-reclaimed A's claim
        # while A was paused between the CAS and this read.
        state["calls"] += 1
        if state["calls"] == 2:
            fencing._write_canonical(
                out_dir,
                {"owner": "reclaimer-b", "epoch": 1, "pid": os.getpid()},
            )
        return real_read(out_dir)

    monkeypatch.setattr(fencing, "_read_token", read_and_inject)
    with pytest.raises(
        fencing.WriterFencedError, match="superseded before commit"
    ):
        fencing.acquire_writer(spark, out, ttl_s=10.0)
    monkeypatch.undo()
    # B's canonical token survived
    cur = fencing._read_token(out)
    assert cur["owner"] == "reclaimer-b" and cur["epoch"] == 1
    # A never renewed B's lease: the heartbeat content is the sentinel
    with open(fencing._heartbeat_path(out, 1)) as fh:
        assert fh.read() == sentinel
    # and A's claim-file debris is gone
    assert not os.path.exists(os.path.join(out, "_writer_claim.1"))
