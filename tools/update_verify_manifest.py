"""Refresh VERIFY_MANIFEST.json from the latest driver CORRECTNESS file.

Run this as the FIRST action of a round, before touching any code:

    python tools/update_verify_manifest.py

For every entry with a passing row in the newest CORRECTNESS_r*.json it
records {hash: sha256(source, oracle), round}. Because the tool runs
before any code changes, the recorded hash is exactly the code that
driver row verified. ``__spark_entry__._hash_forced`` then flags any
entry whose current hash differs (or which has no record) for a forced
driver re-verification — the mechanical _FORCE_VERIFY the round-5
verdict asked for. Forgetting to run the tool only OVER-forces (stale
manifest → more diffs), never under-verifies.

``--seed-all`` (used once, round 6) seeds records for every entry with
any passing driver row using its last-passing round — entries whose
code changed after that row must be hand-listed in _FORCE_VERIFY for
one round (done in round 6 for the three derived-knob operators).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as e  # noqa: E402
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (  # noqa: E402
    registry,
)


def main() -> None:
    path = REPO / "VERIFY_MANIFEST.json"
    man = e._manifest()
    if "--seed-all" in sys.argv:
        for name, rnd in e._last_verified().items():
            if name in registry.QUERIES:
                man[name] = {"hash": e.entry_hash(name), "round": rnd}
    else:
        files = sorted(
            REPO.glob("CORRECTNESS_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        )
        if not files:
            print("no CORRECTNESS files; nothing to do")
            return
        latest = files[-1]
        rnd = int(re.search(r"r(\d+)", latest.name).group(1))
        rows = json.loads(latest.read_text())
        for name, row in rows.items():
            if name not in registry.QUERIES or not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and not row.get("err")
                and row.get("hash_match") is not False
            ):
                man[name] = {"hash": e.entry_hash(name), "round": rnd}
    man = dict(sorted(man.items()))
    path.write_text(json.dumps(man, indent=1) + "\n")
    print(f"wrote {path.name}: {len(man)} entries")


if __name__ == "__main__":
    main()
