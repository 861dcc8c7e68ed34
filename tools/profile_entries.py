"""Per-entry profiling pass: wall time + Spark job/stage/task counts.

One timed pass per entry (after bench.py's warm-up + staging semantics)
with a per-entry job group, so the status tracker can attribute every
job to the entry that submitted it. Output: /tmp/profile_entries.json
(name -> {sec, jobs, stages, tasks}) plus a sorted table on stdout.

Usage: python tools/profile_entries.py [name_substring ...]
Iteration harness only — committed numbers still come from bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators as ops  # noqa: E402,F401
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (  # noqa: E402
    dedup,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (  # noqa: E402
    registry,
    testdata_queries,  # noqa: F401
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    filters = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    names = [
        n
        for n in registry.QUERIES
        if not filters or any(f in n for f in filters)
    ]

    def run(name, d):
        registry.QUERIES[name](spark, d).write.format("noop").mode(
            "overwrite"
        ).save()

    # bench.py-equivalent warm-up
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    run(names[0], sf_dir)
    if os.path.isdir(warm_sf):
        for n in names:
            try:
                run(n, warm_sf)
            except Exception as exc:  # keep profiling the rest
                print(f"WARM FAIL {n}: {exc}", file=sys.stderr)
    ops.reset_session_caches()
    dedup.cached_shingles(spark, sf_dir).count()
    dedup.cached_shingle_sizes(spark, sf_dir).count()
    dedup.cached_members(spark, sf_dir).count()
    dedup.cached_rep_bands(spark, sf_dir).count()

    tracker = sc.statusTracker()
    out = {}
    for name in names:
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        try:
            run(name, sf_dir)
            sec = time.time() - t0
        except Exception as exc:
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    stages += 1
                    tasks += si.numTasks
        out[name] = {
            "sec": round(sec, 3),
            "jobs": len(job_ids),
            "stages": stages,
            "tasks": tasks,
        }
        print(
            f"{sec:8.3f}s  jobs={len(job_ids):3d} stages={stages:4d} "
            f"tasks={tasks:5d}  {name}",
            flush=True,
        )

    with open("/tmp/profile_entries.json", "w") as fh:
        json.dump(out, fh, indent=1)
    ranked = sorted(out.items(), key=lambda kv: -kv[1]["sec"])
    print("\n=== by time ===")
    for n, r in ranked[:40]:
        print(
            f"{r['sec']:8.3f}s  jobs={r['jobs']:3d} stages={r['stages']:4d} "
            f"tasks={r['tasks']:5d}  {n}"
        )


if __name__ == "__main__":
    main()
