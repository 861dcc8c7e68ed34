"""Time individual registry entries at sf0.1 with bench.py's warm-up
and staging semantics: ``python tools/time_entry.py name [name...]``.
Prints min/median of N passes (SPARK_GRAFT_TIME_RUNS, default 3).
Iteration harness only — the committed numbers come from bench.py.
"""

from __future__ import annotations

import os
import statistics
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
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_TIME_RUNS", "3"))
    spark = get_spark("time-entry")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name, d):
        t0 = time.time()
        registry.QUERIES[name](spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    # bench.py-equivalent warm-up at the smallest scale
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for n in names:
        run(n, warm_sf)
    results = {}
    for p in range(runs):
        ops.reset_session_caches()
        dedup.cached_shingles(spark, sf_dir).count()
        dedup.cached_shingle_sizes(spark, sf_dir).count()
        dedup.cached_members(spark, sf_dir).count()
        dedup.cached_rep_bands(spark, sf_dir).count()
        for n in names:
            results.setdefault(n, []).append(round(run(n, sf_dir), 3))
    for n, ts in results.items():
        print(
            f"{n}: min={min(ts)} med={statistics.median(ts)} all={ts}",
            flush=True,
        )


if __name__ == "__main__":
    main()
