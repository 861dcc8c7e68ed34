"""Physical-plan audit over every registered query.

Prints, per query, the join strategies, scan pushdown status, python
eval operators, and exchange counts from the formatted plan — the
things that decide whether a plan survives a 100× scale-up. Red flags:

  CartesianProduct      quadratic shuffle (only acceptable where the
                        operator is genuinely all-pairs AND blocked)
  BatchEvalPython       row-at-a-time Python UDF in the hot path
                        (ArrowEvalPython / FlatMapGroupsInPandas are the
                        sanctioned vectorized forms)
  scan w/o PushedFilters a filter that should reach parquet but didn't
  SortMergeJoin on a dim  a join that should have broadcast

Usage: python tools/explain_audit.py [sf_dir] [name_substring]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators  # noqa: F401
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (
    registry,
    testdata_queries,  # noqa: F401
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.session import (
    get_spark,
)

INTERESTING = re.compile(
    r"CartesianProduct|BroadcastNestedLoopJoin|BatchEvalPython|ArrowEvalPython"
    r"|FlatMapGroupsInPandas|SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
    r"|Exchange|Scan parquet|PushedFilters"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in registry.QUERIES.items():
        if only and only not in name:
            continue
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(jmode)
        except Exception as exc:  # noqa: BLE001
            print(f"== {name}: EXPLAIN FAILED: {exc}")
            continue
        ops: dict[str, int] = {}
        pushed_empty = 0
        for line in plan.splitlines():
            m = INTERESTING.search(line)
            if not m:
                continue
            tok = m.group(0)
            if tok == "PushedFilters":
                if re.search(r"PushedFilters: \[\]", line):
                    pushed_empty += 1
                continue
            ops[tok] = ops.get(tok, 0) + 1
        flags = []
        if ops.get("CartesianProduct"):
            flags.append("CARTESIAN")
        if ops.get("BatchEvalPython"):
            flags.append("ROW_PYTHON_UDF")
        summary = ", ".join(f"{k}×{v}" for k, v in sorted(ops.items()))
        flag_s = (" <<< " + "/".join(flags)) if flags else ""
        print(f"== {name}: {summary}; pushedFilters-empty-scans={pushed_empty}{flag_s}")


if __name__ == "__main__":
    main()
