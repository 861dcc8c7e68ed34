"""Same-session apples-to-apples baseline (round-8 verdict item #1).

Prior rounds graded the testdata-mapped q01–q20 against a warehouse
baseline measured in a DIFFERENT Spark session, sometimes days earlier,
on a host whose committed same-code spreads reach 5.5 s — so a 0.4 s
absolute gap on a 0.35 s query could flip the 2× grade either way.
This tool removes the session variable: in ONE Spark session it times,
interleaved per pass so noise bursts hit every variant alike,

  A. the 20 warehouse-faithful reference twins
     (``plans/warehouse_queries.py`` over the synthesized star schema —
     the reference's own query shapes, /root/reference/queries.sql),
  B. the 20 testdata-mapped registry queries (q01..q20), and
  C. every beyond-reference registry entry, aggregated per family,

min-of-N (default 3) per entry, and emits one JSON artifact plus a
ready-to-paste markdown ratio table for the BASELINE.md addendum.

Usage:
    python tools/bench_baseline.py [--sf-dir /root/testdata/sf0.1] \
        [--runs 3] [--out BASELINE_SAMESESSION.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators as ops  # noqa: E402
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.etl.date_dim import (  # noqa: E402
    build_date_dim,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.etl.dimensions import (  # noqa: E402
    build_customer_dim,
    split_product_master,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (  # noqa: E402
    dedup,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (  # noqa: E402
    registry,
    testdata_queries,  # noqa: F401  (registers q01..q20)
    warehouse_queries as wq,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.session import (  # noqa: E402
    get_spark,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (  # noqa: E402
    hybrid_join as hj,
)

from bench_warehouse import synthesize_master_csvs  # noqa: E402

# The two reference-ETL entries are part of the reference surface, not
# the beyond-reference families (verdict convention: 92 − 20 − 2 = 70).
_REFERENCE_ETL = {"etl_enrich_events", "etl_events_by_type"}


def _family(name: str) -> str:
    if name == "corpus_select":
        return "sample"
    return name.split("_", 1)[0]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_warehouse(spark, sf_dir: str, work: str) -> int:
    """Synthesize the reference master CSVs from the testdata, run the
    ETL, register the star views. Returns the bench year (the dataset's
    first year — the reference pins its literals to the first year of
    ITS dataset the same way, queries.sql:9,143,162)."""
    synthesize_master_csvs(spark, sf_dir, work)
    customer = build_customer_dim(spark, os.path.join(work, "customer.csv"))
    product, store, supplier = split_product_master(
        spark, os.path.join(work, "product.csv")
    )
    raw = spark.read.option("header", True).csv(os.path.join(work, "tx.csv"))
    dates = raw.select(
        F.min(F.to_date("date")), F.max(F.to_date("date"))
    ).first()
    date_dim = build_date_dim(spark, dates[0], dates[1])
    fact, _n, cleanup = hj.assign_sales_ids(
        hj.enrich(hj.normalize_stream(raw), customer, product), offset=0
    )
    fact_path = os.path.join(work, "sales_parquet")
    fact.write.mode("overwrite").parquet(fact_path)
    cleanup()
    wq.register_warehouse(
        spark,
        {
            "customer": customer,
            "product": product,
            "store": store,
            "supplier": supplier,
            "date_dim": date_dim,
            "sales": spark.read.parquet(fact_path),
        },
    )
    return dates[0].year


def _stage_shared(spark, sf_dir: str) -> None:
    dedup.cached_shingles(spark, sf_dir).count()
    dedup.cached_shingle_sizes(spark, sf_dir).count()
    dedup.cached_members(spark, sf_dir).count()
    dedup.cached_rep_bands(spark, sf_dir).count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BASELINE_SAMESESSION.json")
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir

    spark = get_spark("bench-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="baseline_bench_")
    try:
        bench_year = build_warehouse(spark, sf_dir, work)

        td_names = sorted(
            n for n in registry.QUERIES if n[0] == "q" and n[1].isdigit()
        )
        wh_names = sorted(
            wq.WAREHOUSE_QUERIES, key=lambda n: int(n[1:].split("_")[0])
        )
        beyond = [
            n
            for n in registry.QUERIES
            if n not in td_names and n not in _REFERENCE_ETL
        ]
        ref_etl = sorted(_REFERENCE_ETL & set(registry.QUERIES))

        # Warm-up: same scope as bench.py — codegen compiles, parquet
        # footers, Arrow worker spin-up, plus one warehouse query.
        _noop(registry.QUERIES[td_names[0]](spark, sf_dir))
        _noop(registry.QUERIES["ann_topk_lsh"](spark, sf_dir))
        _noop(wq.run_query(spark, wh_names[0], year=bench_year))
        warm_sf = os.path.join(
            os.path.dirname(sf_dir.rstrip("/")), "sf0.001"
        )
        if os.path.isdir(warm_sf):
            for warm_name in (
                "dedup_minhash_lsh",
                "dedup_simhash",
                "dedup_components",
                "dedup_incremental",
            ):
                _noop(registry.QUERIES[warm_name](spark, warm_sf))
        _stage_shared(spark, sf_dir)

        wh: dict[str, float] = {}
        td: dict[str, float] = {}
        by: dict[str, float] = {}
        for p in range(max(1, args.runs)):
            if p > 0:
                ops.reset_session_caches()
                _stage_shared(spark, sf_dir)
            # Interleave: warehouse twin i right before testdata twin i,
            # so the pairwise ratio is measured seconds apart, not
            # sessions apart.
            for w_name, t_name in zip(wh_names, td_names):
                t0 = time.time()
                _noop(wq.run_query(spark, w_name, year=bench_year))
                t = round(time.time() - t0, 3)
                wh[w_name] = min(wh.get(w_name, t), t)
                t0 = time.time()
                _noop(registry.QUERIES[t_name](spark, sf_dir))
                t = round(time.time() - t0, 3)
                td[t_name] = min(td.get(t_name, t), t)
            for name in ref_etl + beyond:
                t0 = time.time()
                _noop(registry.QUERIES[name](spark, sf_dir))
                t = round(time.time() - t0, 3)
                by[name] = min(by.get(name, t), t)

        families: dict[str, dict] = {}
        for name in beyond:
            fam = families.setdefault(
                _family(name), {"entries": 0, "sec": 0.0}
            )
            fam["entries"] += 1
            fam["sec"] = round(fam["sec"] + by[name], 3)

        pairs = []
        for w_name, t_name in zip(wh_names, td_names):
            pairs.append(
                {
                    "warehouse": w_name,
                    "testdata": t_name,
                    "warehouse_sec": wh[w_name],
                    "testdata_sec": td[t_name],
                    "ratio": round(td[t_name] / wh[w_name], 2)
                    if wh[w_name]
                    else None,
                }
            )

        result = {
            "metric": "same_session_baseline",
            "sf_dir": sf_dir,
            "runs": args.runs,
            "bench_year": bench_year,
            "warehouse_total_sec": round(sum(wh.values()), 3),
            "testdata_total_sec": round(sum(td.values()), 3),
            "warehouse": wh,
            "testdata": td,
            "pairs": pairs,
            "reference_etl": {n: by[n] for n in ref_etl},
            "beyond": by,
            "beyond_families": dict(sorted(families.items())),
        }
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)

        # Ready-to-paste markdown for the BASELINE.md addendum.
        lines = [
            "| pair | warehouse twin (s) | testdata twin (s) | ratio |",
            "|---|---|---|---|",
        ]
        for pr in pairs:
            lines.append(
                f"| {pr['testdata'].split('_')[0]} | {pr['warehouse_sec']} "
                f"| {pr['testdata_sec']} | {pr['ratio']}× |"
            )
        lines += [
            "",
            "| family | entries | total s (min-of-%d) |" % args.runs,
            "|---|---|---|",
        ]
        for fam, st in sorted(families.items()):
            lines.append(f"| {fam} | {st['entries']} | {st['sec']} |")
        print("\n".join(lines))
        print(
            json.dumps(
                {
                    "warehouse_total_sec": result["warehouse_total_sec"],
                    "testdata_total_sec": result["testdata_total_sec"],
                    "out": args.out,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
