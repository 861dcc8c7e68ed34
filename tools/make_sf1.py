"""Deterministic sf1 derivation for the SCALE STUDY (round-13 verdict
task: validate scaling one notch above the shipped sf0.1).

The driver ships testdata only to sf0.1; this tool derives a 10×
larger sf1 from sf0.1 by key-shifted replication — the standard
scale-up shape for a TPC-H-ish star schema (fixed dims, 10× facts):

- ``region``/``nation``: copied (fixed dims, as in TPC-H).
- ``customer``/``supplier``/``part``/``orders``/``lineitem``: 10
  replicas with every surrogate key shifted by replica ×
  (max_key + 1); foreign keys shift together so join fan-outs per key
  are IDENTICAL to sf0.1 (10× groups, not 10× bigger groups).
- ``events``: ids shifted; timestamps shifted by replica × (span + 1h)
  — 10× growth extends the timeline at the same density, the shape
  real event feeds grow in (hours × 10, not rows-per-hour × 10).
- ``documents``: doc_id shifted; replicas ≥ 1 get a two-token replica
  suffix appended to ``text`` so WITHIN-replica duplicate structure is
  preserved exactly while CROSS-replica exact/near duplicates do not
  appear — without this, every doc would gain 9 exact copies and the
  pair tables would grow ~100× per 10× data, a quadratic artifact of
  the replication, not a property of real corpora. ``n_chars`` is
  recomputed.
- ``embeddings``: vec_id shifted; each replica's vectors are ROTATED
  (list roll by replica index) — norm-preserving, so quantization and
  top-k geometry stay realistic, while cross-replica cosine collapses
  from 1.0 to noise (same quadratic-artifact argument).

Output: /tmp/sparkgraft_scale/sf1/{table}.parquet (+ _SF1_OK marker
with a source fingerprint; regeneration is skipped when current).
This data is for SCALING measurements only — correctness oracles run
exclusively on the driver-shipped testdata.

Usage: python tools/make_sf1.py [--replicas 10] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sparkgraft_scale/sf1"
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _fingerprint(replicas: int) -> str:
    parts = [f"replicas={replicas}"]
    for t in TABLES:
        st = os.stat(f"{SRC}/{t}.parquet")
        parts.append(f"{t}:{st.st_size}:{int(st.st_mtime)}")
    return ";".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    out, R = args.out, args.replicas

    import duckdb

    marker = os.path.join(out, "_SF1_OK")
    fp = _fingerprint(R)
    try:
        with open(marker) as fh:
            if fh.read().strip() == fp:
                print(f"current: {out}")
                return
    except OSError:
        pass
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )

    def off(table: str, key: str) -> int:
        return int(con.execute(f"SELECT MAX({key}) + 1 FROM {table}").fetchone()[0])

    ck, sk, pk = off("customer", "c_custkey"), off("supplier", "s_suppkey"), off("part", "p_partkey")
    ok_, dk, vk = off("orders", "o_orderkey"), off("documents", "doc_id"), off("embeddings", "vec_id")
    ek, uk = off("events", "event_id"), off("events", "user_id")
    span_us = int(
        con.execute(
            "SELECT epoch_us(MAX(ts)) - epoch_us(MIN(ts)) + 3600000000 FROM events"
        ).fetchone()[0]
    )
    emb_dim = int(con.execute("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0])

    def rep(table: str, select: str) -> None:
        union = " UNION ALL ".join(
            f"SELECT {select.format(r=r)} FROM {table}" for r in range(R)
        )
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    rep("customer", f"c_custkey + {{r}} * {ck} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    rep("supplier", f"s_suppkey + {{r}} * {sk} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    rep("part", f"p_partkey + {{r}} * {pk} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    rep("orders", (
        f"o_orderkey + {{r}} * {ok_} AS o_orderkey, "
        f"o_custkey + {{r}} * {ck} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    ))
    rep("lineitem", (
        f"l_orderkey + {{r}} * {ok_} AS l_orderkey, "
        f"l_partkey + {{r}} * {pk} AS l_partkey, "
        f"l_suppkey + {{r}} * {sk} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate"
    ))
    rep("events", (
        f"event_id + {{r}} * {ek} AS event_id, "
        f"ts + to_microseconds({{r}} * {span_us}::BIGINT) AS ts, "
        f"user_id + {{r}} * {uk} AS user_id, "
        "event_type, value, props"
    ))
    rep("documents", (
        f"doc_id + {{r}} * {dk} AS doc_id, "
        "CASE WHEN {r} = 0 THEN text ELSE text || ' zq{r} zr{r}' END AS text, "
        "lang, source, "
        "CAST(length(CASE WHEN {r} = 0 THEN text ELSE text || ' zq{r} zr{r}' END) AS BIGINT) AS n_chars"
    ))
    rep("embeddings", (
        f"vec_id + {{r}} * {vk} AS vec_id, "
        f"CASE WHEN {{r}} = 0 THEN embedding ELSE "
        f"list_concat(embedding[1 + ({{r}} % {emb_dim}):], "
        f"embedding[:({{r}} % {emb_dim})])::FLOAT[] END AS embedding, "
        "label"
    ))

    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(fp)
    os.replace(tmp, marker)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
