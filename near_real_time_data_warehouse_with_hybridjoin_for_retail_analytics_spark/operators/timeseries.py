"""Time-series joins over the events stream: as-of and bounded-range.

Spark has no ASOF JOIN operator (DuckDB and kdb do); the scalable
re-expression is the union-and-window trick: interleave both sides into
one frame ordered by (ts, side) per key, carry the left side's last row
forward with ``last(..., ignorenulls=True)``. One shuffle on the key,
one sort — the same cost as a single window aggregate, and no
quadratic candidate generation at any key cardinality.

Bounded-range joins ("events within the prior 5 minutes") get the
interval-bucketing pattern: quantize time into interval-width buckets,
equi-join on (key, bucket) for the two buckets any qualifying row can
live in, then filter exactly. The equi-join keeps Catalyst on
shuffle-hash/sort-merge strategies — a naive ``t BETWEEN a AND b`` join
degenerates to broadcast-nested-loop and dies at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query

CONTEXT_WINDOW_US = 5 * 60 * 1_000_000  # 5 minutes


@query(
    "events_asof_attribution",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS micros_since_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute each purchase to the user's latest prior (or same-
    instant) click — the canonical as-of join. Purchases with no prior
    click keep NULL attribution (left semantics).

    Oracle: DuckDB's native ASOF LEFT JOIN. Spark plan: one union, one
    window over (user_id, ts) — ties order clicks (side 0) before
    purchases (side 1), matching the oracle's ``>=`` bound."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(0).alias("side")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(1).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("side") == 0, F.struct("ts", "eid")), ignorenulls=True
    ).over(w)
    return (
        clicks.unionByName(purchases)
        .withColumn("lc", last_click)
        .filter(F.col("side") == 1)
        .select(
            F.col("eid").alias("purchase_id"),
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.col("lc.eid").alias("click_id"),
            (F.unix_micros("ts") - F.unix_micros("lc.ts")).alias(
                "micros_since_click"
            ),
        )
    )


@query(
    "events_error_context",
    """
    SELECT e.event_id AS error_id,
           e.user_id,
           epoch_us(e.ts) AS error_us,
           CAST((SELECT COUNT(*)
                 FROM events x
                 WHERE x.user_id = e.user_id
                   AND x.ts < e.ts
                   AND epoch_us(e.ts) - epoch_us(x.ts) <= 300000000
                ) AS BIGINT) AS n_context_events
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def events_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: how many same-user events occurred in the
    strictly-prior 5 minutes (incident context size).

    Interval bucketing: an event qualifying for an error at time t lives
    in the error's 5-minute bucket or the one before, so each error
    probes exactly two (user_id, bucket) keys; the exact time filter
    runs after the equi-join. Shuffle volume is O(rows), never O(pairs);
    the oracle's correlated subquery is the semantic spec, DuckDB
    decorrelates it itself."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    bucket = (F.col("us") / F.lit(CONTEXT_WINDOW_US)).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("us").alias("error_us"),
        F.explode(F.array(bucket - 1, bucket)).alias("bucket"),
    )
    candidates = ev.select(
        "user_id", bucket.alias("bucket"), F.col("us").alias("cand_us")
    )
    hit = (F.col("cand_us") < F.col("error_us")) & (
        F.col("error_us") - F.col("cand_us") <= CONTEXT_WINDOW_US
    )
    return (
        errors.join(candidates, ["user_id", "bucket"], "left")
        .groupBy("error_id", "user_id", "error_us")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("n_context_events"))
    )


# ---------------------------------------------------------------------------
# Multi-granularity time rollup (GROUPING SETS)
# ---------------------------------------------------------------------------
# The aggregation body is ONE SQL string executed verbatim by both
# engines (Spark SQL and DuckDB share the GROUPING SETS syntax and the
# functions used) — the table name is the only parameter. Hierarchical
# subtotals in a single pass: Spark plans one Expand + one shuffle on
# the grouping columns, not four scans; value sums route through
# DECIMAL(18,4) (functions/money.py rule) so every engine and every
# partitioning yields bit-identical totals.
_GS_BODY = """
    SELECT day, hr, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM (
      SELECT CAST(ts AS DATE) AS day,
             CAST(hour(ts) AS INT) AS hr,
             event_type, value
      FROM {tbl}
    ) e
    GROUP BY GROUPING SETS ((day, hr, event_type), (day, event_type), (day), ())
"""


@query("events_rollup_multi", _GS_BODY.format(tbl="events"))
def events_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup of the events stream:
    (day, hour, type), (day, type), (day), and grand-total levels in
    one GROUPING SETS pass — the continuous-aggregate table a
    time-series store maintains. NULL group markers identify the level
    (day/hr/event_type are never NULL in the data). One Expand (4×
    row multiplier pre-aggregation, combined map-side) + one exchange
    carrying only (keys × partials) — at 100 TB the output cardinality
    is bounded by hours × types, independent of event count."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(_GS_BODY.format(tbl="events_gs"))


# ---------------------------------------------------------------------------
# Hourly-count anomaly detection (z-score, integer-exact)
# ---------------------------------------------------------------------------
# The monitoring readout a streaming warehouse tracks: which (type,
# hour) buckets deviate ≥ Z_THRESHOLD population standard deviations
# from that type's hourly mean. All moments are exact BIGINTs (counts,
# Σc, Σc²) with the algebraic identity z = (n·c − s)/√(n·ss − s²), so
# the single float per row is one divide of exact operands — the
# z-scores themselves hash-match across engines.
Z_THRESHOLD = 3.0


@query(
    "events_anomaly_zscore",
    f"""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS window_start,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM hourly GROUP BY 1
    )
    SELECT h.event_type, h.window_start, h.c AS n_events,
           CAST(t.n * h.c - t.s AS DOUBLE)
             / sqrt(CAST(greatest(t.n * t.ss - t.s * t.s, 1) AS DOUBLE)) AS zscore
    FROM hourly h JOIN stats t USING (event_type)
    WHERE abs(CAST(t.n * h.c - t.s AS DOUBLE)
              / sqrt(CAST(greatest(t.n * t.ss - t.s * t.s, 1) AS DOUBLE)))
          >= {Z_THRESHOLD}
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-count anomalies per type: buckets whose count sits
    ≥ 3 population σ from the type's hourly mean. Two aggregations
    (hour buckets, then per-type moments — the stats relation is
    |types| rows and broadcasts back), output bounded by anomalous
    buckets. Exact integer moments make the z-score engine-exact, so
    the oracle hash-checks the scores, not just the flagged set."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("window_start")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    z = (F.col("n") * F.col("c") - F.col("s")).cast("double") / F.sqrt(
        F.greatest(
            F.col("n") * F.col("ss") - F.col("s") * F.col("s"), F.lit(1)
        ).cast("double")
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= Z_THRESHOLD)
        .select("event_type", "window_start", F.col("c").alias("n_events"), "zscore")
    )


# ---------------------------------------------------------------------------
# Dense gap-fill rollup (time_bucket_gapfill + LOCF, integer-exact)
# ---------------------------------------------------------------------------


@query(
    "events_gapfill",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
    ),
    series AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM span
    ),
    f AS (
      SELECT s.event_type, s.h, hourly.c
      FROM series s
      LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
    )
    SELECT event_type, h AS window_start,
           CAST(COALESCE(c, 0) AS BIGINT) AS n_events,
           CAST(last_value(c IGNORE NULLS) OVER w AS BIGINT) AS carried,
           CAST(date_diff('hour',
                last_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
                  OVER w,
                h) AS BIGINT) AS hours_since_obs
    FROM f
    WINDOW w AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup with gap-fill — the `time_bucket_gapfill`
    readout a time-series store serves: every hour between each type's
    first and last observation materializes a row, missing hours carry
    n_events=0 plus a last-observation-carried-forward count and the
    gap's age in hours (dashboards draw the flat-line, alerting keys on
    the staleness). All columns are exact BIGINTs (counts and hour
    diffs), so the oracle hash-checks values, not just shape.

    Plan: one aggregation to hour buckets, a |types|-row span frame
    whose `sequence()` explode regenerates the dense axis (output is
    bounded by types x hours in the span — independent of event count,
    the same cardinality argument as [[events_rollup_multi]]), a left
    join back, and one window per type for the two LOCF columns. At
    100 TB the only guard needed is the span itself: a sensor silent
    for years would explode years of rows, so production would clamp
    `mn` to a retention floor — the testdata span is one month."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    series = span.select(
        "event_type",
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    filled = series.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "event_type",
        F.col("h").alias("window_start"),
        F.coalesce("c", F.lit(0)).cast("long").alias("n_events"),
        F.last("c", ignorenulls=True).over(w).cast("long").alias("carried"),
        F.expr(
            "timestampdiff(HOUR, "
            "last(CASE WHEN c IS NOT NULL THEN h END, true) OVER ("
            "PARTITION BY event_type ORDER BY h "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), h)"
        )
        .cast("long")
        .alias("hours_since_obs"),
    )
