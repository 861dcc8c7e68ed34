"""Behavioral analytics over the events stream: ordered funnels and
cohort retention.

The reference's query surface is purely dimensional (star-schema OLAP,
SURVEY.md §2.12); a near-real-time warehouse fed by an event stream is
also asked sequence questions — "how many users progressed view → click
→ purchase, in order?" and "of the users who first appeared on day D,
how many came back k days later?". Both are single-shuffle relational
plans; neither needs an ordered per-user scan.

Scale notes (100 TB):
- The funnel stages are per-user conditional MIN aggregations: each one
  map-side combines to one row per user before the exchange, so shuffle
  volume is O(users), not O(events). Stage k's "after stage k-1" bound
  joins the *aggregated* per-user frame (tiny) back to events — at
  1000 executors that join hash-partitions both sides on user_id and
  AQE picks broadcast when the stage frame fits.
- Retention is one groupBy over (cohort_day, day_offset) after a
  per-user first-seen aggregation — output cardinality is bounded by
  days², independent of event count.
- COUNT(DISTINCT user_id) inside retention is exact (the grading
  contract); at extreme scale swap approx_count_distinct and re-grade
  as a recall-gated query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query

# Ordered funnel stages over the events stream.
FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "events_funnel",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS view_us
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_us
      FROM events e JOIN v ON e.user_id = v.user_id
       AND epoch_us(e.ts) > v.view_us
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
      FROM events e JOIN c ON e.user_id = c.user_id
       AND epoch_us(e.ts) > c.click_us
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT u.user_id, v.view_us, c.click_us, p.purchase_us
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel per user: earliest view, earliest
    click strictly after that view, earliest purchase strictly after
    that click. A user's row carries NULL from the first stage they
    never reached (left semantics) — the funnel counts are
    ``COUNT(view_us) ≥ COUNT(click_us) ≥ COUNT(purchase_us)`` by
    construction. All stage times are exact integer micros."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    users = ev.select("user_id").dropDuplicates()
    stage = ev.filter(F.col("event_type") == FUNNEL_STAGES[0]).groupBy(
        "user_id"
    ).agg(F.min("us").alias("view_us"))
    clicks = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(stage, "user_id")
        .filter(F.col("us") > F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("click_us"))
    )
    purchases = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(clicks, "user_id")
        .filter(F.col("us") > F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"))
    )
    return (
        users.join(stage, "user_id", "left")
        .join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select("user_id", "view_us", "click_us", "purchase_us")
    )


@query(
    "events_retention",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY 1
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
             AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the calendar day
    they first appear; each (cohort_day, day_offset) cell counts the
    distinct cohort members active that many days later (offset 0 is
    the cohort itself). The classic triangle a growth dashboard plots.

    Plan: per-user MIN(date) aggregation (map-combined), join back to
    events on user_id, then one exact distinct-count aggregation."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )
