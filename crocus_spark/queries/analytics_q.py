"""Behavioral analytics queries — funnel conversion and cohort retention
over the events stream. The reference's daily snapshots imply exactly this
workload once products are compared over time ('confront ... as a starting
point for later evolutions', reference README.md:3-8): who progressed
through a sequence, and who came back.

Both queries are windowless-join shapes that scale: funnels reduce each
user to a handful of per-stage minimum timestamps (one grouped aggregate
over the fact scan — conditional min, no self-join of events); cohorts
join a user-sized dimension (first-seen week) back to the fact table on
user_id — broadcast- or shuffle-joinable, never event×event.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crocus_spark.io import load
from crocus_spark.queries import register


@register(
    "funnel_conversion",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    ),
    flags AS (
      SELECT user_id,
             (t_view IS NOT NULL)::INT AS s1,
             (t_view IS NOT NULL AND t_click > t_view)::INT AS s2,
             (t_view IS NOT NULL AND t_click > t_view
              AND t_purchase > t_click)::INT AS s3
      FROM stage
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS n_viewed,
           CAST(SUM(s2) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(s3) AS BIGINT) AS n_purchased_after_click,
           round(CAST(SUM(s2) AS DOUBLE) / NULLIF(SUM(s1), 0), 6)
             AS view_to_click,
           round(CAST(SUM(s3) AS DOUBLE) / NULLIF(SUM(s2), 0), 6)
             AS click_to_purchase
    FROM flags
    """,
    tags=("analytics", "funnel"),
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel (view → click → purchase): a user converts a stage
    only if that stage's FIRST occurrence is strictly after the previous
    stage's first occurrence — the standard strict-ordering funnel
    semantic. Spark shape: conditional MIN per user in ONE grouped
    aggregate over the scan (no event×event self-join, no window), then a
    global roll-up of the user-sized flag relation; NULL stage times
    (comparison with NULL is NULL → false) drop non-entrants for free."""
    ev = load(spark, sf_dir, "events")
    tmin = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stage = ev.groupBy("user_id").agg(
        tmin("view").alias("t_view"),
        tmin("click").alias("t_click"),
        tmin("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull().cast("int")
    s2 = (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))).cast(
        "int"
    )
    s3 = (
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click"))
    ).cast("int")
    flags = stage.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    return flags.agg(
        F.sum("s1").cast("long").alias("n_viewed"),
        F.sum("s2").cast("long").alias("n_clicked_after_view"),
        F.sum("s3").cast("long").alias("n_purchased_after_click"),
        F.round(
            F.sum("s2").cast("double") / F.nullif(F.sum("s1"), F.lit(0)), 6
        ).alias("view_to_click"),
        F.round(
            F.sum("s3").cast("double") / F.nullif(F.sum("s2"), F.lit(0)), 6
        ).alias("click_to_purchase"),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('week', MIN(ts))::DATE AS cohort_week
      FROM events
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            date_trunc('week', e.ts)::DATE) AS INT) AS week_k
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
    )
    SELECT a.cohort_week, a.week_k,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           s.cohort_size AS cohort_size,
           round(CAST(COUNT(*) AS DOUBLE) / s.cohort_size, 6) AS retention
    FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_k, s.cohort_size
    ORDER BY a.cohort_week, a.week_k
    """,
    tags=("analytics", "cohort"),
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen week; for each
    cohort, the share still active k weeks later. Spark shape: the cohort
    dimension is user-sized (one grouped aggregate), joined back to the
    fact scan on user_id — a plain equi-join AQE can broadcast when the
    user dimension is small, with one distinct on (user, cohort, week_k)
    bounding rows at users × active-weeks; no event×event work anywhere."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_k"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_week", "week_k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_k",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_k")
    )
