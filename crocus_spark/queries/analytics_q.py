"""Behavioral analytics queries — funnel conversion, cohort retention,
rolling-window anomaly detection, and EWMA smoothing over the events
stream. The reference's daily snapshots imply exactly this workload once
products are compared over time ('confront ... as a starting point for
later evolutions', reference README.md:3-8): who progressed through a
sequence, who came back, and which readings look wrong.

All of these are key-partitioned shapes that scale: funnels reduce each
user to a handful of per-stage minimum timestamps (one grouped aggregate
over the fact scan — conditional min, no self-join of events); cohorts
join a user-sized dimension (first-seen week) back to the fact table on
user_id — broadcast- or shuffle-joinable, never event×event; the rolling
z-score and EWMA are per-user windows (one shuffle on user_id, bounded
ROWS frames — no global sort, no unpartitioned window)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crocus_spark.io import load
from crocus_spark.queries import register
from crocus_spark.queries._det import DEC


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
           CAST(CAST(SUM(s2) AS DOUBLE) / NULLIF(SUM(s1), 0) AS FLOAT)
             AS view_to_click,
           CAST(CAST(SUM(s3) AS DOUBLE) / NULLIF(SUM(s2), 0) AS FLOAT)
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
        (
            F.sum("s2").cast("double") / F.nullif(F.sum("s1"), F.lit(0))).cast("float").alias("view_to_click"),
        (
            F.sum("s3").cast("double") / F.nullif(F.sum("s2"), F.lit(0))).cast("float").alias("click_to_purchase"),
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
           CAST(CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS FLOAT) AS retention
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
            (
                F.col("n_active").cast("double") / F.col("cohort_size")).cast("float").alias("retention"),
        )
        .orderBy("cohort_week", "week_k")
    )


@register(
    "anomaly_rolling_zscore",
    oracle="""
    WITH framed AS (
      SELECT user_id, event_id, value,
             COUNT(value) OVER w AS n_prev,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT user_id, event_id, value, n_prev,
             (s2 - (s1 * s1) / n_prev) / (n_prev - 1) AS var,
             s1 / n_prev AS mean
      FROM framed
      WHERE n_prev >= 10
    )
    SELECT user_id, event_id, value,
           CAST((value - mean) / sqrt(var) AS REAL) AS z
    FROM scored
    WHERE var > 1e-12 AND abs((value - mean) / sqrt(var)) > 2.5
    ORDER BY user_id, event_id
    """,
    tags=("analytics", "timeseries", "quality"),
)
def anomaly_rolling_zscore(spark, sf_dir):
    """Rolling-window anomaly detection: each event's value scored against
    the mean/std of its user's previous 20 readings (trailing frame,
    current row excluded — no self-leakage), flagged when |z| > 2.5. The
    moments come from exact DECIMAL partial sums (sum, sum-of-squares)
    so the variance is order-independent and bit-identical to the oracle
    — double SUM over a window frame is order-dependent and would drift
    between engines (see _det.py). Spark shape: one shuffle on user_id,
    a bounded ROWS frame (constant state per row), and the z arithmetic
    as identical double expression trees in both engines; output cast to
    float32 so the hash is binary-stable. At 100 TB this is the streaming
    sensor-QC shape: key-partitioned, bounded state, no global pass."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    ev = load(spark, sf_dir, "events")
    framed = ev.select(
        "user_id",
        "event_id",
        "value",
        F.count("value").over(w).alias("n_prev"),
        F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double")
         .alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(25,6)")).over(w)
         .cast("double").alias("s2"),
    ).filter(F.col("n_prev") >= 10)
    scored = framed.select(
        "user_id",
        "event_id",
        "value",
        ((F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("n_prev"))
         / (F.col("n_prev") - 1)).alias("var"),
        (F.col("s1") / F.col("n_prev")).alias("mean"),
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        scored.filter((F.col("var") > 1e-12) & (F.abs(z) > 2.5))
        .select("user_id", "event_id", "value", z.cast("float").alias("z"))
        .orderBy("user_id", "event_id")
    )


@register(
    "series_ewma_smooth",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, value,
             lag(value, 1) OVER w AS x1,
             lag(value, 2) OVER w AS x2,
             lag(value, 3) OVER w AS x3,
             lag(value, 4) OVER w AS x4
      FROM events
      WHERE user_id % 20 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, value,
           (value
            + CASE WHEN x1 IS NULL THEN 0.0 ELSE 0.5 * x1 END
            + CASE WHEN x2 IS NULL THEN 0.0 ELSE 0.25 * x2 END
            + CASE WHEN x3 IS NULL THEN 0.0 ELSE 0.125 * x3 END
            + CASE WHEN x4 IS NULL THEN 0.0 ELSE 0.0625 * x4 END)
           / (1.0
              + CASE WHEN x1 IS NULL THEN 0.0 ELSE 0.5 END
              + CASE WHEN x2 IS NULL THEN 0.0 ELSE 0.25 END
              + CASE WHEN x3 IS NULL THEN 0.0 ELSE 0.125 END
              + CASE WHEN x4 IS NULL THEN 0.0 ELSE 0.0625 END) AS ewma
    FROM lagged
    ORDER BY user_id, event_id
    """,
    tags=("analytics", "timeseries"),
)
def series_ewma_smooth(spark, sf_dir):
    """EWMA smoothing (α = 0.5, 5-tap truncation): the classic recursive
    filter unrolled into lag() taps so it stays a pure window expression
    — no UDF, no recursion, one shuffle on user_id. α = 0.5 makes every
    weight an exact binary fraction (0.5, 0.25, 0.125, 0.0625), every
    product a power-of-two scaling (exact in IEEE double), and the 5-term
    sum a fixed left-to-right expression tree — so the result is
    bit-identical across engines with NO rounding or decimal casts at
    all. Ramp-up uses renormalized partial weights (standard adjusted-EWMA
    semantics, as in pandas ewm(adjust=True)). At 100 TB the frame is
    O(1) per row and the only movement is the user_id shuffle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    lagged = ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("x1"),
        F.lag("value", 2).over(w).alias("x2"),
        F.lag("value", 3).over(w).alias("x3"),
        F.lag("value", 4).over(w).alias("x4"),
    )
    def tap(col, wt):
        return F.when(F.col(col).isNull(), 0.0).otherwise(wt * F.col(col))
    def wt_of(col, wt):
        return F.when(F.col(col).isNull(), 0.0).otherwise(F.lit(wt))
    num = (
        F.col("value")
        + tap("x1", 0.5) + tap("x2", 0.25)
        + tap("x3", 0.125) + tap("x4", 0.0625)
    )
    den = (
        F.lit(1.0)
        + wt_of("x1", 0.5) + wt_of("x2", 0.25)
        + wt_of("x3", 0.125) + wt_of("x4", 0.0625)
    )
    return lagged.select(
        "user_id", "event_id", "value", (num / den).alias("ewma")
    ).orderBy("user_id", "event_id")


@register(
    "series_max_drawdown",
    oracle="""
    WITH path AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(value AS DECIMAL(25,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM events WHERE event_type = 'purchase'
    ), peaks AS (
      SELECT user_id, ts, event_id, cum,
             MAX(cum) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM path
    )
    SELECT user_id,
           COUNT(*) AS n_points,
           CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown,
           CAST(MAX(peak) AS DOUBLE) AS max_peak
    FROM peaks
    GROUP BY user_id
    HAVING COUNT(*) >= 10
    ORDER BY max_drawdown DESC, user_id
    LIMIT 50
    """,
    tags=("analytics", "timeseries", "finance"),
)
def series_max_drawdown(spark, sf_dir):
    """Maximum drawdown per entity — THE risk statistic the reference's
    NAV time-series comparison implies (largest peak-to-trough fall of a
    cumulative value path). Two stacked windows on one partitioning
    (running decimal sum → running max) then a plain group-by: every
    prefix sum is DECIMAL-exact with a total-order tie-break, so peak,
    trough, and their difference are engine-identical. One shuffle on
    the entity key; path length per key is unbounded but streamed — no
    per-key buffering, no self-join over time."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peaks = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(25,6)")).over(w).alias("cum"),
    ).withColumn("peak", F.max("cum").over(w))
    return (
        peaks.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.max(F.col("peak") - F.col("cum")).cast("double").alias(
                "max_drawdown"
            ),
            F.max("peak").cast("double").alias("max_peak"),
        )
        .filter(F.col("n_points") >= 10)
        .orderBy(F.col("max_drawdown").desc(), "user_id")
        .limit(50)
    )


@register(
    "holdings_concentration_hhi",
    oracle="""
    WITH w AS (
      SELECT o_custkey AS portfolio,
             COUNT(*) AS n_positions,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS tot,
             CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(25,6)))
                  AS DOUBLE) AS tot_sq
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) >= 5
    )
    SELECT portfolio, n_positions,
           CAST(tot_sq / (tot * tot) AS REAL) AS hhi,
           CAST(1.0 / n_positions AS REAL) AS hhi_floor
    FROM w
    ORDER BY hhi DESC, portfolio
    LIMIT 50
    """,
    tags=("analytics", "finance"),
)
def holdings_concentration_hhi(spark, sf_dir):
    """Herfindahl-Hirschman concentration per portfolio — the
    diversification screen on the reference's holdings files (is this
    ETF 40 positions or effectively 3?). HHI = Σ(wᵢ/Σw)² collapses to
    Σw²/(Σw)², so NO per-position weight normalization pass exists: one
    hash aggregate carrying (count, Σw, Σw²) per portfolio, then a
    single float32-cast division. The floor 1/n is reported so the
    consumer reads concentration relative to equal-weight. Same shuffle
    shape as a sum at any scale."""
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    w = (
        o.groupBy(F.col("o_custkey").alias("portfolio"))
        .agg(
            F.count(F.lit(1)).alias("n_positions"),
            F.sum(p.cast(DEC)).cast("double").alias("tot"),
            F.sum((p * p).cast(DEC)).cast("double").alias("tot_sq"),
        )
        .filter(F.col("n_positions") >= 5)
    )
    return w.select(
        "portfolio",
        "n_positions",
        (F.col("tot_sq") / (F.col("tot") * F.col("tot")))
        .cast("float")
        .alias("hhi"),
        (F.lit(1.0) / F.col("n_positions")).cast("float").alias("hhi_floor"),
    ).orderBy(F.col("hhi").desc(), "portfolio").limit(50)


@register(
    "sessionize_batch_gaps",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), marked AS (
      SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ), numbered AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
    tags=("analytics", "sessionization"),
)
def sessionize_batch_gaps(spark, sf_dir):
    """Batch sessionization by inactivity gap (30 min) — the batch twin of
    the streaming session window (streaming_q.py): a new session starts
    when a user's gap from their previous event exceeds the threshold;
    ``session_seq`` is the running count of session starts. The classic
    lag → flag → running-sum → group-by chain.

    Spark shape: ONE shuffle on user_id serves both windows (lag and the
    running sum share the same partitioning and ordering — Catalyst
    collapses them into a single Window node pair over one sort), then
    the session aggregate reuses the same user_id clustering. No global
    sort, no self-join of events against itself; at 100 TB this is
    exactly as scalable as any per-user window. Gap math is integer
    microseconds (``unix_micros``) — no float drift between engines."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(F.col("ts"))
    marked = ev.withColumn("gap_us", us - F.lag(us).over(wo)).withColumn(
        "is_new",
        F.when(
            F.col("gap_us").isNull() | (F.col("gap_us") > 1_800_000_000), 1
        ).otherwise(0),
    )
    numbered = marked.withColumn("session_seq", F.sum("is_new").over(run))
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "series_ohlc_resample",
    oracle="""
    WITH base AS (
      SELECT user_id, date_trunc('day', ts)::DATE AS bar, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, bar,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS volume
    FROM base
    GROUP BY user_id, bar
    ORDER BY user_id, bar
    """,
    tags=("analytics", "timeseries"),
)
def series_ohlc_resample(spark, sf_dir):
    """Time-series downsampling to OHLC bars (the hypertable
    ``time_bucket`` + first/last/max/min resample): each (user, day)
    bucket keeps its open (first value by event time), high, low, close
    (last value) plus tick count and decimal-exact volume.

    First/last are row_number picks over the SAME (user_id, bar)
    partitioning the aggregate groups by, so the window's exchange is
    reused by the groupBy — ONE shuffle end-to-end (no min_by/arg_min,
    whose composite-key tie rules differ between engines). At 100 TB the
    bar key is (entity, bucket) — exactly the hypertable rollup
    partitioning; no global sort anywhere."""
    ev = load(spark, sf_dir, "events")
    wa = Window.partitionBy("user_id", "bar").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    base = (
        ev.select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("bar"),
            "ts",
            "event_id",
            "value",
        )
        .withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
    )
    return (
        base.groupBy("user_id", "bar")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("volume"),
        )
        .orderBy("user_id", "bar")
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('view', 'click')
                  THEN CAST(json_extract(props, '$.k') AS BIGINT) % 4 END
               AS touch_channel
      FROM events
    ), carried AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(touch_channel IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS channel
      FROM tagged
    )
    SELECT COALESCE(channel, -1) AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM carried
    WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics",),
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: every purchase's value is
    credited to the channel of the most recent preceding touch (view or
    click; channel derived from the event's JSON props), via one
    ``last(ignorenulls)`` running window per user — the classic
    attribution shape with NO self-join of the fact table. Purchases
    with no prior touch fall into channel −1. Revenue sums are
    decimal-exact.

    Scale: one user_id shuffle for the window, then a channels-sized
    aggregate; at 100 TB this is the same plan — the window frame is
    running (O(1) state per row) and channels ≪ corpus."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_type").isin("view", "click"),
            F.get_json_object("props", "$.k").cast("long") % 4,
        ).alias("touch_channel"),
    )
    carried = tagged.withColumn(
        "channel", F.last("touch_channel", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit(-1)).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "sequence_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v'
                          WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p'
                          WHEN 'signup' THEN 's'
                          ELSE 'e' END, ''
                        ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, length(s) AS n_events,
           -- list_aggregate('string_agg') of an EMPTY match list is NULL
           -- in DuckDB where Spark's concat_ws gives '' (caught by the
           -- sf0.1 sweep: zero-conversion users exist only there)
           COALESCE(length(list_aggregate(regexp_extract_all(s, 'v[ce]*p'),
                                          'string_agg', '')), 0)
             AS matched_len,
           len(regexp_extract_all(s, 'v[ce]*p')) AS n_conversions
    FROM seq
    ORDER BY user_id
    """,
    tags=("analytics",),
)
def sequence_pattern_match(spark, sf_dir):
    """Event-sequence pattern matching (the MATCH_RECOGNIZE workload):
    each user's ordered event stream collapses to a one-char-per-event
    string, and conversions are counted as non-overlapping matches of
    the regex ``v[ce]*p`` (a view, any clicks/errors, then a purchase).
    Left-to-right non-overlapping greedy matching is identical across
    regex engines for this alternation-free pattern, so the match count
    and total matched span are hash-comparable.

    Scale: the per-user sequence string is ordered-collected in ONE
    grouped aggregate (sessions bound the string length in practice —
    sessionize_batch_gaps is the upstream that keeps it bounded);
    matching is then a per-row regexp, fused into the aggregate's
    output projection — no joins, no windows, one shuffle."""
    ev = load(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seq = (
        ev.select("user_id", "ts", "event_id", ch.alias("ch"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "ch"))
                    ),
                    lambda s: s["ch"],
                ),
            ).alias("s")
        )
    )
    matches = F.regexp_extract_all(F.col("s"), F.lit("v[ce]*p"), 0)
    return seq.select(
        "user_id",
        F.length("s").alias("n_events"),
        F.length(F.concat_ws("", matches)).alias("matched_len"),
        F.size(matches).alias("n_conversions"),
    ).orderBy("user_id")


@register(
    "stats_winsorized_agg",
    oracle="""
    WITH binned AS (
      SELECT c_mktsegment, c_acctbal,
             ntile(20) OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS vigintile
      FROM customer
    ), bounds AS (
      SELECT c_mktsegment,
             MAX(CASE WHEN vigintile = 1 THEN c_acctbal END) AS lo,
             MIN(CASE WHEN vigintile = 20 THEN c_acctbal END) AS hi
      FROM binned GROUP BY c_mktsegment
    )
    SELECT b.c_mktsegment, bd.lo, bd.hi,
           COUNT(*) AS n,
           COUNT(CASE WHEN b.c_acctbal < bd.lo
                        OR b.c_acctbal > bd.hi THEN 1 END) AS n_clipped,
           CAST(SUM(CAST(LEAST(GREATEST(b.c_acctbal, bd.lo), bd.hi)
                         AS DECIMAL(25,6))) AS DOUBLE) AS winsorized_sum
    FROM binned b JOIN bounds bd USING (c_mktsegment)
    GROUP BY b.c_mktsegment, bd.lo, bd.hi
    ORDER BY b.c_mktsegment
    """,
    tags=("analytics", "statistics"),
)
def stats_winsorized_agg(spark, sf_dir):
    """Winsorized aggregation (robust-statistics outlier handling): per
    segment, clip account balances to the [5th, 95th] percentile band
    and aggregate the clipped values. The band edges are INTEGER-RANK
    picks (max of the 1st / min of the 20th vigintile under a
    deterministic total order) — no interpolated percentile arithmetic,
    so the edges are exact data values and hash-portable.

    Scale: one per-group window for binning (the same exchange feeds the
    bounds aggregate), then the groups-sized bounds relation broadcasts
    back onto the rows — the 100 TB swap is approx-percentile edges
    (agg_approx_percentiles) with this exact query as the semantic
    spec."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    binned = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(20).over(w).alias("vigintile"),
    )
    bounds = binned.groupBy("c_mktsegment").agg(
        F.max(F.when(F.col("vigintile") == 1, F.col("c_acctbal"))).alias("lo"),
        F.min(F.when(F.col("vigintile") == 20, F.col("c_acctbal"))).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    return (
        binned.join(F.broadcast(bounds), "c_mktsegment")
        .groupBy("c_mktsegment", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(
                    (F.col("c_acctbal") < F.col("lo"))
                    | (F.col("c_acctbal") > F.col("hi")),
                    1,
                )
            ).alias("n_clipped"),
            F.sum(clipped.cast(DEC)).cast("double").alias("winsorized_sum"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "window_ratio_to_report",
    oracle="""
    WITH seg_nat AS (
      SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
             SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS rev,
             COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT segment, nation, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY segment) AS DOUBLE)
             AS share_of_segment
    FROM seg_nat
    ORDER BY segment, nation
    """,
    tags=("analytics", "window"),
)
def window_ratio_to_report(spark, sf_dir):
    """Ratio-to-report (contribution analysis): each (segment, nation)
    cell's revenue share of its segment, via an unbounded window sum
    over the ALREADY-AGGREGATED cells — the window runs on the
    groups-sized relation (segments × nations), never the fact table.
    Numerator and denominator are exact decimal sums cast to double,
    so the share is one IEEE division. At 100 TB the fact scan feeds
    one map-side-combinable aggregate; everything after is model-sized."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cells = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment", "c_nationkey")),
            o["o_custkey"] == c["c_custkey"],
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nation"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy("segment")
    return cells.select(
        "segment",
        "nation",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (
            F.col("rev").cast("double")
            / F.sum("rev").over(w).cast("double")
        ).alias("share_of_segment"),
    ).orderBy("segment", "nation")


@register(
    "ml_ctr_wilson_interval",
    oracle="""
    WITH chan AS (
      SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS channel,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks
      FROM events
      WHERE event_type IN ('view', 'click')
      GROUP BY 1
    )
    SELECT channel, views, clicks,
           CAST(CAST(clicks AS DOUBLE) / (views + clicks)
                AS REAL) AS rate,
           CAST(
             ((CAST(clicks AS DOUBLE) / (views + clicks))
              + (1.96 * 1.96) / (2.0 * (views + clicks))
              - 1.96 * sqrt(
                  ((CAST(clicks AS DOUBLE) / (views + clicks))
                   * (1.0 - CAST(clicks AS DOUBLE) / (views + clicks)))
                    / (views + clicks)
                  + (1.96 * 1.96)
                      / (4.0 * (views + clicks) * (views + clicks))))
             / (1.0 + (1.96 * 1.96) / (views + clicks))
             AS REAL) AS wilson_lower
    FROM chan
    ORDER BY channel
    """,
    tags=("analytics", "ml", "statistics"),
)
def ml_ctr_wilson_interval(spark, sf_dir):
    """Per-channel click-through rate with the Wilson score lower bound
    (z = 1.96) — the ranking statistic that doesn't over-trust small
    samples. Inputs are exact integer counts from ONE conditional
    aggregate over the fact scan; the interval is a fixed IEEE double
    expression tree (sqrt is correctly rounded, so both engines produce
    the same doubles given the same parenthesization), emitted at
    float32 to stand clear of last-ulp formatting drift. State is
    channels-sized; the plan has one shuffle."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    chan = ev.groupBy(
        (F.get_json_object("props", "$.k").cast("long") % 4).alias("channel")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
    )
    p = F.col("clicks").cast("double") / (F.col("views") + F.col("clicks"))
    z2 = F.lit(1.96 * 1.96)
    wilson = (
        p
        + z2 / (F.lit(2.0) * (F.col("views") + F.col("clicks")))
        - F.lit(1.96)
        * F.sqrt(
            (p * (F.lit(1.0) - p)) / (F.col("views") + F.col("clicks"))
            + z2
            / (
                F.lit(4.0)
                * (F.col("views") + F.col("clicks"))
                * (F.col("views") + F.col("clicks"))
            )
        )
    ) / (F.lit(1.0) + z2 / (F.col("views") + F.col("clicks")))
    return chan.select(
        "channel",
        "views",
        "clicks",
        p.cast("float").alias("rate"),
        wilson.cast("float").alias("wilson_lower"),
    ).orderBy("channel")


@register(
    "stats_robust_median_mad",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type, MIN(n) AS n,
             (MAX(CASE WHEN rn = (n + 1) // 2 THEN value END)
              + MAX(CASE WHEN rn = (n + 2) // 2 THEN value END)) / 2.0
               AS median
      FROM ranked GROUP BY event_type
    ), devs AS (
      SELECT e.event_type, abs(e.value - m.median) AS dev,
             m.median, m.n,
             row_number() OVER (PARTITION BY e.event_type
                                ORDER BY abs(e.value - m.median), e.event_id)
               AS rn
      FROM events e JOIN med m USING (event_type)
    )
    SELECT event_type, MIN(n) AS n, MIN(median) AS median,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END)
            + MAX(CASE WHEN rn = (n + 2) // 2 THEN dev END)) / 2.0 AS mad
    FROM devs
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("analytics", "statistics", "ml"),
)
def stats_robust_median_mad(spark, sf_dir):
    """Robust location/scale per group — exact median and MAD (median
    absolute deviation), the outlier-immune alternative to mean/stddev
    feature scaling. Both medians are INTEGER-RANK picks (the two middle
    ranks under a deterministic total order, averaged with one IEEE
    divide) — no interpolated-percentile arithmetic, so values are exact
    data points and hash-portable; even-sized groups are handled by the
    (n+1)//2, (n+2)//2 pair collapsing to the same rank when n is odd.

    Scale: two window passes on the SAME group key (one shuffle each) +
    a groups-sized broadcast of the medians back onto the fact scan. The
    100 TB swap for the windows is two-pass approx-quantile narrowing
    (the weighted-median discipline); this query is the semantic spec."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda rk: F.max(  # noqa: E731
        F.when(F.col("rn") == rk, F.col("value"))
    )
    med = ranked.groupBy("event_type").agg(
        F.min("n").alias("n"),
        (
            (
                pick(F.floor((F.col("n") + 1) / 2))
                + pick(F.floor((F.col("n") + 2) / 2))
            )
            / 2.0
        ).alias("median"),
    )
    wd = Window.partitionBy("event_type").orderBy("dev", "event_id")
    devs = (
        ev.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "n",
            "median",
            F.abs(F.col("value") - F.col("median")).alias("dev"),
            "event_id",
        )
        .withColumn("rn", F.row_number().over(wd))
    )
    pickd = lambda rk: F.max(  # noqa: E731
        F.when(F.col("rn") == rk, F.col("dev"))
    )
    return (
        devs.groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("median").alias("median"),
            (
                (
                    pickd(F.floor((F.col("n") + 1) / 2))
                    + pickd(F.floor((F.col("n") + 2) / 2))
                )
                / 2.0
            ).alias("mad"),
        )
        .orderBy("event_type")
    )


@register(
    "series_period_over_period",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', o_orderdate)::DATE AS week,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT week, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev - lag(rev) OVER (ORDER BY week) AS DOUBLE) AS wow_abs,
           CAST(CAST(rev - lag(rev) OVER (ORDER BY week) AS DOUBLE)
                 / CAST(lag(rev) OVER (ORDER BY week) AS DOUBLE) AS FLOAT)
             AS wow_pct
    FROM weekly
    ORDER BY week
    """,
    tags=("analytics", "timeseries"),
)
def series_period_over_period(spark, sf_dir):
    """Period-over-period growth (the WoW/MoM reporting primitive):
    weekly order counts and decimal-exact revenue, with absolute and
    percentage week-over-week deltas via lag. The lag window runs on the
    AGGREGATED weeks relation (calendar-sized), so the single-partition
    window is trivially small at any fact-table size; deltas subtract
    exact decimals before the one double division."""
    o = load(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"),
    )
    w = Window.orderBy("week")
    prev = F.lag("rev").over(w)
    return weekly.select(
        "week",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - prev).cast("double").alias("wow_abs"),
        (
            (F.col("rev") - prev).cast("double") / prev.cast("double")).cast("float").alias("wow_pct"),
    ).orderBy("week")


@register(
    "dq_key_skew_profile",
    oracle="""
    WITH freqs AS (
      SELECT l_partkey, COUNT(*) AS f FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f, l_partkey) AS i FROM freqs
    ), sums AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(f) AS BIGINT) AS n_rows,
             MAX(f) AS max_f, SUM(i * f) AS iwsum
      FROM ranked
    )
    SELECT n_keys, n_rows, max_f,
           CAST(CAST(max_f AS DOUBLE) / n_rows AS FLOAT) AS top_share,
           CAST(2.0 * iwsum / (CAST(n_keys AS DOUBLE) * n_rows)
                - CAST(n_keys + 1 AS DOUBLE) / n_keys AS FLOAT) AS gini
    FROM sums
    """,
    tags=("dq", "statistics"),
)
def dq_key_skew_profile(spark, sf_dir):
    """Join-key skew diagnostic — the pre-flight check before a 100 TB
    shuffle: key count, max key frequency, hottest-key share, and the
    Gini coefficient of the frequency distribution (0 = uniform,
    →1 = one hot key), computed from exact integer rank-weighted sums
    (G = 2·Σi·fᵢ/(n·Σf) − (n+1)/n over ascending-frequency ranks).

    No rank is ever materialized per key: ranks within a tie group of
    frequency f are consecutive, so their sum is closed-form
    (k·a + k(k−1)/2 for group start a, size k) and the whole Gini
    numerator decomposes over the FREQUENCY-OF-FREQUENCY relation
    (distinct f values — a few thousand rows even when the key relation
    is fact-sized, which is precisely when you run a skew profile). The
    tiny cumulative runs shard-parallel through
    ``operators/ranking.cumulative_below``; the oracle keeps the
    straightforward per-key rank window, pinning the decomposition.
    Feeding this into the salting decision (join_salted_skew /
    AQE skew-join thresholds) is the operational loop."""
    from crocus_spark.operators import ranking as R

    li = load(spark, sf_dir, "lineitem")
    freqs = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    fof = freqs.groupBy("f").agg(F.count(F.lit(1)).alias("k"))
    fof = R.cumulative_below(fof, "f", ["k"], n_shards=8)
    # Cast to decimal(38,0) BEFORE the products: k*(k-1) in 64-bit long
    # wraps silently once a tie group exceeds ~3e9 keys (non-ANSI Spark)
    # — exactly the fact-sized key relations this profile targets
    # (r3 ADVICE). Decimal end to end keeps the closed-form rank-sum
    # exact at any scale.
    kd = F.col("k").cast("decimal(38,0)")
    fd = F.col("f").cast("decimal(38,0)")
    a = F.col("_cum_k").cast("decimal(38,0)") + 1  # group's first rank
    iwsum2 = fd * (
        2 * kd * a + kd * (kd - 1)
    )  # 2 × Σ(rank·f) over the group — stays integer, k(k−1) is even
    return fof.agg(
        F.sum("k").cast("long").alias("n_keys"),
        F.sum(F.col("f") * F.col("k")).cast("long").alias("n_rows"),
        F.max("f").alias("max_f"),
        F.sum(iwsum2).cast("decimal(38,0)").alias("iwsum2"),
    ).select(
        "n_keys",
        "n_rows",
        "max_f",
        (F.col("max_f").cast("double") / F.col("n_rows"))
        .cast("float")
        .alias("top_share"),
        (
            F.col("iwsum2").cast("double")
            / (F.col("n_keys").cast("double") * F.col("n_rows"))
            - (F.col("n_keys") + 1).cast("double") / F.col("n_keys")
        )
        .cast("float")
        .alias("gini"),
    )


@register(
    "funnel_latency_quartiles",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    ), lat AS (
      SELECT user_id,
             date_diff('second', t_view, t_buy) AS secs
      FROM stage
      WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy > t_view
    ), ranked AS (
      SELECT secs, row_number() OVER (ORDER BY secs, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM lat
    )
    SELECT MIN(n) AS n_converted,
           (MAX(CASE WHEN rn = (n + 1) // 4 + 1 THEN secs END)) AS p25_secs,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN secs END)
            + MAX(CASE WHEN rn = (n + 2) // 2 THEN secs END)) / 2.0
             AS median_secs,
           (MAX(CASE WHEN rn = (3 * (n + 1)) // 4 THEN secs END)) AS p75_secs
    FROM ranked
    """,
    tags=("analytics", "funnel", "statistics"),
)
def funnel_latency_quartiles(spark, sf_dir):
    """Time-to-convert distribution: per converting user, seconds from
    first view to first purchase; quartiles as INTEGER-RANK picks over
    the converter-sized latency relation (median averages the two middle
    ranks — the stats_robust_median_mad discipline; p25/p75 are single
    deterministic rank picks). One grouped aggregate over the fact scan
    reduces each user to two timestamps; everything after is user-sized —
    and the rank picks need no per-user global sort: the value at global
    rank r is the unique latency whose strictly-below cumulative count
    straddles r, so the picks read off the LATENCY-FREQUENCY relation
    (distinct seconds), cumulated shard-parallel via
    ``operators/ranking.cumulative_below``; the oracle keeps the
    textbook row_number window, pinning the decomposition."""
    from crocus_spark.operators import ranking as R

    ev = load(spark, sf_dir, "events")
    tmin = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stage = ev.groupBy("user_id").agg(
        tmin("view").alias("t_view"), tmin("purchase").alias("t_buy")
    )
    lat = stage.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_view"))
    ).select(
        "user_id",
        (
            F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")
        ).alias("secs"),
    )
    freq = lat.groupBy("secs").agg(F.count(F.lit(1)).alias("c"))
    cum = R.cumulative_below(freq, "secs", ["c"], n_shards=16)
    tot = freq.agg(F.sum("c").cast("long").alias("n"))
    ranked = cum.crossJoin(F.broadcast(tot))
    pick = lambda rk: F.max(  # noqa: E731
        F.when(
            (F.col("_cum_c") < rk)
            & (rk <= F.col("_cum_c") + F.col("c")),
            F.col("secs"),
        )
    )
    return ranked.agg(
        F.min("n").alias("n_converted"),
        pick(F.floor((F.col("n") + 1) / 4) + 1).alias("p25_secs"),
        (
            (
                pick(F.floor((F.col("n") + 1) / 2))
                + pick(F.floor((F.col("n") + 2) / 2))
            )
            / 2.0
        ).alias("median_secs"),
        pick(F.floor(3 * (F.col("n") + 1) / 4)).alias("p75_secs"),
    )


@register(
    "series_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts)::DATE AS day,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM events GROUP BY 1
    ), trended AS (
      SELECT day, total,
             CAST(SUM(CAST(total AS DECIMAL(25,6))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS trend,
             CAST(date_part('isodow', day) AS INT) AS dow
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), seasonal AS (
      SELECT dow,
             CAST(SUM(CAST(total - trend AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*) AS s
      FROM trended GROUP BY dow
    )
    SELECT t.day, t.total,
           CAST(t.trend AS FLOAT) AS trend,
           CAST(s.s AS FLOAT) AS seasonal,
           CAST(t.total - t.trend - s.s AS FLOAT) AS residual
    FROM trended t JOIN seasonal s ON s.dow = t.dow
    ORDER BY t.day
    """,
    tags=("analytics", "timeseries"),
)
def series_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition (the classical
    trend + day-of-week + residual split): daily totals, a centered
    7-day moving-average trend, per-weekday seasonal means of the
    detrended series, residual = total − trend − seasonal. All means
    divide exact decimal sums (the detrended doubles re-quantize at
    scale 6 — comfortably inside the cross-engine double↔decimal safety
    margin), so the decomposition hash-matches.

    Scale: the fact scan reduces to a calendar-sized daily relation in
    one aggregate; every window/join after runs on days × 1 — trivially
    small at any event volume."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("total"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "total",
        (
            F.sum(F.col("total").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("trend"),
        F.dayofweek("day").alias("dow_raw"),
    ).withColumn(
        # pin ISO weekday (Mon=1..Sun=7) to match date_part('isodow')
        "dow",
        F.when(F.col("dow_raw") == 1, 7).otherwise(F.col("dow_raw") - 1),
    )
    seasonal = trended.groupBy("dow").agg(
        (
            F.sum((F.col("total") - F.col("trend")).cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("s")
    )
    return (
        trended.join(F.broadcast(seasonal), "dow")
        .select(
            "day",
            "total",
            F.col("trend").cast("float").alias("trend"),
            F.col("s").cast("float").alias("seasonal"),
            (
                F.col("total") - F.col("trend") - F.col("s")).cast("float").alias("residual"),
        )
        .orderBy("day")
    )


@register(
    "stats_mannwhitney_u",
    oracle="""
    WITH sample AS (
      SELECT o_orderpriority AS g, o_totalprice AS v
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    ranked AS (
      SELECT g, v,
             RANK() OVER (ORDER BY v) AS min_rank,
             COUNT(*) OVER (PARTITION BY v) AS tie_n
      FROM sample
    ),
    sums AS (
      SELECT
        CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN g = '1-URGENT'
                      THEN 2 * min_rank + tie_n - 1 ELSE 0 END) AS BIGINT)
          AS r1_doubled
      FROM ranked
    ),
    ties AS (
      SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM sample GROUP BY v)
    )
    SELECT n1, n2,
           CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
           n1 * n2 - CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) / 2 AS u2,
           tie_term,
           CAST(
             (CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) - n1 * n2)
             / (2 * sqrt(
                 (CAST(n1 AS DOUBLE) * n2 / 12)
                 * ((n1 + n2 + 1)
                    - CAST(tie_term AS DOUBLE)
                      / ((n1 + n2) * CAST(n1 + n2 - 1 AS DOUBLE))))) AS FLOAT) AS z_score
    FROM sums, ties
    """,
    tags=("stats", "hypothesis-test"),
)
def stats_mannwhitney_u(spark, sf_dir):
    """Mann-Whitney U rank-sum test: do URGENT and LOW orders draw their
    totals from the same distribution? The nonparametric sibling of the
    two-proportion z-test (`ml_ab_test_proportions`) for continuous
    outcomes — rank-based, so it needs no normality assumption.

    Determinism: tied values take AVERAGE ranks, carried DOUBLED
    (``2*min_rank + tie_n - 1`` — an exact integer), so the rank sum, both
    U statistics, and the tie-corrected variance are integer arithmetic
    until one final sqrt+division (rounded at 6). Spark shape: NO per-row
    rank window at all — the doubled midrank of a value v is
    ``2·cnt(<v) + cnt(=v) + 1``, so the whole statistic decomposes over
    the VALUE-FREQUENCY relation (distinct totals), whose strictly-below
    cumulative runs shard-parallel via
    ``operators/ranking.cumulative_below``; the oracle keeps the textbook
    per-row rank window, pinning the decomposition."""
    from crocus_spark.operators import ranking as R

    sample = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_totalprice").alias("v"),
        )
    )
    per_value = sample.groupBy("v").agg(
        F.sum(F.when(F.col("g") == "1-URGENT", 1).otherwise(0)).alias("c1"),
        F.count(F.lit(1)).alias("ct"),
    )
    cum = R.cumulative_below(per_value, "v", ["ct"], n_shards=16)
    midrank2 = 2 * F.col("_cum_ct") + F.col("ct") + 1
    sums = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("ct") - F.col("c1")).cast("long").alias("n2"),
        F.sum(F.col("c1") * midrank2).cast("long").alias("r1_doubled"),
        F.sum(
            F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")
        )
        .cast("long")
        .alias("tie_term"),
    )
    u1d = (F.col("r1_doubled") - F.col("n1") * (F.col("n1") + 1)).cast(
        "double"
    )
    n = F.col("n1") + F.col("n2")
    var = (F.col("n1").cast("double") * F.col("n2") / 12) * (
        (n + 1)
        - F.col("tie_term").cast("double")
        / (n * (n - 1).cast("double"))
    )
    return sums.select(
        "n1",
        "n2",
        (u1d / 2).alias("u1"),
        (F.col("n1") * F.col("n2") - u1d / 2).alias("u2"),
        "tie_term",
        (
            (u1d - F.col("n1") * F.col("n2")) / (2 * F.sqrt(var))).cast("float").alias("z_score"),
    )


@register(
    "analytics_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r, NTILE(10) OVER (ORDER BY r, o_custkey) AS decile
      FROM rev
    ),
    cells AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(r) AS dec_rev
      FROM ranked GROUP BY decile
    ),
    tot AS (SELECT SUM(dec_rev) AS total_rev FROM cells)
    SELECT decile, n_customers,
           CAST(dec_rev AS DOUBLE) AS decile_revenue,
           CAST(CAST(SUM(dec_rev) OVER (ORDER BY decile
                                        ROWS UNBOUNDED PRECEDING)
                     AS DOUBLE)
                / CAST((SELECT total_rev FROM tot) AS DOUBLE)
                AS FLOAT) AS cum_share
    FROM cells
    ORDER BY decile
    """,
    tags=("analytics", "statistics"),
)
def analytics_lorenz_deciles(spark, sf_dir):
    """Lorenz curve at decile resolution — cumulative revenue share of
    customers ranked poorest-to-richest, the inequality curve behind the
    Gini summary (`dq_key_skew_profile` computes the one-number version
    for join keys; this is the full distributional readout for customer
    concentration). Decile membership is the SQL-standard NTILE(10) over
    the exact global revenue rank; sums stay decimal until the output
    boundary; cum_share is an exact-decimal ratio at float32.

    Spark shape: the fact table reduces to a customer-sized relation in
    one map-side-combinable aggregate; the global rank comes from
    ``operators/ranking.ranked_global`` (range-shard + per-shard
    row_numbers + broadcast offsets — NO single-partition sort even with
    a billion customers); NTILE is the integer formula over (rank, n);
    the only ordered window left runs over the 10-row decile relation.
    The oracle keeps the textbook NTILE window."""
    from crocus_spark.operators import ranking as R

    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("r"))
    )
    rn = R.ranked_global(rev, ["r", "o_custkey"], out_col="rn", n_shards=16)
    tot_n = rev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # SQL-standard NTILE(10): q = n div 10, rem = n mod 10; buckets 1..rem
    # take q+1 rows, the rest q — same integer form as the CCNet terciles
    ranked = rn.crossJoin(F.broadcast(tot_n)).withColumn(
        "decile",
        F.expr(
            "CASE WHEN rn <= (n % 10) * ((n div 10) + 1) "
            "THEN (rn + (n div 10)) div ((n div 10) + 1) "
            "ELSE (n % 10) + (rn - (n % 10) * ((n div 10) + 1) "
            "      + (n div 10) - 1) div (n div 10) END"
        ).cast("int"),
    )
    cells = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("r").alias("dec_rev"),
    )
    total = cells.agg(F.sum("dec_rev").alias("total_rev"))
    w10 = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )  # 10 rows — cells-sized, not data-sized
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            F.col("dec_rev").cast("double").alias("decile_revenue"),
            (
                F.sum("dec_rev").over(w10).cast("double")
                / F.col("total_rev").cast("double")
            )
            .cast("float")
            .alias("cum_share"),
        )
        .orderBy("decile")
    )


@register(
    "analytics_rfm_segmentation",
    oracle="""
    WITH maxd AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate), (SELECT max_date FROM maxd))
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, monetary,
             6 - NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(monetary) AS DOUBLE) / COUNT(*) AS FLOAT)
             AS avg_monetary
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("analytics", "segmentation"),
)
def analytics_rfm_segmentation(spark, sf_dir):
    """RFM segmentation — the classic CRM cut: each customer scored 1-5 on
    Recency (days since last order, 5 = most recent), Frequency (order
    count), Monetary (exact decimal spend), via NTILE(5) with the
    SQL-standard remainder rule; customer key breaks metric ties so every
    bucket boundary is deterministic. Output is the segment lattice with
    sizes and average spend.

    Spark shape: orders collapse to a customer-sized relation in one
    grouped aggregate; each exact quintile is a shard-parallel global
    rank (``operators/ranking.ranked_global`` — range-shard + per-shard
    row_numbers + broadcast offsets, NO single-partition sort over the
    customer relation at any scale) fed through the SQL-standard NTILE
    remainder formula (``ranking.ntile_from_rank``), the same
    decomposition ``analytics_lorenz_deciles`` proved oracle-stable;
    the final roll-up is at most 125 cells."""
    from crocus_spark.operators import ranking as R

    orders = load(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("max_date"))
    rfm = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.first("max_date"), F.max("o_orderdate")
            ).alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("monetary"),
        )
    )
    tot_n = rfm.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = R.ranked_global(
        rfm, ["recency_days", "o_custkey"], out_col="_rn_r", n_shards=16
    )
    ranked = R.ranked_global(
        ranked, ["frequency", "o_custkey"], out_col="_rn_f", n_shards=16
    )
    ranked = R.ranked_global(
        ranked, ["monetary", "o_custkey"], out_col="_rn_m", n_shards=16
    )
    scored = ranked.crossJoin(F.broadcast(tot_n)).select(
        "o_custkey",
        "monetary",
        (6 - R.ntile_from_rank("_rn_r", "n", 5)).alias("r_score"),
        R.ntile_from_rank("_rn_f", "n", 5).alias("f_score"),
        R.ntile_from_rank("_rn_m", "n", 5).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            (
                F.sum("monetary").cast("double") / F.count(F.lit(1))).cast("float").alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "analytics_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(25,6))) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT SUM(rev) AS total_rev FROM rev),
    cum AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum_rev
      FROM rev
    ),
    classed AS (
      SELECT CASE WHEN cum_rev * 10 <= (SELECT total_rev FROM total) * 7
                  THEN 'A'
                  WHEN cum_rev * 10 <= (SELECT total_rev FROM total) * 9
                  THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev
      FROM cum
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) AS class_revenue,
           CAST(CAST(SUM(rev) AS DOUBLE)
                 / CAST((SELECT total_rev FROM total) AS DOUBLE) AS FLOAT)
             AS revenue_share
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
    tags=("analytics", "pareto"),
)
def analytics_abc_pareto(spark, sf_dir):
    """ABC / Pareto classification of parts by revenue: class A carries the
    first 70% of cumulative revenue, B the next 20%, C the tail — the
    inventory-management 80/20 cut. Class boundaries compare CROSS-
    MULTIPLIED exact decimals (``cum*10 <= total*7``), so no row ever sits
    on a float boundary; descending revenue ties are broken by part key.

    Spark shape: the fact table reduces to a part-sized relation in one
    map-side-combinable aggregate; the exact Pareto cumulation runs
    SHARD-PARALLEL via ``operators/ranking.running_global`` (range-shard
    on descending revenue, per-shard running sums, broadcast offsets —
    no single-partition sort even when the part relation is huge);
    final roll-up is 3 cells. The oracle keeps the textbook cumulative
    window."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast(DEC)
            ).alias("rev")
        )
    )
    total = rev.agg(F.sum("rev").alias("total_rev"))
    from crocus_spark.operators import ranking as R

    cum = (
        R.running_global(
            rev.withColumn("_neg", -F.col("rev")),
            ["_neg", "l_partkey"],
            "rev",
            out_col="cum_rev",
            n_shards=16,
        )
        .select("rev", "cum_rev")
        .crossJoin(F.broadcast(total))
    )
    classed = cum.select(
        F.when(
            F.col("cum_rev") * 10 <= F.col("total_rev") * 7, "A"
        )
        .when(F.col("cum_rev") * 10 <= F.col("total_rev") * 9, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
        "total_rev",
    )
    return (
        classed.groupBy("abc_class", "total_rev")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("double").alias("class_revenue"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_revenue",
            (
                F.col("class_revenue") / F.col("total_rev").cast("double")).cast("float").alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "series_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS rev
      FROM orders GROUP BY o_orderdate
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days, SUM(rev) AS total_rev
      FROM daily
    ),
    cum AS (
      SELECT day,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
             SUM(rev) OVER (ORDER BY day) AS s
      FROM daily
    ),
    drift AS (
      SELECT day,
             abs((SELECT n_days FROM stats) * s
                 - t * (SELECT total_rev FROM stats)) AS d
      FROM cum
    ),
    best AS (
      SELECT day, d,
             ROW_NUMBER() OVER (ORDER BY d DESC, day) AS rk
      FROM drift
    )
    SELECT b.day AS changepoint_day,
           s.n_days,
           CAST(CAST(b.d AS DOUBLE) / s.n_days AS FLOAT) AS cusum_peak
    FROM best b, stats s WHERE b.rk = 1
    """,
    tags=("analytics", "timeseries"),
)
def series_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection on the daily revenue series: the day
    maximizing |S_t - (t/n)*total| — the cumulative deviation from the
    global mean — is the single most likely level-shift point (Page 1954
    CUSUM, offline form). The drift is kept CROSS-MULTIPLIED in exact
    decimals (``|n*S_t - t*total|``), so the argmax (earliest day on
    ties) is never a float race; only the reported peak height divides.

    Spark shape: orders reduce to a calendar-sized daily relation (one
    grouped aggregate with map-side combine); the cumulative window and
    the argmax ranking both run over that ~1100-row relation — window
    state is O(calendar), never O(orders)."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("rev").alias("total_rev"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        F.sum("rev").over(w).alias("s"),
    )
    drift = cum.crossJoin(F.broadcast(stats)).select(
        "day",
        "n_days",
        F.abs(
            F.col("n_days") * F.col("s") - F.col("t") * F.col("total_rev")
        ).alias("d"),
    )
    best = drift.select(
        "day",
        "n_days",
        "d",
        F.row_number()
        .over(Window.orderBy(F.col("d").desc(), "day"))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("day").alias("changepoint_day"),
        "n_days",
        (F.col("d").cast("double") / F.col("n_days")).cast("float").alias(
            "cusum_peak"
        ),
    )


@register(
    "stats_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority
    ),
    margins AS (
      SELECT seg, pri, n,
             SUM(n) OVER (PARTITION BY seg) AS row_n,
             SUM(n) OVER (PARTITION BY pri) AS col_n,
             SUM(n) OVER () AS tot_n
      FROM obs
    ),
    terms AS (
      SELECT seg, pri, n, tot_n,
             CAST(ROUND(
               (n - CAST(row_n AS DOUBLE) * col_n / tot_n)
               * (n - CAST(row_n AS DOUBLE) * col_n / tot_n)
               / (CAST(row_n AS DOUBLE) * col_n / tot_n) * 1000000
             ) AS BIGINT) AS term_q
      FROM margins
    )
    SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT pri) AS BIGINT) AS n_cols,
           (COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT pri) - 1) AS df,
           CAST(MAX(tot_n) AS BIGINT) AS n_total,
           CAST(SUM(term_q) AS DOUBLE) / 1000000 AS chi2
    FROM terms
    """,
    tags=("stats", "hypothesis-test"),
)
def stats_chi2_independence(spark, sf_dir):
    """Chi-square test of independence on the market-segment × order-
    priority contingency table — the categorical sibling of the two-sample
    drift monitors: is priority assignment independent of segment?

    Determinism: each cell's (O-E)^2/E term is quantized to a SCALED
    BIGINT (round(term*1e6)) before the sum — per the repo's rule that
    float SUMs never cross a compare boundary — so the 25-cell reduction
    is exact integer addition in both engines. Spark shape: the fact join
    collapses to a 25-cell relation in one aggregate; margins are windows
    over those 25 rows; df and the statistic fall out of a single-row
    reduction."""
    obs = (
        load(spark, sf_dir, "orders")
        .join(load(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql.window import Window

    margins = obs.select(
        "seg",
        "pri",
        "n",
        F.sum("n").over(Window.partitionBy("seg")).alias("row_n"),
        F.sum("n").over(Window.partitionBy("pri")).alias("col_n"),
        F.sum("n").over(Window.partitionBy()).alias("tot_n"),
    )
    e = F.col("row_n").cast("double") * F.col("col_n") / F.col("tot_n")
    terms = margins.select(
        "seg",
        "pri",
        "tot_n",
        F.round((F.col("n") - e) * (F.col("n") - e) / e * 1000000)
        .cast("long")
        .alias("term_q"),
    )
    return terms.agg(
        F.countDistinct("seg").cast("long").alias("n_rows"),
        F.countDistinct("pri").cast("long").alias("n_cols"),
        (
            (F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1)
        ).alias("df"),
        F.max("tot_n").cast("long").alias("n_total"),
        (F.sum("term_q").cast("double") / 1000000).alias("chi2"),
    )


@register(
    "stats_spearman_corr",
    oracle="""
    WITH ranked AS (
      SELECT
        2 * RANK() OVER (ORDER BY l_quantity)
          + COUNT(*) OVER (PARTITION BY l_quantity) - 1 AS rx,
        2 * RANK() OVER (ORDER BY l_extendedprice)
          + COUNT(*) OVER (PARTITION BY l_extendedprice) - 1 AS ry
      FROM lineitem
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS DOUBLE) AS syy
      FROM ranked
    )
    SELECT n,
           CAST((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS FLOAT) AS spearman_rho
    FROM sums
    """,
    tags=("stats", "correlation"),
)
def stats_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between quantity and extended price —
    Pearson on average ranks, the monotonic-association measure that
    ignores the price scale. Ranks are carried DOUBLED (exact integers
    under ties, same trick as `stats_mannwhitney_u`), the five power sums
    accumulate in exact DECIMAL, and only the final closed-form divides —
    one identical IEEE expression tree per engine, rounded at 6.

    Spark shape: NO per-row rank window — the doubled midrank of a value
    is ``2·cnt(<v) + cnt(=v) + 1``, a function of the VALUE-FREQUENCY
    relation alone, and every power sum decomposes over the JOINT
    (quantity, price) frequency relation: Σrows rx·ry = Σpairs c·rx·ry.
    Both marginals cumulate shard-parallel via
    ``operators/ranking.cumulative_below`` (quantity: 50 values,
    broadcast back; price: distinct-prices-sized, ordinary shuffle
    join), so nothing fact-sized ever crosses one partition; the oracle
    keeps the textbook per-row windows, pinning the decomposition."""
    from crocus_spark.operators import ranking as R

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"), F.col("l_extendedprice").alias("p")
    )
    fq = R.cumulative_below(
        li.groupBy("q").agg(F.count(F.lit(1)).alias("cq")),
        "q",
        ["cq"],
        n_shards=8,
    ).select("q", (2 * F.col("_cum_cq") + F.col("cq") + 1).alias("rx"))
    fp = R.cumulative_below(
        li.groupBy("p").agg(F.count(F.lit(1)).alias("cp")),
        "p",
        ["cp"],
        n_shards=32,
    ).select("p", (2 * F.col("_cum_cp") + F.col("cp") + 1).alias("ry"))
    joint = li.groupBy("q", "p").agg(F.count(F.lit(1)).alias("c"))
    d38 = "decimal(38,0)"
    cd = F.col("c").cast(d38)
    j = joint.join(F.broadcast(fq), "q").join(fp, "p")
    sums = j.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(cd * F.col("rx")).cast("double").alias("sx"),
        F.sum(cd * F.col("ry")).cast("double").alias("sy"),
        F.sum(cd * F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
        F.sum(cd * F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(cd * F.col("ry") * F.col("ry")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "n", (num / den).cast("float").alias("spearman_rho")
    )


@register(
    "analytics_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           CAST(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type) AS FLOAT) AS p
    FROM pairs
    ORDER BY from_type, to_type
    """,
    tags=("analytics", "sequence"),
)
def analytics_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current) — the path-analysis readout behind
    'what do users do after a click'. Event order is pinned by
    (ts, event_id) so simultaneous events never race the LEAD.

    Spark shape: one per-user ordered window (the sessionization shuffle
    key, state O(1) per row), then the corpus collapses to an
    event-type × event-type relation — at most |types|² cells — whose
    row-normalization window runs on those cells, not the fact table."""
    from pyspark.sql.window import Window

    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("from_type"))).cast("float").alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "stats_kaplan_meier",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, MIN(o_orderdate) AS t1 FROM orders GROUP BY o_custkey
    ),
    seconds AS (
      SELECT o.o_custkey, MIN(o.o_orderdate) AS t2
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      WHERE o.o_orderdate > f.t1
      GROUP BY o.o_custkey
    ),
    subj AS (
      SELECT f.o_custkey,
             CASE WHEN s.t2 IS NOT NULL
                  THEN date_diff('day', f.t1, s.t2)
                  ELSE date_diff('day', f.t1,
                                 (SELECT MAX(o_orderdate) FROM orders))
             END AS dur,
             CASE WHEN s.t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM firsts f LEFT JOIN seconds s ON f.o_custkey = s.o_custkey
    ),
    at_t AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM subj GROUP BY dur
    ),
    risk AS (
      SELECT dur, d,
             (SELECT COUNT(*) FROM subj)
               - (SUM(c) OVER (ORDER BY dur) - c) AS n_risk
      FROM at_t
    ),
    km AS (
      SELECT dur, d, CAST(n_risk AS BIGINT) AS n_risk,
             MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY dur) AS zeroed,
             SUM(CASE WHEN d = n_risk THEN 0.0
                      ELSE ln(1.0 - CAST(d AS DOUBLE) / n_risk) END)
               OVER (ORDER BY dur) AS logsum
      FROM risk WHERE d > 0
    )
    SELECT dur AS duration_days, n_risk, d AS n_events,
           CAST(CASE WHEN zeroed = 1 THEN 0.0 ELSE exp(logsum) END
                AS FLOAT) AS survival
    FROM km ORDER BY dur
    """,
    tags=("stats", "survival"),
)
def stats_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve for time-to-repeat-purchase: duration =
    days from a customer's first order to their second, right-CENSORED at
    the observation horizon for one-time customers — the estimator that
    naive 'average days to reorder' gets wrong by dropping censored users.
    S(t) = prod over event times <= t of (1 - d/n_risk).

    Determinism: d and n_risk are exact integers (n_risk from a reversed
    cumulative count, so censored subjects leave the risk set correctly);
    the product runs in log space with one identical IEEE expression per
    engine and lands at a FLOAT32 boundary (the repo's rule for
    transcendental chains). If an event ever exhausts the risk set, a
    running flag pins survival to exactly 0 from that time on instead of
    passing 0 to ln. Spark shape: orders reduce to a customer-sized
    relation (two grouped aggregates + one self-join on the first-order
    date), then everything runs on the duration-distinct relation — and
    the cumulatives over it (risk-set counts, zero-pin flag, log-product)
    run shard-parallel through ``operators/ranking.cumulative_below``
    (r3 verdict: distinct durations grow with the observation window, so
    no naked global window). The zero-pin MAX decomposes as
    cumulative-sum-of-indicator ≥ 1 — exact integers; the log-sum's
    shard-offset regrouping moves doubles by last-ulp at most, absorbed
    by the float32 output boundary exactly like the engines' own
    window-sum association differences."""
    orders = load(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("t1")
    )
    seconds = (
        orders.join(firsts, "o_custkey")
        .filter(F.col("o_orderdate") > F.col("t1"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("t2"))
    )
    maxd = orders.agg(F.max("o_orderdate").alias("mx"))
    subj = (
        firsts.join(seconds, "o_custkey", "left")
        .crossJoin(F.broadcast(maxd))
        .select(
            F.when(
                F.col("t2").isNotNull(), F.datediff("t2", "t1")
            )
            .otherwise(F.datediff("mx", "t1"))
            .alias("dur"),
            F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    tot = subj.agg(F.count(F.lit(1)).alias("n_subj"))
    at_t = subj.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    from crocus_spark.operators import ranking as R

    # n_risk = subjects with duration >= dur = n_subj - Σc over
    # strictly-smaller durations (shard-parallel cumulative)
    risk = R.cumulative_below(at_t, "dur", ["c"], n_shards=16).crossJoin(
        F.broadcast(tot)
    ).select(
        "dur", "d", (F.col("n_subj") - F.col("_cum_c")).alias("n_risk")
    )
    ev = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.when(F.col("d") == F.col("n_risk"), 1)
        .otherwise(0)
        .alias("zp"),
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0))
        .otherwise(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
        )
        .alias("lt"),
    )
    # inclusive cumulatives from the strictly-below helper: add the row's
    # own contribution; MAX-of-indicator == (inclusive Σ indicator) >= 1
    km = R.cumulative_below(ev, "dur", ["zp", "lt"], n_shards=16)
    return km.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.when(F.col("_cum_zp") + F.col("zp") >= 1, F.lit(0.0))
        .otherwise(F.exp(F.col("_cum_lt") + F.col("lt")))
        .cast("float")
        .alias("survival"),
    ).orderBy("duration_days")


@register(
    "analytics_dau_wau",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
      FROM user_days GROUP BY day
    ),
    cover AS (
      SELECT DISTINCT user_id, day + x AS wday
      FROM user_days,
           (VALUES (0),(1),(2),(3),(4),(5),(6)) AS t(x)
    ),
    wau AS (
      SELECT wday AS day, CAST(COUNT(*) AS BIGINT) AS wau
      FROM cover GROUP BY wday
    )
    SELECT d.day, d.dau, w.wau,
           CAST(CAST(d.dau AS DOUBLE) / w.wau AS FLOAT) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    ORDER BY d.day
    """,
    tags=("analytics", "engagement"),
)
def analytics_dau_wau(spark, sf_dir):
    """DAU / WAU / stickiness — the product-analytics vital signs: daily
    actives, 7-day rolling distinct actives, and their ratio. Rolling
    DISTINCT is the trap here: it doesn't decompose as a window aggregate.
    The scalable shape used: each (user, active-day) row COVERS the 7
    report days it contributes to (a 7-way generate + distinct), turning
    the rolling distinct into a plain grouped count — linear in user-days,
    fan-out bounded by the window length, no day×day rescan and no
    unbounded window state. The same shape handles MAU with a 28-day
    cover; at 100 TB the alternative is merging the portable HLL registers
    (`sketch_hll_portable`) per day — approximate but O(registers).

    Determinism: calendar arithmetic on DATEs and integer counts
    throughout; the one division rounds at 6."""
    user_days = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .distinct()
    )
    dau = user_days.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    cover = (
        user_days.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"),
            "day",
        )
        .select("user_id", F.date_add("day", F.col("x")).alias("wday"))
        .distinct()
    )
    wau = cover.groupBy(F.col("wday").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            (
                F.col("dau").cast("double") / F.col("wau")).cast("float").alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "attribution_linear_multitouch",
    oracle="""
    WITH tallied AS (
      SELECT event_type, ts, event_id, user_id,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_views,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_clicks
      FROM events
    ),
    purchases AS (
      SELECT COALESCE(prior_views, 0) AS pv, COALESCE(prior_clicks, 0) AS pc
      FROM tallied WHERE event_type = 'purchase'
    ),
    credits AS (
      SELECT 'view' AS channel,
             CAST(ROUND(CAST(pv AS DOUBLE) / (pv + pc) * 1000000) AS BIGINT)
               AS credit_q,
             CASE WHEN pv > 0 THEN 1 ELSE 0 END AS touched
      FROM purchases WHERE pv + pc > 0
      UNION ALL
      SELECT 'click',
             CAST(ROUND(CAST(pc AS DOUBLE) / (pv + pc) * 1000000) AS BIGINT),
             CASE WHEN pc > 0 THEN 1 ELSE 0 END
      FROM purchases WHERE pv + pc > 0
      UNION ALL
      SELECT 'direct', 1000000, 1 FROM purchases WHERE pv + pc = 0
    )
    SELECT channel,
           CAST(SUM(credit_q) AS DOUBLE) / 1000000 AS total_credit,
           CAST(SUM(touched) AS BIGINT) AS n_purchases_touched
    FROM credits GROUP BY channel ORDER BY channel
    """,
    tags=("analytics", "attribution"),
)
def attribution_linear_multitouch(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's unit of credit is
    split across the user's PRIOR view and click touches in proportion to
    their counts; touchless purchases credit a 'direct' channel — the
    equal-weight sibling of `attribution_last_touch`.

    Determinism: per-purchase fractional credits are quantized to scaled
    BIGINT (round(f*1e6)) BEFORE summation — fractions with heterogeneous
    denominators must never meet a float SUM (the repo rule), so channel
    totals are exact integer sums divided once at the end. Spark shape:
    prior-touch counts are running frames over the per-user session
    window (the one fact shuffle), purchases project to a tiny
    (pv, pc) relation, and the channel split is a 3-way generate on that
    relation — no event×event join anywhere."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tallied = load(spark, sf_dir, "events").select(
        "event_type",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w)
        .alias("prior_views"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .alias("prior_clicks"),
    )
    purchases = tallied.filter(F.col("event_type") == "purchase").select(
        F.coalesce("prior_views", F.lit(0)).alias("pv"),
        F.coalesce("prior_clicks", F.lit(0)).alias("pc"),
    )
    touched = purchases.filter(F.col("pv") + F.col("pc") > 0)

    def channel_credit(name, cnt):
        return touched.select(
            F.lit(name).alias("channel"),
            F.round(
                cnt.cast("double") / (F.col("pv") + F.col("pc")) * 1000000
            )
            .cast("long")
            .alias("credit_q"),
            F.when(cnt > 0, 1).otherwise(0).alias("touched"),
        )

    credits = (
        channel_credit("view", F.col("pv"))
        .unionByName(channel_credit("click", F.col("pc")))
        .unionByName(
            purchases.filter(F.col("pv") + F.col("pc") == 0).select(
                F.lit("direct").alias("channel"),
                F.lit(1000000).cast("long").alias("credit_q"),
                F.lit(1).alias("touched"),
            )
        )
    )
    return (
        credits.groupBy("channel")
        .agg(
            (F.sum("credit_q").cast("double") / 1000000).alias(
                "total_credit"
            ),
            F.sum("touched").cast("long").alias("n_purchases_touched"),
        )
        .orderBy("channel")
    )


@register(
    "window_longest_streak",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    islands AS (
      SELECT user_id,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INT) AS island
      FROM user_days
    ),
    streaks AS (
      SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS streak_len
      FROM islands GROUP BY user_id, island
    ),
    best AS (
      SELECT user_id, MAX(streak_len) AS longest FROM streaks
      GROUP BY user_id
    )
    SELECT longest AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM best GROUP BY longest ORDER BY longest
    """,
    tags=("window", "gaps-islands"),
)
def window_longest_streak(spark, sf_dir):
    """Longest consecutive-day activity streak per user, reported as a
    distribution — the engagement-streak metric, and the purest
    gaps-and-islands form: consecutive days share ``day - row_number``
    (a constant within each run), so streaks fall out of one grouped
    count with no self-join and no day-by-day loop.

    Spark shape: one per-user ordered window (same shuffle key as
    sessionization) then two map-side-combinable aggregates; state is
    O(1) per row. The date-minus-integer island key is DATE-typed
    arithmetic, identical in both engines."""
    from pyspark.sql.window import Window

    user_days = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .distinct()
    )
    islands = user_days.select(
        "user_id",
        F.date_sub(
            "day",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("day"))
            .cast("int"),
        ).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    best = streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest")
    )
    return (
        best.groupBy(F.col("longest").alias("streak_days"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("streak_days")
    )


@register(
    "window_skyline_frontier",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    ORDER BY p.p_retailprice, p.p_partkey
    """,
    tags=("window", "skyline"),
)
def window_skyline_frontier(spark, sf_dir):
    """Skyline (Pareto frontier) query: parts not dominated on the
    (minimize retail price, maximize size) plane — the multi-criteria
    shortlist operator (Börzsönyi et al., ICDE 2001). A part survives iff
    no other part is at-most-as-expensive AND at-least-as-big with one
    strict inequality; exact duplicates both survive.

    The ORACLE is the O(n²) NOT EXISTS self-join — the semantics.
    The SPARK plan is the O(n log n) sweep: group to per-price max sizes,
    a running max over the price-distinct relation gives each price the
    best size among STRICTLY cheaper parts, and a part is on the
    frontier iff it carries its price group's max size and beats that
    strictly-cheaper best. The running max is
    ``operators/ranking.running_max_global`` (range-shard + per-shard
    running max + broadcast prefix-max offsets — r3 verdict: prices are
    data-sized, a naked ``Window.orderBy`` would funnel them through one
    task at 100×). No self-join — the shape that survives when the
    oracle's nested loop cannot."""
    from crocus_spark.operators import ranking as R

    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    gmax = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("gmax_size")
    )
    strict_prev = R.running_max_global(
        gmax,
        ["p_retailprice"],
        "gmax_size",
        out_col="prev_best",
        n_shards=16,
        inclusive=False,
    )
    return (
        part.join(strict_prev, "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("gmax_size"))
            & (
                F.col("prev_best").isNull()
                | (F.col("p_size") > F.col("prev_best"))
            )
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


def _ols_selects() -> str:
    """Cramer's-rule solve of the 3×3 normal equations + fit stats, as ONE
    expression string shared by the Spark select and the DuckDB oracle —
    textual identity guarantees the same IEEE expression tree, so the
    doubles agree bit-for-bit before the 6-digit round."""
    det = (
        "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2))"
    )
    det0 = (
        "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
        " + s2 * (s1y * s12 - s11 * s2y))"
    )
    det1 = (
        "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2))"
    )
    det2 = (
        "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2))"
    )
    sse = f"(syy - ({det0} * sy + {det1} * s1y + {det2} * s2y) / {det})"
    sst = "(syy - sy * sy / n)"
    return [
        "n_rows",
        f"round({det0} / {det}, 6) AS intercept",
        f"round({det1} / {det}, 6) AS beta_quantity",
        f"round({det2} / {det}, 6) AS beta_retailprice",
        f"round(1.0 - {sse} / {sst}, 6) AS r2",
    ]


_OLS_DEC = "DECIMAL(38,6)"


@register(
    "ml_ols_normal_equations",
    oracle=f"""
    WITH sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS {_OLS_DEC})) AS DOUBLE) AS s1,
             CAST(SUM(CAST(p_retailprice AS {_OLS_DEC})) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_extendedprice AS {_OLS_DEC})) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS {_OLS_DEC}))
                  AS DOUBLE) AS s11,
             CAST(SUM(CAST(l_quantity * p_retailprice AS {_OLS_DEC}))
                  AS DOUBLE) AS s12,
             CAST(SUM(CAST(p_retailprice * p_retailprice AS {_OLS_DEC}))
                  AS DOUBLE) AS s22,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS {_OLS_DEC}))
                  AS DOUBLE) AS s1y,
             CAST(SUM(CAST(p_retailprice * l_extendedprice AS {_OLS_DEC}))
                  AS DOUBLE) AS s2y,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS {_OLS_DEC}))
                  AS DOUBLE) AS syy
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT {", ".join(_ols_selects())} FROM sums
    """,
    tags=("ml", "regression"),
)
def ml_ols_normal_equations(spark, sf_dir):
    """Multiple linear regression fit as pure dataflow: extended price
    regressed on quantity and part retail price, solved in closed form
    from the normal equations (X'X from ten exact-decimal power sums, one
    Cramer's-rule solve) — multivariate OLS beyond `agg_regr_battery`'s
    built-in simple regression, with R² derived from the same sums (no
    second residual pass).

    Determinism: per-row products are IEEE doubles quantized to
    DECIMAL(38,6) before summation (order-independent), and the solve is
    ONE expression string shared textually with the oracle. Spark shape:
    a broadcast dim join, one scan, one 10-value reduction — model
    fitting at the cost of an aggregate, the d²-sums pattern that scales
    to any row count (state is the Gram matrix, like
    `ml_pca_power_iteration`)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    j = li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
    dsum6 = lambda e, a: F.sum(e.cast(_OLS_DEC)).cast("double").alias(a)  # noqa: E731
    x1, x2, y = (
        F.col("l_quantity"),
        F.col("p_retailprice"),
        F.col("l_extendedprice"),
    )
    sums = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum6(x1, "s1"),
        dsum6(x2, "s2"),
        dsum6(y, "sy"),
        dsum6(x1 * x1, "s11"),
        dsum6(x1 * x2, "s12"),
        dsum6(x2 * x2, "s22"),
        dsum6(x1 * y, "s1y"),
        dsum6(x2 * y, "s2y"),
        dsum6(y * y, "syy"),
    )
    return sums.selectExpr(*_ols_selects())


@register(
    "series_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                             AS DOUBLE) * 100) AS BIGINT) AS xq
      FROM orders GROUP BY o_orderdate
    ),
    lagged AS (
      SELECT xq,
             LAG(xq, 1) OVER (ORDER BY day) AS y1,
             LAG(xq, 2) OVER (ORDER BY day) AS y2,
             LAG(xq, 3) OVER (ORDER BY day) AS y3,
             LAG(xq, 7) OVER (ORDER BY day) AS y7
      FROM daily
    ),
    long AS (
      SELECT 1 AS lag_k, xq, y1 AS yq FROM lagged WHERE y1 IS NOT NULL
      UNION ALL
      SELECT 2, xq, y2 FROM lagged WHERE y2 IS NOT NULL
      UNION ALL
      SELECT 3, xq, y3 FROM lagged WHERE y3 IS NOT NULL
      UNION ALL
      SELECT 7, xq, y7 FROM lagged WHERE y7 IS NOT NULL
    ),
    sums AS (
      SELECT lag_k,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(xq AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(yq AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xq AS DECIMAL(38,0)) * yq) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xq AS DECIMAL(38,0)) * xq) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(yq AS DECIMAL(38,0)) * yq) AS DOUBLE) AS syy
      FROM long GROUP BY lag_k
    )
    SELECT lag_k, CAST(n AS BIGINT) AS n_pairs,
           CAST((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS FLOAT) AS acf
    FROM sums ORDER BY lag_k
    """,
    tags=("analytics", "timeseries"),
)
def series_autocorrelation(spark, sf_dir):
    """Autocorrelation of the daily-revenue series at lags 1, 2, 3, 7 —
    the seasonality detector behind `series_seasonal_decompose`'s weekly
    assumption (a dominant lag-7 spike is the evidence). Each lag's ACF is
    Pearson over (x_t, x_{t-k}) pairs.

    Determinism: daily totals quantize ONCE to cent-integers (exact in
    both engines), the five power sums per lag accumulate in DECIMAL(38,0)
    (the quantize-then-integer-sum rule — BIGINT would overflow the
    squared sums past sf0.1), and one closed-form expression divides at
    the end, rounded at 6. Spark shape: one calendar-sized daily reduce,
    four LAG columns over ONE ordered window, stacked long and grouped —
    window state O(max lag), fact table shuffled once."""
    from pyspark.sql.window import Window

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double") * 100
            )
            .cast("long")
            .alias("xq")
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "xq",
        *[F.lag("xq", k).over(w).alias(f"y{k}") for k in (1, 2, 3, 7)],
    )
    long = None
    for k in (1, 2, 3, 7):
        part = lagged.filter(F.col(f"y{k}").isNotNull()).select(
            F.lit(k).alias("lag_k"),
            "xq",
            F.col(f"y{k}").alias("yq"),
        )
        long = part if long is None else long.unionByName(part)
    d38 = "decimal(38,0)"
    sums = long.groupBy("lag_k").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("xq").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("yq").cast(d38)).cast("double").alias("sy"),
        F.sum(F.col("xq").cast(d38) * F.col("yq")).cast("double").alias("sxy"),
        F.sum(F.col("xq").cast(d38) * F.col("xq")).cast("double").alias("sxx"),
        F.sum(F.col("yq").cast(d38) * F.col("yq")).cast("double").alias("syy"),
    )
    acf = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "lag_k",
        F.col("n").cast("long").alias("n_pairs"),
        (acf).cast("float").alias("acf"),
    ).orderBy("lag_k")


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH bm AS (
      SELECT event_type, user_id // 32 AS blk,
             bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
      FROM events GROUP BY event_type, user_id // 32
    ),
    bagg AS (
      SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_bitmap
      FROM bm GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT b.event_type, n_bitmap, n_exact,
           n_bitmap = n_exact AS bitmap_equals_exact
    FROM bagg b JOIN exact e ON b.event_type = e.event_type
    ORDER BY b.event_type
    """,
    tags=("agg", "bitmap"),
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via bitmap aggregation — the roaring-bitmap
    warehouse trick: users bucket into 32-bit blocks (user div 32 — shifts stay below the signed-BIGINT overflow DuckDB checks), each
    block OR-accumulates one bit per user, and the distinct count is the
    popcount sum. Unlike COUNT(DISTINCT) this state is MERGEABLE (OR is
    commutative/idempotent), so partial aggregation combines map-side and
    the shuffle carries (groups × occupied blocks) words instead of raw
    ids — the exact-answer middle ground between COUNT(DISTINCT)'s
    Expand and HLL's approximation. The oracle pins bitmap == exact per
    group.

    Both engines compute identical words: the shift is on the SAME
    non-negative id arithmetic, bit_or / bit_count are integer ops."""
    ev = load(spark, sf_dir, "events")
    bm = ev.groupBy(
        "event_type", F.expr("user_id div 32").alias("blk")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
        ).alias("bits")
    )
    bagg = bm.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_bitmap")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        bagg.join(exact, "event_type")
        .select(
            "event_type",
            "n_bitmap",
            "n_exact",
            (F.col("n_bitmap") == F.col("n_exact")).alias(
                "bitmap_equals_exact"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "series_rolling_beta",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(ROUND(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(o_totalprice AS DECIMAL(25,6))
                 ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE) * 100)
               AS BIGINT) AS yq,
             CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                             AS DOUBLE) * 100) AS BIGINT) AS xq
      FROM orders GROUP BY o_orderdate
    ),
    framed AS (
      SELECT day,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(COUNT(*) OVER w AS DOUBLE) AS n,
             CAST(SUM(CAST(xq AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(yq AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sy,
             CAST(SUM(CAST(xq AS DECIMAL(38,0)) * yq) OVER w AS DOUBLE)
               AS sxy,
             CAST(SUM(CAST(xq AS DECIMAL(38,0)) * xq) OVER w AS DOUBLE)
               AS sxx
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CAST((n * sxy - sx * sy)
                 / NULLIF(n * sxx - sx * sx, 0) AS FLOAT) AS beta_28d
    FROM framed WHERE t >= 28
    ORDER BY day
    """,
    tags=("analytics", "timeseries"),
)
def series_rolling_beta(spark, sf_dir):
    """Rolling 28-day regression beta of the urgent-order revenue series
    against total revenue — the quant-desk exposure statistic
    (`agg_regr_battery`'s slope, made a WINDOW): every day gets the OLS
    slope over its trailing 28 days.

    Determinism: the daily series quantizes once to cent integers, the
    four power sums run as DECIMAL(38,0) WINDOW aggregates (exact and
    order-independent inside the frame), and one closed-form divide per
    row rounds at 6 — NULLIF guards a zero-variance window. Spark shape:
    a calendar-sized daily reduce, then one ordered window with a
    bounded ROWS frame (state O(frame)); partial windows warm up for 27
    days and are excluded."""
    from pyspark.sql.window import Window

    dec = "decimal(25,6)"
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT",
                        F.col("o_totalprice").cast(dec),
                    ).otherwise(F.lit(0).cast(dec))
                ).cast("double")
                * 100
            )
            .cast("long")
            .alias("yq"),
            F.round(
                F.sum(F.col("o_totalprice").cast(dec)).cast("double") * 100
            )
            .cast("long")
            .alias("xq"),
        )
    )
    d38 = "decimal(38,0)"
    w = Window.orderBy("day").rowsBetween(-27, 0)
    framed = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum(F.col("xq").cast(d38)).over(w).cast("double").alias("sx"),
        F.sum(F.col("yq").cast(d38)).over(w).cast("double").alias("sy"),
        F.sum(F.col("xq").cast(d38) * F.col("yq"))
        .over(w)
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("xq").cast(d38) * F.col("xq"))
        .over(w)
        .cast("double")
        .alias("sxx"),
    )
    return (
        framed.filter(F.col("t") >= 28)
        .select(
            "day",
            (
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.nullif(
                    F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
                    F.lit(0.0),
                )).cast("float").alias("beta_28d"),
        )
        .orderBy("day")
    )


@register(
    "stats_quantile_normalize",
    oracle="""
    WITH a AS (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
             COUNT(*) OVER () AS n_a
      FROM orders WHERE o_orderstatus = 'F'
    ),
    b AS (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
      FROM orders WHERE o_orderstatus = 'O'
    ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b FROM b),
    mapped AS (
      SELECT a.v AS v_orig, b.v AS v_mapped,
             ((a.rk - 1) * 10) // a.n_a + 1 AS decile
      FROM a, nb
      JOIN b ON b.rk = (a.rk * nb.n_b + a.n_a - 1) // a.n_a
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(v_orig AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
             AS avg_orig,
           CAST(SUM(CAST(v_mapped AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
             AS avg_mapped
    FROM mapped GROUP BY decile ORDER BY decile
    """,
    tags=("stats", "normalization"),
)
def stats_quantile_normalize(spark, sf_dir):
    """Quantile normalization: every finished-order total is replaced by
    the open-order distribution's value at the SAME quantile — the
    batch-effect correction standard in bioinformatics (Bolstad et al.,
    Bioinformatics 2003) and the distribution-matching step feature
    pipelines use across cohorts of different sizes. Rank mapping is pure
    integer ceiling division (rank_a·n_b/n_a), ranks total-ordered by
    (value, key), so the mapping is deterministic; output is the
    per-decile before/after profile.

    Spark shape: two SHARD-OFFSET global ranks (``operators/ranking.
    ranked_global`` — range-shard on the value, per-shard row_numbers,
    broadcast offsets; no single-partition sort on either side) and one
    equi-join on the computed target rank — never a quantile lookup per
    row; the decile roll-up is 10 cells. The oracle keeps the textbook
    ROW_NUMBER windows, pinning the decomposition."""
    from crocus_spark.operators import ranking as R

    orders = load(spark, sf_dir, "orders")
    a = (
        R.ranked_global(
            orders.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_totalprice").alias("v"), "o_orderkey"
            ),
            ["v", "o_orderkey"],
            out_col="rk",
            n_shards=32,
        )
        .drop("o_orderkey")
        .crossJoin(
            F.broadcast(
                orders.filter(F.col("o_orderstatus") == "F").agg(
                    F.count(F.lit(1)).cast("long").alias("n_a")
                )
            )
        )
    )
    b = R.ranked_global(
        orders.filter(F.col("o_orderstatus") == "O").select(
            F.col("o_totalprice").alias("bv"), "o_orderkey"
        ),
        ["bv", "o_orderkey"],
        out_col="brk",
        n_shards=32,
    ).drop("o_orderkey")
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    mapped = (
        a.crossJoin(F.broadcast(nb))
        .join(
            b,
            F.col("brk")
            == F.expr("(rk * n_b + n_a - 1) div n_a"),
        )
        .select(
            F.col("v").alias("v_orig"),
            F.col("bv").alias("v_mapped"),
            (F.expr("((rk - 1) * 10) div n_a") + 1).alias("decile"),
        )
    )
    return (
        mapped.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(F.col("v_orig").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_orig"),
            (
                F.sum(F.col("v_mapped").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_mapped"),
        )
        .orderBy("decile")
    )


@register(
    "analytics_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('week', ts)::DATE) AS first_week
      FROM events GROUP BY user_id
    ),
    weekly AS (
      SELECT DISTINCT e.user_id,
             date_trunc('week', e.ts)::DATE AS week,
             f.first_week
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT week,
           CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN week > first_week THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users,
           CAST(CAST(SUM(CASE WHEN week > first_week THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) AS FLOAT) AS returning_share
    FROM weekly GROUP BY week ORDER BY week
    """,
    tags=("analytics", "growth"),
)
def analytics_new_vs_returning(spark, sf_dir):
    """Weekly new-vs-returning user split — the growth-accounting
    decomposition every product review opens with: actives partitioned
    by whether this is their first-ever week. Complements
    `cohort_retention` (which follows a cohort forward; this reads each
    week's composition) and `analytics_dau_wau` (volume, not identity).

    Spark shape: a user-sized first-seen dimension joined back on
    user_id (AQE broadcasts it when small), one distinct to user-weeks,
    one calendar-sized roll-up; integer counts and a single rounded
    division."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts").cast("date")).alias("first_week")
    )
    weekly = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("week"),
            "first_week",
        )
        .distinct()
    )
    new_c = F.sum(
        F.when(F.col("week") == F.col("first_week"), 1).otherwise(0)
    )
    ret_c = F.sum(
        F.when(F.col("week") > F.col("first_week"), 1).otherwise(0)
    )
    return (
        weekly.groupBy("week")
        .agg(
            new_c.cast("long").alias("new_users"),
            ret_c.cast("long").alias("returning_users"),
            (
                ret_c.cast("double") / F.count(F.lit(1))).cast("float").alias("returning_share"),
        )
        .orderBy("week")
    )


@register(
    "anomaly_mad_outlier_days",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS rev
      FROM orders GROUP BY o_orderdate
    ),
    ranked AS (
      SELECT day, rev,
             ROW_NUMBER() OVER (ORDER BY rev, day) AS rk,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    med2 AS (  -- 2x median, exact decimal (sum of the two middles)
      SELECT SUM(rev) AS m2
      FROM ranked WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
    ),
    dev AS (   -- adev2 = 2x absolute deviation, exact decimal
      SELECT day, rev,
             abs(2 * rev - (SELECT m2 FROM med2)) AS adev2
      FROM daily
    ),
    dev_ranked AS (
      SELECT day, adev2,
             ROW_NUMBER() OVER (ORDER BY adev2, day) AS rk,
             COUNT(*) OVER () AS n
      FROM dev
    ),
    mad4 AS (  -- 4x MAD, exact decimal
      SELECT SUM(adev2) AS m4
      FROM dev_ranked WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
    )
    SELECT day,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(adev2 AS DOUBLE) / 2 AS abs_deviation,
           CAST((SELECT m4 FROM mad4) AS DOUBLE) / 4 AS mad
    FROM dev
    WHERE adev2 > 3 * (SELECT m4 FROM mad4)
    ORDER BY day
    """,
    tags=("analytics", "anomaly"),
)
def anomaly_mad_outlier_days(spark, sf_dir):
    """Robust outlier days: daily revenues more than 6 MADs from the
    median — the `stats_robust_median_mad` statistics turned into a
    FLAG, immune to the outliers it hunts (a z-score screen inflates its
    own threshold; the median/MAD pair does not). Medians are carried at
    DOUBLED scale (sum of the two middle decimals — an engine AVG over
    decimals goes through float in DuckDB and stays decimal in Spark, so
    averages never appear), and the 6-MAD membership test is the
    cross-multiplied exact-decimal compare ``adev2 > 3*mad4`` (i.e.
    2·|dev| > 12·MAD ⇔ |dev| > 6·MAD — the r2 ADVICE fix: the previous
    ``2*adev2 > 3*mad4`` reduced to a 3-MAD cut); the
    only divisions are by powers of two at the output boundary (exact in
    IEEE).

    Spark shape: calendar-sized daily reduce, two rank windows over that
    relation, thresholds broadcast back; the fact table shuffles once."""
    from pyspark.sql.window import Window

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    )

    def doubled_median(df, col, tiebreak):
        ranked = df.select(
            F.col(col),
            F.row_number()
            .over(Window.orderBy(F.col(col), tiebreak))
            .alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        return ranked.filter(
            (F.col("rk") == F.expr("(n + 1) div 2"))
            | (F.col("rk") == F.expr("(n + 2) div 2"))
        ).agg(F.sum(col).alias("m"))

    med2 = doubled_median(daily, "rev", "day").select(
        F.col("m").alias("m2")
    )
    dev = daily.crossJoin(F.broadcast(med2)).select(
        "day",
        "rev",
        F.abs(2 * F.col("rev") - F.col("m2")).alias("adev2"),
    )
    mad4 = doubled_median(dev, "adev2", "day").select(
        F.col("m").alias("m4")
    )
    return (
        dev.crossJoin(F.broadcast(mad4))
        .filter(F.col("adev2") > 3 * F.col("m4"))
        .select(
            "day",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("adev2").cast("double") / 2).alias("abs_deviation"),
            (F.col("m4").cast("double") / 4).alias("mad"),
        )
        .orderBy("day")
    )


@register(
    "series_theil_sen_slope",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                  AS BIGINT) AS t,
             CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                             AS DOUBLE) * 100) AS BIGINT) AS yq
      FROM orders GROUP BY o_orderdate
    ),
    slopes AS (
      SELECT a.t AS t1, b.t AS t2,
             CAST(b.yq - a.yq AS DOUBLE) / (b.t - a.t) AS s
      FROM daily a JOIN daily b ON a.t < b.t
    ),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, t1, t2) AS rk,
             COUNT(*) OVER () AS n
      FROM slopes
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(SUM(s) / 2 AS FLOAT) AS theil_sen_slope_cents_per_day
    FROM ranked WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
    """,
    tags=("stats", "timeseries", "robust"),
)
def series_theil_sen_slope(spark, sf_dir):
    """Theil-Sen estimator: the MEDIAN of all pairwise slopes of the
    daily-revenue series — the robust trend line (29% breakdown point)
    where OLS bends to a single outlier day; the nonparametric
    counterpart of `agg_regr_battery`'s slope. Each slope is an exact
    integer ratio (cent-quantized revenue over integer day gaps —
    identical IEEE division in both engines); the median is a rank pick
    ordered by (slope, pair), summing the two middles and halving once
    (even/odd handled by the same two-index rule).

    Spark shape: the calendar-sized daily relation self-joins to ~n²/2
    pairs (≈600k at sf0.1 — fine; at larger calendars the standard swap
    is the repeated-median or a seeded pair sample, same downstream
    plan). The median picks need NO global rank over the pair relation:
    pairs range-shard by slope (``operators/ranking.with_range_shard``),
    per-shard counts locate which 1-2 shards hold the middle ranks, and
    ONLY those shards are sorted (partitioned window) — the rest of the
    pair relation is counted, never ordered. Coinciding middle ranks
    pick one row, matching the oracle's ``rk IN`` semantics exactly.
    The oracle keeps the textbook row_number window."""
    from crocus_spark.operators import ranking as R

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double") * 100
            )
            .cast("long")
            .alias("yq")
        )
        .select(
            F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("t"),
            "yq",
        )
    )
    nsh = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # EXPLICIT repartition on the probe side: the daily relation is a
    # few KB, so AQE coalesces the groupBy output to ONE partition and
    # the n²/2 pair fan-out (which happens AFTER the exchange, invisible
    # to AQE's size estimate) would run single-threaded — and twice,
    # because repartitionByRange's boundary sampling is a second
    # evaluation. Left-side partitions drive the broadcast-NLJ fan-out.
    a = daily.repartition(nsh).select(
        F.col("t").alias("t1"), F.col("yq").alias("y1")
    )
    b = daily.select(F.col("t").alias("t2"), F.col("yq").alias("y2"))
    slopes = (
        a.join(b, F.col("t1") < F.col("t2"))
        .select(
            "t1",
            "t2",
            (
                (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("t2") - F.col("t1"))
            ).alias("s"),
        )
    )
    sharded = R.with_range_shard(slopes, "s", 32)
    counts = sharded.groupBy("_shard").agg(F.count(F.lit(1)).alias("_sn"))
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤ 32 rows — metadata-sized
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_sn").over(w_off), F.lit(0))
    )
    tot = counts.agg(F.sum("_sn").cast("long").alias("n"))
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("(n + 2) div 2")
    hits = lambda rk: (rk > F.col("_off")) & (  # noqa: E731
        rk <= F.col("_off") + F.col("_sn")
    )
    # only the 1-2 shards containing the middle ranks are ever sorted —
    # the rest of the pair relation is counted, never ordered
    cand_shards = (
        offsets.crossJoin(F.broadcast(tot))
        .filter(hits(lo) | hits(hi))
        .select("_shard", "_off", "n")
    )
    w_in = Window.partitionBy("_shard").orderBy("s", "t1", "t2")
    picked = (
        sharded.join(F.broadcast(cand_shards), "_shard")
        .withColumn("_r", F.row_number().over(w_in) + F.col("_off"))
        .filter((F.col("_r") == lo) | (F.col("_r") == hi))
    )
    return picked.agg(
        F.max("n").cast("long").alias("n_pairs"),
        (F.sum("s") / 2).cast("float").alias(
            "theil_sen_slope_cents_per_day"
        ),
    )


@register(
    "analytics_bounce_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS sess_id
      FROM seq
    ),
    numbered AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sess_id
                                   ORDER BY ts, event_id) AS rn
      FROM sessions
    ),
    per_session AS (
      SELECT user_id, sess_id,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM numbered GROUP BY user_id, sess_id
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounced,
           CAST(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) AS FLOAT) AS bounce_rate
    FROM per_session GROUP BY entry_type ORDER BY entry_type
    """,
    tags=("analytics", "session"),
)
def analytics_bounce_rate(spark, sf_dir):
    """Bounce rate by session entry type: the share of 30-minute-gap
    sessions that contain exactly one event, split by what the session
    STARTED with — the engagement-quality readout `window_sessionize`'s
    islands make a one-aggregate question. The entry event is the
    (ts, event_id)-first row per session, picked by a rank-1 flag
    (DuckDB's MIN_BY rejects struct keys, so the argmin is a window).

    Spark shape: the standard gap-flag → running-sum sessionization (one
    user-key shuffle), then a session-sized aggregate and a 3-cell
    roll-up; integer counts, one rounded division."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = seq.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    numbered = sessions.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "sess_id").orderBy(
                "ts", "event_id"
            )
        ),
    )
    per_session = numbered.groupBy("user_id", "sess_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    bounced = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            bounced.cast("long").alias("n_bounced"),
            (
                bounced.cast("double") / F.count(F.lit(1))).cast("float").alias("bounce_rate"),
        )
        .orderBy("entry_type")
    )


@register(
    "stats_jackknife_se",
    oracle="""
    WITH tagged AS (
      SELECT date_trunc('month', o_orderdate)::DATE AS month,
             CAST(o_totalprice AS DECIMAL(25,6)) AS v
      FROM orders
    ),
    months AS (
      SELECT month, CAST(COUNT(*) AS BIGINT) AS n_m, SUM(v) AS s_m
      FROM tagged GROUP BY month
    ),
    tot AS (
      SELECT CAST(SUM(n_m) AS BIGINT) AS n, SUM(s_m) AS s,
             CAST(COUNT(*) AS BIGINT) AS g
      FROM months
    ),
    loo AS (  -- leave-one-month-out means, exact until one division
      SELECT m.month,
             CAST(t.s - m.s_m AS DOUBLE) / (t.n - m.n_m) AS theta_i
      FROM months m, tot t
    ),
    jk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS g,
             CAST(SUM(CAST(ROUND(theta_i * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 / COUNT(*) AS theta_bar,
             SUM(CAST(ROUND(theta_i * 1000000) AS BIGINT)) AS sq_sum_q
      FROM loo
    )
    SELECT t.g AS n_groups,
           CAST(CAST(t.s AS DOUBLE) / t.n AS FLOAT) AS mean_price,
           CAST(sqrt(
             (CAST(t.g - 1 AS DOUBLE) / t.g)
             * (SELECT CAST(SUM(
                  (CAST(ROUND(theta_i * 1000000) AS BIGINT) / 1000000.0
                   - jk.theta_bar)
                  * (CAST(ROUND(theta_i * 1000000) AS BIGINT) / 1000000.0
                     - jk.theta_bar)) AS DOUBLE)
                FROM loo)
           ) AS FLOAT) AS jackknife_se
    FROM tot t, jk
    """,
    tags=("stats", "resampling"),
)
def stats_jackknife_se(spark, sf_dir):
    """Delete-one-GROUP jackknife standard error of the mean order total,
    grouped by month — the deterministic resampling CI (Tukey's
    jackknife; the grouped form survey statistics uses) where a bootstrap
    would need engine RNG. Each leave-one-month-out mean is exact decimal
    arithmetic until a single division; replicate means are then
    QUANTIZED to scaled micros so the squared-deviation sum never floats
    freely (the repo's rule), and SE = sqrt((g-1)/g * Σ(θᵢ - θ̄)²).

    Spark shape: the corpus collapses to a months-sized relation in ONE
    aggregate; all g replicates derive from (total - month) arithmetic on
    that relation — the corpus is NEVER rescanned per replicate, which is
    what makes jackknife resampling an O(groups) query at 100 TB."""
    dec = "decimal(25,6)"
    months = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_m"),
            F.sum(F.col("o_totalprice").cast(dec)).alias("s_m"),
        )
    )
    tot = months.agg(
        F.sum("n_m").cast("long").alias("n"),
        F.sum("s_m").alias("s"),
        F.count(F.lit(1)).cast("long").alias("g"),
    )
    loo = months.crossJoin(F.broadcast(tot)).select(
        "month",
        "n",
        "s",
        "g",
        (
            (F.col("s") - F.col("s_m")).cast("double")
            / (F.col("n") - F.col("n_m"))
        ).alias("theta_i"),
    )
    quant = F.round(F.col("theta_i") * 1000000).cast("long")
    jk = loo.agg(
        F.max("g").alias("g"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        (
            F.sum(quant).cast("double") / 1000000 / F.count(F.lit(1))
        ).alias("theta_bar"),
    )
    dev = (
        loo.crossJoin(
            F.broadcast(jk.select(F.col("theta_bar").alias("tb")))
        )
        .select(
            (
                (quant / 1000000.0 - F.col("tb"))
                * (quant / 1000000.0 - F.col("tb"))
            ).alias("sq")
        )
        .agg(F.sum("sq").cast("double").alias("ssq"))
    )
    return (
        jk.crossJoin(F.broadcast(dev))
        .select(
            F.col("g").alias("n_groups"),
            (F.col("s").cast("double") / F.col("n")).cast("float").alias(
                "mean_price"
            ),
            (
                F.sqrt(
                    (F.col("g") - 1).cast("double")
                    / F.col("g")
                    * F.col("ssq")
                )).cast("float").alias("jackknife_se"),
        )
    )


def _cross_bucket_sql() -> str:
    from crocus_spark.queries.llm import _hash60_sql

    return (
        "("
        + _hash60_sql("c_mktsegment || '#' || o_orderpriority")
        + ") % 64"
    )


@register(
    "ml_hashed_feature_cross",
    oracle=f"""
    WITH joined AS (
      SELECT c_mktsegment, o_orderpriority,
             {_cross_bucket_sql()} AS bucket
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    per_bucket AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT c_mktsegment || '#' || o_orderpriority)
                  AS BIGINT) AS n_pairs
      FROM joined GROUP BY bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n_pairs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_collision_buckets,
           CAST(SUM(CASE WHEN n_pairs > 1 THEN n_rows ELSE 0 END)
                AS BIGINT) AS n_rows_in_collisions,
           CAST(MAX(n_pairs) AS BIGINT) AS max_pairs_per_bucket
    FROM per_bucket
    """,
    tags=("ml", "features"),
)
def ml_hashed_feature_cross(spark, sf_dir):
    """Hashed feature cross (the 'hashing trick', Weinberger et al.
    ICML'09): segment × priority crossed into 64 hash buckets — the
    fixed-width encoding that makes categorical crosses model-ready
    without a fitted vocabulary, at the price of collisions. The output
    is the collision audit: buckets used, buckets carrying more than one
    true pair, and the rows affected — the report that decides whether
    64 buckets suffice (25 true pairs here, so the birthday math predicts
    a few collisions; both engines agree bit-for-bit because the bucket
    hash is the portable md5).

    Spark shape: the cross is a scan-fused projection on the broadcast
    dim join; the audit is two grouped aggregates over at most 64
    cells."""
    from crocus_spark.operators import dedup as D

    joined = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.concat(
                F.col("c_mktsegment"), F.lit("#"), F.col("o_orderpriority")
            ).alias("pair"),
        )
        .select(
            "pair",
            (D.portable_hash60(F.col("pair")) % 64).alias("bucket"),
        )
    )
    per_bucket = joined.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("pair").cast("long").alias("n_pairs"),
    )
    return per_bucket.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("n_pairs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_collision_buckets"),
        F.sum(F.when(F.col("n_pairs") > 1, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_rows_in_collisions"),
        F.max("n_pairs").cast("long").alias("max_pairs_per_bucket"),
    )


def _split_flag_sql() -> str:
    from crocus_spark.queries.llm import _hash60_sql

    key = "'split:' || CAST(date_diff('day', DATE '1970-01-01', day) AS VARCHAR)"
    return "(" + _hash60_sql(key) + ") % 97 = 0"


@register(
    "series_split_adjustment",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS px
      FROM orders GROUP BY o_orderdate
    ),
    flagged AS (
      SELECT day, px,
             CASE WHEN {_split_flag_sql()} THEN 1 ELSE 0 END AS is_split
      FROM daily
    ),
    adj AS (
      SELECT day, px, is_split,
             SUM(is_split) OVER (ORDER BY day
                                 ROWS BETWEEN 1 FOLLOWING
                                 AND UNBOUNDED FOLLOWING) AS n_splits_after
      FROM flagged
    )
    SELECT day,
           CAST(px AS DOUBLE) AS raw_price,
           CAST(COALESCE(n_splits_after, 0) AS BIGINT) AS n_splits_after,
           CAST(px AS DOUBLE)
             / (1::BIGINT << CAST(COALESCE(n_splits_after, 0) AS INT))
             AS adjusted_price
    FROM adj
    WHERE is_split = 1 OR COALESCE(n_splits_after, 0) > 0
    ORDER BY day
    """,
    tags=("analytics", "timeseries", "finance"),
)
def series_split_adjustment(spark, sf_dir):
    """Split-adjusted price series — the corporate-actions back-adjustment
    every price history needs: each 2:1 split halves all PRIOR raw prices
    so the series is continuous in adjusted terms. Split days are
    hash-chosen (~1% of days, deterministic in both engines) and the
    adjustment factor is 2^(splits after the day) — an INTEGER power of
    two, so the divided doubles are exact (exponent arithmetic only), no
    log-space product and no float drift anywhere. Output: affected days
    with raw vs adjusted prices.

    Spark shape: calendar-sized daily reduce, one reverse-frame running
    count (1 FOLLOWING → UNBOUNDED — the back-adjustment direction), one
    shift-left division; state O(1) per row."""
    from pyspark.sql.window import Window

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("px"))
    )
    from crocus_spark.operators import dedup as D

    flag = (
        D.portable_hash60(
            F.concat(
                F.lit("split:"),
                F.datediff("day", F.lit("1970-01-01").cast("date")).cast(
                    "string"
                ),
            )
        )
        % 97
        == 0
    )
    flagged = daily.select(
        "day", "px", F.when(flag, 1).otherwise(0).alias("is_split")
    )
    w_after = Window.orderBy("day").rowsBetween(
        1, Window.unboundedFollowing
    )
    adj = flagged.select(
        "day",
        "px",
        "is_split",
        F.coalesce(F.sum("is_split").over(w_after), F.lit(0)).alias(
            "n_splits_after"
        ),
    )
    return (
        adj.filter((F.col("is_split") == 1) | (F.col("n_splits_after") > 0))
        .select(
            "day",
            F.col("px").cast("double").alias("raw_price"),
            F.col("n_splits_after").cast("long").alias("n_splits_after"),
            (
                F.col("px").cast("double")
                / F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(n_splits_after AS INT))"
                )
            ).alias("adjusted_price"),
        )
        .orderBy("day")
    )


@register(
    "stats_fdr_benjamini_hochberg",
    oracle="""
    WITH per_nation AS (
      SELECT n_name,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_i
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
    ),
    scored AS (
      SELECT n_name, n_i, r_i,
             ((CAST(r_i AS DOUBLE) / CAST(n_i AS DOUBLE))
               - (CAST(SUM(r_i) OVER () AS DOUBLE)
                  / CAST(SUM(n_i) OVER () AS DOUBLE))) AS d,
             (CAST(SUM(r_i) OVER () AS DOUBLE)
              / CAST(SUM(n_i) OVER () AS DOUBLE)) AS p0
      FROM per_nation
    ),
    z AS (
      SELECT n_name, n_i, r_i,
             ((d * d) * CAST(n_i AS DOUBLE)) / (p0 * (1.0 - p0)) AS z2
      FROM scored
    ),
    ranked AS (
      SELECT n_name, n_i, r_i, z2,
             1.0 / (1.0 + z2) AS p_raw,
             CAST(ROW_NUMBER() OVER (ORDER BY z2 DESC, n_name)
                  AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM z
    ),
    adjusted AS (
      SELECT n_name, n_i, r_i, z2, p_raw, i, m,
             LEAST(1.0, MIN((p_raw * CAST(m AS DOUBLE))
                            / CAST(i AS DOUBLE)) OVER (
               ORDER BY i DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             )) AS padj
      FROM ranked
    )
    SELECT n_name, n_i, r_i,
           CAST(z2 AS FLOAT) AS z2,
           CAST(p_raw AS FLOAT) AS p_cantelli,
           i AS bh_rank, m AS m_tests,
           CAST(padj AS FLOAT) AS p_adjusted,
           (padj <= 0.05) AS reject_05
    FROM adjusted
    ORDER BY bh_rank
    """,
    tags=("stats", "fdr", "multiple-testing"),
)
def stats_fdr_benjamini_hochberg(spark, sf_dir):
    """Benjamini-Hochberg FDR step-up over the per-nation return-rate
    tests — the many-hypothesis sibling of the drift monitors
    (dq_distribution_drift, dq_psi_stability): when a screen runs one
    test PER KEY (here: is a nation's return rate off the global
    rate?), raw per-test thresholds multiply false alarms, and BH is
    the standard correction (Benjamini & Hochberg 1995, JRSS-B).

    Per-test p-value: the one-sided Cantelli bound p = 1/(1+z^2) with
    z^2 = (p_i - p0)^2 * n_i / (p0 (1-p0)) — a distribution-free VALID
    p-value bound (Cantelli's inequality) chosen deliberately over a
    normal-CDF p because it is a pure rational function of exact
    integer counts: every arithmetic step is an IEEE-754 basic op
    (+,-,*,/), which both engines round identically, so the full
    pipeline — scores, ranks, the m/i re-scaling, the reverse
    cumulative min — is bit-exact cross-engine with NO transcendental
    calls and NO quantization step. BH adjusted p is the standard
    monotone form padj_(i) = min_{j>=i}(p_(j) * m / j) capped at 1;
    reject at level alpha iff padj <= alpha (equivalent to the
    classic max-k step-up rule).

    Spark shape at 100 TB: the fact joins collapse to ONE partial+final
    aggregate over the scan (25 rows out — nation-bounded); everything
    after is window math over that 25-row relation, so the
    SinglePartition exchange the plan detector sees is dimension-sized
    by construction (allowlisted with that justification). Reference
    hook: the daily-snapshot 'confront' loop (reference README.md:3-8)
    is exactly a per-key screen re-run every day — at fleet scale it
    needs an FDR guard, not 25 independent alpha=0.05 tests."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    na = load(spark, sf_dir, "nation")
    per = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).cast("long").alias("r_i"),
        )
    )
    w_all = Window.partitionBy()
    p0 = F.sum("r_i").over(w_all).cast("double") / F.sum("n_i").over(
        w_all
    ).cast("double")
    d = (F.col("r_i").cast("double") / F.col("n_i").cast("double")) - p0
    scored = per.select("n_name", "n_i", "r_i", d.alias("d"), p0.alias("p0"))
    z2 = ((F.col("d") * F.col("d")) * F.col("n_i").cast("double")) / (
        F.col("p0") * (F.lit(1.0) - F.col("p0"))
    )
    zrel = scored.select("n_name", "n_i", "r_i", z2.alias("z2"))
    w_rank = Window.orderBy(F.col("z2").desc(), F.col("n_name"))
    ranked = zrel.select(
        "n_name",
        "n_i",
        "r_i",
        "z2",
        (F.lit(1.0) / (F.lit(1.0) + F.col("z2"))).alias("p_raw"),
        F.row_number().over(w_rank).cast("long").alias("i"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("m"),
    )
    w_rev = Window.orderBy(F.col("i").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pm = (F.col("p_raw") * F.col("m").cast("double")) / F.col("i").cast(
        "double"
    )
    padj = F.least(F.lit(1.0), F.min(pm).over(w_rev))
    return (
        ranked.withColumn("padj", padj)
        .select(
            "n_name",
            "n_i",
            "r_i",
            F.col("z2").cast("float").alias("z2"),
            F.col("p_raw").cast("float").alias("p_cantelli"),
            F.col("i").alias("bh_rank"),
            F.col("m").alias("m_tests"),
            F.col("padj").cast("float").alias("p_adjusted"),
            (F.col("padj") <= 0.05).alias("reject_05"),
        )
        .orderBy("bh_rank")
    )


@register(
    "series_holt_linear_smooth",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days
      FROM daily
    ), rec AS (
      -- rec(i=1) is the PRE-fold seed (s, b) = (x0, x1 - x0); the step
      -- i -> i+1 consumes x_i's successor, so the recursion replays the
      -- engine fold's IEEE steps row by row from the same seed
      SELECT a.event_type, CAST(1 AS BIGINT) AS i, a.x AS s, b.x - a.x AS b
      FROM idx a JOIN idx b
        ON b.event_type = a.event_type AND b.i = 2
      WHERE a.i = 1
      UNION ALL
      SELECT r.event_type, r.i + 1,
             0.5 * n.x + 0.5 * (r.s + r.b),
             0.25 * ((0.5 * n.x + 0.5 * (r.s + r.b)) - r.s) + 0.75 * r.b
      FROM rec r JOIN idx n
        ON n.event_type = r.event_type AND n.i = r.i + 1
    )
    SELECT r.event_type, i.n_days AS n_days,
           CAST(r.s AS FLOAT) AS level,
           CAST(r.b AS FLOAT) AS trend,
           CAST(r.s + r.b AS FLOAT) AS forecast_1
    FROM rec r
    JOIN (SELECT event_type, MAX(n_days) AS n_days FROM idx GROUP BY event_type) i
      ON i.event_type = r.event_type AND r.i = i.n_days
    ORDER BY r.event_type
    """,
    tags=("analytics", "series", "forecast"),
)
def series_holt_linear_smooth(spark, sf_dir):
    """Holt's LINEAR-TREND double exponential smoothing (the classic
    short-horizon forecaster; Holt 1957 / Hyndman-Athanasopoulos FPP
    §8.2) over each event type's daily total series — the recurrence
      s_t = α·x_t + (1−α)(s_{t−1} + b_{t−1})
      b_t = γ(s_t − s_{t−1}) + (1−γ)·b_{t−1}
    seeded (s₀ = x₀, b₀ = x₁ − x₀), with one-step forecast s + b.
    Unlike the window-expressible single EWMA (`series_ewma_smooth`),
    the coupled level/trend state cannot unroll into lag taps — it is a
    genuine ORDERED FOLD, run as `F.aggregate` (JVM higher-order
    function, struct accumulator) over each series' day-sorted value
    array: per-series state is 2 doubles, the fold is codegen'd, and
    the only shuffle is the daily pre-aggregate — at 100 TB the fold
    input is the calendar-sized daily relation, never raw events.

    Determinism: α = 0.5 and γ = 0.25 are exact binary fractions, the
    daily inputs are decimal-quantized sums cast to double, and DuckDB
    replays the identical IEEE fold via `list_reduce` over the same
    ordered list — bit-identical, with the float32 boundary cast
    absorbing nothing (the doubles already agree; the cast is the
    repo's output-boundary convention for derived IEEE expressions)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("x")
        )
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda e: e["x"],
        ).alias("xs")
    )
    init = F.struct(
        F.col("xs")[0].alias("s"),
        (F.col("xs")[1] - F.col("xs")[0]).alias("b"),
    )
    lvl = lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * (  # noqa: E731
        acc["s"] + acc["b"]
    )
    folded = series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        F.aggregate(
            F.slice(F.col("xs"), 2, F.size("xs") - 1),
            init,
            lambda acc, x: F.struct(
                lvl(acc, x).alias("s"),
                (
                    F.lit(0.25) * (lvl(acc, x) - acc["s"])
                    + F.lit(0.75) * acc["b"]
                ).alias("b"),
            ),
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("st.s").cast("float").alias("level"),
        F.col("st.b").cast("float").alias("trend"),
        (F.col("st.s") + F.col("st.b")).cast("float").alias("forecast_1"),
    ).orderBy("event_type")
