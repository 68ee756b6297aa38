"""Window-function battery — SURVEY.md §2B rows 27-30.

The reference's dedup semantics (dict overwrite, crocus U1/U2) and its
argmax (AGG1) are both window queries in disguise; the implied time-series
workload (day-over-day price change, rolling TER) needs the analytic set.
Window aggregates over doubles use the decimal-cast rule from ``_det`` so
frame sums are order-independent and oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crocus_spark.io import load
from crocus_spark.queries import register
from crocus_spark.queries._det import DEC


@register(
    "window_rank_battery",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    tags=("window",),
)
def window_rank_battery(spark, sf_dir):
    """All four ranking functions over one partitioned window (§2B#27).
    The c_custkey tiebreak makes row_number/ntile deterministic."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_lag_lead",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderdate
    )
    SELECT day, total,
           lag(total) OVER w AS prev_total,
           lead(total) OVER w AS next_total,
           CAST(total - lag(total) OVER w AS FLOAT) AS delta
    FROM daily
    WINDOW w AS (ORDER BY day)
    ORDER BY day
    """,
    tags=("window", "timeseries"),
)
def window_lag_lead(spark, sf_dir):
    """Day-over-day deltas via lag/lead (§2B#28) — the engine analog of
    comparing consecutive crocus daily snapshots. Aggregate-first shrinks the
    window input to one row per day; the single unpartitioned window then
    runs on a dimension-sized frame, not the fact table."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total")
    )
    w = Window.orderBy("day")
    return (
        daily.select(
            "day",
            "total",
            F.lag("total").over(w).alias("prev_total"),
            F.lead("total").over(w).alias("next_total"),
            (F.col("total") - F.lag("total").over(w)).cast("float").alias("delta"),
        )
        .orderBy("day")
    )


@register(
    "window_moving_frame",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderdate
    )
    SELECT day, total,
           CAST(SUM(CAST(total AS DECIMAL(25,6)))
                OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_7d,
           CAST(SUM(CAST(total AS DECIMAL(25,6)))
                OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS n_7d
    FROM daily
    ORDER BY day
    """,
    tags=("window", "timeseries"),
)
def window_moving_frame(spark, sf_dir):
    """Moving 7-row sum + running cumulative total (§2B#29) — rolling
    revenue over the snapshot time-series. Frame sums go through decimal so
    sliding-frame accumulation matches the oracle exactly."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "day",
            "total",
            F.sum(F.col("total").cast(DEC)).over(w7).cast("double").alias("sum_7d"),
            F.sum(F.col("total").cast(DEC)).over(wrun).cast("double").alias(
                "running_total"
            ),
            F.count(F.lit(1)).over(w7).alias("n_7d"),
        )
        .orderBy("day")
    )


@register(
    "window_first_last",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           first_value(l_shipdate) OVER w AS first_ship,
           last_value(l_shipdate) OVER
             (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_ship
    FROM lineitem
    WHERE l_orderkey < 100
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber)
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("window",),
)
def window_first_last(spark, sf_dir):
    """first/last over an order's shipments (§2B#28). last_value needs the
    full-frame spec — the default frame stops at CURRENT ROW, a classic
    SQL footgun the engine pins explicitly."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    wo = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    wfull = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.first("l_shipdate").over(wo).alias("first_ship"),
            F.last("l_shipdate").over(wfull).alias("last_ship"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "window_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM ranked WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window", "headline"),
)
def window_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer (§2B#30 — crocus AGG1 generalized; 'top
    holdings per fund'). Spark rewrites rn<=k into a per-partition top-k
    (WindowGroupLimit) — no full sort of each group at scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           COUNT(*) OVER (ORDER BY s_acctbal
                          RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW)
             AS peers_within_500
    FROM supplier
    ORDER BY s_acctbal, s_suppkey
    """,
    tags=("window",),
)
def window_range_frame(spark, sf_dir):
    """RANGE frame on a numeric key (§2B#29): peers within a 500.0 balance
    band — value-based frames vs the row-based frames above.

    A naive ``Window.orderBy("s_acctbal").rangeBetween(-500, 0)`` compiles
    to ``Exchange SinglePartition → Sort → Window`` over the WHOLE
    supplier relation (10k·sf rows — grows with scale; the r4 verdict's
    one remaining single-task funnel). The value-based frame decomposes
    exactly over the value-frequency relation instead:

        peers_within_500(x) = cnt(v ≤ x) − cnt(v < x − 500)

    Both terms come from ONE shard-parallel ``running_global`` pass over
    the union of (value, freq) rows and zero-weight query points at
    x − 500: ordering by (point, is_value) puts each query point BEFORE
    any value row at exactly x − 500, so its inclusive running sum is
    the strict cnt(v < x − 500), while each value row's inclusive
    running sum is cnt(v ≤ v) — query points carry weight 0 and can
    never contaminate value cumulatives. The arithmetic is exact:
    s_acctbal is decimal(15,2), x − 500 stays decimal, frequencies
    cumulate as longs. The per-row result then fans back over the
    distinct-values-sized band relation (AQE broadcasts it). Plan-gated
    in GLOBAL_RANK_FAMILY — no Exchange SinglePartition anywhere."""
    from crocus_spark.operators.ranking import running_global

    s = load(spark, sf_dir, "supplier")
    vf = s.groupBy("s_acctbal").agg(F.count(F.lit(1)).alias("_n"))
    vals = vf.select(
        F.col("s_acctbal").alias("_pt"),
        F.col("_n").alias("_w"),
        F.lit(1).alias("_isv"),
        F.col("s_acctbal").alias("_qx"),
    )
    qpts = vf.select(
        (F.col("s_acctbal") - F.lit(500)).alias("_pt"),
        F.lit(0).cast("long").alias("_w"),
        F.lit(0).alias("_isv"),
        F.col("s_acctbal").alias("_qx"),
    )
    ev = running_global(
        vals.unionByName(qpts), ["_pt", "_isv"], "_w", out_col="_run"
    )
    cum_le = ev.filter(F.col("_isv") == 1).select(
        F.col("_qx").alias("s_acctbal"), F.col("_run").alias("_cle")
    )
    cnt_lt = ev.filter(F.col("_isv") == 0).select(
        F.col("_qx").alias("s_acctbal"), F.col("_run").alias("_clt")
    )
    band = cum_le.join(cnt_lt, "s_acctbal").select(
        "s_acctbal",
        (F.col("_cle") - F.col("_clt"))
        .cast("long")
        .alias("peers_within_500"),
    )
    return (
        s.select("s_suppkey", "s_acctbal")
        .join(band, "s_acctbal")
        .select("s_suppkey", "s_acctbal", "peers_within_500")
        .orderBy("s_acctbal", "s_suppkey")
    )


@register(
    "scd2_event_type_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS version
      FROM ordered
    ), hist AS (
      SELECT user_id, version, event_type,
             MIN(ts) AS vf, COUNT(*) AS n_events
      FROM islands GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type,
           strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY version),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           n_events
    FROM hist
    ORDER BY user_id, version
    """,
    tags=("window", "scd", "cdc"),
)
def scd2_event_type_history(spark, sf_dir):
    """SCD2 change history (gaps-and-islands): collapse each user's event
    stream into validity intervals — one row per consecutive run of the
    same event_type, with valid_from/valid_to and the run length. This is
    the change-capture query the reference's daily snapshot store implies
    (base_scraper.py:72-83 lays catalogs out as a date-partitioned
    time-series; 'what changed between snapshots' is its natural read).
    Lag-flag → running-sum island id → per-island min/count → lead for
    the closing edge. Every window partitions by user_id — one shuffle
    key end-to-end, no global ordering, scales with users not history."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            prev.isNull() | (prev != F.col("event_type")), 1
        ).otherwise(0).alias("chg"),
    )
    islands = flagged.withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hist = islands.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("vf"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        hist.select(
            "user_id",
            "version",
            "event_type",
            F.date_format("vf", fmt).alias("valid_from"),
            F.date_format(F.lead("vf").over(w2), fmt).alias("valid_to"),
            "n_events",
        )
        .orderBy("user_id", "version")
    )


@register(
    "window_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w
                       > 1800000000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_seq
      FROM ordered
    )
    SELECT user_id, session_seq,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
    tags=("window", "sessionize"),
)
def window_sessionize(spark, sf_dir):
    """Batch sessionization (§2B#49's batch twin): split each user's event
    stream into sessions at >30-min inactivity gaps — lag-gap flag →
    running-sum session id → per-session rollup. The streaming engine does
    this with session_window + watermark (stream_session_window); this is
    the deterministic batch replay of the same semantics, oracle-checked
    exactly. All windows share one partitioning (user_id): a single
    shuffle sessionizes any history, and per-user state never needs to
    co-reside — the 100 TB shape."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    gap_us = F.unix_micros(F.col("ts")) - prev_us
    flagged = ev.select(
        "user_id", "ts", "event_id", "value",
        F.when(prev_us.isNull() | (gap_us > 1800 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), fmt).alias("session_start"),
            F.date_format(F.max("ts"), fmt).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "window_distribution_battery",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           CAST(percent_rank() OVER w AS FLOAT) AS pct_rank,
           CAST(cume_dist() OVER w AS FLOAT) AS cume,
           nth_value(s_acctbal, 2) OVER
             (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_nationkey, pct_rank, s_suppkey
    """,
    tags=("window",),
)
def window_distribution_battery(spark, sf_dir):
    """Distribution window functions (§2B#27 completed): percent_rank,
    cume_dist, and nth_value per nation — the quantile-position analytics
    the rank battery leaves out. Both ratios are a single IEEE division of
    exact integer ranks, so they hash-match without rounding; the float32
    output cast is belt-and-braces only. nth_value gets the explicit full frame because
    the default frame stops at CURRENT ROW (same footgun as last_value)."""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        s.select(
            "s_suppkey",
            "s_nationkey",
            (F.percent_rank().over(w)).cast("float").alias("pct_rank"),
            (F.cume_dist().over(w)).cast("float").alias("cume"),
            F.nth_value("s_acctbal", 2).over(wfull).alias("second_bal"),
        )
        .orderBy("s_nationkey", "pct_rank", "s_suppkey")
    )


@register(
    "timeseries_gapfill",
    oracle="""
    WITH sparse AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM orders WHERE o_custkey % 97 = 0
      GROUP BY date_trunc('day', o_orderdate)
    ), bounds AS (
      SELECT date_trunc('day', MIN(o_orderdate)) AS lo,
             date_trunc('day', MAX(o_orderdate)) AS hi
      FROM orders
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds
    )
    SELECT sp.day,
           COALESCE(s.total, 0.0) AS day_total,
           last_value(s.total IGNORE NULLS) OVER
             (ORDER BY sp.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS carried_total,
           CASE WHEN s.total IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine sp LEFT JOIN sparse s ON sp.day = s.day
    ORDER BY sp.day
    """,
    tags=("window", "timeseries", "gapfill"),
)
def timeseries_gapfill(spark, sf_dir):
    """Hypertable-style gap filling (TimescaleDB ``time_bucket_gapfill``
    analog): a sparse daily series — revenue of a 1-in-97 customer cohort —
    is re-gridded onto the full calendar spine and forward-filled
    (locf). The crocus snapshot store is exactly this shape: providers skip
    days (holidays, scrape failures), and 'price as of day D' needs the
    last seen snapshot (SURVEY §2A D1, base_scraper.py:78). Spine =
    ``sequence(min, max, interval 1 day)`` exploded — generated, never
    materialized; the fill is one unpartitioned window over days (calendar-
    sized, thousands of rows at any data scale — per-key fills would
    partition by key first)."""
    o = load(spark, sf_dir, "orders")
    sparse = (
        o.filter(F.col("o_custkey") % 97 == 0)
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"))
    )
    spine = (
        o.agg(
            F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
            F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    wfill = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(sparse, "day", "left")
        .select(
            "day",
            F.coalesce("total", F.lit(0.0)).alias("day_total"),
            F.last("total", ignorenulls=True).over(wfill).alias("carried_total"),
            F.when(F.col("total").isNull(), 1).otherwise(0).alias("is_gap"),
        )
        .orderBy("day")
    )


@register(
    "timeseries_ohlc_resample",
    oracle="""
    WITH ranked AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             value,
             ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rk_a,
             ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rk_d
      FROM events
    )
    SELECT day,
           COUNT(*) AS n_ticks,
           MAX(CASE WHEN rk_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rk_d = 1 THEN value END) AS close,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS volume
    FROM ranked
    GROUP BY day
    ORDER BY day
    """,
    tags=("window", "timeseries"),
)
def timeseries_ohlc_resample(spark, sf_dir):
    """OHLC downsampling (tick → daily bars) — the hypertable
    ``time_bucket`` + first/last aggregate, the resample the reference's
    daily price snapshots (`ishares.json:7-8`) imply at intraday
    granularity. open/close are deterministic argmin/argmax over (ts,
    event_id) — not first()/last(), which are partition-order-dependent —
    expressed as rank-1 picks so ties break identically on any engine.
    Both window passes and the aggregate share ONE day-hash partitioning;
    at 100 TB each day's bar builds from its own partition with no
    global sort."""
    ev = load(spark, sf_dir, "events")
    day_d = F.col("ts").cast("date")
    wa = Window.partitionBy(day_d).orderBy("ts", "event_id")
    wd = Window.partitionBy(day_d).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            F.date_format(day_d, "yyyy-MM-dd").alias("day"),
            "value",
            F.row_number().over(wa).alias("rk_a"),
            F.row_number().over(wd).alias("rk_d"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.max(F.when(F.col("rk_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rk_d") == 1, F.col("value"))).alias("close"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("volume"),
        )
        .orderBy("day")
    )


@register(
    "series_vwap_twap",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             date_trunc('day', ts)::DATE AS day,
             ts, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id, date_trunc('day', ts)
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_s,
             event_id
      FROM events
    )
    SELECT user_id, day,
           COUNT(*) AS n_obs,
           CAST(CAST(SUM(CAST(value * value AS DECIMAL(25,6))) AS DOUBLE)
                 / CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS FLOAT)
             AS vwap,
           CAST(CAST(SUM(CAST(value * COALESCE(dt_s, 0) AS DECIMAL(25,6)))
                      AS DOUBLE)
                 / NULLIF(CAST(SUM(CAST(COALESCE(dt_s, 0) AS DECIMAL(25,6)))
                               AS DOUBLE), 0.0) AS FLOAT)
             AS twap
    FROM pts
    GROUP BY user_id, day
    HAVING COUNT(*) >= 3
    ORDER BY user_id, day
    """,
    tags=("window", "timeseries", "finance"),
)
def series_vwap_twap(spark, sf_dir):
    """Volume- and time-weighted averages per (user, day) — the price
    time-series reductions the reference's daily NAV/price snapshots feed
    (price column, ishares.json:7): VWAP weights each observation by its
    own magnitude (value doubling as size, the fixture's only volume
    proxy); TWAP weights by the seconds until the next observation (lead
    within the day — last point carries no weight, the standard
    right-open convention). Spark shape: ONE window (lead over user+day)
    then ONE grouped aggregate — both partition on the same keys, so the
    second shuffle collapses into the first's partitioning; all sums
    accumulate in decimal (engine-order-independent), ratios round at 6.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("day", "ts")).orderBy(
        "ts", "event_id"
    )
    pts = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "value",
        # exact integer microseconds — unix_timestamp would floor each
        # side to seconds and drift against the oracle's exact interval
        (
            F.unix_micros(F.lead("ts").over(w))
            - F.unix_micros(F.col("ts"))
        ).alias("dt_s"),
    )
    dec = lambda c: c.cast("decimal(25,6)")  # noqa: E731
    return (
        pts.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (
                F.sum(dec(F.col("value") * F.col("value"))).cast("double")
                / F.sum(dec(F.col("value"))).cast("double")).cast("float").alias("vwap"),
            (
                F.sum(
                    dec(F.col("value") * F.coalesce(F.col("dt_s"), F.lit(0)))
                ).cast("double")
                / F.nullif(
                    F.sum(dec(F.coalesce(F.col("dt_s"), F.lit(0)))).cast(
                        "double"
                    ),
                    F.lit(0.0),
                )).cast("float").alias("twap"),
        )
        .filter(F.col("n_obs") >= 3)
        .orderBy("user_id", "day")
    )


@register(
    "sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_seq
    HAVING COUNT(*) >= 2
    ORDER BY user_id, session_seq
    """,
    tags=("window", "sessionize", "timeseries"),
)
def sessionize_batch(spark, sf_dir):
    """Batch sessionization (gaps-and-islands): a session breaks when the
    per-user gap exceeds 30 minutes; session ids are running sums of
    break flags — two windows over the SAME (user_id, ts) partitioning,
    so Catalyst plans one sort, not two. This is the offline twin of the
    streaming session_window query (same semantics, no watermark): batch
    backfills and the live stream must cut identical sessions, or
    downstream funnel metrics fork. Timestamps emit as strings so the
    micros survive both engines' result paths."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("n_events") >= 2)
        .orderBy("user_id", "session_seq")
    )


@register(
    "series_linear_interp",
    oracle="""
    WITH sparse AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM orders WHERE o_custkey % 97 = 0
      GROUP BY date_trunc('day', o_orderdate)
    ), bounds AS (
      SELECT date_trunc('day', MIN(o_orderdate)) AS lo,
             date_trunc('day', MAX(o_orderdate)) AS hi
      FROM orders
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds
    ), gridded AS (
      SELECT sp.day, s.total,
             last_value(s.total IGNORE NULLS) OVER
               (ORDER BY sp.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_val,
             last_value(CASE WHEN s.total IS NOT NULL THEN sp.day END
                        IGNORE NULLS) OVER
               (ORDER BY sp.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_day,
             first_value(s.total IGNORE NULLS) OVER
               (ORDER BY sp.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_val,
             first_value(CASE WHEN s.total IS NOT NULL THEN sp.day END
                         IGNORE NULLS) OVER
               (ORDER BY sp.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_day
      FROM spine sp LEFT JOIN sparse s ON sp.day = s.day
    )
    SELECT day,
           CASE WHEN total IS NULL THEN 1 ELSE 0 END AS is_gap,
           CASE
             WHEN total IS NOT NULL THEN total
             WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
             ELSE prev_val + (next_val - prev_val)
                  * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                     / date_diff('day', prev_day, next_day))
           END AS interp_total
    FROM gridded
    ORDER BY day
    """,
    tags=("window", "timeseries", "gapfill"),
)
def series_linear_interp(spark, sf_dir):
    """Linear-interpolation gap fill — the locf twin of
    ``timeseries_gapfill`` for series where a straight line between the
    surrounding observations beats carrying the last one (prices between
    snapshot days, the crocus NAV-alignment case). Bracketing
    observations come from two ignorenulls windows (last-preceding,
    first-following); the interpolation weight is an exact integer day
    ratio, so the single fused multiply-add per row is bit-identical
    across engines. Same scale shape as gapfill: the spine is generated,
    never stored, and the two windows are one calendar-sized sort."""
    o = load(spark, sf_dir, "orders")
    sparse = (
        o.filter(F.col("o_custkey") % 97 == 0)
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"))
    )
    spine = (
        o.agg(
            F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
            F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    known_day = F.when(F.col("total").isNotNull(), F.col("day"))
    g = (
        spine.join(sparse, "day", "left")
        .select(
            "day",
            "total",
            F.last("total", ignorenulls=True).over(wprev).alias("prev_val"),
            F.last(known_day, ignorenulls=True).over(wprev).alias("prev_day"),
            F.first("total", ignorenulls=True).over(wnext).alias("next_val"),
            F.first(known_day, ignorenulls=True).over(wnext).alias("next_day"),
        )
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "next_day", "prev_day"
    )
    return g.select(
        "day",
        F.when(F.col("total").isNull(), 1).otherwise(0).alias("is_gap"),
        F.when(F.col("total").isNotNull(), F.col("total"))
        .when(
            F.col("prev_val").isNull() | F.col("next_val").isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val")) * frac
        )
        .alias("interp_total"),
    ).orderBy("day")


@register(
    "window_interval_range_frame",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           COUNT(*) OVER w AS n_prior_24h,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
             AS value_24h
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window", "timeseries"),
)
def window_interval_range_frame(spark, sf_dir):
    """Time-interval RANGE frame (§2B#29's event-time form): each
    purchase aggregated with every purchase by the same user in the
    PRECEDING 24 HOURS — frame membership decided by timestamp
    arithmetic, not row position, so ties and irregular spacing are
    handled exactly (the rolling-exposure / velocity-check shape:
    'how much did this account buy in the last day'). One shuffle on the
    user key, one in-partition sort; the frame slides without
    re-scanning (Spark keeps a running frame over the sorted partition).
    The aggregate under the frame is the DECIMAL quantize-then-sum, so
    every sliding sum is exact."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    # frame arithmetic in MICROSECONDS: a seconds-truncated cast would
    # disagree with the oracle's exact INTERVAL for pairs straddling the
    # 24 h boundary by under a second — the sf0.01-passes-on-data-luck
    # class of bug.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-24 * 3600 * 1_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.count(F.lit(1)).over(w).alias("n_prior_24h"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias(
            "value_24h"
        ),
    ).orderBy("user_id", "event_id")


@register(
    "window_ntile_binning",
    oracle="""
    WITH binned AS (
      SELECT c_mktsegment, c_acctbal,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT c_mktsegment, quartile,
           COUNT(*) AS n,
           MIN(c_acctbal) AS lo,
           MAX(c_acctbal) AS hi,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM binned
    GROUP BY c_mktsegment, quartile
    ORDER BY c_mktsegment, quartile
    """,
    tags=("window",),
)
def window_ntile_binning(spark, sf_dir):
    """Equal-frequency discretization via ntile (completing the §2B#27
    ranking-window family): per-segment account-balance quartiles with
    per-bin count/range/decimal-exact totals. ntile's remainder rule
    (first bins get the extra row) is SQL-standard and identical in both
    engines; the (c_acctbal, c_custkey) order key makes tie placement
    deterministic. The window partitions by segment — the per-partition
    sort is segment-local, never global. At 100 TB equal-frequency
    boundaries come from approx quantiles broadcast back
    (agg_approx_percentiles is that path); ntile is the exact
    per-group semantic spec."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    cust = load(spark, sf_dir, "customer")
    binned = cust.select(
        "c_mktsegment", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )
    return (
        binned.groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


@register(
    "window_running_distinct",
    oracle="""
    SELECT e.user_id, e.event_id,
           (SELECT COUNT(DISTINCT e2.event_type) FROM events e2
            WHERE e2.user_id = e.user_id
              AND (e2.ts < e.ts
                   OR (e2.ts = e.ts AND e2.event_id <= e.event_id)))
             AS n_distinct_types
    FROM events e
    WHERE e.user_id % 50 = 0
    ORDER BY e.user_id, e.event_id
    """,
    tags=("window",),
)
def window_running_distinct(spark, sf_dir):
    """Running DISTINCT count over an ordered window — the aggregate
    Spark's window functions don't support natively (COUNT(DISTINCT) OVER
    raises); the engine pattern is size(collect_set() OVER (...rows
    unbounded preceding)) — set state is bounded by the distinct-value
    cardinality (5 event types here), NOT the frame length, so the state
    per row is tiny even on unbounded frames. The oracle phrases the same
    frame as a correlated subquery (DuckDB's decorrelation makes it a
    join), proving the workaround exact.

    Scale: one user_id shuffle; per-row state = the distinct set (small
    by domain); for high-cardinality domains the swap is the sum-over-
    dense_rank-firsts trick or an approx sketch (agg_hll battery)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.size(F.collect_set("event_type").over(w)).alias(
                "n_distinct_types"
            ),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "join_scd2_point_in_time",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS version
      FROM ordered
    ), hist AS (
      SELECT user_id, version, event_type, MIN(ts) AS vf
      FROM islands GROUP BY user_id, version, event_type
    ), bounded AS (
      SELECT *, LEAD(vf) OVER (PARTITION BY user_id ORDER BY version) AS vt
      FROM hist
    ), probes AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS probe_id, p.user_id, p.ts,
           b.version, b.event_type AS state_type
    FROM probes p JOIN bounded b
      ON b.user_id = p.user_id AND p.ts >= b.vf
         AND (b.vt IS NULL OR p.ts < b.vt)
    ORDER BY probe_id
    """,
    tags=("window", "scd", "join"),
)
def join_scd2_point_in_time(spark, sf_dir):
    """Point-in-time dimension lookup against SCD2 history (the
    'as-of-the-fact' join every Kimball warehouse runs): each purchase
    resolves the version of the user's state valid AT its timestamp.
    The engine avoids the range join entirely — version-start rows and
    probe rows UNION into one (user, ts) stream and a last(ignorenulls)
    carry assigns each probe its prevailing version in ONE shuffle
    (version rows sort before probes at equal ts, so a version starting
    exactly at the probe is visible — matching the oracle's inclusive
    vf edge; zero-length versions lose to their same-instant successor
    under the version-ascending tiebreak in both formulations).
    The oracle IS the range join, bounding exactness."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    ).withColumn("version", F.sum("chg").over(run).cast("long"))
    hist = islands.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("vf")
    )
    vrows = hist.select(
        "user_id",
        F.col("vf").alias("ts"),
        F.lit(0).alias("is_probe"),
        "version",
        F.col("event_type").alias("state_type"),
        F.lit(None).cast("long").alias("probe_id"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("string").alias("state_type"),
        F.col("event_id").alias("probe_id"),
    )
    carry = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = vrows.unionByName(probes)
    return (
        u.withColumn(
            "cur_version", F.last("version", ignorenulls=True).over(carry)
        )
        .withColumn(
            "cur_state", F.last("state_type", ignorenulls=True).over(carry)
        )
        .filter(F.col("is_probe") == 1)
        .select(
            "probe_id",
            "user_id",
            "ts",
            F.col("cur_version").alias("version"),
            F.col("cur_state").alias("state_type"),
        )
        .orderBy("probe_id")
    )


@register(
    "window_reset_running_total",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type, value,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS epoch
      FROM events
    ),
    running AS (
      SELECT user_id, event_id, event_type,
             CAST(COALESCE(epoch, 0) AS BIGINT) AS epoch,
             SUM(CASE WHEN event_type = 'view'
                      THEN CAST(value AS DECIMAL(25,6))
                      ELSE CAST(0 AS DECIMAL(25,6)) END)
               OVER (PARTITION BY user_id, COALESCE(epoch, 0)
                     ORDER BY ts, event_id) AS views_since_purchase
      FROM seq
    )
    SELECT user_id, event_id, event_type, epoch,
           CAST(views_since_purchase AS DOUBLE) AS views_since_purchase
    FROM running
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
    tags=("window", "reset"),
)
def window_reset_running_total(spark, sf_dir):
    """Running total that RESETS at each purchase — the conditional-reset
    accumulator (view-value accumulated since the last conversion) that
    plain window frames can't express: the reset is a SEGMENT key (count
    of PRIOR purchases via an unbounded-to-1-preceding frame), and the
    running sum partitions by (user, segment) — the same epoch trick as
    gaps-and-islands, applied to frame resets. Reported at each purchase:
    how much view value accumulated since the previous one.

    One user-key shuffle carries both windows; sums are exact decimals
    cast at the boundary."""
    from pyspark.sql.window import Window

    w_prior = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_prior),
            F.lit(0),
        ).alias("epoch"),
    )
    w_run = (
        Window.partitionBy("user_id", "epoch")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(25,6)"
    running = seq.select(
        "user_id",
        "event_id",
        "event_type",
        "epoch",
        F.sum(
            F.when(
                F.col("event_type") == "view", F.col("value").cast(dec)
            ).otherwise(F.lit(0).cast(dec))
        )
        .over(w_run)
        .alias("views_since_purchase"),
    )
    return (
        running.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.col("epoch").cast("long").alias("epoch"),
            F.col("views_since_purchase")
            .cast("double")
            .alias("views_since_purchase"),
        )
        .orderBy("user_id", "event_id")
    )
