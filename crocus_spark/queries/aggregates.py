"""Aggregation battery — SURVEY.md §2B rows 19-26.

The reference's only aggregate is an argmax (newest-file-by-mtime,
``base_scraper.py:96``); the implied workload (portfolio weight sums, TER
distributions, provider rollups — SURVEY §2A/§2B) needs the full set. All
group-bys here are partial+final hash aggregates (map-side combine), so the
shuffle carries one row per (group × partition) — the property that keeps
them viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crocus_spark.io import load, register_views, spread
from crocus_spark.queries import register
from crocus_spark.queries._det import DEC, davg, davg_sql, dsum, dsum_sql


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_distinct_counts(spark, sf_dir):
    """Exact distinct counts per group. Spark expands distinct aggregates
    into a two-phase plan (Expand + two aggregates); at scale prefer
    approx_count_distinct (see agg_approx_distinct) when ±2% is acceptable."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # HLL++ sketches are implementation-specific; Spark's and
    # DuckDB's estimates legitimately differ → rows-only check, plus the
    # property test in tests/test_properties.py bounding the relative error.
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct estimate — the 100 TB path for cardinality
    (§2B#20): fixed-size sketch per group, no distinct expansion."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_maxby_argmax",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS best_order,
           CAST(max(o_totalprice) AS DOUBLE) AS best_price
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    tags=("agg",),
)
def agg_maxby_argmax(spark, sf_dir):
    """argmax per group (crocus AGG1: newest-file-by-mtime at
    base_scraper.py:96 → F.max_by). Double order keys are effectively
    tie-free in the fixtures; for tie-prone keys use the window top-1 form
    (see products_union_dedup) instead."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("best_order"),
            F.max("o_totalprice").alias("best_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT r_name AS region, n_name AS nation,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           COUNT(*) AS n_suppliers,
           {dsum_sql('s_acctbal', 'total_bal')}
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY g_region, g_nation, region NULLS FIRST, nation NULLS FIRST
    """,
    tags=("agg",),
)
def agg_rollup(spark, sf_dir):
    """Hierarchical rollup region→nation→grand-total (§2B#22) with GROUPING
    markers to distinguish subtotal rows from genuine NULL keys."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "s_acctbal")
        .rollup("region", "nation")
        .agg(
            F.grouping("region").alias("g_region"),
            F.grouping("nation").alias("g_nation"),
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum("s_acctbal", "total_bal"),
        )
        .orderBy(
            "g_region",
            "g_nation",
            F.col("region").asc_nulls_first(),
            F.col("nation").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           {dsum_sql('l_quantity', 'sum_qty')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg",),
)
def agg_cube(spark, sf_dir):
    """Full cube over two dimensions (§2B#22) — every subtotal combination
    in one pass (Expand operator: input amplified 4×; at 100 TB prefer
    grouping sets restricted to the combinations actually needed)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            dsum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {dsum_sql('o_totalprice', 'total')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "sql"),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit grouping sets via the engine's SQL surface (SURVEY §2C) —
    only the two requested subtotal sets, no full cube expansion."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n, {dsum_sql('o_totalprice', 'total')}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    ORDER BY n_nationkey
    """,
    tags=("agg",),
)
def agg_collect_sorted(spark, sf_dir):
    """collect_list with deterministic ordering (§2B#23): collect is
    order-nondeterministic under parallelism, so the engine always sorts the
    collected array before exposing it (here flattened to a CSV string for
    oracle comparability)."""
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "suppliers"
            )
        )
        .orderBy("n_nationkey")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
           round(quantile_cont(c_acctbal, 0.50), 4) AS p50,
           round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
           round(median(c_acctbal), 4) AS med
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles + median (§2B#24). Exact percentile
    requires a per-group sort — fine for bounded groups; the unbounded-scale
    variant is percentile_approx (KLL/GK sketch, mergeable)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("c_acctbal", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("c_acctbal", F.lit(0.75)), 4).alias("p75"),
            F.round(F.median("c_acctbal"), 4).alias("med"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_stats_moments(spark, sf_dir):
    """Second-moment stats (§2B#25). These accumulate in merge order, so
    results are rounded well below the accumulation-error floor to stay
    oracle-exact (see _det.py doctrine)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "agg_pivot_confront",
    oracle=f"""
    SELECT n_name AS nation,
      {', '.join(
        f"COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) "
        f"FILTER (WHERE c_mktsegment = '{s}') AS DOUBLE), 0.0) AS {s.lower()}"
        for s in _SEGMENTS)}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY nation
    """,
    tags=("agg", "headline"),
)
def agg_pivot_confront(spark, sf_dir):
    """Pivot: segments as columns per nation — the literal side-by-side
    'confront' layout the reference aspires to (README.md:4; §2B#26).
    Pivot values are pinned explicitly: never let Spark collect distinct
    pivot keys from 100 TB of data."""
    o = load(spark, sf_dir, "orders")
    # single-row-group scan pins the probe + 5-way decimal pivot agg to
    # one task; keyed spread fans it out (no-op at production split
    # counts, io.spread contract)
    o = spread(o, spark, cols=("o_orderkey",), rows_per_task=4000)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    df = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double"))
    )
    out = df.select(
        "nation",
        *[F.coalesce(F.col(s), F.lit(0.0)).alias(s.lower()) for s in _SEGMENTS],
    )
    return out.orderBy("nation")


@register(
    "agg_hll_mergeable_sketch",
    oracle=None,  # Datasketches HLL binary images are engine-specific —
    # rows-only check; the estimate-vs-exact error bound is property-tested
    # in tests/test_properties.py
    tags=("agg", "approx", "sketch"),
)
def agg_hll_mergeable_sketch(spark, sf_dir):
    """Mergeable HLL sketches (§2B#20 at its 100 TB formulation): build one
    Datasketches HLL per order-priority group with hll_sketch_agg, then
    hll_union_agg the per-group sketches into a global distinct-customer
    estimate WITHOUT rescanning the data. Mergeability is the scale
    property: per-partition / per-day sketches union into rollups (daily →
    monthly → all-time) at sketch size, not data size — the pattern the
    reference's daily snapshot store needs for cross-snapshot cardinality.
    """
    o = load(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_group.select(
        F.lit("all_priorities").alias("scope"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers"),
        F.sum("n_rows").alias("n_rows"),
    )


@register(
    "rollup_hierarchical_time",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
    tags=("agg", "timeseries", "rollup"),
)
def rollup_hierarchical_time(spark, sf_dir):
    """Hypertable-style continuous aggregate (the 'hypertable rollup'
    custom-operator class): the DAILY rollup is computed FROM the HOURLY
    rollup, never from raw events — yet the oracle aggregates raw events
    directly, and the hash must match. That works because the hourly
    partials stay DECIMAL (exact, associative) until the final cast:
    the algebraic-merge property that lets a 100 TB store maintain
    hour → day → month aggregates incrementally, re-reading only the
    finest level, exactly like the reference's daily snapshot store
    rolling up to monthly views."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("dec_total"),
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", "hour").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("dec_total").cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )
    return daily


@register(
    "agg_incremental_merge",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_qty
    FROM lineitem
    GROUP BY ship_month, l_returnflag
    ORDER BY ship_month, l_returnflag
    """,
    tags=("agg", "incremental", "scale"),
)
def agg_incremental_merge(spark, sf_dir):
    """Incremental materialized-aggregate maintenance: the monthly rollup
    is kept as ALGEBRAIC partials (decimal sum + count, never avg), so a
    new batch folds in by unioning partial states and re-summing — history
    is never rescanned. Here the pre-2000 state is written to parquet (the
    standing materialization), the 2000+ slice plays the arriving batch,
    and the merge is partials ∪ partials → sum. avg is DERIVED from the
    merged partials at read time — the decomposition that makes any
    algebraic aggregate incrementally maintainable (and exactly the
    map-side-combine contract Spark applies inside one job, lifted across
    jobs). Oracle = full recompute: maintenance must be invisible."""
    from crocus_spark.queries.sources_q import _scratch

    path = _scratch("incr_state")
    li = load(spark, sf_dir, "lineitem")
    split = F.lit("2000-01-01").cast("timestamp")

    def partials(df):
        return df.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
            "l_returnflag",
        ).agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"),
        )

    partials(li.filter(F.col("l_shipdate") < split)).write.mode(
        "overwrite"
    ).parquet(path)
    state = spark.read.parquet(path)
    delta = partials(li.filter(F.col("l_shipdate") >= split))
    merged = (
        state.unionByName(delta)
        .groupBy("ship_month", "l_returnflag")
        .agg(
            F.sum("n_items").alias("n_items"),
            F.sum("qty_dec").alias("qty_dec"),
        )
    )
    return (
        merged.select(
            "ship_month",
            "l_returnflag",
            "n_items",
            F.col("qty_dec").cast("double").alias("sum_qty"),
            (
                F.col("qty_dec").cast("double")
                / F.col("n_items").cast("double")
            ).alias("avg_qty"),
        )
        .orderBy("ship_month", "l_returnflag")
    )


@register(
    "agg_approx_percentiles",
    oracle=None,  # approx_percentile is engine-specific (Spark GK sketch,
    # DuckDB t-digest) — rank-error bound property-tested in
    # tests/test_properties.py
    tags=("agg", "approximate", "scale"),
)
def agg_approx_percentiles(spark, sf_dir):
    """Approximate percentiles via the Greenwald-Khanna sketch (§2B#23's
    scale path): accuracy=10000 bounds rank error to n/10000 with O(1/ε)
    state per group — the exact percentile needs a per-group sort. This is
    the form that survives 100 TB: mergeable sketch state, one
    partial+final aggregation, no global ordering anywhere. The exact
    twin (agg_percentiles) stays for small groups; the property test pins
    the rank-error contract."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], 10000
            ).alias("pcts")
        )
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram_buckets",
    oracle="""
    WITH bucketed AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS BIGINT)
               AS bucket
      FROM orders
    )
    SELECT bucket,
           bucket * 50000.0 AS lo,
           CASE WHEN bucket = 9 THEN NULL
                ELSE (bucket + 1) * 50000.0 END AS hi,
           COUNT(*) AS n,
           CAST(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS FLOAT)
             AS share
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def agg_histogram_buckets(spark, sf_dir):
    """Fixed-width histogram (width_bucket semantics, clamped top bucket)
    over order totals — the profile-a-column primitive behind the TER /
    price distribution reads the crocus workload implies (SURVEY §2B#24's
    bucketed complement). Bucket id is pure row-local arithmetic (fused
    into the scan); the aggregate is a 10-group hash agg with map-side
    partials, and the share divides exact counts — one IEEE division,
    deterministic at any parallelism. The grand total comes from an
    unpartitioned window over the 10 bucket rows, not a second pass over
    the data."""
    o = load(spark, sf_dir, "orders")
    from pyspark.sql.window import Window as W

    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast(
        "bigint"
    )
    grand = W.partitionBy()
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 50000.0).alias("lo"),
            F.when(F.col("bucket") == 9, F.lit(None).cast("double"))
            .otherwise((F.col("bucket") + 1) * 50000.0)
            .alias("hi"),
            "n",
            (F.col("n") / F.sum("n").over(grand).cast("double"))
            .cast("float")
            .alias("share"),
        )
        .orderBy("bucket")
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           COUNT(*) FILTER (WHERE c_acctbal > 0) AS n_positive,
           COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
           CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(25,6)))
                           FILTER (WHERE c_acctbal > 0), 0) AS DOUBLE)
             AS sum_positive
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "filter"),
)
def agg_filter_clause(spark, sf_dir):
    """Conditionally-filtered aggregates (ANSI FILTER clause; the engine
    side is when/otherwise inside the aggregate — crocus C2's dispatch
    pattern fused into aggregation). One pass computes every conditional
    branch: Catalyst folds all four aggregates into a single hash agg with
    map-side partials, so adding a condition never adds a scan — the
    100 TB way to build the 'n valid / n invalid / sum of valid' triples
    every DQ report needs."""
    c = load(spark, sf_dir, "customer")
    pos = F.col("c_acctbal") > 0
    neg = F.col("c_acctbal") < 0
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.count(F.when(pos, 1)).alias("n_positive"),
            F.count(F.when(neg, 1)).alias("n_negative"),
            F.coalesce(
                F.sum(F.when(pos, F.col("c_acctbal")).cast("decimal(25,6)")),
                F.lit(0).cast("decimal(25,6)"),
            )
            .cast("double")
            .alias("sum_positive"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ), ranked AS (
      SELECT o_orderstatus, o_orderpriority, n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY n DESC, o_orderpriority) AS rk
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_rows
    FROM ranked WHERE rk = 1
    ORDER BY o_orderstatus
    """,
    tags=("agg", "mode"),
)
def agg_mode_deterministic(spark, sf_dir):
    """Deterministic mode (most frequent value per group). Engines disagree
    on mode() tie-breaks, so the engine defines it: count per (group,
    value), then window top-1 with an explicit (count DESC, value) order —
    reproducible on any engine and any partitioning. Two stages total:
    the count agg shrinks data to distinct (group, value) pairs BEFORE the
    window, so the rank never sorts raw rows — at 100 TB the window input
    is vocabulary-sized, not corpus-sized."""
    o = load(spark, sf_dir, "orders")
    from pyspark.sql.window import Window as W

    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_rows"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_bitwise_battery",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           BIT_OR(user_id)  AS bor,
           BIT_AND(user_id) AS band,
           BIT_XOR(user_id) AS bxor
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise_battery(spark, sf_dir):
    """Bitwise aggregates (bit_or / bit_and / bit_xor) — the primitive
    under bitmap indexes and feature-flag rollups. All three are
    commutative+associative, so Spark runs them as map-side partials with
    a tiny final merge: per-group state is ONE int64 regardless of row
    count, the ideal 100 TB aggregate shape."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_or("user_id").alias("bor"),
            F.bit_and("user_id").alias("band"),
            F.bit_xor("user_id").alias("bxor"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_kll_quantile_sketch",
    oracle=None,  # Datasketches KLL binary images are engine-specific —
    # rows-only; estimate-vs-exact error is property-tested in
    # tests/test_properties.py
    tags=("agg", "approx", "sketch"),
)
def agg_kll_quantile_sketch(spark, sf_dir):
    """Mergeable KLL quantile sketches (§2B#24 at its 100 TB formulation,
    the quantile complement of the HLL rollup): one KLL sketch of
    o_totalprice per order-priority group, merged into GLOBAL
    p50/p90/p99 estimates without rescanning the data. Mergeability is
    the point: per-day/per-partition sketches roll up at sketch size
    (KBs), which is how a 100 TB store serves percentiles over any date
    range — the exact percentile query would re-shuffle the range every
    time."""
    o = load(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double("o_totalprice").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    merged = per_group.agg(
        F.kll_merge_agg_double("sk").alias("sk"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        F.lit("all_priorities").alias("scope"),
        F.col("n_rows"),
        F.round(F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.9)), 2).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.99)), 2).alias("p99"),
    )


@register(
    "agg_theta_set_algebra",
    oracle=None,  # Theta sketch binaries are engine-specific — rows-only;
    # estimates vs exact distinct-set algebra property-tested in
    # tests/test_properties.py
    tags=("agg", "approx", "sketch"),
)
def agg_theta_set_algebra(spark, sf_dir):
    """Theta-sketch SET ALGEBRA over distinct customer sets (beyond
    HLL, which can only union): customers with urgent orders vs
    customers with non-urgent orders — union, intersection, and
    difference cardinalities, all computed on sketch images without a
    distinct-shuffle of the raw keys. At 100 TB this answers 'how many
    entities appear in BOTH cohorts' from per-cohort sketches alone —
    the cross-snapshot audience-overlap question the reference's
    provider comparison implies (same ISIN universe, two providers)."""
    o = load(spark, sf_dir, "orders")
    cohorts = o.select(
        "o_custkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
    )
    sk = cohorts.agg(
        F.theta_sketch_agg(
            F.when(F.col("is_urgent"), F.col("o_custkey"))
        ).alias("sk_urgent"),
        F.theta_sketch_agg(
            F.when(~F.col("is_urgent"), F.col("o_custkey"))
        ).alias("sk_other"),
    )
    return sk.select(
        F.round(F.theta_sketch_estimate(F.col("sk_urgent")), 0)
        .cast("long")
        .alias("n_urgent"),
        F.round(F.theta_sketch_estimate(F.col("sk_other")), 0)
        .cast("long")
        .alias("n_other"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_union(F.col("sk_urgent"), F.col("sk_other"))
            ),
            0,
        )
        .cast("long")
        .alias("n_union"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("sk_urgent"), F.col("sk_other"))
            ),
            0,
        )
        .cast("long")
        .alias("n_both"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_difference(F.col("sk_urgent"), F.col("sk_other"))
            ),
            0,
        )
        .cast("long")
        .alias("n_urgent_only"),
    )


@register(
    "agg_regr_battery",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(25,6)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,6)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,6)))
                  AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS REAL) AS slope,
           CAST((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                AS REAL) AS intercept,
           CAST((n * sxy - sx * sy) * (n * sxy - sx * sy)
                / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS REAL) AS r2
    FROM s
    ORDER BY l_returnflag
    """,
    tags=("agg", "ml"),
)
def agg_regr_battery(spark, sf_dir):
    """Per-group simple linear regression (§2B#25 extension): slope,
    intercept, R² of extendedprice on quantity via the closed-form
    normal equations, NOT the builtin regr_* aggregates — the five
    moment sums are decimal-exact (order-independent, see _det), the
    closed-form combination is a fixed double expression tree evaluated
    identically by both engines, and the outputs are float32-cast to
    absorb the last-ulp libm noise. At 100 TB this is one map-side
    partial aggregate carrying 6 numbers per (group × partition) — the
    same shuffle shape as q1; a regression per group costs no more than
    a sum per group."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum((x * y).cast(DEC)).cast("double").alias("sxy"),
        F.sum((x * x).cast(DEC)).cast("double").alias("sxx"),
        F.sum((y * y).cast(DEC)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        s.select(
            "l_returnflag",
            "n",
            slope.cast("float").alias("slope"),
            ((sy - slope * sx) / n).cast("float").alias("intercept"),
            (
                (n * sxy - sx * sy)
                * (n * sxy - sx * sy)
                / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            )
            .cast("float")
            .alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(25,6)) AS wt,
             SUM(CAST(l_quantity AS DECIMAL(25,6))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             SUM(CAST(l_quantity AS DECIMAL(25,6))) OVER (
               PARTITION BY l_returnflag) AS totw
      FROM lineitem
    ), hit AS (
      SELECT l_returnflag, l_extendedprice, totw,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      FROM w WHERE 2 * cumw >= totw
    )
    SELECT l_returnflag,
           l_extendedprice AS weighted_median,
           CAST(totw AS DOUBLE) AS total_weight
    FROM hit WHERE rn = 1
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_weighted_median(spark, sf_dir):
    """Weighted median (§2B#24 extension): the price at which half the
    QUANTITY-weighted mass lies on each side — the portfolio-weighted
    percentile the reference's holdings comparison implies (median
    holding price weighted by position size). Exact, not sketched: one
    cumulative decimal-weight window per group with a total-order
    tie-break, then the first row crossing half the total weight. The
    cumulative sum is DECIMAL so every prefix is exact and
    order-identical across engines. At 100 TB swap the per-group sort
    for the two-pass histogram narrowing of agg_percentiles — same
    answer, no full sort; the window form is the semantic spec."""
    li = load(spark, sf_dir, "lineitem")
    order = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("l_returnflag")
    wrn = Window.partitionBy("l_returnflag").orderBy(*order)
    wt = F.col("l_quantity").cast(DEC)
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.sum(wt).over(wcum).alias("cumw"),
        F.sum(wt).over(wtot).alias("totw"),
    ).filter(2 * F.col("cumw") >= F.col("totw"))
    return (
        w.withColumn("rn", F.row_number().over(wrn))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_extendedprice").alias("weighted_median"),
            F.col("totw").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_skew_kurtosis",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,6)))
                  AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
                           AS DECIMAL(25,6))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                           AS DECIMAL(25,6))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    ), m AS (
      SELECT l_returnflag, n,
             s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    )
    SELECT l_returnflag, n,
           CAST(mu AS REAL) AS mean_qty,
           CAST(SQRT(m2) AS REAL) AS pop_std,
           CAST(m3 / (m2 * SQRT(m2)) AS REAL) AS skewness,
           CAST(m4 / (m2 * m2) - 3 AS REAL) AS excess_kurtosis
    FROM m
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_skew_kurtosis(spark, sf_dir):
    """Population skewness and excess kurtosis per group (§2B#25
    extension, the distribution-shape tail of the moments battery) —
    computed from decimal-exact raw power sums (Σx..Σx⁴) combined by a
    fixed double expression tree written identically in both engines
    (sqrt instead of pow(1.5), no library-dependent transcendentals),
    float32-cast at the boundary. Same 100 TB shape as every moments
    aggregate: one map-side-combined hash agg carrying 5 numbers per
    (group × partition); a 4th-moment profile costs what a sum costs."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("s1"),
        F.sum((x * x).cast(DEC)).cast("double").alias("s2"),
        F.sum((x * x * x).cast(DEC)).cast("double").alias("s3"),
        F.sum((x * x * x * x).cast(DEC)).cast("double").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    return (
        s.select(
            "l_returnflag",
            "n",
            mu.cast("float").alias("mean_qty"),
            F.sqrt(m2).cast("float").alias("pop_std"),
            (m3 / (m2 * F.sqrt(m2))).cast("float").alias("skewness"),
            (m4 / (m2 * m2) - 3).cast("float").alias("excess_kurtosis"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_boolean_battery",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O')
             = COUNT(*) AS all_open,
           min(o_orderkey) AS first_order
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_boolean_battery(spark, sf_dir):
    """Boolean/conditional aggregate battery (§2B#19 breadth):
    count_if, every/bool_and, some/bool_or, an all-rows predicate, and a
    deterministic representative (min, NOT any_value — any_value is
    partition-order-dependent and can never sit under a hash gate). All
    map-side-combinable: booleans fold as partial AND/OR bits, so the
    battery shuffles a handful of bits per (group × partition)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
            F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
            (
                F.count_if(F.col("o_orderstatus") == "O") == F.count(F.lit(1))
            ).alias("all_open"),
            F.min("o_orderkey").alias("first_order"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "maintenance_incremental_join",
    oracle="""
    SELECT c.c_nationkey AS nation,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("agg", "lakehouse"),
)
def maintenance_incremental_join(spark, sf_dir):
    """Incremental JOIN-view maintenance: with both sides split into
    base + delta (orders by date, customers by key — the arriving-data
    layout), the join view is maintained as the delta algebra
    Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB — base⋈base is NEVER recomputed;
    each term aggregates to algebraic partials that merge-sum into the
    standing view (the agg_incremental_merge discipline applied to a
    join view). The oracle is the monolithic join — the incremental
    union must be indistinguishable from it.

    Scale: the nightly cost is |Δ|-sized joins (delta sides broadcast
    when small — asserted by AQE at runtime), not a base rescan; the
    merge shuffles only (nation)-sized partials."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o_base = o.filter(F.col("o_orderdate") < "1997-01-01")
    o_delta = o.filter(F.col("o_orderdate") >= "1997-01-01")
    c_base = c.filter(F.col("c_custkey") % 10 < 9)
    c_delta = c.filter(F.col("c_custkey") % 10 >= 9)

    def part(orders, custs):
        return (
            orders.join(custs, orders["o_custkey"] == custs["c_custkey"])
            .groupBy(F.col("c_nationkey").alias("nation"))
            .agg(
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("o_totalprice").cast(DEC)).alias("ps"),
            )
        )

    partials = (
        part(o_base, c_base)
        .unionByName(part(o_delta, c_base))
        .unionByName(part(o_base, c_delta))
        .unionByName(part(o_delta, c_delta))
    )
    return (
        partials.groupBy("nation")
        .agg(
            F.sum("pn").alias("n_orders"),
            F.sum("ps").cast("double").alias("revenue"),
        )
        .orderBy("nation")
    )


@register(
    "agg_listagg_battery",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n,
           string_agg(CAST(c_custkey AS VARCHAR), ','
                      ORDER BY c_custkey) AS keys_asc,
           string_agg(c_mktsegment, '|'
                      ORDER BY c_acctbal DESC, c_custkey) AS segs_by_bal
    FROM customer
    WHERE c_custkey < 200
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("agg", "sql"),
)
def agg_listagg_battery(spark, sf_dir):
    """LISTAGG / string_agg (§2C, the SQL:2016 ordered string aggregate
    Spark added in 4.0): per-group concatenation under two different
    explicit WITHIN GROUP orders — the determinism rule that makes
    string aggregation hash-comparable at all (an unordered listagg is
    partitioning-dependent). Same partial/final hash-agg shape as
    collect_list; state is the group's concatenated payload, so at
    100 TB cap the group size (the reference's per-provider holdings
    lists are naturally bounded)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    cust.createOrReplaceTempView("listagg_cust")
    return spark.sql(
        """
        SELECT c_nationkey,
               COUNT(*) AS n,
               listagg(CAST(c_custkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY c_custkey) AS keys_asc,
               listagg(c_mktsegment, '|')
                 WITHIN GROUP (ORDER BY c_acctbal DESC, c_custkey)
                 AS segs_by_bal
        FROM listagg_cust
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )
