"""Data-quality expectation battery — the Deequ/Great-Expectations shape
as engine queries.

The reference validates by eyeball (`output_examples/*.json` committed as
golden files, README.md:14); a pipeline feeding a trainer needs machine-
checkable contracts instead. Each check is a metric computed in the SAME
scan discipline as production Deequ: one pass per table (conditional
aggregates, unpivoted), plus one anti-join for referential integrity —
never a scan per check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crocus_spark.io import load
from crocus_spark.queries import register


@register(
    "dq_expectations",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem_shipdate_null_rate' AS check_name,
             CAST(AVG(CASE WHEN l_shipdate IS NULL THEN 1.0 ELSE 0.0 END)
                  AS DOUBLE) AS metric_value
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_discount_out_of_range',
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                           THEN 1 ELSE 0 END) AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_returnflag_invalid',
             CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R')
                           THEN 1 ELSE 0 END) AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'orders_orderkey_dup',
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'customer_custkey_dup',
             CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS DOUBLE)
      FROM customer
      UNION ALL
      SELECT 'lineitem_orderkey_orphans', CAST(COUNT(*) AS DOUBLE)
      FROM lineitem
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    )
    SELECT check_name, metric_value, metric_value = 0.0 AS passed
    FROM checks ORDER BY check_name
    """,
    tags=("quality", "validation"),
)
def dq_expectations(spark, sf_dir):
    """Expectation suite over the star schema: null-rate, domain, range,
    uniqueness and referential-integrity checks, one row per check with
    pass/fail. Scan discipline is the part that matters at 100 TB: ALL
    checks on a table fuse into ONE conditional-aggregate pass (unpivoted
    after), uniqueness is a distinct-aggregate in that same pass, and
    referential integrity is a single anti-join — checks never multiply
    scans. The reference's analog is its committed golden JSONs
    (output_examples/, README.md:14) — eyeball contracts made executable."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    li_metrics = li.agg(
        F.avg(
            F.when(F.col("l_shipdate").isNull(), 1.0).otherwise(0.0)
        ).alias("lineitem_shipdate_null_rate"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        )
        .cast("double")
        .alias("lineitem_discount_out_of_range"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        )
        .cast("double")
        .alias("lineitem_returnflag_invalid"),
    )
    o_metrics = o.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
        .cast("double")
        .alias("orders_orderkey_dup")
    )
    c_metrics = c.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("c_custkey")))
        .cast("double")
        .alias("customer_custkey_dup")
    )
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("lineitem_orderkey_orphans"))
    )

    def unpivot(df):
        return df.unpivot([], df.columns, "check_name", "metric_value")

    checks = (
        unpivot(li_metrics)
        .unionByName(unpivot(o_metrics))
        .unionByName(unpivot(c_metrics))
        .unionByName(unpivot(orphans))
    )
    return checks.withColumn(
        "passed", F.col("metric_value") == F.lit(0.0)
    ).orderBy("check_name")


@register(
    "dq_observe_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_nonpositive,
           COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS n_null_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    """,
    tags=("quality", "observe"),
)
def dq_observe_metrics(spark, sf_dir):
    """Pipeline observability via ``df.observe`` (crocus C3's structured
    logging, engine-side): data-quality counters ride the QUERY ITSELF as
    accumulator-backed aggregates — computed executor-side during the one
    pass the pipeline already makes, not as a second audit scan (at 100 TB
    a separate metrics query doubles the read bill). The observed frame
    here flows through a foreach sink to force the pass, then the captured
    metrics are returned as a one-row frame; in production the same row
    goes to the metrics log while the data continues to the real sink."""
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_nonpositive"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("n_null_date"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_price"),
    )
    observed.write.format("noop").mode("overwrite").save()
    row = obs.get
    return spark.createDataFrame(
        [
            (
                row["n_rows"],
                row["n_nonpositive"],
                row["n_null_date"],
                row["sum_price"],
            )
        ],
        "n_rows long, n_nonpositive long, n_null_date long, sum_price double",
    )


@register(
    "dq_referential_integrity",
    oracle="""
    WITH orphan_li AS (
      SELECT COUNT(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    ), orphan_o AS (
      SELECT COUNT(*) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ), childless AS (
      SELECT COUNT(*) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey)
    )
    SELECT 'lineitem->orders' AS fk, (SELECT n FROM orphan_li) AS n_orphans
    UNION ALL
    SELECT 'orders->customer', (SELECT n FROM orphan_o)
    UNION ALL
    SELECT 'orders_childless', (SELECT n FROM childless)
    ORDER BY fk
    """,
    tags=("quality", "join"),
)
def dq_referential_integrity(spark, sf_dir):
    """Cross-table referential-integrity audit — the FK checks a
    warehouse runs before trusting a snapshot (the reference's analog:
    every holdings file must have a products-catalog row). Each check is
    a LEFT ANTI join counted: key-partitioned, map-side-combinable, no
    row ever leaves the cluster — at 100 TB an FK audit costs one
    shuffle per edge of the schema graph. Childless-parent detection is
    the same anti join reversed."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    orphan_li = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("lineitem->orders").alias("fk"), "n_orphans")
    )
    orphan_o = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("orders->customer").alias("fk"), "n_orphans")
    )
    childless = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("orders_childless").alias("fk"), "n_orphans")
    )
    return orphan_li.unionAll(orphan_o).unionAll(childless).orderBy("fk")


@register(
    "dq_distribution_drift",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
    ), tagged AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN epoch(o_orderdate) - epoch((SELECT lo FROM bounds))
                       <= (epoch((SELECT hi FROM bounds))
                           - epoch((SELECT lo FROM bounds))) / 2
                  THEN 0 ELSE 1 END AS half
      FROM orders
    ), counts AS (
      SELECT cat,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cur
      FROM tagged GROUP BY cat
    ), tot AS (
      SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
    )
    SELECT cat, n_ref, n_cur,
           CAST(
             (CAST(n_ref AS DOUBLE) / (SELECT t_ref FROM tot)
              - CAST(n_cur AS DOUBLE) / (SELECT t_cur FROM tot))
             * (CAST(n_ref AS DOUBLE) / (SELECT t_ref FROM tot)
                - CAST(n_cur AS DOUBLE) / (SELECT t_cur FROM tot))
             / (CAST(n_ref AS DOUBLE) / (SELECT t_ref FROM tot)
                + CAST(n_cur AS DOUBLE) / (SELECT t_cur FROM tot))
             AS REAL) AS drift_term
    FROM counts
    ORDER BY cat
    """,
    tags=("quality", "drift"),
)
def dq_distribution_drift(spark, sf_dir):
    """Distribution-drift monitor between the first and second half of
    the order history — the χ²-style per-category statistic
    (p−q)²/(p+q) a pipeline watches to catch a provider silently
    changing its mix (the PSI use case without PSI's ln, which is not
    bit-portable across engines; this statistic is integer counts + a
    fixed double expression tree + a float32 boundary cast, so the
    monitor itself sits under the hash gate). One scan, one
    category-sized aggregate; the time split is computed from the data's
    own epoch bounds."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    tagged = o.crossJoin(F.broadcast(bounds)).select(
        F.col("o_orderpriority").alias("cat"),
        F.when(
            F.unix_timestamp("o_orderdate") - F.unix_timestamp("lo")
            <= (F.unix_timestamp("hi") - F.unix_timestamp("lo")) / 2,
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    counts = tagged.groupBy("cat").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = F.col("n_ref").cast("double") / F.col("t_ref")
    q = F.col("n_cur").cast("double") / F.col("t_cur")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "cat",
            "n_ref",
            "n_cur",
            ((p - q) * (p - q) / (p + q)).cast("float").alias("drift_term"),
        )
        .orderBy("cat")
    )


@register(
    "dq_psi_stability",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
    ), tagged AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN epoch(o_orderdate) - epoch((SELECT lo FROM bounds))
                       <= (epoch((SELECT hi FROM bounds))
                           - epoch((SELECT lo FROM bounds))) / 2
                  THEN 0 ELSE 1 END AS half
      FROM orders
    ), counts AS (
      SELECT cat,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS n_cur
      FROM tagged GROUP BY cat
    ), tot AS (
      SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
    )
    SELECT cat, n_ref, n_cur,
           CAST(
             (CAST(n_ref AS DOUBLE) / (SELECT t_ref FROM tot)
              - CAST(n_cur AS DOUBLE) / (SELECT t_cur FROM tot))
             * (ln(CAST(n_ref AS DOUBLE) / (SELECT t_ref FROM tot))
                - ln(CAST(n_cur AS DOUBLE) / (SELECT t_cur FROM tot)))
             AS REAL) AS psi_term
    FROM counts
    ORDER BY cat
    """,
    tags=("dq", "statistics"),
)
def dq_psi_stability(spark, sf_dir):
    """Population Stability Index per category (the scorecard-industry
    drift metric, complementing the χ²-style dq_distribution_drift):
    PSI term = (p_ref − p_cur)·ln(p_ref/p_cur) with add-one smoothed
    counts, first-half-vs-second-half split. Ratios divide exact integer
    counts, the log difference is two correctly-rounded libm calls, and
    the term lands at float32 — the same determinism boundary the drift
    monitor uses. One scan, categories-sized state."""
    o = load(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    tagged = o.crossJoin(F.broadcast(b)).select(
        F.col("o_orderpriority").alias("cat"),
        F.when(
            F.unix_timestamp("o_orderdate") - F.unix_timestamp("lo")
            <= (
                F.unix_timestamp("hi") - F.unix_timestamp("lo")
            ) / 2,
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    counts = tagged.groupBy("cat").agg(
        (F.sum(F.when(F.col("half") == 0, 1).otherwise(0)) + 1).alias("n_ref"),
        (F.sum(F.when(F.col("half") == 1, 1).otherwise(0)) + 1).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref")
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "cat",
            "n_ref",
            "n_cur",
            ((p_ref - p_cur) * (F.log(p_ref) - F.log(p_cur)))
            .cast("float")
            .alias("psi_term"),
        )
        .orderBy("cat")
    )


@register(
    "ml_ab_test_proportions",
    oracle="""
    WITH halves AS (
      SELECT user_id, MIN(user_id % 2) AS grp,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS c_a,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS c_b
      FROM halves
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           CAST(CAST(c_a AS DOUBLE) / n_a AS REAL) AS p_a,
           CAST(CAST(c_b AS DOUBLE) / n_b AS REAL) AS p_b,
           CAST(
             (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / NULLIF(sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 0.0)
             AS REAL) AS z_score
    FROM agg
    """,
    tags=("ml", "statistics"),
)
def ml_ab_test_proportions(spark, sf_dir):
    """Two-proportion z-test (the A/B-test readout): users split into
    arms by id parity, conversion = any purchase, pooled-variance z on
    the two conversion rates. All inputs are exact integer counts from
    ONE grouped pass over the fact scan; the statistic is a fixed IEEE
    expression emitted at float32. The whole answer is one row."""
    ev = load(spark, sf_dir, "events")
    halves = ev.groupBy("user_id").agg(
        F.min(F.col("user_id") % 2).alias("grp"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    agg = halves.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0)).alias("c_b"),
    )
    p_a = F.col("c_a").cast("double") / F.col("n_a")
    p_b = F.col("c_b").cast("double") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.nullif(
        F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    return agg.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        p_a.cast("float").alias("p_a"),
        p_b.cast("float").alias("p_b"),
        z.cast("float").alias("z_score"),
    )


@register(
    "dq_ks_test",
    oracle="""
    WITH per_value AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d2
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_totalprice
    ),
    totals AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2
      FROM per_value
    ),
    cdf AS (
      SELECT v,
             SUM(d1) OVER (ORDER BY v) AS c1,
             SUM(d2) OVER (ORDER BY v) AS c2
      FROM per_value
    ),
    gaps AS (
      SELECT v, abs(c1 * (SELECT n2 FROM totals)
                    - c2 * (SELECT n1 FROM totals)) AS gap
      FROM cdf
    ),
    peak AS (
      SELECT CAST(MAX(gap) AS BIGINT) AS d_scaled FROM gaps
    )
    SELECT n1, n2,
           CAST(CAST(d_scaled AS DOUBLE) / (n1 * n2) AS FLOAT) AS d_stat,
           (SELECT MIN(v) FROM gaps WHERE gap = (SELECT d_scaled FROM peak))
             AS x_at_d,
           CAST(d_scaled AS DOUBLE)
             > 1.3581 * sqrt(CAST(n1 * n2 * (n1 + n2) AS DOUBLE))
             AS reject_at_95
    FROM totals, peak
    """,
    tags=("dq", "stats"),
)
def dq_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov test: sup-norm distance between the
    empirical CDFs of ``o_totalprice`` for finished (F) vs open (O)
    orders — the distribution-drift readout that needs no binning choice,
    complementing the chi-square monitor (`dq_distribution_drift`) and PSI.

    Determinism: the CDF gap is kept CROSS-MULTIPLIED as the exact integer
    ``|c1*n2 - c2*n1|`` — the max is found before any division, so the
    statistic, its argmax value (min v on ties), and the 95% rejection
    verdict (vs 1.3581*sqrt(n1*n2*n), IEEE sqrt is correctly rounded) are
    all bit-identical across engines. Spark shape: one grouped aggregate
    per distinct value, then a SHARD-PARALLEL strictly-below cumulative
    over the value-distinct relation (``operators/ranking.
    cumulative_below`` — range-shard by value, per-shard prefix sums,
    broadcast shard offsets), so the exact sup-CDF scan holds even when
    the distinct-value relation is fact-sized (continuous columns); the
    oracle keeps the textbook single cumulative window, pinning the
    decomposition."""
    from crocus_spark.operators import ranking as R

    ov = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .select("o_orderstatus", "o_totalprice")
    )
    per_value = ov.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("d2"),
    )
    totals = per_value.agg(
        F.sum("d1").cast("long").alias("n1"),
        F.sum("d2").cast("long").alias("n2"),
    )
    cdf = R.cumulative_below(
        per_value, "v", ["d1", "d2"], n_shards=32
    ).select(
        "v",
        (F.col("_cum_d1") + F.col("d1")).alias("c1"),
        (F.col("_cum_d2") + F.col("d2")).alias("c2"),
    )
    gaps = cdf.crossJoin(F.broadcast(totals)).select(
        "v",
        "n1",
        "n2",
        F.abs(
            F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")
        ).alias("gap"),
    )
    peak = gaps.groupBy("n1", "n2").agg(
        F.max("gap").cast("long").alias("d_scaled")
    )
    x_at = (
        gaps.join(
            F.broadcast(peak.select(F.col("d_scaled").alias("gap"))), "gap"
        )
        .agg(F.min("v").alias("x_at_d"))
    )
    return peak.crossJoin(F.broadcast(x_at)).select(
        "n1",
        "n2",
        (
            F.col("d_scaled").cast("double") / (F.col("n1") * F.col("n2"))).cast("float").alias("d_stat"),
        "x_at_d",
        (
            F.col("d_scaled").cast("double")
            > 1.3581
            * F.sqrt(
                (F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2"))).cast(
                    "double"
                )
            )
        ).alias("reject_at_95"),
    )


@register(
    "dq_ks_binned",
    oracle="""
    WITH binned AS (
      SELECT CAST(FLOOR(o_totalprice / 60.0) AS INT) AS bin,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d2
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2
      FROM binned
    ),
    cdf AS (
      SELECT bin,
             SUM(d1) OVER (ORDER BY bin) AS c1,
             SUM(d2) OVER (ORDER BY bin) AS c2
      FROM binned
    ),
    gaps AS (
      SELECT bin, abs(c1 * (SELECT n2 FROM totals)
                      - c2 * (SELECT n1 FROM totals)) AS gap
      FROM cdf
    ),
    peak AS (SELECT CAST(MAX(gap) AS BIGINT) AS d_scaled FROM gaps)
    SELECT n1, n2,
           CAST(CAST(d_scaled AS DOUBLE) / (n1 * n2) AS FLOAT)
             AS d_stat_binned,
           (SELECT MIN(bin) FROM gaps
            WHERE gap = (SELECT d_scaled FROM peak)) AS bin_at_d,
           CAST((SELECT MIN(bin) FROM gaps
                 WHERE gap = (SELECT d_scaled FROM peak)) * 60.0 AS DOUBLE)
             AS bin_lo
    FROM totals, peak
    """,
    tags=("dq", "stats"),
)
def dq_ks_binned(spark, sf_dir):
    """BINNED two-sample KS — the 100 TB swap `dq_ks_test`'s docstring
    promises, shipped as its own honestly-named statistic: quantize the
    value to fixed-width bins (width 60 → ~1e4 bins over the price
    range), then the same exact cross-multiplied integer sup over the
    binned CDFs. The bin relation is FIXED-size regardless of corpus
    cardinality — the distinct-value relation that makes exact KS
    fact-sized for continuous columns collapses to ≤ bins rows, and the
    sup error vs the exact statistic is bounded by one bin's probability
    mass. Bin ids are exact integer arithmetic (floor of a fixed-width
    division) — engine-identical, so the whole scorecard carries a full
    value oracle.

    Spark shape: one binned conditional aggregate (map-side combinable,
    ≤ bins cells), the strictly-below cumulative via
    ``operators/ranking.cumulative_below`` (shard-parallel even at the
    bin count's ceiling), one broadcast of the 1-row totals."""
    from crocus_spark.operators import ranking as R

    ov = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .select("o_orderstatus", "o_totalprice")
    )
    binned = ov.groupBy(
        F.floor(F.col("o_totalprice") / 60.0).cast("int").alias("bin")
    ).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("d2"),
    )
    totals = binned.agg(
        F.sum("d1").cast("long").alias("n1"),
        F.sum("d2").cast("long").alias("n2"),
    )
    cdf = R.cumulative_below(binned, "bin", ["d1", "d2"], n_shards=16).select(
        "bin",
        (F.col("_cum_d1") + F.col("d1")).alias("c1"),
        (F.col("_cum_d2") + F.col("d2")).alias("c2"),
    )
    gaps = cdf.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n1",
        "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias(
            "gap"
        ),
    )
    peak = gaps.groupBy("n1", "n2").agg(
        F.max("gap").cast("long").alias("d_scaled")
    )
    bin_at = (
        gaps.join(
            F.broadcast(peak.select(F.col("d_scaled").alias("gap"))), "gap"
        )
        .agg(F.min("bin").alias("bin_at_d"))
    )
    return peak.crossJoin(F.broadcast(bin_at)).select(
        "n1",
        "n2",
        (F.col("d_scaled").cast("double") / (F.col("n1") * F.col("n2")))
        .cast("float")
        .alias("d_stat_binned"),
        "bin_at_d",
        (F.col("bin_at_d") * 60.0).cast("double").alias("bin_lo"),
    )


@register(
    "dq_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
      FROM digits GROUP BY digit
    ),
    expected AS (
      SELECT * FROM (VALUES
        (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
        (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
        (9, 0.045757)) AS t(digit, exp_share)
    ),
    total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM obs)
    SELECT e.digit,
           COALESCE(o.n, 0) AS n,
           round(CAST(COALESCE(o.n, 0) AS DOUBLE) / total_n, 6) AS obs_share,
           e.exp_share,
           round(abs(round(CAST(COALESCE(o.n, 0) AS DOUBLE) / total_n, 6)
                     - e.exp_share), 6) AS abs_dev
    FROM expected e LEFT JOIN obs o ON e.digit = o.digit, total
    ORDER BY e.digit
    """,
    tags=("dq", "stats"),
)
def dq_benford_digits(spark, sf_dir):
    """Benford first-digit profile of ``o_totalprice`` — the classic
    fabricated-data screen: observed leading-digit shares vs the Benford
    expectation log10(1+1/d). The expected shares are INLINE LITERALS
    (6-digit, identical on both sides) rather than engine log10 calls, and
    the leading digit is taken from the integer part's string form — no
    float log/pow anywhere near a compare boundary.

    Spark shape: a 9-cell grouped aggregate fused into the scan (map-side
    combine), LEFT-joined from the broadcast 9-row expectation relation so
    digits with zero observations still report. TPC-H-ish totalprice is
    range-bounded, so large deviations here are expected and the point is
    the deterministic per-digit readout, not a verdict."""
    digits = load(spark, sf_dir, "orders").select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    expected = spark.createDataFrame(
        [
            (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
            (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
            (9, 0.045757),
        ],
        "digit INT, exp_share DOUBLE",
    )
    total = obs.agg(F.sum("n").cast("long").alias("total_n"))
    obs_share = F.round(
        F.coalesce("n", F.lit(0)).cast("double") / F.col("total_n"), 6
    )
    return (
        expected.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            obs_share.alias("obs_share"),
            "exp_share",
            F.round(F.abs(obs_share - F.col("exp_share")), 6).alias(
                "abs_dev"
            ),
        )
        .orderBy("digit")
    )


_PROF_NUM = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
]
_PROF_STR = ["l_returnflag", "l_linestatus"]
_PROF_DATE = ["l_shipdate"]
_PROF_ALL = _PROF_NUM + _PROF_STR + _PROF_DATE


def _prof_minmax_sql(c: str) -> tuple[str, str, str, str]:
    """(min_num, max_num, min_str, max_str) SQL exprs for one column."""
    if c in _PROF_NUM:
        return (
            f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)",
        )
    if c in _PROF_DATE:
        return (
            "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            f"CAST(CAST(MIN({c}) AS DATE) AS VARCHAR)",
            f"CAST(CAST(MAX({c}) AS DATE) AS VARCHAR)",
        )
    return (
        "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        f"MIN({c})", f"MAX({c})",
    )


_PROFILE_SQL = (
    "WITH w AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS nn_{c}, CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}, "
        + "{0} AS mnn_{c}, {1} AS mxn_{c}, {2} AS mns_{c}, {3} AS mxs_{c}"
        .format(*_prof_minmax_sql(c), c=c)
        for c in _PROF_ALL
    )
    + " FROM lineitem) "
    + " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_nulls,"
        f" nd_{c} AS n_distinct, mnn_{c} AS min_num, mxn_{c} AS max_num,"
        f" mns_{c} AS min_str, mxs_{c} AS max_str FROM w"
        for c in _PROF_ALL
    )
    + " ORDER BY column_name"
)


@register(
    "dq_profile_all_columns",
    oracle=_PROFILE_SQL,
    tags=("dq", "profiling"),
)
def dq_profile_all_columns(spark, sf_dir):
    """Whole-table column profiler — the Deequ/Great-Expectations
    'profile' op: per column, null count, exact distinct count, and
    type-aware min/max (numeric columns report DOUBLE bounds, string and
    date columns report string bounds — dates through a DATE cast so the
    string form is engine-neutral ISO). Output is long-format, one row per
    column, the schema a metadata catalog ingests.

    Spark shape: null counts and min/max for all 11 columns compute in
    ONE wide single-scan aggregate, but each exact distinct count runs
    as its OWN single-column aggregate crossJoined in (11 one-row
    broadcast joins): putting 11 COUNT(DISTINCT)s in one aggregate makes
    Catalyst Expand replicate every input row 11× at full row width —
    measured 20-25 s vs 1.3-2.4 s at sf0.1 for the split plan. The
    narrow scans are also the right 100 TB shape on a column store:
    each distinct-count scan reads exactly one parquet column, and the
    11 jobs parallelize across the cluster instead of multiplying one
    job's shuffle volume. ``stack`` then unpivots the wide row into the
    long profile; the oracle recomputes from its own single-pass CTE.
    At 100 TB swap the exact distinct counts for approx_count_distinct
    — which folds back into the single scan (no Expand needed)."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in _PROF_ALL:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nn_{c}")
        )
        if c in _PROF_NUM:
            aggs.append(F.min(c).cast("double").alias(f"mnn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mxn_{c}"))
        elif c in _PROF_DATE:
            aggs.append(
                F.min(c).cast("date").cast("string").alias(f"mns_{c}")
            )
            aggs.append(
                F.max(c).cast("date").cast("string").alias(f"mxs_{c}")
            )
        else:
            aggs.append(F.min(c).alias(f"mns_{c}"))
            aggs.append(F.max(c).alias(f"mxs_{c}"))
    wide = li.agg(*aggs)
    for c in _PROF_ALL:
        wide = wide.crossJoin(
            li.select(c).agg(
                F.countDistinct(c).cast("long").alias(f"nd_{c}")
            )
        )
    parts = []
    for c in _PROF_ALL:
        mnn = f"mnn_{c}" if c in _PROF_NUM else "CAST(NULL AS DOUBLE)"
        mxn = f"mxn_{c}" if c in _PROF_NUM else "CAST(NULL AS DOUBLE)"
        mns = f"mns_{c}" if c not in _PROF_NUM else "CAST(NULL AS STRING)"
        mxs = f"mxs_{c}" if c not in _PROF_NUM else "CAST(NULL AS STRING)"
        parts.append(
            f"'{c}', nn_{c}, nd_{c}, {mnn}, {mxn}, {mns}, {mxs}"
        )
    stack = (
        f"stack({len(_PROF_ALL)}, " + ", ".join(parts)
        + ") AS (column_name, n_nulls, n_distinct,"
        " min_num, max_num, min_str, max_str)"
    )
    return wide.select(F.col("n_rows"), F.expr(stack)).select(
        "column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    ).orderBy("column_name")


@register(
    "dq_freshness_sla",
    oracle="""
    WITH horizon AS (SELECT MAX(ts) AS max_ts FROM events),
    per_source AS (
      SELECT event_type,
             MAX(ts) AS last_seen,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           strftime(last_seen, '%Y-%m-%d %H:%M:%S.%f') AS last_seen,
           CAST(date_diff('second', last_seen, (SELECT max_ts FROM horizon))
                AS BIGINT) AS staleness_s,
           n_events,
           CAST(date_diff('second', last_seen, (SELECT max_ts FROM horizon))
                AS BIGINT) <= 86400 AS within_24h_sla
    FROM per_source ORDER BY event_type
    """,
    tags=("dq", "freshness"),
)
def dq_freshness_sla(spark, sf_dir):
    """Per-feed freshness monitor — the first page of every data-ops
    runbook: when did each feed last deliver, how stale is it against the
    newest observation anywhere (the deterministic stand-in for wall-clock
    'now'), and is it inside a 24 h SLA. The reference's daily snapshot
    cadence (`base_scraper.py:72-83` date-keyed directories) makes exactly
    this the first thing a user checks when a provider silently stops.

    Spark shape: one grouped MAX per feed plus a broadcast 1-row horizon —
    two map-side-combinable aggregates over a single scan; integer-second
    staleness, so the SLA verdict never sits on a float boundary."""
    ev = load(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("max_ts"))
    per_source = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    stale = F.unix_timestamp("max_ts") - F.unix_timestamp("last_seen")
    return (
        per_source.crossJoin(F.broadcast(horizon))
        .select(
            "event_type",
            F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_seen"
            ),
            stale.cast("long").alias("staleness_s"),
            "n_events",
            (stale <= 86400).alias("within_24h_sla"),
        )
        .orderBy("event_type")
    )


def _checksum_oracle() -> str:
    from crocus_spark.queries.llm import _hash60_sql

    row_hash = _hash60_sql(
        "'ck:' || CAST(o_orderkey AS VARCHAR) || ':' "
        "|| CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR) "
        "|| ':' || o_orderstatus"
    )
    return f"""
    WITH keyed AS (
      SELECT date_trunc('month', o_orderdate)::DATE AS month,
             ({row_hash}) % 1099511627776 AS h
      FROM orders
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h) AS BIGINT) AS checksum
    FROM keyed GROUP BY month ORDER BY month
    """


@register(
    "dq_partition_checksums",
    oracle=_checksum_oracle(),
    tags=("dq", "reconciliation"),
)
def dq_partition_checksums(spark, sf_dir):
    """Per-partition content checksums — the cross-system reconciliation
    primitive: each month of orders reduces to (row count, order-
    independent BIGINT sum of a per-row content hash), so two copies of a
    table — engines, regions, before/after a migration — compare with a
    months-sized diff instead of a row-level join. A single flipped cent
    or dropped row changes exactly one cell.

    The row hash is the portable md5-derived hash over key + cent-
    quantized price + status, reduced mod 2^40 so a month of sums stays
    far from BIGINT overflow (2^40 × rows ≪ 2^63 up to ~8M rows/month;
    widen to DECIMAL(38,0) beyond). Addition is commutative, so the
    checksum is partitioning- and order-independent — and this oracle
    match IS the cross-engine reconciliation it implements."""
    from crocus_spark.operators import dedup as D

    orders = load(spark, sf_dir, "orders")
    h = (
        D.portable_hash60(
            F.concat(
                F.lit("ck:"),
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .cast("string"),
                F.lit(":"),
                F.col("o_orderstatus"),
            )
        )
        % 1099511627776
    )
    return (
        orders.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            h.alias("h"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h").cast("long").alias("checksum"),
        )
        .orderBy("month")
    )
