"""Core relational operators: scan → filter → project → aggregate.

SURVEY.md §2B rows 1-2, 8-10, 19 — the Spark re-expression of the reference's
scan/filter/project pipeline (``ishares.py:52-90`` F1/P1-P3) over the driver
fixtures. All plans are pure DataFrame API so Catalyst's pushdown/pruning
applies; check ``.explain`` for PushedFilters + ReadSchema on every query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crocus_spark.io import load, spread
from crocus_spark.queries import register
from crocus_spark.queries._det import davg, davg_sql, dsum, dsum_sql


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {dsum_sql('l_quantity', 'sum_qty')},
      {dsum_sql('l_extendedprice', 'sum_base_price')},
      {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
      {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
      {davg_sql('l_quantity', 'avg_qty')},
      {davg_sql('l_extendedprice', 'avg_price')},
      {davg_sql('l_discount', 'avg_disc')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "headline"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped pricing summary: the canonical scan→filter→groupBy→agg.

    Scale notes: filter reaches the parquet scan (PushedFilters), the groupBy
    is a partial+final hash aggregate (map-side combine), 6 grouping cells →
    trivially small shuffle regardless of input size.

    spread(): the partial aggregate's per-row cost is dominated by the
    dsum contract's double→decimal conversions (4 per row), and the
    single-row-group fixture file pins the whole scan+partial-agg stage
    to ONE task (measured 1.05 s of 1.3 s total). The keyed spread moves
    the decimal work to a cores-wide stage (q1 1.38 s → 0.69 s at
    sf0.1); at production scale the scan splits past the core count and
    spread is a no-op, so the extra exchange exists only where the input
    could not parallelize at all. The shipdate filter still pushes below
    the exchange to the scan (shuffle carries only surviving rows).
    """
    li = load(spark, sf_dir, "lineitem")
    li = spread(li, spark, cols=("l_orderkey",), rows_per_task=4000)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_type LIKE '%BRASS%'
      AND p_retailprice > 1200.0
      AND p_name IS NOT NULL
    ORDER BY p_partkey
    """,
    tags=("filter",),
)
def filter_predicates(spark, sf_dir):
    """Filter battery: range, IN-list, LIKE, comparison, null-ness (crocus F1
    generalized — `ishares.py:58-60`). All five predicates are
    Catalyst-pushable into the parquet scan."""
    p = load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_size").between(10, 20))
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .filter(F.col("p_type").like("%BRASS%"))
        .filter(F.col("p_retailprice") > 1200.0)
        .filter(F.col("p_name").isNotNull())
        .orderBy("p_partkey")
    )


@register(
    "select_project_drop",
    oracle="""
    SELECT c_custkey AS custkey,
           upper(c_name) AS cust_name,
           c_mktsegment AS segment
    FROM customer
    ORDER BY custkey
    """,
    tags=("project",),
)
def select_project_drop(spark, sf_dir):
    """Projection with rename/drop (crocus P1-P3: positional cell→named field
    then drop of hedged/acc_distr — `ishares.py:149-160`). Column pruning
    means the scan reads 3 of 5 columns (check ReadSchema)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            F.col("c_custkey").alias("custkey"),
            F.upper("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("custkey")
    )


@register(
    "conditional_case",
    oracle="""
    SELECT
      CASE WHEN o_totalprice < 50000 THEN 'small'
           WHEN o_totalprice < 150000 THEN 'medium'
           ELSE 'large' END AS bucket,
      o_orderpriority,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY bucket, o_orderpriority
    ORDER BY bucket, o_orderpriority
    """,
    tags=("project",),
)
def conditional_case(spark, sf_dir):
    """when/otherwise dispatch (crocus C2: the `match asset_class` dispatch at
    `vanguard.py:130-145` re-expressed declaratively)."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.select(bucket.alias("bucket"), "o_orderpriority")
        .groupBy("bucket", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("bucket", "o_orderpriority")
    )


@register(
    "null_handling",
    oracle="""
    SELECT
      c_custkey,
      COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
      CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS acctbal_floor,
      (c_acctbal IS NULL) AS bal_missing
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("project",),
)
def null_handling(spark, sf_dir):
    """Null handling battery: coalesce / conditional floor / null predicate
    (crocus: nullable fund_type, `ishares.json:4`; §2B#44)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        F.when(F.col("c_acctbal") < 0, F.lit(0.0))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal_floor"),
        F.col("c_acctbal").isNull().alias("bal_missing"),
    ).orderBy("c_custkey")


@register(
    "orderby_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort",),
)
def orderby_limit_topk(spark, sf_dir):
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject — a
    per-partition heap + driver merge, NO global sort shuffle. The o_orderkey
    tiebreak makes the result deterministic under ties."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "global_sort",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
    tags=("sort",),
)
def global_sort(spark, sf_dir):
    """Global sort (range-partitioned exchange + per-partition sort). On a
    cluster this samples for range boundaries; skew in the sort key is
    handled by the sampler."""
    s = load(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )


@register(
    "lateral_explode_installments",
    oracle="""
    WITH plans AS (
      SELECT o_orderkey,
             o_totalprice,
             (o_orderkey % 4) + 1 AS n_inst,
             UNNEST(generate_series(1, CAST((o_orderkey % 4) + 1 AS BIGINT)))
               AS inst
      FROM orders
    )
    SELECT inst,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice / n_inst AS DECIMAL(25,6)))
                AS DOUBLE) AS sum_amount
    FROM plans
    GROUP BY inst
    ORDER BY inst
    """,
    tags=("relational", "lateral"),
)
def lateral_explode_installments(spark, sf_dir):
    """Correlated lateral table function (§2B#63's set-returning shape in
    relational form): each order expands into (orderkey % 4) + 1 equal
    installment rows via explode(sequence(1, n)) — per-row cardinality
    decided by the row itself, the LATERAL/UNNEST pattern. The expansion
    is map-side (Generate node, no shuffle): a 100 TB fact fans out
    in-place and only the downstream aggregate exchanges data. The
    per-installment amount divides BEFORE aggregation — one deterministic
    IEEE division per row, then the exact decimal sum."""
    o = load(spark, sf_dir, "orders")
    n_inst = (F.col("o_orderkey") % 4 + 1).cast("int")
    return (
        o.select(
            "o_totalprice",
            n_inst.alias("n_inst"),
            F.explode(
                F.sequence(F.lit(1).cast("long"), n_inst.cast("long"))
            ).alias("inst"),
        )
        .groupBy("inst")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.col("o_totalprice") / F.col("n_inst")).cast(
                    "decimal(25,6)"
                )
            )
            .cast("double")
            .alias("sum_amount"),
        )
        .orderBy("inst")
    )
