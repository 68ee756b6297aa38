"""Join battery — SURVEY.md §2B rows 11-14, 18.

The reference's only join is the per-product enrichment (J1,
``ishares.py:139-162``) executed as a sequential nested loop: one detail-page
fetch per catalog row. Spark-first, that's a broadcast-hash equi-join — the
detail side is small — and the implied cross-provider "confront"
(``README.md:4``) is a full outer join. Each query below exercises one join
strategy and says why that strategy survives at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crocus_spark.io import load
from crocus_spark.queries import register
from crocus_spark.queries._det import dsum, dsum_sql


@register(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r_name AS region, n_name AS nation,
           COUNT(*) AS n_customers,
           {dsum_sql('c_acctbal', 'total_acctbal')}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY region, nation
    """,
    tags=("join", "headline"),
)
def join_broadcast_dims(spark, sf_dir):
    """Star-schema dim enrichment via explicit broadcast (crocus J1 analog).

    nation/region are KB-sized at any SF — broadcasting them removes the
    shuffle of the (huge) fact side entirely; the join runs map-side inside
    one stage. This is the 1000×-scale replacement for the reference's
    row-at-a-time page-fetch join."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
        .orderBy("region", "nation")
    )


@register(
    "join_sortmerge_large",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "headline"),
)
def join_sortmerge_large(spark, sf_dir):
    """Large-large equi-join (lineitem ⋈ orders): above the broadcast
    threshold both sides shuffle on the key → sort-merge join. At 100 TB this
    is the query to co-locate: bucket both tables by orderkey at write time
    and the exchange disappears. The o_orderstatus filter is pushed below the
    join (and into the orders scan) by Catalyst. The merge hint pins the
    large-large strategy this operator exists to exercise — at test SF both
    sides fit the broadcast threshold and Spark would otherwise plan the
    small-dim strategy that join_broadcast_dims already covers."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark, sf_dir):
    """Left outer join preserving customers with zero orders; COUNT(col)
    ignores the null-extended rows, so order-less customers count 0."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust_nations AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), supp_nations AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cust_nations c
    FULL OUTER JOIN supp_nations s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
    tags=("join",),
)
def join_full_outer(spark, sf_dir):
    """Full outer join — the shape of the crocus flagship 'confront'
    (`README.md:4`): entities present on either side survive, with explicit
    zero-fill. Pre-aggregating both sides before the join shrinks the shuffle
    to one row per key — aggregate-below-join is the at-scale idiom."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 200000)
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_semi(spark, sf_dir):
    """Left semi join = EXISTS: customers with at least one large order.
    Semi joins never duplicate the left side, so no post-join dedup shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def join_left_anti(spark, sf_dir):
    """Left anti join = NOT EXISTS — the crocus 'missing from provider B'
    question (§2B#14): catalog entries with no counterpart."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_cross_grid",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    ORDER BY region_a, region_b
    """,
    tags=("join",),
)
def join_cross_grid(spark, sf_dir):
    """Guarded cross join for small scoring grids (§2B#18) — both sides must
    be dimension-sized; the engine never cross-joins two fact tables."""
    r = load(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("region_a"), F.col("r_regionkey").alias("ka"))
    b = r.select(F.col("r_name").alias("region_b"), F.col("r_regionkey").alias("kb"))
    return (
        a.crossJoin(b)
        .filter(F.col("ka") != F.col("kb"))
        .select("region_a", "region_b")
        .orderBy("region_a", "region_b")
    )
