"""Set-operation battery — SURVEY.md §2B rows 33-35.

The reference merges schema-divergent provider dicts (U1,
``vanguard.py:101-109``) and re-keys with overwrite (U2, ``ishares.py:149``).
Engine form: unionByName with missing columns, distinct-based intersection /
difference, and deterministic keyed dedup.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crocus_spark.io import load
from crocus_spark.queries import register


@register(
    "set_union_by_name",
    oracle="""
    SELECT c_name AS name, c_nationkey AS nationkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal, 'customer' AS kind,
           c_mktsegment AS segment
    FROM customer
    UNION ALL
    SELECT s_name, s_nationkey, CAST(s_acctbal AS DOUBLE), 'supplier', NULL
    FROM supplier
    ORDER BY kind, name
    """,
    tags=("setop",),
)
def set_union_by_name(spark, sf_dir):
    """Union of schema-divergent sides by column NAME with null-fill for
    missing columns — exactly the reconciled-superset semantics the two
    provider catalogs need (crocus U1; SURVEY §1.1). Position-based union
    would silently mis-align; the engine always unions by name."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s, allowMissingColumns=True).orderBy("kind", "name")


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def set_intersect(spark, sf_dir):
    """Distinct intersection (§2B#34): nations that have BOTH customers and
    suppliers — 'ISINs present at both providers'."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def set_except(spark, sf_dir):
    """Distinct difference (§2B#34): nations with customers but no
    suppliers — 'only at one provider'."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@register(
    "set_distinct_rows",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
    tags=("setop",),
)
def set_distinct_rows(spark, sf_dir):
    """Row-level distinct — a hash aggregate on all columns."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "dedup_last_wins_by_key",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM ranked WHERE rn = 1
    ORDER BY o_custkey
    """,
    tags=("setop", "dedup"),
)
def dedup_last_wins_by_key(spark, sf_dir):
    """Keyed last-wins dedup (crocus U2 `final_json[isin] = ...` made
    deterministic; §2B#35): latest order per customer by explicit ordering.
    `dropDuplicates` keeps an ARBITRARY row under parallelism — the engine's
    canonical dedup is the ordered window top-1, which is reproducible on
    any cluster."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    )
