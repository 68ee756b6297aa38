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


@register(
    "merge_upsert_snapshot",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01')
      WHERE rn = 1
    ), delta AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
      WHERE rn = 1
    )
    SELECT COALESCE(d.o_custkey, b.o_custkey) AS o_custkey,
           COALESCE(d.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(d.o_orderdate, b.o_orderdate) AS o_orderdate,
           COALESCE(d.o_totalprice, b.o_totalprice) AS o_totalprice,
           CASE WHEN d.o_custkey IS NULL THEN 'carry'
                WHEN b.o_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS merge_action
    FROM base b FULL OUTER JOIN delta d ON b.o_custkey = d.o_custkey
    ORDER BY o_custkey
    """,
    tags=("setop", "merge", "cdc"),
)
def merge_upsert_snapshot(spark, sf_dir):
    """MERGE INTO semantics (SCD1 upsert) without a table format: base
    snapshot (latest order per customer before 1999) full-outer-joined
    with a change batch (latest order since 1999); delta wins, base
    carries, and each row is tagged carry/insert/update — the audit
    column a real MERGE emits as metrics. This is the engine's answer to
    the reference's `final_json[isin] = ...` dict-overwrite ingest
    (vanguard.py:164-170) once the catalog no longer fits one process: a
    single key-partitioned join, no driver-side state, and the same plan
    shape whether the delta is 1 row or the whole key space."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )

    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(*cols)
        )

    split = F.lit("1999-01-01").cast("timestamp")
    base = latest(o.filter(F.col("o_orderdate") < split))
    delta = latest(o.filter(F.col("o_orderdate") >= split))
    b = base.alias("b")
    d = delta.alias("d")
    merged = b.join(d, F.col("b.o_custkey") == F.col("d.o_custkey"), "full")
    return (
        merged.select(
            *[
                F.coalesce(F.col(f"d.{c}"), F.col(f"b.{c}")).alias(c)
                for c in cols
            ],
            F.when(F.col("d.o_custkey").isNull(), "carry")
            .when(F.col("b.o_custkey").isNull(), "insert")
            .otherwise("update")
            .alias("merge_action"),
        )
        .orderBy("o_custkey")
    )


@register(
    "unpivot_wide_to_long",
    oracle="""
    SELECT p_partkey, p_brand, 'p_size' AS metric,
           CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, p_brand, 'p_retailprice' AS metric,
           p_retailprice AS val
    FROM part
    ORDER BY p_partkey, metric
    """,
    tags=("setop", "reshape"),
)
def unpivot_wide_to_long(spark, sf_dir):
    """Wide→long reshape via ``unpivot``/``melt`` — the inverse of the
    pivot 'confront' layout (§2B#26): one (entity, metric, value) row per
    measure column. The crocus products record is exactly such a wide row
    (13 fields, ishares.py:149-160); attribute-level diffing across
    providers wants it long. Spark compiles unpivot to an Expand node —
    each input row fans out to n_metrics rows in the same task, no
    shuffle, no UDF; at 100 TB the output is n_metrics× rows but remains
    a pure map-side transform fused into the scan."""
    p = load(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            "p_brand",
            F.col("p_size").cast("double").alias("p_size"),
            "p_retailprice",
        )
        .unpivot(
            ["p_partkey", "p_brand"],
            ["p_size", "p_retailprice"],
            "metric",
            "val",
        )
        .orderBy("p_partkey", "metric")
    )


@register(
    "set_bag_semantics",
    oracle="""
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
         ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
         ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    SELECT 'except_all' AS op, COUNT(*) AS n_rows,
           COUNT(DISTINCT k) AS n_keys FROM ea
    UNION ALL
    SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
           COUNT(DISTINCT k) AS n_keys FROM ia
    ORDER BY op
    """,
    tags=("setop", "bag"),
)
def set_bag_semantics(spark, sf_dir):
    """Bag (multiset) set operations — EXCEPT ALL / INTERSECT ALL keep
    MULTIPLICITY: a key occurring 5 times on the left and twice on the
    right survives EXCEPT ALL 3 times (the distinct variants in
    `set_except`/`set_intersect` would say 0). Spark plans both as a
    single hash aggregate computing per-row counts on each side then
    replicating min/difference counts — one shuffle, no join, and no
    row explosion beyond the true multiplicities at any scale."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    def stats(df, label):
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_keys"),
        ).select(F.lit(label).alias("op"), "n_rows", "n_keys")
    return (
        stats(a.exceptAll(b), "except_all")
        .unionAll(stats(a.intersectAll(b), "intersect_all"))
        .orderBy("op")
    )
