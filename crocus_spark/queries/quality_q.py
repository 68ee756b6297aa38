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
